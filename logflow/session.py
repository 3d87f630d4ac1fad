"""SparkSession factory tuned for the logflow engine.

Defaults target correctness + determinism on local[N] while keeping every
knob that matters at cluster scale explicit: AQE for runtime re-planning
(skew joins, partition coalescing), a bounded shuffle-partition count,
Arrow for any pandas exchange, and UTC so timestamp semantics match the
DuckDB oracle byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Shuffle partitions sized for local[32] on ~sf0.1; on a real cluster this
#: is overridden (or left to AQE's coalescing, which is enabled below).
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "logflow",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Scale notes: everything here survives a 1000-executor cluster —
    AQE handles skew/coalesce at runtime, broadcast threshold stays at the
    Spark default so dimension tables broadcast, and nothing pins
    local-only behavior except the master URL (injectable).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("LOGFLOW_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local[N] runs everything in the driver JVM; the 1g default heap
        # GC-thrashes under 32 concurrent tasks (only applies at JVM
        # launch — a no-op if a session already exists).
        .config("spark.driver.memory", os.environ.get("LOGFLOW_DRIVER_MEM", "16g"))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime join-strategy switch, skew-join splitting, partition
        # coalescing — the knobs that keep plans healthy at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas interchange (driver collect + pandas UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics (matches DuckDB naive-UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events.parquet stores TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read as long and convert in
        # the table source (logflow.sources.tables truncates ns → µs,
        # matching DuckDB's conversion exactly).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # Static conf, default 100: with ~50 registered queries × several
        # codegen'd stages each, the generated-class cache thrashes and
        # every query pays Janino recompilation on each run (measured: up
        # to 30× first-run slowdowns at bench time).  One class is small;
        # 10k entries is still trivial memory.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        # Managed tables (bucketed-join ingest path) land outside the repo;
        # in-memory catalog, so the warehouse is just a directory of files.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("LOGFLOW_WAREHOUSE", "/tmp/logflow-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
