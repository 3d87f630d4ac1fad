"""Custom Python DataSource: a Kafka-wire-format file log ("wirelog").

Spark 4's Python DataSource API (`pyspark.sql.datasource`) lets a pure-
Python connector plug into the planner: the engine's `kafka_wire_frame`
producer frames (utf8 key bytes, 4-byte big-endian IntegerSerde value
bytes, b3/baggage headers — exactly the reference's serde config,
application.yml:17-21) are persisted as length-prefixed binary frame
files, and this source reads them back with one input partition per
file. That closes the broker-gap loop end-to-end IN-ENGINE: produce-side
encode → wire bytes on disk → custom-source scan → decode, with no Kafka
dependency. Against a real deployment the same reader logic would target
the broker; here the wire format itself is the contract under test.

Frame layout (all lengths unsigned 4-byte big-endian):
    [klen][key][vlen][value][n_headers] then per header [hklen][hk][hvlen][hv]

Scale notes: one file = one InputPartition = one task, so read
parallelism is the file count (the writer repartitions accordingly);
frames stream through a generator — nothing buffers a whole file; the
driver only lists the directory. Filter/column pushdown is not
implemented (the API supports it via pushFilters) — documented
limitation, fine for a wire-replay source whose consumers decode every
frame anyway.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

WIRELOG_SCHEMA = "key binary, value binary, headers array<struct<key:string,value:binary>>"

_U32 = struct.Struct(">I")


def _write_frame(fh, key: bytes, value: bytes, headers: list[tuple[str, bytes]]) -> None:
    """Pure-Python reference framer — the byte-level spec that
    :func:`wire_frame_bytes` (the production JVM-side assembly) is
    equivalence-tested against."""
    fh.write(_U32.pack(len(key)))
    fh.write(key)
    fh.write(_U32.pack(len(value)))
    fh.write(value)
    fh.write(_U32.pack(len(headers)))
    for hk, hv in headers:
        hkb = hk.encode("utf-8")
        fh.write(_U32.pack(len(hkb)))
        fh.write(hkb)
        fh.write(_U32.pack(len(hv)))
        fh.write(hv)


def _read_frames(path: str) -> Iterator[tuple[bytes, bytes, list[tuple[str, bytes]]]]:
    with open(path, "rb") as fh:
        while True:
            head = fh.read(4)
            if not head:
                return
            key = fh.read(_U32.unpack(head)[0])
            value = fh.read(_U32.unpack(fh.read(4))[0])
            n_headers = _U32.unpack(fh.read(4))[0]
            headers = []
            for _ in range(n_headers):
                hk = fh.read(_U32.unpack(fh.read(4))[0]).decode("utf-8")
                hv = fh.read(_U32.unpack(fh.read(4))[0])
                headers.append((hk, hv))
            yield key, value, headers


def wire_frame_bytes() -> "object":
    """Column expression: one fully framed wirelog record as binary.

    The ENTIRE frame — length prefixes, key/value bytes, header count and
    per-header records — is assembled with built-in binary expressions
    (concat + the engine's IntegerSerde encoder + a fold over the header
    array), so framing runs inside whole-stage codegen on the JVM and the
    Python side of the writer only concatenates finished byte strings.
    """
    from pyspark.sql import functions as F

    from logflow.functions.codec import int_be_encode

    def u32(c):
        return int_be_encode(c.cast("int"))

    key = F.coalesce(F.col("key"), F.lit(b""))
    value = F.coalesce(F.col("value"), F.lit(b""))
    hdrs = F.coalesce(
        F.col("headers"), F.expr("CAST(array() AS array<struct<key:string,value:binary>>)")
    )
    hdr_bytes = F.aggregate(
        hdrs,
        F.lit(b"").cast("binary"),
        lambda acc, h: F.concat(
            acc,
            u32(F.octet_length(F.encode(h["key"], "UTF-8"))),
            F.encode(h["key"], "UTF-8"),
            u32(F.octet_length(h["value"])),
            h["value"],
        ),
    )
    return F.concat(
        u32(F.octet_length(key)),
        key,
        u32(F.octet_length(value)),
        value,
        u32(F.size(hdrs)),
        hdr_bytes,
    )


def write_wirelog(wire_frames, path: str, n_files: int = 4) -> int:
    """Persist a kafka_wire_frame DataFrame as wirelog files; returns the
    row count written. Executor-side writes (mapInPandas) — the driver
    never materializes the data; a real deployment would target shared
    storage instead of the local tmpfs.

    Frames are assembled JVM-side (:func:`wire_frame_bytes`); the Python
    writer receives one pre-framed binary column per row and does a single
    ``b"".join`` + ``write`` per Arrow batch — no per-row Python work
    (the previous ``iterrows`` loop paid pandas Series construction per
    frame, measured as the #3 bench query at 2.4 s)."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    # Idempotent restart: the writers append uuid-named part files, so a
    # retry after a crashed attempt would double-count the crashed
    # attempt's frames (the reader lists every *.wirelog). Start clean.
    for f in os.listdir(path):
        if f.endswith(".wirelog"):
            os.remove(os.path.join(path, f))

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.wirelog")
        n = 0
        with open(fname, "wb") as fh:
            for pdf in batches:
                fh.write(b"".join(pdf["frame"]))
                n += len(pdf)
        if n == 0:
            os.remove(fname)
        yield pd.DataFrame({"n": [n]})

    counts = (
        wire_frames.select(wire_frame_bytes().alias("frame"))
        .repartition(n_files)
        .mapInPandas(write_partition, "n long")
        .collect()
    )
    return sum(r.n for r in counts)


#: Frames per Arrow RecordBatch yielded by the reader. Bounds reader
#: memory to one batch of decoded frames per task regardless of file size.
_ARROW_BATCH_ROWS = 8192


def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("key", pa.binary()),
            pa.field("value", pa.binary()),
            pa.field(
                "headers",
                pa.list_(
                    pa.struct([pa.field("key", pa.string()), pa.field("value", pa.binary())])
                ),
            ),
        ]
    )


class WirelogReader(DataSourceReader):
    """Arrow-batched wirelog scan.

    ``read()`` yields ``pyarrow.RecordBatch`` (supported by the Spark 4
    Python DataSource API), not per-frame tuples: the round-4 row-at-a-time
    generator made this the slowest non-iterative bench query (2.8 s) —
    every frame paid the Python->JVM row boundary. Batching frames into
    Arrow moves the boundary to once per ~8k frames; frame DECODE is still
    the pure-Python reference parser (_read_frames — the byte-level spec),
    which streams through the file, so a task buffers one batch, never a
    whole file.
    """

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("wirelog source requires a 'path' option")

    def partitions(self) -> list[InputPartition]:
        files = sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith(".wirelog")
        )
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        import pyarrow as pa

        schema = _arrow_schema()
        keys: list[bytes] = []
        vals: list[bytes] = []
        hdrs: list[list[dict]] = []

        def flush():
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(keys, type=schema.field("key").type),
                    pa.array(vals, type=schema.field("value").type),
                    pa.array(hdrs, type=schema.field("headers").type),
                ],
                schema=schema,
            )

        for key, value, headers in _read_frames(partition.value):
            keys.append(key)
            vals.append(value)
            hdrs.append([{"key": hk, "value": hv} for hk, hv in headers])
            if len(keys) >= _ARROW_BATCH_ROWS:
                yield flush()
                keys, vals, hdrs = [], [], []
        if keys:
            yield flush()


class WirelogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wirelog"

    def schema(self) -> str:
        return WIRELOG_SCHEMA

    def reader(self, schema) -> WirelogReader:
        return WirelogReader(self.options)

    def streamReader(self, schema) -> "WirelogStreamReader":
        return WirelogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "WirelogArrowWriter":
        return WirelogArrowWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "WirelogStreamWriter":
        return WirelogStreamWriter(self.options)


def register_wirelog(spark) -> None:
    """Idempotent registration of the wirelog format on a session."""
    spark.dataSource.register(WirelogDataSource)


def _read_frames_range(
    path: str, start: int, end: int
) -> Iterator[tuple[bytes, bytes, list[tuple[str, bytes]]]]:
    """Parse frames whose first byte lies in [start, end) — the streaming
    micro-batch slice. ``start``/``end`` MUST be frame boundaries (they
    come from size snapshots taken between atomic whole-frame appends —
    the writer contract); a torn frame raises via struct.error rather
    than yielding garbage."""
    with open(path, "rb") as fh:
        fh.seek(start)
        while fh.tell() < end:
            head = fh.read(4)
            if not head:
                return
            key = fh.read(_U32.unpack(head)[0])
            value = fh.read(_U32.unpack(fh.read(4))[0])
            n_headers = _U32.unpack(fh.read(4))[0]
            headers = []
            for _ in range(n_headers):
                hk = fh.read(_U32.unpack(fh.read(4))[0]).decode("utf-8")
                hv = fh.read(_U32.unpack(fh.read(4))[0])
                headers.append((hk, hv))
            yield key, value, headers


class WirelogStreamReader(DataSourceStreamReader):
    """Micro-batch STREAMING tail of a wirelog directory — the closest
    sandbox analog of the reference's live Kafka consumption
    (TestConsumer.java:21-46): the wire format is identical; only the
    transport (growing files vs a broker socket) differs.

    Offsets are ``{"sizes": {filename: bytes_consumed}}``: ``latestOffset``
    snapshots current file sizes on the driver (a directory listing —
    cheap), ``partitions(start, end)`` emits one input partition per file
    whose size grew (so read parallelism = files with new data), and
    ``read`` parses ONLY the new byte range executor-side. Exactly-once
    falls out of the offset algebra: Spark checkpoints the end offset per
    batch and replays ranges on recovery (``read`` is deterministic for a
    fixed range). New files appear mid-stream and are picked up at size 0;
    files never shrink (append-only contract, enforced with a clear error).
    """

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("wirelog stream source requires a 'path' option")

    def _sizes(self) -> dict:
        return {
            f: os.path.getsize(os.path.join(self._path, f))
            for f in sorted(os.listdir(self._path))
            if f.endswith(".wirelog")
        }

    def initialOffset(self) -> dict:
        return {"sizes": {}}

    def latestOffset(self) -> dict:
        return {"sizes": self._sizes()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        out = []
        for fname, end_pos in end["sizes"].items():
            start_pos = start["sizes"].get(fname, 0)
            if end_pos < start_pos:
                raise ValueError(
                    f"wirelog file {fname} shrank ({start_pos} -> {end_pos}); "
                    "the source requires append-only files"
                )
            if end_pos > start_pos:
                out.append(
                    InputPartition((os.path.join(self._path, fname), start_pos, end_pos))
                )
        return out

    def read(self, partition: InputPartition):
        path, start_pos, end_pos = partition.value
        for key, value, headers in _read_frames_range(path, start_pos, end_pos):
            yield key, value, headers

    def commit(self, end: dict) -> None:
        pass


class WirelogCommit(WriterCommitMessage):
    """Per-task commit message: the temp file the task staged + its count."""

    def __init__(self, tmp_name: str, n: int):
        self.tmp_name = tmp_name
        self.n = n


class WirelogArrowWriter(DataSourceArrowWriter):
    """Batch SINK half of the wirelog connector (``df.write.format(
    "wirelog")``) with the DSv2 TWO-PHASE COMMIT protocol — the part the
    mapInPandas-based :func:`write_wirelog` path cannot express:

    * ``write`` (executor, once per task) encodes its Arrow batches into a
      STAGED file named ``.part-<uuid>.wirelog.tmp`` — the leading dot and
      ``.tmp`` suffix keep it invisible to the reader's ``*.wirelog``
      listing, so a crashed task can never leak half-written frames into
      a concurrent read;
    * ``commit`` (driver, after ALL tasks succeed) atomically renames every
      staged file to its visible ``part-*.wirelog`` name (rename is atomic
      on POSIX; on overwrite it first clears prior visible files);
    * ``abort`` deletes the staged files — the directory's visible state is
      byte-identical to before the failed write.

    Rows arrive either pre-framed (a single ``frame binary`` column —
    frames assembled JVM-side by :func:`wire_frame_bytes`, the fast path)
    or as the raw (key, value, headers) wire schema, encoded here with the
    same writer the tests' golden files use. On a cluster the staging dir
    would live on the shared filesystem next to the target (same
    rename-domain); tmpfs stands in here, as everywhere in this repo.
    """

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self._path = options.get("path")
        if not self._path:
            raise ValueError("wirelog writer requires a 'path' option")
        self._overwrite = overwrite
        # Job-scoped staging prefix, generated ONCE on the driver and
        # pickled to every task: commit/abort can then sweep this job's
        # staged leftovers (killed / losing-speculative attempts) without
        # touching a concurrent job's staging files.
        self._job = uuid.uuid4().hex

    def write(self, iterator) -> WirelogCommit:
        import uuid

        os.makedirs(self._path, exist_ok=True)
        # Stream frames to the staged file per Arrow batch — task memory is
        # bounded by ONE batch, never the whole partition (the reader makes
        # the same per-batch guarantee; an in-memory buffer here would be
        # unbounded in partition size at 100 TB). The file is opened
        # LAZILY on the first frame and removed task-locally on any
        # failure, so a failing / killed task deterministically leaves no
        # staging behind (commit/abort's job-prefix sweep is the backstop
        # for attempts that die without running the except block).
        tmp_name = f".part-{self._job}-{uuid.uuid4().hex}.wirelog.tmp"
        tmp_path = os.path.join(self._path, tmp_name)
        n = 0
        fh = None
        try:
            for batch in iterator:
                if fh is None:
                    fh = open(tmp_path, "wb")
                names = batch.schema.names
                if names == ["frame"]:
                    for frame in batch.column("frame").to_pylist():
                        fh.write(frame)
                        n += 1
                else:
                    d = batch.to_pydict()
                    for key, value, headers in zip(d["key"], d["value"], d["headers"]):
                        _write_frame(
                            fh,
                            key or b"",
                            value or b"",
                            [(h["key"], h["value"]) for h in (headers or [])],
                        )
                        n += 1
        except BaseException:
            if fh is not None:
                fh.close()
                if os.path.exists(tmp_path):
                    os.remove(tmp_path)
            raise
        if fh is not None:
            fh.close()
        if not n and os.path.exists(tmp_path):
            os.remove(tmp_path)
        return WirelogCommit(tmp_name, n)

    def commit(self, messages) -> None:
        staged = [m for m in messages if m.n > 0]
        # Overwrite is made crash-safe by ORDERING: rename the staged
        # winners to their visible names FIRST, and only then delete the
        # pre-existing visible files this job did not produce. A driver
        # crash mid-commit leaves old+new data visible (recoverable /
        # idempotently re-committable) — never the old data deleted with
        # the new still hidden.
        pre_existing = {f for f in os.listdir(self._path) if f.endswith(".wirelog")}
        new_names = set()
        for m in staged:
            final = m.tmp_name[1:-4]  # strip leading "." and ".tmp"
            os.rename(
                os.path.join(self._path, m.tmp_name),
                os.path.join(self._path, final),
            )
            new_names.add(final)
        if self._overwrite:
            for f in pre_existing - new_names:
                os.remove(os.path.join(self._path, f))
        self._sweep_staged()

    def _sweep_staged(self) -> None:
        # Sweep THIS JOB's staged leftovers (losing speculative / retried /
        # killed task attempts): commit() renames only the reported winners
        # and abort()'s messages cover only tasks that returned, so
        # orphaned hidden tmps would otherwise accumulate forever. The
        # job-scoped prefix keeps a concurrent job's staging untouched.
        prefix = f".part-{self._job}-"
        for f in os.listdir(self._path):
            if f.startswith(prefix) and f.endswith(".wirelog.tmp"):
                os.remove(os.path.join(self._path, f))

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is None:
                continue
            tmp = os.path.join(self._path, m.tmp_name)
            if os.path.exists(tmp):
                os.remove(tmp)
        if os.path.isdir(self._path):
            self._sweep_staged()


class WirelogStreamWriter(DataSourceStreamWriter):
    """STREAMING sink half of the wirelog connector (``df.writeStream
    .format("wirelog")``) — the continuous twin of
    :class:`WirelogArrowWriter`, with EPOCH-IDEMPOTENT commits:

    * ``write`` (executor, once per task per micro-batch) streams frames
      row-by-row into a staged ``.part-<job>-<uuid>.wirelog.tmp`` (lazy
      open + task-local cleanup, the batch writer's discipline);
    * ``commit(messages, batchId)`` (driver, after the epoch's tasks all
      succeed) first deletes any visible ``part-b<batchId>-*.wirelog``
      left by a CRASHED previous attempt of the SAME epoch, then renames
      the staged winners to deterministic epoch-keyed names
      ``part-b<batchId>-<seq>.wirelog`` — so a replayed micro-batch
      REPLACES rather than duplicates its own output (exactly-once at
      the file level, the foreachBatch-upsert guarantee without user
      code);
    * ``abort(messages, batchId)`` removes the epoch's staging.

    At 100 TB this is the standard epoch-commit streaming-file-sink
    protocol (Spark's own FileStreamSink keeps the same idempotence via
    a batchId-keyed manifest; deterministic names stand in for the
    manifest here, matching the connector's directory-is-the-log model).
    """

    def __init__(self, options: dict):
        import uuid

        self._path = options.get("path")
        if not self._path:
            raise ValueError("wirelog stream writer requires a 'path' option")
        self._job = uuid.uuid4().hex

    def write(self, iterator) -> WirelogCommit:
        import uuid

        os.makedirs(self._path, exist_ok=True)
        tmp_name = f".part-{self._job}-{uuid.uuid4().hex}.wirelog.tmp"
        tmp_path = os.path.join(self._path, tmp_name)
        n = 0
        fh = None
        try:
            for row in iterator:
                if fh is None:
                    fh = open(tmp_path, "wb")
                _write_frame(
                    fh,
                    bytes(row.key or b""),
                    bytes(row.value or b""),
                    [(h.key, bytes(h.value)) for h in (row.headers or [])],
                )
                n += 1
        except BaseException:
            if fh is not None:
                fh.close()
                if os.path.exists(tmp_path):
                    os.remove(tmp_path)
            raise
        if fh is not None:
            fh.close()
        if not n and os.path.exists(tmp_path):
            os.remove(tmp_path)
        return WirelogCommit(tmp_name, n)

    def commit(self, messages, batchId: int) -> None:
        # Epoch idempotence: clear THIS epoch's previously-visible files
        # (a crashed attempt), then publish the new attempt under
        # deterministic epoch-keyed names.
        prefix = f"part-b{batchId:010d}-"
        for f in os.listdir(self._path):
            if f.startswith(prefix) and f.endswith(".wirelog"):
                os.remove(os.path.join(self._path, f))
        seq = 0
        for m in messages:
            if m is None or m.n == 0:
                continue
            os.rename(
                os.path.join(self._path, m.tmp_name),
                os.path.join(self._path, f"{prefix}{seq:05d}.wirelog"),
            )
            seq += 1
        for f in os.listdir(self._path):
            if f.startswith(f".part-{self._job}-") and f.endswith(".wirelog.tmp"):
                os.remove(os.path.join(self._path, f))

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            tmp = os.path.join(self._path, m.tmp_name)
            if os.path.exists(tmp):
                os.remove(tmp)
        if os.path.isdir(self._path):
            for f in os.listdir(self._path):
                if f.startswith(f".part-{self._job}-") and f.endswith(".wirelog.tmp"):
                    os.remove(os.path.join(self._path, f))
