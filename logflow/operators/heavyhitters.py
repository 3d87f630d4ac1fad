"""Distributed heavy hitters: Misra-Gries candidates + exact verification.

The two-pass frequent-items layout for data too wide to count exactly:

1. **Candidate pass** — each partition runs a Misra-Gries(k) summary
   (bounded memory: at most k counters regardless of partition size).
   The union of per-partition candidates provably contains every GLOBAL
   heavy hitter: if an item's count were ≤ n_p/k in every partition p,
   its global count would be ≤ n/k.
2. **Verify pass** — exact counts for the (small) candidate set only,
   then the exact threshold filter ``cnt · k > n``.

The final output is therefore EXACT and partitioning-independent — the
sketch only bounds the memory of the first pass, it never decides
membership — which is what makes the operator oracle-checkable against a
plain ``GROUP BY ... HAVING`` (an approximate top-k would be rows-only).

At 100 TB: pass 1 is map-side only (no shuffle, k counters per task);
pass 2 shuffles ONLY rows matching the broadcast candidate set, so the
full-vocabulary count shuffle (the thing that hurts when the long tail
is billions of distinct items) never happens.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries(k) candidate items, one row per
    (partition-local) surviving counter: ``(item)`` distinct.

    Arrow-batched; the counter dict is bounded at k entries. Candidate
    RECALL is guaranteed (see module doc); precision is what the verify
    pass is for.
    """
    import pandas as pd

    out_type = items.schema[col].dataType.simpleString()

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-merged Misra-Gries (the mergeable-summaries form, Agarwal
        # et al. 2013): add each Arrow batch's EXACT value_counts, then if
        # more than k counters survive, subtract the (k+1)-th largest
        # count from every counter and drop the non-positive ones. At
        # most k items can exceed that offset, and every subtraction of
        # `dec` removes >= (k+1)*dec total mass, so the cumulative
        # decrement any item ever suffers is < n_p/k — the classic MG
        # recall bound — while the per-batch work is a vectorized
        # value_counts instead of a per-row Python loop.
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                dec = sorted(counters.values(), reverse=True)[k]
                counters = {key: c - dec for key, c in counters.items() if c > dec}
        yield pd.DataFrame({col: list(counters.keys())}, dtype="object")

    # schema follows the input column's type — a hardcoded string schema
    # would coerce the verify semi-join and break the recall guarantee
    # for non-string items
    return items.mapInPandas(mg, f"{col} {out_type}").distinct()


def heavy_hitters_exact(items: DataFrame, col: str, k: int) -> DataFrame:
    """Items occurring MORE than n/k times, with exact counts.

    Output: ``(item, cnt, n_total)`` — deterministic (exact integer
    threshold ``cnt * k > n_total``) regardless of how the candidate
    pass partitioned the data.
    """
    from logflow.operators.cache import track

    # The item stream feeds three consumers (total count, MG candidate
    # pass, verify semi-join) — materialize it eagerly so an upstream
    # tokenize/explode chain runs ONCE, not 3x (the LSH-signature rule);
    # the count action both fills the cache and supplies the exact total.
    items = track(items.persist())
    n_total = items.count()
    cands = misra_gries_candidates(items, col, k)
    verified = (
        items.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return verified.filter(F.col("cnt") * F.lit(k) > F.lit(n_total)).select(
        col, "cnt", F.lit(n_total).cast("long").alias("n_total")
    )
