"""Reusable BPE merge operator over a weighted word-frequency table.

Factored out of queries/tokenizer.py so the same merge update runs over
ANY ``(w, freq)`` vocabulary DataFrame — the driver query binds it to the
documents corpus, the property suite drives it with adversarial random
vocabularies against a pure-Python reference. See queries/tokenizer.py
for the determinism rationale (exact-integer argmax, lexicographic
tiebreak, delimiter-guarded greedy replace).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigram_counts(cur: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over the spaced vocab."""
    syms = cur.select("freq", F.split(F.trim(F.col("sp")), " ").alias("s"))
    n = F.size("s")
    pairs = F.zip_with(
        F.slice("s", F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice("s", F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("sym_a"), b.alias("sym_b")),
    )
    return (
        syms.select("freq", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.sym_a").alias("sym_a"), F.col("p.sym_b").alias("sym_b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def bpe_merge_table(words: DataFrame, steps: int) -> DataFrame:
    """Run ``steps`` BPE merges over a ``(w, freq)`` vocabulary.

    Returns one row per merge: ``(step, sym_a, sym_b, merged, cnt)``.
    Corpus-scale cost is the caller's word-frequency aggregation; each
    merge here is vocab-scale (bigram partial agg + 1-row argmax
    broadcast + map-side replace).
    """
    spaced = F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 "))
    cur = words.select("freq", spaced.alias("sp"))
    merges: list[DataFrame] = []
    for step in range(1, steps + 1):
        best = (
            _bigram_counts(cur)
            .orderBy(F.desc("cnt"), "sym_a", "sym_b")
            .limit(1)
            .select(
                F.lit(step).cast("long").alias("step"),
                "sym_a",
                "sym_b",
                F.concat("sym_a", "sym_b").alias("merged"),
                "cnt",
            )
        )
        merges.append(best)
        pat = F.concat(F.lit(" "), F.col("sym_a"), F.lit(" "), F.col("sym_b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        cur = cur.crossJoin(F.broadcast(best.select("sym_a", "sym_b", "merged"))).select(
            "freq", F.replace(F.col("sp"), pat, rep).alias("sp")
        )
        if step < steps:
            # truncate lineage each round: without this the plan (and the
            # recomputation of every earlier argmax, referenced by both the
            # union branch and the crossJoin) roughly doubles per step —
            # fine at steps=2, fatal at the advertised merge-table scale.
            # Lazy variant: materializes at first execution (CLAUDE.md
            # iterative-algorithm guidance), vocab-sized so the cost is
            # one small job per round.
            cur = cur.localCheckpoint(eager=False)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def bpe_apply_table(words: DataFrame, steps: int) -> DataFrame:
    """Train ``steps`` merges over a ``(w, freq)`` vocabulary and APPLY
    them, returning ``(w, freq, sp)`` — each word's delimiter-guarded
    spaced symbol string after the learned merges.

    The tokenizer-apply half of the BPE story: training cost is identical
    to :func:`bpe_merge_table` (the loop is the same update), and
    application stays VOCABULARY-scale — encoding a 100 TB corpus is then
    one hash join from the exploded corpus onto this table, never a
    per-document merge loop. Merge semantics are the same delimiter-
    guarded greedy replace (see :func:`bpe_merge_reference` for the
    left-to-right contract all three engines share).
    """
    spaced = F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 "))
    cur = words.select("w", "freq", spaced.alias("sp"))
    for step in range(1, steps + 1):
        best = (
            _bigram_counts(cur)
            .orderBy(F.desc("cnt"), "sym_a", "sym_b")
            .limit(1)
            .select("sym_a", "sym_b", F.concat("sym_a", "sym_b").alias("merged"))
        )
        pat = F.concat(F.lit(" "), F.col("sym_a"), F.lit(" "), F.col("sym_b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        cur = cur.crossJoin(F.broadcast(best)).select(
            "w", "freq", F.replace(F.col("sp"), pat, rep).alias("sp")
        )
        if step < steps:
            cur = cur.localCheckpoint(eager=False)  # see bpe_merge_table
    return cur


def bpe_merge_reference(
    word_freqs: dict[str, int], steps: int
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python model of :func:`bpe_merge_table` (property-test oracle).

    Models the engine contract EXACTLY by operating on the same
    delimiter-guarded spaced form with ``str.replace`` — Python, Java
    and DuckDB ``replace`` all share left-to-right non-overlapping
    semantics that continue AFTER the replaced text. The consequence
    (and the trap a list-walk model falls into): in a run of repeated
    pairs like ``a b a b``, the first match consumes the shared middle
    delimiter, so only alternating occurrences merge in one step —
    ``abab`` becomes ``(ab) a b``, not ``(ab)(ab)``. The Spark/DuckDB
    oracle pair proves both engines agree on this; the reference must
    agree with THEM, not with textbook list merging.
    """
    vocab: list[tuple[str, int]] = [
        (" " + " ".join(w) + " ", f) for w, f in word_freqs.items()
    ]
    out: list[tuple[int, str, str, str, int]] = []
    for step in range(1, steps + 1):
        counts: dict[tuple[str, str], int] = {}
        for sp, f in vocab:
            syms = sp.split()
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((step, a, b, a + b, cnt))
        vocab = [
            (sp.replace(f" {a} {b} ", f" {a}{b} "), f) for sp, f in vocab
        ]
    return out
