"""Text-analysis expressions: tokenize, shingle, n-gram — all built-in.

Everything is a higher-order array expression (JVM-side, codegen-friendly);
no Python touches the hot path.  Each helper has an exact DuckDB mirror in
logflow/queries/llm.py — tokenization must match bit-for-bit for the
oracle, so the rules are pinned:

* tokens: ``lower(text)`` split on ``\\s+`` with empty strings dropped;
* word k-shingles: positions 1..n-k+1, space-joined;
* char n-grams: positions 1..len-n+1 over the lowercased text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    words = F.split(F.lower(_c(text)), r"\s+")
    return F.filter(words, lambda t: t != F.lit(""))


def word_shingles(tokens: Column | str, k: int = 3) -> Column:
    """Space-joined word k-shingles; empty array when < k tokens.

    Guarded because Spark's ``sequence(1, n)`` DESCENDS when n < 1 —
    an unguarded expression would fabricate shingles for short docs.
    """
    toks = _c(tokens)
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    make = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(F.size(toks) >= k, make).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column | str, n: int = 4, pre_lowered: bool = False) -> Column:
    """Character n-grams over lower(text); empty array when shorter than n.

    The transform lambda references the source string once per position,
    so pass a MATERIALIZED (projected) column with ``pre_lowered=True``
    for long texts — closing over a computed expression re-evaluates it
    per n-gram (O(len²) interpreted work per row).
    """
    lowered = _c(text) if pre_lowered else F.lower(_c(text))
    idx = F.sequence(F.lit(1), F.length(lowered) - (n - 1))
    make = F.transform(idx, lambda i: F.substring(lowered, i, n))
    return F.when(F.length(lowered) >= n, make).otherwise(F.array().cast("array<string>"))


#: Stopword list shared with the oracle (text-quality scoring).
STOPWORDS = ("the", "a", "and", "of", "to", "in")

#: Language marker tokens shared with the oracle (language-ID heuristic).
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "die", "und"),
}
