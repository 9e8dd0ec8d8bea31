"""Text expression helpers (tokenize / normalize / shingle) — JVM-side.

Used by the dedup and text-analysis operators. Regexes are kept to the
portable subset (character classes, +) so the same pattern means the
same thing in Java regex (Spark) and RE2 (DuckDB oracles).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(v: Column | str) -> Column:
    return F.col(v) if isinstance(v, str) else v


def normalize_text(text: Column | str) -> Column:
    """Lowercase + collapse whitespace runs to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of the normalized text: array<string>."""
    return F.split(normalize_text(text), " ")


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles: array of space-joined k-grams (distinct).

    Built with transform over an index sequence — no explode needed when
    the consumer wants the per-document array (e.g. minhash input).
    """
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    # NULL/empty text would otherwise yield [""]: greatest(NULL-k, 0)=0
    # (greatest SKIPS nulls) makes idx=[0], and concat_ws over a null
    # slice is "" — so every empty doc would share one shingle and pair
    # as a perfect duplicate of every other. Strip empty shingles; empty
    # docs come back as [] and downstream minhash surfaces them as NULL.
    return F.array_remove(
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
            )
        ),
        "",
    )


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """Character n-grams of normalized text (distinct): array<string>."""
    norm = normalize_text(text)
    ln = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(norm, i, n)))
