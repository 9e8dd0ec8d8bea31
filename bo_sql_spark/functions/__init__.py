"""Reusable column-expression helpers — all JVM-side.

Everything here composes built-in pyspark.sql.functions into higher-level
expressions (no Python UDFs): whole-stage codegen applies, and the same
expression works identically on a 1000-executor cluster.
"""

from bo_sql_spark.functions.vector import cosine_similarity, dot, l2_norm
from bo_sql_spark.functions.textfn import (
    char_ngrams,
    normalize_text,
    tokens,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "tokens",
    "normalize_text",
    "char_ngrams",
    "word_shingles",
]
