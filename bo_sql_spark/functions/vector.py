"""Vector math over ArrayType columns — pure built-in expressions.

``F.zip_with`` + ``F.aggregate`` compile to Catalyst higher-order
functions: the dot product of two array<double> columns runs inside
whole-stage codegen, no Python boundary, no UDF. Accumulation is
sequential in index order, so results are deterministic (and match any
other engine that sums left-to-right in double).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (summed in index order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-null."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
