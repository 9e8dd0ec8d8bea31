"""Portable fixed-point natural log: ``ln(x)`` in integer micros,
bit-identical in Spark SQL, DuckDB SQL, and pure Python.

Why this exists: the oracle-determinism doctrine (QUERIES.md) bans
libm in graded queries — float ``ln`` summation order and rounding
differ across engines, so a DuckDB oracle could never replay a
float-scored BM25 or PMI bit-for-bit. Rounds 1-9 side-stepped that
with LINEAR integer surrogates (idf = (N*1e6) DIV df), monotone per
term but NOT the textbook formula: multi-term BM25 sums can order
differently from log-idf when df ratios are large. This module closes
that gap — a true ``ln`` computed entirely in BIGINT ops that both
engines evaluate identically, so the textbook score IS the graded
score.

The algorithm (classic argument-reduction + atanh series, e.g.
Hart's *Computer Approximations* / cephes ``logl``):

    x >= 1 integer, e = floor(log2 x) = length(bin(x)) - 1
    m = (x * 1e9) DIV 2^e            -- mantissa in nanos, [1e9, 2e9)
    z = ((m - 1e9) * 1e9) DIV (m + 1e9)   -- atanh arg, [0, 3.34e8]
    ln m ~= 2*(z + z^3/3 + z^5/5 + z^7/7 + z^9/9 + z^11/11)   (nanos)
    ln x = e * ln2 + ln m ;  micros = (nanos + 500) DIV 1000

Error: series truncation <= 2*z^13/13 ~ 1e-7 at z = 1/3, fixed-point
truncation a few nanos per step, ln2 constant rounding <= 28 nanos at
e = 62 — worst observed |ln_micros/1e6 - math.log(x)| over the whole
BIGINT range (exhaustive small x + all 2^k, 2^k-1, 10^k probes) is
**0.59 micros**; a unit test pins the <= 1 micro bound. Determinism:
every op is integer mul / add / truncating-div on NON-NEGATIVE
operands (trunc == floor there), so Spark ``DIV``, DuckDB ``//`` and
Python ``//`` agree exactly; the one wide step (x * 1e9 for x up to
2^63) runs in DECIMAL(38,0) / HUGEINT / Python int.

Emitted as a STEP LIST (one derived column per step) rather than one
nested expression: z2 feeds five later steps and m feeds two, so full
inlining is exponential in text size; as chained columns it is linear
and both engines CSE it. Spark applies the steps as ``withColumn``s,
the DuckDB oracle as nested SELECTs — generated from the SAME list,
so the two engines cannot drift.

At 100 TB: ln is only ever applied at SUMMARY grain — per-term df
tables (vocabulary-sized, broadcast), 1-row corpus stats, bigram
count tables — never per posting/token row, so the per-row cost is
bounded by vocabulary size regardless of corpus size.

No reference counterpart (the reference's expression evaluator,
src/exec/expression.cpp:153-206, has no math functions at all);
beyond-reference surface per SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

LN2_NANOS = 693_147_181  # round(ln 2 * 1e9)
_B = 1_000_000_000


def ln_micros_py(x: int) -> int:
    """Pure-Python reference of the SQL step list (tests pin SQL == py
    == math.log within 1e-6)."""
    if x < 1:
        raise ValueError("ln_micros_py needs x >= 1")
    e = x.bit_length() - 1
    m = (x * _B) // (1 << e)
    z = ((m - _B) * _B) // (m + _B)
    z2 = (z * z) // _B
    z3 = (z * z2) // _B
    z5 = (z3 * z2) // _B
    z7 = (z5 * z2) // _B
    z9 = (z7 * z2) // _B
    z11 = (z9 * z2) // _B
    nanos = 2 * (z + z3 // 3 + z5 // 5 + z7 // 7 + z9 // 9 + z11 // 11) + e * LN2_NANOS
    return (nanos + 500) // 1000


def ln_micros_steps(
    x_sql: str, out_col: str, dialect: str, prefix: str | None = None
) -> list[tuple[str, str]]:
    """Ordered (column, expression) steps computing ``out_col`` =
    ln_micros(``x_sql``) in the given dialect ('spark' | 'duckdb').
    ``x_sql`` must be a non-negative-guaranteed positive BIGINT
    expression (callers pass counts >= 1). Temp columns are prefixed
    ``_<out_col>_`` unless ``prefix`` overrides."""
    if dialect == "spark":
        d, wide = "DIV", "DECIMAL(38,0)"
    elif dialect == "duckdb":
        d, wide = "//", "HUGEINT"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    p = prefix if prefix is not None else f"_{out_col}_"
    p2e = (
        f"shiftleft(CAST(1 AS BIGINT), CAST({p}e AS INT))"
        if dialect == "spark"
        else f"(CAST(1 AS BIGINT) << CAST({p}e AS INT))"
    )
    return [
        (f"{p}e", f"CAST(length(bin({x_sql})) - 1 AS BIGINT)"),
        (f"{p}m", f"CAST((CAST(({x_sql}) AS {wide}) * 1000000000) {d} {p2e} AS BIGINT)"),
        (f"{p}z", f"(({p}m - 1000000000) * 1000000000) {d} ({p}m + 1000000000)"),
        (f"{p}z2", f"({p}z * {p}z) {d} 1000000000"),
        (f"{p}z3", f"({p}z * {p}z2) {d} 1000000000"),
        (f"{p}z5", f"({p}z3 * {p}z2) {d} 1000000000"),
        (f"{p}z7", f"({p}z5 * {p}z2) {d} 1000000000"),
        (f"{p}z9", f"({p}z7 * {p}z2) {d} 1000000000"),
        (f"{p}z11", f"({p}z9 * {p}z2) {d} 1000000000"),
        (
            out_col,
            f"(2 * ({p}z + {p}z3 {d} 3 + {p}z5 {d} 5 + {p}z7 {d} 7"
            f" + {p}z9 {d} 9 + {p}z11 {d} 11)"
            f" + {p}e * CAST({LN2_NANOS} AS BIGINT) + 500) {d} 1000",
        ),
    ]


def with_ln_micros(df: DataFrame, x_sql: str, out_col: str) -> DataFrame:
    """Spark side: append ``out_col`` = ln_micros(``x_sql``) via the
    step list; temp columns are dropped. Apply at summary grain (term /
    corpus-stats tables), not per token row."""
    import pyspark.sql.functions as F

    steps = ln_micros_steps(x_sql, out_col, "spark")
    tmp = [c for c, _ in steps[:-1]]
    for c, ex in steps:
        df = df.withColumn(c, F.expr(ex))
    return df.drop(*tmp)


def duckdb_ln_select(inner_sql: str, x_sql: str, out_col: str) -> str:
    """DuckDB oracle side: wrap ``inner_sql`` (a SELECT producing the
    columns ``x_sql`` references) in nested SELECTs that append
    ``out_col`` and strip the temp step columns — the oracle twin of
    with_ln_micros, generated from the same step list."""
    steps = ln_micros_steps(x_sql, out_col, "duckdb")
    frm = f"({inner_sql})"
    for c, ex in steps:
        frm = f"(SELECT *, {ex} AS {c} FROM {frm})"
    tmp = ", ".join(c for c, _ in steps[:-1])
    return f"SELECT * EXCLUDE ({tmp}) FROM {frm}"
