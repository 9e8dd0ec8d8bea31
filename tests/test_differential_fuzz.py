"""Property-based differential testing: random queries, Spark vs DuckDB.

Generates random queries over the star schema and asserts Spark and
DuckDB agree exactly. The grammar covers 20+ generated shapes: nested
AND/OR/NOT predicates (numeric + string atoms) fed through filters,
inner/left two- and three-way join chains, window functions (ranking +
framed aggregates), grouped aggregation, ROLLUP / CUBE / GROUPING
SETS, UNION [ALL] / INTERSECT / EXCEPT, CASE WHEN + integer
arithmetic chains, [NOT] IN subqueries, portable-hash cross-engine
identity, and the word-shingle rewrite vs a Python reference. Catches
dialect drift (comparison semantics, null handling, grouping,
set-op dedup) that hand-picked queries miss — it already caught the
empty-input ROLLUP divergence documented inline. Deterministic
(derandomize) so CI never flakes.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = ["A", "N", "R", "O", "F"]
CMP = ["<", "<=", ">", ">=", "=", "<>"]

# constants chosen to straddle each column's actual range
CONSTS = {
    "l_quantity": [1.0, 10.0, 25.0, 50.0],
    "l_extendedprice": [1000.0, 20000.0, 60000.0],
    "l_discount": [0.0, 0.02, 0.05, 0.1],
    "l_tax": [0.0, 0.04, 0.08],
}


@st.composite
def predicate(draw, depth: int = 0):
    kind = draw(st.sampled_from(["num", "str"] + (["and", "or", "not"] if depth < 2 else [])))
    if kind == "num":
        c = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(CMP))
        v = draw(st.sampled_from(CONSTS[c]))
        return f"({c} {op} {v})"
    if kind == "str":
        c = draw(st.sampled_from(STR_COLS))
        op = draw(st.sampled_from(["=", "<>"]))
        v = draw(st.sampled_from(STR_VALS))
        return f"({c} {op} '{v}')"
    if kind == "not":
        return f"(NOT {draw(predicate(depth + 1))})"
    a, b = draw(predicate(depth + 1)), draw(predicate(depth + 1))
    return f"({a} {'AND' if kind == 'and' else 'OR'} {b})"


@pytest.fixture(scope="module")
def ctx(spark, oracle_con, sf_dir):
    from bo_sql_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark, oracle_con


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate())
def test_random_filter_counts_agree(ctx, pred):
    spark, con = ctx
    sql = f"SELECT COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS s FROM lineitem WHERE {pred}"
    got = spark.sql(sql).first()
    want = con.execute(sql).fetchone()
    assert got["n"] == want[0], f"{pred}: count {got['n']} != {want[0]}"
    gs = got["s"] if got["s"] is not None else None
    ws = want[1]
    assert gs == ws, f"{pred}: sum {gs} != {ws}"  # integer-valued doubles: exact


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    join_how=st.sampled_from(["JOIN", "LEFT JOIN"]),
    pred=predicate(),
    status=st.sampled_from(["F", "O", "P"]),
)
def test_random_join_agg_agrees(ctx, join_how, pred, status):
    spark, con = ctx
    sql = (
        "SELECT o_orderstatus AS st, COUNT(*) AS n, "
        "COUNT(l_orderkey) AS n_items "
        f"FROM (SELECT * FROM orders WHERE o_orderstatus <> '{status}') o "
        f"{join_how} (SELECT * FROM lineitem WHERE {pred}) l "
        "ON o.o_orderkey = l.l_orderkey GROUP BY o_orderstatus"
    )
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"{sql}: {got} vs {want}"


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    part=st.sampled_from(STR_COLS),
    order=st.sampled_from(["l_extendedprice", "l_quantity"]),
    fn=st.sampled_from(
        ["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "COUNT(*)", "SUM(l_linenumber)"]
    ),
    pred=predicate(),
)
def test_random_window_agrees(ctx, part, order, fn, pred):
    spark, con = ctx
    # fully tie-broken ordering makes every window function deterministic;
    # ranking functions don't take an explicit frame, aggregates do
    frame = (
        "" if "(" in fn and fn.endswith("()") and "COUNT" not in fn and "SUM" not in fn
        else " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, CAST({fn} OVER ("
        f"PARTITION BY {part} ORDER BY {order}, l_orderkey, l_linenumber"
        f"{frame}) AS BIGINT) AS w "
        f"FROM lineitem WHERE {pred}"
    )
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"{sql}: first diff {next(((g, w) for g, w in zip(got, want) if g != w), None)}"


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    key=st.sampled_from(STR_COLS + ["l_linenumber"]),
    measure=st.sampled_from(NUM_COLS),
    pred=predicate(),
)
def test_random_grouped_agg_agrees(ctx, key, measure, pred):
    spark, con = ctx
    sql = (
        f"SELECT {key} AS k, COUNT(*) AS n, ROUND(SUM({measure}), 2) AS s, "
        f"ROUND(MIN({measure}), 6) AS mn, ROUND(MAX({measure}), 6) AS mx "
        f"FROM lineitem WHERE {pred} GROUP BY {key}"
    )
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"{sql}: {got[:3]} vs {want[:3]}"


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=-(10**12), max_value=10**12), min_size=1, max_size=30
    ),
    salt=st.integers(min_value=0, max_value=10_000),
)
def test_portable_hash_agrees_across_engines(ctx, ids, salt):
    """Every sampling/split/shuffle decision rides on portable_hash;
    Spark's column expression and the SQL text the oracles embed must
    agree for ANY id, including negatives (engine % semantics differ:
    DuckDB % is sign-of-dividend, Spark pmod is non-negative — the SQL
    normalization must cancel that)."""
    import duckdb

    from bo_sql_spark.operators.sampling import portable_hash, portable_hash_sql

    spark, _ = ctx
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", portable_hash("id", salt).alias("h")).collect()
    }
    con = duckdb.connect()
    expr = portable_hash_sql("id", salt)
    want = dict(
        con.execute(
            f"SELECT id, {expr} AS h FROM (SELECT unnest(?) AS id)", [ids]
        ).fetchall()
    )
    assert got == want


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.sampled_from(list("ab c\t\n")), max_size=40
            ),
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=2, max_value=5),
)
def test_word_shingles_matches_python_reference(spark, texts, k):
    """The zip_with-chain word_shingles must agree with a direct Python
    reference (normalize -> split -> k-gram -> distinct, single partial
    gram for short docs, [] for NULL/empty) on arbitrary whitespace-y
    inputs — guards the chained-slice rewrite's edge cases."""
    import re

    import pyspark.sql.functions as F

    from bo_sql_spark.functions import word_shingles

    def ref(text):
        if text is None:
            return []
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        if len(toks) <= k:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        seen, out = set(), []
        for g in grams:
            if g and g not in seen:
                seen.add(g)
                out.append(g)
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", word_shingles(F.col("text"), k).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref(t), (t, k, got[i], ref(t))


def _nullsafe_sorted(rows):
    # rollup/cube emit NULL group keys; None is unorderable against str
    # in Python, so sort on a (is_null, value) key per column
    return sorted(
        rows, key=lambda t: tuple((x is None, "" if x is None else str(x)) for x in t)
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    mode=st.sampled_from(
        [
            "ROLLUP (l_returnflag, l_linestatus)",
            "CUBE (l_returnflag, l_linestatus)",
            "GROUPING SETS ((l_returnflag), (l_linestatus), ())",
            "GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))",
        ]
    ),
    pred=predicate(),
)
def test_random_grouping_sets_agree(ctx, mode, pred):
    """ROLLUP / CUBE / GROUPING SETS super-aggregate rows (NULL-filled
    keys, duplicated grouping combinations) must match exactly."""
    spark, con = ctx
    sql = (
        "SELECT l_returnflag AS a, l_linestatus AS b, COUNT(*) AS n, "
        "SUM(l_linenumber) AS s "
        f"FROM lineitem WHERE {pred} GROUP BY {mode}"
    )
    got = _nullsafe_sorted(tuple(r) for r in spark.sql(sql).collect())
    want = _nullsafe_sorted(tuple(r) for r in con.execute(sql).fetchall())
    if not got and all(r[2] == 0 for r in want):
        # Documented divergence (found by this fuzzer): on an EMPTY
        # input, DuckDB emits the SQL standard's super-aggregate rows
        # (grand total (NULL, NULL, 0, NULL) for ROLLUP/CUBE/a () set)
        # while Spark emits no rows at all. Registered oracle queries
        # never aggregate an empty relation, so only the fuzzer sees it.
        return
    assert got == want, f"{sql}: {got[:4]} vs {want[:4]}"


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how1=st.sampled_from(["JOIN", "LEFT JOIN"]),
    how2=st.sampled_from(["JOIN", "LEFT JOIN"]),
    pred=predicate(),
    seg=st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
)
def test_random_three_way_join_agrees(ctx, how1, how2, pred, seg):
    """lineitem -> orders -> customer chains with mixed inner/left
    joins: row multiplicity, null-extension, and the count(col) vs
    count(*) distinction must all line up."""
    spark, con = ctx
    sql = (
        "SELECT COUNT(*) AS n, COUNT(o.o_orderkey) AS n_ord, "
        "COUNT(c.c_custkey) AS n_cust "
        f"FROM (SELECT * FROM lineitem WHERE {pred}) l "
        f"{how1} orders o ON l.l_orderkey = o.o_orderkey "
        f"{how2} (SELECT * FROM customer WHERE c_mktsegment = '{seg}') c "
        "ON o.o_custkey = c.c_custkey"
    )
    got = tuple(spark.sql(sql).first())
    want = con.execute(sql).fetchone()
    assert got == tuple(want), f"{sql}: {got} vs {want}"


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]),
    p1=predicate(),
    p2=predicate(),
)
def test_random_set_ops_agree(ctx, op, p1, p2):
    """UNION [ALL] / INTERSECT / EXCEPT over projected key pairs:
    both engines apply DISTINCT semantics to the non-ALL forms."""
    spark, con = ctx
    sql = (
        f"SELECT l_returnflag, l_linestatus FROM lineitem WHERE {p1} "
        f"{op} "
        f"SELECT l_returnflag, l_linestatus FROM lineitem WHERE {p2}"
    )
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"{sql}: {len(got)} vs {len(want)} rows"


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicate(),
    mul=st.integers(min_value=1, max_value=9),
    add=st.integers(min_value=0, max_value=99),
    mod=st.integers(min_value=2, max_value=31),
)
def test_random_case_and_integer_arith_agree(ctx, pred, mul, add, mod):
    """CASE WHEN over fuzzed predicates + integer *, +, % chains (all
    operands non-negative: % sign semantics differ between engines for
    negative dividends and are normalized elsewhere) must agree on
    exact BIGINT sums."""
    spark, con = ctx
    sql = (
        f"SELECT SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS n_match, "
        f"SUM((l_linenumber * {mul} + {add}) % {mod}) AS s_arith "
        "FROM lineitem"
    )
    got = tuple(spark.sql(sql).first())
    want = con.execute(sql).fetchone()
    assert got == tuple(want), f"{sql}: {got} vs {want}"


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicate(),
    sub_pred=predicate(),
    quant=st.sampled_from(["IN", "NOT IN"]),
)
def test_random_in_subquery_agrees(ctx, pred, sub_pred, quant):
    """[NOT] IN (uncorrelated subquery) over join keys: membership
    semantics and dedup inside the subquery must match."""
    spark, con = ctx
    sql = (
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey "
        f"{quant} (SELECT l_orderkey FROM lineitem WHERE {sub_pred}) "
        f"AND o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE {pred})"
    )
    got = spark.sql(sql).first()["n"]
    want = con.execute(sql).fetchone()[0]
    assert got == want, f"{sql}: {got} vs {want}"


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
                width=64,
            ),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    ).filter(lambda vs: len({len(v) for v in vs}) == 1),
)
def test_dot_product_bitwise_parity_with_duckdb(ctx, vecs):
    """THE load-bearing assumption of every similarity oracle: Spark's
    zip_with/aggregate dot (sequential index-order sum) must be
    BITWISE equal to DuckDB's list_dot_product on arbitrary doubles —
    compared via struct equality of the raw float bits, not rounding.
    If either engine ever changes summation order (pairwise/SIMD),
    this fails before a registered query flakes."""
    import struct

    import pyspark.sql.functions as F

    from bo_sql_spark.functions import dot

    import pyarrow as pa

    spark, con = ctx
    q = vecs[0]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    qcol = F.array(*[F.lit(float(x)) for x in q])
    got = {
        r["vec_id"]: r["d"]
        for r in df.select("vec_id", dot(F.col("v"), qcol).alias("d")).collect()
    }
    # deliver the doubles to DuckDB via Arrow, exactly as parquet does
    # for the real oracles — float literals in SQL text go through the
    # DECIMAL parser and can land a ULP off (measured), which would
    # test the literal path, not the dot product
    tbl = pa.table(
        {
            "vec_id": pa.array([i for i, _ in rows], type=pa.int64()),
            "v": pa.array([v for _, v in rows], type=pa.list_(pa.float64())),
        }
    )
    con.register("fuzz_vecs", tbl)
    want = dict(
        con.execute(
            "SELECT vec_id, list_dot_product(v, (SELECT v FROM fuzz_vecs WHERE vec_id = 0)) FROM fuzz_vecs"
        ).fetchall()
    )
    con.unregister("fuzz_vecs")
    for i in got:
        a = struct.pack("<d", got[i])
        b = struct.pack("<d", want[i])
        assert a == b, (i, got[i], want[i])


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.integers(min_value=2, max_value=24).flatmap(
        lambda d: st.lists(
            st.lists(
                st.floats(
                    min_value=-1e3,
                    max_value=1e3,
                    allow_nan=False,
                    allow_infinity=False,
                    width=64,
                ),
                min_size=d,
                max_size=d,
            ).map(lambda v: v if any(x != 0 for x in v) else [1.0] + v[1:]),
            min_size=2,
            max_size=6,
        )
    ),
)
def test_cosine_round6_parity_with_duckdb(ctx, vecs):
    """End-to-end parity of the registered similarity pipeline's score
    path: cosine (dot / (sqrt(dot)*sqrt(dot))) rounded to 6dp must
    agree exactly across engines on arbitrary non-zero doubles —
    covers the sqrt and division steps the raw dot test doesn't."""
    import pyarrow as pa
    import pyspark.sql.functions as F

    from bo_sql_spark.functions import cosine_similarity

    spark, con = ctx
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    qcol = F.array(*[F.lit(float(x)) for x in vecs[0]])
    got = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", F.round(cosine_similarity(F.col("v"), qcol), 6).alias("c")
        ).collect()
    }
    tbl = pa.table(
        {
            "vec_id": pa.array([i for i, _ in rows], type=pa.int64()),
            "v": pa.array([v for _, v in rows], type=pa.list_(pa.float64())),
        }
    )
    con.register("fuzz_cos_vecs", tbl)
    want = dict(
        con.execute(
            """
            SELECT vec_id,
                   ROUND(list_dot_product(v, q.qv)
                         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q.qv, q.qv))), 6)
            FROM fuzz_cos_vecs, (SELECT v AS qv FROM fuzz_cos_vecs WHERE vec_id = 0) q
            """
        ).fetchall()
    )
    con.unregister("fuzz_cos_vecs")
    assert got == pytest.approx(want, abs=0)  # exact equality, dict-wise


# --------------------------------------------------------------------
# Fixed-point doctrine families (round 7): every ANN/text oracle in the
# registry rests on integer-micro arithmetic — quantize with
# FLOOR(x*S + 0.5), integer DIV (never /), grouped micro-means,
# struct-min tie-breaks. These five generators fuzz the DOCTRINE
# itself: random scales and random op-chains rendered into BOTH
# dialects from one AST, asserted exactly equal.

FP_SCALES = [1_000, 100_000, 1_000_000]
FP_COLS = ["l_quantity", "l_discount", "l_tax", "l_linenumber"]


@st.composite
def int_op_chain(draw):
    """Random chain of integer ops applied to a BIGINT micro value:
    [(op, const), ...] with op in DIV/MUL/ADD/MOD. Non-negative domain
    (the doctrine's: micros of non-negative measures) so DIV and %
    agree across engines by construction; at most one MUL keeps every
    intermediate far under 2^63."""
    n = draw(st.integers(min_value=1, max_value=4))
    ops, muls = [], 0
    for _ in range(n):
        op = draw(st.sampled_from(["DIV", "MUL", "ADD", "MOD"]))
        if op == "MUL":
            if muls:
                op = "ADD"
            muls += 1
        const = {
            "DIV": draw(st.sampled_from([3, 7, 10, 97, 1000])),
            "MUL": draw(st.sampled_from([3, 11])),
            "ADD": draw(st.integers(min_value=0, max_value=10_000)),
            "MOD": draw(st.sampled_from([97, 1009, 65_536])),
        }[op]
        ops.append((op, const))
    return ops


def _render_chain(expr: str, ops, dialect: str) -> str:
    for op, c in ops:
        if op == "DIV":
            expr = f"({expr} {'DIV' if dialect == 'spark' else '//'} {c})"
        elif op == "MUL":
            expr = f"({expr} * {c})"
        elif op == "ADD":
            expr = f"({expr} + {c})"
        else:
            expr = f"({expr} % {c})"
    return expr


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(col=st.sampled_from(FP_COLS), scale=st.sampled_from(FP_SCALES), pred=predicate())
def test_fp_quantize_sum_agrees(ctx, col, scale, pred):
    """Family 1 — quantize-then-aggregate: SUM/MIN/MAX/COUNT over
    CAST(FLOOR(col*S + 0.5) AS BIGINT) at random scales must agree
    exactly (DuckDB sums BIGINT into HUGEINT; comparing through a
    BIGINT cast pins that the doctrine's magnitudes never need it)."""
    spark, con = ctx
    q = f"CAST(FLOOR({col} * {scale} + 0.5) AS BIGINT)"
    sql = (
        f"SELECT COUNT(*) AS n, CAST(SUM({q}) AS BIGINT) AS s, "
        f"MIN({q}) AS mn, MAX({q}) AS mx FROM lineitem WHERE {pred}"
    )
    got = tuple(spark.sql(sql).first())
    want = con.execute(sql).fetchone()
    assert got == tuple(want), (sql, got, want)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(col=st.sampled_from(FP_COLS), scale=st.sampled_from(FP_SCALES), ops=int_op_chain())
def test_fp_div_chain_agrees(ctx, col, scale, ops):
    """Family 2 — integer op-chains: random DIV/*,+,% chains over
    micros, rendered as Spark `DIV` and DuckDB `//` from one AST.
    This is the doctrine's core claim (integer DIV is engine-portable
    where float / is not) fuzzed directly."""
    spark, con = ctx
    base = f"CAST(FLOOR({col} * {scale} + 0.5) AS BIGINT)"
    s_expr = _render_chain(base, ops, "spark")
    d_expr = _render_chain(base, ops, "duck")
    s_sql = f"SELECT CAST(SUM({s_expr}) AS BIGINT) AS s, MIN({s_expr}) AS mn FROM lineitem"
    d_sql = f"SELECT CAST(SUM({d_expr}) AS BIGINT) AS s, MIN({d_expr}) AS mn FROM lineitem"
    got = tuple(spark.sql(s_sql).first())
    want = con.execute(d_sql).fetchone()
    assert got == tuple(want), (ops, got, want)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scale=st.sampled_from(FP_SCALES),
    shift=st.sampled_from([0.0, 0.05, 0.5, 3.14159, 25.0]),
)
def test_fp_round_half_up_signed_agrees(ctx, scale, shift):
    """Family 3 — round-half-up on SIGNED values: the quantizer
    FLOOR(x*S + 0.5) must agree on negative inputs too (centered
    columns appear in every embedding oracle; floor(-0.5+0.5)=0 vs
    truncation would diverge silently). Exercised by shifting a
    column below zero."""
    spark, con = ctx
    e = f"CAST(FLOOR((l_discount - {shift}) * {scale} + 0.5) AS BIGINT)"
    sql = (
        f"SELECT CAST(SUM({e}) AS BIGINT) AS s, MIN({e}) AS mn, MAX({e}) AS mx "
        "FROM lineitem"
    )
    got = tuple(spark.sql(sql).first())
    want = con.execute(sql).fetchone()
    assert got == tuple(want), (sql, got, want)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    col=st.sampled_from(["l_quantity", "l_extendedprice"]),
    scale=st.sampled_from(FP_SCALES),
    key=st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]),
)
def test_fp_grouped_micro_mean_agrees(ctx, col, scale, key):
    """Family 4 — the codeword-mean pattern (PQ/SQ8 training oracles):
    per-group CAST(FLOOR(SUM(micros) * 1.0 / COUNT(*) + 0.5) AS
    BIGINT). The inner division is IEEE double (correctly rounded in
    both engines); fuzzing scales x keys pins that the float excursion
    re-lands on the same integer everywhere."""
    spark, con = ctx
    m = f"CAST(FLOOR({col} * {scale} + 0.5) AS BIGINT)"
    sql = (
        f"SELECT {key} AS k, "
        f"CAST(FLOOR(SUM({m}) * 1.0 / COUNT(*) + 0.5) AS BIGINT) AS mean_micro "
        f"FROM lineitem GROUP BY {key}"
    )
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, (sql, got[:3], want[:3])


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    mod=st.sampled_from([2, 3, 5, 7]),
    key=st.sampled_from(["l_returnflag", "l_linestatus"]),
    scale=st.sampled_from(FP_SCALES),
)
def test_fp_struct_min_tiebreak_agrees(ctx, mod, key, scale):
    """Family 5 — struct-min tie-breaks (the argmin rule of every
    IVF/SemDeDup/winnowing oracle): min over (value, id) structs with
    PLANTED ties (value = micros % mod collapses to mod buckets) must
    pick the same id in both engines — lexicographic struct ordering,
    id as the deterministic tie-break."""
    spark, con = ctx
    v = f"(CAST(FLOOR(l_quantity * {scale} + 0.5) AS BIGINT) % {mod})"
    s_sql = (
        f"SELECT {key} AS k, min(named_struct('v', {v}, 'id', l_orderkey)).id AS arg "
        f"FROM lineitem GROUP BY {key}"
    )
    d_sql = (
        f"SELECT {key} AS k, (min({{'v': {v}, 'id': l_orderkey}})).id AS arg "
        f"FROM lineitem GROUP BY {key}"
    )
    got = sorted(tuple(r) for r in spark.sql(s_sql).collect())
    want = sorted(tuple(r) for r in con.execute(d_sql).fetchall())
    assert got == want, (got, want)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_md5_prefix_bigint_hash_agrees(ctx, texts):
    """Family 6 — the winnowed span-dedup hash: the first 15 hex
    digits of md5 as BIGINT (Spark conv(substr(md5)) vs DuckDB
    ('0x'||substr(md5))::BIGINT) must agree byte-for-byte on
    arbitrary strings including empty and non-ASCII — this 60-bit
    value drives BOTH the winnow selection and the dup grouping, so
    one divergent bit flips which positions are fingerprinted."""
    import pyarrow as pa
    import pyspark.sql.functions as F

    spark, con = ctx
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i",
            F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        ).collect()
    }
    tbl = pa.table(
        {
            "i": pa.array([i for i, _ in rows], type=pa.int64()),
            "s": pa.array([t for _, t in rows], type=pa.string()),
        }
    )
    con.register("fuzz_md5", tbl)
    want = dict(
        con.execute(
            "SELECT i, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FROM fuzz_md5"
        ).fetchall()
    )
    con.unregister("fuzz_md5")
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_min=st.integers(min_value=1, max_value=10**9),
    n=st.integers(min_value=1, max_value=10**12),
    halves=st.integers(min_value=1, max_value=3),
)
def test_fp_sqrt_rate_threshold_agrees(ctx, n_min, n, halves):
    """Family 7 — the temperature-mix threshold chain:
    FLOOR(sqrt^h(n_min/n) * P) must agree exactly for arbitrary
    stratum counts. sqrt and division are IEEE-correctly-rounded (the
    reason the operator restricts exponents to sqrt chains); this
    fuzzes that the full double excursion re-lands on the same BIGINT
    in both engines at every half-power depth."""
    spark, con = ctx
    if n < n_min:
        n_min, n = n, n_min
    expr = f"CAST({n_min} AS DOUBLE) / CAST({n} AS DOUBLE)"
    for _ in range(halves):
        expr = f"SQRT({expr})"
    sql = f"SELECT CAST(FLOOR({expr} * 1000000007) AS BIGINT) AS t"
    got = spark.sql(sql).first()["t"]
    want = con.execute(sql).fetchone()[0]
    assert got == want, (n_min, n, halves, got, want)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**10 - 1),
            st.integers(min_value=0, max_value=2**10 - 1),
        ),
        min_size=1,
        max_size=30,
    ),
    bits=st.integers(min_value=1, max_value=16),
)
def test_zorder_code_agrees_across_engines(ctx, pts, bits):
    """Family 7 — the Morton interleave: Spark's shiftleft/shiftright
    column chain and the SQL text the zorder_locality oracle embeds
    must agree bit-for-bit for any (x, y) and any bits<=16, and match
    a direct Python bit-interleave reference."""
    import duckdb

    from bo_sql_spark.operators.layout import zorder_code, zorder_code_sql

    spark, _ = ctx
    mask = (1 << bits) - 1
    df = spark.createDataFrame([(x, y) for x, y in pts], "x long, y long")
    got = [
        r["z"]
        for r in df.select(zorder_code("x", "y", bits=bits).alias("z"))
        .orderBy("z")
        .collect()
    ]
    con = duckdb.connect()
    expr = zorder_code_sql("x", "y", bits=bits)
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM (SELECT unnest(?) AS x, unnest(?) AS y)",
            [[p[0] for p in pts], [p[1] for p in pts]],
        ).fetchall()
    )
    assert got == want

    def py_z(x, y):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == sorted(py_z(x & mask, y & mask) for x, y in pts)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.text(
            alphabet=st.sampled_from(list("abc:0 _")), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=25,
    ),
    width=st.sampled_from([16, 64, 256, 1024]),
)
def test_count_min_bucket_hash_agrees_across_engines(ctx, keys, width):
    """Family 8 — the CM sketch's bucket hash (md5-prefix BIGINT mod
    width, keyed '<r>:<key>'): Spark's conv() chain and the DuckDB
    '0x'||substr cast the oracle uses must place every (r, key) in the
    same bucket — including keys containing the ':' separator itself."""
    import duckdb

    import pyspark.sql.functions as F

    spark, _ = ctx
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = df.select(
        "k",
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(str(r)), F.col("k"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(width),
            ).alias(f"b{r}")
            for r in range(4)
        ],
    ).collect()
    got = {(r["k"], i): r[f"b{i}"] for r in rows for i in range(4)}
    con = duckdb.connect()
    want = {}
    for r in range(4):
        for k, b in con.execute(
            "SELECT k, CAST(CAST(('0x' || substr(md5(CAST(? AS VARCHAR) || ':' || k), 1, 15))"
            f" AS BIGINT) % {width} AS BIGINT) FROM (SELECT unnest(?) AS k)",
            [r, keys],
        ).fetchall():
            want[(k, r)] = b
    # duplicate keys collapse in dicts identically on both sides
    assert {(k, r): v for (k, r), v in got.items()} == want


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    budget=st.integers(min_value=1, max_value=400),
    salt=st.integers(min_value=0, max_value=100),
    n_shards=st.sampled_from([2, 3, 16]),
)
def test_sharded_budget_cut_equals_naive_window(ctx, rows, budget, salt, n_shards):
    """Family 9 — the contiguous-shard running-sum decomposition:
    take_token_budget at any n_shards must equal the naive single
    per-source window (n_shards=1) row-for-row, for arbitrary ids,
    budgets, and salts (shard boundaries land mid-source at random)."""
    from bo_sql_spark.operators.sampling import take_token_budget

    spark, _ = ctx
    df = spark.createDataFrame(rows, "source string, doc_id long, nt long")
    naive = sorted(
        tuple(r)
        for r in take_token_budget(
            df, "source", "doc_id", "nt", budget=budget, salt=salt, n_shards=1
        ).collect()
    )
    sharded = sorted(
        tuple(r)
        for r in take_token_budget(
            df, "source", "doc_id", "nt", budget=budget, salt=salt,
            n_shards=n_shards,
        ).collect()
    )
    assert naive == sharded


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.one_of(
            st.text(min_size=0, max_size=12),
            st.integers(min_value=-(10**12), max_value=10**12).map(str),
        ),
        min_size=1,
        max_size=80,
    ),
)
def test_hll_register_and_estimate_agree(ctx, keys):
    """Family 10 — the portable-HLL arithmetic chain: bucket (md5-
    prefix mod m), rho via conv-to-binary + ltrim bit length (DuckDB
    bin() + ltrim), the 2^(33-M) shift-sum with the empty-bucket
    term, and the DECIMAL(38)/HUGEINT integral divide must agree on
    arbitrary keys (empty strings, non-ASCII, negative numerics).
    One divergent bit in any step flips a register or the estimate,
    so the whole chain is asserted, not just the hash."""
    import pyarrow as pa

    from bo_sql_spark.operators import heavy_hitters as HH

    spark, con = ctx
    p, m = 7, 128
    alpha_u = round(0.7213 / (1 + 1.079 / m) * 1e6)
    numer = alpha_u * m * m * (1 << 33)
    df = spark.createDataFrame([(k,) for k in keys], "s string")
    reg = {
        r["bucket"]: r["register"]
        for r in HH.hll_registers(df, "s", p=p).collect()
    }
    srow = HH.hll_distinct(df, "s", p=p).collect()[0]

    con.register(
        "fuzz_hll", pa.table({"s": pa.array(keys, type=pa.string())})
    )
    want_reg = dict(
        con.execute(
            f"""
            SELECT h % {m},
                   MAX(33 - length(ltrim(bin((h // {m}) % 4294967296), '0')))
            FROM (SELECT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
                  FROM fuzz_hll WHERE s IS NOT NULL)
            GROUP BY h % {m}
            """
        ).fetchall()
    )
    want_sum = con.execute(
        f"""
        WITH reg AS (
            SELECT h % {m} AS b,
                   MAX(33 - length(ltrim(bin((h // {m}) % 4294967296),
                                         '0'))) AS M
            FROM (SELECT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
                  FROM fuzz_hll WHERE s IS NOT NULL)
            GROUP BY h % {m}
        )
        SELECT CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(1 AS BIGINT) << (33 - M))
                    + ({m} - COUNT(*)) * 8589934592 AS BIGINT) AS t,
               CAST(CAST('{numer}' AS HUGEINT)
                    // ((SUM(CAST(1 AS BIGINT) << (33 - M))
                         + ({m} - COUNT(*)) * 8589934592) * 1000000)
                    AS BIGINT)
        FROM reg
        """
    ).fetchone()
    con.unregister("fuzz_hll")
    assert reg == want_reg
    assert (srow["n_nonempty"], srow["sum_scaled"], srow["hll_estimate"]) == want_sum


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lspecs=st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=1,
        max_size=40,
    ),
    rspecs=st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=1,
        max_size=40,
    ),
    w=st.sampled_from([7, 64, 500, 10**7]),
)
def test_bucketed_temporal_joins_match_naive(ctx, lspecs, rspecs, w):
    """Family 11 — the bucket-expansion temporal joins vs DuckDB's
    naive predicates on ARBITRARY int64 data: negative timestamps
    (Spark DIV truncates toward zero, not floor — bucket ids stay
    monotone so coverage holds, but this is exactly where an
    off-by-one would hide), zero-length intervals, intervals shorter
    and vastly longer than the bucket width, and a width far larger
    than the data span (everything lands in buckets {-1,0,1}).
    Asserts both range_join_bucketed (point-in-interval) and
    interval_overlap_join (interval-interval), exactly-once emission
    included."""
    import pyarrow as pa

    from bo_sql_spark.operators.asof import (
        interval_overlap_join,
        range_join_bucketed,
    )

    spark, con = ctx
    lrows = [(i, s, s + ln) for i, (s, ln) in enumerate(lspecs)]
    rrows = [(j, s, s + ln) for j, (s, ln) in enumerate(rspecs)]
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    con.register("fz_l", pa.table({"lid": [r[0] for r in lrows],
                                   "ls": [r[1] for r in lrows],
                                   "le": [r[2] for r in lrows]}))
    con.register("fz_r", pa.table({"rid": [r[0] for r in rrows],
                                   "rs": [r[1] for r in rrows],
                                   "re": [r[2] for r in rrows]}))

    # point-in-interval: left points (ls) vs right intervals [rs, re)
    got_rj = sorted(
        (r["lid"], r["rid"])
        for r in range_join_bucketed(left, right, "ls", "rs", "re", w).collect()
    )
    want_rj = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT lid, rid FROM fz_l JOIN fz_r ON ls >= rs AND ls < re"
        ).fetchall()
    )
    assert got_rj == want_rj

    # interval-interval overlap (empty intervals dropped)
    got_ov = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", w
        ).collect()
    )
    want_ov = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT lid, rid FROM fz_l JOIN fz_r"
            " ON ls < le AND rs < re AND ls < re AND rs < le"
        ).fetchall()
    )
    con.unregister("fz_l")
    con.unregister("fz_r")
    assert got_ov == want_ov


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=1,
        max_size=120,
    ),
    qs=st.sets(
        st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]),
        min_size=1,
        max_size=3,
    ),
    d=st.sampled_from([1, 2, 8]),
)
def test_sampled_quantiles_cross_engine(ctx, rows, qs, d):
    """Family 12 — the portable quantile sketch on ARBITRARY finite
    doubles (denormals, +/-0.0, extremes) and arbitrary int64 keys:
    the md5 1/d sample, the exact integer-micros rank arithmetic, and
    the rank-pick value must agree with a DuckDB replay. d=1 also
    exercises the everything-sampled path the streaming ingest query
    reuses. Empty samples yield an empty result on BOTH engines (r15:
    the Spark stats pass is folded into the plan, so there is no eager
    ValueError anymore; the except-branch below is kept for safety)."""
    import pyarrow as pa

    from bo_sql_spark.operators import heavy_hitters as HH

    spark, con = ctx
    df = spark.createDataFrame(rows, "k long, x double")
    try:
        got = sorted(
            (r["q"], r["sample_n"], r["est"])
            for r in HH.sampled_quantiles(
                df, "x", "k", qs=tuple(sorted(qs)), d=d
            ).collect()
        )
    except ValueError:
        got = None  # empty sample — assert DuckDB agrees it's empty
    con.register(
        "fz_q",
        pa.table({"k": [r[0] for r in rows], "x": [r[1] for r in rows]}),
    )
    picks = ", ".join(
        f"(CAST({q} AS DOUBLE), {round(q * 1_000_000)})" for q in sorted(qs)
    )
    want_rows = con.execute(
        f"""
        WITH samp AS (
            SELECT x FROM fz_q
            WHERE CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))
                       AS BIGINT) % {d} = 0
        ), r AS (
            SELECT x, row_number() OVER (ORDER BY x) AS rnk,
                   COUNT(*) OVER () AS n
            FROM samp
        ), picks AS (SELECT * FROM (VALUES {picks}) p(q, qm))
        SELECT q, CAST(max(n) AS BIGINT),
               max(CASE WHEN rnk = GREATEST(1, (qm * n + 999999) // 1000000)
                        THEN x END)
        FROM r, picks GROUP BY q ORDER BY q
        """
    ).fetchall()
    con.unregister("fz_q")
    if got is None:
        assert want_rows == [], want_rows
    else:
        assert got == sorted(tuple(r) for r in want_rows)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cats=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1,
                max_size=8,
            ),
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_drift_chisq_cross_engine(ctx, cats):
    """Family 13 — the integer chi-square fold on ARBITRARY
    per-category counts (zero-count sides, zero-count categories,
    single-category tables, fully one-sided splits): the
    DECIMAL(38)/HUGEINT products and the zero-denominator guards must
    agree with a DuckDB replay on every contribution."""
    import pyarrow as pa

    from bo_sql_spark.operators.drift import chisq_from_counts

    spark, con = ctx
    df = spark.createDataFrame(cats, "category string, n_a long, n_b long")
    got = sorted(tuple(r) for r in chisq_from_counts(df).collect())
    con.register(
        "fz_d",
        pa.table(
            {
                "category": [c for c, _, _ in cats],
                "n_a": [a for _, a, _ in cats],
                "n_b": [b for _, _, b in cats],
            }
        ),
    )

    def contrib(n, tot):
        d = f"({n} * (ta + tb) - (n_a + n_b) * {tot})"
        return (
            f"CASE WHEN (n_a + n_b) = 0 OR {tot} = 0 THEN 0 ELSE "
            f"CAST({d} AS HUGEINT) * {d} * 1000000 "
            f"// (CAST((ta + tb) AS HUGEINT) * (n_a + n_b) * {tot}) END"
        )

    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM fz_d)
            SELECT category, CAST(n_a AS BIGINT), CAST(n_b AS BIGINT),
                   CAST({contrib("n_a", "ta")} + {contrib("n_b", "tb")}
                        AS BIGINT)
            FROM fz_d, tot
            """
        ).fetchall()
    )
    con.unregister("fz_d")
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=30),
        min_size=1,
        max_size=20,
    ),
    qterms=st.sets(st.integers(min_value=0, max_value=9), min_size=1, max_size=3),
)
def test_bm25_fold_cross_engine(ctx, docs, qterms):
    """Family 14 — the fixed-point BM25 fold on ARBITRARY corpora
    (single-token docs, docs without any query term, repeated-token
    docs, 1-3 query terms): every integer-micros stage (the
    fixed-point-ln log idf AND the historical linear idf, dl/avgdl
    ratio, saturation denominator, widened tf numerator) must agree
    with a DuckDB replay score-for-score."""
    import pyarrow as pa

    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select
    from bo_sql_spark.operators.search import bm25_topk

    spark, con = ctx
    texts = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    terms = sorted(f"t{t}" for t in qterms)
    df = spark.createDataFrame(texts, "doc_id long, text string")
    con.register(
        "fz_b", pa.table({"doc_id": [i for i, _ in texts], "text": [t for _, t in texts]})
    )
    inlist = ", ".join(f"'{t}'" for t in terms)
    log_idf = duckdb_ln_select(
        duckdb_ln_select(
            "SELECT term, df, n_docs FROM dfreq CROSS JOIN corpus",
            "2 * n_docs + 2",
            "_ln_n",
        ),
        "2 * df + 1",
        "_ln_df",
    )
    idf_sqls = {
        "log": f"SELECT term, _ln_n - _ln_df AS idf_micros FROM ({log_idf})",
        "linear": "SELECT term, (n_docs * 1000000) // df AS idf_micros"
        " FROM dfreq CROSS JOIN corpus",
    }
    for mode, idf_sql in idf_sqls.items():
        got = sorted(
            tuple(r)
            for r in bm25_topk(df, terms, k=len(docs) + 5, idf_mode=mode).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                WITH toks AS (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM fz_b
                ), dl AS (
                    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
                ), corpus AS (
                    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                           CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
                ), tf AS (
                    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
                    WHERE term IN ({inlist}) GROUP BY doc_id, term
                ), dfreq AS (
                    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks
                    WHERE term IN ({inlist}) GROUP BY term
                ), idf AS ({idf_sql}
                ), scored AS (
                    SELECT tf.doc_id,
                           (idf_micros
                            * CAST(CAST(tf AS HUGEINT) * 2200000 * 1000000
                                   // (tf * 1000000 + 300000
                                       + (900000 * CAST(CAST(dl AS HUGEINT) * 1000000 * n_docs
                                                        // sum_dl AS BIGINT)) // 1000000)
                                   AS BIGINT))
                           // 1000000 AS term_score
                    FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
                )
                SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS bm25_micros,
                       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
                FROM scored GROUP BY doc_id
                """
            ).fetchall()
        )
        assert got == want, (mode, got, want)
    con.unregister("fz_b")


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=25),
        min_size=1,
        max_size=15,
    ),
    phrase_ids=st.lists(
        st.integers(min_value=0, max_value=5), min_size=2, max_size=3
    ),
    prox_ids=st.sets(st.integers(min_value=0, max_value=5), min_size=1, max_size=3),
    window=st.integers(min_value=2, max_value=8),
)
def test_phrase_and_proximity_folds_cross_engine(
    ctx, docs, phrase_ids, prox_ids, window
):
    """Family 15 — the positional folds on ARBITRARY corpora: the
    phrase anchor aggregate (including REPEATED-word phrases, where
    one position feeds several word-indices) and the proximity
    bitmask RANGE-frame window (boundary-exact spans, single-term
    sets) must agree with DuckDB replays hit-for-hit."""
    import pyarrow as pa

    from bo_sql_spark.operators.search import phrase_search, proximity_search

    spark, con = ctx
    texts = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    con.register(
        "fz_p", pa.table({"doc_id": [i for i, _ in texts], "text": [t for _, t in texts]})
    )
    try:
        phrase = [f"t{t}" for t in phrase_ids]
        got_ph = sorted(
            tuple(r) for r in phrase_search(df, phrase).collect()
        )
        vals = ", ".join(f"('{w}', {i})" for i, w in enumerate(phrase))
        want_ph = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                WITH arrs AS (
                    SELECT doc_id, string_split(text, ' ') AS arr FROM fz_p
                ), toks AS (
                    SELECT doc_id, generate_subscripts(arr, 1) AS pos,
                           unnest(arr) AS term FROM arrs
                ), hits AS (
                    SELECT doc_id, pos - idx AS anchor, idx
                    FROM toks JOIN (VALUES {vals}) AS q(term, idx) USING (term)
                ), anchors AS (
                    SELECT doc_id, anchor FROM hits
                    GROUP BY doc_id, anchor
                    HAVING COUNT(DISTINCT idx) = {len(phrase)}
                )
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) FROM anchors GROUP BY doc_id
                """
            ).fetchall()
        )
        assert got_ph == want_ph, (phrase, got_ph, want_ph)

        terms = sorted(f"t{t}" for t in prox_ids)
        got_px = sorted(
            tuple(r)
            for r in proximity_search(df, terms, window=window).collect()
        )
        case = " ".join(
            f"WHEN '{w}' THEN {1 << i}" for i, w in enumerate(terms)
        )
        inlist = ", ".join(f"'{w}'" for w in terms)
        full = (1 << len(terms)) - 1
        want_px = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                WITH arrs AS (
                    SELECT doc_id, string_split(text, ' ') AS arr FROM fz_p
                ), toks AS (
                    SELECT doc_id, generate_subscripts(arr, 1) AS pos,
                           unnest(arr) AS term FROM arrs
                ), hits AS (
                    SELECT doc_id, pos, CASE term {case} END AS m
                    FROM toks WHERE term IN ({inlist})
                ), masked AS (
                    SELECT doc_id, bit_or(m) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        RANGE BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS mask
                    FROM hits
                )
                SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                FROM masked WHERE mask = {full} GROUP BY doc_id
                """
            ).fetchall()
        )
        assert got_px == want_px, (terms, window, got_px, want_px)
    finally:
        con.unregister("fz_p")


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=20),
        min_size=1,
        max_size=12,
    ),
    min_count=st.integers(min_value=1, max_value=3),
)
def test_collocation_pmi_cross_engine(ctx, docs, min_count):
    """Family 16 — the log-PMI collocation fold on ARBITRARY corpora
    (repeated bigrams within a doc, single-token docs, tiny
    vocabularies where every pair collides): raw bigram counts, the
    five fixed-point-ln terms of the PMI decomposition, and the
    min-count floor must agree with a DuckDB replay pair-for-pair."""
    import pyarrow as pa

    import pyspark.sql.functions as F

    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select, with_ln_micros
    from bo_sql_spark.functions.textfn import tokens

    spark, con = ctx
    texts = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    toks_df = df.select(
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("term")
    ).filter(F.col("term") != "")
    ucnt = with_ln_micros(
        toks_df.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c")),
        "c", "ln_c",
    )
    nu = with_ln_micros(
        ucnt.agg(F.expr("CAST(greatest(coalesce(SUM(c), 1), 1) AS BIGINT)").alias("nu")),
        "nu", "ln_nu",
    )
    tk = tokens(F.col("text"))
    n = F.size(tk)
    raw = F.slice(
        F.zip_with(tk, F.slice(tk, 2, F.greatest(n - 1, F.lit(0))),
                   lambda x, y: F.concat(x, F.lit(" "), y)),
        1, F.greatest(n - 1, F.lit(0)),
    )
    big = df.select(F.explode(raw).alias("bigram")).filter(F.instr("bigram", " ") >= 1)
    nb = with_ln_micros(
        big.agg(F.expr("CAST(greatest(COUNT(*), 1) AS BIGINT)").alias("nb")),
        "nb", "ln_nb",
    )
    bcnt = with_ln_micros(
        big.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("c_ab")).filter(
            F.col("c_ab") >= min_count
        ),
        "c_ab", "ln_ab",
    )
    parts = F.split("bigram", " ")
    got = sorted(
        tuple(r)
        for r in bcnt.withColumn("_w1", parts.getItem(0))
        .withColumn("_w2", parts.getItem(1))
        .join(F.broadcast(ucnt.select(F.col("term").alias("_w1"), F.col("ln_c").alias("_lnca"))), "_w1")
        .join(F.broadcast(ucnt.select(F.col("term").alias("_w2"), F.col("ln_c").alias("_lncb"))), "_w2")
        .crossJoin(F.broadcast(nu.select("ln_nu")))
        .crossJoin(F.broadcast(nb.select("ln_nb")))
        .selectExpr(
            "bigram", "c_ab",
            "ln_ab + 2 * ln_nu - ln_nb - _lnca - _lncb AS pmi",
        )
        .collect()
    )
    con.register(
        "fz_c", pa.table({"doc_id": [i for i, _ in texts], "text": [t for _, t in texts]})
    )
    uc_ln = duckdb_ln_select(
        "SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM ucnt GROUP BY term",
        "c", "ln_c",
    )
    nu_ln = duckdb_ln_select(
        "SELECT CAST(greatest(coalesce(SUM(c), 1), 1) AS BIGINT) AS nu FROM uc",
        "nu", "ln_nu",
    )
    bc_ln = duckdb_ln_select(
        "SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab FROM big"
        f" GROUP BY bigram HAVING COUNT(*) >= {min_count}",
        "c_ab", "ln_ab",
    )
    nb_ln = duckdb_ln_select(
        "SELECT CAST(greatest(COUNT(*), 1) AS BIGINT) AS nb FROM big",
        "nb", "ln_nb",
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH t AS (
                SELECT string_split(text, ' ') AS tok FROM fz_c
            ), ucnt AS (
                SELECT unnest(tok) AS term FROM t
            ), uc AS ({uc_ln}
            ), nu AS ({nu_ln}
            ), big AS (
                SELECT unnest(list_transform(range(1, len(tok)),
                                             i -> tok[i] || ' ' || tok[i+1])) AS bigram
                FROM t
            ), bc AS ({bc_ln}
            ), nb AS ({nb_ln})
            SELECT bigram, c_ab,
                   ln_ab + 2 * ln_nu - ln_nb - a.ln_c - b.ln_c
            FROM bc, nu, nb
            JOIN uc a ON a.term = string_split(bigram, ' ')[1]
            JOIN uc b ON b.term = string_split(bigram, ' ')[2]
            """
        ).fetchall()
    )
    con.unregister("fz_c")
    assert got == want


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.integers(min_value=1, max_value=9_223_372_036_854_775_807),
        min_size=1,
        max_size=40,
    ),
)
def test_fixedpoint_ln_cross_engine(ctx, xs):
    """Family 17 — the portable fixed-point ln on ARBITRARY positive
    BIGINTs: the bin()-bit-length reduction, the HUGEINT/DECIMAL(38)
    mantissa scaling, and the atanh series must agree bit-for-bit
    between Spark, DuckDB, and the Python reference."""
    from bo_sql_spark.functions.fixedpoint import (
        duckdb_ln_select,
        ln_micros_py,
        with_ln_micros,
    )

    spark, con = ctx
    xs = sorted(set(xs))
    df = spark.createDataFrame([(v,) for v in xs], "x long")
    got = {r["x"]: r["lnx"] for r in with_ln_micros(df, "x", "lnx").collect()}
    vals = ",".join(f"(CAST({v} AS BIGINT))" for v in xs)
    sql = duckdb_ln_select(f"SELECT * FROM (VALUES {vals}) v(x)", "x", "lnx")
    duck = dict(con.execute(sql).fetchall())
    for v in xs:
        assert got[v] == ln_micros_py(v) == duck[v], v


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=25),
        min_size=1,
        max_size=12,
    ),
    counts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_entropy_and_kl_folds_cross_engine(ctx, docs, counts):
    """Family 18 — the entropy and smoothed-KL folds on ARBITRARY
    inputs (single-token docs, all-identical docs, zero-count
    categories on either side): per-doc entropy/norm and per-category
    signed KL contributions must agree with DuckDB replays
    value-for-value (the signed DIV is the delicate part: both engines
    truncate toward zero)."""
    import pyarrow as pa

    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select
    from bo_sql_spark.operators.drift import kl_from_counts
    from bo_sql_spark.operators.text import token_entropy

    spark, con = ctx
    # --- entropy over arbitrary corpora
    texts = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(tuple(r) for r in token_entropy(df).collect())
    con.register(
        "fz_e", pa.table({"doc_id": [i for i, _ in texts], "text": [t for _, t in texts]})
    )
    tf_ln = duckdb_ln_select("SELECT * FROM tf0", "c", "_lnc")
    pd_ln = duckdb_ln_select("SELECT * FROM pd0", "n_tokens", "_lnn")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM fz_e
            ), tf0 AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
                GROUP BY doc_id, term
            ), tf AS ({tf_ln}
            ), pd0 AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                       CAST(COUNT(*) AS BIGINT) AS n_unique_terms,
                       SUM(CAST(c AS HUGEINT) * _lnc) AS _sum_cln
                FROM tf GROUP BY doc_id
            ), pd AS ({pd_ln})
            SELECT doc_id, n_tokens, n_unique_terms,
                   CAST(_lnn - _sum_cln // n_tokens AS BIGINT),
                   CAST(CASE WHEN n_tokens <= 1 THEN 0
                        ELSE ((_lnn - _sum_cln // n_tokens) * 1000) // _lnn END
                        AS BIGINT)
            FROM pd
            """
        ).fetchall()
    )
    con.unregister("fz_e")
    assert got == want

    # --- smoothed KL over arbitrary two-sample count tables
    cdf = spark.createDataFrame(
        [(f"c{i}", a, b) for i, (a, b) in enumerate(counts)],
        "category string, n_a long, n_b long",
    )
    got_kl = sorted(tuple(r) for r in kl_from_counts(cdf).collect())
    con.register(
        "fz_k",
        pa.table(
            {
                "category": [f"c{i}" for i in range(len(counts))],
                "n_a": [a for a, _ in counts],
                "n_b": [b for _, b in counts],
            }
        ),
    )
    ln_chain = "SELECT * FROM c2"
    for x_sql, out in (
        ("n_a + 1", "_ln_a1"),
        ("n_b + 1", "_ln_b1"),
        ("_ta + _k", "_ln_aa"),
        ("_tb + _k", "_ln_bb"),
    ):
        ln_chain = duckdb_ln_select(ln_chain, x_sql, out)
    want_kl = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH tot AS (
                SELECT CAST(SUM(n_a) AS BIGINT) AS _ta,
                       CAST(SUM(n_b) AS BIGINT) AS _tb,
                       CAST(COUNT(*) AS BIGINT) AS _k
                FROM fz_k
            ), c2 AS (
                SELECT category, CAST(n_a AS BIGINT) AS n_a,
                       CAST(n_b AS BIGINT) AS n_b, _ta, _tb, _k
                FROM fz_k, tot
            ), c3 AS ({ln_chain})
            SELECT category, n_a, n_b,
                   CAST((CAST(n_a + 1 AS HUGEINT)
                         * (_ln_a1 - _ln_aa - _ln_b1 + _ln_bb))
                        // (_ta + _k) AS BIGINT)
            FROM c3
            """
        ).fetchall()
    )
    # --- PSI (symmetrized KL) over the same arbitrary count tables:
    # the ((a'B' - b'A') * L) DIV (A'B') single-DIV form, toward-zero
    # truncation on a product of two signed factors
    from bo_sql_spark.operators.drift import psi_from_counts

    got_psi = sorted(tuple(r) for r in psi_from_counts(cdf).collect())
    want_psi = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH tot AS (
                SELECT CAST(SUM(n_a) AS BIGINT) AS _ta,
                       CAST(SUM(n_b) AS BIGINT) AS _tb,
                       CAST(COUNT(*) AS BIGINT) AS _k
                FROM fz_k
            ), c2 AS (
                SELECT category, CAST(n_a AS BIGINT) AS n_a,
                       CAST(n_b AS BIGINT) AS n_b, _ta, _tb, _k
                FROM fz_k, tot
            ), c3 AS ({ln_chain})
            SELECT category, n_a, n_b,
                   CAST(((CAST(n_a + 1 AS HUGEINT) * (_tb + _k)
                          - CAST(n_b + 1 AS HUGEINT) * (_ta + _k))
                         * (_ln_a1 - _ln_aa - _ln_b1 + _ln_bb))
                        // (CAST(_ta + _k AS HUGEINT) * (_tb + _k))
                        AS BIGINT)
            FROM c3
            """
        ).fetchall()
    )
    con.unregister("fz_k")
    assert got_kl == want_kl
    assert got_psi == want_psi


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    model_docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=20),
        min_size=1,
        max_size=10,
    ),
    arr_docs=st.lists(
        # arrivals draw from a WIDER alphabet (t0..t9) so unseen terms
        # (the COALESCE(ln(gf+1), 0) leg) occur routinely
        st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=20),
        min_size=1,
        max_size=10,
    ),
)
def test_lm_served_filter_cross_engine(ctx, model_docs, arr_docs):
    """Family 19 — the train->serve LM fold on ARBITRARY corpora:
    freeze the Laplace-smoothed model from random model docs, score
    random arrival docs (wider alphabet => unseen terms exercise the
    LEFT JOIN + COALESCE smoothing leg; single-token docs exercise the
    dl=1 division edge) — per-doc served CE must agree with a DuckDB
    replay value-for-value."""
    import pyarrow as pa

    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select
    from bo_sql_spark.operators.text import (
        cross_entropy_served,
        doc_term_freq,
        lm_smoothed_model,
    )

    spark, con = ctx
    mtexts = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(model_docs)]
    atexts = [
        (1000 + i, " ".join(f"t{t}" for t in toks))
        for i, toks in enumerate(arr_docs)
    ]
    mdf = spark.createDataFrame(mtexts, "doc_id long, text string")
    adf = spark.createDataFrame(atexts, "doc_id long, text string")
    terms, total = lm_smoothed_model(doc_term_freq(mdf))
    got = sorted(
        tuple(r)
        for r in cross_entropy_served(doc_term_freq(adf), terms, total).collect()
    )
    con.register(
        "fz_m",
        pa.table(
            {"doc_id": [i for i, _ in mtexts], "text": [t for _, t in mtexts]}
        ),
    )
    con.register(
        "fz_a",
        pa.table(
            {"doc_id": [i for i, _ in atexts], "text": [t for _, t in atexts]}
        ),
    )
    gf_ln = duckdb_ln_select("SELECT * FROM gf0", "gf + 1", "_lngf1")
    tot_ln = duckdb_ln_select(
        "SELECT CAST(SUM(gf) AS BIGINT) AS n_corpus,"
        " CAST(COUNT(*) AS BIGINT) AS n_vocab FROM gf0",
        "n_corpus + n_vocab",
        "_lnNV",
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH mt AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM fz_m
            ), tfm AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM mt
                GROUP BY doc_id, term
            ), gf0 AS (
                SELECT term, CAST(SUM(c) AS BIGINT) AS gf FROM tfm GROUP BY term
            ), gfl AS ({gf_ln}
            ), tot AS ({tot_ln}
            ), at AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM fz_a
            ), tfa AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM at
                GROUP BY doc_id, term
            ), apd AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                       SUM(CAST(c AS HUGEINT) * COALESCE(_lngf1, 0)) AS _s
                FROM tfa LEFT JOIN gfl USING (term) GROUP BY doc_id
            )
            SELECT doc_id, n_tokens,
                   CAST(_lnNV - _s // n_tokens AS BIGINT)
            FROM apd, tot
            """
        ).fetchall()
    )
    con.unregister("fz_m")
    con.unregister("fz_a")
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=24),
        min_size=2,
        max_size=14,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.7]),
)
def test_portable_minhash_pairs_cross_engine(ctx, docs, threshold):
    """Family 20 — the portable MinHash+LSH pipeline on ARBITRARY
    corpora: random small docs over a tiny alphabet (so shingle
    collisions, exact duplicates, and single-token docs all occur
    routinely) must produce the IDENTICAL verified pair set in Spark
    (operators/dedup.py:minhash_dedup_pairs_portable) and the DuckDB
    replay (_portable_minhash_pairs_sql) — signatures, band packing,
    candidate join, and Jaccard verify all cross-engine exact. Since
    r14 the Spark side AUTO-sizes bands from the threshold
    (minhash_auto_bands), so the oracle is built with the same rule —
    which makes this family fuzz the rule at 16/8/4 bands too."""
    import pyarrow as pa

    from bo_sql_spark.operators.dedup import (
        minhash_auto_bands,
        minhash_dedup_pairs_portable,
    )
    from bo_sql_spark.queries.pipeline import _portable_minhash_pairs_sql

    spark, con = ctx
    texts = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"], round(r["jacc"], 6))
        for r in minhash_dedup_pairs_portable(df, threshold=threshold).collect()
    )
    con.register(
        "fz_pm",
        pa.table(
            {"doc_id": [i for i, _ in texts], "text": [t for _, t in texts]}
        ),
    )
    b = minhash_auto_bands(threshold)
    sql = f"""
    WITH {_portable_minhash_pairs_sql(
        "fz_pm", n_hashes=2 * b, bands=b, threshold=threshold
    )}
    SELECT id_a, id_b, ROUND(jacc_raw, 6) AS jacc FROM pmpairs
    """
    want = sorted(
        (int(a), int(b), round(float(j), 6))
        for a, b, j in con.execute(sql).fetchall()
    )
    assert got == want, (got, want)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=24),
        min_size=2,
        max_size=14,
    ),
    max_hamming=st.sampled_from([1, 2, 3]),
)
def test_portable_simhash_pairs_cross_engine(ctx, docs, max_hamming):
    """Family 21 — the portable SimHash pipeline on ARBITRARY corpora:
    random small docs over a tiny alphabet (exact duplicates and
    heavy token overlap occur routinely, so signatures collide and the
    Hamming filter is exercised at every bound) must produce the
    IDENTICAL pair set in Spark (operators/dedup.py:
    simhash_near_dup_pairs_portable) and the DuckDB replay
    (_portable_simhash_pairs_sql) — token hashes, 60 bit-sign folds,
    chunk banding, and bit_count(XOR) verify all cross-engine exact."""
    import pyarrow as pa

    from bo_sql_spark.operators.dedup import simhash_near_dup_pairs_portable
    from bo_sql_spark.queries.pipeline import _portable_simhash_pairs_sql

    spark, con = ctx
    texts = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup_pairs_portable(
            df, bands=4, max_hamming=max_hamming
        ).collect()
    )
    con.register(
        "fz_sh",
        pa.table({"doc_id": [i for i, _ in texts], "text": [t for _, t in texts]}),
    )
    sql = f"""
    WITH {_portable_simhash_pairs_sql("fz_sh", max_hamming=max_hamming)}
    SELECT id_a, id_b, hamming FROM shpairs
    """
    want = sorted(
        (int(a), int(b), int(h)) for a, b, h in con.execute(sql).fetchall()
    )
    con.unregister("fz_sh")
    assert got == want, (got, want)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1.0, max_value=1.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.0, 0.4, 0.8]),
)
def test_portable_rp_join_cross_engine(ctx, vecs, threshold):
    """Family 22 — the portable RP-LSH similarity join on ARBITRARY
    embeddings (8-dim random float32, including near-zero and
    all-equal vectors): Spark (similarity.py:
    approx_similarity_join_portable) and the DuckDB replay
    (_portable_rp_join_sql) must agree on the CANDIDATE SET (literal
    md5 sign masks over fixed-point vectors — any quantization or
    sign-boundary drift changes membership, not a 6dp digit) and the
    verified cosine values."""
    import pyarrow as pa

    from bo_sql_spark.operators.similarity import approx_similarity_join_portable
    from bo_sql_spark.queries.pipeline import _portable_rp_join_sql

    spark, con = ctx
    # vectors that QUANTIZE to zero (all |x| < 0.5e-6) have no cosine
    # (0/0 -> NaN, whose ordering is an engine quirk we don't grade);
    # keep them out — the fixture generator never emits them
    vecs = [v for v in vecs if any(abs(x) >= 1e-3 for x in v)]
    if len(vecs) < 2:
        return
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in approx_similarity_join_portable(
            df, threshold, dim=8, bits=4, seeds=2
        ).collect()
    )
    con.register(
        "fz_rp",
        pa.table(
            {
                "vec_id": pa.array([i for i, _ in rows], pa.int64()),
                "embedding": pa.array([v for _, v in rows], pa.list_(pa.float32())),
            }
        ),
    )
    sql = f"""
    WITH {_portable_rp_join_sql("fz_rp", bits=4, seeds=2, dims=8)}
    SELECT id_a, id_b, ROUND(cos, 6) AS cos_sim
    FROM rppairs WHERE cos >= {threshold}
    """
    want = sorted(
        (int(a), int(b), float(c)) for a, b, c in con.execute(sql).fetchall()
    )
    con.unregister("fz_rp")
    assert got == want, (got, want)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    groups=st.lists(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-1.0, max_value=1.0,
                    allow_nan=False, allow_infinity=False, width=32,
                ),
                min_size=4,
                max_size=4,
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_embedding_centroid_fold_cross_engine(ctx, groups):
    """Family 23 — the embedding-centroid drift fold on ARBITRARY
    4-dim float32 vectors (including groups that quantize to zero or
    cancel exactly — the NULL leg): Spark's DECIMAL(38) sum fold
    (operators/drift.py:embedding_centroid_drift) and a HUGEINT DuckDB
    replay must agree on every (group, n, cos) row, NULLs included."""
    import math

    import pyarrow as pa

    from bo_sql_spark.operators.drift import embedding_centroid_drift

    spark, con = ctx
    rows = []
    vid = 0
    for g, vecs in enumerate(groups):
        for v in vecs:
            rows.append((vid, g, v))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = sorted(
        (
            r["label"],
            r["n_vectors"],
            None if r["cos_to_global"] is None else round(r["cos_to_global"], 6),
        )
        for r in embedding_centroid_drift(df, "label", dims=4).collect()
    )
    con.register(
        "fz_ec",
        pa.table(
            {
                "label": pa.array([r[1] for r in rows], pa.int32()),
                "embedding": pa.array([r[2] for r in rows], pa.list_(pa.float32())),
            }
        ),
    )
    want = sorted(
        (
            int(label),
            int(n),
            None if c is None or (isinstance(c, float) and math.isnan(c)) else round(float(c), 6),
        )
        for label, n, c in con.execute(
            """
            WITH ecq AS MATERIALIZED (
                SELECT label,
                       list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
                FROM fz_ec
            ), ecs AS MATERIALIZED (
                SELECT label, d.d AS d, SUM(CAST(qv[d.d + 1] AS HUGEINT)) AS s
                FROM ecq CROSS JOIN (SELECT unnest(range(4)) AS d) d
                GROUP BY label, d.d
            ), ecn AS (
                SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors
                FROM ecq GROUP BY label
            ), ecg AS (
                SELECT d, SUM(s) AS g FROM ecs GROUP BY d
            ), ecgg AS (
                SELECT SUM(g * g) AS dot_gg FROM ecg
            ), ecd AS (
                SELECT label, SUM(s * g) AS dot_lg, SUM(s * s) AS dot_ll
                FROM ecs JOIN ecg USING (d) GROUP BY label
            )
            SELECT e.label, n.n_vectors,
                   CASE WHEN dot_ll = 0 OR dot_gg = 0 THEN NULL
                        ELSE ROUND(CAST(dot_lg AS DOUBLE)
                                   / (sqrt(CAST(dot_ll AS DOUBLE))
                                      * sqrt(CAST(dot_gg AS DOUBLE))),
                                   6) END
            FROM ecd e JOIN ecn n USING (label), ecgg
            """
        ).fetchall()
    )
    con.unregister("fz_ec")
    assert got == want, (got, want)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys_a=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    keys_b=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    k=st.sampled_from([2, 4, 8, 16]),
)
def test_kmv_sketch_and_setops_cross_engine(ctx, keys_a, keys_b, k):
    """Family 24 — the KMV/theta sketch on ARBITRARY key sets (heavy
    duplication, singletons, under-k and saturated regimes all occur):
    Spark's two-phase k-smallest (operators/kmv.py) and the DuckDB
    direct ORDER BY replay must agree on every retained hash AND on
    the full set-estimate row (theta, both cardinalities, union,
    intersection, Jaccard)."""
    import pyarrow as pa

    from bo_sql_spark.operators import kmv as K
    from bo_sql_spark.queries.pipeline import _kmv_setops_tail

    spark, con = ctx
    sa = [f"k{v}" for v in keys_a]
    sb = [f"k{v}" for v in keys_b]
    dfa = spark.createDataFrame([(s,) for s in sa], "key string")
    dfb = spark.createDataFrame([(s,) for s in sb], "key string")
    ska = K.kmv_sketch(dfa, "key", [], k=k, n_shards=4)
    skb = K.kmv_sketch(dfb, "key", [], k=k, n_shards=4)
    got_rows = sorted(r.h for r in ska.collect())
    got = K.kmv_set_estimates(ska, skb, k=k).collect()[0]

    con.register("fz_ka", pa.table({"key": sa}))
    con.register("fz_kb", pa.table({"key": sb}))
    want_rows = [
        r[0]
        for r in con.execute(
            f"""SELECT h FROM (
                SELECT h, row_number() OVER (ORDER BY h) AS r
                FROM (SELECT DISTINCT {K.kmv_hash_sql('key')} AS h FROM fz_ka)
            ) WHERE r <= {k} ORDER BY h"""
        ).fetchall()
    ]
    assert got_rows == want_rows
    want = con.execute(
        f"""WITH kha AS (SELECT DISTINCT {K.kmv_hash_sql('key')} AS h FROM fz_ka),
        khb AS (SELECT DISTINCT {K.kmv_hash_sql('key')} AS h FROM fz_kb),
        {_kmv_setops_tail(k)}"""
    ).fetchone()
    assert (
        got.theta,
        got.est_a,
        got.est_b,
        got.est_union,
        got.est_intersect,
        got.jaccard_est_permille,
    ) == tuple(int(x) for x in want[:6])


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    k=st.sampled_from([1, 3, 10]),
    salt=st.sampled_from([0, 7, 29]),
)
def test_weighted_reservoir_cross_engine(ctx, rows, k, salt):
    """Family 25 — the Efraimidis-Spirakis weighted reservoir on
    ARBITRARY (id, weight) tables: the Spark ln-chain key + top-k
    (operators/sampling.py:weighted_reservoir_topk) and a DuckDB
    replay through the same fixed-point ln step list must pick the
    SAME winners with the SAME keys in the same order — including the
    negative-quotient truncation the DIV/'//' agreement rests on."""
    import pyarrow as pa

    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select, ln_micros_py
    from bo_sql_spark.operators.sampling import (
        PORTABLE_PRIME,
        portable_hash_sql,
        weighted_reservoir_topk,
    )

    spark, con = ctx
    df = spark.createDataFrame(rows, "id long, w long")
    got = [
        (r.id, r.es_key)
        for r in weighted_reservoir_topk(df, "id", "w", k, salt=salt).collect()
    ]
    con.register(
        "fz_wr",
        pa.table({"id": [i for i, _ in rows], "w": [w for _, w in rows]}),
    )
    ln_p = ln_micros_py(PORTABLE_PRIME)
    inner = (
        f"SELECT id, w, {portable_hash_sql('id', salt)} + 1 AS _h1 FROM fz_wr"
    )
    chained = duckdb_ln_select(inner, "_h1", "_lnh1")
    want = [
        (int(i), int(key))
        for i, key in con.execute(
            f"""SELECT id, ((_lnh1 - {ln_p}) * 1000000) // w AS es_key
            FROM ({chained})
            ORDER BY es_key DESC, id ASC LIMIT {k}"""
        ).fetchall()
    ]
    assert got == want
