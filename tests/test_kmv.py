"""KMV / theta sketch unit tests (operators/kmv.py): two-phase
selection == direct k-smallest, mergeability, exact-branch
degeneration, estimator accuracy, set-operation geometry, and
cross-engine hash parity."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from bo_sql_spark.operators import kmv as K


def _keys(spark, n, prefix="key", group=None):
    df = spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("k")
    )
    if group is not None:
        df = df.withColumn("g", F.lit(group))
    return df


def test_two_phase_equals_direct_k_smallest(spark):
    """The sharded two-pass selection must equal a single global
    ORDER BY h LIMIT k — the oracle's direct form."""
    df = _keys(spark, 3000)
    sk = K.kmv_sketch(df, "k", [], k=64, n_shards=8)
    direct = (
        df.select(K.kmv_hash("k").alias("h"))
        .distinct()
        .withColumn("_r", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("_r") <= 64)
        .drop("_r")
    )
    got = sorted(r.h for r in sk.collect())
    want = sorted(r.h for r in direct.collect())
    assert got == want and len(got) == 64


def test_merge_equals_union_sketch_and_is_order_free(spark):
    """k-min of a union == k-min of per-part k-mins, in either merge
    order — the mergeable-summary property serving relies on."""
    a = _keys(spark, 900, "a")
    b = _keys(spark, 1100, "b")
    ska = K.kmv_sketch(a, "k", [], k=48)
    skb = K.kmv_sketch(b, "k", [], k=48)
    union_sk = K.kmv_sketch(a.unionByName(b), "k", [], k=48)
    m_ab = sorted(r.h for r in K.kmv_merge(ska, skb, [], k=48).collect())
    m_ba = sorted(r.h for r in K.kmv_merge(skb, ska, [], k=48).collect())
    want = sorted(r.h for r in union_sk.collect())
    assert m_ab == want == m_ba


def test_under_k_branch_is_exact(spark):
    """Fewer distinct keys than k: theta degenerates to P and the
    estimate IS the distinct count."""
    df = _keys(spark, 37)
    est = K.kmv_estimate(K.kmv_sketch(df, "k", [], k=64), [], k=64).collect()[0]
    assert est.n_kept == 37
    assert est.theta == K.KMV_P
    assert est.est_distinct == 37


def test_estimator_accuracy_on_saturated_sketch(spark):
    """5000 distinct keys, k=256: the (k-1)*P/h_k estimate lands
    within the ~3/sqrt(k) band. Deterministic hash family, so this is
    a fixed number, not a flaky statistical assertion."""
    n = 5000
    df = _keys(spark, n)
    est = K.kmv_estimate(K.kmv_sketch(df, "k", [], k=256), [], k=256).collect()[0]
    assert est.n_kept == 256 and est.theta < K.KMV_P
    assert abs(est.est_distinct - n) / n < 3 / (256 ** 0.5)


def test_set_estimates_identical_and_disjoint(spark):
    """Identical key sets -> Jaccard 1000 and est_intersect ==
    est_union; disjoint key sets -> zero intersection sample, Jaccard
    0. Both deterministic given the hash family."""
    a = _keys(spark, 1500, "x")
    ska = K.kmv_sketch(a, "k", [], k=128)
    same = K.kmv_set_estimates(ska, ska, k=128).collect()[0]
    assert same.jaccard_est_permille == 1000
    assert same.est_intersect == same.est_union == same.est_a

    b = _keys(spark, 1500, "y")
    skb = K.kmv_sketch(b, "k", [], k=128)
    disj = K.kmv_set_estimates(ska, skb, k=128).collect()[0]
    assert disj.est_intersect == 0
    assert disj.jaccard_est_permille == 0
    # union estimate still in the 2x3/sqrt(k) band around 3000
    assert abs(disj.est_union - 3000) / 3000 < 6 / (128 ** 0.5)


def test_grouped_sketch_is_per_group(spark):
    """Group columns partition the sketch: each group's rows are that
    group's own k smallest, unaffected by the other group's keys."""
    a = _keys(spark, 400, "a", group="g1")
    b = _keys(spark, 50, "b", group="g2")
    sk = K.kmv_sketch(a.unionByName(b), "k", ["g"], k=64)
    rows = {g: sorted(r.h for r in rs) for g, rs in (
        ("g1", sk.filter(F.col("g") == "g1").collect()),
        ("g2", sk.filter(F.col("g") == "g2").collect()),
    )}
    solo = sorted(r.h for r in K.kmv_sketch(a, "k", [], k=64).collect())
    assert rows["g1"] == solo
    assert len(rows["g2"]) == 50  # under k: everything retained


def test_kmv_hash_matches_duckdb(spark):
    """The md5-15-hex mod P base hash is bit-identical across engines
    (the portability claim every oracle rests on)."""
    vals = ["", "a", "hello world", "Ünïcode §", "0" * 200]
    got = (
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select("s", K.kmv_hash("s").alias("h"))
        .collect()
    )
    con = duckdb.connect()
    for row in got:
        want = con.execute(
            f"SELECT {K.kmv_hash_sql('?')}", [row.s]
        ).fetchone()[0]
        assert row.h == want, row.s


def test_pairwise_matches_two_sketch_estimates(spark):
    """The all-pairs matrix must agree with kmv_set_estimates run on
    the same two groups' sketches (same theta, intersection count, and
    Jaccard), and emit exactly G(G-1)/2 rows."""
    parts = {
        "g1": [f"s{i}" for i in range(600)],
        "g2": [f"s{i}" for i in range(300)] + [f"t{i}" for i in range(300)],
        "g3": [f"u{i}" for i in range(50)],
    }
    rows = [(g, v) for g, vs in parts.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, k string")
    sk = K.kmv_sketch(df, "k", ["g"], k=128)
    matrix = {
        (r.ga, r.gb): r for r in K.kmv_pairwise_jaccard(sk, "g", k=128).collect()
    }
    assert set(matrix) == {("g1", "g2"), ("g1", "g3"), ("g2", "g3")}

    ska = K.kmv_sketch(df.filter(F.col("g") == "g1"), "k", [], k=128)
    skb = K.kmv_sketch(df.filter(F.col("g") == "g2"), "k", [], k=128)
    pair = K.kmv_set_estimates(ska, skb, k=128).collect()[0]
    m = matrix[("g1", "g2")]
    assert m.theta == pair.theta
    assert m.est_intersect == pair.est_intersect
    assert m.jaccard_est_permille == pair.jaccard_est_permille
    # disjoint pair: zero intersection, exactly
    assert matrix[("g1", "g3")].n_inter == 0
    assert matrix[("g1", "g3")].jaccard_est_permille == 0


def test_churn_decomposition_identities(spark):
    """Churn = set_estimates decomposed: identical sets -> both only;
    disjoint sets -> no both; sample counts of (a_only, both, b_only)
    partition the union sample, so each estimate sits within one DIV
    truncation of the corresponding exact region under theta."""
    a = _keys(spark, 800, "x")
    b_rows = [f"x{i}" for i in range(400)] + [f"y{i}" for i in range(400)]
    b = spark.createDataFrame([(v,) for v in b_rows], "k string")
    ska = K.kmv_sketch(a, "k", [], k=96)
    skb = K.kmv_sketch(b, "k", [], k=96)

    same = K.kmv_churn_estimates(ska, ska, k=96).collect()[0]
    assert same.est_a_only == 0 and same.est_b_only == 0
    assert same.est_both > 0

    churn = K.kmv_churn_estimates(ska, skb, k=96).collect()[0]
    pair = K.kmv_set_estimates(ska, skb, k=96).collect()[0]
    assert churn.theta == pair.theta
    assert churn.est_both == pair.est_intersect
    # count-level partition: the three regions sum to the union sample,
    # so the estimate sum is within 3 truncations (< 3) of est_union
    total = churn.est_a_only + churn.est_both + churn.est_b_only
    assert pair.est_union - 3 <= total <= pair.est_union

    disj = K.kmv_churn_estimates(
        ska, K.kmv_sketch(_keys(spark, 500, "z"), "k", [], k=96), k=96
    ).collect()[0]
    assert disj.est_both == 0 and disj.est_a_only > 0 and disj.est_b_only > 0
