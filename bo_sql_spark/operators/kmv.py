"""Portable KMV (k-minimum-values) / theta sketch: distinct-count
estimation WITH set operations.

The gap this closes in the sketch suite: HLL estimates distinct counts
and merges by UNION only — it cannot intersect, so "how many distinct
tokens do corpus A and corpus B share?" needs an exact join of the two
vocabularies. A KMV sketch (Bar-Yossef et al. 2002; unbiased (k-1)/h_k
estimator per Beyer et al. 2007; set algebra per the Apache DataSketches
theta-sketch construction) keeps the k SMALLEST hash values of the key
set; because the retained sample is the same "hashes below a threshold"
region for every sketch built with the same hash family, sketches
support union AND intersection by plain set ops on their rows:

    theta        = k-th smallest hash (P when fewer than k keys seen:
                   the sketch then holds the ENTIRE hash set and every
                   estimate below degenerates to the exact count)
    est_distinct = (k-1) * P DIV theta         (exact when theta = P)
    union        = k smallest of the row union (a KMV sketch again)
    intersect    = |{h in A and B : h < min(theta_A, theta_B)}|
                   * P DIV min(theta_A, theta_B)

Engine-portable by the same construction as the portable MinHash /
Bloom (md5-15-hex mod P base hash, operators/dedup.py), so a DuckDB
oracle replays every retained hash, every theta, and every estimate —
including the estimation ERROR vs the exact count, which the graded
queries carry as output columns: with a deterministic hash family the
estimate is a replayable number, not a statistical claim.

Scale shape (the 100 TB story): the build's only unbounded stage is
the distinct-hash exchange (any distinct-count, sketched or not, pays
it once); the k-smallest selection is two ROW_NUMBER passes — first
per (group, h mod n_shards) so no single task ever sorts a whole
group's hash set, then per group over the <= n_shards * k survivors.
Everything downstream of the build touches <= k rows per group:
sketches broadcast in kilobytes, merge/intersect are joins of k-row
tables, and re-estimating after a merge never revisits the corpus.

No reference counterpart (the reference has no approximate aggregates,
src/exec/operator.cpp:860-1074 is exact hash aggregation only);
beyond-reference surface per SURVEY §2.3 + the training-data mandate
(corpus-overlap estimation without a vocabulary join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from bo_sql_spark.operators.dedup import _PMH_P

KMV_P = _PMH_P  # hash range [0, P); shared with MinHash/Bloom


def kmv_hash(key: Column | str) -> Column:
    """Base hash: first 15 hex digits of md5(key) as BIGINT mod P —
    the portable-family construction (dedup.py:137). Non-negative by
    construction, so Spark pmod == DuckDB % here."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        F.lit(KMV_P),
    )


def kmv_hash_sql(expr: str) -> str:
    """The identical base hash as DuckDB SQL text (for oracles)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {KMV_P}"


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """(group..., h) rows: the k smallest distinct key hashes per
    group (all of them when a group has fewer than k distinct keys).

    Two-phase k-smallest so no task sorts an entire group: phase 1
    ranks within (group, h mod n_shards) — n_shards parallel sorts per
    group, each pre-trimmed to k rows — phase 2 ranks the
    <= n_shards*k survivors per group. The k smallest overall are a
    subset of the union of per-shard k smallest, so the two-phase
    result equals the oracle's direct ORDER BY h LIMIT k (asserted in
    tests)."""
    gcols = list(group_cols or [])
    # r15: the r14 spread_scan here was RETRACTED — fresh-session
    # interleaved pairs on sketch_kmv_overlap read spread/no-spread =
    # 0.67x/0.62x/0.72x (sf0.1, noop): one md5 per key is a cheap map,
    # below the added exchange's cost at fixture scale (no-op at
    # production scale either way).
    hashes = (
        df.select(*gcols, kmv_hash(key_col).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    return kmv_sketch_from_hashes(hashes, gcols, k, n_shards)


def kmv_sketch_from_hashes(
    hashes: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """Two-phase k-smallest over an already-distinct (group..., h)
    frame — split out so callers that need the full hash table anyway
    (e.g. to carry exact counts beside the estimates) hash once."""
    gcols = list(group_cols or [])
    w1 = Window.partitionBy(
        *gcols, F.pmod(F.col("h"), F.lit(n_shards))
    ).orderBy("h")
    p1 = (
        hashes.select(*gcols, "h")
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    w2 = Window.partitionBy(*gcols).orderBy("h")
    return (
        p1.withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """KMV sketch of the key-set UNION: k smallest of the merged rows.
    Associative and commutative (k-min of k-mins == k-min of the
    union, asserted in tests) — shard/microbatch sketches fold in any
    order, the mergeable-summary property every sketch here shares."""
    gcols = list(group_cols or [])
    w = Window.partitionBy(*gcols).orderBy("h")
    return (
        a.unionByName(b)
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def _theta(n_kept: Column, max_h: Column, k: int) -> Column:
    """theta = k-th smallest hash, or P for a saturated-below-k sketch
    (it then holds the whole hash set and estimates become exact)."""
    return F.when(n_kept < k, F.lit(KMV_P)).otherwise(max_h)


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """(group..., n_kept, theta, est_distinct) per group.

    est = (k-1) * P DIV theta — with theta = P on the under-k branch
    this is exactly n_kept... except (k-1)*P DIV P = k-1 != n_kept, so
    the under-k branch returns n_kept directly (the sketch holds every
    hash; the count IS the distinct count, modulo base-hash
    collisions, which are part of the sketch's contract and replayed
    by the oracle). (k-1)*P <= 255 * (1e9+7) ~ 2.6e11 for the default
    k — plain BIGINT, no widening needed; theta >= 1 on the DIV branch
    because n_kept = k >= 2 there and hashes are distinct."""
    gcols = list(group_cols or [])
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("max_h"),
    )
    return agg.select(
        *gcols,
        "n_kept",
        _theta(F.col("n_kept"), F.col("max_h"), k).alias("theta"),
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(F.expr(f"(CAST({k - 1} AS BIGINT) * {KMV_P}) DIV max_h"))
        .alias("est_distinct"),
    )


def kmv_set_estimates(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """One row of theta-sketch set estimates for two UNGROUPED
    sketches: (theta, est_a, est_b, est_union, est_intersect,
    jaccard_est_permille).

    theta = min(theta_A, theta_B); every hash below theta is a
    uniform 'theta/P' sample of the respective key set, so
    |{sample}| * P DIV theta estimates each region's cardinality —
    intersection included, the op HLL cannot do. When both sketches
    are under k (theta = P) every estimate is EXACT. Sample counts
    <= 2k, so counts * P fits BIGINT with room."""
    ea = kmv_estimate(a, [], k).select(
        F.col("n_kept").alias("_na"),
        F.col("theta").alias("_ta"),
        F.col("est_distinct").alias("est_a"),
    )
    eb = kmv_estimate(b, [], k).select(
        F.col("n_kept").alias("_nb"),
        F.col("theta").alias("_tb"),
        F.col("est_distinct").alias("est_b"),
    )
    inter = a.select("h").intersect(b.select("h"))
    uni = a.select("h").union(b.select("h")).distinct()
    stats = (
        F.broadcast(ea)
        .crossJoin(F.broadcast(eb))
        .withColumn("theta", F.least("_ta", "_tb"))
    )
    n_inter = inter.join(
        F.broadcast(stats.select("theta")), inter["h"] < F.col("theta")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    n_union = uni.join(
        F.broadcast(stats.select("theta")), uni["h"] < F.col("theta")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_union"))
    return (
        stats.crossJoin(F.broadcast(n_inter))
        .crossJoin(F.broadcast(n_union))
        .select(
            "theta",
            "est_a",
            "est_b",
            F.expr(f"(n_union * CAST({KMV_P} AS BIGINT)) DIV theta").alias(
                "est_union"
            ),
            F.expr(f"(n_inter * CAST({KMV_P} AS BIGINT)) DIV theta").alias(
                "est_intersect"
            ),
            F.when(F.col("n_union") > 0, F.expr("(n_inter * 1000) DIV n_union"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("jaccard_est_permille"),
        )
    )


def kmv_pairwise_jaccard(
    sketches: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """All-pairs set estimates from ONE grouped sketch table: for every
    unordered group pair (a < b), (theta, n_inter, n_union,
    est_intersect, jaccard_est_permille). The payoff of sketch set
    algebra at matrix scale — G groups need G(G-1)/2 pairwise overlap
    answers and the corpus is scanned ONCE; every pair is then a
    k-row-table join.

    Per pair: theta = min(theta_a, theta_b); the pair's sample is each
    side's retained hashes strictly below theta, so
    n_union = |A<theta| + |B<theta| - n_inter (inclusion-exclusion on
    counted samples — no union materialization). Group stats are a
    G-row broadcast; the only row-level joins are sketch-vs-pairs
    range filters and the h-equijoin for n_inter, all bounded by G*k.
    """
    stats = kmv_estimate(sketches, [group_col], k)
    g = group_col
    pairs = (
        stats.select(
            F.col(g).alias("ga"),
            F.col("theta").alias("_ta"),
            F.col("est_distinct").alias("est_a"),
        )
        .crossJoin(
            stats.select(
                F.col(g).alias("gb"),
                F.col("theta").alias("_tb"),
                F.col("est_distinct").alias("est_b"),
            )
        )
        .filter(F.col("ga") < F.col("gb"))
        .withColumn("theta", F.least("_ta", "_tb"))
        .drop("_ta", "_tb")
    )
    sk = sketches.select(F.col(g).alias("_g"), "h")
    below_a = (
        sk.join(F.broadcast(pairs), (F.col("_g") == F.col("ga")) & (F.col("h") < F.col("theta")))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("long").alias("_na"))
    )
    below_b = (
        sk.join(F.broadcast(pairs), (F.col("_g") == F.col("gb")) & (F.col("h") < F.col("theta")))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("long").alias("_nb"))
    )
    shared = (
        sk.alias("x")
        .join(sk.alias("y"), (F.col("x.h") == F.col("y.h")) & (F.col("x._g") < F.col("y._g")))
        .select(F.col("x._g").alias("ga"), F.col("y._g").alias("gb"), F.col("x.h").alias("h"))
        .join(F.broadcast(pairs.select("ga", "gb", "theta")), ["ga", "gb"])
        .filter(F.col("h") < F.col("theta"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("long").alias("_ni"))
    )
    out = (
        pairs.join(below_a, ["ga", "gb"], "left")
        .join(below_b, ["ga", "gb"], "left")
        .join(shared, ["ga", "gb"], "left")
        .na.fill(0, ["_na", "_nb", "_ni"])
        .withColumn("n_inter", F.col("_ni"))
        .withColumn("n_union", (F.col("_na") + F.col("_nb") - F.col("_ni")).cast("long"))
    )
    return out.select(
        "ga",
        "gb",
        "theta",
        "est_a",
        "est_b",
        "n_inter",
        "n_union",
        F.expr(f"(n_inter * CAST({KMV_P} AS BIGINT)) DIV theta").alias(
            "est_intersect"
        ),
        F.when(F.col("n_union") > 0, F.expr("(n_inter * 1000) DIV n_union"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("jaccard_est_permille"),
    )


def kmv_churn_estimates(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Directional set-difference estimates for two ungrouped sketches
    — one row (theta, est_a_only, est_both, est_b_only): the CHURN
    decomposition of kmv_set_estimates' overlap (reading A as the
    before period and B as the after: lapsed / retained / new).

    Below theta = min(theta_A, theta_B) sketch membership equals set
    membership (each side retains ALL its hashes under its own theta,
    and theta is the smaller), so the differences are exact counted
    samples: est_a_only = (|A<theta| - |A∩B<theta|) * P DIV theta,
    symmetrically for B. Same k-row joins as the overlap estimator —
    no corpus access, no new exchange shapes."""
    ea = kmv_estimate(a, [], k).select(
        F.col("theta").alias("_ta"),
    )
    eb = kmv_estimate(b, [], k).select(
        F.col("theta").alias("_tb"),
    )
    stats = (
        F.broadcast(ea)
        .crossJoin(F.broadcast(eb))
        .withColumn("theta", F.least("_ta", "_tb"))
        .select("theta")
    )
    inter = a.select("h").intersect(b.select("h"))

    def below(df, name):
        return df.join(
            F.broadcast(stats), df["h"] < F.col("theta")
        ).agg(F.count(F.lit(1)).cast("long").alias(name))

    n_a = below(a.select("h"), "_na")
    n_b = below(b.select("h"), "_nb")
    n_i = below(inter, "_ni")
    return (
        stats.crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_i))
        .select(
            "theta",
            F.expr(f"((_na - _ni) * CAST({KMV_P} AS BIGINT)) DIV theta").alias(
                "est_a_only"
            ),
            F.expr(f"(_ni * CAST({KMV_P} AS BIGINT)) DIV theta").alias("est_both"),
            F.expr(f"((_nb - _ni) * CAST({KMV_P} AS BIGINT)) DIV theta").alias(
                "est_b_only"
            ),
        )
    )
