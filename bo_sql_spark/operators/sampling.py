"""Deterministic sampling, splitting, and shuffling for training data.

The pipeline ops every LLM data run needs and `df.sample()` can't give
you: sample/split decisions here are PURE FUNCTIONS of the row id, so

- re-running the pipeline (or a failed stage) yields byte-identical
  membership — no rand()/task-retry interaction;
- train/val/test assignment is stable as the corpus grows (a doc's
  split never changes when other docs are added);
- any engine can reproduce the decision (the mix is plain BIGINT
  arithmetic — the DuckDB oracles run the same formula, unlike
  xxhash64, which only Spark has).

The mix is a multiplicative LCG step mod a prime:
    h(id, salt) = ((id mod P) * 1000003 + 12345 + salt * 2654435761) mod P
P = 1e9+7. Not cryptographic — don't use where adversarial ids matter;
for split/sample decisions on non-adversarial ids the avalanche is
sufficient (salt shifts the whole assignment, giving independent
resamples). All operands stay < 2^63 for ids up to ~9e18/1e6, so the
arithmetic never overflows ANSI BIGINT at any realistic corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

PORTABLE_PRIME = 1_000_000_007
_MULT = 1_000_003
_ADD = 12_345
_SALT_MIX = 2_654_435_761


def portable_hash(col: Column | str, salt: int = 0) -> Column:
    """Engine-portable deterministic mix of an integer id column into
    [0, PORTABLE_PRIME). Same formula is embedded in the SQL oracles."""
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    return F.pmod(
        F.pmod(c, F.lit(PORTABLE_PRIME)) * _MULT
        + F.lit(_ADD + (salt * _SALT_MIX) % PORTABLE_PRIME),
        F.lit(PORTABLE_PRIME),
    )


def portable_hash_sql(expr: str, salt: int = 0) -> str:
    """The identical mix as DuckDB/ANSI SQL text (for oracles).

    The input is CAST to BIGINT first: DuckDB types small values (and
    prepared-statement lists) INT32, and the mix's intermediate
    products overflow 32 bits — caught by the cross-engine property
    test in tests/test_differential_fuzz.py."""
    add = _ADD + (salt * _SALT_MIX) % PORTABLE_PRIME
    p = PORTABLE_PRIME
    return (
        f"(((CAST({expr} AS BIGINT) % {p}) * {_MULT} + {add}) % {p} + {p}) % {p}"
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash falls
    below fraction * P. Membership is a pure function of (id, salt); a
    different salt gives an independent resample. Pushed to the scan as
    an ordinary filter predicate — no Sample node, no RNG state."""
    threshold = int(fraction * PORTABLE_PRIME)
    return df.filter(portable_hash(id_col, salt) < threshold)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a named split ('train'/'val'/'test'...) by hash
    range. Weights must sum to ~1. Leakage-safe grouping: pass the
    GROUP id (e.g. a cluster or url-domain id) as ``id_col`` and every
    member of the group lands in the same split — the standard guard
    against near-duplicate train/test leakage."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = portable_hash(id_col, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = h < int(acc * PORTABLE_PRIME)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    sources, keep all books). One scan, one CASE over the stratum
    column — no per-stratum jobs, unlike sampleBy at scale."""
    h = portable_hash(id_col, salt)
    thr = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        t = F.lit(int(frac * PORTABLE_PRIME))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        F.lit(int(default_fraction * PORTABLE_PRIME))
        if thr is None
        else thr.otherwise(F.lit(int(default_fraction * PORTABLE_PRIME)))
    )
    return df.filter(h < thr)


def deterministic_shuffle(df: DataFrame, id_col: str, salt: int = 0) -> DataFrame:
    """Global pseudorandom order as a SORT by hash (ties by id): the
    reproducible 'shuffle the corpus before packing' step. At scale
    this is a range-partitioned sort — Spark samples range bounds, so
    output files get near-equal sizes; re-running with the same salt
    reproduces the exact order."""
    return df.orderBy(portable_hash(id_col, salt), F.col(id_col))


def contiguous_shard(h_col: Column, n_shards: int) -> Column:
    """Shard id that is CONTIGUOUS in hash order: h DIV ceil(P/n_shards).
    Rows sorted by (shard, h, id) are in exactly the global (h, id)
    order — the property that lets a global window decompose into
    per-shard windows plus broadcast shard offsets. Hash-mod sharding
    (pmod) does NOT have it. Shard sizes are near-equal because the
    mix is near-uniform on [0, P)."""
    block = (PORTABLE_PRIME + n_shards - 1) // n_shards
    return (h_col.cast("long") / F.lit(block)).cast("long")


def _shard_offsets(staged: DataFrame, value_expr, n_shards: int) -> DataFrame:
    """(shard, _off) where _off = sum of ``value_expr`` over all EARLIER
    shards. n_shards rows total: the cumulative window here runs over
    the aggregated per-shard totals (bounded by n_shards, a constant),
    not over data rows — the post-aggregation global window the plan
    lint whitelists."""
    from pyspark.sql import Window

    totals = staged.groupBy("_shard").agg(
        F.sum(value_expr).cast("long").alias("_tot")
    )
    wo = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return totals.select(
        "_shard",
        F.coalesce(F.sum("_tot").over(wo), F.lit(0)).cast("long").alias("_off"),
    )


def deterministic_shuffle_positions(
    df: DataFrame, id_col: str, salt: int = 0, n_shards: int = 32
) -> DataFrame:
    """``deterministic_shuffle`` with the global 1-based position
    materialized — WITHOUT a single-task global window. The order key
    is the portable hash, so bucketing by its high range
    (``contiguous_shard``) gives shards that are contiguous runs of the
    global order: pos = (#rows in earlier shards) + row_number within
    the shard. Two passes over the (id)-projected scan — one for the
    per-shard window, one map-combinable count for the 32-row offsets
    table (broadcast back) — and no task ever holds more than
    ~corpus/n_shards rows. Output is independent of n_shards (pinned
    by a unit test), so the knob is free to scale with the cluster.
    Emits (pos BIGINT, <id_col>)."""
    from pyspark.sql import Window

    h = portable_hash(id_col, salt)
    staged = df.select(
        F.col(id_col), h.alias("_h")
    ).withColumn("_shard", contiguous_shard(F.col("_h"), n_shards))
    w = Window.partitionBy("_shard").orderBy("_h", id_col)
    local = staged.withColumn("_local", F.row_number().over(w).cast("long"))
    offsets = _shard_offsets(staged, F.lit(1), n_shards)
    return local.join(F.broadcast(offsets), "_shard").select(
        (F.col("_off") + F.col("_local")).cast("long").alias("pos"),
        id_col,
    )


def pack_sequences_sharded(
    docs: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_shards: int,
    salt: int = 0,
) -> DataFrame:
    """The 100 TB form of ``pack_sequences``: documents are first
    routed to ``n_shards`` deterministic shards (hash of id), and the
    concat-and-chunk layout runs INSIDE each shard — the window
    partitions by shard, so no task ever holds more than ~corpus/
    n_shards and shards lay out in parallel. Sequence ids are
    namespaced per shard (shard, seq_id). Output adds the ``shard``
    column; everything else matches pack_sequences.
    """
    from pyspark.sql import Window

    h = portable_hash(id_col, salt)
    shard = F.pmod(h, F.lit(n_shards)).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(F.col(id_col), F.col(n_tokens_col), h.alias("_h"), shard)
    start = (F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)).alias("_start")
    out = staged.select("shard", id_col, n_tokens_col, start)
    return out.select(
        F.col("shard").cast("long"),
        id_col,
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        (F.col("_start") / budget).cast("long").alias("seq_id"),
        F.pmod(F.col("_start"), F.lit(budget)).cast("long").alias("seq_offset"),
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    salt: int = 0,
    n_shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing: shuffle docs deterministically,
    lay their tokens end-to-end, cut every ``budget`` tokens.

    Emits (id, n_tokens, seq_id, seq_offset): doc's tokens start at
    ``seq_offset`` inside sequence ``seq_id`` (docs crossing a boundary
    continue into the next sequence — exactly what concat-then-chunk
    LLM pretraining pipelines do, no padding waste).

    The GLOBAL running-sum layout is computed without a single-task
    window: ``contiguous_shard`` buckets are contiguous runs of the
    (hash, id) order, so a doc's global token start = (token total of
    earlier shards, from a 32-row broadcast offsets table) + its
    running sum INSIDE its shard. The per-shard window holds at most
    ~corpus/n_shards rows; the offsets pass is a map-combinable sum.
    The result is bit-identical for any n_shards (unit-pinned), so the
    single global-window formulation remains the oracle's spelling
    while the engine never materializes the corpus on one task.
    ``pack_sequences_sharded`` is the variant that namespaces ids per
    shard and skips the offsets pass entirely.
    """
    from pyspark.sql import Window

    h = portable_hash(id_col, salt)
    staged = docs.select(
        F.col(id_col), F.col(n_tokens_col), h.alias("_h")
    ).withColumn("_shard", contiguous_shard(F.col("_h"), n_shards))
    w = (
        Window.partitionBy("_shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_start = F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)
    offsets = _shard_offsets(staged, F.col(n_tokens_col), n_shards)
    laid = (
        staged.withColumn("_lstart", local_start)
        .join(F.broadcast(offsets), "_shard")
        .withColumn("_start", (F.col("_off") + F.col("_lstart")).cast("long"))
    )
    return laid.select(
        id_col,
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.expr(f"_start DIV {int(budget)}").alias("seq_id"),
        F.pmod(F.col("_start"), F.lit(budget)).cast("long").alias("seq_offset"),
    )


def take_token_budget(
    df: DataFrame,
    part_col: str,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    salt: int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """Data-mixture sampling: per ``part_col`` group (e.g. source),
    take documents in deterministic hash order until the group's token
    budget is crossed — the 'N tokens of web, M tokens of code' mixing
    step of a pretraining run.

    A doc is kept iff the running total BEFORE it is under budget, so
    every group takes the first doc that crosses the line and nothing
    after (deterministic, gap-free). The per-source running sum
    decomposes over contiguous hash-range shards exactly like
    pack_sequences (per-(source, shard) windows + a broadcast
    sources x n_shards cumulative-offset table), so a DOMINANT source
    — 50 TB of web in a 100 TB corpus — never lands on one task; the
    output is bit-identical for any n_shards (the naive single window
    is the n_shards=1 special case; shard-invariance unit-pinned).
    """
    from pyspark.sql import Window

    h = portable_hash(id_col, salt)
    staged = df.select(
        F.col(part_col),
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("_nt"),
        h.alias("_h"),
    ).withColumn("_shard", contiguous_shard(F.col("_h"), n_shards))
    w = (
        Window.partitionBy(part_col, "_shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = staged.groupBy(part_col, "_shard").agg(
        F.sum("_nt").alias("_tot")
    )
    wo = (
        Window.partitionBy(part_col)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        part_col,
        "_shard",
        F.coalesce(F.sum("_tot").over(wo), F.lit(0)).cast("long").alias("_off"),
    )
    cum = (F.sum("_nt").over(w) + F.col("_off")).cast("long")
    return (
        staged.join(F.broadcast(offsets), [part_col, "_shard"])
        .withColumn("cum_tokens", cum)
        .filter((F.col("cum_tokens") - F.col("_nt")) < budget)
        .select(
            part_col,
            id_col,
            F.col("_nt").alias("n_tokens"),
            "cum_tokens",
        )
    )


def temperature_mix_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    half_powers: int = 1,
    salt: int = 0,
) -> DataFrame:
    """Temperature-reweighted mixing — the multilingual/multi-source
    LLM data recipe (p_s ~ n_s^alpha, alpha < 1: XLM/mBERT-style
    upweighting of low-resource strata, Conneau & Lample 2019). The
    per-stratum keep RATE is derived IN-ENGINE from the stratum
    counts:

        r_s = (n_min / n_s) ^ (1 / 2^half_powers)

    so the smallest stratum keeps everything and larger strata are
    deterministically downsampled toward the tempered distribution
    (half_powers=1 -> alpha = 1/2; 2 -> alpha = 3/4). The exponent is
    restricted to sqrt chains ON PURPOSE: IEEE-754 specifies sqrt (and
    division) as correctly rounded, so both engines compute the exact
    same double for r_s — pow() carries no such guarantee and would
    break oracle parity at the last ulp. The keep decision is the
    portable integer mix vs FLOOR(r_s * P), a pure function of
    (id, salt): retries, partitionings, and engines all agree
    row-for-row.

    The compared value is the SQUARED mix, (h*h) mod P — not h: the
    linear mix is a Weyl sequence, and strata whose ids follow an
    arithmetic pattern (every deterministic generator's do) land
    systematically above or below a high threshold (measured: three
    strata kept 100% at a 0.93 target). One nonlinear step
    de-correlates it (the round-6 JL sign lesson), stays pure BIGINT
    (h < P ~ 1e9, h^2 < 2^63), and is identical in any engine.

    Plan shape: one map-combinable stratum count (tiny), broadcast
    back over the scan, filter at the scan stage — no shuffle of the
    corpus, no RNG state, no Sample node."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    ratio = F.col("_n_min").cast("double") / F.col("_n").cast("double")
    r = ratio
    for _ in range(int(half_powers)):
        r = F.sqrt(r)
    thr = counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        F.floor(r * PORTABLE_PRIME).cast("long").alias("_thr"),
    )
    h = portable_hash(id_col, salt)
    h2 = F.pmod(h * h, F.lit(PORTABLE_PRIME))
    return df.join(F.broadcast(thr), strata_col).filter(
        h2 < F.col("_thr")
    ).drop("_thr")


def epoch_upsample_budget(
    df: DataFrame,
    part_col: str,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    salt: int = 0,
) -> DataFrame:
    """Epoch-aware UPSAMPLING to a token budget: small sources REPEAT
    (epoch 0, 1, 2, ...) until each source has contributed ``budget``
    tokens — the data-repetition recipe for high-quality/low-volume
    sources (Muennighoff et al. 2023 quantify how many epochs repeated
    data stays worth training on; the mixing step needs the repetition
    made explicit). Emits (source, epoch, doc_id, n_tokens,
    cum_tokens): docs cycle in deterministic hash order, epoch after
    epoch, and the first doc that crosses the budget line is the last
    one in (same gap-free cut rule as take_token_budget, which is the
    single-epoch downsampling sibling).

    In-engine and deterministic end to end: per-source token totals
    (tiny map-combinable agg) broadcast back to compute each source's
    epoch count ceil(budget / total); epochs materialize as an
    explode over sequence(0, n_epochs-1) — the corpus scans ONCE and
    only rows that can reach the budget line replicate. The running
    cut decomposes over contiguous shards like take_token_budget: the
    per-source order is (epoch, hash, id), and the combined shard
    epoch * n_shards + contiguous_shard(hash) is contiguous in that
    order, so per-(source, shard) windows + a broadcast cumulative
    offsets table reproduce the global running sum bit-for-bit at any
    n_shards — a dominant source never lands on one task. A source
    with more tokens than the budget never replicates (n_epochs = 1)
    and degenerates to take_token_budget exactly.
    """
    from pyspark.sql import Window

    h = portable_hash(id_col, salt)
    totals = df.groupBy(part_col).agg(
        F.sum(F.col(n_tokens_col).cast("long")).alias("_tot")
    )
    epochs = totals.select(
        part_col,
        F.expr(f"CAST(({int(budget)} + _tot - 1) DIV _tot AS INT)").alias(
            "_n_epochs"
        ),
    )
    n_shards = 16
    staged = (
        df.join(F.broadcast(epochs), part_col)
        .select(
            part_col,
            F.col(id_col),
            F.col(n_tokens_col).cast("long").alias("_nt"),
            h.alias("_h"),
            F.explode(F.sequence(F.lit(0), F.col("_n_epochs") - 1)).alias(
                "epoch"
            ),
        )
        .withColumn(
            "_shard",
            (F.col("epoch").cast("long") * n_shards)
            + contiguous_shard(F.col("_h"), n_shards),
        )
    )
    w = (
        Window.partitionBy(part_col, "_shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals_sh = staged.groupBy(part_col, "_shard").agg(
        F.sum("_nt").alias("_tot")
    )
    wo = (
        Window.partitionBy(part_col)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals_sh.select(
        part_col,
        "_shard",
        F.coalesce(F.sum("_tot").over(wo), F.lit(0)).cast("long").alias("_off"),
    )
    cum = (F.sum("_nt").over(w) + F.col("_off")).cast("long")
    return (
        staged.join(F.broadcast(offsets), [part_col, "_shard"])
        .withColumn("cum_tokens", cum)
        .filter((F.col("cum_tokens") - F.col("_nt")) < budget)
        .select(
            part_col,
            F.col("epoch").cast("long"),
            id_col,
            F.col("_nt").alias("n_tokens"),
            "cum_tokens",
        )
    )


def weighted_reservoir_topk(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: int = 0
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact size k
    (Efraimidis & Spirakis 2006): each row draws key_i = u_i^(1/w_i)
    from its deterministic uniform u_i and the k LARGEST keys win.
    The distributed-native weighted reservoir — the complement of
    sample_quality_weighted's Bernoulli form, which weights keep
    PROBABILITY but cannot promise an exact sample size.

    Integer form (both engines replay it bit-for-bit): maximizing
    u^(1/w) is maximizing ln(u)/w (ln u <= 0), so

        u_i       = (portable_hash(id, salt) + 1) / P      in (0, 1]
        es_key    = (ln_micros(h+1) - ln_micros(P)) * 1e6 DIV w

    via the fixed-point ln (functions/fixedpoint.py). The numerator is
    <= 0 with |.| <= ln(P)*1e12 ~ 2.1e13 — plain BIGINT; Spark DIV and
    DuckDB // agree by truncating toward zero on the negative quotient
    (the cross-engine fuzz pins this). Quantization can tie keys at
    the boundary, so the cut orders by (es_key DESC, id ASC) — total
    and engine-portable.

    ``weight_col`` must be BIGINT >= 1 (callers clamp with
    greatest(1, w)); rows with weight < 1 are EXCLUDED by an explicit
    filter before the key draw. That is both the E-S limit semantics
    (u^(1/w) -> 0 as w -> 0+ for u < 1: a zero-weight row can never
    win) and the only engine-independent behavior — DIV 0 throws
    under Spark ANSI mode but returns NULL under ansi=off and in
    DuckDB //, so leaving w=0 to the division would make the result
    depend on session config
    (test_weighted_reservoir_zero_weight_excluded pins this).

    Scale shape: the ln chain is a fixed list of codegen'd integer
    ops evaluated once per candidate ROW in the scan stage (the
    summary-grain ln doctrine is about token-exploded grains; document
    grain is the reservoir's natural input), and the cut is a global
    top-k — TakeOrderedAndProject, per-partition heaps of k rows, no
    full sort, no shuffle of non-winners.
    """
    from bo_sql_spark.functions.fixedpoint import ln_micros_py, with_ln_micros

    ln_p = ln_micros_py(PORTABLE_PRIME)
    d = df.filter(F.col(weight_col) >= 1)
    d = d.withColumn("_h1", portable_hash(id_col, salt) + F.lit(1))
    d = with_ln_micros(d, "_h1", "_lnh1")
    d = d.withColumn(
        "es_key",
        F.expr(f"((_lnh1 - {ln_p}) * 1000000) DIV (`{weight_col}`)"),
    ).drop("_h1", "_lnh1")
    return d.orderBy(F.col("es_key").desc(), F.col(id_col).asc()).limit(k)


def weighted_reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Stratified weighted reservoir: the Efraimidis-Spirakis cut run
    independently per ``group_col`` — exactly min(k, |group|) rows per
    group, weighted without replacement within each. The 'exactly N
    exemplars per source, quality-weighted' step of a curriculum
    build. Same key as weighted_reservoir_topk; the cut is a
    row_number window PARTITIONED by group (never global), ordered by
    (es_key DESC, id) for the same portable tie total order."""
    from pyspark.sql import Window

    from bo_sql_spark.functions.fixedpoint import ln_micros_py, with_ln_micros

    ln_p = ln_micros_py(PORTABLE_PRIME)
    d = df.filter(F.col(weight_col) >= 1)
    d = d.withColumn("_h1", portable_hash(id_col, salt) + F.lit(1))
    d = with_ln_micros(d, "_h1", "_lnh1")
    d = d.withColumn(
        "es_key",
        F.expr(f"((_lnh1 - {ln_p}) * 1000000) DIV (`{weight_col}`)"),
    ).drop("_h1", "_lnh1")
    w = Window.partitionBy(group_col).orderBy(
        F.col("es_key").desc(), F.col(id_col).asc()
    )
    return (
        d.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
