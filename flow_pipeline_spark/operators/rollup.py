"""The flows_5m rollup family — the reference's SummingMergeTree tier.

Reference semantics (compose/clickhouse/create.sh:70-110, README.md:164-183):
- ``flows_5m_view`` groups each inserted block by
  ``(Date, Timeslot=toStartOfFiveMinute(TimeReceived), SrcAS, DstAS,
  ETypeMap.EType)`` with ``sum(Bytes), sum(Packets), count()`` and the
  per-EType sub-sums carried as parallel Nested arrays
  (``ETypeMap.EType/Bytes/Packets/Count``, create.sh:78-83,100-103).
- The table stores PARTIAL sums; background merges (or ``OPTIMIZE TABLE``)
  combine rows sharing the sort key. Readers must re-aggregate or OPTIMIZE
  first — unbounded lateness is tolerated (SURVEY §2.6 W5).

Spark design:
- ``build_rollup_5m``: one shuffle to (slot, SrcAS, DstAS, EType) partial
  sums — Catalyst already does partial+final aggregation map-side — then a
  cheap second agg to reconstruct the Nested shape as a sorted
  array<struct<EType,Bytes,Packets,Count>> (canonical form of ClickHouse's
  parallel arrays; order fixed by EType so results hash stably).
- ``compact_rollup``: the OPTIMIZE-equivalent — idempotent re-aggregation of
  stored partials, safe to run anytime, any number of times.
- ``route_traffic_query``: answers eligible aggregates from the rollup
  instead of raw (the reference does this by hand-pointing dashboards at
  flows_5m; Spark won't rewrite automatically — SURVEY §4).

Scale: the rollup is ~|5-min slots| × |AS pairs| × |ETypes| rows — orders of
magnitude smaller than raw. At 100 TB raw, the rollup still fits a single
executor's memory per Date partition; compaction is partition-parallel with
no cross-Date shuffle (Date is in every group key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import to_start_of_five_minute

ROLLUP_KEY = ["Date", "Timeslot", "SrcAS", "DstAS"]
SUB_KEY = "EType"


def build_rollup_5m(flows_raw: DataFrame) -> DataFrame:
    """flows_raw → flows_5m rows (fully merged form).

    Output schema mirrors create.sh:70-90: group key + ETypeMap
    array<struct> + total Bytes/Packets/Count.
    """
    per_etype = (
        flows_raw
        .groupBy(
            F.col("Date"),
            to_start_of_five_minute(F.col("TimeReceived")).alias("Timeslot"),
            F.col("SrcAS"), F.col("DstAS"),
            F.col("Etype").alias(SUB_KEY),
        )
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.count("*").alias("Count"))
    )
    return (
        per_etype
        .groupBy(*ROLLUP_KEY)
        .agg(
            F.sort_array(F.collect_list(F.struct(
                SUB_KEY, "Bytes", "Packets", "Count"))).alias("ETypeMap"),
            F.sum("Bytes").alias("Bytes"),
            F.sum("Packets").alias("Packets"),
            F.sum("Count").alias("Count"),
        )
    )


def rollup_flat(flows_raw: DataFrame) -> DataFrame:
    """The flat (EType-in-key) form — informationally equivalent to the
    Nested shape (SURVEY §2.3 A8) and the natural stored layout: stays
    fully columnar, no array construction on the write path."""
    return (
        flows_raw
        .groupBy(
            F.col("Date"),
            to_start_of_five_minute(F.col("TimeReceived")).alias("Timeslot"),
            F.col("SrcAS"), F.col("DstAS"),
            F.col("Etype").alias(SUB_KEY),
        )
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.count(F.lit(1)).alias("Count"))
    )


def compact_rollup(partials: DataFrame) -> DataFrame:
    """OPTIMIZE-equivalent (README.md:164-173): merge stored partial rows
    sharing the sort key by re-summing. Idempotent — compacted input is a
    fixed point. Works on the flat form."""
    return (
        partials
        .groupBy(*ROLLUP_KEY, SUB_KEY)
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.sum("Count").alias("Count"))
    )


def rollup_invariant_check(flows_raw: DataFrame, partials: DataFrame) -> bool:
    """The SummingMergeTree guarantee: fully-compacted rollup ≡ direct
    re-aggregation of raw (FIXTURES.md F6)."""
    a = compact_rollup(partials)
    b = rollup_flat(flows_raw)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def route_traffic_query(flows_raw: DataFrame, rollup: DataFrame | None,
                        group_cols: list[str], *, interval_s: int = 300
                        ) -> DataFrame:
    """Answer ``sum(Bytes)/sum(Packets)/count per (time bucket, keys)`` from
    the rollup when eligible, else from raw.

    Eligible ⇔ a rollup is available, requested keys ⊆ rollup keys, and the
    bucket is a multiple of 5 minutes (create.sh:96 granularity).
    """
    from ..functions.timeutil import to_start_of_interval

    eligible = (
        rollup is not None
        and interval_s % 300 == 0
        and set(group_cols) <= {"Date", "SrcAS", "DstAS", SUB_KEY}
    )
    if eligible:
        # sum is associative, so partials need no compaction pass first:
        # grouping the stored partial rows straight into the requested
        # bucket is one shuffle instead of two, same result
        bucket = to_start_of_interval(F.col("Timeslot"), interval_s)
        return (
            rollup.groupBy(bucket.alias("t"), *group_cols)
            .agg(F.sum("Bytes").alias("Bytes"),
                 F.sum("Packets").alias("Packets"),
                 F.sum("Count").alias("Count"))
        )
    bucket = to_start_of_interval(F.col("TimeReceived"), interval_s)
    return (
        flows_raw.groupBy(bucket.alias("t"), *group_cols)
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.count(F.lit(1)).alias("Count"))
    )


# ---------------------------------------------------------------------------
# AggregatingMergeTree: re-aggregable DISTINCT states (uniqState/uniqMerge)
# ---------------------------------------------------------------------------

def uniq_state(df: DataFrame, keys: list[str], col: str, *,
               lgk: int = 12, state_col: str = "uniq_state") -> DataFrame:
    """ClickHouse ``uniqState`` — the AggregatingMergeTree sibling of
    the SummingMergeTree rollup above: per-key DISTINCT-count SKETCH
    states (Apache DataSketches HLL via Spark's native
    ``hll_sketch_agg``) that persist like any column and RE-AGGREGATE
    to any coarser grouping later without touching raw rows. Sums
    re-aggregate for free (SummingMergeTree); distinct counts don't —
    this is the standard fix, and why CH ships the -State/-Merge
    combinator pair.

    Scale: the stored state is ~2^lgk bytes per key regardless of
    cardinality; building is one partial-aggregated shuffle (sketches
    merge map-side); every later rollup touches |keys| rows, never the
    raw table."""
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(col, F.lit(lgk)).alias(state_col)))


def uniq_merge(states: DataFrame, keys: list[str], *,
               state_col: str = "uniq_state",
               out_col: str = "approx_distinct") -> DataFrame:
    """ClickHouse ``uniqMerge``: fold stored sketch states up to a
    coarser key set and read the estimate — the raw table never
    re-scans. Estimates land within standard HLL error of the exact
    distinct (pytest-pinned). CAVEAT, measured not assumed: the
    DataSketches ESTIMATE is path-dependent — direct-built sketches
    use the HIP estimator, unions fall back to the composite one, and
    even the union result can shift ~1% with partition layout (the
    per-partition partial-union tree differs). Fine for monitoring
    panels; NOT the bit-reproducibility this repo pins elsewhere —
    ``uniq_register_state``/``uniq_register_merge`` below are the
    deterministic, oracle-checked form; this pair is the
    production-accuracy (lgk-tunable) native one."""
    return (states.groupBy(*keys)
            .agg(F.hll_sketch_estimate(
                F.hll_union_agg(state_col)).alias(out_col)))


# Register-rows HLL: p=6 -> m=64 registers; 28-bit md5-derived hash =
# 6 bucket bits + 22 suffix bits; rho in [1, 23].
HLL_P = 6
HLL_M = 1 << HLL_P                 # 64
HLL_W = 22                         # suffix width
HLL_RMAX = HLL_W + 1               # 23 (suffix == 0)
# alpha_64 * m^2 * 2^RMAX * 100, for the e2 fixed-point raw estimate —
# written as the same two-literal product in the DuckDB oracle so the
# folded double constant is identical bit-for-bit
HLL_EST_NUM = 0.709 * 3435973836800.0     # 0.709 * 2^35 * 100


def uniq_register_state(df: DataFrame, keys: list[str],
                        col: str) -> DataFrame:
    """Deterministic ``uniqState`` — the register-ROWS HLL sketch, the
    exact-arithmetic sibling of ``uniq_state`` above (whose
    DataSketches estimates are path-dependent: HIP on the direct path,
    composite after unions — fine in production, but not the
    bit-reproducibility this repo pins). Here the state is literally
    rows: per key, per register bucket, the max leading-zero rank
    ``r`` — a pure function of the VALUE SET via md5, so states and
    every downstream merge/estimate are identical on any engine,
    partitioning, or merge order (ClickHouse's own uniq is exactly
    such a fixed-arithmetic sketch; AggregatingMergeTree persists the
    states, uniqMerge folds them).

    Scale: the state is <= m=64 rows per key (register rows absent
    for untouched buckets); building is one partial-aggregated
    groupBy — max(r) merges map-side, raw values never shuffle.

    NULL values are excluded up front (the distinct-count convention —
    countDistinct and the n_exact column this rides beside both ignore
    NULLs; without the filter md5(NULL) would mint a phantom
    (bucket=NULL, r=NULL) register row that skews n_regs/s_scaled)."""
    df = df.where(F.col(col).isNotNull())
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 7),
               16, 10).cast("long")
    suffix = h.bitwiseAND(F.lit((1 << HLL_W) - 1))
    rho = (F.when(suffix == 0, F.lit(HLL_RMAX))
           .otherwise(F.lit(HLL_RMAX) - F.length(F.bin(suffix))))
    return (df.select(*keys,
                      F.shiftright(h, HLL_W).alias("bucket"),
                      rho.cast("int").alias("rho"))
            .groupBy(*keys, "bucket")
            .agg(F.max("rho").alias("r")))


def uniq_register_merge(states: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic ``uniqMerge``: fold register rows up to a coarser
    key set (max per bucket — associative, commutative, idempotent)
    and evaluate the raw HLL estimate in pinned arithmetic: the
    register sum ``s_scaled = sum(2^(RMAX-r)) + absent*2^RMAX`` is an
    EXACT int64; the estimate is ONE double division of two exactly-
    representable values, HALF-UP at e2 — identical on any engine.
    Returns (keys..., n_regs, s_scaled, est_e2). No small/large-range
    correction branches (they'd re-introduce libm ln) — raw-estimate
    accuracy (~1.04/sqrt(64) ~ 13% relative) is the documented
    contract at this register count; raise HLL_P for production
    accuracy."""
    regs = (states.groupBy(*keys, "bucket").agg(F.max("r").alias("r")))
    per = (regs.groupBy(*keys)
           .agg(F.count("*").cast("long").alias("n_regs"),
                F.sum(F.expr(f"shiftleft(1L, {HLL_RMAX} - r)"))
                .alias("s_present")))
    s_scaled = (F.col("s_present")
                + (F.lit(HLL_M) - F.col("n_regs"))
                * F.lit(1 << HLL_RMAX)).cast("long")
    est = F.floor(F.lit(HLL_EST_NUM) / F.col("s_scaled") + F.lit(0.5)) \
        .cast("long")
    return (per.withColumn("s_scaled", s_scaled)
            .withColumn("est_e2", est)
            .drop("s_present"))


def histogram_state(df: DataFrame, keys: list[str], col: str, *,
                    lo: int, hi: int, n_bins: int) -> DataFrame:
    """ClickHouse ``quantileState`` made deterministic — the percentile
    member of the -State/-Merge family (sums: SummingMergeTree tier;
    distincts: uniq_register_state above): per key, fixed-width BIN
    COUNTS over an integer-valued column (use the repo's v100 device
    for 2-decimal doubles). Counts are plainly summable, so the stored
    state re-aggregates to any coarser key/time grouping by a groupBy
    sum — and any quantile then reads from the merged histogram with
    bin-width resolution, raw rows never re-scanned. Everything is
    integer arithmetic: bin = clamp((v-lo)*n_bins div (hi-lo)) —
    identical on any engine.

    Scale: state is <= n_bins rows per key; build is one
    partial-aggregated shuffle. NULL values are excluded (the SQL
    percentile convention) — unfiltered they would land in a phantom
    NULL bin and inflate every quantile's total."""
    df = df.where(F.col(col).isNotNull())
    span = hi - lo
    b = F.least(F.greatest(
        F.expr(f"(({col} - {lo}L) * {n_bins}L) div {span}L"), F.lit(0)),
        F.lit(n_bins - 1)).cast("int")
    return (df.groupBy(*keys, b.alias("bin"))
            .agg(F.count("*").cast("long").alias("cnt")))


def histogram_merge_quantiles(states: DataFrame, keys: list[str],
                              quantiles: list[tuple[str, int]], *,
                              lo: int, hi: int,
                              n_bins: int) -> DataFrame:
    """``quantileMerge``: fold stored bin counts to a coarser key set
    and read quantiles from the cumulative histogram. ``quantiles`` is
    [(name, q_e4)] — each answer is the SMALLEST bin whose cumulative
    count reaches q (exact integer comparison ``cum*10^4 >= q_e4 *
    total``: no float rank interpolation, no tie lottery), reported as
    ``{name}_bin`` plus its lower bound ``{name}_lo`` in the column's
    own units. Accuracy is bin-width, the documented contract — the
    exact-percentile twin is value_percentiles, the sketch twin
    approx_percentiles."""
    from pyspark.sql import Window as W
    span = hi - lo
    m = states.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))
    wc = W.partitionBy(*keys).orderBy("bin") \
        .rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy(*keys)
    c = (m.withColumn("cum", F.sum("cnt").over(wc))
         .withColumn("total", F.sum("cnt").over(wt)))
    aggs = [F.max("total").cast("long").alias("total")]
    for name, q_e4 in quantiles:
        hit = F.when(F.col("cum") * 10000 >= F.lit(q_e4) * F.col("total"),
                     F.col("bin"))
        aggs.append(F.min(hit).cast("long").alias(f"{name}_bin"))
    out = c.groupBy(*keys).agg(*aggs)
    for name, _ in quantiles:
        out = out.withColumn(
            f"{name}_lo",
            (F.lit(lo) + F.col(f"{name}_bin") * F.lit(span)
             / F.lit(n_bins)).cast("long"))
    return out


def bitmap_state(df: DataFrame, keys: list[str], col: str, *,
                 chunk_bits: int = 16) -> DataFrame:
    """ClickHouse ``groupBitmapState`` — the EXACT member of the
    -State/-Merge family (sums: SummingMergeTree tier; approximate
    distincts: uniq_register_state; percentiles: histogram_state):
    per key, the persisted state is the distinct VALUE SET itself,
    chunked roaring-style by the value's high bits so no single row
    ever holds more than 2^chunk_bits values. Unlike the HLL forms
    this supports SET EXPRESSIONS between stored segments —
    bitmapAndCardinality / bitmapOrCardinality / bitmapAndnot — which
    no sketch of this family can answer exactly ("users who did BOTH
    A and B" from states, raw rows never re-scanned).

    State rows are (keys…, chunk, vals sorted-distinct array<long>) —
    a pure function of the value set: identical on any engine,
    partitioning, or merge order. Storage is O(distinct) like CH's
    roaring bitmaps (dense chunks there compress to 2^16 bits; here
    the array form keeps the oracle-exact cross-engine shape).

    Scale: collect_set partial-aggregates map-side, so raw rows
    reduce to distincts BEFORE the shuffle; the chunk key spreads a
    hot segment's set across 2^(64-chunk_bits) rows — one row is
    never larger than 2^chunk_bits longs (~512 KiB). NULL values are
    excluded (collect_set would drop them from ``vals`` anyway, but
    unfiltered they'd still mint an empty chunk=NULL state row)."""
    v = F.col(col).cast("long")
    return (df.where(v.isNotNull())
            .groupBy(*keys, F.shiftright(v, chunk_bits).alias("chunk"))
            .agg(F.array_sort(F.collect_set(v)).alias("vals")))


def bitmap_merge(states: DataFrame, keys: list[str]) -> DataFrame:
    """``groupBitmapMergeState``: fold stored chunk rows up to a
    coarser key set — per (keys…, chunk) the union of the value
    arrays (associative, commutative, idempotent, so epoch replay or
    repeated compaction cannot change the state). Same chunked shape
    in and out; re-aggregable again."""
    return (states.groupBy(*keys, "chunk")
            .agg(F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("vals")))).alias("vals")))


def bitmap_cardinality(states: DataFrame, keys: list[str], *,
                       out_col: str = "card") -> DataFrame:
    """``groupBitmapMerge`` read path: exact distinct count per key
    from stored states — sum of per-chunk set sizes (chunks partition
    the value space, so sizes add)."""
    m = bitmap_merge(states, keys)
    return (m.groupBy(*keys)
            .agg(F.sum(F.size("vals")).cast("long").alias(out_col)))


def bitmap_set_cardinalities(a: DataFrame, b: DataFrame) -> DataFrame:
    """``bitmapAndCardinality / bitmapOrCardinality /
    bitmapAndnotCardinality``: exact set-expression cardinalities
    between two stored segments. ``a``/``b`` are single-segment
    states (chunk, vals) — e.g. ``bitmap_merge`` output filtered to
    one key — and the result is ONE row (a_card, b_card, and_card,
    or_card, andnot_card).

    Per-chunk full-outer join (chunks partition the value space, so
    set algebra distributes over chunks), JVM array intrinsics for
    the per-chunk intersect/union/except, then one global sum — the
    segments' raw event history is never touched, and nothing wider
    than a chunk's two arrays is ever in memory."""
    e = F.array().cast("array<long>")
    j = (a.select("chunk", F.col("vals").alias("va"))
         .join(b.select("chunk", F.col("vals").alias("vb")),
               "chunk", "full_outer")
         .select(F.coalesce("va", e).alias("va"),
                 F.coalesce("vb", e).alias("vb")))
    return j.agg(
        F.sum(F.size("va")).cast("long").alias("a_card"),
        F.sum(F.size("vb")).cast("long").alias("b_card"),
        F.sum(F.size(F.array_intersect("va", "vb"))).cast("long")
        .alias("and_card"),
        F.sum(F.size(F.array_union("va", "vb"))).cast("long")
        .alias("or_card"),
        F.sum(F.size(F.array_except("va", "vb"))).cast("long")
        .alias("andnot_card"))


# KMV (k-minimum-values) sketch: 60-bit hash space = first 15 hex chars
# of md5, the weighted_sample hash device — exactly representable
# numerators for the pinned estimator below.
KMV_SPACE = 1152921504606846976.0          # 2^60 as a double literal


def kmv_state(df: DataFrame, keys: list[str], col: str, *,
              k: int = 256) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch — the APPROXIMATE
    set-operations member of the -State/-Merge family, closing it out:
    sums (SummingMergeTree tier), deterministic HLL
    (uniq_register_state), histogram quantiles (histogram_state),
    EXACT set ops (bitmap_state, O(distinct) storage), and now set ops
    at cardinalities where O(distinct) is impossible — the state is
    the k SMALLEST 60-bit md5 hashes of the distinct values
    (Bar-Yossef et al. 2002; the theta/KMV sketch family), O(k) per
    key forever, and unlike HLL it answers INTERSECTION estimates:
    for ``h`` in the union's min-k, membership in A's min-k ⇔
    membership in A itself (at most k−1 union elements precede it), so
    Jaccard reads off by counting matches (Beyer et al. 2007).

    The state is a pure function of the value set (md5, sorted,
    truncated), so states, merges and every estimate are identical on
    any engine, partitioning, or merge order — DuckDB-oracle-able
    end to end, estimates included. NULLs are excluded (the
    distinct-count convention).

    Scale: one (keys, h) partial-aggregated dedup shuffle, then a
    rank-limited window — Spark's WindowGroupLimit keeps only k rows
    per key on the map side, so the sort never sees the full distinct
    set. State: ≤ k longs per key regardless of cardinality."""
    from pyspark.sql import Window as W
    v = F.col(col)
    h = F.conv(F.substring(F.md5(v.cast("string")), 1, 15),
               16, 10).cast("long")
    d = (df.where(v.isNotNull())
         .select(*keys, h.alias("h"))
         .groupBy(*keys, "h").agg(F.lit(1).alias("_one")))
    w = W.partitionBy(*keys).orderBy("h")
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy(*keys)
            .agg(F.array_sort(F.collect_list("h")).alias("kmv")))


def kmv_merge(states: DataFrame, keys: list[str], *,
              k: int = 256) -> DataFrame:
    """``kmvMerge``: fold stored sketches to a coarser key set — min-k
    of the union of min-k sketches IS the min-k of the union set
    (mergeable sketch), via per-key array union + sort + truncate.
    Associative, commutative, IDEMPOTENT — safe in the streaming
    state-merge loop with no ledger, like the register and bitmap
    forms."""
    return (states.groupBy(*keys)
            .agg(F.slice(F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("kmv")))), 1, k).alias("kmv")))


def _kmv_est_e2(kmv: Column, k: int) -> Column:
    """Pinned KMV estimator in integer hundredths: fewer than k hashes
    ⇒ the sketch IS the distinct set (exact count); else
    ``(k−1)·2^60·100 / h_(k)`` — numerator written as the same
    two-literal double product in the DuckDB oracle ((k−1)·100 ≤ 15
    bits and 2^60 are both exact, their product correctly rounded
    identically), one double division, HALF-UP floor."""
    n = F.size(kmv)
    hk = F.greatest(F.element_at(kmv, k), F.lit(1))
    est = F.floor(F.lit(float((k - 1) * 100)) * F.lit(KMV_SPACE) / hk
                  + F.lit(0.5))
    return F.when(n < k, (n * 100).cast("long")).otherwise(
        est.cast("long"))


def kmv_estimate(states: DataFrame, keys: list[str], *,
                 k: int = 256, out_col: str = "est_e2") -> DataFrame:
    """Read path: fold sketches to the requested keys and report the
    distinct estimate in integer hundredths — exact below k, relative
    error ~1/sqrt(k−2) above it (k=256 → ~6%)."""
    m = kmv_merge(states, keys, k=k)
    return m.select(*keys, _kmv_est_e2(F.col("kmv"), k).alias(out_col))


def kmv_set_estimates(a: DataFrame, b: DataFrame, *,
                      k: int = 256) -> DataFrame:
    """Approximate segment set-ops from two stored sketches — the
    sketch twin of :func:`bitmap_set_cardinalities` for cardinalities
    where O(distinct) state rows are impossible. ``a``/``b`` are
    single-segment merged sketches (one row, column ``kmv``). Returns
    ONE row: per-segment estimates, the union estimate, the Jaccard in
    integer ten-thousandths, and the intersection estimate
    (``j × union``) — all from ≤ 3k longs, the segments' raw history
    and even their full distinct sets never touched.

    Everything after the array ops is pinned integer arithmetic
    (HALF-UP integer-div devices, the funnel conversion_e4 shape), so
    the DuckDB oracle reproduces every output bit-for-bit."""
    j = (a.select(F.col("kmv").alias("ka"))
         .crossJoin(b.select(F.col("kmv").alias("kb"))))
    u = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, k)
    j = j.select(
        "ka", "kb", u.alias("u"),
        F.size(F.array_intersect(F.array_intersect(u, F.col("ka")),
                                 F.col("kb"))).alias("m"))
    un_est = _kmv_est_e2(F.col("u"), k)
    j_e4 = F.expr("(20000 * m + size(u)) div (2 * size(u))")
    return (j.withColumn("_un", un_est)
            .select(
                _kmv_est_e2(F.col("ka"), k).alias("a_est_e2"),
                _kmv_est_e2(F.col("kb"), k).alias("b_est_e2"),
                F.col("_un").alias("union_est_e2"),
                j_e4.cast("long").alias("jaccard_e4"),
                F.expr("(2 * _un * m + size(u)) div (2 * size(u))")
                .cast("long").alias("inter_est_e2")))
