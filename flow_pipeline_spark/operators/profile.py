"""Data profiling and drift monitoring — the operational tier every
long-running ingest pipeline runs beside the data path (Deequ/
dbt-style column profiles; PSI drift between snapshots).

Reference parity: no analog in /root/reference (the flow pipeline trusts
its protobuf schema end to end); this extends the training-data tier —
crawl snapshots drift (new sources, changed scrapers, encoding bugs),
and the profile/drift tables are what a curation pipeline alerts on.

Cross-engine discipline as everywhere: counts are exact integers; the
PSI transcendental pins per-bin to integer millionths (the
doc_perplexity device); add-one smoothing keeps every ratio a ratio of
positive integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame,
                    cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_value, max_value) — the Deequ/dbt-docs column profile. min/max
    render as strings so the schema is uniform across column types
    (callers profiling float columns should expect engine-specific
    float formatting; integer/string/date columns render identically
    everywhere).

    Scale: ONE scan, but NOT one-row-per-input work — multiple exact
    ``countDistinct`` aggregates in one ``agg`` compile to an Expand
    node that replicates every input row once per distinct column
    (N columns → N+1-way row expansion before the partial aggregate).
    Results are exact and the scan count stays 1; the CPU/shuffle cost
    grows with the column count. At 100 TB (or wide profiles) swap
    ``approx_count_distinct`` per column — HLL sketches fuse into one
    un-expanded aggregate — the approx_distinct_users trade; the
    per-column rows then unpivot driver-side from the 1-row
    aggregate."""
    cols = cols or df.columns
    # aliases are POSITIONAL tokens (never derived from column names) and
    # source columns are referenced through backtick-escaped F.col — no
    # SQL-string interpolation, so names with quotes/backticks/dots work

    def src(c):
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(F.when(src(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__null_{i}"),
            F.countDistinct(src(c)).alias(f"__dist_{i}"),
            F.min(src(c)).cast("string").alias(f"__min_{i}"),
            F.max(src(c)).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(F.lit(c).alias("column"),
                 row[f"__n_{i}"].alias("n_rows"),
                 row[f"__null_{i}"].alias("n_null"),
                 row[f"__dist_{i}"].alias("n_distinct"),
                 row[f"__min_{i}"].alias("min_value"),
                 row[f"__max_{i}"].alias("max_value"))
        for i, c in enumerate(cols)]
    return (row.select(F.explode(F.array(*structs)).alias("_s"))
            .select("_s.*"))


def check_constraints(df: DataFrame,
                      checks: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Deequ-style constraint verification: each check is (name,
    boolean Column meaning "this row PASSES"); returns one row per
    check — (check, n_rows, n_violations, pass_fraction_e4, passed) —
    with the pass fraction in exact integer ten-thousandths (HALF-UP,
    the _ratio_e4 device) so reports compare bitwise across engines.

    All checks evaluate in ONE aggregate over one scan (a null check
    result counts as a violation — unknown is not a pass). Referential
    checks (orphan foreign keys) are expressed by the caller as an
    anti-join flag column before calling — see the
    constraint_checks registry query for the TPC-H shape."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, cond) in enumerate(checks):
        aggs.append(F.sum(F.when(cond, 0).otherwise(1))
                    .cast("long").alias(f"__v_{i}"))
    row = df.agg(*aggs)
    structs = []
    for i, (name, _) in enumerate(checks):
        # empty frame: sum() is null and the e4 division is by zero —
        # report 0 violations over 0 rows as vacuously passed (10000),
        # the Deequ convention, instead of a null row
        n = row["__n"]
        v = F.coalesce(row[f"__v_{i}"], F.lit(0).cast("long"))
        frac_e4 = F.when(n == 0, F.lit(10000)).otherwise(
            F.expr(f"(20000 * (__n - __v_{i}) + __n) div (2 * __n)"))
        structs.append(F.struct(
            F.lit(name).alias("check"),
            n.alias("n_rows"),
            v.alias("n_violations"),
            frac_e4.cast("long").alias("pass_fraction_e4"),
            (v == 0).alias("passed")))
    return (row.select(F.explode(F.array(*structs)).alias("_s"))
            .select("_s.*"))


def psi_drift(ref: DataFrame, cur: DataFrame, bin_col,
              n_bins: int) -> DataFrame:
    """Population Stability Index between two snapshots over a shared
    integer binning: per bin, ``term = (p − q)·ln(p/q)`` with add-one
    smoothing ``p_i = (c_ref_i + 1)/(n_ref + B)`` (every ratio a ratio
    of positive integers — zero-count bins stay finite, the standard
    Laplace fix), pinned HALF-UP to integer millionths; ``psi_e6`` is
    the exact integer sum stamped on every row. The classic alert
    thresholds read on psi_e6/1e6: <0.1 stable, 0.1–0.25 drifting,
    >0.25 shifted.

    ``bin_col`` is a Column expression evaluating to ints in
    [0, n_bins) on BOTH frames — binning must be deterministic and
    shared (fixed-width or fixed-quantile edges computed ONCE and
    reused, never re-estimated per snapshot, or the drift measures the
    binning). Scale: two n_bins-bounded aggregates + a broadcast-sized
    join; snapshots never co-shuffle."""
    r = bin_histogram(ref, bin_col).withColumnRenamed("c", "c_ref")
    c = bin_histogram(cur, bin_col).withColumnRenamed("c", "c_cur")
    return psi_from_counts(r, c, n_bins)


def bin_histogram(df: DataFrame, bin_col) -> DataFrame:
    """(bin, c) counts under a shared binning — the persistable
    REFERENCE-profile artifact the streaming drift monitor probes every
    micro-batch against (train once on the accepted snapshot, store,
    compare forever)."""
    return (df.select(bin_col.alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("c")))


def psi_from_counts(ref_counts: DataFrame, cur_counts: DataFrame,
                    n_bins: int) -> DataFrame:
    """PSI from two pre-binned count tables (columns (bin, c_ref) and
    (bin, c_cur)) — the core :func:`psi_drift` and the streaming drift
    monitor share; missing bins fill with zero before smoothing."""
    spark = ref_counts.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    j = (bins.join(ref_counts, "bin", "left")
         .join(cur_counts, "bin", "left")
         .select("bin",
                 F.coalesce("c_ref", F.lit(0)).cast("long").alias("c_ref"),
                 F.coalesce("c_cur", F.lit(0)).cast("long").alias("c_cur"))
         # n_bins rows, referenced by the totals aggregate AND the final
         # select — without the cut both snapshot histograms (full scans
         # upstream) planned and ran twice (round-10)
         .localCheckpoint(eager=False))
    # totals ride one tiny broadcast aggregate (n_bins rows in, 1 out)
    tot = F.broadcast(j.agg(F.sum("c_ref").alias("_nr"),
                            F.sum("c_cur").alias("_nc")))
    p = (F.col("c_ref") + 1) / (F.col("_nr") + F.lit(n_bins))
    q = (F.col("c_cur") + 1) / (F.col("_nc") + F.lit(n_bins))
    term = (p - q) * F.log(p / q)
    term_e6 = (F.signum(term)
               * F.floor(F.abs(term) * 1e6 + F.lit(0.5))).cast("long")
    out = (j.crossJoin(tot)
           .withColumn("term_e6", term_e6)
           .select("bin", "c_ref", "c_cur", "term_e6"))
    total = F.broadcast(out.agg(F.sum("term_e6").alias("psi_e6")))
    return (out.crossJoin(total)
            .select("bin", "c_ref", "c_cur", "term_e6", "psi_e6")
            .orderBy("bin"))


def ewma_spikes(df: DataFrame, *, ts_col: str = "ts",
                key_col: str = "event_type", bucket_secs: int = 60,
                lookback: int = 8, ratio: int = 2) -> DataFrame:
    """Temporal anomaly flagging: per (key, time-bucket) event counts
    against an exponentially-weighted baseline of the preceding
    ``lookback`` buckets — the EWMA spike monitor every ingest
    dashboard runs (a flows deployment alerts on per-AS traffic spikes
    with exactly this shape).

    EXACT cross-engine arithmetic throughout: the half-life-per-bucket
    weight for a bucket ``d`` steps back is the INTEGER ``2^(lookback-d)``
    (α=1/2 EWMA, finite horizon), so ``baseline = num/den`` is a ratio
    of integers; a bucket is a spike iff ``cnt·den > ratio·num`` — an
    integer comparison, no float ever enters the verdict.
    ``baseline_e4`` reports the baseline in truncated integer
    ten-thousandths (``div``, matching DuckDB ``//``). Buckets with no
    preceding data in the horizon report a null baseline and never
    flag. Gaps are handled correctly: absent buckets contribute
    neither weight nor count (time-aligned, unlike a positional
    ``lag`` window).

    Scale: one corpus-wide partial+final count aggregate (|keys|·|buckets|
    rows out); the baseline builds by exploding ``lookback`` (offset,
    weight) literals over that AGGREGATED table and re-grouping — the
    fixed-lag equi-join trick — so the raw table shuffles once and the
    horizon never becomes a range join."""
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_secs) \
        .cast("long")
    agg = (df.groupBy(F.col(key_col).alias("k"), bucket.alias("bucket"))
           .agg(F.count("*").alias("cnt")))
    # ONE pipeline, no self-join (round-10): the former agg LEFT JOIN
    # baseline referenced agg twice, so the raw-table scan + count
    # aggregate planned and ran twice — the one corpus-wide pass this
    # operator promises to pay once. Folding the bucket's own row into
    # the explode as a d=0 member (weightless, carrying cnt and a
    # presence flag) lets the SAME re-group produce cnt, num and den:
    # groups whose d=0 member is absent are exactly the left join's
    # non-preserved rows and drop; a present d=0 member with den=0 is
    # exactly the join's null baseline. Identical rows, one scan, two
    # exchanges instead of four.
    offs = F.array(
        F.struct(F.lit(0).alias("d"), F.lit(0).cast("long").alias("w")),
        *[F.struct(F.lit(d).alias("d"),
                   F.lit(1 << (lookback - d)).cast("long").alias("w"))
          for d in range(1, lookback + 1)])
    contrib = (agg.select("k", "bucket", "cnt",
                          F.explode(offs).alias("o"))
               .select("k",
                       (F.col("bucket") + F.col("o.d")).alias("tb"),
                       F.when(F.col("o.d") == 0, F.col("cnt"))
                       .otherwise(F.lit(0)).alias("self_cnt"),
                       (F.col("o.d") == 0).alias("is_self"),
                       F.when(F.col("o.d") == 0, F.lit(0))
                       .otherwise(F.col("cnt") * F.col("o.w")).alias("wx"),
                       F.col("o.w").alias("w")))
    base = (contrib.groupBy("k", "tb")
            .agg(F.sum("self_cnt").alias("cnt"),
                 F.max("is_self").alias("has_self"),
                 F.sum("wx").alias("num"), F.sum("w").alias("den")))
    return (base.filter(F.col("has_self"))
            .select(F.col("k").alias(key_col),
                    F.col("tb").alias("bucket"),
                    F.col("cnt"),
                    # den = 0 ⇔ the old join found no baseline row →
                    # null (guarded: ANSI div would reject den = 0)
                    F.when(F.col("den") > 0,
                           F.expr("(num * 10000) div den")).cast("long")
                    .alias("baseline_e4"),
                    F.coalesce(
                        F.col("cnt") * F.col("den")
                        > F.lit(int(ratio)) * F.col("num"),
                        F.lit(False)).alias("is_spike"))
            .orderBy(key_col, "bucket"))


def gapfill_series(series: DataFrame, key_cols: list[str], time_col: str,
                   step_expr: str, value_cols: dict[str, str]) -> DataFrame:
    """Time-series densification — ClickHouse ``ORDER BY t WITH FILL
    STEP`` (the dashboard primitive Grafana panels lean on when a
    sparse series must render as a continuous line): every missing
    ``time_col`` bucket between each key's min and max materializes,
    with per-column fill policy from ``value_cols``:

    - ``"zero"``  — missing buckets read 0 (counter semantics);
    - ``"locf"``  — last observation carried forward (gauge
      semantics; CH ``WITH FILL INTERPOLATE (x AS x)``).

    ``step_expr`` is an interval SQL expression (``"interval 1
    hour"``); ``series`` must already be bucket-aggregated (one row
    per key+bucket).

    Scale: the grid is generated per key from the key's OWN bounds
    (one key-bounded aggregate, then ``sequence()`` + ``explode`` — a
    narrow generator, rows = the dashboard range, never data-sized);
    the fill join is key+bucket equi-join co-partitioned with the
    aggregate that produced ``series``, and the LOCF window re-uses
    the same key partitioning, so the whole fill adds no new
    corpus-wide shuffle."""
    from pyspark.sql import Window as W

    bounds = series.groupBy(*key_cols).agg(
        F.min(time_col).alias("__mn"), F.max(time_col).alias("__mx"))
    grid = bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"),
                             F.expr(step_expr))).alias(time_col))
    j = grid.join(series, [*key_cols, time_col], "left")
    w = (W.partitionBy(*key_cols).orderBy(time_col)
         .rowsBetween(W.unboundedPreceding, 0))
    out_cols = [*key_cols, time_col]
    sel = [F.col(c) for c in out_cols]
    for c, policy in value_cols.items():
        if policy == "zero":
            sel.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif policy == "locf":
            sel.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
        else:
            raise ValueError(f"unknown fill policy {policy!r} for {c}")
    return j.select(*sel)
