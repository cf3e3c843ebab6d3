"""Skew-salting and bucketing: result equivalence + the plan properties
that are the whole point (hot key spread; no Exchange on bucketed joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_pipeline_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from flow_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of fact rows on one hot key — the AS-traffic power law."""
    f = (spark.range(0, 20_000)
         .select(F.when(F.col("id") % 10 < 9, 1)
                 .otherwise((F.col("id") % 50).cast("long")).alias("k"),
                 F.col("id").alias("v")))
    d = spark.range(0, 50).select(F.col("id").alias("k"),
                                  (F.col("id") * 100).alias("attr"))
    return f, d


def test_salted_join_equivalence(spark, skewed):
    f, d = skewed
    plain = f.join(d, "k").select("k", "v", "attr")
    salted = salted_join(f, d, "k", n_salts=8).select("k", "v", "attr")
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salted_join_left_keeps_unmatched(spark, skewed):
    # dim covers ONLY the hot key (k=1, 90% of fact rows) so BOTH left-
    # join halves are exercised: matched rows carry attr exactly once
    # (salting must not duplicate them) and unmatched rows survive with
    # NULL. The old dim keyed k=0, which the fact domain never contains
    # — every assert degenerated to all-rows-unmatched (round-7 review).
    f, _ = skewed
    d_partial = spark.range(1, 2).select(F.col("id").alias("k"),
                                         F.lit(7).alias("attr"))
    out = salted_join(f, d_partial, "k", n_salts=4, how="left")
    n_hot = f.filter(F.col("k") == 1).count()
    assert n_hot > 0
    assert out.count() == f.count()          # no replication leakage
    assert out.filter(F.col("attr") == 7).count() == n_hot
    assert out.filter(F.col("attr").isNull()).count() == \
        f.count() - n_hot


def test_salted_join_rejects_outer(spark, skewed):
    f, d = skewed
    with pytest.raises(ValueError):
        salted_join(f, d, "k", how="full")


def test_salted_join_spreads_hot_key(spark, skewed):
    """The hot key must occupy n_salts distinct (key, salt) shuffle keys.
    Pins salted_join's OWN salt expression (_fact_salt) and the join
    condition — the old form re-implemented the expression inline, so it
    passed no matter what salted_join did (round-7 review)."""
    from flow_pipeline_spark.operators.scale import _fact_salt

    f, d = skewed
    n = (f.withColumn("__salt", _fact_salt(8))
         .filter(F.col("k") == 1).select("__salt").distinct().count())
    assert n == 8
    # and the join itself keys on the salt (not just the business key)
    plan = (salted_join(f, d, "k", n_salts=8)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "__salt" in plan


def test_bucketed_join_no_shuffle(spark):
    """Both sides bucketed on the join key with equal bucket counts ⇒ the
    join plans with zero Exchange (co-located at write time)."""
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey",
                                                   "o_totalprice")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey",
                                                      "l_extendedprice")
    li = li.withColumnRenamed("l_orderkey", "o_orderkey")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(li, "b_lineitem", "o_orderkey", n_buckets=8)
        # small-SF tables would broadcast (bucketing then irrelevant);
        # force the big-big path the technique exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the result is still the plain join
        plain = o.join(li, "o_orderkey")
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_asof_join_semantics(spark):
    """Hand-built vectors: inclusive tie (dim at t==event t matches),
    latest-wins, NULL before any dim row, key isolation."""
    from flow_pipeline_spark.operators.temporal import asof_join

    ev = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 10), (3, "a", 20), (4, "b", 10), (5, "c", 9)],
        "event_id INT, k STRING, t LONG")
    dim = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 11, 3.0), ("c", 1, 4.0)],
        "k STRING, t LONG, rate DOUBLE")
    got = {r["event_id"]: r["rate"]
           for r in asof_join(ev, dim, "k", payload=["rate"]).collect()}
    assert got[1] is None          # before any dim row
    assert got[2] == 1.0           # inclusive: dim.t == event.t
    assert got[3] == 2.0           # latest at-or-before wins
    assert got[4] is None          # b's dim row is later than the event
    assert got[5] == 4.0           # keys isolated
    # round-7 review, second pass: an events frame that ALREADY carries
    # a payload-named column used to silently mix its non-null values
    # into the last(ignorenulls) propagation (an event inherited a
    # stale value from an earlier EVENT, not the preceding dim row) —
    # ambiguous input must refuse loudly
    ev_clash = ev.withColumn("rate", F.lit(9.0))
    with pytest.raises(ValueError, match="already has a column"):
        asof_join(ev_clash, dim, "k", payload=["rate"])


def test_approx_top_k_bounds_under_trim(spark):
    """Misra-Gries guarantees in the TRIMMED regime (tiny capacity on
    skewed data): est_count ≤ true ≤ upper_bound for every reported key,
    and every true heavy hitter (freq > n/(capacity+1)) is reported."""
    from flow_pipeline_spark.operators.scale import approx_top_k

    # skewed synthetic: key j appears ~sqrt-spread times (zipf-ish tail)
    # PLUS one genuinely heavy key (30k rows of key 7) so the
    # completeness clause below is non-vacuous — the old data's max
    # frequency (1,194) never crossed err = n/(capacity+1) (3,529), so
    # `heavy` was always empty and the loop asserted nothing (round-7
    # review)
    spread = (spark.range(60_000)
              .select((F.floor(F.sqrt(F.col("id") % 10_000))).cast("long")
                      .alias("key")))
    hot = spark.range(30_000).select(F.lit(7).cast("long").alias("key"))
    df = spread.unionByName(hot).repartition(8)
    n = 90_000
    capacity = 16
    k = 8
    got = approx_top_k(df, "key", k=k, capacity=capacity).collect()
    assert 0 < len(got) <= k
    true = {r["key"]: r["cnt"] for r in
            df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    err = n // (capacity + 1)
    for r in got:
        t = true[r["key"]]
        assert r["est_count"] <= t <= r["upper_bound"], r
        assert r["upper_bound"] - r["est_count"] == err
    # heavy-hitter completeness: keys with freq > n/(cap+1) must appear in
    # the top-k as long as k is large enough to hold them
    heavy = sorted((kk for kk, c in true.items() if c > err),
                   key=lambda kk: (-true[kk], kk))[:k]
    assert heavy, "test data must contain at least one true heavy hitter"
    reported = {r["key"] for r in got}
    for kk in heavy:
        assert kk in reported, (kk, true[kk], err)


def test_approx_top_k_exact_regime_matches_groupby(spark):
    """With capacity ≥ distinct keys no trim fires: the sketch IS the exact
    top-k (the oracle-checkable regime used by approx_top_talkers)."""
    from flow_pipeline_spark.operators.scale import approx_top_k
    from flow_pipeline_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    got = [(r["user_id"], r["est_count"]) for r in
           approx_top_k(e, "user_id", k=5, capacity=2048).collect()]
    exact = [(r["user_id"], r["cnt"]) for r in
             (e.groupBy("user_id").agg(F.count("*").alias("cnt"))
              .orderBy(F.desc("cnt"), F.asc("user_id")).limit(5).collect())]
    assert got == exact


def test_zorder_layout_prunes_row_groups(spark, tmp_path):
    """The point of Z-order: after zorder_repartition over (u, m), a
    predicate on the NON-leading dimension m admits only a minority of
    parquet files by min/max stats; a u-sorted layout admits every
    file. This is the file-skipping a 100 TB scan lives on — the
    engine reads footer stats, not data."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.scale import zorder_repartition

    n, files = 1 << 14, 16
    df = spark.range(n).select(
        (F.col("id") % 128).alias("u"),
        (F.col("id") / 128).cast("long").alias("m"))

    zdir, udir = str(tmp_path / "z"), str(tmp_path / "u")
    zorder_repartition(df, [("u", 0, 127), ("m", 0, 127)], files,
                       bits=7).write.parquet(zdir)
    (df.repartitionByRange(files, "u").sortWithinPartitions("u")
     .write.parquet(udir))

    def admitting(d, lo, hi):
        hit = 0
        for f in glob.glob(d + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            i = {md.schema.column(c).name: c
                 for c in range(md.num_columns)}["m"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st.min <= hi and st.max >= lo:
                    hit += 1
                    break
        return hit

    lo, hi = 32, 47          # a 1/8 slice of the m domain
    z_hit, u_hit = admitting(zdir, lo, hi), admitting(udir, lo, hi)
    # u-sorted: every file spans all of m; z-ordered: only the files
    # whose hyper-rectangle intersects the slice
    assert u_hit == files
    assert z_hit <= files // 2, (z_hit, u_hit)


def test_zorder_key_is_locality_preserving(spark):
    """Adjacent Morton keys differ in at most one dimension step — the
    per-bucket min/max spans of the oracled zorder_bucket_stats query
    stay compact. Here: the full 8x8 grid at bits=3 yields each
    top-2-bit bucket covering exactly a 4x4 quadrant."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.scale import zorder_key, zscale

    df = spark.range(64).select((F.col("id") % 8).alias("x"),
                                (F.col("id") / 8).cast("long").alias("y"))
    z = zorder_key([zscale(F.col("x"), 0, 7, 3),
                    zscale(F.col("y"), 0, 7, 3)], 3)
    out = (df.select("x", "y", F.shiftright(z, 4).alias("q"))
           .groupBy("q").agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                             F.min("y").alias("y0"), F.max("y").alias("y1"),
                             F.count("*").alias("n"))
           .collect())
    assert len(out) == 4
    for r in out:
        assert r["n"] == 16
        assert r["x1"] - r["x0"] == 3 and r["y1"] - r["y0"] == 3


def test_uniq_state_merge_within_error_and_register_form_exact(spark):
    """Two uniqState/uniqMerge forms, two contracts. The DataSketches
    pair (uniq_state/uniq_merge): estimates within HLL error of exact
    — its estimate is PATH-DEPENDENT (HIP vs composite, partial-union
    tree), which is documented, so nothing stronger is pinned. The
    register-rows pair (uniq_register_state/uniq_register_merge): the
    state is a pure function of the value set, so merged output —
    registers, s_scaled, est_e2 — is IDENTICAL under any partitioning,
    merge order, or split of the build into incremental batches (the
    AggregatingMergeTree persist-then-merge lifecycle)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        uniq_merge, uniq_register_merge, uniq_register_state, uniq_state)

    df = spark.range(20000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 40).alias("b"),
        (F.col("id") % 997).alias("v"))
    exact = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}

    # native DataSketches pair: error bound only
    states = uniq_state(df, ["k", "b"], "v")
    merged = {r["k"]: r["approx_distinct"]
              for r in uniq_merge(states, ["k"]).collect()}
    for k in exact:
        assert abs(merged[k] - exact[k]) / exact[k] < 0.05

    # register-rows pair: bit-exact under every lifecycle
    rstates = uniq_register_state(df, ["k", "b"], "v") \
        .localCheckpoint()
    base = {r["k"]: (r["n_regs"], r["s_scaled"], r["est_e2"])
            for r in uniq_register_merge(rstates, ["k"]).collect()}
    for layout in (rstates.repartition(17), rstates.repartition(1),
                   rstates.orderBy(F.desc("bucket"))):
        got = {r["k"]: (r["n_regs"], r["s_scaled"], r["est_e2"])
               for r in uniq_register_merge(layout, ["k"]).collect()}
        assert got == base
    # incremental build: states from two disjoint halves, unioned, must
    # merge to the same registers as one pass (associativity of max)
    h1 = uniq_register_state(df.filter(F.col("id") % 2 == 0),
                             ["k", "b"], "v")
    h2 = uniq_register_state(df.filter(F.col("id") % 2 == 1),
                             ["k", "b"], "v")
    inc = {r["k"]: (r["n_regs"], r["s_scaled"], r["est_e2"])
           for r in uniq_register_merge(h1.unionByName(h2),
                                        ["k"]).collect()}
    assert inc == base
    # raw estimate within the documented m=64 error envelope
    for k in exact:
        assert abs(base[k][2] / 100.0 - exact[k]) / exact[k] < 0.4


def test_histogram_state_merge_and_quantiles(spark):
    """quantileState/quantileMerge: bin-count states built per sub-key
    fold to EXACTLY the direct histogram (counts are sums), and the
    quantile read matches hand-computed answers on a planted
    distribution — 1000 values 0..999, bins of 10: p50 lands in bin
    49 (cum hits 500 exactly at its edge), p90 in bin 89, p99 in 98."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        histogram_merge_quantiles, histogram_state)

    df = spark.range(1000).select(
        (F.col("id") % 4).alias("sub"), F.col("id").alias("v"))
    st = histogram_state(df, ["sub"], "v", lo=0, hi=1000, n_bins=100)
    one = histogram_state(df.select(F.lit(0).alias("all"), "v"),
                          ["all"], "v", lo=0, hi=1000, n_bins=100)
    merged = (st.withColumn("all", F.lit(0))
              .groupBy("all", "bin").agg(F.sum("cnt").alias("cnt")))
    assert (sorted((r["bin"], r["cnt"]) for r in merged.collect())
            == sorted((r["bin"], r["cnt"]) for r in one.collect()))

    qs = histogram_merge_quantiles(
        st.withColumn("all", F.lit(0)), ["all"],
        [("p50", 5000), ("p90", 9000), ("p99", 9900)],
        lo=0, hi=1000, n_bins=100).collect()[0]
    assert (qs["p50_bin"], qs["p90_bin"], qs["p99_bin"]) == (49, 89, 98)
    assert (qs["p50_lo"], qs["p90_lo"], qs["p99_lo"]) == (490, 890, 980)
    assert qs["total"] == 1000


def test_bitmap_state_merge_and_set_cardinalities(spark):
    """groupBitmap family: states built per sub-key fold to EXACTLY the
    direct build (set union is associative/idempotent); cardinality and
    AND/OR/ANDNOT between two segments match Python set algebra on a
    planted universe that straddles chunk boundaries (chunk_bits=4, so
    values 0..99 span 7 chunks and every per-chunk code path runs)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        bitmap_cardinality, bitmap_merge, bitmap_set_cardinalities,
        bitmap_state)

    sa = {v for v in range(100) if v % 3 == 0}          # 34 values
    sb = {v for v in range(100) if v % 5 == 0 or v < 7}  # overlaps a
    rows = ([("a", i % 2, v) for v in sa for i in range(2)]  # dup rows
            + [("b", i % 2, v) for v in sb for i in range(2)])
    df = spark.createDataFrame(rows, "seg string, half int, v long")

    st = bitmap_state(df, ["seg", "half"], "v", chunk_bits=4)
    direct = bitmap_state(df, ["seg"], "v", chunk_bits=4)
    folded = bitmap_merge(st, ["seg"])
    assert (sorted((r["seg"], r["chunk"], tuple(r["vals"]))
                   for r in folded.collect())
            == sorted((r["seg"], r["chunk"], tuple(r["vals"]))
                      for r in direct.collect()))

    card = {r["seg"]: r["card"]
            for r in bitmap_cardinality(st, ["seg"]).collect()}
    assert card == {"a": len(sa), "b": len(sb)}

    a = folded.filter(F.col("seg") == "a").select("chunk", "vals")
    b = folded.filter(F.col("seg") == "b").select("chunk", "vals")
    got = bitmap_set_cardinalities(a, b).collect()[0]
    assert got["a_card"] == len(sa) and got["b_card"] == len(sb)
    assert got["and_card"] == len(sa & sb)
    assert got["or_card"] == len(sa | sb)
    assert got["andnot_card"] == len(sa - sb)


def test_uniq_register_state_ignores_nulls(spark):
    """NULL values mint no phantom register: state/estimate over
    [values + NULLs] equals the state over values alone, and an
    all-NULL group yields an EMPTY state (the countDistinct
    convention)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        uniq_register_merge, uniq_register_state)

    vals = spark.range(200).select(
        F.lit("k").alias("k"), F.col("id").cast("string").alias("v"))
    nulls = spark.range(50).select(
        F.lit("k").alias("k"), F.lit(None).cast("string").alias("v"))
    pure = uniq_register_merge(
        uniq_register_state(vals, ["k"], "v"), ["k"]).collect()[0]
    mixed = uniq_register_merge(
        uniq_register_state(vals.unionByName(nulls), ["k"], "v"),
        ["k"]).collect()[0]
    assert (pure["n_regs"], pure["s_scaled"], pure["est_e2"]) == \
        (mixed["n_regs"], mixed["s_scaled"], mixed["est_e2"])
    only_null = spark.range(5).select(
        F.lit("x").alias("k"), F.lit(None).cast("string").alias("v"))
    assert uniq_register_state(only_null, ["k"], "v").count() == 0


def test_kmv_state_merge_estimates_and_set_ops(spark):
    """KMV sketch family: (1) states built per sub-key fold to EXACTLY
    the direct build (min-k of a union of min-k's is min-k of the
    union); (2) below-k sketches count exactly; (3) above-k estimates
    land within the ~1/sqrt(k-2) envelope; (4) set estimates: the
    match rule (h in union-min-k present in both sketches) reproduces
    the true Jaccard within the KMV error envelope on planted
    overlapping sets."""
    import math

    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        kmv_estimate, kmv_merge, kmv_set_estimates, kmv_state)

    k = 64
    sa = set(range(0, 1200))                      # |A| = 1200
    sb = set(range(800, 2400))                    # |B| = 1600, |A∩B| = 400
    rows = ([("a", i % 3, v) for v in sa for i in range(2)]
            + [("b", i % 3, v) for v in sb for i in range(2)])
    df = spark.createDataFrame(rows, "seg string, sub int, v long")

    st = kmv_state(df, ["seg", "sub"], "v", k=k)
    direct = kmv_state(df, ["seg"], "v", k=k)
    folded = kmv_merge(st, ["seg"], k=k)
    assert ({(r["seg"], tuple(r["kmv"])) for r in folded.collect()}
            == {(r["seg"], tuple(r["kmv"])) for r in direct.collect()})

    # below-k: exact
    small = spark.createDataFrame([("s", v) for v in range(10)],
                                  "seg string, v long")
    est = kmv_estimate(kmv_state(small, ["seg"], "v", k=k),
                       ["seg"], k=k).collect()[0]["est_e2"]
    assert est == 1000                             # 10 exact, in e2

    # above-k: within 4 standard errors
    tol = 4.0 / math.sqrt(k - 2)
    ests = {r["seg"]: r["est_e2"] / 100.0
            for r in kmv_estimate(st, ["seg"], k=k).collect()}
    assert abs(ests["a"] - len(sa)) / len(sa) < tol
    assert abs(ests["b"] - len(sb)) / len(sb) < tol

    a = folded.filter(F.col("seg") == "a").select("kmv")
    b = folded.filter(F.col("seg") == "b").select("kmv")
    got = kmv_set_estimates(a, b, k=k).collect()[0]
    true_j = len(sa & sb) / len(sa | sb)
    true_u = len(sa | sb)
    assert abs(got["union_est_e2"] / 100.0 - true_u) / true_u < tol
    # Jaccard: binomial error on m/k around true_j
    assert abs(got["jaccard_e4"] / 10000.0 - true_j) < 4 * math.sqrt(
        true_j * (1 - true_j) / k)
    assert abs(got["inter_est_e2"] / 100.0 - len(sa & sb)) \
        / len(sa & sb) < 2.5 * tol


def test_kmv_state_matches_python_reference_randomized(spark):
    """Independent-oracle discipline (the codec's hypothesis pattern,
    batched): across randomized value sets, the Spark-built sketch
    equals a pure-Python KMV built with hashlib — state arrays AND the
    pinned estimator, byte-for-byte."""
    import hashlib
    import math
    import random

    from flow_pipeline_spark.operators.rollup import (
        kmv_estimate, kmv_state)

    k = 24
    rng = random.Random(20260815)
    cases = []
    for i in range(5):
        n = rng.randrange(3, 900)
        vals = {rng.randrange(0, 10**6) for _ in range(n)}
        cases.append((str(i), vals))

    rows = [(g, v) for g, vs in cases for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got_state = {r["g"]: list(r["kmv"])
                 for r in kmv_state(df, ["g"], "v", k=k).collect()}
    got_est = {r["g"]: r["est_e2"]
               for r in kmv_estimate(kmv_state(df, ["g"], "v", k=k),
                                     ["g"], k=k).collect()}

    for g, vs in cases:
        hs = sorted(int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                    for v in vs)[:k]
        assert got_state[g] == hs, g
        if len(hs) < k:
            want = len(hs) * 100
        else:
            want = math.floor((k - 1) * 100.0 * float(1 << 60) / hs[-1]
                              + 0.5)
        assert got_est[g] == want, g


def test_events_cache_key_distinguishes_same_basename_dirs():
    """Round-7 review: the /tmp cache for the Date-partitioned events
    copy was keyed by the sf dir's BASENAME only, so /run1/sf0.01 and
    /run2/sf0.01 collided and the second caller silently read the first
    warehouse's rows. The key must cover the full path (and live under
    a per-user root)."""
    import os

    from flow_pipeline_spark.sources.tables import _events_cache_dir

    a = _events_cache_dir("/run1/sf0.01")
    b = _events_cache_dir("/run2/sf0.01")
    assert a != b
    assert f"_{os.getuid()}" in a            # per-user root
    # stable for the same input (the cache must still hit)
    assert a == _events_cache_dir("/run1/sf0.01")
    assert a == _events_cache_dir("/run1//sf0.01/")   # normalized


def test_events_cache_key_tracks_content(tmp_path):
    """Regenerating the warehouse IN PLACE (same path) must change the
    cache key — the old key served the previous warehouse's partitioned
    copy while the oracle read the new parquet (round-7 review)."""
    from flow_pipeline_spark.sources.tables import _events_cache_dir

    sf = tmp_path / "sfx"
    sf.mkdir()
    (sf / "events.parquet").write_bytes(b"PAR1" + b"a" * 100)
    k1 = _events_cache_dir(str(sf))
    assert k1 == _events_cache_dir(str(sf))       # stable per content
    (sf / "events.parquet").write_bytes(b"PAR1" + b"b" * 100)
    assert _events_cache_dir(str(sf)) != k1       # rewrite -> new key
    # directory-parquet form participates too
    d = sf / "events.parquet"
    d.unlink(); d.mkdir()
    (d / "part-0.parquet").write_bytes(b"PAR1" + b"c" * 50)
    k3 = _events_cache_dir(str(sf))
    (d / "part-0.parquet").write_bytes(b"PAR1" + b"d" * 50)
    assert _events_cache_dir(str(sf)) != k3


def test_events_cache_cleanup_honors_reader_lease(spark, tmp_path):
    """Round-8 advice: a directory's mtime is set at creation and never
    advances on reads, so the old 15-min dir-mtime grace deleted a
    superseded cache out from under a long-running reader. Cleanup now
    keys on a LEASE file every resolve touches: a superseded sibling
    with a FRESH lease survives the regeneration cleanup; with both
    signals older than the grace it is collected."""
    import os
    import shutil
    import time

    from flow_pipeline_spark.sources import tables as T

    sf = tmp_path / "sflease"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                sf / "events.parquet")
    cache_a = T.partitioned_events_dir(spark, str(sf))
    assert os.path.exists(os.path.join(cache_a, T._LEASE))
    tag_a = os.path.dirname(cache_a)

    # a cache-HIT must refresh the lease (the reader-tracking signal)
    before = os.stat(os.path.join(cache_a, T._LEASE)).st_mtime_ns
    time.sleep(0.02)
    assert T.partitioned_events_dir(spark, str(sf)) == cache_a
    assert os.stat(os.path.join(cache_a, T._LEASE)).st_mtime_ns > before

    # regenerate the warehouse in place -> new tag; sibling A is now
    # superseded but its lease is fresh: it must SURVIVE the cleanup
    # even with its dir mtime backdated past the grace
    old = time.time() - 2 * T._READER_GRACE_SEC
    os.utime(tag_a, (old, old))
    # mtime_ns is folded into the content signature, so an in-place
    # regeneration is simulated by bumping the source's mtime
    os.utime(sf / "events.parquet", ns=(1, 1))
    cache_b = T.partitioned_events_dir(spark, str(sf))
    assert cache_b != cache_a
    assert os.path.isdir(cache_a), "fresh lease did not protect reader"

    # backdate the lease too -> the next regeneration collects A.
    # Deregister A from the process-lifetime refresh ticker first: the
    # backdate simulates the reading PROCESS having exited, and a live
    # ticker pass re-touching the lease would (correctly!) protect it.
    with T._TICKER_LOCK:
        T._RESOLVED_CACHES.discard(cache_a)
    os.utime(os.path.join(cache_a, T._LEASE), (old, old))
    os.utime(tag_a, (old, old))
    os.utime(sf / "events.parquet", ns=(2, 2))
    cache_c = T.partitioned_events_dir(spark, str(sf))
    assert cache_c not in (cache_a, cache_b)
    assert not os.path.exists(tag_a), "stale superseded cache not collected"


def test_events_cache_lease_ticker_refreshes_long_pass(spark, tmp_path):
    """Round-9 advice: the lease was touched only at RESOLVE time, so
    the grace bounded time since a reader STARTED a pass — a single
    pass longer than the grace could have its cache rmtree'd mid-read.
    Every resolve now registers the cache with a process-lifetime
    ticker; one ticker pass must re-advance an aged lease (so lease
    age bounds time since the reading process was alive), and must
    drop caches that no longer exist from the registry."""
    import os
    import shutil
    import time

    from flow_pipeline_spark.sources import tables as T

    sf = tmp_path / "sfticker"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                sf / "events.parquet")
    cache = T.partitioned_events_dir(spark, str(sf))
    with T._TICKER_LOCK:
        assert cache in T._RESOLVED_CACHES

    # age the lease as if the pass had been running past the grace
    old = time.time() - 2 * T._READER_GRACE_SEC
    lease = os.path.join(cache, T._LEASE)
    os.utime(lease, (old, old))
    T._refresh_leases_once()
    assert time.time() - os.stat(lease).st_mtime < 60, \
        "ticker pass did not re-advance the lease"

    # a cache deleted out from under us leaves the registry
    shutil.rmtree(os.path.dirname(cache))
    T._refresh_leases_once()
    with T._TICKER_LOCK:
        assert cache not in T._RESOLVED_CACHES
