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
    f, _ = skewed
    d_partial = spark.range(0, 1).select(F.col("id").alias("k"),
                                         F.lit(7).alias("attr"))
    out = salted_join(f, d_partial, "k", n_salts=4, how="left")
    assert out.count() == f.count()
    assert out.filter(F.col("attr").isNull()).count() == \
        f.filter(F.col("k") != 0).count()


def test_salted_join_rejects_outer(spark, skewed):
    f, d = skewed
    with pytest.raises(ValueError):
        salted_join(f, d, "k", how="full")


def test_salted_join_spreads_hot_key(spark, skewed):
    """The hot key must occupy n_salts distinct (key, salt) shuffle keys."""
    f, _ = skewed
    n = (f.withColumn("__salt",
                      F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                             F.lit(8)).cast("int"))
         .filter(F.col("k") == 1).select("__salt").distinct().count())
    assert n == 8


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
