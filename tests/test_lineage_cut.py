"""The operator tier's lineage-cut helper (operators/lineage.py).

Default (conf unset): cut_lineage is exactly localCheckpoint — the
plans the bench and the driver see are unchanged. With
``spark.flowPipeline.reliableCheckpointDir`` set, corpus-scale pins
become RELIABLE checkpoints (fault-tolerant on executor loss — VERDICT
r10 item #1) with identical results and the same single-derivation
property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_pipeline_spark.operators.lineage import (
    RELIABLE_DIR_CONF, cut_lineage)


@pytest.fixture
def reliable_dir(spark, tmp_path):
    d = str(tmp_path / "ckpt")
    spark.conf.set(RELIABLE_DIR_CONF, d)
    try:
        yield d
    finally:
        spark.conf.unset(RELIABLE_DIR_CONF)


def test_default_is_local_checkpoint(spark):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    cut = cut_lineage(df)
    # localCheckpoint leaves no reliable-checkpoint file behind and the
    # data is intact
    assert cut.count() == 100
    assert "ExistingRDD" in cut._jdf.queryExecution().optimizedPlan() \
        .toString() or cut.rdd.getNumPartitions() > 0


def test_reliable_conf_routes_to_reliable_checkpoint(spark, reliable_dir):
    import os

    df = spark.range(50).withColumn("x", F.col("id") % 7)
    cut = cut_lineage(df)
    rows = sorted((r["id"], r["x"]) for r in cut.collect())
    assert rows == [(i, i % 7) for i in range(50)]
    # a reliable checkpoint writes RDD blocks under the conf'd dir
    found = []
    for root, _dirs, files in os.walk(reliable_dir):
        found.extend(files)
    assert found, "reliable checkpoint dir is empty — cut_lineage did " \
                  "not route to df.checkpoint"
    assert cut.rdd.is_checkpointed or any("part-" in f for f in found)


def test_reliable_cut_keeps_single_derivation(spark, reliable_dir):
    # the property the round-10 fixes bought: a pinned frame referenced
    # by both sides of a self-join appears ONCE (as a scan of the
    # checkpoint RDD), not as two clones of the upstream pipeline
    base = cut_lineage(
        spark.range(20).withColumn("k", F.col("id") % 5))
    a = base.select(F.col("k"), F.col("id").alias("ida"))
    b = base.select(F.col("k"), F.col("id").alias("idb"))
    joined = a.join(b, "k").filter(F.col("ida") < F.col("idb"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    # 5 key groups of 4 ids each -> C(4,2) = 6 ordered pairs per group
    assert joined.count() == 6 * 5


def test_operator_results_identical_under_reliable_conf(spark, sf_dir,
                                                        reliable_dir):
    # a real corpus-scale pin site: the SRP near-dup base
    # (similarity.py) — same pairs either way
    from flow_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs)
    from flow_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = sorted(
        (r["id_a"], r["id_b"]) for r in
        cosine_near_dup_pairs(emb, 0.999, bucketed=True).collect())
    spark.conf.unset(RELIABLE_DIR_CONF)
    want = sorted(
        (r["id_a"], r["id_b"]) for r in
        cosine_near_dup_pairs(emb, 0.999, bucketed=True).collect())
    assert got == want
