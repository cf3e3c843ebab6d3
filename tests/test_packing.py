"""Invariants for the last-mile tier: sequence packing, quota sampling,
and PII scrubbing (operators/packing.py, operators/text.py PII tier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flow_pipeline_spark.operators import packing as PK
from flow_pipeline_spark.operators import text as TX
from flow_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR

BUDGET = 512


def _packed(spark, repartition=None):
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", TX.token_count(F.col("text")).alias("tok"))
    if repartition:
        d = d.repartition(repartition)
    return PK.pack_sequences(d, "tok", budget=BUDGET)


def test_pack_assignment_is_total_and_unique(spark):
    d = load_table(spark, SF_DIR, "documents")
    p = _packed(spark)
    assert p.count() == d.count()
    assert p.select("doc_id").distinct().count() == d.count()


def test_pack_seqs_contiguous_and_fill_lower_bound(spark):
    """Per shard: seq ids are 0..max with no gaps, and the cumulative
    token count through every non-final seq reaches its chunk boundary
    (concat-then-chunk semantics: only a shard's LAST sequence may be
    short)."""
    rows = (_packed(spark)
            .groupBy("shard", "seq").agg(F.sum("tok").alias("t"))
            .collect())
    by_shard: dict[str, dict[int, int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], {})[r["seq"]] = r["t"]
    assert by_shard
    for shard, seqs in by_shard.items():
        mx = max(seqs)
        assert sorted(seqs) == list(range(mx + 1)), shard
        cum = 0
        for k in range(mx + 1):
            cum += seqs[k]
            if k < mx:
                assert cum >= (k + 1) * BUDGET, (shard, k, cum)


def test_pack_invariant_under_partition_layout(spark):
    a = {(r["doc_id"], r["shard"], r["seq"])
         for r in _packed(spark).collect()}
    b = {(r["doc_id"], r["shard"], r["seq"])
         for r in _packed(spark, repartition=7).collect()}
    assert a == b


def test_quota_sample_caps_and_determinism(spark):
    d = load_table(spark, SF_DIR, "documents")
    q = PK.quota_sample(d, "source", quota=2)
    per = (q.filter("kept").groupBy("source")
           .agg(F.count("*").alias("n")).collect())
    assert per and all(r["n"] <= 2 for r in per)
    # rn is a permutation 1..n within each group
    chk = (q.groupBy("source")
           .agg(F.count("*").alias("n"), F.min("rn").alias("lo"),
                F.max("rn").alias("hi"),
                F.countDistinct("rn").alias("d")).collect())
    assert all(r["lo"] == 1 and r["hi"] == r["n"] == r["d"] for r in chk)
    kept_a = {r["doc_id"] for r in q.filter("kept").collect()}
    kept_b = {r["doc_id"] for r in
              PK.quota_sample(d.repartition(5), "source", quota=2)
              .filter("kept").collect()}
    assert kept_a == kept_b


def test_pii_scrub_known_vectors(spark):
    cases = [
        ("mail bob.smith+x@sub.example.co.uk now",
         "mail <EMAIL> now"),
        ("srv at 192.168.100.1 and 10.0.0.7.",
         "srv at <IP> and <IP>."),
        ("call +1 555-123-4567 or 800-555-0100 ok",
         "call +1 <PHONE> or <PHONE> ok"),
        # mixed, order-of-redaction sensitive: email host has dotted digits
        ("x a@b12.io 1.2.3.4 555-000-1111", "x <EMAIL> <IP> <PHONE>"),
        ("no pii here 12.5 percent", "no pii here 12.5 percent"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["t"])
    out = [r["s"] for r in
           df.select(TX.scrub_pii(F.col("t")).alias("s")).collect()]
    assert out == [want for _, want in cases]


def test_pii_scrub_idempotent_and_residue_free(spark):
    d = spark.createDataFrame(
        [("a@b.co from 1.2.3.4 tel 555-123-9999 and c@d.org",)], ["t"])
    once = d.select(TX.scrub_pii(F.col("t")).alias("t"))
    twice = once.select(TX.scrub_pii(F.col("t")).alias("t"))
    assert once.collect() == twice.collect()
    assert once.select(TX.residual_pii(F.col("t")).alias("r")
                       ).collect()[0]["r"] == 0


def test_mixture_sample_rates(spark):
    """Epoch semantics: rate 2.5 → every row at epochs 0 and 1 plus ~half
    at epoch 2; rate 0.25 → ~quarter of rows at epoch 0 only; rate 1.0 →
    exactly once; determinism across runs and partitionings."""
    from flow_pipeline_spark.operators.packing import mixture_sample
    from flow_pipeline_spark.sources.tables import load_table

    from .conftest import SF_DIR
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    rates = {"src0": 2.5, "src1": 0.25, "src2": 1.0}
    out = mixture_sample(d, rates).cache()

    n0 = d.filter(F.col("source") == "src0").count()
    # full epochs are exact
    for epoch in (0, 1):
        assert out.filter((F.col("source") == "src0")
                          & (F.col("epoch") == epoch)).count() == n0
    frac = out.filter((F.col("source") == "src0")
                      & (F.col("epoch") == 2)).count()
    assert 0 < frac < n0                      # fractional epoch is partial
    n1 = d.filter(F.col("source") == "src1").count()
    kept1 = out.filter(F.col("source") == "src1").count()
    assert 0 < kept1 < n1
    assert (out.filter(F.col("source") == "src1")
            .filter(F.col("epoch") != 0).count() == 0)
    # rate exactly 1.0 and the default: one epoch-0 copy per row
    for src in ("src2", "src3"):
        n = d.filter(F.col("source") == src).count()
        assert out.filter(F.col("source") == src).count() == n
    # layout-invariance: same membership under a different partitioning
    again = mixture_sample(d.repartition(7), rates)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0
