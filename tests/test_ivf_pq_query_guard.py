"""ivf_pq_query's driver-side collect guard + probe selection
(round-11, VERDICT r10 items #2/#5).

The serving path collects the query batch (ADC LUT + probe map are
driver-resident by contract): the cap makes an oversized batch a LOUD
sizing error instead of a silent driver-memory cliff, and for bounded
batches the probe argmax runs driver-side with the exact JVM fold
arithmetic — the probes (and therefore the results) must be IDENTICAL
to the distributed window path's.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import flow_pipeline_spark.operators.similarity as S
from flow_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def ivf_pq_parts(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    seed_rows = (e.select(F.col("vec_id").alias("cid"),
                          F.col("embedding").alias("cv"))
                 .orderBy(S._seed_order(F.col("cid")), F.col("cid"))
                 .limit(16).collect())
    cent_rows = sorted((int(r["cid"]), [float(x) for x in r["cv"]])
                       for r in seed_rows[:8])
    books = S.pq_train(e, m=8, ks=16, n_iter=2, seed_rows=seed_rows)
    codes_cells = S.pq_index_delta(e, cent_rows, books)
    cent = (spark.createDataFrame(cent_rows, "cid long, cv array<double>")
            .withColumn("cnrm", S._norm("cv")))
    queries = e.filter(F.col("vec_id") < 10)
    return e, codes_cells, cent, queries, books


def test_query_batch_cap_raises_loudly(ivf_pq_parts):
    e, codes_cells, cent, queries, books = ivf_pq_parts
    with pytest.raises(ValueError, match="max_query_rows"):
        S.ivf_pq_query(codes_cells, cent, queries, books, k=5,
                       nprobe=4, max_query_rows=3)


def test_results_unchanged_below_cap(ivf_pq_parts):
    e, codes_cells, cent, queries, books = ivf_pq_parts
    got = (S.ivf_pq_query(codes_cells, cent, queries, books, k=5,
                          nprobe=4, rerank_with=e, shortlist=20,
                          max_query_rows=10)
           .orderBy("q", "rank").collect())
    default = (S.ivf_pq_query(codes_cells, cent, queries, books, k=5,
                              nprobe=4, rerank_with=e, shortlist=20)
               .orderBy("q", "rank").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in default]
    assert len(got) > 0


def test_driver_probe_matches_window(ivf_pq_parts, monkeypatch):
    """The driver-side probe argmax must equal the distributed window's
    probes bit-for-bit (the fold replica contract): forcing the op
    budget to 0 re-routes through the crossJoin+window path — results
    must be row-identical."""
    e, codes_cells, cent, queries, books = ivf_pq_parts
    driver = (S.ivf_pq_query(codes_cells, cent, queries, books, k=5,
                             nprobe=4, rerank_with=e, shortlist=20)
              .orderBy("q", "rank").collect())
    monkeypatch.setattr(S, "_MAX_DRIVER_PROBE_OPS", 0)
    window = (S.ivf_pq_query(codes_cells, cent, queries, books, k=5,
                             nprobe=4, rerank_with=e, shortlist=20)
              .orderBy("q", "rank").collect())
    assert [tuple(r) for r in driver] == [tuple(r) for r in window]


def test_driver_probe_map_fold_exactness(spark):
    """_driver_probe_map vs the JVM window on adversarial near-tie
    vectors: the driver fold replicates the JVM expression fold
    operation-for-operation, so probe sets agree even when two
    centroids' cosines differ only in the last ulp (or tie exactly and
    fall to the cid tie-break)."""
    from pyspark.sql import Row
    from pyspark.sql import Window as W

    cents = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.7071067811865476, 0.7071067811865475, 0.0, 0.0]),
        (3, [0.7071067811865475, 0.7071067811865476, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    qs = [
        (100, [0.6, 0.8, 0.0, 0.0]),
        (101, [1.0, 1.0, 0.0, 0.0]),        # exact tie between 2 and 3?
        (102, [0.1, 0.2, 0.3, 0.4]),
        (103, [1e-300, 1e300, 1e-300, 1.0]),  # extreme magnitudes
    ]
    cent = (spark.createDataFrame(cents, "cid long, cv array<double>")
            .withColumn("cnrm", S._norm("cv")))
    queries = spark.createDataFrame(
        [Row(vec_id=q, embedding=v) for q, v in qs])
    nprobe = 3
    q_rows = queries.select(F.col("vec_id").alias("q"),
                            F.col("embedding").alias("qv")).collect()
    cent_rows = cent.select("cid", "cv").collect()
    got = S._driver_probe_map(q_rows, cent_rows, nprobe)
    # the JVM window's probe set
    q = queries.select(F.col("vec_id").alias("q"),
                       F.col("embedding").alias("qv"),
                       S._norm("embedding").alias("qnrm"))
    qc = (q.crossJoin(F.broadcast(cent))
          .select("q", "cid",
                  S._cos_pre("qv", "cv",
                             F.col("qnrm"), F.col("cnrm")).alias("c_cos")))
    wq = W.partitionBy("q").orderBy(F.desc("c_cos"), F.asc("cid"))
    probe_rows = (qc.withColumn("r", F.row_number().over(wq))
                  .filter(F.col("r") <= nprobe)
                  .select("q", F.col("cid").alias("cell")).collect())
    qidx = {int(r["q"]): i for i, r in enumerate(q_rows)}
    want: dict[int, list[int]] = {}
    for r in probe_rows:
        want.setdefault(int(r["cell"]), []).append(qidx[int(r["q"])])
    assert {c: sorted(v) for c, v in got.items()} == \
        {c: sorted(v) for c, v in want.items()}


def test_zero_norm_query_falls_back_to_window(spark):
    """A zero-norm vector makes the driver cosine non-finite —
    _driver_probe_map must refuse (None) so Spark's own NaN ordering
    decides, instead of replicating it in Python."""
    from pyspark.sql import Row

    q_rows = spark.createDataFrame(
        [Row(q=1, qv=[0.0, 0.0])]).collect()
    cent_rows = spark.createDataFrame(
        [Row(cid=0, cv=[1.0, 0.0])]).collect()
    assert S._driver_probe_map(q_rows, cent_rows, 1) is None


def _run_job_count(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_driver_probe_saves_a_job(ivf_pq_parts, monkeypatch):
    """VERDICT r10 item #2's 'job count down in a pinned test': the
    driver-side probe selection must run strictly fewer Spark jobs than
    the distributed crossJoin+window path it replaces, with identical
    results (equality is pinned by test_driver_probe_matches_window)."""
    e, codes_cells, cent, queries, books = ivf_pq_parts

    def run():
        S.ivf_pq_query(codes_cells, cent, queries, books, k=5, nprobe=4,
                       rerank_with=e) \
            .write.format("noop").mode("overwrite").save()

    n_driver = _run_job_count(e.sparkSession, "ivfpq-probe-driver", run)
    monkeypatch.setattr(S, "_MAX_DRIVER_PROBE_OPS", 0)
    n_window = _run_job_count(e.sparkSession, "ivfpq-probe-window", run)
    assert n_driver < n_window


def test_cent_rows_passthrough_saves_a_job(ivf_pq_parts):
    """round-11: call sites that already hold the centroid rows
    driver-side pass cent_rows — the serving path must not re-collect
    the centroid table."""
    e, codes_cells, cent, queries, books = ivf_pq_parts
    cent_rows = sorted((int(r["cid"]), [float(x) for x in r["cv"]])
                       for r in cent.select("cid", "cv").collect())

    def run(**kw):
        def go():
            S.ivf_pq_query(codes_cells, cent, queries, books, k=5,
                           nprobe=4, rerank_with=e, **kw) \
                .write.format("noop").mode("overwrite").save()
        return go

    n_with = _run_job_count(e.sparkSession, "ivfpq-centrows-with",
                            run(cent_rows=cent_rows))
    n_without = _run_job_count(e.sparkSession, "ivfpq-centrows-without",
                               run())
    assert n_with < n_without
