"""Training-data operator invariants: LSH recall vs exact, planted-dup
recovery, multimodal batch plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_pipeline_spark.operators import dedup as D
from flow_pipeline_spark.operators import similarity as S
from flow_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthetic_media,
)
from flow_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def planted(docs):
    copies = (docs.filter(F.col("doc_id") < 30)
              .select((F.col("doc_id") + 100000).alias("doc_id"),
                      F.concat("text", F.lit(" zz extra tail")).alias("text")))
    return docs.filter(F.col("doc_id") < 100).unionByName(copies).cache()


def test_exact_dedup_survivors(spark, docs):
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 10)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    kept = D.exact_dedup(corpus)
    assert kept.count() == docs.count()          # copies dropped
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_lsh_recall(planted):
    """LSH candidates must contain every truly-similar pair (jaccard≥0.5
    here ⇒ sig agreement high ⇒ banding catches them)."""
    exact = {(r["id_a"], r["id_b"])
             for r in D.jaccard_pairs(planted, k=3, threshold=0.5).collect()}
    cands = {(r["id_a"], r["id_b"])
             for r in D.minhash_lsh_candidates(
                 planted, n_hashes=8, bands=4, k=3).collect()}
    assert exact, "planted dups must produce similar pairs"
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} too low ({len(exact)} pairs)"
    # verification keeps exactly the exact-threshold pairs found in cands
    verified = {(r["id_a"], r["id_b"])
                for r in D.jaccard_pairs(planted, k=3, threshold=0.5,
                                         candidates=D.minhash_lsh_candidates(
                                             planted, 8, 4, 3)).collect()}
    assert verified <= exact


def test_simhash_planted_pairs(planted):
    pairs = D.simhash_near_pairs(planted, max_hamming=3, bands=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # each planted copy should be within small hamming of its original
    want = {(i, i + 100000) for i in range(30)}
    hit = len(got & want) / len(want)
    assert hit == 1.0, f"simhash near-dup hit-rate {hit} (banding is exact for hamming<=bands-1)"


def test_lsh_degenerate_hot_bucket_capped(planted, spark):
    """Round-9 verdict item #1: a boilerplate signature shared by ~10⁴
    docs (empty pages, nav chrome) must not emit that bucket's m² pair
    stream — max_bucket drops the over-common bucket, loudly (the
    Observation reports what was dropped), while every pair from the
    NON-degenerate buckets survives unchanged."""
    from pyspark.sql import Observation

    n_boiler = 10_000
    boiler = spark.range(n_boiler).select(
        (F.col("id") + 500_000).alias("doc_id"),
        F.lit("copyright nav menu home about contact boilerplate page")
        .alias("text"))
    corpus = planted.select("doc_id", "text").unionByName(boiler)

    clean_pairs = {(r["id_a"], r["id_b"]) for r in
                   D.minhash_lsh_candidates(planted, n_hashes=8,
                                            bands=4).collect()}

    obs = Observation("lsh_drops")
    capped = D.minhash_lsh_candidates(corpus, n_hashes=8, bands=4,
                                      max_bucket=1000, observation=obs)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}

    # bounded pair growth: no boilerplate pair leaks (the uncapped form
    # would emit 4 bands x ~5*10^7 pairs from this one signature)
    assert not any(a >= 500_000 or b >= 500_000 for a, b in got)
    # unchanged recall on the non-degenerate pairs
    assert got == clean_pairs
    # never silent: the drop is observable, one hot bucket per band
    assert obs.get["dropped_buckets"] == 4
    assert obs.get["dropped_ids"] == 4 * n_boiler

    # default cap is far above any honest small-SF bucket: results on
    # the un-planted corpus are identical with and without the cap
    uncapped = {(r["id_a"], r["id_b"]) for r in
                D.minhash_lsh_candidates(planted, n_hashes=8, bands=4,
                                         max_bucket=None).collect()}
    assert uncapped == clean_pairs


def test_lsh_knn_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    brute = {(r["q"], r["n"])
             for r in S.brute_knn(emb, queries, k=5).collect()}
    approx = {(r["q"], r["n"])
              for r in S.lsh_knn(emb, queries, k=5, n_planes=4, n_tables=6).collect()}
    recall = len(brute & approx) / len(brute)
    # 4 planes / 16 buckets over ~100 vecs: recall is approximate by design
    assert recall >= 0.5, f"LSH-ANN recall {recall}"
    assert all(q < 20 for q, _ in approx)


def test_near_dup_bucketed_catches_identical(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(100)
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") < 10)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"))
    corpus = corpus.select("vec_id", "embedding")
    got = S.cosine_near_dup_pairs(corpus, 0.999, bucketed=True).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert pairs == {(i, i + 100000) for i in range(10)}


def test_signature_matches_independent_fold(spark):
    """hyperplane_signature's Spark fold must be bit-identical to an
    independent Python reference that folds the same way (left-to-right
    from 0.0, ±1 coefficients = exact IEEE sign flips). Any divergence is
    a real bug: it would silently change LSH bucketing between engines
    (the DuckDB oracles mirror this fold) or between releases."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # add hash-derived adversarial vectors (mixed signs/magnitudes + zeros)
    synth = spark.range(500).select(
        (F.col("id") + 500000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: F.when((F.xxhash64(F.col("id"), d) % 7) == 0,
                             F.lit(0.0))
            .otherwise((F.xxhash64(F.col("id"), d) % 2001) / 400.0 - 2.5)
            .cast("float")).alias("embedding"))
    rows = (emb.unionByName(synth)
            .select("vec_id", "embedding",
                    *[S.hyperplane_signature("embedding", p).alias(f"sig{p}")
                      for p in (4, 8, 16)])
            .collect())
    assert rows
    planes = {p: [S._plane(0, i, 64) for i in range(p)] for p in (4, 8, 16)}
    for r in rows:
        v = r["embedding"]
        for p in (4, 8, 16):
            want = 0
            for i, plane in enumerate(planes[p]):
                proj = 0.0
                for x, h in zip(v, plane):
                    proj += float(x) * h  # same left fold, exact sign flip
                if proj > 0:
                    want += 1 << i
            assert r[f"sig{p}"] == want, (r["vec_id"], p)


def test_multimodal_pipeline(spark):
    media = synthetic_media(spark, 300)
    feats = extract_features(media)
    pdf = feats.toPandas()
    assert len(pdf) == 300
    assert set(pdf["kind"]) == {"image", "audio", "video"}
    # image/video features are 16-dim pooled grids; audio 16-bin histograms
    assert pdf["feature"].map(len).eq(16).all()
    # deterministic: same ids → same features
    pdf2 = extract_features(media).toPandas()
    a = pdf.sort_values("media_id", ignore_index=True)["feature"]
    b = pdf2.sort_values("media_id", ignore_index=True)["feature"]
    assert all(list(x) == list(y) for x, y in zip(a, b))
    # frame sampling fan-out honors metadata
    fs = frame_sample(media, every_n=50).toPandas()
    assert (fs["frame_idx"] % 50 == 0).all()


def test_ivf_knn_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    brute = {(r["q"], r["n"])
             for r in S.brute_knn(emb, queries, k=5).collect()}
    approx = {(r["q"], r["n"])
              for r in S.ivf_knn(emb, queries, k=5, n_cells=8,
                                 nprobe=4).collect()}
    recall = len(brute & approx) / len(brute)
    # probing half the cells: most true neighbors fall in a probed cell
    assert recall >= 0.6, f"IVF-ANN recall {recall}"
    assert all(q < 20 for q, _ in approx)


def test_ivf_assignment_is_total_and_unique(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cent, assigned = S.ivf_assign(emb, n_cells=8)
    assert cent.count() == 8
    n = emb.count()
    assert assigned.count() == n                      # every vector placed
    assert assigned.select("vec_id").distinct().count() == n  # exactly once
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    cent_ids = {r["cid"] for r in cent.collect()}
    assert cells <= cent_ids


def test_approx_distinct_error_bound(spark):
    from flow_pipeline_spark.plans import QUERIES
    approx = {r["event_type"]: r["n_users_approx"]
              for r in QUERIES["approx_distinct_users"]
              .spark(spark, SF_DIR).collect()}
    exact = {r["event_type"]: r["n_users"]
             for r in QUERIES["distinct_users"].spark(spark, SF_DIR).collect()}
    assert approx.keys() == exact.keys()
    for k in exact:
        rel = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel <= 0.05, (k, approx[k], exact[k])


def test_duplicate_clusters_transitive(spark):
    """A~B, B~C, D~E: components {A,B,C} and {D,E} despite no (A,C) edge;
    chain of length 6 converges too."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11),
         (20, 21), (21, 22), (22, 23), (23, 24), (24, 25)],
        "id_a LONG, id_b LONG")
    got = {r["id"]: r["cluster_id"]
           for r in D.duplicate_clusters(pairs).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert all(got[i] == 20 for i in range(20, 26))


def test_star_contraction_equals_label_propagation(spark):
    """duplicate_clusters_star (large-star/small-star, O(log n) rounds) must
    produce the identical (id, cluster_id) mapping as min-label propagation
    on every graph shape that stresses a different failure mode: long chain
    (diameter), hub star (degree), bridged stars (merge), singleton edge,
    and a pseudo-random graph."""
    shapes = {
        "chain": [(i, i + 1) for i in range(30, 60)],
        "hub": [(100, 100 + k) for k in range(1, 20)],
        "bridged": [(1, 2), (1, 3), (10, 11), (10, 12), (3, 10)],
        "singleton": [(7, 8)],
        "random": [((k * 7919) % 50, (k * 104729) % 50)
                   for k in range(1, 80)
                   if (k * 7919) % 50 != (k * 104729) % 50],
    }
    for name, edges in shapes.items():
        pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
        # LP needs ~diameter rounds (the chain shape is exactly its worst
        # case — the reason the star variant exists); star needs O(log n)
        lp = {r["id"]: r["cluster_id"]
              for r in D.duplicate_clusters(pairs, max_iter=60).collect()}
        star = {r["id"]: r["cluster_id"]
                for r in D.duplicate_clusters_star(pairs).collect()}
        assert star == lp, (name, star, lp)


def test_star_contraction_on_planted_corpus(planted, spark):
    """End-to-end parity on real LSH candidate pairs: the star-contraction
    clusters drive dedup_by_clusters-equivalent survivor selection."""
    pairs = D.minhash_lsh_candidates(planted, n_hashes=8, bands=4)
    lp = {(r["id"], r["cluster_id"])
          for r in D.duplicate_clusters(pairs).collect()}
    star = {(r["id"], r["cluster_id"])
            for r in D.duplicate_clusters_star(pairs).collect()}
    assert star == lp


def test_dedup_by_clusters_end_to_end(planted, spark):
    """LSH pairs on the planted corpus → clusters → corpus keeps exactly
    one representative per duplicate group (the original, min doc_id)."""
    pairs = D.minhash_lsh_candidates(planted, n_hashes=8, bands=4)
    deduped = D.dedup_by_clusters(planted, pairs)
    ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    # every planted copy (doc_id+100000) that collided with anything is
    # gone (copies always have a lower-id partner: their original)
    caught = {r["id_a"] for r in pairs.collect()} | \
             {r["id_b"] for r in pairs.collect()}
    for i in range(50):
        if i + 100000 in caught:
            assert i + 100000 not in ids
    # survivors are exactly the cluster canonicals plus unclustered docs
    clusters_df = D.duplicate_clusters(pairs)
    canon = {r["id"] for r in
             clusters_df.filter(F.col("id") == F.col("cluster_id")).collect()}
    clustered = {r["id"] for r in clusters_df.collect()}
    all_ids = {r["doc_id"] for r in planted.select("doc_id").collect()}
    assert ids == (all_ids - clustered) | canon



def test_kmeans_invariants(spark):
    """Lloyd invariants: every vector lands on its argmax-cosine centroid,
    and the clustering objective (mean cos to assigned centroid) does not
    degrade with more iterations."""
    import math

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = S.kmeans_fit(emb, n_cells=6, n_iter=3)
    assert len(cents) == 6
    for c in cents:  # spherical: unit-normalized centroids
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9

    assigned = emb.select(
        "vec_id", F.col("embedding").alias("v"),
        S._assign_cell(F.col("embedding"), S._norm(F.col("embedding")),
                       cents).alias("cell")).collect()
    for r in assigned[:50]:
        v = [float(x) for x in r["v"]]
        nv = math.sqrt(sum(x * x for x in v))
        cos = [sum(a * b for a, b in zip(v, c)) / nv for c in cents]
        assert r["cell"] == cos.index(max(cos))

    def objective(n_iter):
        cs = S.kmeans_fit(emb, n_cells=6, n_iter=n_iter)
        prof = S.kmeans_cells(emb, n_cells=6, n_iter=n_iter).collect()
        total = sum(r["n"] * r["avg_cos"] for r in prof)
        n = sum(r["n"] for r in prof)
        return total / n

    assert objective(3) >= objective(1) - 1e-6


def test_ivf_with_trained_centroids_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    brute = {(r["q"], r["n"])
             for r in S.brute_knn(emb, queries, k=5).collect()}
    cents = S.kmeans_fit(emb, n_cells=8, n_iter=3)
    approx = {(r["q"], r["n"])
              for r in S.ivf_knn(emb, queries, k=5, n_cells=8, nprobe=4,
                                 centroids=cents).collect()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.6, f"trained-IVF recall {recall}"


def test_brute_knn_vectorized_matches_hof(spark):
    """The numpy GEMM path returns the same neighbors (and 4dp cosines)
    as the expression-based brute_knn."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 15)
    a = {(r["q"], r["n"], r["cos"])
         for r in S.brute_knn(emb, queries, k=5).collect()}
    b = {(r["q"], r["n"], r["cos"])
         for r in S.brute_knn_vectorized(emb, queries, k=5).collect()}
    assert a == b


def test_bmp_wav_containers_roundtrip():
    """The container builders emit real formats: BMP survives an
    independent-shape round-trip (incl. non-4-divisible widths that force
    row padding), WAV round-trips through the stdlib reader within PCM16
    quantization."""
    import numpy as np
    from flow_pipeline_spark.operators.multimodal import (
        make_bmp, make_video, make_wav, parse_bmp, parse_video, parse_wav)

    grid = np.arange(7 * 5, dtype=np.uint8).reshape(7, 5)  # w=5 → padded rows
    assert np.array_equal(parse_bmp(make_bmp(grid)), grid.astype(np.float32))

    samples = np.sin(np.linspace(0, 20, 1000)) * 0.7
    got, rate = parse_wav(make_wav(samples, 8000))
    assert rate == 8000
    assert np.abs(got - samples).max() < 1.5 / 32767

    frames = [grid, grid.T.copy()[:5, :5]]
    back = parse_video(make_video(frames))
    assert len(back) == 2 and np.array_equal(back[0], grid)


def test_known_payload_known_feature(spark):
    """End-to-end decode honesty: a constant-value BMP must pool to exactly
    that constant; an all-zero WAV puts all histogram mass in the bin
    containing 0. If the kernel faked the decode, neither would hold."""
    import numpy as np
    import pandas as pd
    from flow_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA, extract_features, make_bmp, make_wav)

    img = make_bmp(np.full((10, 6), 100, dtype=np.uint8))
    wav = make_wav(np.zeros(500), 16000)
    pdf = pd.DataFrame([
        (0, "image", img, {"width": 6, "height": 10, "sample_rate": None,
                           "n_frames": None, "format": "bmp"}),
        (1, "audio", wav, {"width": None, "height": None,
                           "sample_rate": 16000, "n_frames": None,
                           "format": "wav"}),
    ], columns=["media_id", "kind", "payload", "meta"])
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"]
             for r in extract_features(media).collect()}
    assert feats[0] == [100.0] * 16
    # zeros → PCM16 value 0 → bin [0, 0.125) → index 8
    assert feats[1][8] == 1.0 and sum(feats[1]) == 1.0


def test_meta_header_mismatch_fails_loudly(spark):
    """A payload whose container header contradicts its metadata struct
    must raise (data-integrity gate), not silently decode."""
    import numpy as np
    import pandas as pd
    import pytest
    from flow_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA, extract_features, make_bmp)

    img = make_bmp(np.zeros((4, 4), dtype=np.uint8))
    pdf = pd.DataFrame(
        [(0, "image", img, {"width": 99, "height": 4, "sample_rate": None,
                            "n_frames": None, "format": "bmp"})],
        columns=["media_id", "kind", "payload", "meta"])
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    with pytest.raises(Exception, match="(?i)mismatch"):
        extract_features(media).collect()


# --- round 3: incremental / semantic dedup, quality classifier ---------------

def test_incremental_dedup_drops_replays_keeps_fresh(spark, docs):
    history = docs.filter(F.col("doc_id") < 400)
    fresh = docs.filter(F.col("doc_id") >= 400)
    replayed = (docs.filter(F.col("doc_id") < 50)
                .withColumn("doc_id", F.col("doc_id") + 100000))
    batch = fresh.unionByName(replayed)
    kept = D.incremental_dedup(batch, history)
    ids = {r[0] for r in kept.select("doc_id").collect()}
    assert ids == {r[0] for r in fresh.select("doc_id").collect()}
    # idempotence: re-running the surviving batch against history+batch
    # (the appended digest table) drops everything
    appended = history.unionByName(kept.select("doc_id", "text"))
    assert D.incremental_dedup(kept.select("doc_id", "text"),
                               appended).count() == 0


def test_semantic_dedup_recovers_planted_and_stays_in_cells(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    copies = (emb.filter(F.col("vec_id") < 20)
              .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    corpus = emb.unionByName(copies)
    pairs = S.semantic_dedup_pairs(corpus, threshold=0.999, n_cells=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(i, i + 100000) for i in range(20)}
    # every reported pair shares its cell by construction; spot-check the
    # assignment itself is total and deterministic across two runs
    cents = [(int(r[0]), [float(x) for x in r[1]])
             for r in corpus.orderBy("vec_id").limit(8).collect()]
    a1 = S.assign_nearest_centroid(corpus, cents).select("vec_id", "cell")
    a2 = S.assign_nearest_centroid(corpus, cents).select("vec_id", "cell")
    assert a1.count() == corpus.count()
    assert a1.exceptAll(a2).count() == 0


def test_semantic_dedup_plan_joins_on_cell_not_cross(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    plan = S.semantic_dedup_pairs(emb)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_classifier_gate_consistency(spark, docs):
    """score >= 0.5 ⇔ z >= 0 except exactly at the rounding boundary —
    the gate must follow z's sign (the boundary case that motivated
    classifier_z)."""
    from flow_pipeline_spark.operators import text as TX
    scored = docs.select(
        "doc_id", TX.classifier_z(F.col("text")).alias("z")) \
        .select("doc_id", "z", TX.classifier_score(F.col("z")).alias("score"))
    rows = scored.collect()
    assert rows, "empty corpus"
    for r in rows:
        assert 0.0 < r["score"] < 1.0
        if r["z"] >= 0:
            assert r["score"] >= 0.5
        else:
            assert r["score"] <= 0.5  # boundary z=-0.0001 rounds UP to 0.5
    # the gate is discriminative on this corpus (both classes present is
    # not guaranteed at every SF, but scores must not be constant)
    assert len({r["score"] for r in rows}) > 1


def test_assign_vectorized_matches_hof(spark):
    """GEMM centroid assignment ≡ the HOF literal-argmax form on every
    corpus vector (same 4dp HALF-UP rounding, same smallest-cid ties)."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = [(int(r[0]), [float(x) for x in r[1]])
             for r in emb.orderBy("vec_id").limit(8).collect()]
    hof = {(r[0], r[1]) for r in
           S.assign_nearest_centroid(emb, cents)
           .select("vec_id", "cell").collect()}
    gemm = {(r[0], r[1]) for r in
            S.assign_nearest_centroid_vectorized(emb, cents).collect()}
    assert hof == gemm
    # and the dedup built on it returns the same pairs either way
    copies = (emb.filter(F.col("vec_id") < 10)
              .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    corpus = emb.unionByName(copies)
    a = {tuple(r) for r in
         S.semantic_dedup_pairs(corpus, n_cells=8).collect()}
    b = {tuple(r) for r in
         S.semantic_dedup_pairs(corpus, n_cells=8,
                                vectorized=True).collect()}
    assert a == b and len(a) == 10


def test_assign_vectorized_carry_passes_columns_through(spark):
    """carry=[...] (round-10, the pq_encode device): identical cells to
    the ids-only form, and the carried embedding column comes through
    the Arrow hop bit-unchanged — semantic_dedup_pairs(vectorized=True)
    relies on this instead of the former re-scan + id-join re-attach."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = [(int(r[0]), [float(x) for x in r[1]])
             for r in emb.orderBy("vec_id").limit(8).collect()]
    plain = {(r["vec_id"], r["cell"]) for r in
             S.assign_nearest_centroid_vectorized(emb, cents).collect()}
    carried = S.assign_nearest_centroid_vectorized(
        emb, cents, carry=["embedding"]).collect()
    assert {(r["vec_id"], r["cell"]) for r in carried} == plain
    orig = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    for r in carried:
        assert [float(x) for x in r["embedding"]] == orig[r["vec_id"]]


def test_semantic_dedup_with_kmeans_centroids(spark):
    """Production path: trained kmeans_fit centroids instead of the
    lowest-id oracle rule — planted identical pairs are still recovered
    (identical vectors share a cell under ANY centroid set)."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    copies = (emb.filter(F.col("vec_id") < 20)
              .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    corpus = emb.unionByName(copies)
    trained = S.kmeans_fit(corpus, n_cells=8, n_iter=2)
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(trained)]
    pairs = S.semantic_dedup_pairs(corpus, threshold=0.999, centroids=cents)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(i, i + 100000) for i in range(20)}


def test_compression_ratio_orders_redundancy(spark):
    """zlib ratio must rank: highly repetitive < natural prose < random
    gibberish — the property the Gopher-style band gate relies on."""
    from flow_pipeline_spark.operators import text as TX
    rows = [
        (1, "the quick brown fox " * 50),                      # repetitive
        (2, ("the sudden storm scattered every careful plan we had "
             "made for the harvest and the village met to decide "
             "what could still be saved before winter ") * 3),  # prose-ish
        (3, " ".join(format((i * 2654435761) % 2**32, "x")
                     for i in range(150))),                     # gibberish
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["r"]
           for r in df.select("doc_id",
                              TX.compression_ratio(F.col("text"))
                              .alias("r")).collect()}
    assert got[1] < got[2] < got[3]
    assert 0.0 < got[1] < 0.2          # heavy repetition compresses hard
    assert got[3] > 0.5                # hex gibberish barely compresses
    # determinism + null/empty handling
    df2 = spark.createDataFrame([(4, None), (5, "")],
                                "doc_id int, text string")
    vals = [r["r"] for r in df2.select(
        TX.compression_ratio(F.col("text")).alias("r")).collect()]
    assert vals == [None, None]


def test_hashed_tf_embed_feeds_semantic_dedup(spark, docs):
    """The encoder stand-in closes the text → semantic-dedup loop:
    identical texts embed identically (cosine exactly 1), so planted
    copies are recovered by semantic_dedup_pairs over raw documents."""
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 15)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    emb = S.hashed_tf_embed(corpus).select(
        F.col("doc_id").alias("vec_id"), "embedding")
    # embeddings are unit-norm, deterministic, fixed-dim
    one = emb.limit(5).collect()
    for r in one:
        v = r["embedding"]
        assert len(v) == 64
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5
    pairs = S.semantic_dedup_pairs(emb, threshold=0.999, n_cells=8,
                                   vectorized=True)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 100000) for i in range(15)} <= got
    # no explosion: organic 500-doc corpus shouldn't be all near-dups
    assert len(got) < 100


def test_incremental_near_dup_flags_echoes_not_rewrites(spark, docs):
    """Cross-snapshot near-dup: tail-perturbed echoes of history collide
    with their originals via the stored band table; full rewrites (every
    shingle changed) never do."""
    history_bands = D.minhash_band_table(docs, n_hashes=8, bands=4, k=3)
    echoes = (docs.filter(F.col("doc_id") < 25)
              .select((F.col("doc_id") + 100000).alias("doc_id"),
                      F.concat("text", F.lit(" tail x")).alias("text")))
    rewrites = (docs.filter(F.col("doc_id") < 25)
                .select((F.col("doc_id") + 200000).alias("doc_id"),
                        F.regexp_replace("text", r"\s+", " qq7 ")
                        .alias("text")))
    flagged = D.incremental_near_dup(
        echoes.unionByName(rewrites), history_bands,
        n_hashes=8, bands=4, k=3).cache()
    pairs = {(r["new_id"], r["hist_id"]) for r in flagged.collect()}
    echo_hits = {(i + 100000, i) for i in range(25)} & pairs
    assert len(echo_hits) >= 23          # J≈0.9 → band-collision p≈0.999
    assert all(nid < 200000 for nid, _ in pairs), \
        "a full rewrite collided with history"


def test_lsh_knn_multiprobe_recall_dominates(spark):
    """Multi-probe (1-bit-flip buckets, query side only) must strictly
    improve candidate coverage: recall >= the single-probe run on the
    same tables, and clears a higher floor."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    brute = {(r["q"], r["n"])
             for r in S.brute_knn(emb, queries, k=5).collect()}
    single = {(r["q"], r["n"])
              for r in S.lsh_knn(emb, queries, k=5, n_planes=4,
                                 n_tables=6).collect()}
    multi = {(r["q"], r["n"])
             for r in S.lsh_knn(emb, queries, k=5, n_planes=4, n_tables=6,
                                multiprobe=True).collect()}
    r_single = len(brute & single) / len(brute)
    r_multi = len(brute & multi) / len(brute)
    assert r_multi >= r_single, (r_multi, r_single)
    assert r_multi >= 0.8, f"multiprobe recall {r_multi}"


def test_lm_persisted_scores_next_batch(spark, docs, tmp_path):
    """The CCNet split made literal: train the unigram LM on batch N,
    PERSIST it, score batch N+1 under the stored model — no retraining,
    same broadcast-join plan as the fused doc_perplexity query."""
    import math

    from flow_pipeline_spark.operators.text import (score_with_lm,
                                                    train_unigram_lm)

    batch_n = docs.filter(F.col("doc_id") < 400)
    batch_n1 = docs.filter(F.col("doc_id") >= 400)
    lm_path = str(tmp_path / "unigram_lm")
    train_unigram_lm(batch_n).write.parquet(lm_path)
    lm = spark.read.parquet(lm_path)

    scored = score_with_lm(batch_n1, lm).cache()
    n_total = lm.agg(F.max("n_total")).first()[0]
    max_bits = math.log2(n_total)
    rows = scored.collect()
    assert len(rows) == batch_n1.count()
    # every score is positive and bounded by the all-OOV ceiling
    assert all(0 < r["avg_nll_bits"] <= max_bits + 1e-9 for r in rows)

    # an all-OOV doc scores EXACTLY the ceiling (count-1 floor), and a doc
    # replayed verbatim from the training batch scores strictly below it
    probe = spark.createDataFrame(
        [(1, "zzqx9 zzqx8 zzqx7")], "doc_id long, text string")
    oov = score_with_lm(probe, lm).first()["avg_nll_bits"]
    assert abs(oov - round(max_bits, 4)) < 2e-4
    replay = batch_n.limit(1)
    replayed = score_with_lm(replay, lm).first()["avg_nll_bits"]
    assert replayed < oov

    # determinism: scoring from the persisted table == scoring from the
    # in-memory training plan (the fixed-point arithmetic guarantees it)
    scored2 = score_with_lm(batch_n1, train_unigram_lm(batch_n))
    assert scored.exceptAll(scored2).isEmpty()
    assert scored2.exceptAll(scored).isEmpty()


def _span_corpus(spark):
    """Synthetic corpus with per-doc-unique vocabularies (zero organic
    cross-doc k-grams) + a 12-token paragraph planted mid-document in
    docs 2-5, twice (far apart) in doc 6."""
    lit = ["s%d" % j for j in range(12)]

    def doc(i, plants):
        toks = ["d%dt%d" % (i, j) for j in range(40)]
        out = []
        prev = 0
        for at in plants:
            out += toks[prev:at] + lit
            prev = at
        out += toks[prev:]
        return (i, " ".join(out))

    rows = [doc(0, []), doc(1, []), doc(2, [10]), doc(3, [20]),
            doc(4, [5]), doc(5, [30]), doc(6, [8, 30])]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repeated_span_recovery(spark):
    """Planted cross-doc paragraph recovered as one maximal span per
    non-canonical host, at the exact token position, min-id copy kept."""
    corpus = _span_corpus(spark)
    spans = {(r["doc_id"], r["span_start"], r["span_len"])
             for r in D.repeated_span_table(corpus, k=8).collect()}
    # canonical (doc 2, the min id containing the paragraph) never flagged
    assert all(d != 2 for d, _, _ in spans)
    # insert at token index `at` (0-based) → span starts at at+1 (1-based)
    assert (3, 21, 12) in spans
    assert (4, 6, 12) in spans
    assert (5, 31, 12) in spans
    # two far-apart plants in one doc → two distinct maximal spans
    assert (6, 9, 12) in spans and (6, 43, 12) in spans
    assert len(spans) == 5
    # keep_first=False flags EVERY occurrence, including the canonical
    all_spans = {(r["doc_id"], r["span_start"], r["span_len"])
                 for r in D.repeated_span_table(
                     corpus, k=8, keep_first=False).collect()}
    assert (2, 11, 12) in all_spans
    assert len(all_spans) == 6


def test_repeated_span_within_doc_scope(spark):
    """ADVICE r4: the full ExactSubstr rule (Lee et al. 2022) also removes
    spans repeated WITHIN one document. Default scope stays cross-doc
    (oracle-pinned); include_within_doc=True flags the self-repeat's
    later occurrence while keeping the globally-first one."""
    lit = ["w%d" % j for j in range(12)]
    toks = ["d7t%d" % j for j in range(40)]
    text = " ".join(toks[:8] + lit + toks[8:30] + lit + toks[30:])
    corpus = _span_corpus(spark).unionByName(
        spark.createDataFrame([(7, text)], "doc_id long, text string"))

    # default cross-doc scope: the self-repeat is invisible
    assert (D.repeated_span_table(corpus, k=8)
            .filter("doc_id = 7").count() == 0)

    spans = {(r["doc_id"], r["span_start"], r["span_len"])
             for r in D.repeated_span_table(
                 corpus, k=8, include_within_doc=True).collect()}
    # the SECOND in-doc occurrence flagged (tokens 43-54), first kept:
    # 8 lead + 12 lit + 22 mid = 42 tokens before it, 1-based start 43
    assert {s for s in spans if s[0] == 7} == {(7, 43, 12)}
    # cross-doc behavior unchanged: same five spans as the default scope,
    # canonical doc 2 still never flagged
    assert all(d != 2 for d, _, _ in spans)
    assert {(3, 21, 12), (4, 6, 12), (5, 31, 12),
            (6, 9, 12), (6, 43, 12)} <= spans
    assert len(spans) == 6
    # scrub under the widened scope: doc 7 keeps exactly one copy
    scrubbed = D.remove_repeated_spans(
        corpus, D.repeated_span_table(corpus, k=8,
                                      include_within_doc=True))
    t7 = {r["doc_id"]: r["text"] for r in scrubbed.collect()}[7]
    assert t7.split().count("w0") == 1
    assert [w for w in t7.split() if not w.startswith("w")] == toks


def test_remove_repeated_spans_round_trip(spark):
    """Scrubbing removes exactly the flagged tokens; the canonical copy
    survives; a second pass finds nothing left to remove."""
    corpus = _span_corpus(spark)
    spans = D.repeated_span_table(corpus, k=8)
    scrubbed = D.remove_repeated_spans(corpus, spans)
    texts = {r["doc_id"]: r["text"] for r in scrubbed.collect()}
    lit = " ".join("s%d" % j for j in range(12))
    assert lit in texts[2]                      # canonical keeps its copy
    for d in (3, 4, 5, 6):
        assert lit not in texts[d]
        assert "s0" not in texts[d].split()     # no partial residue
    # non-span tokens all survive, in order
    assert texts[3].split() == (
        ["d3t%d" % j for j in range(40)])
    assert texts[6].split() == ["d6t%d" % j for j in range(40)]
    # docs with no spans pass through verbatim
    assert texts[0] == " ".join("d0t%d" % j for j in range(40))
    # fixed point: re-running the span finder on scrubbed text is empty
    assert D.repeated_span_table(scrubbed, k=8).count() == 0


def test_hashed_tf_native_matches_pandas_bitwise(spark, docs):
    """The zero-Python hashed-TF embed must equal the Arrow-kernel form
    BIT-FOR-BIT (integer counts are exact in float64 under any summation
    order; norm and divide are correctly-rounded IEEE), including the
    empty/whitespace-only zero-vector edge."""
    sample = docs.limit(150)
    a = S.hashed_tf_embed(sample).select(
        "doc_id", F.col("embedding").alias("ea"))
    b = S.hashed_tf_embed_native(sample).select(
        "doc_id", F.col("embedding").alias("eb"))
    rows = a.join(b, "doc_id").collect()
    assert len(rows) == 150
    for r in rows:
        assert r["ea"] == r["eb"], r["doc_id"]
    edge = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello hello world"),
         # Unicode whitespace (NBSP / ideographic space): ONE token to
         # the ASCII tokenizer both sides — str.split() would diverge
         (4, "foo\u00a0bar baz"), (5, "a\u3000b")],
        "doc_id long, text string")
    ea = {r["doc_id"]: r["embedding"]
          for r in S.hashed_tf_embed(edge).collect()}
    eb = {r["doc_id"]: r["embedding"]
          for r in S.hashed_tf_embed_native(edge).collect()}
    assert ea == eb
    assert all(x == 0.0 for x in eb[1]) and all(x == 0.0 for x in eb[2])


def test_incremental_semantic_dedup_gemm_matches_hof(spark):
    """Cross-snapshot semantic dedup: verbatim embedding replays collide
    with their stored originals at cos 1.0, negated vectors never do;
    the cogroup-GEMM verify returns EXACTLY the HOF join's pairs."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding")
    cents = [(int(r[0]), [float(x) for x in r[1]])
             for r in emb.orderBy("vec_id").limit(8).collect()]
    store = S.semantic_store(emb, cents)
    copies = (emb.filter(F.col("vec_id") < 20)
              .select((F.col("vec_id") + 100000).alias("vec_id"),
                      "embedding"))
    negs = (emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
            .select((F.col("vec_id") + 200000).alias("vec_id"),
                    F.transform(F.col("embedding"), lambda x: -x)
                    .alias("embedding")))
    batch = copies.unionByName(negs)

    hof = {(r["new_id"], r["hist_id"], r["cos"]) for r in
           S.incremental_semantic_dedup(batch, store, cents).collect()}
    gemm = {(r["new_id"], r["hist_id"], r["cos"]) for r in
            S.incremental_semantic_dedup(batch, store, cents,
                                         vectorized=True).collect()}
    assert hof == gemm
    assert {(j + 100000, j, 1.0) for j in range(20)} <= hof
    assert all(nid < 200000 for nid, _, _ in hof), \
        "a negated vector collided with history"
    # the vectorized store form assigns identically
    store_v = S.semantic_store(emb, cents, vectorized=True)
    a = {(r["vec_id"], r["cell"]) for r in
         store.select("vec_id", "cell").collect()}
    b = {(r["vec_id"], r["cell"]) for r in
         store_v.select("vec_id", "cell").collect()}
    assert a == b


def test_bpe_train_matches_reference(spark, docs):
    """Distributed BPE induction == the textbook single-process trainer
    on the same word frequencies (same tie rule), merge for merge — the
    driver-coordinated rounds change the execution shape, never the
    learned model."""
    from flow_pipeline_spark.operators import tokenizer as TOK

    sample = docs.filter(F.col("doc_id") < 60)
    got = TOK.bpe_train(sample, n_merges=8)
    freqs = {r["word"]: r["freq"]
             for r in TOK.word_freq_table(sample).collect()}
    want = TOK.py_bpe_reference(freqs, 8)
    assert got == want
    assert len(got) == 8

    # classic toy corpus: the first merges fuse the shared suffixes
    toy = spark.createDataFrame(
        [(1, "low low low lower lower newest newest newest newest "
             "newest newest widest widest widest")],
        "doc_id long, text string")
    toy_merges = TOK.bpe_train(toy, n_merges=4)
    toy_freqs = {r["word"]: r["freq"]
                 for r in TOK.word_freq_table(toy).collect()}
    assert toy_merges == TOK.py_bpe_reference(toy_freqs, 4)
    # 'est▁' dominates (9 occurrences): (e,s) then (es,t▁) lead
    assert toy_merges[0] == ("e", "s")
    assert toy_merges[1] == ("es", "t" + TOK.END)


def test_bpe_oracles_survive_unlearnable_rounds(spark, tmp_path):
    """Round-9 review, low: an UNLEARNABLE merge round (every word fully
    merged before n_merges) makes the oracle's m{i} CTE EMPTY; the old
    cross join then collapsed the whole word/encode chain to zero rows —
    the encode oracle reported (0, '') for every doc while Spark encoded
    with the shorter merge list. The LEFT JOIN + coalesce guard must
    keep both BPE oracles hash-matching on a degenerate corpus where
    only ONE of the 8 rounds can learn a merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flow_pipeline_spark.plans import QUERIES

    from .oracle_utils import compare, run_oracle

    sf = tmp_path / "sf_degenerate"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": ["ab ab ab", "ab c", "c c c"]}),
        str(sf / "documents.parquet"))

    for name in ("bpe_merges", "bpe_encode_corpus"):
        qd = QUERIES[name]
        sp = qd.spark(spark, str(sf))
        od = run_oracle(qd.oracle, str(sf))
        assert not compare(sp, od), name
        if name == "bpe_merges":
            assert sp.count() == 1          # the one learnable merge
        else:
            # every doc must encode non-empty under the 1-merge model
            assert sp.filter(F.col("n_syms") == 0).count() == 0


def test_bpe_encode_and_stats_consistent(spark, docs):
    """Encoding under the trained merges reproduces the trainer's fold
    semantics (Arrow encoder == reference per word), and the corpus
    symbol stats account for every emitted symbol."""
    from flow_pipeline_spark.operators import tokenizer as TOK

    sample = docs.filter(F.col("doc_id") < 40)
    merges = TOK.bpe_train(sample, n_merges=6)

    enc = TOK.bpe_encode(sample, merges).select("doc_id", "bpe_tokens")
    rows = enc.collect()
    assert all(len(r["bpe_tokens"]) > 0 for r in rows)
    # Arrow encoder == reference encoder on a few docs
    texts = {r["doc_id"]: r["text"]
             for r in sample.limit(5).collect()}
    got = {r["doc_id"]: r["bpe_tokens"] for r in rows}
    for did, t in texts.items():
        want = []
        for w in t.lower().split():
            syms = list(w[:-1]) + [w[-1] + TOK.END]
            for a, b in merges:
                syms = TOK._py_apply_merge(syms, a, b)
            want += syms
        assert got[did] == want, did

    # stats: total symbol mass == total emitted tokens across the corpus
    stats = TOK.bpe_symbol_stats(sample, merges)
    total_stats = stats.agg(F.sum("freq")).first()[0]
    total_enc = (enc.select(F.size("bpe_tokens").alias("n"))
                 .agg(F.sum("n")).first()[0])
    assert total_stats == total_enc
    # every merged symbol that appears in stats is a concatenation
    # reachable from the merge list
    merged_syms = {a + b for a, b in merges}
    produced = {r["symbol"] for r in stats.collect()}
    assert merged_syms & produced, "no merged symbol ever used"


def test_review_fix_edges(spark):
    """Round-5 review findings pinned: (a) mmr_select works with string
    ids under a custom id_col name; (b) paragraph_digests splits sep
    LITERALLY (regex metacharacters don't change the digests) so the
    store/probe pair agree on custom separators; (c) profile_columns
    handles column names containing quotes/backticks."""
    # (a) string ids + custom id_col
    df = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [0.9, 0.436]),
         ("doc-c", [0.3, 0.954])],
        "doc_id string, embedding array<double>")
    # λ=0.4 weights diversity: doc-b (rel≈pen≈0.90 → score −0.18)
    # loses to doc-c (rel≈pen≈0.30 → score −0.06)
    got = S.mmr_select(df, [1.0, 0.0], k=2, lam=0.4,
                       id_col="doc_id").collect()
    assert [r["doc_id"] for r in got] == ["doc-a", "doc-c"]
    assert got[0]["rank"] == 1

    # (b) regex-metacharacter separator: '||' as literal
    hist = spark.createDataFrame(
        [(1, "shared banner||unique one")], "doc_id long, text string")
    store = D.paragraph_digests(hist, sep="||")
    import hashlib
    digs = {r[0] for r in store.collect()}
    assert hashlib.md5(b"shared banner").hexdigest() in digs
    bloom = D.bloom_build(store, fpp=0.0001)
    new = spark.createDataFrame(
        [(2, "shared banner||fresh text here")],
        "doc_id long, text string")
    out = D.bloom_paragraph_dedup(new, bloom, sep="||").first()
    assert out["text"] == "fresh text here"
    assert out["n_dropped_paras"] == 1

    # (c) hostile column names
    wdf = spark.createDataFrame([(1, 2)]).toDF("it's", "a`b")
    from flow_pipeline_spark.operators.profile import profile_columns
    prof = {r["column"]: r for r in profile_columns(wdf).collect()}
    assert prof["it's"]["n_rows"] == 1 and prof["a`b"]["n_distinct"] == 1


def test_psi_drift_zero_on_identical_and_flags_shift(spark):
    """PSI sanity: identical snapshots score EXACTLY zero (p == q per
    bin → every term is 0, no float residue survives the integer
    pinning); concentrating half the mass into one bin blows past the
    0.25 'shifted' alert threshold; totals are consistent."""
    from flow_pipeline_spark.operators.profile import psi_drift

    ref = spark.range(1000).select(
        (F.col("id") % 10).cast("int").alias("v"))
    same = psi_drift(ref, ref, F.col("v"), 10).collect()
    assert all(r["term_e6"] == 0 for r in same)
    assert same[0]["psi_e6"] == 0

    cur = spark.range(1000).select(
        F.when(F.col("id") < 500, 0)
        .otherwise((F.col("id") % 10)).cast("int").alias("v"))
    drift = psi_drift(ref, cur, F.col("v"), 10).collect()
    assert drift[0]["psi_e6"] == sum(r["term_e6"] for r in drift)
    assert drift[0]["psi_e6"] > 250_000, drift[0]["psi_e6"]
    assert sum(r["c_cur"] for r in drift) == 1000


def test_profile_columns_counts_nulls_and_distincts(spark):
    from flow_pipeline_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k long, s string")
    got = {r["column"]: r for r in profile_columns(df).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 1
    assert got["k"]["n_distinct"] == 3
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("1", "3")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")


def test_check_constraints_empty_frame_vacuously_passes(spark):
    """Zero-row frame: every check reports (0 rows, 0 violations,
    passed, pass_fraction_e4 = 10000) — the Deequ vacuous-truth
    convention — instead of a null row from sum()=null and the e4
    division by zero."""
    from flow_pipeline_spark.operators.profile import check_constraints

    df = spark.createDataFrame([], "k long, s string").filter("1=0")
    got = check_constraints(df, [
        ("k_not_null", F.col("k").isNotNull()),
        ("s_in_domain", F.col("s").isin("a", "b")),
    ]).collect()
    assert len(got) == 2
    for r in got:
        assert (r["n_rows"], r["n_violations"]) == (0, 0)
        assert r["pass_fraction_e4"] == 10000 and r["passed"] is True


def test_mmr_diversifies_clone_results(spark):
    """MMR (Carbonell & Goldstein 1998): plain top-3 returns the three
    near-identical clones back-to-back; MMR keeps the best clone and
    promotes DISTINCT candidates over the other clones."""
    rows = [
        # cluster A (mutually ~identical, best relevance ~0.90)
        (1, [0.900, 0.436, 0.0, 0.0]),
        (2, [0.900, 0.437, 0.0, 0.0]),
        (3, [0.899, 0.436, 0.0, 0.0]),
        # two DISTINCT directions, slightly less relevant
        (4, [0.880, 0.0, 0.475, 0.0]),
        (5, [0.870, 0.0, 0.0, 0.493]),
        (6, [0.0, 1.0, 0.0, 0.0]),     # irrelevant
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]

    plain = [r["n"] for r in S.brute_knn(
        df, spark.createDataFrame([(99, q)],
                                  "vec_id long, embedding array<double>"),
        k=3).orderBy("rank").collect()]
    assert set(plain) == {1, 2, 3}, plain  # cluster A crowds out all

    got = S.mmr_select(df, q, k=3, lam=0.5).orderBy("rank").collect()
    ids = [r["vec_id"] for r in got]
    assert ids[0] == 1                     # best of cluster A first
    assert set(ids[1:]) == {4, 5}, ids     # then one per direction —
    #                                        the remaining A members'
    #                                        pen≈1 demotes them
    # determinism: same output on a different partitioning
    ids2 = [r["vec_id"] for r in
            S.mmr_select(df.repartition(5), q, k=3, lam=0.5)
            .orderBy("rank").collect()]
    assert ids == ids2


def test_bigram_lm_persist_score_and_backoff(spark, docs, tmp_path):
    """Bigram-backoff LM: both model tables persist and score a LATER
    batch identically after read-back; the backoff branch fires for
    unseen pairs; a document made of the corpus's most frequent bigram
    scores lower nll than one of never-seen pairs."""
    from flow_pipeline_spark.operators.text import (score_with_bigram_lm,
                                                    train_bigram_lm)

    b1 = docs.filter(F.col("doc_id") < 200)
    b2 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 260))
    uni, bi = train_bigram_lm(b1, bigram_size=300)

    up, bp = str(tmp_path / "uni"), str(tmp_path / "bi")
    uni.write.parquet(up)
    bi.write.parquet(bp)
    live = {r["doc_id"]: (r["avg_nll_bits"], r["n_backoff"])
            for r in score_with_bigram_lm(b2, uni, bi).collect()}
    back = {r["doc_id"]: (r["avg_nll_bits"], r["n_backoff"])
            for r in score_with_bigram_lm(
                b2, spark.read.parquet(up),
                spark.read.parquet(bp)).collect()}
    assert live == back, "persisted tables score differently"
    assert sum(nb for _, nb in live.values()) > 0, \
        "no pair ever hit the backoff branch — fixture too small?"

    top = bi.orderBy(F.desc("c2"), "a", "b").first()
    frequent = " ".join([top["a"], top["b"]] * 10)
    unseen = " ".join(f"zq{i}x zq{i}y" for i in range(10))
    probe = spark.createDataFrame(
        [(1, frequent), (2, unseen)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           score_with_bigram_lm(probe, uni, bi).collect()}
    assert got[1]["avg_nll_bits"] < got[2]["avg_nll_bits"]
    assert got[2]["n_backoff"] == 19     # every pair of the unseen doc


def test_bloom_incremental_dedup_no_false_negatives(spark, docs):
    """Dolma-style Bloom dedup: the guarantee is one-sided — EVERY true
    replay drops (no false negatives), fresh content survives up to the
    configured fpp. The bitmap is the fixed-size broadcastable store."""
    from flow_pipeline_spark.operators.text import normalize_text

    history = docs.filter(F.col("doc_id") < 300)
    hist_digests = history.select(
        F.md5(normalize_text(F.col("text"))).alias("content_hash"))
    bloom = D.bloom_build(hist_digests, fpp=0.01)
    bitmap, m_bits, k = bloom
    assert len(bitmap) == (m_bits + 7) // 8 and k >= 1

    replays = (history.filter(F.col("doc_id") < 50)
               .withColumn("doc_id", F.col("doc_id") + 100000))
    fresh = docs.filter(F.col("doc_id") >= 300)
    batch = fresh.unionByName(replays.select(*fresh.columns))
    kept = {r["doc_id"]
            for r in D.bloom_incremental_dedup(batch, bloom).collect()}
    assert not any(i >= 100000 for i in kept), \
        "a replayed document escaped the Bloom store (false negative)"
    n_fresh = fresh.count()
    # deterministic corpus → deterministic FP count (7/200 here; the
    # Kirsch-Mitzenmacher two-hash scheme has higher FP variance than
    # independent hashes at small m — fill factor verified on theory,
    # 0.514 vs ideal 0.518). Bound at 5%: an implementation bug (wrong
    # geometry, saturated bitmap) blows far past it
    assert len(kept) >= n_fresh - max(3, int(0.05 * n_fresh)), \
        "false-positive rate far above the configured fpp"


def test_bloom_paragraph_dedup_scrubs_seen(spark):
    """Paragraph-granular Bloom dedup (Dolma's unit): previously-seen
    paragraphs scrub out of new documents (case/whitespace variants
    merge — the Python kernel's normalization is pinned to the JVM
    paragraph_digests form), unseen paragraphs keep their original
    text, and all-new documents pass through verbatim."""
    hist = spark.createDataFrame(
        [(1, "Shared banner paragraph.\n\nUnique history body one."),
         (2, "Another history body.\n\nCall to action today!")],
        "doc_id long, text string")
    store = D.paragraph_digests(hist)
    # JVM-side digest of the banner must equal the Python kernel's
    import hashlib
    want = hashlib.md5(b"shared banner paragraph.").hexdigest()
    assert want in {r[0] for r in store.collect()}
    bloom = D.bloom_build(store, fpp=0.001)

    new = spark.createDataFrame(
        [(10, "SHARED  banner\tparagraph.\n\nGenuinely new body ten."),
         (11, "call to action today!\n\nAnother new body eleven."),
         (12, "Totally fresh paragraph.\n\nAnd a second fresh one.")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_dropped_paras"])
           for r in D.bloom_paragraph_dedup(new, bloom).collect()}
    assert got[10] == ("Genuinely new body ten.", 1)
    assert got[11] == ("Another new body eleven.", 1)
    assert got[12] == ("Totally fresh paragraph.\n\nAnd a second fresh one.", 0)


def test_bloom_paragraph_norm_parity_edges(spark):
    """The paragraph kernel's Python normalization must agree with the
    JVM paragraph_digests form on the nasty edges: collapse runs BEFORE
    the space-only trim (round 6 \u2014 so a leading tab/newline canonicalizes
    away instead of surviving as a leading space), Java regex \\s is
    ASCII (NBSP/ideographic space are NOT collapsed), case and
    ASCII-whitespace runs merge."""
    hist = spark.createDataFrame(
        [(1, "foo bar"), (2, "foo\u00a0bar"), (3, "\tfoo")],
        "doc_id long, text string")
    bloom = D.bloom_build(D.paragraph_digests(hist), fpp=0.0001)

    cases = [
        ("foo  bar", 1),         # ASCII run collapses -> stored form
        (" FOO bar ", 1),        # trim spaces + lowercase -> stored form
        ("foo\tbar", 1),         # tab is ASCII \\s -> collapses to space
        ("foo\u00a0bar", 1),     # NBSP preserved BOTH sides -> matches
        ("foo\u3000bar", 0),     # ideographic space != NBSP != space
        ("\tfoo", 1),            # '\tfoo', ' foo' and 'foo' all
        (" foo", 1),             # canonicalize to 'foo' now \u2014 the
        ("foo", 1),              # round-6 trim-order fix's point
    ]
    new = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_dropped_paras"]
           for r in D.bloom_paragraph_dedup(new, bloom).collect()}
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, (i, repr(t), got[i], want)


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    """RefinedWeb line-wise correction: lines in ≥min_doc_freq distinct
    docs vanish from EVERY doc (all copies, normalized identity — case
    and whitespace variants merge); unique lines keep their original
    text; untouched docs pass through verbatim."""
    rows = [
        (1, "Alpha body one.\nAll Rights Reserved.\nunique tail 1"),
        (2, "Beta body two.\nall  rights reserved.\nunique tail 2"),
        # doc 3 contains the banner TWICE — both in-doc copies go
        (3, "All Rights Reserved.\nGamma body three.\nall rights reserved."),
        (4, "Delta body four.\nno banner here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in D.dedup_lines(df, min_doc_freq=2).collect()}
    assert got[1] == "Alpha body one.\nunique tail 1"
    assert got[2] == "Beta body two.\nunique tail 2"
    assert got[3] == "Gamma body three."
    assert got[4] == rows[3][1]          # verbatim passthrough
    # frequency table: normalized banner counted once per doc
    freq = {r["line"]: r["df"]
            for r in D.line_doc_frequency(df).collect()}
    assert freq["all rights reserved."] == 3


def test_dsir_selects_target_domain(spark):
    """DSIR (Xie et al. 2023): documents drawn from the target domain's
    vocabulary must score a higher importance log-ratio than off-domain
    documents, and dsir_top_k must select exactly them — including
    HELD-OUT target-domain docs the target LM never saw."""
    from flow_pipeline_spark.operators.text import (dsir_log_ratio,
                                                    dsir_top_k,
                                                    train_unigram_lm)

    def doc(i, style, n=30):
        # deterministic word choice from a style-specific 20-word vocab
        return (i, " ".join(f"{style}{(i * 7 + j * 13) % 20}"
                            for j in range(n)))

    target_train = [doc(i, "code") for i in range(10)]
    target_held = [doc(i, "code") for i in range(10, 20)]
    off_domain = [doc(i, "prose") for i in range(20, 60)]
    corpus = spark.createDataFrame(
        target_train + target_held + off_domain,
        "doc_id long, text string")

    t_lm = train_unigram_lm(corpus.filter(F.col("doc_id") < 10))
    r_lm = train_unigram_lm(corpus)
    scored = {r["doc_id"]: r["avg_llr_bits"]
              for r in dsir_log_ratio(corpus, t_lm, r_lm).collect()}
    assert len(scored) == 60
    worst_target = min(scored[i] for i in range(20))
    best_off = max(scored[i] for i in range(20, 60))
    assert worst_target > best_off, (worst_target, best_off)
    # held-out target docs (never seen by the target LM) still clear it
    assert min(scored[i] for i in range(10, 20)) > best_off
    top = {r["doc_id"] for r in
           dsir_top_k(corpus, t_lm, r_lm, k=20).collect()}
    assert top == set(range(20))


def test_bpe_encode_vocab_matches_row_encoder(spark, docs):
    """VERDICT r4 item #3: the vocab-table encoder (distinct words encode
    once in Python, corpus tokens stay JVM-side) must equal the per-row
    Arrow encoder token-for-token, including empty/whitespace-only docs
    and Unicode-whitespace edges."""
    from flow_pipeline_spark.operators import tokenizer as TOK

    sample = docs.filter(F.col("doc_id") < 60).select("doc_id", "text")
    merges = TOK.bpe_train(sample, n_merges=6)

    edge = spark.createDataFrame(
        [(9001, ""), (9002, "   "), (9003, "hello hello world"),
         (9004, "foo bar baz"), (9005, "a　b")],
        "doc_id long, text string")
    corpus = sample.unionByName(edge)

    a = {r["doc_id"]: r["bpe_tokens"]
         for r in TOK.bpe_encode(corpus, merges).collect()}
    b = {r["doc_id"]: r["bpe_tokens"]
         for r in TOK.bpe_encode_vocab(corpus, merges).collect()}
    assert a.keys() == b.keys()
    for did in a:
        assert a[did] == b[did], did
    assert b[9001] == [] and b[9002] == []


def test_bpe_encode_stored_matches_corpus_form(spark):
    """VERDICT r6 item #4: bpe_encode_stored (encode under the PERSISTED
    merge table — the production train-once/encode-many shape, benched
    for the marginal encode cost) returns results identical to
    bpe_encode_corpus, which derives the same merges in-plan. Also pins
    the artifact contract: the published merges file holds exactly the
    trainer's output for this corpus."""
    from flow_pipeline_spark.plans import QUERIES
    from flow_pipeline_spark.plans.training_queries import \
        _bpe_stored_merges
    from flow_pipeline_spark.operators import tokenizer as TOK
    from flow_pipeline_spark.sources.tables import load_table

    stored = QUERIES["bpe_encode_stored"].spark(spark, SF_DIR).collect()
    inplan = QUERIES["bpe_encode_corpus"].spark(spark, SF_DIR).collect()
    assert stored == inplan and len(stored) > 0

    d = (load_table(spark, SF_DIR, "documents")
         .select("doc_id", "text").filter(F.col("doc_id") < 200))
    assert _bpe_stored_merges(spark, SF_DIR) == TOK.bpe_train(
        d, n_merges=8)


def test_ivf_pq_stored_matches_inplan_form(spark):
    """Round-10: ann_ivf_pq_stored (probe + ADC + refine over the
    PERSISTED codebooks/centroids/cell-partitioned codes — the serving
    shape, benched for the marginal query cost) returns results
    identical to ann_ivf_pq_knn, which trains and encodes in-plan. Also
    pins the artifact layout: the codes parquet is partitioned by cell
    (the on-disk inverted lists the probe join prunes)."""
    import os as _os

    from flow_pipeline_spark.plans import QUERIES
    from flow_pipeline_spark.plans.training_queries import \
        _ivf_pq_stored_artifacts

    stored = QUERIES["ann_ivf_pq_stored"].spark(spark, SF_DIR).collect()
    inplan = QUERIES["ann_ivf_pq_knn"].spark(spark, SF_DIR).collect()
    assert stored == inplan and len(stored) > 0

    _books, cent_rows, codes_path = _ivf_pq_stored_artifacts(spark,
                                                             SF_DIR)
    assert len(cent_rows) == 16
    cells = [d for d in _os.listdir(codes_path)
             if d.startswith("cell=")]
    assert cells, "codes table is not cell-partitioned"


def test_ivf_pq_upsert_matches_rebuild(spark):
    """Round-10: incremental index maintenance is LOSSLESS under a
    fixed model — appending the delta (encoded with the stored
    codebooks, cell-assigned with the stored centroids,
    similarity.py:ivf_pq_upsert) yields an index whose query results
    are IDENTICAL to re-encoding base ∪ delta from scratch with the
    SAME codebooks/centroids: encode and assignment are pure per-row
    functions of the model, so the append can never diverge from the
    rebuild. (What incremental maintenance actually trades — model
    staleness on drifted data — is a retrain-schedule property the
    ann_ivf_pq_upsert oracle captures by training only on the base
    split.) Also pins the append contract: upsert adds exactly the
    delta rows and leaves existing code rows byte-identical."""
    from flow_pipeline_spark.operators import similarity as S
    from flow_pipeline_spark.sources.tables import load_table

    e = (load_table(spark, SF_DIR, "embeddings")
         .select("vec_id", "embedding"))
    base = e.filter(F.col("vec_id") % 10 != 7)
    delta = e.filter(F.col("vec_id") % 10 == 7)
    books = S.pq_train(base, m=16, ks=64, n_iter=2)
    cent, assigned = S.ivf_assign(base, 8)
    codes_base = (S.pq_encode(base, books)
                  .join(assigned.select("vec_id", "cell"), "vec_id"))
    upserted = S.ivf_pq_upsert(codes_base, cent, delta, books)

    # rebuild: same model, every vector encoded/assigned from scratch
    cents = [(int(r["cid"]), [float(x) for x in r["cv"]])
             for r in cent.select("cid", "cv").collect()]
    rebuilt = S.ivf_pq_upsert(
        S.pq_encode(base, books).join(
            assigned.select("vec_id", "cell"), "vec_id").limit(0),
        cent, e, books)

    up = {r["vec_id"]: (list(r["pq_codes"]), r["cell"])
          for r in upserted.collect()}
    rb = {r["vec_id"]: (list(r["pq_codes"]), r["cell"])
          for r in rebuilt.collect()}
    assert up == rb and len(up) == e.count()
    # the append added exactly the delta rows
    n_delta = delta.count()
    assert n_delta > 0
    assert len(up) == codes_base.count() + n_delta
    assert len(cents) == 8

    # and the queries over both indexes agree row-for-row
    qs = e.filter(F.col("vec_id") < 6)
    r_up = S.ivf_pq_query(upserted, cent, qs, books, k=3, nprobe=4,
                          shortlist=12, rerank_with=e).collect()
    r_rb = S.ivf_pq_query(rebuilt, cent, qs, books, k=3, nprobe=4,
                          shortlist=12, rerank_with=e).collect()
    assert r_up == r_rb and len(r_up) > 0


def test_artifact_cache_root_and_content_keying(tmp_path, monkeypatch):
    """Round-7 review hardening of the build-once artifact cache:
    (a) the cache root honors SPARK_GRAFT_CACHE_DIR and is created mode
    0700; (b) the key is a CONTENT digest — rewriting the corpus with a
    PRESERVED mtime still changes the key (mtime-only keying silently
    served a stale index); (c) directory-parquet corpora (Spark-written
    layout, e.g. the sf1 probe tables) key without error, ignoring
    hidden/_SUCCESS entries."""
    import os
    import stat

    from flow_pipeline_spark.plans.training_queries import (_artifact_dir,
                                                            _cache_root)

    root = f"{tmp_path}/cacheroot"
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", root)
    got = _cache_root()
    assert got == root and os.path.isdir(root)
    assert stat.S_IMODE(os.stat(root).st_mode) == 0o700

    sf = tmp_path / "sf"
    sf.mkdir()
    src = sf / "documents.parquet"
    src.write_bytes(b"A" * 4096)
    st = os.stat(src)
    k1 = _artifact_dir("t", str(sf))
    # same content, same mtime -> same key (cache hit across sessions)
    assert _artifact_dir("t", str(sf)) == k1
    # rewrite with PRESERVED mtime and size -> key must change
    src.write_bytes(b"B" * 4096)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns))
    k2 = _artifact_dir("t", str(sf))
    assert k2 != k1
    # prefix isolation
    assert _artifact_dir("u", str(sf)) != k2

    # directory layout: part files participate, hidden/_SUCCESS ignored,
    # PARTITIONED subdirectories walked (round-7 review: open() on a
    # Date=... subdir raised IsADirectoryError)
    dsf = tmp_path / "dsf"
    (dsf / "documents.parquet" / "Date=2020-01-01").mkdir(parents=True)
    (dsf / "documents.parquet" / "part-00000.parquet").write_bytes(b"P1")
    (dsf / "documents.parquet" / "Date=2020-01-01"
     / "part-00001.parquet").write_bytes(b"N1")
    (dsf / "documents.parquet" / "_SUCCESS").write_bytes(b"")
    d1 = _artifact_dir("t", str(dsf))
    (dsf / "documents.parquet" / "_SUCCESS").write_bytes(b"ignored")
    (dsf / "documents.parquet" / ".hidden.crc").write_bytes(b"ignored")
    assert _artifact_dir("t", str(dsf)) == d1
    (dsf / "documents.parquet" / "Date=2020-01-01"
     / "part-00001.parquet").write_bytes(b"N2")
    assert _artifact_dir("t", str(dsf)) != d1

    # builder-code keying: editing the build function re-keys (round-7
    # review: content-only keys silently served artifacts built by
    # superseded code)
    def build_v1(tmp):
        return ("v1", 200)

    def build_v2(tmp):
        return ("v1", 300)          # constant changed ~ edited logic

    b1 = _artifact_dir("t", str(sf), build_fn=build_v1)
    assert _artifact_dir("t", str(sf), build_fn=build_v1) == b1
    assert _artifact_dir("t", str(sf), build_fn=build_v2) != b1
    assert b1 != _artifact_dir("t", str(sf))    # keyed vs un-keyed differ

    # a callee NAME swap must re-key too (round-7 review: co_code's
    # LOAD_GLOBAL operand index is unchanged, so hashing bytecode alone
    # digested different-callee builders identically)
    def build_g1(tmp):
        return some_builder_fn(tmp)             # noqa: F821 — never called

    def build_g2(tmp):
        return other_builder_fn(tmp)            # noqa: F821 — never called

    assert (_artifact_dir("t", str(sf), build_fn=build_g1)
            != _artifact_dir("t", str(sf), build_fn=build_g2))

    # symlinked cache root is refused outright (round-7 review: a
    # squatter's symlink would redirect artifacts and pass the uid check)
    target = tmp_path / "victim"
    target.mkdir()
    link = f"{tmp_path}/linkroot"
    os.symlink(target, link)
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", link)
    with pytest.raises(RuntimeError, match="symlink"):
        _cache_root()


def test_bpe_merge_fold_property(spark):
    """Property: the Spark fold-expression merge (_apply_merge) equals
    the single-process reference on arbitrary symbol sequences,
    including overlapping runs (a,a,a) and (a,b,a,b) chains."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flow_pipeline_spark.operators.tokenizer import (_apply_merge,
                                                         _py_apply_merge)

    sym = st.sampled_from(["a", "b", "c", "ab", "ba"])
    cases = st.lists(st.lists(sym, min_size=0, max_size=12),
                     min_size=1, max_size=8)

    @settings(max_examples=20, deadline=None)
    @given(cases=cases, pair=st.tuples(sym, sym))
    def check(cases, pair):
        a, b = pair
        df = spark.createDataFrame(
            [(i, syms) for i, syms in enumerate(cases)],
            "id long, syms array<string>")
        got = {r["id"]: r["m"] for r in df.select(
            "id", _apply_merge(F.col("syms"), a, b).alias("m")).collect()}
        for i, syms in enumerate(cases):
            assert got[i] == _py_apply_merge(syms, a, b), (syms, a, b)

    check()


def test_pq_knn_recall_and_determinism(spark):
    """Product-quantization ANN: the ADC scan over 8-byte-per-vector
    codes already clears a recall floor; the standard refine stage
    (exact rerank of the ADC shortlist) recovers brute-force-grade
    recall. Codebooks are deterministic (hash-strided seeds, no RNG)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    brute = {(r["q"], r["n"])
             for r in S.brute_knn(emb, queries, k=5).collect()}

    books = S.pq_train(emb, m=16, ks=64, n_iter=4)
    books2 = S.pq_train(emb, m=16, ks=64, n_iter=4)
    assert books == books2, "codebook training must be deterministic"

    codes = S.pq_encode(emb, books).cache()
    # compression: m int16 codes per vector (m bytes once stored as int8)
    row = codes.first()
    assert len(row["pq_codes"]) == 16
    assert codes.count() == emb.count()

    raw = {(r["q"], r["n"])
           for r in S.pq_knn(codes, queries, books, k=5).collect()}
    refined = {(r["q"], r["n"])
               for r in S.pq_knn(codes, queries, books, k=5,
                                 rerank_with=emb,
                                 shortlist=40).collect()}
    r_raw = len(brute & raw) / len(brute)
    r_ref = len(brute & refined) / len(brute)
    assert r_raw >= 0.4, f"ADC recall {r_raw}"
    assert r_ref >= 0.9, f"refined recall {r_ref}"
    assert r_ref >= r_raw


def test_remove_spans_overlap_chain_edge(spark):
    """Pinned behavior for OVERLAPPING distinct repeated grams (the
    reviewer's adversarial chain): doc 2 is canonical for gram x2..x9
    but non-canonical for x1..x8, so its x1-anchored flagged span takes
    x2..x8 with it — the per-position keep_first guarantee holds (no
    doc's OWN canonical position is flagged) while the 8-gram x2..x9
    survives nowhere intact. Documented in remove_repeated_spans."""
    xs = ["x%d" % i for i in range(1, 10)]          # x1..x9
    corpus = spark.createDataFrame(
        [(1, " ".join(xs[:8])),                      # x1..x8
         (2, " ".join(xs[:9])),                      # x1..x9
         (3, " ".join(xs[1:9]))],                    # x2..x9
        "doc_id long, text string")
    spans = D.repeated_span_table(corpus, k=8)
    flagged = {(r["doc_id"], r["span_start"], r["span_len"])
               for r in spans.collect()}
    # doc 1 canonical for x1..x8: untouched; doc 2 flagged at pos 1
    # (span covers x1..x8); doc 3 fully flagged (x2..x9's min doc is 2)
    assert (2, 1, 8) in flagged
    assert (3, 1, 8) in flagged
    assert all(d != 1 for d, _, _ in flagged)
    texts = {r["doc_id"]: r["text"] for r in
             D.remove_repeated_spans(corpus, spans).collect()}
    assert texts[1] == " ".join(xs[:8])              # canonical intact
    assert texts[2] == "x9"                          # x1..x8 scrubbed
    assert texts[3] == ""                            # fully scrubbed


def test_ivf_pq_recall_reaches_probe_ceiling(spark):
    """IVF-PQ: refined recall must reach the plain-IVF probe ceiling at
    the same nprobe (the refine stage makes PQ compression lossless
    WITHIN probed cells — residual loss is cell-probe misses only, the
    nprobe knob), and strictly dominate the raw ADC scan."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    brute = {(r["q"], r["n"])
             for r in S.brute_knn(emb, queries, k=5).collect()}
    ivf = {(r["q"], r["n"])
           for r in S.ivf_knn(emb, queries, k=5, n_cells=16,
                              nprobe=8).collect()}
    ivfpq = {(r["q"], r["n"])
             for r in S.ivf_pq_knn(emb, queries, k=5, n_cells=16,
                                   nprobe=8, m=16, ks=64,
                                   shortlist=40).collect()}
    raw = {(r["q"], r["n"])
           for r in S.ivf_pq_knn(emb, queries, k=5, n_cells=16,
                                 nprobe=8, m=16, ks=64,
                                 rerank=False).collect()}
    r_ivf = len(brute & ivf) / len(brute)
    r_pq = len(brute & ivfpq) / len(brute)
    r_raw = len(brute & raw) / len(brute)
    assert r_pq >= r_ivf - 1e-9, (r_pq, r_ivf)
    assert r_pq >= 0.6, r_pq
    assert r_pq >= r_raw


def test_bpe_min_freq_prunes_tail_only(spark, docs):
    """The min_freq production knob: pruning the word-frequency tail
    changes the trained merges exactly as the reference trainer with the
    same pruned counts — and with a tail-free corpus it changes nothing."""
    from flow_pipeline_spark.operators import tokenizer as TOK

    sample = docs.filter(F.col("doc_id") < 60)
    freqs = {r["word"]: r["freq"]
             for r in TOK.word_freq_table(sample).collect()}
    pruned = {w: f for w, f in freqs.items() if f >= 3}
    got = TOK.bpe_train(sample, n_merges=6, min_freq=3)
    assert got == TOK.py_bpe_reference(pruned, 6)
    # min_freq=1 is the identity knob
    assert TOK.bpe_train(sample, n_merges=6) == \
        TOK.py_bpe_reference(freqs, 6)


def _py_repeated_spans(texts: dict[int, str], k: int):
    """Independent single-process reference of repeated_span_table
    (keep_first): stride-1 k-gram index -> cross-doc repeated grams ->
    flag positions whose gram exists in a smaller-id doc -> merge
    positions with gap <= k into maximal spans."""
    grams: dict[str, list[int]] = {}
    toks = {d: t.split() for d, t in texts.items()}
    for d, ts in toks.items():
        for p in range(len(ts) - k + 1):
            grams.setdefault(" ".join(ts[p:p + k]), []).append(d)
    spans = set()
    for d, ts in toks.items():
        hits = []
        for p in range(len(ts) - k + 1):
            docs = grams[" ".join(ts[p:p + k])]
            if min(docs) < d:
                hits.append(p + 1)          # 1-based
        hits.sort()
        start = None
        prev = None
        for p in hits:
            if start is None:
                start, prev = p, p
            elif p - prev > k:
                spans.add((d, start, prev + k - 1 - start + 1))
                start, prev = p, p
            else:
                prev = p
        if start is not None:
            spans.add((d, start, prev + k - 1 - start + 1))
    return spans


def test_repeated_spans_property(spark):
    """Property: the distributed span finder equals the reference on
    random corpora with engineered overlaps (small vocab forces shared
    k-grams, shared prefixes/suffixes force span merges)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=14).map(" ".join)
    corpora = st.lists(doc, min_size=2, max_size=6)

    @settings(max_examples=15, deadline=None)
    @given(corpora=corpora)
    def check(corpora):
        texts = {i: t for i, t in enumerate(corpora)}
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id long, text string")
        got = {(r["doc_id"], r["span_start"], r["span_len"])
               for r in D.repeated_span_table(df, k=3).collect()}
        assert got == _py_repeated_spans(texts, 3), texts

    check()


def test_ivf_pq_with_trained_centroids(spark):
    """IVF-PQ accepts kmeans_fit centroids as its coarse quantizer (the
    ivf_knn contract) and still clears the refined-recall floor."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = S.kmeans_fit(emb, n_cells=16, n_iter=2)
    brute = {(r["q"], r["n"])
             for r in S.brute_knn(emb, queries, k=5).collect()}
    got = {(r["q"], r["n"])
           for r in S.ivf_pq_knn(emb, queries, k=5, n_cells=16, nprobe=8,
                                 m=16, ks=64, shortlist=40,
                                 centroids=cents).collect()}
    assert len(brute & got) / len(brute) >= 0.5


def test_incremental_store_lifecycle_end_to_end(spark, docs, tmp_path):
    """The stored-artifact claim made concrete: ingest batch 1, PERSIST
    all three dedup stores (digest / MinHash band / semantic cell) as
    parquet; ingest batch 2 against the read-back stores (exact replays,
    near echoes, semantic near-dups all caught; fresh content passes);
    append batch 2's rows to the stores; batch 3 then dedupes against
    the UNION — history text is never re-read at any step."""
    from flow_pipeline_spark.operators.similarity import (
        hashed_tf_embed_native, incremental_semantic_dedup,
        semantic_store)
    from flow_pipeline_spark.operators.text import normalize_text

    b1 = docs.filter(F.col("doc_id") < 200)
    b2_fresh = docs.filter((F.col("doc_id") >= 200)
                           & (F.col("doc_id") < 260))
    b3_fresh = docs.filter((F.col("doc_id") >= 300)
                           & (F.col("doc_id") < 330))

    digest_p = str(tmp_path / "digests")
    band_p = str(tmp_path / "bands")
    sem_p = str(tmp_path / "semantic")

    # --- ingest 1: curate + persist the three stores -------------------
    (b1.select(F.md5(normalize_text(F.col("text"))).alias("content_hash"))
     .distinct().write.parquet(digest_p))
    D.minhash_band_table(b1, n_hashes=8, bands=4, k=3) \
        .write.parquet(band_p)
    emb1 = hashed_tf_embed_native(b1).select("doc_id", "embedding")
    cents = [(int(r[0]), [float(x) for x in r[1]])
             for r in emb1.orderBy("doc_id").limit(8).collect()]
    semantic_store(emb1, cents, id_col="doc_id") \
        .write.partitionBy("cell").parquet(sem_p)

    # --- ingest 2 against the READ-BACK stores -------------------------
    replays = (b1.filter(F.col("doc_id") < 10)
               .withColumn("doc_id", F.col("doc_id") + 100000))
    echoes = (b1.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
              .select((F.col("doc_id") + 110000).alias("doc_id"),
                      F.concat("text", F.lit(" tail z")).alias("text")))
    batch2 = b2_fresh.unionByName(replays.select(*b2_fresh.columns)) \
        .unionByName(echoes.select(*b2_fresh.columns))

    digests = spark.read.parquet(digest_p)
    survivors = D.incremental_dedup(batch2, digests,
                                    history_is_digests=True)
    ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert not any(200000 > i >= 100000 and i < 110000 for i in ids)
    assert all(i not in ids for i in range(100000, 100010)), \
        "an exact replay survived the persisted digest store"

    bands = spark.read.parquet(band_p)
    near = D.incremental_near_dup(survivors, bands,
                                  n_hashes=8, bands=4, k=3)
    near_ids = {r["new_id"] for r in near.collect()}
    assert len(near_ids & {110000 + i for i in range(10, 20)}) >= 9, \
        "near echoes escaped the persisted band store"

    sem = spark.read.parquet(sem_p)
    emb2 = hashed_tf_embed_native(survivors).select("doc_id", "embedding")
    sem_hits = incremental_semantic_dedup(emb2, sem, cents,
                                          threshold=0.98, id_col="doc_id")
    sem_ids = {r["new_id"] for r in sem_hits.collect()}
    assert len(sem_ids & {110000 + i for i in range(10, 20)}) >= 9, \
        "near echoes escaped the persisted semantic store"
    clean2 = survivors.join(
        near.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id", "left_anti")
    clean2_ids = {r["doc_id"] for r in clean2.select("doc_id").collect()}
    fresh_ids = {r["doc_id"] for r in b2_fresh.select("doc_id").collect()}
    # candidacy-based dropping may catch the odd ORGANIC band collision
    # (callers verify with exact Jaccard when history text is reachable
    # — the jaccard_pairs contract); tolerate a couple, never the bulk
    assert len(fresh_ids & clean2_ids) >= len(fresh_ids) - 2, \
        sorted(fresh_ids - clean2_ids)

    # --- append ingest 2 to the stores; ingest 3 sees the union --------
    (clean2.select(F.md5(normalize_text(F.col("text")))
                   .alias("content_hash"))
     .distinct().write.mode("append").parquet(digest_p))
    replay_of_2 = (b2_fresh.limit(5)
                   .withColumn("doc_id", F.col("doc_id") + 200000))
    batch3 = b3_fresh.unionByName(replay_of_2)
    survivors3 = D.incremental_dedup(
        batch3, spark.read.parquet(digest_p), history_is_digests=True)
    ids3 = {r["doc_id"] for r in survivors3.select("doc_id").collect()}
    assert all(i < 200000 for i in ids3), \
        "a replay of batch 2 survived the appended digest store"
    assert {r["doc_id"] for r in b3_fresh.collect()} <= ids3


# --- ranked retrieval: BM25 / tf-idf -----------------------------------------


def _bm25_reference(texts: dict[int, str], terms: list[str],
                    k1: float = 1.2, b: float = 0.75) -> dict[int, int]:
    """Independent single-process BM25 (same fixed-point contract):
    doc_id -> score_e6, docs with no query-term hit absent."""
    import math
    toks = {d: t.strip().lower().split() for d, t in texts.items()}
    n = len(toks)
    total = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in set(terms)}
    out: dict[int, int] = {}
    for d, v in toks.items():
        s = 0
        for t in set(terms):
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            denom = tf + k1 * (1.0 - b + b * (len(v) * n) / total)
            s += math.floor(idf * (tf * (k1 + 1.0)) / denom * 1e6 + 0.5)
        if s:
            out[d] = s
    return out


def test_bm25_postings_tf_and_dl(spark):
    from flow_pipeline_spark.operators.retrieval import bm25_postings

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "  dog  ")],
        "doc_id long, text string")
    got = {(r.term, r.doc_id): (r.tf, r.dl)
           for r in bm25_postings(docs).collect()}
    assert got == {("cat", 1): (2, 3), ("dog", 1): (1, 3),
                   ("dog", 2): (1, 1)}


def test_bm25_search_matches_independent_reference(spark):
    """Ranking and e6 scores equal an independent single-process BM25
    with the same fixed-point contract; the no-hit doc is absent; the
    length-normalization behavior (tf=1 in a 1-token doc outranks tf=2
    in a 3-token doc at these stats) is asserted explicitly."""
    from flow_pipeline_spark.operators.retrieval import bm25_search

    texts = {1: "cat dog cat", 2: "cat dog bird fish", 3: "cat",
             4: "dog bird"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    ref = _bm25_reference(texts, ["cat"])
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    got = bm25_search(docs, ["cat"], k=10).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    assert [round(r.score * 1e6) for r in got] == [s for _, s in want]
    assert 4 not in {r.doc_id for r in got}
    assert [r.doc_id for r in got][0] == 3  # length norm beats raw tf here

    # multi-term query: per-term contributions add up
    ref2 = _bm25_reference(texts, ["cat", "bird"])
    got2 = bm25_search(docs, ["cat", "bird"], k=10).collect()
    want2 = sorted(ref2.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.doc_id, round(r.score * 1e6)) for r in got2] == want2


def test_tfidf_top_terms_surfaces_planted_rare_term(spark):
    """A term unique to one doc gets maximal idf and must rank first for
    that doc; ubiquitous terms (df=N) keep near-zero weight."""
    from flow_pipeline_spark.operators.retrieval import tfidf_top_terms

    docs = spark.createDataFrame([
        (1, "alpha beta gamma zephyr zephyr"),
        (2, "alpha beta gamma"),
        (3, "alpha beta gamma delta"),
    ], "doc_id long, text string")
    got = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    assert [t for _, t, _ in sorted(by_doc[1])][0] == "zephyr"
    assert [t for _, t, _ in sorted(by_doc[3])][0] == "delta"
    # ranks are 1..k per doc, weights non-increasing within a doc
    for d, rows in by_doc.items():
        rows = sorted(rows)
        assert [r for r, _, _ in rows] == list(range(1, len(rows) + 1))
        assert all(rows[i][2] >= rows[i + 1][2]
                   for i in range(len(rows) - 1))


def test_phrase_match_counts_overlaps_and_repeated_words(spark):
    """Planted phrases: overlapping occurrences each count; a phrase
    with a repeated word needs every slot satisfied; docs missing any
    slot term (or with the terms non-adjacent) are absent."""
    from flow_pipeline_spark.operators.retrieval import phrase_match

    docs = spark.createDataFrame([
        (1, "a b a b a"),       # "a b" at 0 and 2; "a b a" at 0 and 2
        (2, "a x b a"),         # has a and b, never adjacent
        (3, "b a b"),           # "a b" at 1
        (4, "c c c"),           # no phrase terms at all
    ], "doc_id long, text string")
    got = {r.doc_id: r.n_matches
           for r in phrase_match(docs, ["a", "b"]).collect()}
    assert got == {1: 2, 3: 1}
    got3 = {r.doc_id: r.n_matches
            for r in phrase_match(docs, ["a", "b", "a"]).collect()}
    assert got3 == {1: 2}
    got_rep = {r.doc_id: r.n_matches
               for r in phrase_match(docs, ["b", "a", "b"]).collect()}
    assert got_rep == {1: 1, 3: 1}


def test_phrase_match_agrees_with_direct_scan(spark):
    """Index-walk result equals a direct Python sliding-window scan on a
    seeded random corpus — the same independence argument as the DuckDB
    oracle, in-process."""
    import random

    from flow_pipeline_spark.operators.retrieval import phrase_match

    rng = random.Random(7)
    vocab = list("abcdef")
    texts = {i: " ".join(rng.choice(vocab) for _ in range(30))
             for i in range(40)}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    for phrase in (["a", "b"], ["c", "a", "c"], ["e"], ["f", "f"]):
        want = {}
        for d, t in texts.items():
            toks = t.split()
            c = sum(1 for i in range(len(toks) - len(phrase) + 1)
                    if toks[i:i + len(phrase)] == phrase)
            if c:
                want[d] = c
        got = {r.doc_id: r.n_matches
               for r in phrase_match(docs, phrase).collect()}
        assert got == want, phrase


def test_blocklist_flag_is_token_equality_not_substring(spark):
    """'class' must NOT trip a blocklist containing 'ass' (the C4
    substring false positive this operator deliberately avoids); exact
    tokens match case-insensitively."""
    from flow_pipeline_spark.operators.text import blocklist_page_flag

    docs = spark.createDataFrame([
        (1, "the class is full"),     # substring only — clean
        (2, "kick Ass move"),         # exact token, mixed case — blocked
        (3, "nothing here"),          # clean
    ], "doc_id long, text string")
    got = {r.doc_id: r.b for r in docs.select(
        "doc_id", blocklist_page_flag(F.col("text"), ["ass"]).alias("b")
    ).collect()}
    assert got == {1: False, 2: True, 3: False}


def test_bm25_stored_index_pushes_term_filter(spark, tmp_path):
    """The 100 TB story for search: against a PERSISTED postings table
    the query-term filter must reach the parquet scan (PushedFilters),
    and scores from the stored index must equal the in-plan build."""
    from flow_pipeline_spark.operators.retrieval import (bm25_postings,
                                                         bm25_score)

    docs = spark.createDataFrame(
        [(i, f"cat dog w{i} bird" if i % 2 else f"dog w{i} fish")
         for i in range(20)], "doc_id long, text string")
    idx_path = str(tmp_path / "postings")
    bm25_postings(docs).write.parquet(idx_path)
    stored = spark.read.parquet(idx_path)

    scored = bm25_score(stored, ["cat", "fish"])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "In(term, [cat,fish])" in plan or "In(term" in plan, plan

    want = {r.doc_id: r.score_e6
            for r in bm25_score(bm25_postings(docs),
                                ["cat", "fish"]).collect()}
    got = {r.doc_id: r.score_e6 for r in scored.collect()}
    assert got == want and len(got) == 20


def test_bm25_precomputed_stats_matches_in_plan_aggregate(spark):
    """Passing stored (n_docs, total_len) must reproduce the in-plan
    aggregate's scores exactly — the production shortcut that makes
    query cost independent of index size."""
    from flow_pipeline_spark.operators.retrieval import (bm25_postings,
                                                         bm25_score)

    docs = spark.createDataFrame(
        [(i, f"cat dog w{i}") for i in range(12)],
        "doc_id long, text string")
    post = bm25_postings(docs)
    want = {r.doc_id: r.score_e6
            for r in bm25_score(post, ["cat"]).collect()}
    got = {r.doc_id: r.score_e6
           for r in bm25_score(post, ["cat"],
                               corpus_stats=(12, 36)).collect()}
    assert got == want


# --- Unigram LM tokenizer (SentencePiece hard-EM) -----------------------


def _unigram_corpus(spark):
    rows = [
        (1, "low lower lowest newer new"),
        (2, "low low lower newest wider wide"),
        (3, "new newer widest low wide wide"),
        (4, "lowest newest new low lower wide"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_word_freqs(rows):
    from flow_pipeline_spark.operators.text import ascii_words
    wf: dict[str, int] = {}
    for _i, t in rows:
        for w in ascii_words(t.lower()):
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_unigram_qexp_dp_equals_enumeration():
    """The qexp-mode Viterbi DP must equal the global argmin over ALL
    2^(len-1) segmentations under the trainer's total order (u ASC,
    score DESC, n_pieces ASC, pieces lex ASC) — the extension-stability
    property the DuckDB oracle's mask enumeration relies on. Pure
    python, randomized words over a small alphabet so unknown chars,
    rounded-score ties, and piece-length limits all occur."""
    import random

    from flow_pipeline_spark.operators.tokenizer import _viterbi_factory

    rng = random.Random(7)
    alphabet = "abcx"          # 'x' never enters counts -> OOV path
    pieces = ["a", "b", "c", "ab", "ba", "abc", "bc", "cab", "aa"]
    counts = {p: rng.randint(1, 500) for p in pieces}
    total = sum(counts.values())
    big_e = (total * total).bit_length() - 1

    def enumerate_best(word, max_piece_len):
        best = None
        for mask in range(1 << (len(word) - 1)):
            cuts = [0] + [i for i in range(1, len(word))
                          if (mask >> (i - 1)) & 1] + [len(word)]
            segs = [word[cuts[k]:cuts[k + 1]]
                    for k in range(len(cuts) - 1)]
            if any(len(p) > max_piece_len for p in segs):
                continue
            if any(p not in counts and len(p) > 1 for p in segs):
                continue
            u = sum(1 for p in segs if p not in counts)
            ke = sum((counts[p] ** 2).bit_length() - 1
                     for p in segs if p in counts)
            key = (u, -(ke - len(segs) * big_e), len(segs), tuple(segs))
            if best is None or key < best[0]:
                best = (key, segs)
        return best[1]

    seg = _viterbi_factory(counts, 3, scoring="qexp")
    for _ in range(300):
        word = "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(1, 9)))
        assert seg(word) == enumerate_best(word, 3), word

    # max_word_len: overlong words emit themselves whole (WordPiece
    # max_input_chars_per_word), both scoring modes
    capped = _viterbi_factory(counts, 3, scoring="qexp", max_word_len=4)
    assert capped("abcab") == ["abcab"]
    assert capped("abca") == enumerate_best("abca", 3)


def test_unigram_train_matches_reference(spark):
    """The distributed hard-EM trainer must produce the exact same
    {piece: count} model as the independent Fraction-arithmetic
    reference — checks seed, Viterbi ties, coverage floor, and prune
    rules all at once."""
    from flow_pipeline_spark.operators import tokenizer as TOK

    docs = _unigram_corpus(spark)
    wf = _py_word_freqs([(r.doc_id, r.text) for r in docs.collect()])
    for kw in ({"n_iters": 1, "seed_size": 30},
               {"n_iters": 3, "seed_size": 30, "prune_frac": 0.3},
               {"n_iters": 2, "seed_size": 15, "vocab_size": 12,
                "prune_frac": 0.5, "max_piece_len": 4}):
        got = TOK.unigram_train(docs, **kw)
        want = TOK.py_unigram_reference(wf, **kw)
        assert got == want, kw


def test_unigram_encode_matches_reference_segmentation(spark):
    """Corpus encode through the vocab-table path must equal the
    reference Viterbi applied word-by-word in document order."""
    from flow_pipeline_spark.operators import tokenizer as TOK
    from flow_pipeline_spark.operators.text import ascii_words

    docs = _unigram_corpus(spark)
    model = TOK.unigram_train(docs, n_iters=2, seed_size=30)
    seg = TOK._viterbi_factory(model, 6)
    want = {r.doc_id: [p for w in ascii_words(r.text.lower())
                       for p in seg(w)]
            for r in docs.collect()}
    got = {r.doc_id: r.pieces
           for r in TOK.unigram_encode_vocab(docs, model).collect()}
    assert got == want
    # every document reassembles to its original text when pieces concat
    for r in docs.collect():
        assert "".join(want[r.doc_id]) == "".join(
            ascii_words(r.text.lower()))


def test_unigram_encode_unknown_chars_and_empty_docs(spark):
    """Characters never seen in training emit themselves as OOV pieces;
    empty/whitespace-only documents encode to an empty array."""
    from flow_pipeline_spark.operators import tokenizer as TOK

    train = _unigram_corpus(spark)
    model = TOK.unigram_train(train, n_iters=1, seed_size=30)
    probe = spark.createDataFrame(
        [(10, "low zqz low"), (11, "   "), (12, "")],
        "doc_id long, text string")
    got = {r.doc_id: r.pieces
           for r in TOK.unigram_encode_vocab(probe, model).collect()}
    assert got[11] == [] and got[12] == []
    # 'zqz': z and q unseen -> OOV singles; known pieces still segment
    mid = got[10]
    assert "z" in mid and "q" in mid
    joined = "".join(mid)
    assert joined == "lowzqzlow"


def test_unigram_single_chars_survive_aggressive_prune(spark):
    """Coverage invariant: the per-round prune may never remove a
    single-character piece, so any training word stays segmentable."""
    from flow_pipeline_spark.operators import tokenizer as TOK

    docs = _unigram_corpus(spark)
    model = TOK.unigram_train(docs, n_iters=3, seed_size=50,
                              prune_frac=0.9, vocab_size=1)
    chars = {c for r in docs.collect()
             for w in r.text.lower().split() for c in w}
    assert chars <= {p for p in model if len(p) == 1}


def test_ewma_spikes_flags_planted_burst_and_is_gap_correct(spark):
    """A steady 2-events/minute series must not flag; a 10× burst must;
    a bucket right after a GAP must weight only the buckets that exist
    (time-aligned, not positional-lag)."""
    from datetime import datetime, timedelta

    from flow_pipeline_spark.operators.profile import ewma_spikes

    t0 = datetime(2024, 1, 1)
    rows = []
    # steady: minutes 0..9, 2 events each; burst: minute 10, 20 events;
    # gap: minutes 11-14 empty; resume: minute 15, 2 events
    for m in range(10):
        rows += [(t0 + timedelta(minutes=m, seconds=s), "a")
                 for s in (5, 35)]
    rows += [(t0 + timedelta(minutes=10, seconds=s), "a")
             for s in range(20)]
    rows += [(t0 + timedelta(minutes=15, seconds=s), "a") for s in (5, 35)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")

    out = {r.bucket: r for r in ewma_spikes(df).collect()}
    base_min = int(t0.timestamp()) // 60
    steady = out[base_min + 5]
    assert not steady.is_spike and steady.baseline_e4 == 20000
    burst = out[base_min + 10]
    assert burst.is_spike and burst.cnt == 20 \
        and burst.baseline_e4 == 20000
    # the burst enters the NEXT minutes' baselines but nothing flags
    # after it (no post-burst rows until minute 15)
    resume = out[base_min + 15]
    # horizon = minutes 7..14; present: 7(2),8(2),9(2),10(20) with
    # weights 2^(8-d) for d = 15 - m
    num = sum(c * (1 << (8 - d))
              for m, c, d in [(7, 2, 8), (8, 2, 7), (9, 2, 6),
                              (10, 20, 5)])
    den = sum(1 << (8 - d) for d in (8, 7, 6, 5))
    assert resume.baseline_e4 == num * 10000 // den
    assert resume.is_spike == (2 * den > 2 * num) == False
    # first bucket has no history: null baseline, never a spike
    first = out[base_min]
    assert first.baseline_e4 is None and not first.is_spike


def test_merge_postings_equals_full_rebuild(spark):
    """Index maintenance oracle: merging a delta (one NEW doc + one
    RE-CRAWLED doc with changed text) into the base index must equal
    rebuilding from scratch over the final corpus — including the old
    terms of the re-crawled doc disappearing — and the refreshed
    stats must match the rebuilt index's."""
    from flow_pipeline_spark.operators.retrieval import (
        bm25_postings, bm25_score, merge_postings, postings_stats)

    v1 = spark.createDataFrame(
        [(1, "cat dog bird"), (2, "dog fish"), (3, "cat cat owl")],
        "doc_id long, text string")
    v2_delta = spark.createDataFrame(
        [(2, "lizard newt"), (4, "owl dog")],  # 2 re-crawled, 4 new
        "doc_id long, text string")
    final = spark.createDataFrame(
        [(1, "cat dog bird"), (2, "lizard newt"), (3, "cat cat owl"),
         (4, "owl dog")], "doc_id long, text string")

    merged = merge_postings(bm25_postings(v1), bm25_postings(v2_delta))
    want = {tuple(r) for r in bm25_postings(final).collect()}
    got = {tuple(r) for r in merged.collect()}
    assert got == want
    assert ("fish", 2, 1, 2) not in {
        (r.term, r.doc_id, r.tf, r.dl) for r in merged.collect()}
    assert postings_stats(merged) == postings_stats(bm25_postings(final))
    # scores through the merged index + refreshed stats = rebuilt scores
    stats = postings_stats(merged)
    a = {r.doc_id: r.score_e6
         for r in bm25_score(merged, ["dog", "owl"],
                             corpus_stats=stats).collect()}
    b = {r.doc_id: r.score_e6
         for r in bm25_score(bm25_postings(final),
                             ["dog", "owl"]).collect()}
    assert a == b


def test_pagerank_matches_independent_reference(spark):
    """The distributed integer-recurrence PageRank must equal a
    dict-based single-process implementation of the same recurrence,
    and a hub every node links to must outrank everything else."""
    from flow_pipeline_spark.operators.graph import pagerank

    #      1 -> 0 (w2), 2 -> 0 (w1), 3 -> 0 (w1), 2 -> 1 (w3),
    #      0 -> 3 (w1): node 0 is the hub, 3 only gets hub spillover
    edges = [(1, 0, 2), (2, 0, 1), (3, 0, 1), (2, 1, 3), (0, 3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.rank_e9
           for r in pagerank(df, n_iters=3, weight="w").collect()}

    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    base = 10**9 // n
    outw = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0) + w
    r = {v: base for v in nodes}
    for _ in range(3):
        inc = {v: 0 for v in nodes}
        for u, v, w in edges:
            inc[v] += (r[u] * w) // outw[u]
        r = {v: (15 * base + 85 * inc[v]) // 100 for v in nodes}
    assert got == r
    assert max(got, key=lambda v: (got[v], -v)) == 0


def test_pagerank_shuffle_form_equals_broadcast_form(spark):
    """The broadcast_max_nodes gate (VERDICT r5 item #4): above the
    threshold the per-round rank/out-weight joins must NOT force a
    broadcast (a 1e9-node vector would OOM executors) and must produce
    IDENTICAL ranks — the integer recurrence is join-strategy-blind.
    Plan check: the broadcast form's round join is a BroadcastHashJoin,
    the gated form's is not (SortMerge/ShuffledHash)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.graph import pagerank

    df = (spark.range(600)
          .select((F.col("id") % 60).alias("src"),
                  ((F.col("id") * 7 + 3) % 60).alias("dst"),
                  (F.col("id") % 5 + 1).alias("w"))
          .filter(F.col("src") != F.col("dst")))
    bc = pagerank(df, n_iters=2, weight="w")
    sh = pagerank(df, n_iters=2, weight="w", broadcast_max_nodes=10)
    assert {(r.node, r.rank_e9) for r in bc.collect()} == \
           {(r.node, r.rank_e9) for r in sh.collect()}

    def round_plan(threshold):
        # the UNCHECKPOINTED first-round inc plan exposes the join choice
        from flow_pipeline_spark.operators.graph import E9
        e = df.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                      F.col("w").cast("long").alias("w"))
        nodes = (e.select(F.col("u").alias("node"))
                 .unionByName(e.select(F.col("v").alias("node")))
                 .distinct())
        n = nodes.count()
        r = nodes.select("node", F.lit(E9 // n).cast("long").alias("r"))
        outw = e.groupBy("u").agg(F.sum("w").alias("s"))
        small = n <= threshold
        b = (lambda d: F.broadcast(d)) if small else (lambda d: d)
        inc = (e.join(b(r.withColumnRenamed("node", "u")), "u")
               .join(b(outw), "u")
               .select(F.col("v").alias("node"),
                       F.expr("(r * w) div s").alias("c"))
               .groupBy("node").agg(F.sum("c").alias("inc")))
        return inc._jdf.queryExecution().executedPlan().toString()

    # disable Catalyst's size-based auto-broadcast so the plan shows
    # what the GATE does (at real web scale the size estimate exceeds
    # the threshold anyway — this models that): with the hint the join
    # broadcasts regardless; without it, both sides shuffle
    auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "BroadcastHashJoin" in round_plan(10_000_000)
        gated = round_plan(10)
        assert "BroadcastHashJoin" not in gated
        assert ("SortMergeJoin" in gated) or ("ShuffledHashJoin" in gated)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)


def test_funnel_min_chaining_horizon_and_no_backtrack(spark):
    """Planted journeys: in-order user converts; out-of-order user does
    not; a user whose step 2 lands outside the horizon stops at stage
    1; min-chaining never backtracks to a later step-1 event."""
    from datetime import datetime, timedelta

    from flow_pipeline_spark.operators.behavior import funnel

    t0 = datetime(2024, 1, 1)

    def ev(u, typ, mins):
        return (u, typ, t0 + timedelta(minutes=mins))

    rows = [
        # u1: perfect order inside horizon -> stage 3
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 10),
        # u2: click BEFORE view -> stops at stage 1
        ev(2, "click", 0), ev(2, "view", 5), ev(2, "purchase", 2),
        # u3: click after horizon (first view at 0, horizon 60m) ->
        # stage 1 only; the later view at 70 is NOT reconsidered
        ev(3, "view", 0), ev(3, "view", 70), ev(3, "click", 75),
        # u4: view+click inside horizon, no purchase -> stage 2
        ev(4, "view", 0), ev(4, "click", 30),
    ]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, "
                               "ts timestamp")
    got = {r.stage: r for r in
           funnel(df, ["view", "click", "purchase"],
                  horizon_secs=3600).collect()}
    assert got[1].n_users == 4 and got[1].conversion_e4 == 10000
    assert got[2].n_users == 2 and got[2].conversion_e4 == 5000
    assert got[3].n_users == 1 and got[3].conversion_e4 == 2500
    assert [got[s].step for s in (1, 2, 3)] == ["view", "click",
                                                "purchase"]


def test_retention_cohorts_and_ratios(spark):
    """Two cohorts with known weekly activity produce the exact
    retention matrix; k=0 is always 10000."""
    from datetime import datetime, timedelta

    from flow_pipeline_spark.operators.behavior import retention

    week = timedelta(days=7)
    t0 = datetime(2024, 1, 4)  # mid-week; bucket boundaries irrelevant
    rows = []
    # cohort A: users 1-4 first seen week 0; 2 return week 1, 1 week 2
    for u in (1, 2, 3, 4):
        rows.append((u, t0))
    rows += [(1, t0 + week), (2, t0 + week), (1, t0 + 2 * week)]
    # cohort B: users 5-6 first seen week 1; 1 returns week 2
    rows += [(5, t0 + week), (6, t0 + week), (5, t0 + 2 * week)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    got = {(r.cohort, r.k): (r.n_users, r.retained_e4)
           for r in retention(df).collect()}
    cohorts = sorted({c for c, _ in got})
    a, b = cohorts[0], cohorts[1]
    assert b == a + 1
    assert got[(a, 0)] == (4, 10000)
    assert got[(a, 1)] == (2, 5000)
    assert got[(a, 2)] == (1, 2500)
    assert got[(b, 0)] == (2, 10000)
    assert got[(b, 1)] == (1, 5000)
    assert (a, 3) not in got and (b, 2) not in got


def test_write_training_shards_roundtrip_and_manifest(spark, tmp_path):
    """Every document lands in exactly one shard; the returned manifest
    (computed from the written data) equals the manifest of the input;
    re-publishing with different partitioning yields the identical
    manifest (order-independent xor digest)."""
    from flow_pipeline_spark.operators.packing import (shard_manifest,
                                                       write_training_shards)

    docs = spark.createDataFrame(
        [(i, f"doc {i} body w{i % 7} tail") for i in range(200)],
        "doc_id long, text string")
    out = str(tmp_path / "shards")
    man1 = write_training_shards(docs, out)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200
    # shard dirs exist on disk
    assert back.select("shard").distinct().count() > 1

    want = {tuple(r) for r in shard_manifest(docs).collect()}
    got1 = {tuple(r) for r in man1.collect()}
    assert got1 == want
    man2 = write_training_shards(docs.repartition(7), str(tmp_path / "s2"))
    assert {tuple(r) for r in man2.collect()} == want


def test_funnel_matches_bruteforce_on_random_events(spark):
    """Randomized (seeded) cross-check: funnel() must equal a per-user
    Python simulation of min-chaining on arbitrary event soups."""
    import random
    from datetime import datetime, timedelta

    from flow_pipeline_spark.operators.behavior import funnel

    rng = random.Random(42)
    t0 = datetime(2024, 1, 1)
    types = ["a", "b", "c"]
    rows = [(u, rng.choice(types),
             t0 + timedelta(seconds=rng.randrange(100_000)))
            for u in range(30) for _ in range(rng.randrange(0, 12))]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, "
                               "ts timestamp")
    horizon = 20_000
    got = {r.stage: r.n_users
           for r in funnel(df, ["a", "b", "c"],
                           horizon_secs=horizon).collect()}

    by_user = {}
    for u, ty, ts in rows:
        by_user.setdefault(u, []).append((ts, ty))
    counts = [0, 0, 0]
    for evs in by_user.values():
        evs.sort()
        t1 = min((ts for ts, ty in evs if ty == "a"), default=None)
        if t1 is None:
            continue
        counts[0] += 1
        lim = t1 + timedelta(seconds=horizon)
        t2 = min((ts for ts, ty in evs
                  if ty == "b" and t1 < ts <= lim), default=None)
        if t2 is None:
            continue
        counts[1] += 1
        t3 = min((ts for ts, ty in evs
                  if ty == "c" and t2 < ts <= lim), default=None)
        if t3 is not None:
            counts[2] += 1
    assert [got.get(1, 0), got.get(2, 0), got.get(3, 0)] == counts


def test_retention_matches_bruteforce_on_random_events(spark):
    """Randomized (seeded) cross-check of the cohort matrix."""
    import random
    from datetime import datetime, timedelta

    from flow_pipeline_spark.operators.behavior import retention

    rng = random.Random(7)
    t0 = datetime(2024, 1, 1)
    rows = [(u, t0 + timedelta(seconds=rng.randrange(6 * 604_800)))
            for u in range(40) for _ in range(rng.randrange(1, 6))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort, r.k): r.n_users for r in retention(df).collect()}

    buckets = {}
    for u, ts in rows:
        buckets.setdefault(u, set()).add(
            int(ts.timestamp()) // 604_800)
    want = {}
    for u, bs in buckets.items():
        c = min(bs)
        for b in bs:
            want[(c, b - c)] = want.get((c, b - c), 0) + 1
    assert got == want


def test_materialize_sequences_preserves_tokens_and_budget(spark):
    """Every input token appears exactly once across sequences; within
    a shard every sequence except the last spans >= budget tokens; the
    concatenation follows the packer's deterministic-shuffle order."""
    from flow_pipeline_spark.operators.packing import (det_order,
                                                       materialize_sequences)

    docs = spark.createDataFrame(
        [(i, [f"t{i}_{j}" for j in range(5 + i % 7)])
         for i in range(80)], "doc_id long, toks array<string>")
    seqs = materialize_sequences(docs, "toks", 40).collect()

    flat = [t for r in seqs for t in r.tokens]
    want = {f"t{i}_{j}" for i in range(80) for j in range(5 + i % 7)}
    assert len(flat) == len(want) and set(flat) == want
    assert sum(r.n_tokens for r in seqs) == len(want)
    by_shard: dict = {}
    for r in seqs:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.seq)
        for r in shard_rows[:-1]:
            assert r.n_tokens >= 40, r
    # order within a sequence = det_order(doc_id) ascending
    orders = {r.doc_id: r.o for r in docs.select(
        "doc_id", det_order(F.col("doc_id"), ":pack:order").alias("o")
    ).collect()}
    for r in seqs:
        doc_of = [t.split("_")[0][1:] for t in r.tokens]
        seen, last = [], None
        for d in doc_of:
            if d != last:
                seen.append(int(d)); last = d
        assert seen == sorted(seen, key=lambda d: orders[d]), r


def test_read_jsonl_documents_quarantines_corrupt_lines(spark, tmp_path):
    """Well-formed lines (plain AND gzipped files) parse into the doc
    schema; malformed lines land in the quarantine frame raw instead of
    failing the read."""
    import gzip

    from flow_pipeline_spark.sources.jsonl import read_jsonl_documents

    d = tmp_path / "dump"
    d.mkdir()
    (d / "part0.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", '
        '"source": "web"}\n'
        'this is not json at all\n'
        '{"doc_id": 2, "text": "zwei", "lang": "de", "source": "web"}\n')
    with gzip.open(d / "part1.jsonl.gz", "wt") as f:
        f.write('{"doc_id": 3, "text": "trois", "lang": "fr", '
                '"source": "books"}\n'
                '{"broken": \n')

    docs, bad, raw = read_jsonl_documents(spark, str(d))
    got = {r.doc_id: (r.text, r.lang, r.source) for r in docs.collect()}
    assert got == {1: ("hello world", "en", "web"),
                   2: ("zwei", "de", "web"),
                   3: ("trois", "fr", "books")}
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert docs.columns == ["doc_id", "text", "lang", "source"]
    assert raw.is_cached          # the releasable parent both views share
    raw.unpersist()
    assert not raw.is_cached


def _warc_record(rtype: str, uri: str | None, payload: bytes,
                 rec_id: str = "<urn:uuid:1>",
                 date: str = "2026-01-02T03:04:05Z") -> bytes:
    hdr = [f"WARC/1.1", f"WARC-Type: {rtype}",
           f"WARC-Record-ID: {rec_id}", f"WARC-Date: {date}",
           f"Content-Length: {len(payload)}"]
    if uri is not None:
        hdr.insert(2, f"WARC-Target-URI: {uri}")
    if rtype == "conversion":
        hdr.append("Content-Type: text/plain")
    return ("\r\n".join(hdr) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def test_read_warc_wet_and_quarantine(spark, tmp_path):
    """WARC framing (ISO 28500): records parse out of plain AND
    per-record-gzipped (multi-member .gz) archives; WET conversion
    records decode to the (record_id, url, fetch_date, text) view
    (UTF-8 with replacement, never fatal); a truncated record lands in
    the quarantine (error set) without killing the file's earlier
    records or the job."""
    import gzip

    from flow_pipeline_spark.sources.warc import read_warc, wet_documents

    d = tmp_path / "crawl"
    d.mkdir()
    info = _warc_record("warcinfo", None, b"robots: classic\r\n",
                        rec_id="<urn:uuid:0>")
    page1 = _warc_record("conversion", "https://example.com/a",
                         "héllo wörld".encode(), rec_id="<urn:uuid:a>")
    page2 = _warc_record("conversion", "https://example.com/b",
                         b"zwei drei vier", rec_id="<urn:uuid:b>")
    (d / "part0.wet").write_bytes(info + page1 + page2)
    # the standard .warc.gz layout: ONE gzip member PER record
    with open(d / "part1.wet.gz", "wb") as f:
        for rec in (info, page1):
            f.write(gzip.compress(rec))
    # truncated archive: one clean record, then a record whose payload
    # is cut short — earlier record must survive, tail must quarantine
    cut = _warc_record("conversion", "https://example.com/c",
                       b"will be truncated", rec_id="<urn:uuid:c>")
    (d / "part2.wet").write_bytes(page2 + cut[:len(cut) - 12])

    recs = read_warc(spark, str(d)).cache()
    clean = recs.filter(recs.error.isNull())
    bad = recs.filter(recs.error.isNotNull()).collect()
    # 3 + 2 + 1 clean records, 1 quarantined truncation
    assert clean.count() == 6
    assert len(bad) == 1
    assert "truncated payload" in bad[0].error
    assert bad[0].path.endswith("part2.wet")

    wet = wet_documents(recs).collect()
    by_url = {}
    for r in wet:
        by_url.setdefault(r.url, []).append(r)
    assert set(by_url) == {"https://example.com/a",
                           "https://example.com/b"}
    assert by_url["https://example.com/a"][0].text == "héllo wörld"
    assert all(r.fetch_date == "2026-01-02T03:04:05Z" for r in wet)
    # the plain and gzipped copies of page1 decode identically
    assert len(by_url["https://example.com/a"]) == 2
    recs.unpersist()


def test_warc_lenient_paths(spark, tmp_path):
    """The three round-6 review reproductions stay fixed: (a) invalid
    UTF-8 in a conversion payload decodes with U+FFFD replacement
    instead of killing the job; (b) a bare-LF archive (LF record gaps
    AND LF header terminators) parses every record; (c) an LF-header
    record whose PAYLOAD contains CRLFCRLF frames on Content-Length,
    not on the payload's own blank line."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.sources.warc import read_warc, wet_documents

    d = tmp_path / "lenient"
    d.mkdir()
    # (a) invalid UTF-8 payload
    bad = b"ok \xff\xfe tail"
    (d / "bad_utf8.wet").write_bytes(
        _warc_record("conversion", "https://x.test/bad", bad,
                     rec_id="<urn:uuid:bad>"))

    # (b)+(c) bare-LF archive, second record's payload contains CRLFCRLF
    def lf_record(uri, payload, rid):
        hdr = (f"WARC/1.1\nWARC-Type: conversion\n"
               f"WARC-Record-ID: {rid}\n"
               f"WARC-Target-URI: {uri}\n"
               f"WARC-Date: 2026-01-02T03:04:05Z\n"
               f"Content-Length: {len(payload)}\n\n")
        return hdr.encode() + payload + b"\n\n"

    (d / "bare_lf.wet").write_bytes(
        lf_record("https://x.test/1", b"first", "<urn:uuid:l1>")
        + lf_record("https://x.test/2", b"with\r\n\r\nblank", "<urn:uuid:l2>")
        + lf_record("https://x.test/3", b"third", "<urn:uuid:l3>"))

    recs = read_warc(spark, str(d)).cache()
    assert recs.filter(recs.error.isNotNull()).count() == 0
    got = {r.url: r.text for r in wet_documents(recs).collect()}
    assert got["https://x.test/bad"] == "ok �� tail"
    assert got["https://x.test/1"] == "first"
    assert got["https://x.test/2"] == "with\r\n\r\nblank"
    assert got["https://x.test/3"] == "third"
    recs.unpersist()


def test_warc_strip_http_headers(spark):
    """response-record payloads are full HTTP exchanges; the helper
    returns the body after the FIRST blank line (a body containing its
    own blank lines must not be cut), and passes headerless payloads
    through untouched."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.sources.warc import strip_http_headers

    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>a\r\n\r\nb</html>")
    df = spark.createDataFrame(
        [(1, bytearray(http)), (2, bytearray(b"no headers here"))],
        "id int, payload binary")
    got = {r.id: bytes(r.body) for r in
           df.select("id", strip_http_headers(F.col("payload"))
                     .alias("body")).collect()}
    assert got[1] == b"<html>a\r\n\r\nb</html>"
    assert got[2] == b"no headers here"


def test_warc_host_key_normalization(spark):
    """host_key: lowercased host, www. stripped, port dropped, path /
    query ignored; unparseable URLs -> NULL (quota grouping must never
    crash on crawl garbage)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.sources.warc import host_key

    urls = [
        (1, "https://Example.COM/a/b?q=1"),
        (2, "http://www.example.com:8080/x"),
        (3, "https://sub.example.com/"),
        (4, "not a url at all"),
    ]
    df = spark.createDataFrame(urls, "id int, url string")
    got = {r.id: r.h for r in
           df.select("id", host_key(F.col("url")).alias("h")).collect()}
    assert got[1] == "example.com"
    assert got[2] == "example.com"
    assert got[3] == "sub.example.com"   # subdomains stay distinct
    assert got[4] is None


def test_clean_unicode_gate(spark):
    """Crawl-text cleanup: NFKC folds fullwidth/ligature/compatibility
    forms, the JVM scrub drops zero-width/control/soft-hyphen chars and
    maps NBSP to space (including the NBSP that NFKC itself mints from
    a figure space — scrub runs AFTER nfkc), and differently-encoded
    copies of the same page canonicalize identically (why the gate runs
    before dedup)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.text import clean_unicode

    rows = [
        (1, "\uFF28\uFF45\uFF4C\uFF4C\uFF4F\u3000"
            "\uFF57\uFF4F\uFF52\uFF4C\uFF44"),   # fullwidth + ideographic sp
        (2, "ef\uFB01cient \u2460 st"),          # fi ligature + circled one
        (3, "zero\u200Bwidth\u200D gone"),        # ZWSP / ZWJ vanish
        (4, "nb\u00A0sp and\u00ADsoft"),          # NBSP -> space; SHY gone
        (5, "ctrl\x07here\x1f!"),                 # bell + unit separator
        (6, None),
        (7, "Hello world"),                       # twin of row 1
        (8, "a\u2007b"),                          # figure space -> NFKC NBSP
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {r.id: r.c for r in
           df.select("id", clean_unicode(F.col("t")).alias("c")).collect()}
    assert got[1] == "Hello world"
    assert got[2] == "efficient 1 st"
    assert got[3] == "zerowidth gone"
    assert got[4] == "nb sp andsoft"
    assert got[5] == "ctrlhere!"
    assert got[6] is None
    assert got[1] == got[7]                  # twins canonicalize equal
    assert got[8] == "a b"

    # randomized equality vs the stdlib reference: the Spark pipeline
    # must equal unicodedata.normalize -> scrub -> collapse in Python
    import random
    import re
    import unicodedata
    rng = random.Random(42)
    pool = ("ab c\tX \u3000\u200B\u00AD\x07"
            "\uFF31\u2460\uFB01 \u00E9\u6F22 \n\u00A0\u2007")
    samples = ["".join(rng.choice(pool) for _ in range(30))
               for _ in range(60)]

    def ref(s):
        s = unicodedata.normalize("NFKC", s)
        s = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f"
                   "\u200B-\u200D\uFEFF\u00AD]", "", s)
        s = re.sub("[\u00A0\u3000]", " ", s)
        return re.sub(r"\s+", " ", s, flags=re.ASCII).strip()

    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id int, t string")
    out = {r.id: r.c for r in
           sdf.select("id", clean_unicode(F.col("t")).alias("c")).collect()}
    for i, s in enumerate(samples):
        assert out[i] == ref(s), (i, repr(s), repr(out[i]), repr(ref(s)))


def test_write_wet_round_trip(spark, tmp_path):
    """write_wet ∘ (read_warc + wet_documents) is the identity on
    (doc_id-in-record-id, url, text) — including multi-line text with
    embedded blank lines (Content-Length framing, not delimiters), and
    across a repartition (per-partition archives, partition-independent
    union). The wet_ingest registry query extends this to the DuckDB
    oracle at sf scale."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.sources.warc import (read_warc, wet_documents,
                                                  write_wet)

    rows = [(i, f"https://h{i % 3}.test/p{i}",
             f"doc {i}\r\n\r\nwith a blank line\nand ünïcode {i}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = f"{tmp_path}/pub"
    write_wet(df.repartition(5), out)

    import os
    parts = sorted(os.listdir(out))
    assert all(p.endswith(".wet.gz") for p in parts)
    assert 1 <= len(parts) <= 5

    back = wet_documents(read_warc(spark, out))
    got = {r.url: r.text for r in back.collect()}
    assert got == {u: t for _, u, t in rows}
    ids = {r.record_id for r in back.collect()}
    assert ids == {f"<urn:doc:{i}>" for i in range(40)}

    # round-7 review, second pass: a URL carrying bare CR/LF used to be
    # interpolated verbatim into the WARC header block, terminating it
    # early — the reader quarantined at the framing error and DROPPED
    # every later record in the archive. Header values percent-encode
    # control bytes; the payload (Content-Length framed) is untouched.
    hostile = [(100, "http://x.test/a\r\n\r\nWARC-Type: fake", "evil doc"),
               (101, "http://y.test/ok", "benign doc")]
    df2 = spark.createDataFrame(hostile,
                                "doc_id long, url string, text string")
    out2 = f"{tmp_path}/hostile"
    write_wet(df2.coalesce(1), out2)
    back2 = wet_documents(read_warc(spark, out2))
    got2 = {r.record_id: (r.url, r.text) for r in back2.collect()}
    assert len(got2) == 2                    # nothing lost to framing
    assert got2["<urn:doc:101>"] == ("http://y.test/ok", "benign doc")
    assert got2["<urn:doc:100>"][1] == "evil doc"
    assert "\r" not in got2["<urn:doc:100>"][0]
    assert "%0D%0A" in got2["<urn:doc:100>"][0]


def test_read_warc_truncated_gzip_quarantine(spark, tmp_path):
    """A TRUNCATED gzip member raises EOFError and corrupted deflate
    bytes raise zlib.error — neither is an OSError subclass, and the
    round-7 review showed the original OSError-only quarantine let one
    such archive kill the whole ingest job. All three corruption shapes
    (bad magic -> BadGzipFile/OSError, truncation -> EOFError, mid-stream
    garbage -> zlib.error) must quarantine, and a clean sibling archive
    in the same directory must still parse."""
    import gzip

    from flow_pipeline_spark.sources.warc import read_warc

    d = tmp_path / "gzbad"
    d.mkdir()
    rec = _warc_record("conversion", "https://ok.test/a", b"fine page",
                       rec_id="<urn:uuid:ok>")
    (d / "clean.wet.gz").write_bytes(gzip.compress(rec))
    full = gzip.compress(rec)
    (d / "truncated.wet.gz").write_bytes(full[:len(full) // 2])
    corrupt = bytearray(full)
    corrupt[14:20] = b"\xff\x00\xff\x00\xff\x00"   # garbage deflate data
    (d / "corrupt.wet.gz").write_bytes(bytes(corrupt))
    (d / "notgzip.wet.gz").write_bytes(b"plainly not a gzip stream")

    recs = read_warc(spark, str(d)).cache()
    clean = recs.filter(recs.error.isNull()).collect()
    bad = recs.filter(recs.error.isNotNull()).collect()
    assert len(clean) == 1 and clean[0].target_uri == "https://ok.test/a"
    assert len(bad) == 3
    assert all(b.error.startswith("gzip:") for b in bad)
    assert {b.path.rsplit("/", 1)[-1] for b in bad} == {
        "truncated.wet.gz", "corrupt.wet.gz", "notgzip.wet.gz"}
    recs.unpersist()


def test_write_wet_streaming_memory_and_determinism(tmp_path):
    """The WET writer core streams records into the gzip file as the
    iterator yields them — Python-heap peak must be independent of
    partition size (the round-6 review's buffering form held the whole
    framed archive + join copy + gzip output: ~2.3x archive size per
    task). Feed ~30 MB of framed records through a GENERATOR and assert
    the tracemalloc peak stays under 4 MB; also: byte-identical output
    across attempts (gzip mtime pinned — speculative twins publish
    identical archives), empty partition writes nothing, and a
    mid-iteration error removes the tmp."""
    import gzip
    import os
    import tracemalloc

    from flow_pipeline_spark.sources.warc import _stream_wet_records

    n, body = 60_000, "x" * 500

    def rows():
        for i in range(n):
            yield {"text": f"{body} doc {i}", "url": f"https://h.test/{i}",
                   "doc_id": i}

    kw = dict(text_col="text", url_col="url", id_col="doc_id",
              date="2026-01-01T00:00:00Z", gzip_files=True)
    tracemalloc.start()
    tracemalloc.reset_peak()
    assert _stream_wet_records(rows(), f"{tmp_path}/.t1",
                               f"{tmp_path}/a.wet.gz", **kw)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    framed = n * (len(body) + 150)          # ~39 MB through the writer
    assert peak < 4 * 1024 * 1024, (peak, framed)

    # attempt determinism: a second writer over the same rows publishes
    # byte-identical bytes (mtime=0 in the gzip header)
    assert _stream_wet_records(rows(), f"{tmp_path}/.t2",
                               f"{tmp_path}/b.wet.gz", **kw)
    b1 = open(f"{tmp_path}/a.wet.gz", "rb").read()
    assert b1 == open(f"{tmp_path}/b.wet.gz", "rb").read()
    data = gzip.decompress(b1)
    assert data.startswith(b"WARC/1.1\r\n")
    assert data.count(b"WARC-Type: conversion") == n

    # empty partition: no file, returns False
    assert not _stream_wet_records(iter([]), f"{tmp_path}/.t3",
                                   f"{tmp_path}/c.wet.gz", **kw)
    assert not os.path.exists(f"{tmp_path}/c.wet.gz")
    assert not os.path.exists(f"{tmp_path}/.t3")

    # mid-iteration failure: exception propagates, tmp cleaned up,
    # final path never appears
    def exploding():
        yield {"text": "one", "url": "u", "doc_id": 0}
        raise RuntimeError("upstream task failure")

    with pytest.raises(RuntimeError):
        _stream_wet_records(exploding(), f"{tmp_path}/.t4",
                            f"{tmp_path}/d.wet.gz", **kw)
    assert not os.path.exists(f"{tmp_path}/.t4")
    assert not os.path.exists(f"{tmp_path}/d.wet.gz")


def test_warc_host_key_psl(spark):
    """PSL mode: host_key(url, psl) keys by REGISTRABLE domain — longest
    public suffix in the list plus one label; prevailing-* fallback
    (unknown TLD -> last two labels); a host that IS a suffix keys as
    itself; www needs no special-casing (it falls out of the suffix
    math). Default mode (no psl) is unchanged: subdomains distinct."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.sources.warc import host_key

    psl = ["// comment line", "", "co.uk", "com", "uk", "org",
           "*.ck", "!www.ck"]
    cases = [
        (0, "https://shop.Example.co.uk/x", "example.co.uk"),
        (1, "https://www.example.com/p?q=1", "example.com"),
        (2, "https://deep.sub.example.org", "example.org"),
        (3, "https://example.net/x", "example.net"),        # prevailing-*
        (4, "https://a.b.example.net:8443/", "example.net"),
        (5, "https://co.uk/", "co.uk"),                     # host IS suffix
        (6, "https://example.com", "example.com"),
        # wildcard rule: any direct child of ck is a public suffix
        (7, "https://shop.foo.bar.ck/x", "foo.bar.ck"),
        (8, "https://bar.ck/", "bar.ck"),       # host IS a *.ck suffix
        # exception rule: www.ck is registrable despite *.ck
        (9, "https://www.ck/", "www.ck"),
        (10, "https://a.www.ck/", "www.ck"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases],
                               "id int, url string")
    got = {r.id: r.h for r in
           df.select("id", host_key(F.col("url"), psl).alias("h"))
           .collect()}
    assert got == {i: want for i, _, want in cases}
    # default mode unchanged: subdomain-distinct, www-stripped
    plain = {r.id: r.h for r in
             df.select("id", host_key(F.col("url")).alias("h")).collect()}
    assert plain[0] == "shop.example.co.uk"
    assert plain[1] == "example.com"
    assert plain[2] == "deep.sub.example.org"
    # IP-literal hosts (round-7 second pass): no registrable domain —
    # the prevailing-* fallback used to key 1.2.3.4 and 9.8.3.4 both as
    # "3.4", merging unrelated servers into one quota bucket. PSL mode
    # must key them by the full literal, like default mode does.
    ipdf = spark.createDataFrame(
        [(0, "http://1.2.3.4/x"), (1, "http://9.8.3.4/y"),
         (2, "http://1.2.3.4:8080/z")], "id int, url string")
    got_ip = {r.id: r.h for r in
              ipdf.select("id", host_key(F.col("url"), psl).alias("h"))
              .collect()}
    assert got_ip == {0: "1.2.3.4", 1: "9.8.3.4", 2: "1.2.3.4"}


def test_wet_to_curation_composition(spark, tmp_path):
    """End-to-end: the WET frame feeds the existing curation tier with
    zero glue beyond column renames — host_key groups for the
    per-domain cap (quota_sample), then exact_dedup collapses the
    cross-host mirror copies. The crawl-source tier and the
    training-data tier compose."""
    import gzip

    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.dedup import exact_dedup
    from flow_pipeline_spark.operators.packing import quota_sample
    from flow_pipeline_spark.sources.warc import (host_key, read_warc,
                                                  wet_documents)

    d = tmp_path / "crawl2"
    d.mkdir()
    recs = []
    # spam.example floods 5 pages; two hosts mirror the same article
    for i in range(5):
        recs.append(_warc_record(
            "conversion", f"https://spam.example/p{i}",
            f"spam page {i} filler words".encode(),
            rec_id=f"<urn:uuid:s{i}>"))
    recs.append(_warc_record("conversion", "https://a.example/art",
                             b"the shared article body",
                             rec_id="<urn:uuid:m1>"))
    recs.append(_warc_record("conversion", "https://b.example/mirror",
                             b"the shared article body",
                             rec_id="<urn:uuid:m2>"))
    with open(d / "crawl.wet.gz", "wb") as f:
        for r in recs:
            f.write(gzip.compress(r))

    docs = (wet_documents(read_warc(spark, str(d)))
            .withColumn("host", host_key(F.col("url")))
            .withColumnRenamed("record_id", "doc_id"))
    capped = (quota_sample(docs, "host", quota=2, key_col="doc_id")
              .filter(F.col("kept")).drop("rn", "kept"))
    by_host = {r.host: r.n for r in
               capped.groupBy("host").count()
               .withColumnRenamed("count", "n").collect()}
    assert by_host == {"spam.example": 2, "a.example": 1, "b.example": 1}

    unique = exact_dedup(capped, text_col="text", id_col="doc_id")
    texts = sorted(r.text for r in unique.collect())
    # the mirrored article survives exactly once
    assert texts.count("the shared article body") == 1
    assert len(texts) == 3    # 2 spam survivors + 1 article


def test_weighted_sample_proportional_and_deterministic(spark):
    """Across many salts, a row with 50x the weight must be selected
    far more often than a unit-weight row (A-ES proportionality); the
    same salt always returns the identical set; never with
    replacement."""
    from flow_pipeline_spark.operators.packing import weighted_sample

    rows = [(0, 50)] + [(i, 1) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    heavy_hits = 0
    for trial in range(12):
        got = weighted_sample(df, "w", 5, salt=f":t{trial}").collect()
        ids = [r.doc_id for r in got]
        assert len(ids) == 5 and len(set(ids)) == 5
        heavy_hits += 0 in ids
    # P(select heavy) ≈ 1 - prod(1 - 50/(50+…)) ≫ unit rows'; with
    # w=50 vs 39 units the heavy row wins a top-5 slot essentially
    # always — allow slack for the discrete draw
    assert heavy_hits >= 9, heavy_hits

    a = {r.doc_id for r in weighted_sample(df, "w", 5, salt=":x").collect()}
    b = {r.doc_id for r in weighted_sample(
        df.repartition(13), "w", 5, salt=":x").collect()}
    assert a == b


def test_bfs_distances_planted_graph(spark):
    """BFS on a planted graph exercising every rule: a 4-chain (multi-
    hop), a branch (two paths to the same node keep the SHORTER), a
    cycle (terminates; revisits excluded by the visited anti-join),
    and an unreachable island (absent from the result)."""
    from flow_pipeline_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3),          # chain 0-1-2-3
         (0, 4), (4, 3),                  # branch: 3 also via 4 (dist 2 < 3)
         (3, 0),                          # cycle back to source
         (7, 8)],                         # island
        "src long, dst long")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, 0, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 3: 2}


def test_bfs_distances_hop_cap_and_empty_frontier(spark):
    """The hop cap truncates honestly; an isolated source returns just
    itself at dist 0 (frontier drains on round 1)."""
    from flow_pipeline_spark.operators.graph import bfs_distances

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long")
    capped = {r["node"]: r["dist"]
              for r in bfs_distances(chain, 0, max_hops=3).collect()}
    assert capped == {0: 0, 1: 1, 2: 2, 3: 3}
    lone = bfs_distances(chain, 99, max_hops=5).collect()
    assert [(r["node"], r["dist"]) for r in lone] == [(99, 0)]


def test_weighted_sample_excludes_nonpositive_weights(spark):
    """w<=0 and NULL-weight rows must have ZERO inclusion probability —
    before the guard, w=0 produced a NULL rank key that sorted FIRST
    (guaranteed selection, the exact inverse)."""
    from flow_pipeline_spark.operators.packing import weighted_sample

    rows = [(0, 0), (1, -5), (2, None)] + [(i, 1) for i in range(3, 30)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"] for r in weighted_sample(df, "w", 5).collect()}
    assert len(got) == 5
    assert got.isdisjoint({0, 1, 2})


def test_bm25_postings_ignore_blank_documents(spark):
    """Empty/whitespace-only docs contribute nothing: no '' term, no
    n_docs/total_len inflation (tokens('') is [''] — the postings build
    must filter it)."""
    from flow_pipeline_spark.operators.retrieval import (
        bm25_postings, positional_postings, postings_stats)

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "   "), (4, "beta")],
        "doc_id long, text string")
    post = bm25_postings(docs)
    assert post.filter("term = ''").count() == 0
    n_docs, total = postings_stats(post)
    assert (n_docs, total) == (2, 4)        # docs 1 and 4 only
    pos = positional_postings(docs)
    assert pos.filter("term = ''").count() == 0


def test_srp_near_dup_params_edges():
    """Adaptive (r, L) edges (round-7 review, second pass): the growth
    direction (more rows -> more planes), the loud recall-cap warning
    for loose thresholds, and the threshold=-1 boundary — p_plane == 0
    makes every table miss borderline pairs with certainty, which used
    to reach math.log(1.0) and die with ZeroDivisionError instead of
    taking the documented warning path."""
    import warnings

    from flow_pipeline_spark.operators.similarity import (
        srp_near_dup_params)

    r_small, _ = srp_near_dup_params(1_000, 0.999)
    r_big, _ = srp_near_dup_params(1_000_000, 0.999)
    assert r_small == 8                      # floor: historical fixed form
    assert r_big > r_small                   # planes grow with the corpus
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, tables = srp_near_dup_params(100_000, 0.5, max_tables=128)
        assert tables == 128                 # capped, not need=6803
        _, t_edge = srp_near_dup_params(100_000, -1.0, max_tables=128)
        assert t_edge == 128                 # no ZeroDivisionError
    assert sum("srp_near_dup_params" in str(x.message) for x in w) == 2


def test_ann_tie_determinism_and_empty_edges(spark):
    """Round-7 review, second pass: the vectorized kernels' local
    argpartition cut kept an ARBITRARY subset of boundary-tied rows —
    on duplicate-heavy corpora (where 4dp score ties are the norm) the
    returned neighbors depended on Arrow batch layout instead of the
    pinned (score DESC, id ASC) rule. 30 identical vectors, frame
    ordered by DESCENDING id so a position-based selection favors the
    WRONG (largest) ids; and the empty-queries / empty-corpus edges
    brute_knn already handles must not AxisError in the numpy forms."""
    rows = [(int(i), [1.0, 0.5] * 4) for i in range(29, -1, -1)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").coalesce(1)
    queries = corpus.filter(F.col("vec_id") == 0)
    want = {(0, n) for n in range(1, 6)}         # smallest ids win ties

    exact = {(r["q"], r["n"])
             for r in S.brute_knn(corpus, queries, k=5).collect()}
    vec = {(r["q"], r["n"])
           for r in S.brute_knn_vectorized(corpus, queries, k=5).collect()}
    assert exact == want
    assert vec == want

    books = S.pq_train(corpus, m=4, ks=4, n_iter=1)
    codes = S.pq_encode(corpus, books)
    got_pq = {(r["q"], r["n"])
              for r in S.pq_knn(codes, queries, books, k=5).collect()}
    assert got_pq == want                        # all codes tie exactly
    # ...and the result is partitioning-independent
    got_pq7 = {(r["q"], r["n"])
               for r in S.pq_knn(codes.repartition(7), queries, books,
                                 k=5).collect()}
    assert got_pq7 == want

    none = queries.filter(F.col("vec_id") < 0)
    assert S.brute_knn_vectorized(corpus, none, k=3).count() == 0
    assert S.pq_knn(codes, none, books, k=3).count() == 0
    with pytest.raises(ValueError, match="corpus is empty"):
        S.kmeans_fit(corpus.filter(F.col("vec_id") < 0), n_cells=4)


def test_local_topk_tied_matches_full_sort_property():
    """Property: for ANY scores/ids and any take, the tie-correct local
    cut returns exactly the first `take` indices of the full
    (score DESC, id ASC) sort — the contract the vectorized ANN kernels
    (brute/PQ) rely on at their batch boundaries. Scores are drawn from
    a tiny value set so boundary ties are dense (the regime the helper
    exists for)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flow_pipeline_spark.operators.similarity import _local_topk_tied

    @given(st.lists(st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]),
                    min_size=1, max_size=60),
           st.integers(min_value=1, max_value=70),
           st.randoms(use_true_random=False))
    @settings(max_examples=300, deadline=None)
    def check(scores, take, rng):
        col = np.array(scores, dtype="float64")
        ids = np.arange(len(scores), dtype="int64")
        rng.shuffle(ids)                 # ids independent of position
        got = _local_topk_tied(col, ids, take)
        ref = np.lexsort((ids, -col))[:take]
        assert np.array_equal(got, ref), (scores, ids.tolist(), take)

    check()


def test_hdr_safe_properties():
    """_hdr_safe invariants: output never contains C0/DEL bytes (the
    framing-break class), clean strings pass through byte-identical,
    control-character variants of a value stay distinct, and the
    function is idempotent (not reversible — documented)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flow_pipeline_spark.sources.warc import _hdr_safe

    @given(st.text(min_size=0, max_size=80))
    @settings(max_examples=300, deadline=None)
    def check(s):
        out = _hdr_safe(s)
        assert not any(ord(c) < 0x20 or ord(c) == 0x7F for c in out)
        if not any(ord(c) < 0x20 or ord(c) == 0x7F for c in s):
            assert out == s
        assert _hdr_safe(out) == out     # idempotent

    check()
    assert _hdr_safe("a\r\nb") != _hdr_safe("a\nb")   # distinctness kept


def test_bpe_merge_batch_acceptance_is_sequential_exact():
    """Round-11 fuzz: _accept_merge_batch must accept ONLY merges that
    the one-at-a-time argmax-recount loop would have produced, under
    any truncation. Tiny alphabets force constant count ties, symbol
    collisions (a+b == an existing symbol), and overlapping runs — the
    adversarial regime for the batching proof."""
    import random

    from flow_pipeline_spark.operators.tokenizer import (
        END, _accept_merge_batch, _py_apply_merge, py_bpe_reference)

    def batched_train(word_freqs, n_merges, k_limit):
        vocab = {w: list(w[:-1]) + [w[-1] + END] for w in word_freqs if w}
        merges = []
        while len(merges) < n_merges:
            counts = {}
            for w, syms in vocab.items():
                f = word_freqs[w]
                for i in range(len(syms) - 1):
                    counts[(syms[i], syms[i + 1])] = \
                        counts.get((syms[i], syms[i + 1]), 0) + f
            rows = sorted(((a, b, n) for (a, b), n in counts.items()),
                          key=lambda t: (-t[2], t[0], t[1]))[:k_limit]
            if not rows or rows[0][2] <= 0:
                break
            batch = _accept_merge_batch(rows, k_limit,
                                        n_merges - len(merges))
            for a, b in batch:
                merges.append((a, b))
                vocab = {w: _py_apply_merge(s, a, b)
                         for w, s in vocab.items()}
        return merges

    rng = random.Random(20260818)
    multi_accept = 0
    for trial in range(300):
        alpha = "ab" if trial % 3 == 0 else "abc" if trial % 3 == 1 \
            else "abcd"
        words = {"".join(rng.choice(alpha)
                         for _ in range(rng.randint(1, 6))):
                 rng.randint(1, 9)
                 for _ in range(rng.randint(2, 12))}
        n_merges = rng.randint(1, 10)
        want = py_bpe_reference(words, n_merges)
        for k_limit in (4, 64, 4096):
            got = batched_train(words, n_merges, k_limit)
            assert got == want, (words, n_merges, k_limit, got, want)
        # count how often batching actually fires (sanity: the rule is
        # not vacuous)
        vocab = {w: list(w[:-1]) + [w[-1] + END] for w in words if w}
        counts = {}
        for w, syms in vocab.items():
            f = words[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + f
        rows = sorted(((a, b, n) for (a, b), n in counts.items()),
                      key=lambda t: (-t[2], t[0], t[1]))[:4096]
        if rows and len(_accept_merge_batch(rows, 4096, 10)) > 1:
            multi_accept += 1
    assert multi_accept > 0   # the batch rule fires on real inputs


def test_bpe_train_batched_collects_fewer_jobs(spark, monkeypatch):
    """VERDICT r10 item #3's 'fewer jobs at identical merge list': the
    batched pair-table collect must run strictly fewer Spark jobs than
    the one-merge-per-collect loop (_PAIR_COLLECT_LIMIT=1 degrades to
    exactly the classic loop), with a bit-identical merge list."""
    import flow_pipeline_spark.operators.tokenizer as tok

    # a corpus whose top pairs are count-separated enough to batch
    docs = [(i, " ".join(["banana"] * 6 + ["bandana"] * 3 + ["cab"] * 2))
            for i in range(4)] + [(9, "abracadabra banana band")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sc = spark.sparkContext

    def run(group):
        sc.setJobGroup(group, group)
        try:
            merges = tok.bpe_train(df, n_merges=8)
        finally:
            sc.setJobGroup(None, None)
        return merges, len(sc.statusTracker().getJobIdsForGroup(group))

    batched, n_batched = run("bpe-batched")
    monkeypatch.setattr(tok, "_PAIR_COLLECT_LIMIT", 1)
    classic, n_classic = run("bpe-classic")
    assert batched == classic
    assert len(batched) == 8
    assert n_batched < n_classic


def test_encode_vocab_slim_form_matches_join_form(spark):
    """round-11: keep_input_cols=False must return exactly the join
    form's (id, out_col) row set — including wordless docs (empty /
    whitespace-only / NULL text), NULL ids (with and without words),
    and unicode — while eliding the corpus×corpus join-back."""
    import flow_pipeline_spark.operators.tokenizer as TOK

    docs = [(1, "banana band banana"), (2, ""), (3, "   "),
            (4, None), (5, "ab"), (None, "banana ab"), (7, "\t\n"),
            (8, "café banana"), (9, "banana")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = [("a", "n"), ("b", "an")]

    full = {(r["doc_id"], tuple(r["bpe_tokens"]))
            for r in TOK.bpe_encode_vocab(df, merges)
            .select("doc_id", "bpe_tokens").collect()}
    slim_df = TOK.bpe_encode_vocab(df, merges, keep_input_cols=False)
    slim = {(r["doc_id"], tuple(r["bpe_tokens"]))
            for r in slim_df.collect()}
    assert slim == full
    assert slim_df.columns == ["doc_id", "bpe_tokens"]
    # the slim plan must not pay the id-keyed join-back
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        slim_df.explain("formatted")
    assert "SortMergeJoin" not in buf.getvalue()

    model = {"b": 3, "an": 2, "a": 2, "n": 1, "c": 1, "d": 1,
             "f": 1, "é": 1}
    fullu = {(r["doc_id"], tuple(r["pieces"]))
             for r in TOK.unigram_encode_vocab(df, model)
             .select("doc_id", "pieces").collect()}
    slimu = {(r["doc_id"], tuple(r["pieces"]))
             for r in TOK.unigram_encode_vocab(
                 df, model, keep_input_cols=False).collect()}
    assert slimu == fullu
