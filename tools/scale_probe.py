#!/usr/bin/env python
"""Scale probe — measure how the core operators behave as data grows.

sf0.1 correctness says nothing about the 100 TB story; this probe does the
next-best local thing: run each operator class at geometrically increasing
synthetic sizes (4x steps) and report seconds + rows/s per step. An operator
whose plan is scale-sane shows ~flat rows/s (linear time); a quadratic or
skew-cliff plan shows rows/s collapsing at the top step.

Usage: python tools/scale_probe.py [--fast]    (from the repo root)
Prints one JSON line per measurement and a final summary line; SCALE.md
holds a recorded run with analysis.

Probed (one per operator family):
- ingest: generate -> flows_raw MV -> Date-partitioned parquet (the S8 path)
- instant_traffic: time-bucketed expression aggregate over the written raw
- rollup build + routed panel query (A7/D3 pre-aggregation path)
- top_src_ips: render-after-aggregate IP panel (pandas-UDF above the agg)
- srp_near_dup: SRP-bucketed cosine near-duplicate pairs over synthetic
  embeddings — the plane count scales with corpus size (8 -> 16 planes)
  exactly as it must in production to keep per-bucket work bounded
- brute_knn_gemm: Arrow+numpy exact kNN (corpus never shuffles)
- minhash_lsh_dedup: shingle→minhash→band→candidate-verify, to 1M docs
- semantic_dedup: SemDeDup cluster-then-verify, cells scaling linearly
  with the corpus, GEMM assignment + per-cell GEMM verify
- skew_join: one hot key = 50% of an 8M-row fact side — plain sort-merge
  (broadcast + AQE skew split disabled) vs salted_join's explicit spread
- wet_parse (round 6): WARC/WET record framing + text view over growing
  gzipped archive sets — files are the parallelism unit, so records/s
  must stay ~flat as archives multiply
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flow_pipeline_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def median_timed(fn, runs: int = 3) -> float:
    """Warm once (codegen + Python-worker spin-up), then median of `runs`.
    The probe host is shared — single-shot timings swing 2-3x with noisy
    neighbors; medians across interleaved runs keep the RATIOS honest."""
    fn()
    ts = sorted(timed(fn)[0] for _ in range(runs))
    return ts[len(ts) // 2]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def synth_docs(spark, n: int, words: int = 40, vocab: int = 5000,
               planted: int = 50):
    """Deterministic hash-derived documents (`words` tokens from a
    `vocab`-word vocabulary) + `planted` tail-perturbed near-copies
    (ids shifted by 10**9, Jaccard ≈0.9 vs their originals)."""
    text = F.concat_ws(" ", *[
        F.concat(F.lit("w"),
                 (F.abs(F.xxhash64(F.col("id"), F.lit(w))) % vocab)
                 .cast("string"))
        for w in range(words)])
    base = spark.range(n).select(F.col("id").alias("doc_id"),
                                 text.alias("text"))
    copies = (base.filter(F.col("doc_id") < planted)
              .select((F.col("doc_id") + 10**9).alias("doc_id"),
                      F.concat(F.col("text"), F.lit(" zz tail zz"))
                      .alias("text")))
    return base.unionByName(copies)


def synth_embeddings(spark, n: int, dim: int = 64, planted: int = 20):
    """Deterministic hash-derived embeddings + `planted` exact duplicates
    (ids shifted by 10**9) so near-dup recovery is checkable at any n."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: ((F.xxhash64(F.col("id"), d) % 2000) / 1000.0 - 1.0)
            .cast("float")).alias("embedding"))
    copies = (base.filter(F.col("vec_id") < planted)
              .select((F.col("vec_id") + 10**9).alias("vec_id"), "embedding"))
    return base.unionByName(copies)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="halve the top step (CI-friendly)")
    args = ap.parse_args()

    spark = get_spark("scale-probe")
    results = []

    def record(op, n, sec, planted_ok=None):
        row = {"op": op, "n": n, "sec": round(sec, 2),
               "rows_per_sec": round(n / max(sec, 1e-9))}
        if planted_ok is not None:
            row["planted_recovered"] = planted_ok
        results.append(row)
        print(json.dumps(row), flush=True)

    from flow_pipeline_spark.operators.rollup import (
        rollup_flat, route_traffic_query)
    from flow_pipeline_spark.operators.similarity import (
        brute_knn_vectorized, cosine_near_dup_pairs)
    from flow_pipeline_spark.plans.flow_queries import (
        instant_traffic, top_src_ips)
    from flow_pipeline_spark.sources.mocker import flows_raw, synthetic_flows

    flow_steps = [1_000_000, 4_000_000, 8_000_000 if args.fast else 16_000_000]
    d = tempfile.mkdtemp(prefix="fps_scale_")
    try:
        for n in flow_steps:
            raw_dir = f"{d}/raw_{n}"

            def ingest():
                (flows_raw(synthetic_flows(spark, n))
                 .write.mode("overwrite").partitionBy("Date")
                 .parquet(raw_dir))
            record("ingest", n, median_timed(ingest))
            raw = spark.read.parquet(raw_dir)

            record("instant_traffic", n,
                   median_timed(lambda: force(instant_traffic(raw))))
            record("top_src_ips", n,
                   median_timed(lambda: force(top_src_ips(raw, k=10))))

            rollup_dir = f"{d}/rollup_{n}"
            record("rollup_build", n, median_timed(
                lambda: rollup_flat(raw).write
                .mode("overwrite").parquet(rollup_dir)))
            rollup = spark.read.parquet(rollup_dir)
            record("routed_panel", n, median_timed(
                lambda: force(route_traffic_query(raw, rollup, ["SrcAS"]))))
            shutil.rmtree(raw_dir, ignore_errors=True)
            shutil.rmtree(rollup_dir, ignore_errors=True)

        # embeddings: plane count grows with corpus so per-bucket work stays
        # bounded — the production knob, exercised here
        emb_steps = [(20_000, 8), (80_000, 12),
                     (160_000 if args.fast else 320_000, 16)]
        for n, planes in emb_steps:
            emb = synth_embeddings(spark, n)
            emb_cached = emb.localCheckpoint(eager=True)  # isolate op cost

            def near_dup():
                return cosine_near_dup_pairs(
                    emb_cached, threshold=0.999, bucketed=True,
                    n_planes=planes)
            record(f"srp_near_dup_p{planes}", n,
                   median_timed(lambda: force(near_dup())),
                   planted_ok=(near_dup().count() >= 20))

            q = emb_cached.filter(F.col("vec_id") < 10)
            record("brute_knn_gemm", n, median_timed(
                lambda: force(brute_knn_vectorized(emb_cached, q, k=5))))

        # SemDeDup-style semantic dedup: cell count scales LINEARLY with
        # the corpus (bounded ~40-vector cell occupancy keeps the verify
        # join's pair count ~ 20·n instead of n²/2) and assignment runs
        # the GEMM path — the two production knobs for this operator.
        from flow_pipeline_spark.operators.similarity import (
            semantic_dedup_pairs)
        sem_steps = [(20_000, 500), (80_000, 2_000),
                     (160_000 if args.fast else 320_000, 8_000)]
        for n, cells in sem_steps:
            emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
            cents = [(int(r[0]), [float(x) for x in r[1]])
                     for r in emb.orderBy("vec_id").limit(cells).collect()]

            def sem():
                return semantic_dedup_pairs(
                    emb, threshold=0.999, centroids=cents,
                    vectorized=True)
            sec = median_timed(lambda: force(sem()))
            found = sem().filter(F.col("id_b") >= 10**9).count()
            record(f"semantic_dedup_c{cells}", n, sec,
                   planted_ok=(found >= 20))

        # MinHash-LSH dedup (the flagship training-tier operator) over
        # synthetic documents — xxhash64 family (the production mode; md5
        # exists only for the cross-engine oracle)
        from flow_pipeline_spark.operators.dedup import (
            jaccard_pairs, minhash_lsh_candidates)
        doc_steps = ([20_000, 80_000, 160_000] if args.fast
                     else [20_000, 80_000, 240_000, 1_000_000])
        for n in doc_steps:
            docs = synth_docs(spark, n).localCheckpoint(eager=True)

            def lsh_dedup():
                cands = minhash_lsh_candidates(docs, n_hashes=8, bands=4,
                                               k=3, hash_fn="xxhash64")
                return jaccard_pairs(docs, k=3, threshold=0.5,
                                     candidates=cands)
            sec = median_timed(lambda: force(lsh_dedup()))
            found = lsh_dedup().filter(F.col("id_b") >= 10**9).count()
            record("minhash_lsh_dedup", n, sec, planted_ok=(found >= 50))

        # exact-substring (repeated-span) dedup: stride-1 k-gram
        # fingerprints — the heaviest shuffle of the dedup tier (one fp
        # row per token position, ~40n rows here), bounded by |distinct
        # k-grams| via map-side partials. The planted copies embed their
        # originals verbatim, so each must surface as a >=40-token span.
        from flow_pipeline_spark.operators.dedup import repeated_span_table
        for n in doc_steps:
            docs = synth_docs(spark, n).localCheckpoint(eager=True)

            def spans():
                return repeated_span_table(docs, k=8, hash_fn="xxhash64")
            sec = median_timed(lambda: force(spans()))
            found = (spans()
                     .filter((F.col("doc_id") >= 10**9)
                             & (F.col("span_len") >= 40)).count())
            record("exact_substring_spans", n, sec, planted_ok=(found >= 50))

        # BPE induction: the corpus pass is the only corpus-sized work;
        # merge rounds operate on the vocab table (5k synthetic words —
        # CONSTANT as the corpus grows), so time stays flat while the
        # corpus grows 12x. (Merges themselves are NOT expected to be
        # identical across steps: word frequencies are sampled, so
        # near-tied pair counts flip with corpus size — determinism is
        # per-corpus, pinned against the reference trainer in pytest.)
        from flow_pipeline_spark.operators.tokenizer import bpe_train
        for n in doc_steps[:3]:
            docs = synth_docs(spark, n, planted=0).localCheckpoint(
                eager=True)
            t0 = time.perf_counter()
            merges = bpe_train(docs, n_merges=4)
            record("bpe_train_4merges", n, time.perf_counter() - t0,
                   planted_ok=(len(merges) == 4))

        # Bloom membership dedup (round 5, dedup.py:bloom_build/
        # bloom_incremental_dedup): the bitmap is FIXED-SIZE per fpp —
        # build cost is one treeAggregate pass, probe cost is per-row
        # with zero shuffle. Probed with the whole corpus as replays
        # (everything must drop — the no-false-negative side).
        from flow_pipeline_spark.operators.dedup import (
            bloom_build, bloom_incremental_dedup)
        from flow_pipeline_spark.operators.text import normalize_text
        for n in doc_steps[:3]:
            docs = synth_docs(spark, n, planted=0).localCheckpoint(
                eager=True)
            digests = docs.select(
                F.md5(normalize_text(F.col("text")))
                .alias("content_hash")).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            bloom = bloom_build(digests, n_items=n, fpp=0.01)
            build_sec = time.perf_counter() - t0
            record("bloom_build", n, build_sec)
            sec = median_timed(lambda: force(
                bloom_incremental_dedup(docs, bloom)))
            survivors = bloom_incremental_dedup(docs, bloom).count()
            record("bloom_probe_replays", n, sec,
                   planted_ok=(survivors == 0))

        # line-level dedup (round 5, dedup.py:dedup_lines): shared
        # boilerplate lines planted on every doc; the frequency shuffle
        # is |distinct lines|-bounded, the scrub per-row.
        from flow_pipeline_spark.operators.dedup import dedup_lines
        for n in doc_steps[:3]:
            pages = (synth_docs(spark, n, planted=0)
                     .withColumn("text", F.concat(
                         F.col("text"),
                         F.lit("\nAll rights reserved."),
                         F.when(F.col("doc_id") % 3 == 0,
                                "\nSubscribe to our newsletter.")
                         .otherwise("")))
                     .localCheckpoint(eager=True))
            sec = median_timed(lambda: force(dedup_lines(pages)))
            leaked = (dedup_lines(pages)
                      .filter(F.col("text").contains("rights reserved"))
                      .count())
            record("line_dedup", n, sec, planted_ok=(leaked == 0))

        # vocab-table BPE ENCODER (round 5, tokenizer.py:bpe_encode_vocab):
        # Python cost is |vocab|-bounded (each DISTINCT word encodes once)
        # while corpus tokens stay JVM-side — per-doc encode throughput
        # must hold or rise as the corpus grows 12x over a fixed vocab.
        from flow_pipeline_spark.operators.tokenizer import bpe_encode_vocab
        enc_merges = bpe_train(
            synth_docs(spark, doc_steps[0], planted=0), n_merges=4)
        for n in doc_steps[:3]:
            docs = synth_docs(spark, n, planted=0).localCheckpoint(
                eager=True)
            sec = median_timed(lambda: force(
                bpe_encode_vocab(docs, enc_merges)
                .select("doc_id", F.size("bpe_tokens").alias("n_syms"))))
            record("bpe_encode_vocab", n, sec)

        # ranked retrieval (round 5, operators/retrieval.py): the index
        # build pays the one corpus-wide (term, doc) groupBy — linear.
        # QUERY-time work against the PERSISTED index (the production
        # shape: term filter = pushed parquet predicate) is bounded by
        # the query terms' postings lists, so query seconds grow with
        # |matching postings| (~0.8% of docs/term here), never with the
        # index build. phrase_match is probed end-to-end (build + walk).
        from flow_pipeline_spark.operators.retrieval import (
            bm25_postings, bm25_score, phrase_match)
        ret_d = tempfile.mkdtemp(prefix="fps_retr_")
        try:
            q_terms = ["w1", "w2", "w3", "w4"]
            for n in doc_steps[:3]:
                docs = synth_docs(spark, n, planted=0).localCheckpoint(
                    eager=True)
                idx_dir = f"{ret_d}/postings_{n}"
                sec = median_timed(
                    lambda: bm25_postings(docs).write
                    .mode("overwrite").parquet(idx_dir))
                record("bm25_index_build", n, sec)
                stored = spark.read.parquet(idx_dir)
                sec = median_timed(
                    lambda: force(bm25_score(stored, q_terms)))
                record("bm25_query_stored_index", n, sec)
                sec = median_timed(
                    lambda: force(phrase_match(docs, q_terms[:2])))
                record("phrase_match_build_walk", n, sec)
        finally:
            shutil.rmtree(ret_d, ignore_errors=True)

        # product-quantization ANN: codebooks train once per step (m=16
        # subspaces in one mapInPandas pass per round), the corpus scans
        # as 16-byte codes. Measures the ADC+refine query path; recall
        # floor asserted against planted duplicates (identical vectors
        # get identical codes, ADC score = max, refine keeps them).
        from flow_pipeline_spark.operators.similarity import (
            ivf_pq_knn, pq_encode, pq_knn, pq_train)
        for n in [(20_000), (80_000), (160_000 if args.fast else 320_000)]:
            emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
            books = pq_train(emb, m=16, ks=64, n_iter=3)
            codes = pq_encode(emb, books).localCheckpoint(eager=True)
            q = emb.filter(F.col("vec_id") < 10)

            def pq_query():
                return pq_knn(codes, q, books, k=5, rerank_with=emb,
                              shortlist=40)
            sec = median_timed(lambda: force(pq_query()))
            # planted duplicates of the 10 query vectors must surface
            got = (pq_query()
                   .filter((F.col("n") == F.col("q") + 10**9)).count())
            record("pq_adc_refine_knn", n, sec, planted_ok=(got >= 9))

        # EWMA spike baseline (round 5, operators/profile.py): one
        # partial+final count aggregate over the raw rows + an 8-literal
        # explode over the AGGREGATED table — per-row cost must FALL as
        # rows/bucket grow (the aggregate dominates, the baseline join
        # is |keys|x|buckets|-bounded).
        from flow_pipeline_spark.operators.profile import ewma_spikes
        for n in [1_000_000, 4_000_000, 8_000_000 if args.fast
                  else 16_000_000]:
            ev = spark.range(n).select(
                (F.col("id") % 8).cast("string").alias("event_type"),
                F.timestamp_seconds(
                    F.lit(1_600_000_000) + (F.col("id") % 600_000))
                .alias("ts"))
            sec = median_timed(lambda: force(ewma_spikes(ev)))
            record("ewma_spikes", n, sec)

        # PageRank (round 5, operators/graph.py): 3 integer rounds over
        # a synthetic power-law-ish edge table; per-round cost is one
        # edge shuffle + a broadcast rank vector, so edges/s should stay
        # ~flat as the edge table grows at fixed node share.
        from flow_pipeline_spark.operators.graph import pagerank
        for n in [250_000, 1_000_000, 4_000_000]:
            k = max(n // 100, 10)
            edges = spark.range(n).select(
                (F.col("id") % k).alias("src"),
                ((F.col("id") * 7 + 1) % k).alias("dst"))
            sec = median_timed(
                lambda: force(pagerank(edges, n_iters=3)))
            record("pagerank_3iter", n, sec)

        # Unigram-LM vocab-table encoding (round 5): model trained once
        # on the smallest step; Python Viterbi cost is |distinct words|-
        # bounded, so corpus docs/s must RISE with corpus size exactly
        # like bpe_encode_vocab.
        from flow_pipeline_spark.operators import tokenizer as TOK
        uni_model = None
        for n in doc_steps[:3]:
            docs = synth_docs(spark, n, planted=0).localCheckpoint(
                eager=True)
            if uni_model is None:
                uni_model = TOK.unigram_train(
                    docs.limit(5_000), n_iters=1, seed_size=500,
                    vocab_size=300)
            sec = median_timed(lambda: force(
                TOK.unigram_encode_vocab(docs, uni_model)
                .select("doc_id", F.size("pieces").alias("n_pieces"))))
            record("unigram_encode_vocab", n, sec)

        # Unigram-LM trainer (round 5): like bpe_train, every EM round
        # touches only the vocab-bounded word table (5k synthetic words,
        # CONSTANT as the corpus grows) — wall time must stay flat or
        # fall while the corpus grows 12x.
        for n in doc_steps[:3]:
            docs = synth_docs(spark, n, planted=0).localCheckpoint(
                eager=True)
            t0 = time.perf_counter()
            TOK.unigram_train(docs, n_iters=2, seed_size=500,
                              vocab_size=300)
            record("unigram_train_2iter", n, time.perf_counter() - t0)

        # behavioral tier (round 5, operators/behavior.py): funnel is
        # |steps|-1 joins over SHRINKING survivor sets after pushed-
        # filter aggregates; retention reduces to DISTINCT (user,
        # bucket) first. Both must be aggregate-bound: flat wall as
        # events grow.
        from flow_pipeline_spark.operators.behavior import funnel, retention
        etypes = ["view", "click", "purchase", "error", "signup"]
        for n in [1_000_000, 4_000_000,
                  8_000_000 if args.fast else 16_000_000]:
            ev = spark.range(n).select(
                (F.col("id") % (n // 50)).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in etypes]),
                    (F.abs(F.xxhash64("id")) % 5 + 1).cast("int"))
                .alias("event_type"),
                F.timestamp_seconds(
                    F.lit(1_600_000_000) + (F.col("id") * 37) % 2_000_000)
                .alias("ts"))
            sec = median_timed(lambda: force(
                funnel(ev, ["view", "click", "purchase"],
                       horizon_secs=86_400)))
            record("funnel_3step", n, sec)
            sec = median_timed(lambda: force(retention(ev)))
            record("retention_weekly", n, sec)

        # -State/-Merge family (round 5, operators/rollup.py): build is
        # one partial-aggregated shuffle (linear in rows, distincts
        # reduce map-side), and every read from stored states — exact
        # segment overlap here — touches only state rows, so read time
        # must stay FLAT as the event history grows at fixed
        # cardinality ("users who did A and B" without re-scanning).
        from flow_pipeline_spark.operators.rollup import (
            bitmap_set_cardinalities, bitmap_state)
        n_users = 200_000
        for n in [1_000_000, 4_000_000,
                  8_000_000 if args.fast else 16_000_000]:
            ev = spark.range(n).select(
                F.when(F.col("id") % 3 == 0, "a").otherwise("b")
                .alias("seg"),
                (F.abs(F.xxhash64("id")) % n_users).alias("user_id"))
            sec = median_timed(lambda: force(
                bitmap_state(ev, ["seg"], "user_id")))
            record("bitmap_state_build", n, sec)
            st = bitmap_state(ev, ["seg"], "user_id") \
                .localCheckpoint(eager=True)
            a = st.filter(F.col("seg") == "a").select("chunk", "vals")
            b = st.filter(F.col("seg") == "b").select("chunk", "vals")
            sec = median_timed(lambda: force(
                bitmap_set_cardinalities(a, b)))
            record("bitmap_overlap_read", n, sec)

        # skewed-key join: one hot key owns 50% of the fact side. The salt
        # spreads the hot key over n_salts tasks (operators/scale.py) — the
        # explicit fix for when AQE's runtime skew split doesn't apply (it
        # only fires on sort-merge stages it can re-plan). Probed with
        # broadcast + AQE skew-handling OFF so the straggler is visible.
        from flow_pipeline_spark.operators.scale import salted_join
        n_fact, n_keys = 8_000_000, 100_000
        fact = spark.range(n_fact).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.abs(F.xxhash64("id")) % n_keys).alias("key"),
            (F.col("id") % 997).alias("v")).localCheckpoint(eager=True)
        other = spark.range(n_keys).select(
            F.col("id").alias("key"), (F.col("id") % 13).alias("w"))
        saved = {k: spark.conf.get(k) for k in
                 ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.skewJoin.enabled")}
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            assert (salted_join(fact, other, "key").count()
                    == fact.join(other, "key").count())
            record("skew_join_plain", n_fact, median_timed(
                lambda: force(fact.join(other, "key", "inner"))))
            record("skew_join_salted", n_fact, median_timed(
                lambda: force(salted_join(fact, other, "key", n_salts=32))))
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

        # WARC/WET source (round 6, sources/warc.py): one binaryFile task
        # per archive, one linear parse pass per file — records/s must
        # hold ~flat as the archive count grows 16x. Archives are
        # whole-file gzip members (the parser also handles the
        # per-record-member layout; the gz path is what's probed).
        import gzip as _gzip

        from flow_pipeline_spark.sources.warc import read_warc, wet_documents
        per_file = 4000
        filler = "lorem " * 20
        for n in [50_000, 200_000,
                  400_000 if args.fast else 800_000]:
            # record the MATERIALIZED count: integer division truncated
            # 50,000 to 12 files x 4,000 = 48,000 records while rows/s
            # divided by the nominal n, inflating the smallest step's
            # throughput ~4% vs the evenly-dividing steps (round-7
            # review) — that bias is exactly what a flat-scaling probe
            # must not carry
            n = (n // per_file) * per_file
            wdir = f"{d}/warc_{n}"
            os.makedirs(wdir, exist_ok=True)
            for fi in range(n // per_file):
                buf = []
                for ri in range(per_file):
                    payload = (f"doc {fi}:{ri} {filler}").encode()
                    hdr = (f"WARC/1.1\r\nWARC-Type: conversion\r\n"
                           f"WARC-Record-ID: <urn:uuid:{fi}-{ri}>\r\n"
                           f"WARC-Target-URI: https://h{fi}.test/p{ri}\r\n"
                           f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                           f"Content-Length: {len(payload)}\r\n\r\n")
                    buf.append(hdr.encode() + payload + b"\r\n\r\n")
                with open(f"{wdir}/part{fi}.wet.gz", "wb") as f:
                    f.write(_gzip.compress(b"".join(buf), 1))
            sec = median_timed(lambda: force(
                wet_documents(read_warc(spark, wdir))))
            record("wet_parse", n, sec)
            shutil.rmtree(wdir, ignore_errors=True)

        # Unicode cleanup gate (round 6, text.py:clean_unicode): the NFKC
        # step is the deliberate Arrow-batched Python edge — per-row cost
        # must stay flat (rows/s growing until cores saturate, then
        # holding) as the corpus grows 16x.
        from flow_pipeline_spark.operators.text import clean_unicode
        for n in [250_000, 1_000_000,
                  2_000_000 if args.fast else 4_000_000]:
            txt = spark.range(n).select(
                F.concat(F.lit("Ｄｏｃ　"),
                         F.col("id").cast("string"),
                         F.lit(" body​ with junk ﬁ end"))
                .alias("t")).localCheckpoint(eager=True)
            sec = median_timed(lambda: force(
                txt.select(clean_unicode(F.col("t")).alias("c"))))
            record("clean_unicode", n, sec)
            txt.unpersist()
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
