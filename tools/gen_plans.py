#!/usr/bin/env python
"""Regenerate PLANS.md — physical-plan audit of the headline queries.

Usage: python tools/gen_plans.py > PLANS.md   (run from the repo root)
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flow_pipeline_spark.plans import QUERIES  # noqa: E402
from flow_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NOTES = {
  "instant_traffic_1m": "partial+final agg; shuffle carries one row per minute bucket",
  "top_talkers": "TakeOrderedAndProject: per-partition top-k, driver merges k*P rows — no global sort",
  "time_filtered_scan": "both predicates reach the scan (PushedFilters); scalar subquery stays a broadcast, not a collect",
  "enrichment_join": "nation/region broadcast; single custkey shuffle",
  "revenue_top_customers": "lineitem pre-aggregated to per-orderkey revenue before any join",
  "rollup_5m": "one shuffle on the 4-part rollup key, map-side partials",
  "minhash_lsh_dedup": "band-key groupBy + streamed pair Generates (round 9: the former band self-join planned the signature pipeline twice); exact Jaccard verification restricted to LSH candidates",
  "knn_cosine": "queries broadcast; corpus scan embarrassingly parallel; two-phase top-k",
  "asof_enrichment": "union + last-ignorenulls window: ONE shuffle on the key, no range explosion",
  "user_sessions": "one user_id exchange reused by lag window, cumulative sum, and final group-by",
  "corpus_curation": "only wide ops: 32-byte-digest dedup shuffle + 2-group aggregate",
  "tpch_q1": "ship-date filter pushed to scan; 8 aggregates in one partial+final pass",
  "part_type_revenue": "part dimension broadcast; lineitem never shuffles before aggregation",
  "customers_no_orders": "anti join: probe streams through, only non-matches emitted",
  "local_supplier_volume": "6-table Q5 topology: broadcast supplier dim chain, co-nation residual, one orderkey/custkey shuffle spine",
  "embedding_near_dup": "SRP-bucketed pair join on the (table, signature) key — no CartesianProduct / all-pairs; (planes, tables) adapt to the corpus count (srp_near_dup_params) so bucket occupancy and candidate volume stay LINEAR (the round-7 realistic-sf1 probe caught the fixed-8-plane form at ~100x candidates on 10x vectors); distinct collapses multi-table hits on (id, id, cos) rows, vectors never re-shuffle",
  "ngram_jaccard_dups": "LSH candidates verified with array_intersect on doc-id joins after a left-semi prune to candidate docs (verification work proportional to the candidate set, round 7); no shuffle ever partitions on the shingle",
  "flows_top_src_ips": "render-AFTER-aggregate: ArrowEvalPython sits above the raw (addr,Etype) HashAggregate, UDF input = |distinct addrs|",
  "flows_pg_src_ip_panel": "Go-render panel, same two-level agg: raw-bytes partials below the Arrow boundary",
  "metrics_rate_sum_by": "one series-key exchange reused by lag, bucket agg, and sliding frame; sum-by re-aggregates tiny rows",
  "approx_top_talkers": "Misra-Gries sketch: shuffle bounded at capacity summary rows per partition, independent of key cardinality",
  "benchmark_contamination": "benchmark shingle set broadcast; corpus-side overlap count partial-aggregates before one narrow shuffle",
  "repetition_stats": "pure per-row expressions — the whole gate is one codegen'd scan, zero shuffle",
  "partitioned_day_scan": "day predicate lands in PartitionFilters: non-matching day directories are pruned at listing time, zero IO — the toDate($dateFilter) partition trick at any scale",
  "incremental_dedup": "history collapses to DISTINCT digests before the anti-join; the batch side shuffles 32-byte digests only (broadcast anti-join when the digest set is small)",
  "quality_classifier": "the whole model is one codegen'd projection — weights constant-folded, zero shuffle, zero UDF",
  "semantic_dedup": "centroid assignment is map-side against one array literal; the verify self-join shuffles on the cell id, never a CartesianProduct",
  "doc_perplexity": "trained vocab broadcasts to the scoring join — the exploded corpus never shuffles on the token; the only wide op is the per-doc partial aggregate",
  "mixture_sample": "one narrow generator explode (x-ceil-rate) + a per-row hash gate — zero shuffle; the ORDER BY exists only for the oracle",
  "incremental_near_dup": "both sides reduce to band rows before the join; history text never appears in any exchange — the store IS the band table",
  "exact_substring_spans": "stride-1 fp generator is narrow; the corpus-wide shuffle is the fp groupBy (min/max doc partials map-side); islands window sees HIT positions only — no suffix array, no global sort, documents never shuffle whole",
  "flows_routed_traffic": "the routed arm re-aggregates stored-rollup-shaped partials straight into the requested bucket — one shuffle, raw rows never re-scanned when the rollup is persisted (plan-tested in test_routed_query_scans_stored_rollup_not_raw)",
  "text_semantic_dedup": "the embed is one partial-aggregating shuffle of (doc, dim, count) triples — at most dim rows per doc, tokens never cross the wire; then the semantic_dedup cell-join shape",
  "incremental_semantic_dedup": "new batch assigns map-side against the centroid literal; the verify join shuffles on the cell id against the STORE — history never re-embeds or re-assigns",
  "gopher_rules": "all five rules are one codegen'd projection over the scan — zero shuffle, zero UDF",
  "c4_line_filter": "split-lines -> per-line rules -> reassemble, one per-row projection; the only exchange is the final ORDER BY for the oracle",
  "curation_full_pipeline": "per-row gates fuse into the scan; the ExactSubstr stage adds ONE corpus-wide shuffle (partial-aggregated fp groupBy) + a hits-only window; then the digest dedup shuffle, broadcast benchmark shingles, 2-group aggregate",
  "ann_pq_adc_exact": "quantize is a map-side projection; codebooks and queries broadcast (8 + 10 rows); codes come from a (vec, subspace) window over |corpus|*ks*m tiny rows; ADC join ships (vec, j, code) rows only — the corpus embedding column never shuffles",
  "bpe_encode_corpus": "corpus tokens stay JVM-side: explode -> broadcast word->subwords join -> per-doc reassembly groupBy (the only shuffle); Python runs once per DISTINCT word in the vocab frame",
  "bpe_encode_stored": "the PRODUCTION tokenize plan (train-once/encode-many): identical encode shape to bpe_encode_corpus but the merge table reads from the persisted model artifact — NO trainer rounds in-plan, so the plan is pure encode cost (mirror of bm25_search_stored)",
  "dsir_importance": "both LM vocab tables broadcast to the scoring join; the exploded corpus never shuffles on the token — the only wide ops are the two vocab-bounded LM aggregates and the per-doc partial aggregate",
  "line_dedup": "one line-bounded frequency shuffle (map-side distinct first); each doc's own duplicated lines come back as a small array on a doc-id join; the line filter is a per-row higher-order function — the global dup-line set never collects or broadcasts",
  "bloom_dedup": "ZERO-shuffle query plan: the bitmap (built once via treeAggregate, outside this plan) ships via an explicit SparkContext broadcast — once per executor, not per job (round 7); membership is a per-row ArrowEvalPython filter over the scan — the anti-join exchange is gone entirely",
  "table_profile": "ALL five columns' aggregates compute in ONE partial+final aggregate over one scan; the per-column rows unpivot from the 1-row result (explode of a struct array) — no per-column rescans",
  "token_length_drift": "two bin-bounded aggregates (10 rows each) + broadcast joins for the totals — the snapshots never co-shuffle; the PSI arithmetic is a codegen'd projection over 10 rows",
  "filtered_knn": "label equi-join composes BEFORE scoring (broadcast queries); at scale the corpus partitions by the filter column so the join becomes partition pruning; two-phase top-k as in knn_cosine",
  "bm25_search": "postings build is the one corpus-wide shuffle (partial-aggregated (term,doc) groupBy); the query-term filter cuts before scoring (a pushed parquet filter on a STORED index), df and corpus stats ride broadcasts, ranking is TakeOrderedAndProject",
  "bm25_search_stored": "the PRODUCTION retrieval plan: NO Generate, NO corpus-wide aggregate — the term isin filter pushes into the parquet scan of the term-clustered stored index (file + row-group pruning), stored (n_docs,total_len) is a 1-row literal broadcast, df a |terms|-row broadcast, ranking TakeOrderedAndProject; query cost independent of index size",
  "phrase_match": "slot table (|phrase| rows) broadcasts onto the positional index; only docs containing a phrase term reach the per-doc aggregate, carrying position arrays, never text — the start-set intersection is a fold over <=|phrase| small arrays per doc",
  "traffic_spikes": "raw table shuffles ONCE (the count aggregate); the EWMA baseline explodes 8 (offset,weight) literals over the AGGREGATED table and re-groups — fixed-lag equi-join, never a range join; spike verdict is a codegen'd integer comparison",
  "nation_trade_pagerank": "per-round: ONE edge shuffle (incoming-mass groupBy on dst) + broadcast rank vector and out-weights — broadcast is SIZE-GATED (broadcast_max_nodes, default 10M): past it both joins fall back to shuffle joins, equality+plan pytested; the 4-table edge build broadcasts dims; integer recurrence is codegen'd — no float agg, no driver matrix",
  "funnel_steps": "each stage: type filter pushed to the scan -> min-per-user aggregate -> user-keyed join against a SHRINKING survivor set; conversion ratios read from 1-row broadcast counts — event rows never fan out",
  "user_retention": "raw rows reduce to DISTINCT (user, bucket) in one partial-aggregated shuffle; cohort min reuses the same keys; the offset join runs over per-user rows with a broadcast cohort-size side",
  "cdc_latest_state": "rank-1 compaction compiles to WindowGroupLimit Partial below / Final above ONE key exchange — each task's sort buffer holds one row per key, never the key's history; no join, no second scan",
  "time_gapfill": "per-key grid = sequence+explode over the key-bounded bounds aggregate (narrow Generate, rows = dashboard range); fill join + LOCF window run on AGGREGATED rows — raw events shuffle at most twice, no calendar cross join",
  "wet_ingest": "crawl-archive source tier: one binaryFile task per WET archive feeding ONE Arrow-batched mapInPandas (record framing — the only Python, linear per file); the sole exchange is the final per-host aggregate; at CC scale parallelism = archive count, which is the point",
  "ann_ivf_pq_knn": "the full IVF-PQ query plan: codebook training is per-round mapInPandas partials (corpus never shuffles; driver sees m*ks*d_sub sums); at query time the codes table joins the BROADCAST probe map on cell, ADC is an Arrow gather over (m)-byte codes, the refine join ships candidate ids only — embeddings never shuffle anywhere",
  "unigram_pieces": "hard-EM over the WORD table only: per round the vocab-bounded frame passes once through the Arrow segmenter (|distinct words| calls, corpus-size-independent) and one piece-count aggregate; the corpus is touched once for word counts; the per-round collect is the MODEL (kmeans-centroid pattern)",
  "ann_ivf_pq_stored": "the SERVING IVF-PQ plan: NO trainer rounds, NO encode — the scan reads the cell-partitioned stored codes table behind the broadcast probe join (partition pruning = the inverted-list seek), ADC is one Arrow gather, the refine join ships 40 candidate ids per query; query cost independent of index build",
}


def main() -> None:
    spark = get_spark("plans")
    print("# PLANS — physical-plan audit of the headline queries")
    print()
    print("Auto-generated from `.explain('formatted')` at sf0.1 (regenerate:")
    print("`python tools/gen_plans.py > PLANS.md`); plan-shape regressions are")
    print("enforced by `tests/test_plans.py`. For each query: the operator tree")
    print("plus the scan and join evidence that the 100 TB story rests on —")
    print("pruned ReadSchema, pushed filters, broadcast vs shuffle joins,")
    print("partial aggregation, top-k strategy.")
    print()
    for name, note in NOTES.items():
        df = QUERIES[name].spark(spark, SF)
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        tree = s.split("\n\n")[0].replace("== Physical Plan ==\n", "")
        scans = re.findall(r"ReadSchema: (\S+)", s)
        pushed = re.findall(r"PushedFilters: (\[.*?\])", s)
        bcasts = len(re.findall(r"BroadcastHashJoin", s))
        smj = len(re.findall(r"SortMergeJoin", s))
        shj = len(re.findall(r"ShuffledHashJoin", s))
        exch = len(re.findall(r"\(\d+\) Exchange", s))
        top = "yes" if "TakeOrderedAndProject" in s else "no"
        print(f"## {name}")
        print()
        print(f"*{note}*")
        print()
        print("```")
        print(tree.strip())
        print("```")
        stats = [f"exchanges={exch}", f"broadcast_joins={bcasts}",
                 f"sortmerge_joins={smj}", f"shuffledhash_joins={shj}",
                 f"take_ordered_top_k={top}"]
        print(f"- {', '.join(stats)}")
        for sc in dict.fromkeys(scans):
            print(f"- scan: `{sc}`")
        for p in dict.fromkeys(pushed):
            if p != "[]":
                print(f"- pushed filters: `{p}`")
        for pf in dict.fromkeys(re.findall(r"PartitionFilters: (\[.*?\])", s)):
            if pf != "[]":
                print(f"- partition filters: `{pf}`")
        print()


if __name__ == "__main__":
    main()
