"""Physical-plan regression tests — the scale contract.

Correctness tests prove the small-SF answer; these prove the *plan* is the
one that survives a 100 TB / 1000-executor scale-up: dimension joins stay
broadcast (no shuffle of the fact side), scans prune columns and push
predicates, aggregates run partial→final, top-k uses TakeOrderedAndProject
instead of a global sort. A regression here is a silent 10-100× cliff at
scale even though every value still matches the oracle.
"""

from __future__ import annotations

import re

import pytest

from flow_pipeline_spark.plans import QUERIES

from .conftest import SF_DIR


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    cache: dict[str, str] = {}

    # These tests pin the PRODUCTION plan shape. The scale-adaptive
    # small-scan fan-out (sources/tables.py:fan_out_small_scan) fires on
    # the one-row-group test files but is a no-op on any production-scale
    # scan, so it is disabled here — otherwise its local round-robin
    # Exchange (which deliberately carries whole documents at test scale)
    # would mask the at-scale invariants ("text never crosses an
    # Exchange"). The device itself is pinned by test_fan_out_small_scan*.
    from flow_pipeline_spark.sources.tables import FAN_OUT_CONF

    def get(name: str) -> str:
        if name not in cache:
            old = spark.conf.get(FAN_OUT_CONF, "true")
            spark.conf.set(FAN_OUT_CONF, "false")
            try:
                cache[name] = _executed_plan(
                    QUERIES[name].spark(spark, SF_DIR))
            finally:
                spark.conf.set(FAN_OUT_CONF, old)
        return cache[name]

    return get


def test_enrichment_join_is_broadcast(plans):
    """J1: customer→nation→region dim chain must broadcast every dim —
    a SortMergeJoin here shuffles the fact table once per dim at scale."""
    p = plans("enrichment_join")
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_revenue_join_broadcasts_small_sides(plans):
    """customer/orders are the small sides vs lineitem; Catalyst+AQE must
    pick broadcast, not shuffle, for them."""
    p = plans("revenue_top_customers")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_topk_uses_take_ordered(plans):
    """O2: ORDER BY agg DESC LIMIT k must plan TakeOrderedAndProject
    (per-partition heap + driver merge), never a global Sort of all groups."""
    p = plans("top_talkers")
    assert "TakeOrderedAndProject" in p


def test_top_talkers_prunes_columns(plans):
    """Column pruning: a 2-column aggregate over events must not read the
    other columns (ReadSchema in the scan limited to user_id, value)."""
    p = plans("top_talkers")
    schemas = [ln.split("ReadSchema:", 1)[1] for ln in p.splitlines()
               if "ReadSchema:" in ln]
    assert schemas, p
    sl = " ".join(schemas)
    assert "user_id" in sl and "value" in sl
    assert "event_type" not in sl and "ts:" not in sl


def test_equality_predicate_pushdown(plans):
    """P6: event_type = 'click' must reach the parquet reader as a pushed
    filter (row-group skipping at scale), not a post-scan Filter only."""
    p = plans("time_filtered_scan")
    assert "PushedFilters: [" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("event_type" in ln and "click" in ln for ln in pushed), pushed


def test_aggregate_is_partial_then_final(plans):
    """A1: sum/avg aggregates must be map-side partial + reduce-side final
    (two HashAggregate nodes around one shuffle) — the shuffle carries one
    row per (partition, group), not one per input row."""
    p = plans("tpch_q1")
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") <= 2  # one for agg, one optional for sort


def test_rollup_5m_single_shuffle(plans):
    """A4/W4: the 5-minute rollup must aggregate with exactly one shuffle
    on the full group key; re-partitioning per sub-key would multiply
    shuffle volume at 100 TB."""
    p = plans("rollup_5m")
    agg_exchanges = [ln for ln in p.splitlines()
                     if "Exchange hashpartitioning" in ln]
    assert len(agg_exchanges) <= 1, agg_exchanges


def test_scans_are_vectorized(spark, plans):
    """Tungsten contract: every parquet scan in the headline plans runs the
    vectorized (Batched: true) reader, and the executed (AQE-final) plan
    wraps the pipeline in whole-stage codegen."""
    for name in ["instant_traffic_1m", "tpch_q1", "top_talkers"]:
        p = plans(name)
        assert "Batched: true" in p, name
        # AQE annotates codegen only once the plan is final — force it by
        # executing this exact DataFrame's query execution (tiny at sf0.001)
        df = QUERIES[name].spark(spark, SF_DIR)
        df.collect()
        final = _executed_plan(df)
        # codegen stages render as "*(n) Operator" in the final plan
        assert re.search(r"\*\(\d+\)", final), (name, final)


def test_knn_broadcasts_queries_not_corpus(spark):
    """ANN: the k query vectors broadcast against the corpus — broadcasting
    the corpus (the 100 TB side) would OOM every executor."""
    p = _executed_plan(QUERIES["knn_cosine"].spark(spark, SF_DIR))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_embedding_near_dup_is_bucketed_not_all_pairs(plans):
    """The registered embedding near-dup query must run the SRP-bucketed
    path: an equi-join on the signature bucket — an all-pairs crossJoin
    (CartesianProduct / BroadcastNestedLoopJoin) is a scale-killer at
    corpus size (|corpus|² pair evaluations)."""
    p = plans("embedding_near_dup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the bucket equi-join must exist
    assert "Join" in p and "sig" in p


def test_ngram_jaccard_runs_on_candidates_not_inverted_index(plans):
    """The registered n-gram Jaccard query must verify LSH candidates only:
    a shingle-inverted-index self-join shuffles on the shingle key and is
    quadratic in hot-shingle document frequency — one stop-shingle at
    corpus scale explodes the join. No Exchange may partition on shingle."""
    p = plans("ngram_jaccard_dups")
    assert "hashpartitioning(shingle" not in p


@pytest.mark.parametrize("name", ["flows_top_src_ips", "flows_top_dst_ips",
                                  "flows_pg_src_ip_panel",
                                  "flows_pg_dst_ip_panel"])
def test_ip_panels_render_after_aggregate(plans, name):
    """The IP panels' IPv6/Go render is a pandas UDF; it must sit ABOVE the
    first (raw-key) HashAggregate so its input is |distinct addrs|, not
    |rows| — a UDF in the scan-side group key sends every raw row across
    the Arrow boundary at 100× scale."""
    p = plans(name)
    assert "ArrowEvalPython" in p or "BatchEvalPython" in p, p
    udf_pos = p.find("ArrowEvalPython")
    if udf_pos < 0:
        udf_pos = p.find("BatchEvalPython")
    # plan prints top-down: a HashAggregate BELOW (after) the UDF node is
    # the raw-key pre-aggregation feeding it
    assert "HashAggregate" in p[udf_pos:], p
    # and the two-level shape: raw-key partial+final, string-key partial+final
    assert p.count("HashAggregate") >= 4, p


def test_analyst_sql_surface(spark):
    """SURVEY §3.3 — the interactive surface: register the warehouse as
    views and answer a dashboard query via spark.sql, identical to the
    DataFrame builder's result."""
    from flow_pipeline_spark.plans import QUERIES
    from flow_pipeline_spark.sources.tables import register_views

    register_views(spark, SF_DIR)
    sql_out = spark.sql("""
        SELECT user_id, round(sum(value), 4) AS sum_value, count(*) AS n
        FROM events GROUP BY user_id
        ORDER BY sum_value DESC, user_id ASC LIMIT 10
    """)
    df_out = QUERIES["top_talkers"].spark(spark, SF_DIR)
    assert [r.asDict() for r in sql_out.collect()] == \
           [r.asDict() for r in df_out.collect()]
    # DESCRIBE works over the registered views (D2)
    cols = {r["col_name"] for r in spark.sql("DESCRIBE events").collect()}
    assert {"ts", "user_id", "value"} <= cols


def test_partitioned_day_scan_prunes_partitions(plans):
    """P5 pruning: the day predicate must land in PartitionFilters (pruned
    at the directory listing, zero IO for other days) — NOT as a data
    filter, and the scan must read only the referenced columns."""
    plan = plans("partitioned_day_scan")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in plan:\n{plan}"
    assert "day" in m.group(1) and "2024-01-05" in m.group(1), m.group(1)
    # the pruning predicate must not degrade into a post-scan Filter node
    assert not re.search(r"\bFilter .*\bday\b", plan), plan
    rs = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert rs and "event_type" in rs.group(1) and "value" in rs.group(1)
    assert "props" not in rs.group(1), rs.group(1)


def test_ivf_pq_stored_scan_has_dynamic_cell_pruning(plans):
    """Round-10: the stored IVF-PQ codes table is parquet PARTITIONED BY
    cell — the on-disk inverted lists. The probed-cell restriction must
    reach the codes scan as a PartitionFilter so a query batch
    physically reads only its probed cell directories — the
    inverted-list seek; a plan that scans all cells and filters
    post-join would re-read the whole index per query batch at scale.
    Since the fused-ADC rewrite the filter is a STATIC `cell INSET ...`
    (the collected probe map closes over the kernel), which prunes at
    PLAN time — stronger than the former runtime
    dynamicpruningexpression through the broadcast probe join."""
    plan = plans("ann_ivf_pq_stored")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in plan:\n{plan}"
    assert "cell" in m.group(1), m.group(1)
    assert ("INSET" in m.group(1) or "dynamicpruning" in m.group(1)), \
        m.group(1)


def test_doc_perplexity_vocab_broadcasts(plans):
    """The LM scoring join must BROADCAST the trained vocabulary: a
    shuffle join on the token key would re-partition the exploded corpus
    (40x row blowup) by token — hot stopwords make that a skew cliff at
    scale. No Exchange may partition on the token."""
    p = plans("doc_perplexity")
    assert "BroadcastHashJoin" in p
    # exactly ONE token-key exchange is legitimate: the vocab count itself
    # (partial-aggregated, so it carries one row per distinct token per
    # partition — vocab-bounded). The scoring join must not add another.
    assert len(re.findall(r"hashpartitioning\(tok", p)) == 1


def test_incremental_dedup_ships_digests_not_documents(plans):
    """The anti-join's build side must be the DISTINCT-digest projection
    of history — if document text appeared in any Exchange, each ingest
    would re-shuffle the historical corpus instead of 32-byte digests."""
    p = plans("incremental_dedup")
    assert "LeftAnti" in p
    for exch in re.findall(r"Exchange [^\n]*", p):
        assert "text" not in exch, exch


def test_semantic_dedup_registered_query_no_cross_join(plans):
    """The windowed semantic_dedup query joins on the cell id — never a
    CartesianProduct (the all-pairs scale-killer the cells exist to
    avoid)."""
    p = plans("semantic_dedup")
    assert "CartesianProduct" not in p


def test_exact_substring_spans_no_doc_shuffle_no_cartesian(plans):
    """The repeated-span plan must never shuffle documents whole (only
    16/8-byte fingerprints + positions cross the wire) and never go
    all-pairs: no Exchange carries the text/token column, no
    CartesianProduct, and the fp aggregate runs partial map-side
    (min/max-doc partial rows, the vocab-bounded shape)."""
    p = plans("exact_substring_spans")
    assert "CartesianProduct" not in p
    for exch in re.findall(r"Exchange [^\n]*", p):
        assert "text" not in exch, exch
    # specifically the fp aggregate's map-side partial, not any
    # 'partial' anywhere in the plan (round-7 review: the lowercase
    # fallback matched every plan with any partial aggregate)
    assert "partial_min" in p


def test_routed_query_scans_stored_rollup_not_raw(spark, tmp_path):
    """§4 routing, physical evidence: given a PERSISTED flows_5m rollup,
    the routed plan's only FileScan is the rollup directory — raw files
    never appear (the 1e-4-cost path a 100 TB dashboard depends on).
    The windowed flows_routed_traffic oracle proves routed ≡ raw
    values; this pins the plan side of the claim."""
    from flow_pipeline_spark.operators.rollup import (route_traffic_query,
                                                      rollup_flat)
    from flow_pipeline_spark.sources.mocker import (flows_raw,
                                                    synthetic_flows)

    raw_dir = str(tmp_path / "raw")
    rollup_dir = str(tmp_path / "flows_5m")
    flows_raw(synthetic_flows(spark, 5000, seed=7)) \
        .write.partitionBy("Date").parquet(raw_dir)
    raw = spark.read.parquet(raw_dir)
    rollup_flat(raw).write.parquet(rollup_dir)
    rollup = spark.read.parquet(rollup_dir)

    routed = route_traffic_query(raw, rollup, ["SrcAS"], interval_s=600)
    p = _executed_plan(routed)
    # the scan's ReadSchema is the rollup's (Timeslot + pre-aggregated
    # sums); no raw-schema column (TimeReceived) is ever read
    assert "Timeslot:timestamp" in p
    assert "TimeReceived" not in p
    unrouted = route_traffic_query(raw, None, ["SrcAS"], interval_s=600)
    assert "TimeReceived" in _executed_plan(unrouted)


def test_bm25_broadcasts_stats_and_df_takeordered_topk(plans):
    """BM25: the 1-row corpus stats must ride a broadcast (never a
    SortMergeJoin that shuffles postings per lookup side), per-term df
    must be a count WINDOW over the term-filtered hits — not a
    broadcast join against a second derivation of the postings
    pipeline (round-10: the join form re-tokenized the whole corpus;
    the plan must hold exactly ONE Generate, i.e. one tokenize
    pipeline) — and the final ranking must be TakeOrderedAndProject,
    not a global sort."""
    p = plans("bm25_search")
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("Generate") == 1   # one tokenize+explode pipeline
    assert "Window" in p              # df(term) via count window


def test_cdc_compaction_pushes_top1_into_sort(plans):
    """ReplacingMergeTree compaction: the rank-1 filter must compile to
    WindowGroupLimit (Partial below the exchange, Final above), so each
    task keeps ONE row per key in its sort buffer instead of the key's
    whole history — the difference between O(keys) and O(log) memory at
    100 TB. One key exchange, no join."""
    p = plans("cdc_latest_state")
    assert p.count("WindowGroupLimit") == 2   # Partial + Final
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_gapfill_grid_is_narrow_generator(plans):
    """WITH FILL densification: the per-key grid must come from
    sequence+explode over the key-bounded bounds aggregate (a narrow
    Generate — rows = dashboard range), never a CartesianProduct with a
    calendar table; the fill join must not introduce a second
    corpus-wide exchange on the raw rows."""
    p = plans("time_gapfill")
    assert "Generate explode(sequence" in p
    assert "CartesianProduct" not in p
    # raw events shuffle at most twice (bounds agg + bucket agg);
    # everything above runs on aggregated rows
    assert p.count("Exchange hashpartitioning") <= 2


def test_kmv_state_build_keeps_k_rows_per_key_map_side(spark):
    """KMV sketch build: the min-k rank must compile to WindowGroupLimit
    with the Partial stage BELOW the key exchange — only k rows per key
    per input partition ever shuffle, so the build never materializes a
    key's full distinct-hash set (the property that makes O(k) states
    buildable over 10^10-distinct columns). Pinned on the state build
    itself: the registered overlap query localCheckpoints the state
    table (the stored-state stand-in), which hides the build behind a
    Scan ExistingRDD in ITS plan."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import kmv_state

    df = spark.range(10_000).select(
        (F.col("id") % 5).cast("string").alias("k"),
        F.col("id").alias("v"))
    p = _executed_plan(kmv_state(df, ["k"], "v", k=64))
    assert "WindowGroupLimit [k" in p
    assert ", Partial" in p and ", Final" in p
    # Partial limit must appear below (after, in printed order) the key
    # exchange line it feeds
    ex = p.index("Exchange hashpartitioning(k")
    assert ", Partial" in p[ex:]


def test_fan_out_small_scan_spreads_one_row_group_input(spark, tmp_path):
    """Scale-adaptive input fan-out (guide §2.5 'input skew'): a parquet
    file whose scan yields fewer partitions than the session's
    parallelism — the unsplittable one-row-group test-file layout — is
    round-robin repartitioned up to parallelism, so narrow heavy stages
    (signature folds, tokenize explodes, Arrow kernels) use every core.
    The conf kill-switch restores the bare scan (how the production plan
    tests above pin the at-scale no-shuffle shapes)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.sources.tables import (FAN_OUT_CONF,
                                                    fan_out_small_scan)

    path = str(tmp_path / "one_group.parquet")
    spark.range(1000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() == 1
    want = spark.sparkContext.defaultParallelism

    fanned = fan_out_small_scan(spark.read.parquet(path), spark, path)
    assert fanned.rdd.getNumPartitions() == want
    # results are the fan-out-invariant frame, just spread out
    assert fanned.agg(F.sum("id")).first()[0] == 1000 * 999 // 2

    old = spark.conf.get(FAN_OUT_CONF, "true")
    spark.conf.set(FAN_OUT_CONF, "false")
    try:
        bare = fan_out_small_scan(spark.read.parquet(path), spark, path)
        assert bare.rdd.getNumPartitions() == 1
    finally:
        spark.conf.set(FAN_OUT_CONF, old)


def test_fan_out_small_scan_noops_on_well_split_input(spark, tmp_path):
    """The fan-out decision derives from the actual scan layout: an
    input that already yields >= parallelism splits (any production-scale
    table) is returned UNTOUCHED — no repartition Exchange appears, so
    at scale documents never shuffle (the invariant the plan tests pin
    with the device disabled)."""
    from flow_pipeline_spark.sources.tables import fan_out_small_scan

    want = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "many_files.parquet")
    spark.range(10_000).repartition(want * 2).write.parquet(path)
    # one file per split: charge each tiny file a full split's cost
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    try:
        df = spark.read.parquet(path)
        parts = df.rdd.getNumPartitions()
        assert parts >= want, parts
        fanned = fan_out_small_scan(df, spark, path)
        assert fanned is df          # identical object: no plan change
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_oc)
