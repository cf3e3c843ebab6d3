"""Streaming-tier tests: raw persist MV, SummingMergeTree-style rollup
stream + compaction, inserter projection, protobuf roundtrip, metrics.

File-source + availableNow trigger = deterministic micro-batching without
Kafka (the stream sees the same rows as the batch oracle)."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flow_pipeline_spark.operators.rollup import compact_rollup, rollup_flat
from flow_pipeline_spark.sources.mocker import flows_raw, mocker_stream, synthetic_flows
from flow_pipeline_spark.sources.protobuf import from_flow_protobuf, to_flow_protobuf
from flow_pipeline_spark.streaming.jobs import (
    inserter_projection,
    read_rollup,
    run_compaction,
    start_raw_persist,
    start_rollup_stream,
)
from flow_pipeline_spark.streaming.metrics import MetricsListener

N = 6000


def _await_done(q, timeout: int = 1200) -> None:
    """Block until an availableNow stream actually TERMINATES — a bare
    awaitTermination(t) returning on timeout lets the test read a store
    mid-epoch (observed once under full-suite load as a read of a
    directory the swap had just renamed). Assert, don't proceed. The
    timeout is generous on purpose: this host's neighbor bursts slow a
    normally-30s stream several-fold, and a slow PASS beats a flake —
    the assert exists to turn a hung/mid-run read into a clear error,
    not to police wall time."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise AssertionError(
            f"stream still running after {timeout}s — host overloaded "
            f"or the trigger never drained; refusing to read its sink")



@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="fps_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def flow_source(spark, tmpdir):
    """Batch-write epoch-seconds flows, exposed as a file stream."""
    src = f"{tmpdir}/src"
    synthetic_flows(spark, N, seed=3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    return src, stream


def test_raw_persist_mv(spark, tmpdir, flow_source):
    src, stream = flow_source
    out, ckpt = f"{tmpdir}/flows_raw", f"{tmpdir}/ckpt_raw"
    q = start_raw_persist(stream, out, ckpt, trigger={"availableNow": True})
    _await_done(q)
    got = spark.read.parquet(out)
    assert got.count() == N
    # Date partition column present and pruning-capable
    assert "Date" in got.columns
    assert got.select("TimeReceived").schema[0].dataType.simpleString() == "timestamp"
    # MV projection ≡ batch projection
    batch = flows_raw(spark.read.parquet(src))
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()


def test_enriched_persist_stream_matches_batch(spark, tmpdir, flow_source):
    """J1 streaming — the continuous enrichment MV (stream-static broadcast
    join against the AS dim) writes exactly what the batch enrich_by_asn of
    the same rows produces, and its per-batch plan broadcasts the dim."""
    from flow_pipeline_spark.operators.enrich import enrich_by_asn
    from flow_pipeline_spark.streaming.jobs import start_enriched_persist

    src, stream = flow_source
    dim = spark.createDataFrame(
        [(65000, "US", "AS-A"), (65001, "DE", "AS-B")],
        "asn int, country string, as_name string")
    out, ckpt = f"{tmpdir}/flows_enr", f"{tmpdir}/ckpt_enr"
    q = start_enriched_persist(stream, dim, out, ckpt,
                               trigger={"availableNow": True})
    _await_done(q)
    got = spark.read.parquet(out)
    assert got.count() == N
    for c in ("SrcCountry", "DstCountry", "SrcASDB", "DstASDB"):
        assert c in got.columns
    batch = enrich_by_asn(flows_raw(spark.read.parquet(src)), dim)
    aligned = got.select(*batch.columns)  # partitionBy moves Date to the end
    assert aligned.exceptAll(batch).isEmpty() and \
        batch.exceptAll(aligned).isEmpty()
    # unmatched AS (65002) stays, enrichment never drops traffic
    assert got.filter(F.col("SrcAS") == 65002).count() > 0
    assert (got.filter(F.col("SrcAS") == 65002)
            .filter(F.col("SrcCountry").isNotNull()).count() == 0)


def test_rollup_stream_and_compaction(spark, tmpdir, flow_source):
    src, _ = flow_source
    raw_schema = flows_raw(spark.read.parquet(src)).schema
    # stream of flows_raw rows in small files → multiple micro-batches
    raw_dir = f"{tmpdir}/raw_for_rollup"
    flows_raw(spark.read.parquet(src)).repartition(6).write.parquet(raw_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("maxFilesPerTrigger", 1).parquet(raw_dir))

    rollup_dir, ckpt = f"{tmpdir}/flows_5m", f"{tmpdir}/ckpt_5m"
    q = start_rollup_stream(stream, rollup_dir, ckpt,
                            trigger={"availableNow": True})
    _await_done(q)

    from flow_pipeline_spark.streaming import jobs

    batch_rollup = rollup_flat(flows_raw(spark.read.parquet(src)))
    partials = spark.read.parquet(jobs._resolve_store(rollup_dir))
    # reader view merges partials
    merged = read_rollup(spark, rollup_dir)
    assert merged.exceptAll(batch_rollup).isEmpty()
    assert batch_rollup.exceptAll(merged).isEmpty()

    # OPTIMIZE-equivalent: physical row count shrinks to merged form,
    # results unchanged, idempotent
    n_before = partials.count()
    run_compaction(spark, rollup_dir)
    after = spark.read.parquet(jobs._resolve_store(rollup_dir))
    assert after.count() <= n_before
    assert after.count() == batch_rollup.count()
    run_compaction(spark, rollup_dir)  # idempotent
    merged2 = read_rollup(spark, rollup_dir)
    assert merged2.exceptAll(batch_rollup).isEmpty()


def test_inserter_projection(spark):
    flows = synthetic_flows(spark, 300, seed=5)
    out = inserter_projection(flows)
    assert out.columns == [
        "date_inserted", "time_flow", "type", "sampling_rate", "src_ip",
        "dst_ip", "bytes", "packets", "src_port", "dst_port", "etype",
        "proto", "src_as", "dst_as"]
    pdf = out.toPandas()
    assert pdf["src_ip"].notna().all()
    # v6 rows render RFC-5952; v4-stratum rows render as the Go inserter
    # does (left-aligned bytes are NOT detected as IPv4 by net.IP.String)
    assert pdf["src_ip"].str.contains(":").any()


def test_protobuf_roundtrip_spark(spark):
    flows = synthetic_flows(spark, 500, seed=11)
    dec = from_flow_protobuf(to_flow_protobuf(flows, fixed_length=True),
                             fixed_length=True)
    cols = ["SequenceNum", "TimeReceived", "Bytes", "Packets", "SrcPort",
            "DstPort", "SrcAS", "DstAS", "Etype"]
    a = flows.select(*cols).orderBy("SequenceNum").toPandas()
    b = dec.select(*cols).orderBy("SequenceNum").toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_mocker_stream_domains(spark, tmpdir):
    """S5: rate-source mocker produces schema-correct flow rows."""
    listener = MetricsListener()
    spark.streams.addListener(listener)
    stream = mocker_stream(spark, rows_per_second=200)
    out, ckpt = f"{tmpdir}/mock_out", f"{tmpdir}/ckpt_mock"
    q = (stream.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="1 seconds").start())
    import time
    # wait for BOTH the rows on disk and a non-zero listener progress
    # event: onQueryProgress delivery is asynchronous, so under
    # full-suite host load the rows can land while every progress entry
    # still reads 0 at stop time (observed as a flaky bare
    # `assert any(...)` below — round 8)
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if (spark.read.parquet(out).count() >= 100
                    and any(p["num_input_rows"]
                            for p in listener.progress)):
                break
        except Exception:
            pass
        time.sleep(1)
    q.stop()
    spark.streams.removeListener(listener)
    got = spark.read.parquet(out)
    n = got.count()
    assert n >= 100
    pdf = got.toPandas()
    assert (pdf["Bytes"] < 1500).all()
    assert pdf["SrcAS"].between(65000, 65002).all()
    assert pdf["SequenceNum"].is_unique
    assert any(p["num_input_rows"] for p in listener.progress)

    # S10/W7 — the observability query layer over the listener's output:
    # rows_total is a proper cumulative counter per query, and the PromQL
    # rate()/sum-by pipeline (operators/promql.py, same code as the
    # metrics_rate_sum_by oracle query) runs over it end to end
    from flow_pipeline_spark.operators.promql import (
        counter_rate, metrics_table, sum_by)
    mt = metrics_table(spark, listener)
    mpdf = (mt.orderBy("name", "batch_id")
            .select("name", "rows_total").toPandas())
    assert mpdf.groupby("name")["rows_total"].apply(
        lambda s: s.is_monotonic_increasing).all()
    rates = counter_rate(mt, series_cols=["name"], ts_col="ts",
                         value_col="rows_total", bucket_s=1, window_s=10)
    summed = sum_by(rates, ["name"]).collect()
    assert summed, "rate pipeline produced no buckets"
    assert all(r["rate"] is None or r["rate"] >= 0 for r in summed)


def test_stateful_count_flush(spark, tmpdir):
    """W1 — count-triggered flush: with flush_count=500 over a finite
    stream, every emitted batch crossed the threshold by exactly the rows
    the micro-batch delivered; totals reconcile with the source minus the
    un-flushed per-key tail left in state."""
    from flow_pipeline_spark.streaming.stateful import count_or_time_flush

    src = f"{tmpdir}/stateful_src"
    flows = synthetic_flows(spark, N, seed=7)
    flows.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    out = count_or_time_flush(stream, flush_count=500, flush_ms=60_000)
    q = (out.writeStream.format("memory").queryName("flush_batches")
         .outputMode("append").trigger(availableNow=True).start())
    # NOT _await_done: a stateful query holding registered 60s timers
    # does not terminate when its data drains, and stopping it mid-
    # trigger can abort a state-file commit — the ORIGINAL bounded wait
    # (drain the finite source, leave the query to session teardown) is
    # the empirically stable form for this one test.
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM flush_batches").toPandas()
    assert len(got) > 0
    # count-flushes always carry >= threshold rows; a slow run may also
    # fire the (60s) timer for a key's sub-threshold tail — always < 500
    assert (got["flushed_by"].isin(["count", "timer"])).all()
    assert "count" in set(got["flushed_by"])
    by_count = got[got["flushed_by"] == "count"]
    assert (by_count["n_rows"] >= 500).all()
    assert (got.loc[got["flushed_by"] == "timer", "n_rows"] < 500).all()

    # reconciliation: flushed + in-state tail == source totals per key
    src_totals = (flows.groupBy("SrcAS")
                  .agg(F.count("*").alias("n"), F.sum("Bytes").alias("b"))
                  .toPandas().set_index("SrcAS"))
    flushed = got.groupby("SrcAS")[["n_rows", "sum_bytes"]].sum()
    for k, row in flushed.iterrows():
        assert row["n_rows"] <= src_totals.loc[k, "n"]
        tail = src_totals.loc[k, "n"] - row["n_rows"]
        assert 0 <= tail < 500  # tail never reached the threshold


def test_stateful_timer_flush(spark, tmpdir):
    """W1 — time-triggered flush: a short flush_ms emits the buffered tail
    via the processing-time timeout even though the count threshold is
    never reached (the inserter's 5-s flush.dur path)."""
    import time

    from flow_pipeline_spark.streaming.stateful import count_or_time_flush

    src = f"{tmpdir}/timer_src"
    synthetic_flows(spark, 200, seed=9).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out = count_or_time_flush(stream, flush_count=10_000, flush_ms=1500)
    q = (out.writeStream.format("memory").queryName("timer_batches")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM timer_batches").toPandas()
            if len(got) and (got["flushed_by"] == "timer").any():
                break
            time.sleep(1)
        got = spark.sql("SELECT * FROM timer_batches").toPandas()
    finally:
        q.stop()
    assert (got["flushed_by"] == "timer").any()
    assert int(got["n_rows"].sum()) == 200


def test_watermarked_rollup_stream(spark, tmpdir):
    """W4/W5 alternative design: watermarked append-mode windowed agg.
    Every emitted (finalized) window row must equal the batch rollup of the
    same data exactly; only windows still open at end-of-stream may be
    missing."""
    from flow_pipeline_spark.streaming.jobs import (
        start_rollup_stream_watermarked)

    src = f"{tmpdir}/wm_src"
    flows = synthetic_flows(spark, N, seed=11)
    # one file = one in-order micro-batch: no row is ever behind the
    # watermark (multi-file reads arrive time-unordered, and append-mode
    # correctly DROPS late rows — that path is exercised separately below)
    flows.repartition(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = flows_raw(spark.readStream.schema(schema).parquet(src))

    out_dir = f"{tmpdir}/wm_rollup"
    q = start_rollup_stream_watermarked(
        stream, out_dir, f"{tmpdir}/wm_ckpt",
        lateness="10 minutes", trigger={"availableNow": True})
    _await_done(q)

    got = spark.read.parquet(out_dir)
    want = rollup_flat(flows_raw(spark.read.parquet(src)))
    assert got.count() > 0
    # emitted rows are final — exact equality per key with the batch rollup
    joined = got.join(want.withColumnRenamed("Bytes", "wB")
                      .withColumnRenamed("Packets", "wP")
                      .withColumnRenamed("Count", "wC"),
                      ["Date", "Timeslot", "SrcAS", "DstAS", "EType"],
                      "left")
    bad = joined.filter((F.col("Bytes") != F.col("wB"))
                        | (F.col("Packets") != F.col("wP"))
                        | (F.col("Count") != F.col("wC"))
                        | F.col("wB").isNull())
    assert bad.count() == 0
    # and nothing but open windows is missing
    assert got.count() <= want.count()


def test_watermarked_rollup_drops_late(spark, tmpdir):
    """The watermark contract itself: after a run whose data ends at T, a
    second run delivering rows a day older than T (far beyond the 10-min
    lateness bound) must contribute nothing — the checkpointed watermark
    drops them. This is the designed trade-off vs the stateless-partials
    rollup, which would have absorbed them at the next compaction."""
    from flow_pipeline_spark.sources.mocker import BASE_EPOCH
    from flow_pipeline_spark.streaming.jobs import (
        start_rollup_stream_watermarked)

    src = f"{tmpdir}/late_src"
    out_dir, ckpt = f"{tmpdir}/late_rollup", f"{tmpdir}/late_ckpt"
    recent = synthetic_flows(spark, 6000, seed=13)
    recent.repartition(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = flows_raw(spark.readStream.schema(schema).parquet(src))
        q = start_rollup_stream_watermarked(
            stream, out_dir, ckpt,
            lateness="2 minutes", trigger={"availableNow": True})
        _await_done(q)

    run_once()
    n_after_first = spark.read.parquet(out_dir).count()
    assert n_after_first > 0

    # day-old rows arrive in a later run
    late = synthetic_flows(spark, 6000, seed=14,
                           base_epoch=BASE_EPOCH - 86400)
    late.repartition(1).write.mode("append").parquet(src)
    run_once()

    got = spark.read.parquet(out_dir)
    late_cutoff = F.to_timestamp(F.lit("2020-03-22 00:00:00"))
    assert got.filter(F.col("Timeslot") < late_cutoff).count() == 0


def test_dedup_stream_suppresses_redelivery(spark, tmpdir):
    """start_dedup_stream drops both broker re-deliveries (byte-identical
    replays) AND router resends (same flow record, fresh collector-stamped
    TimeReceived) within the watermark horizon — the default key is
    exporter-side record identity, not TimeReceived."""
    from flow_pipeline_spark.streaming.jobs import start_dedup_stream

    src = f"{tmpdir}/dedup_src"
    out_dir, ckpt = f"{tmpdir}/dedup_out", f"{tmpdir}/dedup_ckpt"
    base = flows_raw(synthetic_flows(spark, 4000, seed=21))
    base.repartition(1).write.parquet(src)
    # broker redelivery: a byte-identical slice of the same records
    replay = base.filter(F.col("SequenceNum") < 500)
    replay.repartition(1).write.mode("append").parquet(src)
    # router resend: same flow records, but the collector stamps the
    # resent export packet with a fresh (later) TimeReceived
    resend = (base.filter((F.col("SequenceNum") >= 500)
                          & (F.col("SequenceNum") < 900))
              .withColumn("TimeReceived",
                          F.col("TimeReceived")
                          + F.expr("INTERVAL 5 SECONDS")))
    resend.repartition(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_dedup_stream(stream, out_dir, ckpt,
                           trigger={"availableNow": True})
    _await_done(q)

    got = spark.read.parquet(out_dir)
    assert got.count() == 4000
    dup_keys = (got.groupBy("SamplerAddress", "TimeFlowStart", "TimeFlowEnd",
                            "SrcAddr", "DstAddr", "SrcPort", "DstPort",
                            "Proto", "Bytes", "Packets")
                .count().filter(F.col("count") > 1).count())
    assert dup_keys == 0


def test_session_stream_matches_batch(spark, tmpdir):
    """Streaming session_window sessions ≡ batch session_window over the
    same rows (availableNow drains everything; max event ts is far past
    every watermark, so all sessions close and emit)."""
    from flow_pipeline_spark.streaming.jobs import start_session_stream

    src = f"{tmpdir}/sess_src"
    out_dir, ckpt = f"{tmpdir}/sess_out", f"{tmpdir}/sess_ckpt"
    events = (
        spark.range(3000)
        .select((F.col("id") % 40).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_600_000_000)
                    + (F.col("id") * 37) % 100_000).alias("ts"))
    )
    # a far-future row per user pushes the watermark past every session;
    # written as a separate LATER file — the file source replays in
    # mod-time order, so the watermark only jumps after all events
    events.repartition(3).write.parquet(src)
    closer = (events.groupBy("user_id")
              .agg(F.timestamp_seconds(F.lit(1_600_500_000)).alias("ts")))
    import time as _time
    _time.sleep(1.1)
    closer.repartition(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    # lateness must cover cross-file disorder (files replay in any order,
    # and the far-future closer may arrive first) while staying small
    # enough that the final watermark (max_ts - lateness) passes every
    # session end: 500_000s ahead - 2 days ≫ last session end
    q = start_session_stream(stream, out_dir, ckpt, gap="10 minutes",
                             lateness="2 days",
                             trigger={"availableNow": True})
    _await_done(q)

    got = (spark.read.parquet(out_dir)
           .filter(F.col("session_start") < F.to_timestamp(
               F.lit("2020-09-19 00:00:00"))))
    batch = (
        spark.read.parquet(src)
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
        .filter(F.col("session_start") < F.to_timestamp(
            F.lit("2020-09-19 00:00:00")))
    )
    assert got.count() > 0
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()


def _duckdb_inserter_ddl(con):
    con.execute("""
        CREATE TABLE IF NOT EXISTS flows_pg (
            date_inserted TIMESTAMP, time_flow TIMESTAMP, type INT,
            sampling_rate INT, src_ip VARCHAR, dst_ip VARCHAR,
            bytes BIGINT, packets BIGINT, src_port INT, dst_port INT,
            etype INT, proto INT, src_as BIGINT, dst_as BIGINT,
            batch_id BIGINT)""")


def test_exactly_once_writer_survives_epoch_rerun(spark, tmpdir):
    """W2: Spark re-runs a foreachBatch epoch after a crash between the
    insert and the checkpoint commit. The ledger writer must land the
    epoch's rows exactly once across any number of re-runs, and a partial
    non-transactional attempt must be cleaned, not compounded."""
    import duckdb
    from flow_pipeline_spark.streaming.jobs import (
        exactly_once_batch_writer, inserter_projection)

    db = f"{tmpdir}/inserter.duckdb"
    con = duckdb.connect(db)
    _duckdb_inserter_ddl(con)
    con.close()

    batch = inserter_projection(synthetic_flows(spark, 200, seed=31))
    write_batch = exactly_once_batch_writer(
        lambda: duckdb.connect(db), "flows_pg")

    write_batch(batch, 7)
    write_batch(batch, 7)          # crash-replay of the same epoch
    write_batch(batch, 8)          # a genuinely new epoch still lands

    con = duckdb.connect(db)
    assert con.execute(
        "SELECT count(*) FROM flows_pg WHERE batch_id = 7").fetchone()[0] == 200
    assert con.execute("SELECT count(*) FROM flows_pg").fetchone()[0] == 400
    # simulate a partial NON-transactional prior attempt for epoch 9: rows
    # present, no ledger mark — the writer must replace, not append
    con.execute("""INSERT INTO flows_pg
                   SELECT * EXCLUDE (batch_id), 9 FROM flows_pg
                   WHERE batch_id = 7 LIMIT 50""")
    con.close()
    write_batch(batch, 9)
    con = duckdb.connect(db)
    assert con.execute(
        "SELECT count(*) FROM flows_pg WHERE batch_id = 9").fetchone()[0] == 200
    ledger = con.execute(
        "SELECT batch_id FROM flows_pg_epoch_ledger ORDER BY 1").fetchall()
    assert [b for (b,) in ledger] == [7, 8, 9]
    con.close()


def test_transactional_inserter_zero_dupes_across_restart(spark, tmpdir):
    """W2 end-to-end: run the transactional inserter, then WIPE the
    checkpoint (the harshest redelivery — every epoch replays from zero)
    and run again. The ledger must skip every replayed epoch: zero
    duplicate rows, count unchanged."""
    import shutil

    import duckdb
    from flow_pipeline_spark.streaming.jobs import (
        start_transactional_inserter)

    src = f"{tmpdir}/txn_src"
    ckpt = f"{tmpdir}/txn_ckpt"
    db = f"{tmpdir}/txn.duckdb"
    flows = synthetic_flows(spark, 3000, seed=33)
    for i in range(3):   # three files → three epochs under maxFilesPerTrigger
        (flows.filter(F.col("SequenceNum") % 3 == i)
         .repartition(1).write.mode("append").parquet(src))
    schema = spark.read.parquet(src).schema

    con = duckdb.connect(db)
    _duckdb_inserter_ddl(con)
    con.close()

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_transactional_inserter(
            stream, lambda: duckdb.connect(db), "flows_pg", ckpt,
            trigger={"availableNow": True})
        _await_done(q)

    run_once()
    con = duckdb.connect(db)
    n1 = con.execute("SELECT count(*) FROM flows_pg").fetchone()[0]
    assert n1 == 3000
    con.close()

    shutil.rmtree(ckpt)            # forget all progress → full redelivery
    run_once()

    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM flows_pg").fetchone()[0] == 3000
    dupes = con.execute("""
        SELECT count(*) FROM (
          SELECT time_flow, src_ip, dst_ip, src_port, dst_port, bytes,
                 packets, count(*) c
          FROM flows_pg
          GROUP BY ALL HAVING count(*) > 1)""").fetchone()[0]
    assert dupes == 0
    con.close()


def test_document_qc_stream_matches_batch_gates(spark, tmpdir):
    """The continuous curation MV (scrub → gates → digest dedup) emits
    exactly the batch pipeline's survivors: same digest set, one row per
    digest, replayed files deduped — stream ≡ batch for the training tier
    like test_raw_persist_mv proves for the flow tier."""
    from flow_pipeline_spark.operators.text import (classifier_z_e4,
                                                    normalize_text,
                                                    scrub_pii, token_count)
    from flow_pipeline_spark.streaming.jobs import start_document_qc_stream

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "source", "text"))
    src = f"{tmpdir}/qc_src"
    docs.repartition(1).write.parquet(src)
    # second crawl batch: 40 byte-identical replays land later
    (docs.filter(F.col("doc_id") < 40)
     .withColumn("doc_id", F.col("doc_id") + 100000)
     .repartition(1).write.mode("append").parquet(src))

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out, ckpt = f"{tmpdir}/qc_out", f"{tmpdir}/qc_ckpt"
    q = start_document_qc_stream(stream, out, ckpt,
                                 trigger={"availableNow": True})
    _await_done(q)
    got = spark.read.parquet(out)

    batch = (docs.withColumn("text", scrub_pii(F.col("text")))
             .withColumn("n_tokens", token_count(F.col("text")))
             .filter((F.col("n_tokens") >= 5)
                     & (classifier_z_e4(F.col("text")) >= 0))
             .withColumn("content_hash",
                         F.md5(normalize_text(F.col("text")))))
    want_digests = {r[0] for r in
                    batch.select("content_hash").distinct().collect()}
    assert want_digests, "gates drop the whole corpus — broken fixture"
    got_digests = [r[0] for r in got.select("content_hash").collect()]
    # one row per surviving digest (replays suppressed), same survivor set
    assert len(got_digests) == len(set(got_digests))
    assert set(got_digests) == want_digests
    assert got.count() == len(want_digests)
    # curated columns present, state-only columns dropped
    assert {"doc_id", "source", "text", "n_tokens", "content_hash"} \
        <= set(got.columns)
    assert "ingest_ts" not in got.columns


def test_document_qc_stream_drops_history(spark, tmpdir):
    """With a history table attached, the curation stream drops documents
    the curated corpus already contains (stream-static anti-join) on top
    of the in-stream watermark dedup."""
    from flow_pipeline_spark.operators.text import (classifier_z_e4,
                                                    normalize_text,
                                                    scrub_pii, token_count)
    from flow_pipeline_spark.streaming.jobs import start_document_qc_stream

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "source", "text"))
    history = docs.filter(F.col("doc_id") < 250)
    # the stream carries re-crawls of history (doc_id<100, re-keyed) plus
    # genuinely new content (doc_id >= 250)
    stream_docs = (
        docs.filter(F.col("doc_id") < 100)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .unionByName(docs.filter(F.col("doc_id") >= 250)))
    src = f"{tmpdir}/qch_src"
    stream_docs.repartition(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema).parquet(src))
    out, ckpt = f"{tmpdir}/qch_out", f"{tmpdir}/qch_ckpt"
    q = start_document_qc_stream(stream, out, ckpt, history=history,
                                 trigger={"availableNow": True})
    _await_done(q)
    got = spark.read.parquet(out)

    gates = (stream_docs.withColumn("text", scrub_pii(F.col("text")))
             .withColumn("n_tokens", token_count(F.col("text")))
             .filter((F.col("n_tokens") >= 5)
                     & (classifier_z_e4(F.col("text")) >= 0))
             .withColumn("content_hash",
                         F.md5(normalize_text(F.col("text")))))
    hist_d = {r[0] for r in history.select(
        F.md5(normalize_text(F.col("text")))).collect()}
    want = {r[0] for r in gates.select("content_hash").collect()} - hist_d
    got_digests = [r[0] for r in got.select("content_hash").collect()]
    assert set(got_digests) == want
    assert len(got_digests) == len(set(got_digests))
    # every re-crawl of history is gone
    assert got.filter(F.col("doc_id") >= 100000).count() == 0


def test_drift_monitor_stream_flags_shifted_batch(spark, tmpdir):
    """Streaming PSI monitor: a micro-batch drawn from the reference
    distribution scores stable (<0.1); a batch with its token-length
    mass concentrated scores past the 0.25 alert; every epoch's score
    equals the batch psi_drift over the same rows."""
    from flow_pipeline_spark.operators.profile import (bin_histogram,
                                                       psi_drift)
    from flow_pipeline_spark.operators.text import token_count
    from flow_pipeline_spark.streaming.jobs import (
        start_drift_monitor_stream)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    bin_col = F.least(F.floor(token_count(F.col("text")) / 8),
                      F.lit(9)).cast("int")
    ref = docs.filter(F.col("doc_id") < 250)
    # pass the RAW bin_histogram artifact (round-7 review: the monitor
    # previously required a manual c->c_ref rename its own docstring
    # never mentioned, crashing the documented usage)
    ref_counts = bin_histogram(ref, bin_col).localCheckpoint()

    ok_batch = docs.filter(F.col("doc_id") >= 250)
    # shifted batch: truncate every text to 3 tokens → all mass in bin 0
    bad_batch = (docs.filter(F.col("doc_id") >= 250)
                 .select((F.col("doc_id") + 1000).alias("doc_id"),
                         F.concat_ws(" ", F.slice(
                             F.split(F.trim("text"), r"\s+"), 1, 3))
                         .alias("text")))
    src = f"{tmpdir}/drift_src"
    ok_batch.repartition(1).write.parquet(src)
    bad_batch.repartition(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out, ckpt = f"{tmpdir}/drift_out", f"{tmpdir}/drift_ckpt"
    q = start_drift_monitor_stream(stream, ref_counts, bin_col, 10,
                                   out, ckpt,
                                   trigger={"availableNow": True})
    _await_done(q)

    rows = spark.read.parquet(out).collect()
    got = {r["batch_id"]: r["psi_e6"] for r in rows}
    assert len(got) == 2 and all(r["n_docs"] == 250 for r in rows)
    scores = sorted(got.values())
    assert scores[0] < 100_000, "in-distribution batch flagged"
    assert scores[-1] > 250_000, "shifted batch not flagged"
    # epoch score ≡ the batch operator over the same rows
    want_bad = psi_drift(ref, bad_batch, bin_col, 10).first()["psi_e6"]
    assert scores[-1] == want_bad


def test_document_qc_stream_bloom_history_gate(spark, tmpdir):
    """Bloom form of the history gate: the bitmap broadcasts once, every
    re-crawl of curated history drops (no false negatives), fresh
    content survives, and the survivor set equals the batch Bloom
    operator's exactly."""
    from flow_pipeline_spark.operators.dedup import (
        bloom_build, bloom_incremental_dedup)
    from flow_pipeline_spark.operators.text import (classifier_z_e4,
                                                    normalize_text,
                                                    scrub_pii, token_count)
    from flow_pipeline_spark.streaming.jobs import start_document_qc_stream

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "source", "text"))
    history = docs.filter(F.col("doc_id") < 250)
    bloom = bloom_build(history.select(
        F.md5(normalize_text(F.col("text"))).alias("content_hash")),
        fpp=0.001)

    stream_docs = (
        docs.filter(F.col("doc_id") < 100)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .unionByName(docs.filter(F.col("doc_id") >= 250)))
    src = f"{tmpdir}/qcb_src"
    stream_docs.repartition(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out, ckpt = f"{tmpdir}/qcb_out", f"{tmpdir}/qcb_ckpt"
    q = start_document_qc_stream(stream, out, ckpt, history_bloom=bloom,
                                 trigger={"availableNow": True})
    _await_done(q)
    got = {r[0] for r in
           spark.read.parquet(out).select("doc_id").collect()}
    assert not any(i >= 100000 for i in got), "a replay escaped the bloom"

    # batch replica: gates → the batch Bloom operator → exact dedup
    gates = (stream_docs.withColumn("text", scrub_pii(F.col("text")))
             .withColumn("n_tokens", token_count(F.col("text")))
             .filter((F.col("n_tokens") >= 5)
                     & (classifier_z_e4(F.col("text")) >= 0)))
    want = {r["doc_id"] for r in
            bloom_incremental_dedup(gates, bloom)
            .dropDuplicates(["content_hash"]).collect()}
    assert got == want
    # compare against the GATE-surviving fresh count — the quality
    # gates drop ~40% of this corpus regardless of the history store
    n_fresh_gated = gates.filter(F.col("doc_id") < 100000).count()
    assert len(got) >= n_fresh_gated - max(2, int(0.02 * n_fresh_gated)), \
        "far more fresh docs dropped than the configured fpp"


def test_document_qc_stream_span_scrub_matches_batch(spark, tmpdir):
    """Span stage of the curation stream (span_scrub_k): boilerplate
    tails shared by documents of one crawl batch are scrubbed per
    micro-batch; survivors (doc ids AND scrubbed texts) equal the batch
    replica of the same cascade exactly."""
    from flow_pipeline_spark.operators.dedup import (remove_repeated_spans,
                                                     repeated_span_table)
    from flow_pipeline_spark.operators.text import (classifier_z_e4,
                                                    normalize_text,
                                                    scrub_pii, token_count)
    from flow_pipeline_spark.streaming.jobs import start_document_qc_stream

    lit = ("alpha bravo charlie delta echo foxtrot "
           "golf hotel india juliet kilo lima")
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "source", "text"))
    tailed = (docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 30))
              .select((F.col("doc_id") + 100000).alias("doc_id"), "source",
                      F.concat("text", F.lit(" " + lit)).alias("text")))
    stream_docs = docs.filter(F.col("doc_id") < 100).unionByName(tailed)
    src = f"{tmpdir}/qcsp_src"
    stream_docs.repartition(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out, ckpt = f"{tmpdir}/qcsp_out", f"{tmpdir}/qcsp_ckpt"
    q = start_document_qc_stream(stream, out, ckpt, span_scrub_k=8,
                                 trigger={"availableNow": True})
    _await_done(q)
    got = spark.read.parquet(out)
    # foreachBatch epoch sink: extra partition column, one epoch here
    assert "epoch" in got.columns

    # batch replica: scrub→gates→digest dedup→span scrub→length re-gate
    gates = (stream_docs.withColumn("text", scrub_pii(F.col("text")))
             .withColumn("n_tokens", token_count(F.col("text")))
             .filter((F.col("n_tokens") >= 5)
                     & (classifier_z_e4(F.col("text")) >= 0))
             .withColumn("content_hash",
                         F.md5(normalize_text(F.col("text"))))
             .dropDuplicates(["content_hash"]))
    d = gates.select("doc_id", "text")
    scrub = remove_repeated_spans(d, repeated_span_table(d, k=8))
    want = {(r["doc_id"], r["text"]) for r in
            scrub.withColumn(
                "n",
                F.when(F.length("text") == 0, F.lit(0))
                .otherwise(token_count(F.col("text"))))
            .filter(F.col("n") >= 5).collect()}
    got_rows = {(r["doc_id"], r["text"]) for r in
                got.select("doc_id", "text").collect()}
    assert got_rows == want
    # keep_first semantics within the batch: the shared tail's canonical
    # host is the min tailed doc (100010) — every OTHER tailed survivor
    # lost the tail (bodies survive only where the original was dropped
    # by the quality gates, so the body k-grams no longer repeat)
    tailed_got = {(d, t) for d, t in got_rows if d >= 100000}
    assert (100010, lit) in tailed_got
    for d, t in tailed_got:
        if d != 100010:
            assert "alpha bravo" not in t, d


def test_staged_writer_survives_epoch_rerun(spark, tmpdir):
    """W2, distributed form: the staged writer (executors stage parquet,
    driver txn does ledger + INSERT..SELECT) must land every epoch
    exactly once across crash-replays and clean partial attempts — the
    same contract as the toPandas form, with zero rows through the
    driver."""
    import duckdb
    from flow_pipeline_spark.streaming.jobs import (
        exactly_once_staged_writer, inserter_projection)

    db = f"{tmpdir}/staged.duckdb"
    con = duckdb.connect(db)
    _duckdb_inserter_ddl(con)
    con.close()

    batch = inserter_projection(
        synthetic_flows(spark, 500, seed=41)).repartition(4)
    write_batch = exactly_once_staged_writer(
        lambda: duckdb.connect(db), "flows_pg", f"{tmpdir}/stage")

    write_batch(batch, 7)
    write_batch(batch, 7)          # crash-replay of the same epoch
    write_batch(batch, 8)          # a genuinely new epoch still lands

    con = duckdb.connect(db)
    assert con.execute(
        "SELECT count(*) FROM flows_pg WHERE batch_id = 7"
    ).fetchone()[0] == 500
    assert con.execute("SELECT count(*) FROM flows_pg").fetchone()[0] == 1000
    # partial NON-transactional attempt for epoch 9 → replaced, not added
    con.execute("""INSERT INTO flows_pg
                   SELECT * EXCLUDE (batch_id), 9 FROM flows_pg
                   WHERE batch_id = 7 LIMIT 50""")
    con.close()
    write_batch(batch, 9)
    con = duckdb.connect(db)
    assert con.execute(
        "SELECT count(*) FROM flows_pg WHERE batch_id = 9"
    ).fetchone()[0] == 500
    ledger = con.execute(
        "SELECT batch_id FROM flows_pg_epoch_ledger ORDER BY 1").fetchall()
    assert [b for (b,) in ledger] == [7, 8, 9]
    con.close()
    # staging cleaned after commit (ledger carries the replay protection)
    import glob
    assert glob.glob(f"{tmpdir}/stage/epoch=*") == []


def test_staged_writer_raises_on_invisible_stage(spark, tmpdir, monkeypatch):
    """ADVICE r4: on a multi-node cluster with a non-shared stage_dir the
    driver globs nothing — the writer must RAISE before the ledger mark,
    never commit an empty epoch that exactly-once then pins forever."""
    import glob as _glob

    import duckdb
    from flow_pipeline_spark.streaming.jobs import (
        exactly_once_staged_writer, inserter_projection)

    db = f"{tmpdir}/guard.duckdb"
    con = duckdb.connect(db)
    _duckdb_inserter_ddl(con)
    con.close()

    batch = inserter_projection(synthetic_flows(spark, 50, seed=47))
    write_batch = exactly_once_staged_writer(
        lambda: duckdb.connect(db), "flows_pg", f"{tmpdir}/guard_stage")
    monkeypatch.setattr(_glob, "glob", lambda *a, **k: [])
    with pytest.raises(RuntimeError, match="shared"):
        write_batch(batch, 1)
    con = duckdb.connect(db)
    try:
        marked = con.execute(
            "SELECT count(*) FROM flows_pg_epoch_ledger "
            "WHERE batch_id = 1").fetchone()[0]
    except duckdb.CatalogException:
        marked = 0                 # ledger never even created — fine
    assert marked == 0, "epoch marked done despite invisible stage"
    con.close()


def test_staged_writer_one_pass_per_epoch(spark, tmpdir):
    """r10 optimization: the authoritative expected-count rides the
    staging write via an Observation, so a fresh epoch runs NO Spark
    job beyond the staging write itself (previously a separate
    batch_df.count() re-ran the whole micro-batch pipeline), and a
    replayed committed epoch runs zero jobs."""
    import duckdb
    from flow_pipeline_spark.streaming.jobs import (
        exactly_once_staged_writer, inserter_projection)

    db = f"{tmpdir}/onepass.duckdb"
    con = duckdb.connect(db)
    _duckdb_inserter_ddl(con)
    con.close()

    batch = inserter_projection(
        synthetic_flows(spark, 200, seed=43)).repartition(2)
    write_batch = exactly_once_staged_writer(
        lambda: duckdb.connect(db), "flows_pg", f"{tmpdir}/stage_one")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # yardstick: how many Spark jobs does a bare staging-shaped write
    # of this exact batch cost (AQE may split one query into several)?
    sc.setJobGroup("onepass-plain", "plain write")
    batch.write.mode("overwrite").parquet(f"{tmpdir}/plain_write")
    sc.setJobGroup("onepass-fresh", "staged writer, fresh epoch")
    write_batch(batch, 3)
    sc.setJobGroup("onepass-replay", "staged writer, replayed epoch")
    write_batch(batch, 3)
    sc.setJobGroup(None, None)

    n_plain = len(tracker.getJobIdsForGroup("onepass-plain"))
    n_fresh = len(tracker.getJobIdsForGroup("onepass-fresh"))
    n_replay = len(tracker.getJobIdsForGroup("onepass-replay"))
    assert n_fresh == n_plain, (
        f"fresh epoch ran {n_fresh} jobs vs {n_plain} for the bare "
        f"write — an extra pass over the micro-batch came back")
    assert n_replay == 0, "replayed committed epoch ran Spark jobs"

    con = duckdb.connect(db)
    assert con.execute(
        "SELECT count(*) FROM flows_pg").fetchone()[0] == 200
    con.close()


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
# Derby's dialect maps StringType to CLOB — pin the two string columns
# so stage types match the VARCHAR target
DERBY_STAGE_TYPES = "src_ip VARCHAR(64), dst_ip VARCHAR(64)"


def _derby_conn(spark, url):
    jvm = spark._sc._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    return jvm.java.sql.DriverManager.getConnection(url)


def _derby_one(conn, sql):
    st = conn.createStatement()
    rs = st.executeQuery(sql)
    rs.next()
    v = rs.getLong(1)
    rs.close()
    return v


def _derby_inserter_ddl(spark, url):
    conn = _derby_conn(spark, url)
    conn.createStatement().executeUpdate(
        'CREATE TABLE flows_pg ('
        '"date_inserted" TIMESTAMP, "time_flow" TIMESTAMP, '
        '"type" INTEGER, "sampling_rate" INTEGER, '
        '"src_ip" VARCHAR(64), "dst_ip" VARCHAR(64), '
        '"bytes" BIGINT, "packets" BIGINT, '
        '"src_port" INTEGER, "dst_port" INTEGER, '
        '"etype" INTEGER, "proto" INTEGER, '
        '"src_as" BIGINT, "dst_as" BIGINT, "batch_id" BIGINT)')
    conn.close()


def test_staged_jdbc_writer_survives_epoch_rerun(spark, tmpdir):
    """W2, distributed form against a REAL JDBC database (embedded Derby
    — the jar ships with Spark): executors stage each epoch into a
    staging TABLE via df.write.jdbc, the driver txn does ledger +
    INSERT..SELECT — the reference's literal Postgres shape
    (inserter.go:95-106), same exactly-once contract as the parquet
    transport."""
    from flow_pipeline_spark.streaming.jobs import (
        exactly_once_staged_jdbc_writer, inserter_projection)

    url = f"jdbc:derby:{tmpdir}/jdbc_rerun_db;create=true"
    _derby_inserter_ddl(spark, url)

    batch = inserter_projection(
        synthetic_flows(spark, 500, seed=41)).repartition(4)
    write_batch = exactly_once_staged_jdbc_writer(
        url, "flows_pg", driver=DERBY_DRIVER,
        create_table_column_types=DERBY_STAGE_TYPES)

    write_batch(batch, 7)
    write_batch(batch, 7)          # crash-replay of the same epoch
    write_batch(batch, 8)          # a genuinely new epoch still lands

    conn = _derby_conn(spark, url)
    assert _derby_one(
        conn, 'SELECT count(*) FROM flows_pg WHERE "batch_id" = 7') == 500
    assert _derby_one(conn, "SELECT count(*) FROM flows_pg") == 1000
    # partial NON-transactional attempt for epoch 9 → replaced, not added
    conn.createStatement().executeUpdate(
        'INSERT INTO flows_pg SELECT "date_inserted", "time_flow", '
        '"type", "sampling_rate", "src_ip", "dst_ip", "bytes", '
        '"packets", "src_port", "dst_port", "etype", "proto", '
        '"src_as", "dst_as", 9 FROM flows_pg '
        'WHERE "batch_id" = 7 FETCH FIRST 50 ROWS ONLY')
    conn.close()
    write_batch(batch, 9)
    conn = _derby_conn(spark, url)
    assert _derby_one(
        conn, 'SELECT count(*) FROM flows_pg WHERE "batch_id" = 9') == 500
    assert _derby_one(
        conn, "SELECT count(*) FROM flows_pg_epoch_ledger") == 3

    # Replay of an already-committed epoch must SKIP the distributed
    # staging write (the ledger pre-check), and must clear a leftover
    # stage table from a crashed attempt rather than leave it behind.
    conn.createStatement().executeUpdate(
        'CREATE TABLE flows_pg_stage ("junk" BIGINT)')
    conn.createStatement().executeUpdate(
        "INSERT INTO flows_pg_stage VALUES (1)")
    conn.close()
    write_batch(batch, 7)              # replay: committed long ago
    conn = _derby_conn(spark, url)
    assert _derby_one(conn, "SELECT count(*) FROM flows_pg") == 1500
    with pytest.raises(Exception):     # stage dropped on the skip path
        _derby_one(conn, "SELECT count(*) FROM flows_pg_stage")
    conn.close()


@pytest.mark.parametrize("transport", ["parquet", "jdbc"])
def test_staged_inserter_zero_dupes_across_restart(spark, tmpdir, transport):
    """W2 end-to-end on the STAGED path, parameterized over BOTH staging
    transports (shared-filesystem parquet + DuckDB ingest; JDBC staging
    TABLE against embedded Derby): wipe the checkpoint after a full run
    (every epoch replays from zero) — the ledger must skip every
    replayed epoch; zero duplicate rows."""
    import shutil

    import duckdb
    from flow_pipeline_spark.streaming.jobs import (
        start_transactional_inserter)

    src = f"{tmpdir}/stg_src_{transport}"
    ckpt = f"{tmpdir}/stg_ckpt_{transport}"
    flows = synthetic_flows(spark, 3000, seed=43)
    for i in range(3):
        (flows.filter(F.col("SequenceNum") % 3 == i)
         .repartition(1).write.mode("append").parquet(src))
    schema = spark.read.parquet(src).schema

    if transport == "parquet":
        db = f"{tmpdir}/stg.duckdb"
        con = duckdb.connect(db)
        _duckdb_inserter_ddl(con)
        con.close()
        kwargs = {"stage_dir": f"{tmpdir}/stg_stage"}

        def con_factory():
            return duckdb.connect(db)

        def count(sql):
            con = duckdb.connect(db)
            try:
                return con.execute(sql).fetchone()[0]
            finally:
                con.close()
    else:
        url = f"jdbc:derby:{tmpdir}/jdbc_restart_db;create=true"
        _derby_inserter_ddl(spark, url)
        kwargs = {"jdbc_stage": {
            "url": url, "driver": DERBY_DRIVER,
            "create_table_column_types": DERBY_STAGE_TYPES}}
        con_factory = None

        def count(sql):
            conn = _derby_conn(spark, url)
            try:
                return _derby_one(conn, sql)
            finally:
                conn.close()

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_transactional_inserter(
            stream, con_factory, "flows_pg", ckpt,
            trigger={"availableNow": True}, **kwargs)
        _await_done(q)

    run_once()
    assert count("SELECT count(*) FROM flows_pg") == 3000

    shutil.rmtree(ckpt)            # forget all progress → full redelivery
    run_once()
    assert count("SELECT count(*) FROM flows_pg") == 3000
    # every epoch appears exactly once in the ledger
    if transport == "parquet":
        assert count(
            "SELECT count(*) = count(DISTINCT batch_id) "
            "FROM flows_pg_epoch_ledger")
    else:
        assert count(
            'SELECT count(*) - count(DISTINCT "batch_id") '
            "FROM flows_pg_epoch_ledger") == 0


@pytest.mark.parametrize("gate_form", ["driver", "distributed"])
def test_document_qc_stream_semantic_gate_matches_batch(spark, tmpdir,
                                                        gate_form):
    """Semantic stage of the curation stream: near-copies of the curated
    corpus (changed tail — digest anti-join CANNOT catch them) are
    dropped by same-cell cosine against the persisted semantic store;
    the survivor set equals the batch pipeline's exactly. Parameterized
    over BOTH gate forms: the driver-collected pandas-UDF gate and the
    distributed stream-static anti-join the stream switches to when the
    store exceeds semantic_driver_max_store_rows (forced here with a
    1-row threshold — the store never touches the driver on that
    path)."""
    from flow_pipeline_spark.operators.similarity import (
        hashed_tf_embed_native, incremental_semantic_dedup, semantic_store)
    from flow_pipeline_spark.operators.text import (classifier_z_e4,
                                                    normalize_text,
                                                    scrub_pii, token_count)
    from flow_pipeline_spark.streaming.jobs import start_document_qc_stream

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "source", "text"))
    history = docs.filter(F.col("doc_id") < 200)
    hist_emb = (hashed_tf_embed_native(history)
                .select("doc_id", "embedding"))
    cents = [(int(r[0]), [float(x) for x in r[1]])
             for r in hist_emb.orderBy("doc_id").limit(8).collect()]
    store = semantic_store(hist_emb, cents, id_col="doc_id")

    # near-recrawls: history text + a changed tail (fresh digest, cosine
    # still ~0.99) — plus genuinely new content
    near = (history.filter(F.col("doc_id") < 40)
            .select((F.col("doc_id") + 100000).alias("doc_id"), "source",
                    F.concat("text", F.lit(" updated footer v2 zz"))
                    .alias("text")))
    fresh = docs.filter(F.col("doc_id") >= 300)
    stream_docs = near.unionByName(fresh)
    src = f"{tmpdir}/qcs_src_{gate_form}"
    stream_docs.repartition(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = f"{tmpdir}/qcs_out_{gate_form}"
    ckpt = f"{tmpdir}/qcs_ckpt_{gate_form}"
    max_store = 10**9 if gate_form == "driver" else 1
    q = start_document_qc_stream(
        stream, out, ckpt, history=history,
        semantic_store=store, semantic_centroids=cents,
        semantic_threshold=0.98,
        semantic_driver_max_store_rows=max_store,
        trigger={"availableNow": True})
    _await_done(q)
    got = {r[0] for r in
           spark.read.parquet(out).select("doc_id").collect()}

    # batch replica of the same cascade: scrub -> gates -> digest
    # anti-join -> semantic gate (the batch operator) -> exact dedup
    gates = (stream_docs.withColumn("text", scrub_pii(F.col("text")))
             .withColumn("n_tokens", token_count(F.col("text")))
             .filter((F.col("n_tokens") >= 5)
                     & (classifier_z_e4(F.col("text")) >= 0))
             .withColumn("content_hash",
                         F.md5(normalize_text(F.col("text")))))
    hist_digests = history.select(
        F.md5(normalize_text(F.col("text"))).alias("content_hash"))
    after_digest = gates.join(hist_digests, "content_hash", "left_anti")
    batch_emb = (hashed_tf_embed_native(after_digest)
                 .select("doc_id", "embedding"))
    flagged = (incremental_semantic_dedup(
        batch_emb, store, cents, threshold=0.98, id_col="doc_id")
        .select(F.col("new_id").alias("doc_id")).distinct())
    want = {r[0] for r in
            after_digest.join(flagged, "doc_id", "left_anti")
            .dropDuplicates(["content_hash"]).select("doc_id").collect()}
    assert got == want
    # every near-recrawl was dropped by the semantic stage specifically
    assert all(d < 100000 for d in got)
    assert got, "survivor set should not be empty"


def test_interval_join_stream_matches_batch(spark, tmpdir):
    """Stream-stream interval join ≡ the same banded join run in batch
    over the same rows (availableNow drains both sides; lateness far
    exceeds the data span so the watermark never drops a partner)."""
    from flow_pipeline_spark.streaming.jobs import start_interval_join_stream

    lsrc, rsrc = f"{tmpdir}/ij_l", f"{tmpdir}/ij_r"
    out_dir, ckpt = f"{tmpdir}/ij_out", f"{tmpdir}/ij_ckpt"
    base = 1_600_000_000
    left = (spark.range(400)
            .select((F.col("id") % 20).alias("user_id"),
                    F.timestamp_seconds(
                        F.lit(base) + (F.col("id") * 53) % 20_000)
                    .alias("ts"),
                    F.col("id").alias("l_id")))
    right = (spark.range(300)
             .select((F.col("id") % 20).alias("user_id"),
                     F.timestamp_seconds(
                         F.lit(base) + (F.col("id") * 71) % 20_000)
                     .alias("ts"),
                     F.col("id").alias("r_id")))
    left.repartition(2).write.parquet(lsrc)
    right.repartition(2).write.parquet(rsrc)

    ls = (spark.readStream.schema(spark.read.parquet(lsrc).schema)
          .option("maxFilesPerTrigger", 1).parquet(lsrc))
    rs = (spark.readStream.schema(spark.read.parquet(rsrc).schema)
          .option("maxFilesPerTrigger", 1).parquet(rsrc))
    q = start_interval_join_stream(ls, rs, out_dir, ckpt,
                                   key="user_id", band="3 minutes",
                                   lateness="1 day",
                                   trigger={"availableNow": True})
    _await_done(q)

    got = spark.read.parquet(out_dir)
    r_ren = right.select(*[F.col(c).alias(f"r_{c}")
                           for c in right.columns])
    cond = ((F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 3 minutes"))
            & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 3 minutes")))
    batch = left.join(r_ren, cond, "inner").drop("r_user_id")
    assert got.count() > 0
    assert sorted(got.columns) == sorted(batch.columns)
    g, b = got.select(*sorted(got.columns)), batch.select(*sorted(batch.columns))
    assert g.exceptAll(b).isEmpty() and b.exceptAll(g).isEmpty()


def test_interval_join_left_outer_emits_unmatched(spark, tmpdir):
    """left_outer form: matched rows carry their partner; a left row
    with no partner in the band emits with null r_ columns once the
    watermark proves no partner can still arrive."""
    from flow_pipeline_spark.streaming.jobs import start_interval_join_stream
    import time as _time

    lsrc, rsrc = f"{tmpdir}/ijo_l", f"{tmpdir}/ijo_r"
    out_dir, ckpt = f"{tmpdir}/ijo_out", f"{tmpdir}/ijo_ckpt"
    base = 1_600_000_000

    def lrows(rows):
        return (spark.createDataFrame(rows, "uid long, sec long, lv long")
                .select(F.col("uid").alias("user_id"),
                        F.timestamp_seconds("sec").alias("ts"), "lv"))

    def rrows(rows):
        return (spark.createDataFrame(rows, "uid long, sec long, rv long")
                .select(F.col("uid").alias("user_id"),
                        F.timestamp_seconds("sec").alias("ts"), "rv"))

    left = lrows([(u, base + u * 60, u) for u in range(10)])
    # partners only for users 0-4, 30s after the left row (inside the
    # 3-minute band)
    right = rrows([(u, base + u * 60 + 30, u + 100) for u in range(5)])
    left.repartition(1).write.parquet(lsrc)
    right.repartition(1).write.parquet(rsrc)
    # closers push both watermarks far past every band+lateness horizon;
    # their timestamps sit >band apart so they never join each other
    _time.sleep(1.1)
    lrows([(99, base + 500_000, -1)]).repartition(1) \
        .write.mode("append").parquet(lsrc)
    rrows([(99, base + 700_000, -1)]).repartition(1) \
        .write.mode("append").parquet(rsrc)
    # a post-closer nudge batch lets the state-flush run AFTER the
    # watermark advanced (outer results emit on a subsequent batch)
    _time.sleep(1.1)
    lrows([(98, base + 800_000, -2)]).repartition(1) \
        .write.mode("append").parquet(lsrc)

    ls = (spark.readStream.schema(spark.read.parquet(lsrc).schema)
          .option("maxFilesPerTrigger", 1).parquet(lsrc))
    rs = (spark.readStream.schema(spark.read.parquet(rsrc).schema)
          .option("maxFilesPerTrigger", 1).parquet(rsrc))
    q = start_interval_join_stream(ls, rs, out_dir, ckpt,
                                   key="user_id", band="3 minutes",
                                   lateness="10 minutes",
                                   how="left_outer",
                                   trigger={"availableNow": True})
    _await_done(q)

    got = (spark.read.parquet(out_dir)
           .filter(F.col("ts") < F.timestamp_seconds(
               F.lit(base + 400_000))))
    rows = {r.lv: r for r in got.collect()}
    assert set(rows) == set(range(10))
    for u in range(5):
        assert rows[u].r_rv == u + 100, rows[u]
    for u in range(5, 10):
        assert rows[u].r_rv is None and rows[u].r_ts is None, rows[u]


def test_funnel_stream_matches_batch(spark, tmpdir):
    """Streaming per-user funnel state ≡ the batch funnel on the same
    rows when delivery is time-ordered: per-stage user counts match
    and no user advances twice through one stage."""
    import time as _time

    from flow_pipeline_spark.operators.behavior import funnel
    from flow_pipeline_spark.streaming.jobs import start_funnel_stream

    src = f"{tmpdir}/fn_src"
    out_dir, ckpt = f"{tmpdir}/fn_out", f"{tmpdir}/fn_ckpt"
    base = 1_600_000_000
    types = ["view", "click", "purchase", "error"]
    ev = (spark.range(4000)
          .select((F.col("id") % 120).alias("user_id"),
                  F.element_at(
                      F.array(*[F.lit(t) for t in types]),
                      (F.abs(F.xxhash64("id")) % 4 + 1).cast("int"))
                  .alias("event_type"),
                  F.timestamp_seconds(
                      F.lit(base) + (F.col("id") * 97) % 250_000)
                  .alias("ts")))
    ev = ev.localCheckpoint(eager=True)
    # time-ordered delivery: first half of the time range, then the rest
    cut = base + 125_000
    (ev.filter(F.col("ts") < F.timestamp_seconds(F.lit(cut)))
     .repartition(1).write.parquet(src))
    _time.sleep(1.1)
    (ev.filter(F.col("ts") >= F.timestamp_seconds(F.lit(cut)))
     .repartition(1).write.mode("append").parquet(src))

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_funnel_stream(stream, out_dir, ckpt,
                            steps=["view", "click", "purchase"],
                            horizon_secs=86_400,
                            trigger={"availableNow": True})
    _await_done(q)

    log = spark.read.parquet(out_dir)
    # no (user, stage) pair emitted twice
    assert (log.groupBy("user_id", "stage").count()
            .filter(F.col("count") > 1).count()) == 0
    got = {r.stage: r.n for r in
           (log.groupBy("stage")
            .agg(F.countDistinct("user_id").alias("n")).collect())}
    want = {r.stage: r.n_users for r in
            funnel(ev, ["view", "click", "purchase"],
                   horizon_secs=86_400).collect()}
    assert got == want and want[1] > want[3] > 0


def test_funnel_stream_shuffled_delivery_matches_batch(spark, tmpdir):
    """The ordered (lateness_secs) funnel mode closes the round-7
    caveat: stream ≡ batch must hold under DELIBERATE cross-batch
    disorder, not just time-ordered delivery. Events are delivered in
    an order skewed up to 20,000 s away from event time (files split by
    a jittered delivery key, far beyond single-batch sorting), with a
    25,000 s lateness bound; the per-stage conversion counts must equal
    the batch funnel and no (user, stage) may emit twice. Two trailing
    watermark-pusher events finalize the tail (their own rows stay
    above the final watermark, so they emit nothing)."""
    import time as _time

    from flow_pipeline_spark.operators.behavior import funnel
    from flow_pipeline_spark.streaming.jobs import start_funnel_stream

    src = f"{tmpdir}/fnord_src"
    out_dir, ckpt = f"{tmpdir}/fnord_out", f"{tmpdir}/fnord_ckpt"
    base = 1_600_000_000
    types = ["view", "click", "purchase", "error"]
    ev = (spark.range(4000)
          .select((F.col("id") % 120).alias("user_id"),
                  F.element_at(
                      F.array(*[F.lit(t) for t in types]),
                      (F.abs(F.xxhash64("id")) % 4 + 1).cast("int"))
                  .alias("event_type"),
                  F.timestamp_seconds(
                      F.lit(base) + (F.col("id") * 97) % 250_000)
                  .alias("ts")))
    ev = ev.localCheckpoint(eager=True)

    # delivery order = event time + per-event jitter up to 20,000 s —
    # an event can arrive AFTER events from 20,000 s of its future,
    # across micro-batch boundaries (8 sequential delivery files)
    ranked = ev.withColumn(
        "dk", F.unix_timestamp("ts")
        + F.abs(F.xxhash64("user_id", "ts")) % 20_000)
    cuts = [base + 270_000 * (i + 1) // 8 for i in range(7)]
    lo = None
    for i, hi in enumerate(cuts + [None]):
        sl = ranked
        if lo is not None:
            sl = sl.filter(F.col("dk") >= lo)
        if hi is not None:
            sl = sl.filter(F.col("dk") < hi)
        sl.drop("dk").repartition(1).write.mode("append").parquet(src)
        lo = hi
        _time.sleep(0.05)
    # trailing watermark pushers: step-type events for unused users
    # whose timestamps drag the watermark past every buffered event
    for j, off in enumerate((300_000, 301_000)):
        (spark.createDataFrame(
            [(1_000_001 + j, "view")], "user_id long, event_type string")
         .select("user_id", "event_type",
                 F.timestamp_seconds(F.lit(base + off)).alias("ts"))
         .repartition(1).write.mode("append").parquet(src))

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_funnel_stream(stream, out_dir, ckpt,
                            steps=["view", "click", "purchase"],
                            horizon_secs=86_400,
                            lateness_secs=25_000,
                            trigger={"availableNow": True})
    _await_done(q)

    log = spark.read.parquet(out_dir)
    assert log.filter(F.col("user_id") > 1_000_000).count() == 0
    assert (log.groupBy("user_id", "stage").count()
            .filter(F.col("count") > 1).count()) == 0
    got = {r.stage: r.n for r in
           (log.groupBy("stage")
            .agg(F.countDistinct("user_id").alias("n")).collect())}
    want = {r.stage: r.n_users for r in
            funnel(ev, ["view", "click", "purchase"],
                   horizon_secs=86_400).collect()}
    assert got == want and want[1] > want[3] > 0


def test_cdc_stream_matches_batch_compaction(spark, tmpdir):
    """start_cdc_stream: after three micro-batches of upserts/deletes
    (maxFilesPerTrigger=1 forces per-file epochs), the store equals
    latest_state over the concatenated batches — and tombstoned keys
    stay OUT of the reader view even though a delete arrived in an
    EARLIER epoch than a replayed older live row (the resurrect
    guard that makes the store keep winning tombstones)."""
    import datetime as dt

    from flow_pipeline_spark.operators.cdc import latest_state
    from flow_pipeline_spark.streaming.jobs import (read_cdc_store,
                                                    start_cdc_stream)

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    b1 = [("A", ts(1), 1, "a1", False), ("B", ts(1), 2, "b1", False)]
    b2 = [("A", ts(2), 3, "a2", False), ("B", ts(3), 4, "b1", True)]
    # epoch 3 replays B's OLD live row (late redelivery) — must NOT
    # resurrect B; C arrives fresh
    b3 = [("B", ts(1), 2, "b1", False), ("C", ts(4), 5, "c1", False)]
    schema = "k string, ts timestamp, eid long, state string, del boolean"
    src = f"{tmpdir}/cdc_src"
    for i, rows in enumerate([b1, b2, b3]):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.mode("append").parquet(src)

    store, ckpt = f"{tmpdir}/cdc_store", f"{tmpdir}/cdc_ckpt"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_cdc_stream(stream, store, ckpt, keys=["k"],
                         order_cols=["ts", "eid"],
                         trigger={"availableNow": True})
    _await_done(q)

    live = {r["k"]: r for r in
            read_cdc_store(spark, store, deleted_col="del").collect()}
    assert set(live) == {"A", "C"}
    assert live["A"]["state"] == "a2"

    batch = spark.createDataFrame(b1 + b2 + b3, schema)
    expect = {(r["k"], r["state"], r["del"]) for r in
              latest_state(batch, ["k"], ["ts", "eid"]).collect()}
    got = {(r["k"], r["state"], r["del"]) for r in
           read_cdc_store(spark, store).collect()}  # no filter: all rows
    assert got == expect            # stream store ≡ batch compaction
    assert ("B", "b1", True) in got  # tombstone retained in the store


def test_pointer_swap_crash_injection_every_publish_step(spark, tmpdir):
    """Crash-inject the pointer-swap publish sequence at EVERY step
    (write → manifest → pre-flip salvage → flip → post-flip salvage →
    GC) and verify the two protocol invariants after each crash: a
    reader always gets one complete published snapshot (never a gap,
    never a mix), and retrying the publish converges to the new
    snapshot with no version-dir debris."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs

    class Boom(Exception):
        pass

    store = f"{tmpdir}/crash_inject_store"
    jobs._swap_in(store, lambda d:
                  spark.range(5).write.mode("overwrite").parquet(d))
    assert jobs.read_state_store(spark, store).count() == 5

    def write9(d):
        spark.range(9).write.mode("overwrite").parquet(d)

    # step 1: crash inside the snapshot write itself
    def crash_write(d):
        write9(d)
        raise Boom()

    for step, patched, fn in [
        ("write", None, crash_write),
        ("manifest", "_read_manifest", write9),      # placeholder below
        ("pre-flip-flip", "_publish_pointer", write9),
        ("post-flip-gc", "_gc_versions", write9),
    ]:
        if step == "write":
            try:
                jobs._swap_in(store, fn)
            except Boom:
                pass
        elif step == "manifest":
            # crash between the manifest fsync and the pointer flip:
            # simulated by blowing up in the pre-flip _salvage_into
            real = jobs._salvage_into
            calls = {"n": 0}

            def boom_salvage(*a, **kw):
                calls["n"] += 1
                raise Boom()
            jobs._salvage_into = boom_salvage
            try:
                jobs._swap_in(store, fn, salvage_known=set())
            except Boom:
                pass
            finally:
                jobs._salvage_into = real
            assert calls["n"] == 1
        elif step == "pre-flip-flip":
            real = jobs._publish_pointer

            def boom_publish(*a, **kw):
                raise Boom()
            jobs._publish_pointer = boom_publish
            try:
                jobs._swap_in(store, fn)
            except Boom:
                pass
            finally:
                jobs._publish_pointer = real
        else:
            real = jobs._gc_versions

            def boom_gc(*a, **kw):
                raise Boom()
            jobs._gc_versions = boom_gc
            try:
                jobs._swap_in(store, fn)        # flip SUCCEEDED, GC died
            except Boom:
                pass
            finally:
                jobs._gc_versions = real
        # invariant 1: a reader still sees exactly one complete snapshot
        n = jobs.read_state_store(spark, store).count()
        if step == "post-flip-gc":
            assert n == 9       # the flip happened before the crash
        else:
            assert n == 5       # pre-flip crash: old snapshot intact
        # invariant 2: a clean retry converges (and GCs the debris)
        jobs._swap_in(store, write9)
        assert jobs.read_state_store(spark, store).count() == 9
        vnames = jobs._version_names(store)
        assert len(vnames) <= 2, (step, vnames)   # current + grace only
        # reset to the 5-row snapshot for the next step's asserts
        jobs._swap_in(store, lambda d:
                      spark.range(5).write.mode("overwrite").parquet(d))
        assert jobs.read_state_store(spark, store).count() == 5


def test_pointer_swap_garbage_version_is_invisible_and_collected(
        spark, tmpdir):
    """A crashed unpublished write leaves a garbage version dir. It must
    be invisible to readers (the pointer never named it) and deleted by
    the next successful publish's GC — and the next publish must pick a
    FRESH version number, never reuse the garbage name."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs

    store = f"{tmpdir}/garbage_store"
    jobs._swap_in(store, lambda d:
                  spark.range(5).write.mode("overwrite").parquet(d))
    # plant garbage: a half-written unpublished version
    garbage = _os.path.join(store, jobs._next_version_name(store))
    _os.makedirs(f"{garbage}/sub")
    with open(f"{garbage}/sub/partial.bin", "wb") as f:
        f.write(b"x" * 128)
    assert jobs.read_state_store(spark, store).count() == 5
    jobs._swap_in(store, lambda d:
                  spark.range(9).write.mode("overwrite").parquet(d))
    assert jobs.read_state_store(spark, store).count() == 9
    assert _os.path.basename(garbage) not in jobs._version_names(store)
    cur, prev = jobs._read_pointer(store)
    assert int(cur[1:]) > int(_os.path.basename(garbage)[1:])


def _land_plain_epoch(cur: str, name: str, content: str) -> None:
    """Plant a complete epoch-style entry (part file + _SUCCESS) with
    plain files — the pointer protocol is file-level, so these pure-FS
    tests need no Spark write."""
    import os as _os
    d = _os.path.join(cur, name)
    _os.makedirs(d, exist_ok=True)
    with open(_os.path.join(d, "part-0"), "w") as f:
        f.write(content)
    open(_os.path.join(d, "_SUCCESS"), "w").close()


def test_merged_epoch_not_resurrected_one_generation_later(tmp_path):
    """Round-8 review, HIGH: the orphan predicate must union the
    manifests of ALL on-disk versions newer than the candidate — the
    proof that an epoch was merged can live in an INTERMEDIATE
    version's manifest. Scenario: epoch=7 is merged at publish P1
    (named only in v1's manifest), the appender lands epoch=8, and P2
    crashes after the pointer flip but before GC, leaving v0(epoch=7),
    v1(epoch=-1,epoch=8,manifest={epoch=7}), v2(epoch=-1) on disk.
    The next resolve's orphan sweep — and the next publish's GC — must
    NOT salvage epoch=7 back in (its partials are already folded into
    epoch=-1; resurrection would permanently double-count it), while a
    genuinely unmerged epoch in the same stale version IS rescued."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs

    class Boom(Exception):
        pass

    store = str(tmp_path / "chain_store")
    v0 = jobs._init_store(store)
    _land_plain_epoch(v0, "epoch=7", "seven")
    # P1: merge epoch=7 -> v1{epoch=-1}; GC retains v0 as reader grace
    jobs._swap_in(store, lambda d: _land_plain_epoch(d, "epoch=-1", "m7"),
                  salvage_known={"epoch=7"})
    cur = jobs._resolve_store(store)
    _land_plain_epoch(cur, "epoch=8", "eight")
    # P2: merge {epoch=-1, epoch=8} -> v2; crash AFTER flip, BEFORE GC
    real_gc = jobs._gc_versions
    jobs._gc_versions = lambda *a, **k: (_ for _ in ()).throw(Boom())
    try:
        jobs._swap_in(store, lambda d: _land_plain_epoch(d, "epoch=-1", "m78"),
                      salvage_known={"epoch=-1", "epoch=8"})
    except Boom:
        pass
    finally:
        jobs._gc_versions = real_gc
    assert len(jobs._version_names(store)) == 3      # the crash window

    # orphan sweep at the very next resolve: epoch=7 must stay merged
    cur = jobs._resolve_store(store)
    entries = {e for e in _os.listdir(cur) if not e.startswith((".", "_"))}
    assert entries == {"epoch=-1"}, entries

    # a TRUE orphan in the same stale v0 must still be rescued
    _land_plain_epoch(_os.path.join(store, "v00000000"), "epoch=5", "five")
    cur = jobs._resolve_store(store)
    entries = {e for e in _os.listdir(cur) if not e.startswith((".", "_"))}
    assert entries == {"epoch=-1", "epoch=5"}

    # GC path: the next publish dooms BOTH v0 and v1; v1 (the evidence
    # holder for epoch=7) is rmtree'd first — the manifests must have
    # been gathered before any delete, so epoch=7 still stays merged
    jobs._swap_in(store, lambda d: _land_plain_epoch(d, "epoch=-1", "mall"),
                  salvage_known={"epoch=-1", "epoch=5"})
    cur = jobs._resolve_store(store)
    entries = {e for e in _os.listdir(cur) if not e.startswith((".", "_"))}
    assert entries == {"epoch=-1"}
    assert len(jobs._version_names(store)) <= 2      # debris collected

    with open(_os.path.join(cur, "epoch=-1", "part-0")) as fh:
        assert fh.read() == "mall"


def test_rescue_copy_skips_source_gcd_mid_copy(tmp_path):
    """Round-8 review, low: a reader's orphan sweep racing a concurrent
    publish's GC rmtree must not crash the read — if the source version
    vanished mid-copy, the GC that deleted it already proved the entry
    merged (or salvaged it itself), so skipping is correct. An OSError
    with the source still present is a real fault and must re-raise."""
    import os as _os

    import pytest as _pytest

    from flow_pipeline_spark.streaming import jobs

    src = str(tmp_path / "gone" / "epoch=3")
    dst = str(tmp_path / "cur" / "epoch=3")
    _os.makedirs(_os.path.dirname(dst))
    # source vanished before the copy: silent no-op
    jobs._rescue_copy(src, dst)
    assert not _os.path.exists(dst)
    # source present but destination parent is a plain FILE (tests run
    # as root, so a permission block wouldn't bite): real fault
    _land_plain_epoch(str(tmp_path / "gone"), "epoch=3", "three")
    blocked = str(tmp_path / "blocked")
    open(blocked, "w").close()
    with _pytest.raises(OSError):
        jobs._rescue_copy(src, _os.path.join(blocked, "epoch=3"))


def test_rescue_copy_skips_nested_file_gcd_mid_copy(tmp_path):
    """Round-9 review, low: rmtree deletes bottom-up, so a racing GC can
    remove a nested part file while the entry DIRECTORY still exists —
    gating the skip on exists(src) (the round-8 form) re-raised exactly
    there and crashed the pure reader's resolve. A FileNotFoundError
    from the copy is always the race and must skip, entry dir present
    or not."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs
    from flow_pipeline_spark.streaming.store_io import LOCAL_IO

    src = str(tmp_path / "gone" / "epoch=3")
    _land_plain_epoch(str(tmp_path / "gone"), "epoch=3", "three")
    dst = str(tmp_path / "cur" / "epoch=3")
    _os.makedirs(_os.path.dirname(dst))

    class _BottomUpGC:
        """Part file vanishes between listdir and copy; dir remains."""

        def __getattr__(self, name):
            return getattr(LOCAL_IO, name)

        def copy_file_atomic(self, s, d):
            raise FileNotFoundError(s)

    old = jobs._IO
    jobs._IO = _BottomUpGC()
    try:
        jobs._rescue_copy(src, dst)        # must not raise
    finally:
        jobs._IO = old
    assert _os.path.isdir(src)             # entry dir was still present


class _InjectedCrash(Exception):
    """Deliberately NOT an OSError: the protocol swallows OSError only
    where it can re-prove safety (e.g. _rescue_copy when the source is
    gone) — an injected crash must always propagate like a process
    death would."""


class _FaultyIO:
    """store_io seam wrapper that dies on the k-th call (mutating AND
    read primitives — a store outage can interrupt a publish at either),
    modeling a crash at every point of the protocol's IO sequence
    rather than at hand-picked steps."""

    PRIMITIVES = ("listdir", "exists", "isdir", "read_text",
                  "makedirs", "rmtree", "publish_text", "copy_file_atomic")

    def __init__(self, inner, fail_at=None):
        self._inner = inner
        self.fail_at = fail_at
        self.calls = 0

    def _step(self):
        self.calls += 1
        if self.fail_at is not None and self.calls > self.fail_at:
            raise _InjectedCrash(f"injected at IO call {self.fail_at}")

    def __getattr__(self, name):
        if name not in self.PRIMITIVES:
            raise AttributeError(name)
        inner_fn = getattr(self._inner, name)

        def wrapped(*a, **kw):
            self._step()
            return inner_fn(*a, **kw)
        return wrapped


def _store_total(jobs, store: str) -> int:
    """Sum of the plain-file epoch values visible through one resolve —
    the double-count/loss detector: epoch=-1 carries the merged sum, so
    the total must equal the sum of every landed epoch EXACTLY once."""
    import os as _os
    cur = jobs._resolve_store(store)
    total = 0
    for e in _os.listdir(cur):
        if e.startswith((".", "_")):
            continue
        with open(_os.path.join(cur, e, "part-0")) as fh:
            total += int(fh.read())
    return total


def _make_store_io(kind: str):
    """Healthy store-IO instance per backend semantics class."""
    from flow_pipeline_spark.streaming.store_io import (LOCAL_IO,
                                                        S3LikeStoreIO)
    return LOCAL_IO if kind == "posix" else S3LikeStoreIO()


@pytest.mark.parametrize("io_kind", ["posix", "s3"])
def test_pointer_protocol_crash_inject_through_io_seam(tmp_path, io_kind):
    """Generalized crash injection: run the compaction-form publish
    scenario (P1 merges epoch=7, appender lands epoch=8, P2 merges
    {epoch=-1, epoch=8}) and kill the store-IO seam at EVERY k-th call
    of P2 in turn. After each crash, with healthy IO restored: (a) a
    reader resolves one complete snapshot whose merged total is exactly
    7+8=15 — no loss, no double count, whichever side of the flip the
    crash landed on; (b) a clean compaction retry converges to a single
    merged entry and ≤2 retained versions. Round 10: parametrized over
    BOTH backend semantics classes — POSIX (atomic rename + fsync) and
    the S3-like object store (atomic single-object PUT, per-object
    DELETEs, no directory fsync) — so the seam-contract argument is
    exercised against object-store behavior, not just asserted."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs
    from flow_pipeline_spark.streaming.store_io import LOCAL_IO

    def mini_compact(store):
        """The compactor's shape: merge every visible entry's value
        into a fresh epoch=-1, salvage_known = the merged entries."""
        cur = jobs._resolve_store(store)
        entries = [e for e in _os.listdir(cur)
                   if not e.startswith((".", "_"))]
        total = 0
        for e in entries:
            with open(_os.path.join(cur, e, "part-0")) as fh:
                total += int(fh.read())
        jobs._swap_in(
            store, lambda d: _land_plain_epoch(d, "epoch=-1", str(total)),
            salvage_known=set(entries))

    def build(store):
        v0 = jobs._init_store(store)
        _land_plain_epoch(v0, "epoch=7", "7")
        mini_compact(store)                      # P1: epoch=-1 == 7
        _land_plain_epoch(jobs._resolve_store(store), "epoch=8", "8")

    healthy = _make_store_io(io_kind)
    try:
        jobs._IO = healthy
        # probe: count P2's IO calls on a healthy store
        probe = str(tmp_path / "probe")
        build(probe)
        counter = _FaultyIO(healthy, fail_at=None)
        jobs._IO = counter
        try:
            mini_compact(probe)
        finally:
            jobs._IO = healthy
        n_calls = counter.calls
        assert n_calls > 10, n_calls   # sanity: the seam is in use
        assert _store_total(jobs, probe) == 15

        crashed_at = 0
        for k in range(n_calls):
            store = str(tmp_path / f"s{k}")
            build(store)
            jobs._IO = _FaultyIO(healthy, fail_at=k)
            try:
                mini_compact(store)
            except _InjectedCrash:
                crashed_at += 1
            finally:
                jobs._IO = healthy
            # (a) reader sees one complete snapshot; exactly-once total
            assert _store_total(jobs, store) == 15, f"crash at call {k}"
            # (b) clean retry converges
            mini_compact(store)
            assert _store_total(jobs, store) == 15, f"retry at {k}"
            cur = jobs._resolve_store(store)
            entries = {e for e in _os.listdir(cur)
                       if not e.startswith((".", "_"))}
            assert entries == {"epoch=-1"}, (k, entries)
            assert len(jobs._version_names(store)) <= 2, k
        assert crashed_at == n_calls   # every injection actually fired
    finally:
        jobs._IO = LOCAL_IO


@pytest.mark.parametrize("io_kind", ["posix", "s3"])
def test_state_store_crash_inject_through_io_seam(tmp_path, io_kind):
    """Same seam-level injection for the state-store form
    (salvage_known=None, manifest '*'): after a crash at any IO call of
    a v2 publish, a reader sees EITHER the complete old state or the
    complete new state — never a mix — and a clean retry lands the new
    state with ≤2 versions retained. Round 10: runs under BOTH POSIX
    and S3-like object-store semantics."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs
    from flow_pipeline_spark.streaming.store_io import LOCAL_IO

    def write_state(tag):
        return lambda d: _land_plain_epoch(d, "state", tag)

    def read_state(store):
        cur = jobs._resolve_store(store)
        with open(_os.path.join(cur, "state", "part-0")) as fh:
            return fh.read()

    healthy = _make_store_io(io_kind)
    try:
        jobs._IO = healthy
        probe = str(tmp_path / "probe")
        jobs._swap_in(probe, write_state("old"))
        counter = _FaultyIO(healthy, fail_at=None)
        jobs._IO = counter
        try:
            jobs._swap_in(probe, write_state("new"))
        finally:
            jobs._IO = healthy
        n_calls = counter.calls
        assert read_state(probe) == "new"

        for k in range(n_calls):
            store = str(tmp_path / f"st{k}")
            jobs._swap_in(store, write_state("old"))
            jobs._IO = _FaultyIO(healthy, fail_at=k)
            try:
                jobs._swap_in(store, write_state("new"))
            except _InjectedCrash:
                pass
            finally:
                jobs._IO = healthy
            assert read_state(store) in ("old", "new"), k  # never torn
            jobs._swap_in(store, write_state("new"))
            assert read_state(store) == "new", k
            assert len(jobs._version_names(store)) <= 2, k
    finally:
        jobs._IO = LOCAL_IO


def test_pointer_protocol_survives_mid_rmtree_crash_s3(tmp_path):
    """Object stores have NO atomic bulk delete — a GC sweep is one
    DELETE per object and can die between any two. Kill the S3-like
    backend at EVERY k-th DELETE of the P2 publish's GC in turn: the
    reader must still resolve one complete snapshot with the exactly-
    once total (a half-deleted version is garbage the next publish
    re-GCs, never evidence), and a clean retry converges."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs
    from flow_pipeline_spark.streaming.store_io import (LOCAL_IO,
                                                        S3LikeStoreIO)

    def mini_compact(store):
        cur = jobs._resolve_store(store)
        entries = [e for e in _os.listdir(cur)
                   if not e.startswith((".", "_"))]
        total = 0
        for e in entries:
            with open(_os.path.join(cur, e, "part-0")) as fh:
                total += int(fh.read())
        jobs._swap_in(
            store, lambda d: _land_plain_epoch(d, "epoch=-1", str(total)),
            salvage_known=set(entries))

    def build(store):
        v0 = jobs._init_store(store)
        _land_plain_epoch(v0, "epoch=7", "7")
        mini_compact(store)
        _land_plain_epoch(jobs._resolve_store(store), "epoch=8", "8")

    try:
        # probe: count P2's DELETEs on a healthy S3 backend
        probe_io = S3LikeStoreIO()
        jobs._IO = probe_io
        probe = str(tmp_path / "probe")
        build(probe)
        probe_io.delete_calls = 0         # count P2's sweep only
        mini_compact(probe)
        n_deletes = probe_io.delete_calls
        assert n_deletes >= 2, n_deletes  # the GC sweep actually deletes
        assert _store_total(jobs, probe) == 15

        for k in range(1, n_deletes + 1):
            def killer(i, k=k):
                if i == k:
                    raise _InjectedCrash(f"DELETE {i}")

            store = str(tmp_path / f"d{k}")
            jobs._IO = S3LikeStoreIO()
            build(store)
            jobs._IO = S3LikeStoreIO(delete_hook=killer)
            try:
                mini_compact(store)
            except _InjectedCrash:
                pass
            jobs._IO = S3LikeStoreIO()
            assert _store_total(jobs, store) == 15, f"DELETE crash {k}"
            mini_compact(store)
            assert _store_total(jobs, store) == 15, f"retry after {k}"
            cur = jobs._resolve_store(store)
            entries = {e for e in _os.listdir(cur)
                       if not e.startswith((".", "_"))}
            assert entries == {"epoch=-1"}, (k, entries)
    finally:
        jobs._IO = LOCAL_IO


def test_pointer_flip_lost_cas_is_safe_s3(tmp_path):
    """On an object store the pointer flip is a CONDITIONAL PUT — it
    can LOSE the If-Match race instead of succeeding last-writer-wins.
    Make every n-th publish_text of the P2 publish lose in turn
    (StoreConditionFailed): the losing publish must leave the old
    snapshot fully readable at the exactly-once total, and a retry
    under a healthy backend converges — a lost CAS is just one more
    mid-flight death the protocol already survives."""
    import os as _os

    from flow_pipeline_spark.streaming import jobs
    from flow_pipeline_spark.streaming.store_io import (
        LOCAL_IO, S3LikeStoreIO, StoreConditionFailed)

    def mini_compact(store):
        cur = jobs._resolve_store(store)
        entries = [e for e in _os.listdir(cur)
                   if not e.startswith((".", "_"))]
        total = 0
        for e in entries:
            with open(_os.path.join(cur, e, "part-0")) as fh:
                total += int(fh.read())
        jobs._swap_in(
            store, lambda d: _land_plain_epoch(d, "epoch=-1", str(total)),
            salvage_known=set(entries))

    def build(store):
        v0 = jobs._init_store(store)
        _land_plain_epoch(v0, "epoch=7", "7")
        mini_compact(store)
        _land_plain_epoch(jobs._resolve_store(store), "epoch=8", "8")

    try:
        probe_io = S3LikeStoreIO()
        jobs._IO = probe_io
        probe = str(tmp_path / "probe")
        build(probe)
        before = probe_io.put_calls
        mini_compact(probe)
        n_puts = probe_io.put_calls - before
        assert n_puts >= 2, n_puts      # manifest + pointer at least

        for k in range(1, n_puts + 1):
            store = str(tmp_path / f"c{k}")
            jobs._IO = S3LikeStoreIO()
            build(store)
            jobs._IO = S3LikeStoreIO(cas_fail_at={k})
            lost = False
            try:
                mini_compact(store)
            except StoreConditionFailed:
                lost = True
            jobs._IO = S3LikeStoreIO()
            assert lost, k              # the injection actually fired
            assert _store_total(jobs, store) == 15, f"lost CAS at {k}"
            mini_compact(store)
            assert _store_total(jobs, store) == 15, f"retry after {k}"
            assert len(jobs._version_names(store)) <= 2, k
    finally:
        jobs._IO = LOCAL_IO


def _drive_ordered_funnel(fn, deliveries, watermarks):
    """Run the ordered kernel over per-batch event lists [(us, type), ...]
    with the given per-batch watermark (µs), through the shared
    _FakeGroupState double (defined further down, with the
    strictly-above-watermark timeout contract built in); returns
    (emitted rows, per-batch buffer sizes, final state)."""
    import pandas as pd

    st = _FakeGroupState()
    rows, buf_sizes = [], []
    for evs, wm_us in zip(deliveries, watermarks):
        st.watermark_ms = wm_us // 1000
        pdfs = []
        if evs:
            pdfs = [pd.DataFrame({
                "ts": pd.to_datetime([e[0] for e in evs], unit="us"),
                "event_type": [e[1] for e in evs]})]
        for out in fn(("u1",), iter(pdfs), st):
            rows += [(int(r.stage), r.stage_ts.value // 1000)
                     for r in out.itertuples(index=False)]
        buf_sizes.append(len(st._v[4]) if st._v else 0)
    return rows, buf_sizes, st._v


def test_ordered_funnel_kernel_stress_adversarial_delivery():
    """Round-9 (VERDICT r8 item #6) — the stateful-store-style stress
    for the watermark-buffered funnel kernel: random event sequences
    (duplicate timestamps, events exactly AT the frontier, decoy types),
    random cross-batch shuffles, stalled-then-jumping watermark
    schedules. Invariants per case: (a) emitted transitions are
    IDENTICAL to the canonical single-batch, fully-watermarked delivery
    — cross-batch disorder admitted by the watermark can never change
    the funnel; (b) the buffered state is bounded by the number of
    above-watermark events (a hostile trickle cannot grow state past
    the stall window); (c) a converted user's buffer is cleared; (d)
    every armed timeout is strictly future (asserted in the fake)."""
    import random

    from flow_pipeline_spark.streaming.stateful import \
        _make_ordered_funnel_fn

    steps = ["view", "cart", "buy"]

    for seed in range(120):
        rng = random.Random(seed)
        n_ev = rng.randint(1, 14)
        # small timestamp universe (1-8 ms) forces duplicate timestamps
        # and frontier ties; decoy types exercise the non-step skip
        evs = sorted((rng.randint(1, 8) * 1000, rng.choice(
            steps + ["decoy"])) for _ in range(n_ev))
        horizon = rng.choice([None, 5])     # 5 ms horizon sometimes
        fn = _make_ordered_funnel_fn(steps, horizon)

        # canonical: one batch, then watermark jumps past everything
        canon, _, _ = _drive_ordered_funnel(
            fn, [evs, []], [0, 10_000_000])

        # adversarial: monotone watermark schedule with stalls and
        # jumps; each event lands in a uniformly-chosen batch the
        # watermark still admits (wm before that batch < ts — the
        # Spark admission rule)
        n_batches = rng.randint(2, 6)
        wms = [0]
        for _ in range(n_batches - 1):
            wms.append(wms[-1] + rng.choice([0, 0, 2000, 3000, 9000]))
        deliveries = [[] for _ in range(n_batches)]
        for ts, ty in evs:
            ok = [b for b in range(n_batches)
                  if (wms[b - 1] if b else 0) < ts]
            deliveries[rng.choice(ok)].append((ts, ty))
        for d in deliveries:
            rng.shuffle(d)              # disorder within the batch too
        # final drain: watermark passes everything
        deliveries.append([])
        wms.append(10_000_000)

        fn2 = _make_ordered_funnel_fn(steps, horizon)
        got, buf_sizes, final = _drive_ordered_funnel(
            fn2, deliveries, wms)
        assert got == canon, (seed, got, canon, deliveries, wms)

        # state bound: buffer never exceeds the user's delivered
        # events still above that batch's watermark
        delivered = []
        for b, d in enumerate(deliveries):
            delivered += d
            above = sum(1 for ts, ty in delivered
                        if ts > wms[b] and ty in steps)
            assert buf_sizes[b] <= above, (seed, b, buf_sizes, above)
        assert buf_sizes[-1] == 0       # fully drained at the end
        if final and final[0] >= len(steps):
            assert not final[4]         # converted => buffer cleared


def test_ordered_funnel_kernel_hostile_trickle_state_bound():
    """A stalled watermark with a steady drip of future events must
    grow state linearly in the STALL WINDOW's events only, and the
    whole backlog must process in event-time order (one emission
    sequence) the moment the watermark finally advances."""
    from flow_pipeline_spark.streaming.stateful import \
        _make_ordered_funnel_fn

    steps = ["a", "b", "c"]
    fn = _make_ordered_funnel_fn(steps, None)
    # 30 batches of one event each, watermark pinned at 0 the whole
    # time, then one draining batch where it finally jumps
    evs = [((i + 1) * 1000, steps[i % 3]) for i in range(30)]
    deliveries = [[e] for e in evs] + [[]]
    wms = [0] * 30 + [10_000_000]
    rows, buf_sizes, final = _drive_ordered_funnel(fn, deliveries, wms)
    # stalled phase: nothing emitted, state linear in buffered events
    assert buf_sizes[:30] == list(range(1, 31))
    # drain: a->b->c in event-time order, then conversion clears all
    assert [s for s, _ in rows] == [1, 2, 3]
    assert [t for _, t in rows] == [1000, 2000, 3000]
    assert buf_sizes[30] == 0 and final[0] == 3 and not final[4]


def test_compaction_retry_bounded_lower_for_fallback_classification(
        monkeypatch, tmp_path):
    """Round-8 advice: substring-matched transience (a condition-less
    exception whose message merely mentions FileNotFoundException) is
    weaker evidence than Spark's structured error condition — it gets
    ONE retry (2 attempts total), while a condition-classified stale
    listing keeps the full budget (4 attempts)."""
    from flow_pipeline_spark.streaming import jobs

    calls = {"n": 0}

    class CondErr(Exception):
        def getCondition(self):
            return "PATH_NOT_FOUND"

    def make_raiser(exc):
        def raiser(spark, d):
            calls["n"] += 1
            raise exc
        return raiser

    monkeypatch.setattr(
        jobs, "_run_compaction_once",
        make_raiser(Exception("java.io.FileNotFoundException: perm gone")))
    monkeypatch.setattr(__import__("time"), "sleep", lambda s: None)
    try:
        jobs.run_compaction(None, str(tmp_path))
    except Exception:
        pass
    assert calls["n"] == 2          # fallback class: one retry only

    calls["n"] = 0
    monkeypatch.setattr(jobs, "_run_compaction_once",
                        make_raiser(CondErr("stale listing")))
    try:
        jobs.run_compaction(None, str(tmp_path))
    except Exception:
        pass
    assert calls["n"] == 4          # condition class: full budget

    calls["n"] = 0
    monkeypatch.setattr(jobs, "_run_compaction_once",
                        make_raiser(ValueError("not transient at all")))
    try:
        jobs.run_compaction(None, str(tmp_path))
    except Exception:
        pass
    assert calls["n"] == 1          # unclassified: no retry


def test_read_cdc_store_recovers_mid_swap_crash(spark, tmpdir):
    """A writer crash between _swap_in's two renames leaves the store
    directory MISSING with the superseded snapshot parked at
    ``._swap_old`` — until round 5 a reader hitting that gap got
    FileNotFound. read_cdc_store (and read_state_store) now run
    _recover_swap first, so the reader sees the intact old snapshot."""
    import os

    from flow_pipeline_spark.streaming.jobs import (read_cdc_store,
                                                    read_state_store)

    store = f"{tmpdir}/crashed_store"
    rows = [("A", 1, False), ("B", 2, None)]
    spark.createDataFrame(rows, "k string, v long, del boolean") \
        .write.parquet(store)
    # simulate the crash window: first rename done, second never ran
    os.rename(store, store + "._swap_old")
    assert not os.path.isdir(store)

    live = {r["k"] for r in
            read_cdc_store(spark, store, deleted_col="del").collect()}
    assert live == {"A", "B"}       # NULL flag counts as live
    assert os.path.isdir(store)     # the read repaired the directory
    assert not os.path.isdir(store + "._swap_old")
    assert read_state_store(spark, store).count() == 2


def test_uniq_state_stream_matches_batch_and_survives_replay(spark, tmpdir):
    """start_uniq_state_stream: after streaming the events in three
    epochs, merging the STORE gives byte-identical registers/estimates
    to a single batch build over all rows (max-merge associativity);
    and re-running the SAME stream into the store (simulated replay —
    fresh checkpoint, same files) changes nothing (idempotence)."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        uniq_register_merge, uniq_register_state)
    from flow_pipeline_spark.streaming.jobs import (read_state_store,
                                                    start_uniq_state_stream)

    df = spark.range(3000).select(
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") % 611).cast("string").alias("v"))
    src = f"{tmpdir}/uniq_src"
    for i in range(3):
        spark.range(3000).filter(F.col("id") % 3 == i).select(
            (F.col("id") % 4).cast("string").alias("k"),
            (F.col("id") % 611).cast("string").alias("v")) \
            .repartition(1).write.mode("append").parquet(src)

    store, ckpt = f"{tmpdir}/uniq_store", f"{tmpdir}/uniq_ckpt"
    schema = spark.read.parquet(src).schema

    def run(ck):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_uniq_state_stream(stream, store, ck, keys=["k"],
                                    value_col="v",
                                    trigger={"availableNow": True})
        _await_done(q)

    run(ckpt)
    stored = read_state_store(spark, store)
    got = {r["k"]: (r["n_regs"], r["s_scaled"], r["est_e2"])
           for r in uniq_register_merge(stored, ["k"]).collect()}
    batch = uniq_register_state(df, ["k"], "v")
    want = {r["k"]: (r["n_regs"], r["s_scaled"], r["est_e2"])
            for r in uniq_register_merge(batch, ["k"]).collect()}
    assert got == want

    run(f"{tmpdir}/uniq_ckpt2")          # full replay, fresh checkpoint
    again = {r["k"]: (r["n_regs"], r["s_scaled"], r["est_e2"])
             for r in uniq_register_merge(
                 read_state_store(spark, store), ["k"]).collect()}
    assert again == want


def test_bitmap_state_stream_matches_batch_and_overlap(spark, tmpdir):
    """start_bitmap_state_stream: after three epochs the store equals a
    single batch bitmap_state build (union associativity/idempotence);
    replay with a fresh checkpoint changes nothing; and a live segment
    overlap read from the store matches Python set algebra."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        bitmap_set_cardinalities, bitmap_state)
    from flow_pipeline_spark.streaming.jobs import (
        read_state_store, start_bitmap_state_stream)

    df = spark.range(900).select(
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("seg"),
        (F.col("id") % 211).alias("v"))
    src = f"{tmpdir}/bm_src"
    for i in range(3):
        spark.range(900).filter(F.col("id") % 3 == i).select(
            F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("seg"),
            (F.col("id") % 211).alias("v")) \
            .repartition(1).write.mode("append").parquet(src)

    store = f"{tmpdir}/bm_store"
    schema = spark.read.parquet(src).schema

    def run(ck):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_bitmap_state_stream(stream, store, ck, keys=["seg"],
                                      value_col="v", chunk_bits=4,
                                      trigger={"availableNow": True})
        _await_done(q)

    run(f"{tmpdir}/bm_ckpt")
    want = {(r["seg"], r["chunk"], tuple(r["vals"]))
            for r in bitmap_state(df, ["seg"], "v", chunk_bits=4).collect()}
    got = {(r["seg"], r["chunk"], tuple(r["vals"]))
           for r in read_state_store(spark, store).collect()}
    assert got == want

    run(f"{tmpdir}/bm_ckpt2")            # full replay, fresh checkpoint
    again = {(r["seg"], r["chunk"], tuple(r["vals"]))
             for r in read_state_store(spark, store).collect()}
    assert again == want

    st = read_state_store(spark, store)
    a = st.filter(F.col("seg") == "a").select("chunk", "vals")
    b = st.filter(F.col("seg") == "b").select("chunk", "vals")
    ov = bitmap_set_cardinalities(a, b).collect()[0]
    sa = {i % 211 for i in range(0, 900, 3)}
    sb = {i % 211 for i in range(900) if i % 3}
    assert (ov["a_card"], ov["b_card"], ov["and_card"], ov["or_card"],
            ov["andnot_card"]) == (len(sa), len(sb), len(sa & sb),
                                   len(sa | sb), len(sa - sb))


def test_state_store_swap_crash_recovery(spark, tmpdir):
    """The two crash windows of the store swap are repaired before the
    next epoch reads: (a) crash BETWEEN the renames (store missing,
    ._swap_old holds the snapshot) -> recovered, accumulated state NOT
    lost; (b) crash BEFORE old-cleanup (both dirs present) -> stale old
    removed, next swap does not brick on rename."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import (
        bitmap_cardinality, bitmap_state)
    from flow_pipeline_spark.streaming.jobs import (
        _recover_swap, read_state_store, start_bitmap_state_stream)

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.lit("s").alias("seg"), F.col("id").alias("v"))

    # NOT f"{tmpdir}/src": tmpdir is MODULE-scoped and the flow_source
    # fixture already writes FLOW-schema parquet there — appending this
    # test's (seg, v) rows into the same dir made schema inference pick
    # a nondeterministic footer (flaky UNRESOLVED_COLUMN under full-suite
    # runs; round-6 catch)
    src, store = f"{tmpdir}/swapcrash_src", f"{tmpdir}/swapcrash_store"
    batch(0, 100).repartition(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run(ck):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_bitmap_state_stream(stream, store, ck, keys=["seg"],
                                      value_col="v", chunk_bits=4,
                                      trigger={"availableNow": True})
        _await_done(q)

    run(f"{tmpdir}/ck1")

    # (a) simulate a crash between the two renames
    os.rename(store, store + "._swap_old")
    batch(100, 150).repartition(1).write.mode("append").parquet(src)
    run(f"{tmpdir}/ck2")                 # fresh checkpoint: full replay
    card = bitmap_cardinality(
        read_state_store(spark, store), ["seg"]).collect()[0]["card"]
    assert card == 150                   # 0..99 NOT lost, 100..149 added

    # (b) simulate a crash after swap-in but before old-cleanup
    shutil.copytree(store, store + "._swap_old")
    batch(150, 160).repartition(1).write.mode("append").parquet(src)
    run(f"{tmpdir}/ck3")                 # must not brick on rename
    card = bitmap_cardinality(
        read_state_store(spark, store), ["seg"]).collect()[0]["card"]
    assert card == 160
    assert not os.path.isdir(store + "._swap_old")

    # direct repair check: recovery puts a renamed-away store back
    os.rename(store, store + "._swap_old")
    _recover_swap(store)
    assert os.path.isdir(store) and not os.path.isdir(store + "._swap_old")


def test_kmv_state_stream_matches_batch_and_survives_replay(spark, tmpdir):
    """start_kmv_state_stream: the store after three epochs is
    byte-identical to a single batch kmv_state build (min-k union
    merge), and replaying everything into the store changes nothing."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.rollup import kmv_state
    from flow_pipeline_spark.streaming.jobs import (read_state_store,
                                                    start_kmv_state_stream)

    k = 16
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).alias("v"))
    src = f"{tmpdir}/kmv_src"
    for i in range(3):
        spark.range(2000).filter(F.col("id") % 3 == i).select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") % 700).alias("v")) \
            .repartition(1).write.mode("append").parquet(src)

    store = f"{tmpdir}/kmv_store"
    schema = spark.read.parquet(src).schema

    def run(ck):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_kmv_state_stream(stream, store, ck, keys=["g"],
                                   value_col="v", k=k,
                                   trigger={"availableNow": True})
        _await_done(q)

    run(f"{tmpdir}/kmv_ck1")
    want = {(r["g"], tuple(r["kmv"]))
            for r in kmv_state(df, ["g"], "v", k=k).collect()}
    got = {(r["g"], tuple(r["kmv"]))
           for r in read_state_store(spark, store).collect()}
    assert got == want

    run(f"{tmpdir}/kmv_ck2")              # full replay, fresh checkpoint
    again = {(r["g"], tuple(r["kmv"]))
             for r in read_state_store(spark, store).collect()}
    assert again == want


def test_rollup_epoch_replay_is_idempotent(spark, tmpdir, flow_source):
    """Round-7 review: the rollup stream's plain parquet append made a
    crash-replayed epoch DOUBLE its partials — and the summing algebra
    inflates every later read forever. The epoch-scoped overwrite must
    make a replay a byte-level no-op on the totals."""
    from flow_pipeline_spark.streaming import jobs

    src, _ = flow_source
    raw = flows_raw(spark.read.parquet(src))
    d = f"{tmpdir}/rollup_replay"
    jobs._write_rollup_epoch(raw, 3, d)
    once = spark.read.parquet(jobs._resolve_store(d)).count()
    jobs._write_rollup_epoch(raw, 3, d)    # crash-replay of epoch 3
    assert spark.read.parquet(jobs._resolve_store(d)).count() == once
    merged = read_rollup(spark, d)
    expect = rollup_flat(raw)
    assert merged.exceptAll(expect).isEmpty()
    assert expect.exceptAll(merged).isEmpty()


def test_compaction_salvages_epoch_landed_mid_compaction(
        spark, tmpdir, monkeypatch, flow_source):
    """Round-7 review: run_compaction racing a live rollup stream used
    to rmtree epoch directories the stream's checkpoint had already
    committed — permanent loss. The swap's salvage pass must carry an
    epoch that lands between the compaction's snapshot and its publish
    into the new store."""
    from flow_pipeline_spark.streaming import jobs

    src, _ = flow_source
    raw = flows_raw(spark.read.parquet(src))
    even = raw.filter(F.col("SrcAS") % 2 == 0)
    odd = raw.filter(F.col("SrcAS") % 2 != 0)
    d = f"{tmpdir}/rollup_race"
    jobs._write_rollup_epoch(even, 0, d)

    real_swap = jobs._swap_in

    def racing_swap(store_dir, write_tmp, **kw):
        # the live stream lands epoch 99 AFTER the compaction snapshot
        jobs._write_rollup_epoch(odd, 99, d)
        return real_swap(store_dir, write_tmp, **kw)

    monkeypatch.setattr(jobs, "_swap_in", racing_swap)
    run_compaction(spark, d)
    monkeypatch.undo()

    names = sorted(e for e in __import__("os").listdir(jobs._resolve_store(d))
                   if e.startswith("epoch="))
    assert "epoch=-1" in names and "epoch=99" in names
    merged = read_rollup(spark, d)
    expect = rollup_flat(raw)                  # even ∪ odd — nothing lost
    assert merged.exceptAll(expect).isEmpty()
    assert expect.exceptAll(merged).isEmpty()
    # and a quiet re-compaction folds the salvaged epoch in, idempotent
    run_compaction(spark, d)
    merged2 = read_rollup(spark, d)
    assert merged2.exceptAll(expect).isEmpty()
    assert expect.exceptAll(merged2).isEmpty()


def test_compaction_appender_concurrency_stress(spark, tmpdir, flow_source):
    """The salvage contract under REAL thread concurrency, not a
    scripted interleave: a live appender lands epochs (with the
    streaming engine's retry-on-failure semantics — foreachBatch is
    at-least-once and the epoch overwrite is idempotent) while
    compactions loop in the main thread. The documented guarantee is
    that any non-crash interleaving loses nothing; this drives the
    park/retry/salvage windows for dozens of real interleavings. Also
    exercises the round-7 _SUCCESS snapshot gate: an epoch mid-commit
    at compaction snapshot time must not be half-merged."""
    import threading

    from flow_pipeline_spark.streaming import jobs

    src, _ = flow_source
    raw = flows_raw(spark.read.parquet(src))
    slices = [raw.filter(F.col("SrcAS") % 3 == i).localCheckpoint()
              for i in range(3)]
    d = f"{tmpdir}/rollup_stress"
    jobs._write_rollup_epoch(slices[0], 0, d)

    n_epochs = 8
    errs = []

    def appender():
        try:
            for e in range(1, n_epochs + 1):
                for attempt in range(3):      # streaming-engine replay
                    try:
                        jobs._write_rollup_epoch(slices[e % 3], e, d)
                        break
                    except Exception:
                        if attempt == 2:
                            raise
        except Exception as ex:               # pragma: no cover
            errs.append(ex)

    t = threading.Thread(target=appender, daemon=True)
    t.start()
    try:
        while t.is_alive():
            run_compaction(spark, d)
    finally:
        t.join(timeout=600)
    assert not errs, errs
    run_compaction(spark, d)                  # quiesced final fold

    expect_src = slices[0]
    for e in range(1, n_epochs + 1):
        expect_src = expect_src.unionByName(slices[e % 3])
    expect = rollup_flat(expect_src)
    merged = read_rollup(spark, d)
    assert merged.exceptAll(expect).isEmpty()
    assert expect.exceptAll(merged).isEmpty()
    # and OPTIMIZE actually OPTIMIZED: the quiesced fold leaves one
    # merged epoch, not a salvage-carried pile (round-7 review: the
    # _SUCCESS gate briefly excluded epoch=-1 — compaction's own
    # atomically-published output — so nothing ever re-merged)
    import os as _os
    names = sorted(e for e in _os.listdir(jobs._resolve_store(d))
                   if e.startswith("epoch="))
    assert names == ["epoch=-1"], names


def test_reader_vs_swap_atomic_view_stress(spark, tmpdir):
    """The swap's reader-side guarantee under real concurrency: a
    reader following the documented contract (_recover_swap, then
    retry on transient failure) NEVER observes a mixed or partial
    snapshot — every successful read is exactly one version, because
    the tmp dir only becomes the store complete and the two renames
    leave no intermediate content. Drives ~20 live swaps against a
    polling reader thread."""
    import threading

    from flow_pipeline_spark.streaming import jobs

    d = f"{tmpdir}/swap_view"
    frames = [spark.range(50).select(
        F.lit(v).alias("version"), F.col("id")).localCheckpoint()
        for v in range(4)]

    def write_version(v):
        jobs._swap_in(d, lambda tmp: frames[v % 4]
                      .write.mode("overwrite").parquet(tmp))

    write_version(0)
    bad = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                snap = jobs.read_state_store(spark, d)
                versions = {r["version"] for r in
                            snap.select("version").distinct().collect()}
                n = snap.count()
                if len(versions) != 1 or n not in (0, 50):
                    # n==0 impossible for a complete snapshot of 50 rows;
                    # record anything that isn't a whole single version
                    bad.append((versions, n))
            except Exception:
                # a read can only fail by out-living the one-generation
                # reader grace (its resolved version GC'd two publishes
                # later) — re-resolve and retry, same as production
                continue
    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for v in range(1, 21):
            write_version(v)
    finally:
        stop.set()
        t.join(timeout=120)
    assert not bad, bad
    final = jobs.read_state_store(spark, d)
    assert final.count() == 50
    assert final.select("version").distinct().count() == 1


def test_swap_salvage_merges_epoch_split_across_flip(tmp_path,
                                                     monkeypatch):
    """An appender epoch whose part files straddle the pointer flip —
    part-a visible at the pre-flip salvage scan, part-b landing in the
    (still-current) old version just before the flip — must be merged
    at the FILE level into the published snapshot by the post-flip
    salvage pass (part names are task-attempt-unique; round-7 review
    caught the dir-level skip dropping the second fragment under the
    predecessor protocol)."""
    import os

    from flow_pipeline_spark.streaming import jobs

    store = str(tmp_path / "store")
    # legacy flat store with the first fragment of epoch 5 — migration
    # folds it into v00000000
    ep = os.path.join(store, "epoch=5")
    os.makedirs(ep)
    with open(os.path.join(ep, "part-a"), "w") as f:
        f.write("a")

    def write_new(new):
        d = os.path.join(new, "epoch=-1")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "merged"), "w") as f:
            f.write("m")

    real_publish = jobs._publish_pointer
    fired = []

    def racy_publish(store_dir, current, previous):
        # skip the legacy-migration publish (previous=None): the race
        # under test is the compaction flip, which carries a previous
        if not fired and previous is not None:
            fired.append(1)
            # the appender lands the SECOND fragment into the old
            # current AFTER the pre-flip salvage scan, BEFORE the flip
            cur = os.path.join(store, previous)
            with open(os.path.join(cur, "epoch=5", "part-b"), "w") as f:
                f.write("b")
        return real_publish(store_dir, current, previous)

    monkeypatch.setattr(jobs, "_publish_pointer", racy_publish)
    jobs._swap_in(store, write_new, salvage_known=set())
    monkeypatch.undo()

    cur = jobs._resolve_store(store)
    assert sorted(os.listdir(os.path.join(cur, "epoch=5"))) == \
        ["part-a", "part-b"]                 # both fragments survive
    with open(os.path.join(cur, "epoch=-1", "merged")) as f:
        assert f.read() == "m"


@pytest.mark.parametrize("kind", ["cdc", "uniq", "bitmap", "kmv"])
def test_state_store_writer_reader_concurrency_stress(spark, tmpdir, kind):
    """The pointer-swap guarantee under real thread concurrency for
    EVERY swap-managed store algebra, not just rollup compaction
    (round-7 verdict ask): a writer folds epochs through the exact
    production apply path (_apply_cdc_batch / _apply_state_merge) while
    a reader thread hammers read_state_store. Every successful read
    must be one complete published snapshot, so each store's monotone
    invariant (distinct keys / register sums / bitmap sizes / sketch
    fills only ever grow under its merge algebra) can never regress —
    a torn or mixed read would show as a dip. The final store must
    equal a single batch build over all epochs (merge associativity,
    whatever interleaving the reader forced)."""
    import threading

    from pyspark.sql import functions as F

    from flow_pipeline_spark.operators.cdc import latest_state
    from flow_pipeline_spark.operators.rollup import (
        bitmap_merge, bitmap_state, kmv_merge, kmv_state,
        uniq_register_merge, uniq_register_state)
    from flow_pipeline_spark.streaming import jobs

    n_epochs, per_epoch = 12, 400

    def rows(e):
        lo = e * per_epoch
        return spark.range(lo, lo + per_epoch).select(
            (F.col("id") % 5).cast("string").alias("k"),
            (F.col("id") % 997).cast("long").alias("v"),
            F.col("id").alias("ver")).localCheckpoint()

    all_rows = rows(0)
    epochs = [rows(e) for e in range(n_epochs)]
    for e in range(1, n_epochs):
        all_rows = all_rows.unionByName(epochs[e])

    if kind == "cdc":
        def apply(store, e):
            jobs._apply_cdc_batch(spark, store, epochs[e],
                                  keys=["k", "v"], order_cols=["ver"])

        def metric(df):
            return df.select("k", "v").distinct().count()

        def final_check(store):
            got = {(r["k"], r["v"], r["ver"]) for r in
                   jobs.read_state_store(spark, store).collect()}
            want = {(r["k"], r["v"], r["ver"]) for r in
                    latest_state(all_rows, ["k", "v"], ["ver"]).collect()}
            assert got == want
    elif kind == "uniq":
        def apply(store, e):
            jobs._apply_state_merge(
                spark, store, epochs[e],
                state_fn=lambda b: uniq_register_state(b, ["k"], "v"),
                merge_fn=lambda base, d: (base.unionByName(d)
                                          .groupBy("k", "bucket")
                                          .agg(F.max("r").alias("r"))))

        def metric(df):
            return df.agg(F.sum("r")).collect()[0][0]

        def final_check(store):
            got = {(r["k"], r["n_regs"], r["s_scaled"]) for r in
                   uniq_register_merge(
                       jobs.read_state_store(spark, store), ["k"]).collect()}
            want = {(r["k"], r["n_regs"], r["s_scaled"]) for r in
                    uniq_register_merge(
                        uniq_register_state(all_rows, ["k"], "v"),
                        ["k"]).collect()}
            assert got == want
    elif kind == "bitmap":
        def apply(store, e):
            jobs._apply_state_merge(
                spark, store, epochs[e],
                state_fn=lambda b: bitmap_state(b, ["k"], "v",
                                                chunk_bits=6),
                merge_fn=lambda base, d: bitmap_merge(
                    base.unionByName(d), ["k"]))

        def metric(df):
            return df.agg(F.sum(F.size("vals"))).collect()[0][0]

        def final_check(store):
            got = {(r["k"], r["chunk"], tuple(r["vals"])) for r in
                   jobs.read_state_store(spark, store).collect()}
            want = {(r["k"], r["chunk"], tuple(r["vals"])) for r in
                    bitmap_state(all_rows, ["k"], "v",
                                 chunk_bits=6).collect()}
            assert got == want
    else:
        def apply(store, e):
            jobs._apply_state_merge(
                spark, store, epochs[e],
                state_fn=lambda b: kmv_state(b, ["k"], "v", k=32),
                merge_fn=lambda base, d: kmv_merge(
                    base.unionByName(d), ["k"], k=32))

        def metric(df):
            return df.agg(F.sum(F.size("kmv"))).collect()[0][0]

        def final_check(store):
            got = {(r["k"], tuple(r["kmv"])) for r in
                   jobs.read_state_store(spark, store).collect()}
            want = {(r["k"], tuple(r["kmv"])) for r in
                    kmv_state(all_rows, ["k"], "v", k=32).collect()}
            assert got == want

    store = f"{tmpdir}/stress_{kind}"
    apply(store, 0)
    seen, bad, stop = [metric(jobs.read_state_store(spark, store))], [], \
        threading.Event()

    def reader():
        last = seen[0]
        while not stop.is_set():
            try:
                m = metric(jobs.read_state_store(spark, store))
            except Exception:
                continue        # out-lived the one-generation grace
            if m < last:
                bad.append((last, m))
            last = m
            seen.append(m)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for e in range(1, n_epochs):
            apply(store, e)
    finally:
        stop.set()
        t.join(timeout=300)
    assert not bad, bad
    assert len(seen) >= 2       # the reader actually raced the writer
    final_check(store)


def test_crash_after_flip_orphan_epoch_recovered_by_next_resolve(
        tmp_path, monkeypatch):
    """THE scenario the two-rename protocol documented as unrecoverable
    (round-7 verdict, 'the oldest known hole'): an appender epoch lands
    in the current snapshot after the publisher's pre-flip salvage scan,
    and the publisher CRASHES right after the pointer flip — the epoch
    now exists only in the superseded version. Under the pointer
    protocol the data has an on-disk home (versions are never parked or
    cleared), the very next resolve's orphan sweep carries it into the
    current snapshot, and the next publish's GC still proves it safe."""
    import os

    from flow_pipeline_spark.streaming import jobs

    class Boom(Exception):
        pass

    store = str(tmp_path / "store")
    ep1 = os.path.join(store, "epoch=1")
    os.makedirs(ep1)
    with open(os.path.join(ep1, "part-a"), "w") as f:
        f.write("a")

    def write_new(new):
        d = os.path.join(new, "epoch=-1")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "merged"), "w") as f:
            f.write("m")

    real_pub = jobs._publish_pointer
    real_salv = jobs._salvage_into
    state = {"salvages": 0}

    def racy_pub(store_dir, current, previous):
        if previous is not None:
            # the appender lands epoch=7 into the still-current old
            # version AFTER the pre-flip salvage scan, BEFORE the flip
            d = os.path.join(store, previous, "epoch=7")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "part-x"), "w") as f:
                f.write("x")
        return real_pub(store_dir, current, previous)

    def dying_salvage(src, dst, known):
        state["salvages"] += 1
        if state["salvages"] == 2:      # the post-flip pass: crash here
            raise Boom()
        return real_salv(src, dst, known)

    monkeypatch.setattr(jobs, "_publish_pointer", racy_pub)
    monkeypatch.setattr(jobs, "_salvage_into", dying_salvage)
    try:
        jobs._swap_in(store, write_new, salvage_known={"epoch=1"})
        raise AssertionError("expected the injected post-flip crash")
    except Boom:
        pass
    monkeypatch.undo()

    # pointer flipped; epoch=7 lives only in the superseded version
    cur_name, prev_name = jobs._read_pointer(store)
    assert prev_name is not None
    assert not os.path.isdir(os.path.join(store, cur_name, "epoch=7"))
    assert os.path.isdir(os.path.join(store, prev_name, "epoch=7"))

    # the next resolve's orphan sweep recovers it — no compaction needed
    cur = jobs._resolve_store(store)
    with open(os.path.join(cur, "epoch=7", "part-x")) as f:
        assert f.read() == "x"
    with open(os.path.join(cur, "epoch=-1", "merged")) as f:
        assert f.read() == "m"

    # a quiesced follow-up publish (write_new re-merges only epoch=-1,
    # so the epoch dirs ride the salvage pass) GCs the debris and keeps
    # everything
    jobs._swap_in(store, write_new, salvage_known={"epoch=-1"})
    cur = jobs._resolve_store(store)
    assert os.path.isdir(os.path.join(cur, "epoch=7"))
    # epoch=1 was DECLARED merged by the first publish's manifest, so GC
    # rightly drops it rather than resurrecting already-merged partials
    assert not os.path.isdir(os.path.join(cur, "epoch=1"))
    assert len(jobs._version_names(store)) <= 2


def test_staged_writer_detects_partially_visible_stage(spark, tmpdir,
                                                       monkeypatch):
    """Round-7 review: the stage-visibility guard only caught the
    zero-parts case — a PARTIALLY visible stage (multi-node stage_dir on
    local disk) committed the visible subset and the ledger pinned the
    loss. The writer must compare the staged count against the batch's
    own count and refuse."""
    import glob as glob_mod

    import duckdb
    from flow_pipeline_spark.streaming.jobs import (
        exactly_once_staged_writer, inserter_projection)

    db = f"{tmpdir}/partial.duckdb"
    con = duckdb.connect(db)
    _duckdb_inserter_ddl(con)
    con.close()

    batch = inserter_projection(synthetic_flows(spark, 300, seed=41)) \
        .repartition(4)
    write_batch = exactly_once_staged_writer(
        lambda: duckdb.connect(db), "flows_pg", f"{tmpdir}/stage_partial")

    real_glob = glob_mod.glob

    def partial_glob(pattern):
        parts = real_glob(pattern)
        return parts[:-1] if len(parts) > 1 else parts  # hide one part

    monkeypatch.setattr(glob_mod, "glob", partial_glob)
    with pytest.raises(RuntimeError, match="PARTIALLY visible"):
        write_batch(batch, 5)
    monkeypatch.undo()

    con = duckdb.connect(db)
    # nothing committed, nothing ledgered — the epoch will replay
    assert con.execute("SELECT count(*) FROM flows_pg").fetchone()[0] == 0
    write_batch(batch, 5)                   # healthy retry lands it all
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM flows_pg").fetchone()[0] == 300


def test_batch_writer_sqlite_and_nullable_ints(spark, tmpdir):
    """Round-7 review pair: (a) the DB-API shim misrouted sqlite3 (its
    connection has executemany but no fetchone — 'any DB-API connection'
    crashed on the standard-library driver); (b) toPandas turned a
    nullable BIGINT column into float64+NaN, crash-looping the epoch.
    collect()-based rows must keep exact ints and None end-to-end."""
    import sqlite3

    from flow_pipeline_spark.streaming.jobs import exactly_once_batch_writer

    db = f"{tmpdir}/writer.sqlite3"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a BIGINT, b VARCHAR, batch_id BIGINT)")
    con.commit()
    con.close()

    batch = spark.createDataFrame(
        [(1, "x"), (None, "y"), (2_000_000_000_000, "z")],
        "a long, b string")
    write_batch = exactly_once_batch_writer(
        lambda: sqlite3.connect(db), "t")
    write_batch(batch, 1)
    write_batch(batch, 1)                    # replay: ledger skip

    con = sqlite3.connect(db)
    got = sorted(con.execute("SELECT a, b FROM t").fetchall(),
                 key=lambda r: (r[0] is None, r[0] or 0))
    assert got == [(1, "x"), (2_000_000_000_000, "z"), (None, "y")]
    assert all(isinstance(a, int) for a, _ in got if a is not None)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 3


class _FakeGroupState:
    """Deterministic stand-in for GroupState — lets the flush/funnel
    kernels be exercised at exact processing-time points without
    wall-clock streaming runs."""

    def __init__(self, now_ms=0):
        self._v, self._now = None, now_ms
        self.hasTimedOut = False
        self.timeout_set = None
        self.removed = False
        self.updates = 0

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.removed, self.updates = v, False, self.updates + 1

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms

    def getCurrentProcessingTimeMs(self):
        return self._now

    def setTimeoutTimestamp(self, ms):
        if ms <= self.watermark_ms:
            raise ValueError(
                f"timeout timestamp {ms} must exceed watermark "
                f"{self.watermark_ms}")     # Spark's own contract
        self.timeout_set = ms

    watermark_ms = 0

    def getCurrentWatermarkMs(self):
        return self.watermark_ms


def test_flush_fn_trickle_does_not_starve_the_timer():
    """Round-7 review: re-arming the timeout on every data invocation
    let a steady sub-threshold trickle push the deadline forever — the
    reference inserter's ticker flushes every flush.dur REGARDLESS of
    arrivals. The buffer-age check on the data path must emit once the
    first-buffered row is flush_ms old, even though data keeps coming."""
    from flow_pipeline_spark.streaming.stateful import _make_flush_fn

    fn = _make_flush_fn(flush_count=100, flush_ms=5000)
    st = _FakeGroupState()
    emitted = []
    for i in range(12):                      # 1 row per second per key
        st._now = i * 1000
        one = pd.DataFrame({"Bytes": [10]})
        for out in fn((7,), iter([one]), st):
            emitted.extend(out.to_dict("records"))
    assert emitted, "trickle starved the flush timer"
    # the ticker fires every ~flush_ms of buffer age despite the steady
    # trickle: rows 0-5 flush at t=5s, rows 6-11 at t=11s
    assert [e["flushed_by"] for e in emitted] == ["timer", "timer"]
    assert [e["n_rows"] for e in emitted] == [6, 6]
    assert emitted[0]["sum_bytes"] == 60
    # the second flush emptied the buffer — no state row lingers
    assert not st.exists


def test_flush_fn_emits_per_threshold_crossing():
    """Round-7 review: one large Arrow chunk used to emit a single
    oversized flush; the inserter checks per message, so a 1000-row
    chunk at flush_count=100 must emit ten exact-100 flushes."""
    from flow_pipeline_spark.streaming.stateful import _make_flush_fn

    fn = _make_flush_fn(flush_count=100, flush_ms=60_000)
    st = _FakeGroupState()
    chunk = pd.DataFrame({"Bytes": [1] * 1005})
    out = list(fn((1,), iter([chunk]), st))[0]
    assert list(out["flushed_by"].unique()) == ["count"]
    assert list(out["n_rows"]) == [100] * 10
    assert st.get[0] == 5                    # 5-row tail buffered


def test_flush_fn_null_bytes_counts_as_zero():
    """Round-7 review, second pass: a NULL Bytes row reaches pandas as
    float64+NaN (the nullable-long Arrow rendering) and int(NaN) killed
    the streaming query in a checkpoint-replay crash loop. The row must
    count toward the flush threshold with 0 bytes."""
    from flow_pipeline_spark.streaming.stateful import _make_flush_fn

    fn = _make_flush_fn(flush_count=3, flush_ms=60_000)
    st = _FakeGroupState()
    chunk = pd.DataFrame({"Bytes": [5.0, float("nan"), 7.0]})
    out = list(fn((1,), iter([chunk]), st))[0]
    assert list(out["n_rows"]) == [3]
    assert list(out["sum_bytes"]) == [12]
    assert list(out["flushed_by"]) == ["count"]


def test_funnel_fn_state_hygiene_and_null_ts():
    """Round-7 review pair: (a) users who never match steps[0] must not
    materialize a state row (the store stays O(participants)); (b) a
    NaT-timestamp match must not seed state with NaT.value = -2^63 and
    unlock every later event."""
    from flow_pipeline_spark.streaming.stateful import _make_funnel_fn

    fn = _make_funnel_fn(["view", "click"], None)

    # (a) non-participant: no state row
    st = _FakeGroupState()
    evs = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01"]),
                        "event_type": ["scroll"]})
    assert list(fn((1,), iter([evs]), st)) == []
    assert not st.exists and st.updates == 0

    # (b) NaT view then a valid click: neither stage may fire
    st = _FakeGroupState()
    evs = pd.DataFrame({
        "ts": pd.to_datetime([pd.NaT, "2026-01-01 00:00:05"]),
        "event_type": ["view", "click"]})
    assert list(fn((2,), iter([evs]), st)) == []
    assert st.updates == 0

    # a valid funnel still advances and a converted user short-circuits
    st = _FakeGroupState()
    evs = pd.DataFrame({
        "ts": pd.to_datetime(["2026-01-01 00:00:01",
                              "2026-01-01 00:00:02"]),
        "event_type": ["view", "click"]})
    out = list(fn((3,), iter([evs]), st))[0]
    assert list(out["stage"]) == [1, 2] and st.get[0] == 2
    more = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01 00:00:09"]),
                         "event_type": ["view"]})
    assert list(fn((3,), iter([more]), st)) == []   # completed: no work


def test_ordered_funnel_fn_buffer_bound_and_late_drop():
    """The ordered funnel kernel's state-size bound (round-8): after
    every invocation the buffer retains ONLY step events strictly above
    the watermark — i.e. at most lateness_window x per-user step rate —
    a completed funnel clears its buffer entirely, and an event at or
    below the processed frontier is dropped like any watermarked
    stateful operator drops late rows."""
    from flow_pipeline_spark.streaming.stateful import (
        _make_ordered_funnel_fn)

    fn = _make_ordered_funnel_fn(["view", "click"], None)

    def ts(s):
        return pd.to_datetime(s, unit="s", origin="2026-01-01")

    # watermark at 0: everything buffers, nothing emits
    st = _FakeGroupState()
    evs = pd.DataFrame({"ts": ts([100, 50, 200]),
                        "event_type": ["click", "view", "click"]})
    assert list(fn((1,), iter([evs]), st)) == []
    stage, _t1, _tk, done, bts, bst = st.get
    assert stage == 0 and len(bts) == 3        # all above watermark
    assert st.timeout_set == min(bts) // 1000 + 1   # wake past oldest

    # watermark passes 120s: the <=120s prefix processes IN EVENT-TIME
    # ORDER (view@50 then click@100 -> stages 1, 2), buffer keeps only
    # the above-watermark tail — which a completed funnel then clears
    st.watermark_ms = (ts(120).value) // 10**6
    out = list(fn((1,), iter([]), st))[0]
    assert list(out["stage"]) == [1, 2]
    stage, _t1, _tk, done, bts, bst = st.get
    assert stage == 2 and bts == []            # converted: buffer cleared
    assert done == st.watermark_ms * 1000

    # late drop: an event at/below the processed frontier never buffers
    st2 = _FakeGroupState()
    st2.watermark_ms = (ts(100).value) // 10**6
    first = pd.DataFrame({"ts": ts([150]), "event_type": ["view"]})
    assert list(fn((2,), iter([first]), st2)) == []
    late = pd.DataFrame({"ts": ts([90]), "event_type": ["view"]})
    assert list(fn((2,), iter([late]), st2)) == []
    _stage, _t1, _tk, _done, bts, _bst = st2.get
    assert bts == [ts(150).value // 1000]      # the 90s row was dropped


def test_streaming_funnel_rejects_empty_steps(spark):
    from flow_pipeline_spark.streaming.stateful import streaming_funnel

    df = spark.createDataFrame(
        [(1, None, "view")], "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError, match="at least one step"):
        streaming_funnel(df, [])


def test_streaming_index_upsert_matches_batch_rebuild(spark, tmpdir):
    """Round-10: the streaming half of incremental IVF-PQ maintenance
    (jobs.py:start_index_upsert_stream) — new embeddings arrive as a
    file stream, each micro-batch is encoded under the STORED model
    (pq_index_delta) and appended as its own epoch=N/cell=K partition.
    Pins: (a) after the stream drains, the on-disk index holds
    base ∪ delta codes IDENTICAL to a batch re-encode under the same
    model; (b) querying the streamed index equals querying the batch
    index row-for-row; (c) a full checkpoint-wipe replay (foreachBatch
    at-least-once, every epoch redelivered) leaves the index unchanged
    — the epoch-overwrite device, without which replayed code rows
    would double ADC candidates."""
    from flow_pipeline_spark.operators import similarity as S
    from flow_pipeline_spark.sources.tables import load_table
    from flow_pipeline_spark.streaming.jobs import start_index_upsert_stream

    SF = "/root/testdata/sf0.001"
    e = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = e.filter(F.col("vec_id") % 10 != 7)
    delta = e.filter(F.col("vec_id") % 10 == 7)
    books = S.pq_train(base, m=8, ks=16, n_iter=2)
    cent, assigned = S.ivf_assign(base, 8)
    cent_rows = [(int(r["cid"]), [float(x) for x in r["cv"]])
                 for r in cent.select("cid", "cv").collect()]

    index_dir = f"{tmpdir}/pq_index"
    ckpt = f"{tmpdir}/ckpt_index"
    src = f"{tmpdir}/emb_delta_src"
    # base build seeds the reserved epoch=-1 (the rollup convention)
    (S.pq_encode(base, books)
     .join(assigned.select("vec_id", "cell"), "vec_id")
     .write.partitionBy("cell").parquet(f"{index_dir}/epoch=-1"))
    # the delta arrives as two files -> two stream epochs
    d1 = delta.filter(F.col("vec_id") % 20 == 7)
    d2 = delta.filter(F.col("vec_id") % 20 == 17)
    assert d1.count() > 0 and d2.count() > 0
    d1.coalesce(1).write.parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_index_upsert_stream(stream, index_dir, ckpt, cent_rows,
                                  books, trigger={"availableNow": True})
    _await_done(q)

    idx = spark.read.parquet(index_dir)
    assert "epoch" in idx.columns and "cell" in idx.columns
    codes_cols = ["vec_id", "pq_codes", "cell"]
    got = {r["vec_id"]: (list(r["pq_codes"]), r["cell"])
           for r in idx.select(*codes_cols).collect()}
    rebuilt = S.pq_index_delta(e, cent_rows, books)
    want = {r["vec_id"]: (list(r["pq_codes"]), r["cell"])
            for r in rebuilt.collect()}
    assert got == want and len(got) == e.count()

    qs = e.filter(F.col("vec_id") < 5)
    r_stream = S.ivf_pq_query(idx.select(*codes_cols), cent, qs, books,
                              k=3, nprobe=4, shortlist=12,
                              rerank_with=e).collect()
    r_batch = S.ivf_pq_query(rebuilt, cent, qs, books,
                             k=3, nprobe=4, shortlist=12,
                             rerank_with=e).collect()
    assert r_stream == r_batch and len(r_stream) > 0

    # checkpoint-wipe replay: every epoch redelivers; overwrite, not
    # duplicate (whatever file->epoch mapping the rerun picks, the
    # union of overwritten epochs is the same delta)
    shutil.rmtree(ckpt)
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    q2 = start_index_upsert_stream(stream2, index_dir, ckpt, cent_rows,
                                   books, trigger={"availableNow": True})
    _await_done(q2)
    again = {r["vec_id"]: (list(r["pq_codes"]), r["cell"])
             for r in spark.read.parquet(index_dir)
             .select(*codes_cols).collect()}
    assert again == want
