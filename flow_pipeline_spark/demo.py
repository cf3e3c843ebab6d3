"""End-to-end demo — the reference's dev loop, Spark-first.

The reference's compose stack (README.md:56-67): mocker → Kafka → {ClickHouse
MV cascade | Go inserter → Postgres} → Grafana panels. Here the same loop is
one process:

    python -m flow_pipeline_spark.demo --dir /tmp/fps_demo --rows 200000
    python -m flow_pipeline_spark.demo --dir /tmp/fps_demo --stream --seconds 20

Batch mode: generate flows → raw persist (Date-partitioned parquet) → 5-min
rollup partials → OPTIMIZE-style compaction → run the five dashboard panels
(instant traffic, top source/dest IPs, top ports) off the warehouse and
print them. Stream mode: the same topology live — rate-source mocker,
raw-persist MV and rollup MV as two Structured Streaming queries with
checkpoints, metrics listener reporting rows/s.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import SparkSession


def run_batch_demo(spark: SparkSession, out_dir: str,
                   rows: int = 200_000) -> dict:
    """Generate → persist → rollup → compact → query. Returns the panel
    DataFrames (un-collected) keyed by panel name."""
    from .operators.rollup import rollup_flat
    from .plans.flow_queries import (
        as_pair_traffic,
        instant_traffic,
        top_src_ips,
        top_src_ports,
    )
    from .sources.mocker import flows_raw, synthetic_flows
    from .streaming.jobs import read_rollup, run_compaction

    raw_dir = f"{out_dir}/flows_raw"
    rollup_dir = f"{out_dir}/flows_5m"

    (flows_raw(synthetic_flows(spark, rows))
     .write.mode("overwrite").partitionBy("Date").parquet(raw_dir))
    raw = spark.read.parquet(raw_dir)

    rollup_flat(raw).write.mode("overwrite").partitionBy("Date") \
        .parquet(rollup_dir)
    run_compaction(spark, rollup_dir)

    # Postgres-path panels (viz.json:206,311): the inserter's 14-column
    # projection (Go-rendered IP strings, nil→"0.0.0.0") queried the way
    # Grafana queries the `flows` heap table
    from pyspark.sql import functions as F

    from .streaming.jobs import inserter_projection
    pg = inserter_projection(raw)
    pg_src_ips = (pg.groupBy("src_ip")
                  .agg(F.count("*").alias("n"),
                       F.sum("bytes").alias("sumbytes"))
                  .orderBy(F.desc("sumbytes"), F.asc("src_ip")))

    return {
        "instant_traffic": instant_traffic(raw),
        "top_src_ips": top_src_ips(raw, k=10),
        "top_src_ports": top_src_ports(raw, k=10),
        "as_pair_traffic": as_pair_traffic(raw),
        "pg_top_src_ips": pg_src_ips.limit(10),
        "rollup": read_rollup(spark, rollup_dir),
    }


def run_stream_demo(spark: SparkSession, out_dir: str, *,
                    seconds: int = 20, rows_per_second: int = 2000) -> dict:
    """The live topology: mocker stream → raw persist MV + rollup MV."""
    from .sources.mocker import mocker_stream
    from .streaming.jobs import (
        read_rollup,
        start_raw_persist,
        start_rollup_stream,
    )
    from .streaming.metrics import MetricsListener

    listener = MetricsListener()
    spark.streams.addListener(listener)
    flows = mocker_stream(spark, rows_per_second=rows_per_second)
    q_raw = start_raw_persist(
        flows, f"{out_dir}/flows_raw", f"{out_dir}/ckpt_raw",
        trigger={"processingTime": "2 seconds"})
    # second MV: its own identical-seed generator stream (each streaming
    # query owns its source, as each ClickHouse MV owns a Kafka consumer)
    from .sources.mocker import flows_raw as _project
    q_roll = start_rollup_stream(
        _project(mocker_stream(spark, rows_per_second=rows_per_second)),
        f"{out_dir}/flows_5m", f"{out_dir}/ckpt_5m",
        trigger={"processingTime": "2 seconds"})
    time.sleep(seconds)
    q_raw.stop()
    q_roll.stop()
    spark.streams.removeListener(listener)
    total = sum(p["num_input_rows"] for p in listener.progress)
    return {
        "input_rows": total,
        "rows_per_sec": round(total / max(seconds, 1)),
        "raw": spark.read.parquet(f"{out_dir}/flows_raw"),
        "rollup": read_rollup(spark, f"{out_dir}/flows_5m"),
    }


def run_curation_demo(spark: SparkSession, sf_dir: str) -> dict:
    """The training-data tier end to end on the ``documents`` /
    ``embeddings`` tables: quality gates (heuristic, classifier, LM
    perplexity, compression band) → exact + MinHash-LSH + semantic dedup
    → deterministic split — the same registry queries the driver
    oracle-checks, composed as a user would run them."""
    from .plans import QUERIES

    names = [
        "text_quality", "quality_classifier", "doc_perplexity",
        "doc_compression_stats", "dedup_exact", "minhash_lsh_dedup",
        "semantic_dedup", "incremental_dedup", "incremental_near_dup",
        "mixture_sample", "corpus_curation",
    ]
    return {n: QUERIES[n].spark(spark, sf_dir) for n in names}


def main() -> None:
    from .session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", required=True)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--curate", action="store_true",
                    help="run the training-data curation tier instead "
                         "of the flow panels")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="warehouse dir for --curate")
    ap.add_argument("--seconds", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark("flow-pipeline-demo")
    if args.stream:
        out = run_stream_demo(spark, args.dir, seconds=args.seconds)
        print(f"streamed {out['input_rows']} rows "
              f"(~{out['rows_per_sec']}/s); raw={out['raw'].count()} "
              f"rollup_rows={out['rollup'].count()}")
    elif args.curate:
        for name, df in run_curation_demo(spark, args.sf_dir).items():
            print(f"== {name}")
            df.show(6, truncate=False)
    else:
        panels = run_batch_demo(spark, args.dir, rows=args.rows)
        for name, df in panels.items():
            print(f"== {name}")
            df.show(8, truncate=False)


if __name__ == "__main__":
    main()
