#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced to full execution with the noop sink (no driver-side
result materialization — measures the plan, not collect()).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flow_pipeline_spark.plans import QUERIES  # noqa: E402
from flow_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, heaviest variants.
BENCH_QUERIES = [
    "instant_traffic_1m",    # time-bucketed agg over events
    "rate_30s",              # finer buckets, arithmetic normalization
    "rollup_5m",             # multi-key 5-min rollup (the flows_5m analog)
    "top_talkers",           # top-k by aggregate
    "pair_matrix",           # pair-key top-k
    "window_latest_event",   # window function
    "tpch_q1",               # wide aggregate with expression args
    "revenue_top_customers", # 3-way fact join + top-k
    "enrichment_join",       # dim-chain broadcast join
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("flow-pipeline-bench")
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once with the cheapest query
    _force(QUERIES["top_event_types"].spark(spark, SF_DIR))

    total = 0.0
    for name in BENCH_QUERIES:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        _force(QUERIES[name].spark(spark, SF_DIR))
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
