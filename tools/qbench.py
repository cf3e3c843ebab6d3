#!/usr/bin/env python
"""Quick per-query timing harness for optimization work — times a subset
of the bench queries with the same noop-sink methodology as bench.py
(warm run + min over N measured runs), without the ingest/routing
sections or the contamination gates. NOT the published bench; use
bench.py for recorded numbers.

Usage: python tools/qbench.py [query ...]   (default: the full bench set)
       QBENCH_RUNS=3 python tools/qbench.py minhash_lsh_dedup
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flow_pipeline_spark.plans import QUERIES  # noqa: E402
from flow_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("QBENCH_RUNS", "2"))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from bench import BENCH_QUERIES
    names = sys.argv[1:] or BENCH_QUERIES
    spark = get_spark("qbench")
    _force(QUERIES["top_event_types"].spark(spark, SF_DIR))
    out = {}
    for name in names:
        if name not in QUERIES:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        build = lambda: QUERIES[name].spark(spark, SF_DIR)  # noqa: E731
        _force(build())  # warm: codegen compile
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            _force(build())
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = min(samples)
        print(f"{min(samples):8.3f}  {name}  {samples}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": out,
                      "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
