#!/usr/bin/env python
"""sf1 headline scaling pass (VERDICT r5 item #5).

SCALE.md's probes grow single operators to 16M rows; this tool runs the
FULL bench headline loop at sf0.1 and at a materialized sf1 (10x) and
records the per-query growth ratio — the end-to-end evidence that no
headline plan goes super-linear between the benched scale and the next
decade.

sf1 materialization: /root/testdata ships sf{0.001,0.01,0.1} only, so
sf1 is derived from sf0.1 by UNION of 10 key-remapped copies (the TPC-H
scaling convention: entity COUNTS grow, per-entity volume stays flat):
each copy c shifts every entity key (orderkey/custkey/event_id/user_id/
doc_id/vec_id) by c*K, K = a power of ten above the key domain, so join
fan-outs are preserved (copies never cross-join) and uniqueness survives
(CDC version ties, dedup digests). Dimension tables (region/nation/part/
supplier) stay fixed, like TPC-H's nation/region. Two honest caveats,
both CONSERVATIVE (they make sf1 harder, not easier):
  - documents/embeddings replicate content verbatim, so every text/vector
    gains 10 exact copies: dedup/near-dup/ANN workloads see ~45 candidate
    pairs per replicated group where a real 10x corpus would see ~10x the
    planted pairs — pair-bounded operators are stress-tested ABOVE their
    natural sf1 load;
  - events keep their time range, so per-bucket traffic densifies 10x
    (more rows per group, same group count) rather than extending the
    range — aggregation states are unaffected, window partitions grow.

Usage: python tools/sf1_probe.py [--rebuild]
Writes the sf1 tables to $SPARK_GRAFT_SF1_DIR (default /tmp/fps_sf1;
reused across runs unless --rebuild), prints a markdown table for
SCALE.md plus one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import BENCH_QUERIES, _steady  # noqa: E402
from flow_pipeline_spark.plans import QUERIES  # noqa: E402
from flow_pipeline_spark.session import get_spark  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/fps_sf1")
COPIES = 10

# per-table entity-key columns to shift per copy; K chosen as a power of
# ten safely above the sf0.1 key domain (max orderkey 600k, event_id 100k)
_REMAP = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_K = 10_000_000
_DIMS = ["region", "nation", "part", "supplier"]


def materialize_sf1(spark, rebuild: bool = False) -> None:
    done = os.path.join(SF1, "_DONE")
    if os.path.exists(done) and not rebuild:
        print(f"sf1: reusing {SF1}", file=sys.stderr)
        return
    shutil.rmtree(SF1, ignore_errors=True)
    os.makedirs(SF1, exist_ok=True)
    copies = F.explode(F.array(*[F.lit(c) for c in range(COPIES)])) \
        .alias("_copy")
    for table, keys in _REMAP.items():
        df = spark.read.parquet(f"{SF01}/{table}.parquet")
        out = df.select("*", copies)
        for k in keys:
            out = out.withColumn(
                k, (F.col(k) + F.col("_copy").cast("long") * _K)
                .cast(df.schema[k].dataType))
        (out.drop("_copy")
         .write.mode("overwrite").parquet(f"{SF1}/{table}.parquet"))
        print(f"sf1: wrote {table}", file=sys.stderr)
    for d in _DIMS:
        shutil.copy(f"{SF01}/{d}.parquet", f"{SF1}/{d}.parquet")
    with open(done, "w") as f:
        f.write("ok\n")


def run_loop(spark, sf_dir: str) -> dict[str, float]:
    t = {}
    for name in BENCH_QUERIES:
        if name not in QUERIES:
            continue
        t[name] = round(_steady(lambda: QUERIES[name].spark(spark, sf_dir)),
                        3)
        print(f"  {sf_dir.split('/')[-1]} {name}: {t[name]}s",
              file=sys.stderr)
    return t


def main() -> None:
    spark = get_spark("fps-sf1-probe")
    t0 = time.time()
    materialize_sf1(spark, rebuild="--rebuild" in sys.argv)
    print(f"sf1: materialized in {time.time() - t0:.0f}s", file=sys.stderr)

    t01 = run_loop(spark, SF01)
    t1 = run_loop(spark, SF1)

    print("\n| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for name in t01:
        r = t1[name] / max(t01[name], 1e-9)
        print(f"| {name} | {t01[name]} | {t1[name]} | {r:.1f}x |")
    tot01, tot1 = sum(t01.values()), sum(t1.values())
    print(f"| **total** | **{tot01:.2f}** | **{tot1:.2f}** | "
          f"**{tot1 / tot01:.1f}x** |")
    print(json.dumps({"metric": "sf1_headline_ratio",
                      "value": round(tot1 / tot01, 2),
                      "sf01_total_sec": round(tot01, 3),
                      "sf1_total_sec": round(tot1, 3),
                      "queries_sf01": t01, "queries_sf1": t1}))


if __name__ == "__main__":
    main()
