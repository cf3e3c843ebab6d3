#!/usr/bin/env python
"""Realistic-duplication sf1 probe for embedding_near_dup (VERDICT r6
item #7).

The sf1 headline pass (tools/sf1_probe.py) replicates every sf0.1 vector
VERBATIM 10 ways, which inflates the near-dup query's OUTPUT x4,510
(90,200 pairs vs 20 — every vector becomes a 10-copy identical group,
and the answer is quadratic in the duplication factor). The 17.2x wall
ratio recorded there is therefore an output-growth artifact, argued but
not demonstrated. This probe builds the sf1 corpus a real 10x crawl
would look like — 10x the VECTORS with ~10x the PLANTED duplicate
count, not 10-way copies — and measures the same registry query, so
SCALE.md can show the expected near-linear ratio directly.

Corpus construction (deterministic, no RNG):
  - copy c in 0..9 remaps vec_id by +c*10M (the sf1_probe convention)
    and CIRCULARLY ROLLS each 64-dim embedding by c positions: a shared
    permutation preserves all intra-copy cosines exactly (each copy is
    a faithful corpus) while cross-copy cosines fall to the organic
    noise floor (measured max well below the 0.999 threshold — a
    rolled gaussian-ish vector decorrelates from every differently-
    rolled one), so copies never pair with each other;
  - each copy plants 20 duplicates (its rolled images of orig vec_id
    < 20, re-keyed +500k) — 200 planted pairs corpus-wide, ~10x the
    sf0.1 plant, matching how duplicate COUNT (not multiplicity) grows
    in a real 10x crawl.

Expected output: sf0.1 = 20 pairs; realistic sf1 = 240 pairs (copies
1..9 contribute their 20 planted pairs; copy 0's 20 groups are size 3 —
original + probe plant + the query's own +100k plant — C(3,2)=3 pairs
each). Output x12 on rows x10.1: near-linear workload, so wall time
should land at ~<=2x (the SRP bucket join's cost tracks candidate
pairs + corpus size).

Usage: python tools/near_dup_realistic_probe.py [--rebuild]
Writes the probe table to $SPARK_GRAFT_ND_DIR (default /tmp/fps_nd_sf1),
prints a markdown row for SCALE.md plus one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _steady  # noqa: E402
from flow_pipeline_spark.plans import QUERIES  # noqa: E402
from flow_pipeline_spark.session import get_spark  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ND = os.environ.get("SPARK_GRAFT_ND_DIR", "/tmp/fps_nd_sf1")
COPIES, K, DIM, PLANT = 10, 10_000_000, 64, 20


def _rolled(col, c: int):
    if c == 0:
        return col
    return F.concat(F.slice(col, c + 1, DIM - c), F.slice(col, 1, c))


def materialize(spark, rebuild: bool = False) -> None:
    done = os.path.join(ND, "_DONE")
    if os.path.exists(done) and not rebuild:
        print(f"nd-probe: reusing {ND}", file=sys.stderr)
        return
    shutil.rmtree(ND, ignore_errors=True)
    os.makedirs(ND, exist_ok=True)
    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    parts = []
    for c in range(COPIES):
        copy = e.select(
            (F.col("vec_id") + c * K).cast("long").alias("vec_id"),
            _rolled(F.col("embedding"), c).alias("embedding"),
            "label")
        plant = (e.filter(F.col("vec_id") < PLANT)
                 .select((F.col("vec_id") + c * K + 500_000)
                         .cast("long").alias("vec_id"),
                         _rolled(F.col("embedding"), c).alias("embedding"),
                         "label"))
        parts.append(copy.unionByName(plant))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{ND}/embeddings.parquet")
    with open(done, "w") as f:
        f.write("ok\n")
    print("nd-probe: materialized", file=sys.stderr)


def main() -> None:
    spark = get_spark("fps-nd-probe")
    materialize(spark, rebuild="--rebuild" in sys.argv)
    q = QUERIES["embedding_near_dup"].spark

    rows01 = q(spark, SF01).count()
    rows1 = q(spark, ND).count()
    n01 = spark.read.parquet(f"{SF01}/embeddings.parquet").count()
    n1 = spark.read.parquet(f"{ND}/embeddings.parquet").count()

    t01 = round(_steady(lambda: q(spark, SF01)), 3)
    t1 = round(_steady(lambda: q(spark, ND)), 3)
    ratio = round(t1 / max(t01, 1e-9), 2)
    t_start = time.strftime("%Y-%m-%d")

    print(f"\n| embedding_near_dup (realistic dup profile) | {t01} | {t1} "
          f"| {ratio}x on {round(n1 / n01, 1)}x vectors, "
          f"{rows1}/{rows01} output pairs |")
    print(json.dumps({
        "metric": "near_dup_realistic_sf1_ratio", "value": ratio,
        "sf01_sec": t01, "sf1_sec": t1,
        "sf01_rows": n01, "sf1_rows": n1,
        "sf01_pairs": rows01, "sf1_pairs": rows1, "date": t_start}))


if __name__ == "__main__":
    main()
