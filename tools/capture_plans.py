#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default r11 — the
optimization round's evidence files).

Usage: python tools/capture_plans.py before q1 q2 ...
       python tools/capture_plans.py after q1 q2 ...
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flow_pipeline_spark.plans import QUERIES  # noqa: E402
from flow_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name].spark(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
