"""Docs-vs-code pins: the README's registry counts are GENERATED from
plans/__init__.py (tools/gen_readme_counts.py); this test fails the build
the moment a registry change lands without regenerating them (VERDICT r4
item #7 — the hand-written count went stale the same round it was
written)."""

from __future__ import annotations

import os
import re

from flow_pipeline_spark.plans import QUERIES

README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def test_readme_registry_counts_match_registry():
    src = open(README).read()
    m = re.search(r"exposes (\d+) operators; (\d+) carry DuckDB oracle",
                  src)
    assert m, "REGISTRY-COUNTS sentence missing from README.md"
    total = len(QUERIES)
    oracled = sum(1 for q in QUERIES.values() if q.oracle is not None)
    assert (int(m.group(1)), int(m.group(2))) == (total, oracled), (
        f"README says {m.group(1)}/{m.group(2)}, registry has "
        f"{total}/{oracled} — run python -m tools.gen_readme_counts")


def test_bench_queries_all_registered():
    """bench.py silently skips headline names missing from the registry
    (`if name not in QUERIES: continue`) — a rename would quietly drop a
    benched query from every future record. Make it loud instead."""
    import sys
    sys.path.insert(0, os.path.dirname(README))
    from bench import BENCH_QUERIES
    missing = [n for n in BENCH_QUERIES if n not in QUERIES]
    assert not missing, f"benched but not registered: {missing}"
    assert len(BENCH_QUERIES) == len(set(BENCH_QUERIES))
