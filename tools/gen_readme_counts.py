"""Regenerate the README's registry-count block from plans/__init__.py —
the counts are derived, never hand-written (VERDICT r4 item #7: the
hand-maintained figure went stale the same round it was updated).

Usage:  python -m tools.gen_readme_counts
The block between the REGISTRY-COUNTS markers is rewritten in place;
tests/test_docs.py asserts the committed README matches the live registry.
"""

from __future__ import annotations

import os
import re
import sys

README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")

BLOCK = re.compile(
    r"(<!-- REGISTRY-COUNTS.*?-->\n).*?(\n<!-- /REGISTRY-COUNTS -->)",
    re.S)


def counts() -> tuple[int, int]:
    sys.path.insert(0, os.path.dirname(README))
    from flow_pipeline_spark.plans import QUERIES
    total = len(QUERIES)
    oracled = sum(1 for q in QUERIES.values() if q.oracle is not None)
    return total, oracled


def render(total: int, oracled: int) -> str:
    return (f"`__spark_entry__.queries()` exposes {total} operators; "
            f"{oracled} carry DuckDB oracle SQL\n"
            f"(`oracle_sql()`) that the driver hash-compares at sf0.01.")


def main() -> None:
    total, oracled = counts()
    src = open(README).read()
    new, n = BLOCK.subn(lambda m: m.group(1) + render(total, oracled)
                        + m.group(2), src)
    assert n == 1, "REGISTRY-COUNTS block not found in README.md"
    open(README, "w").write(new)
    print(f"README counts: {total} operators / {oracled} oracled")


if __name__ == "__main__":
    main()
