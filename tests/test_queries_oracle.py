"""Oracle tests: every SURVEY §2 query with an oracle entry must match
DuckDB at sf0.001 (fast local gate; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from flow_pipeline_spark.plans import QUERIES

from .conftest import SF_DIR
from .oracle_utils import compare, run_oracle

ORACLE_QUERIES = sorted(n for n, qd in QUERIES.items() if qd.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    qd = QUERIES[name]
    sp = qd.spark(spark, SF_DIR)
    od = run_oracle(qd.oracle, SF_DIR)
    problems = compare(sp, od)
    assert not problems, f"{name}: {problems}"


def test_all_queries_return_rows(spark):
    for name, qd in QUERIES.items():
        df = qd.spark(spark, SF_DIR)
        assert df.count() >= 0, name
