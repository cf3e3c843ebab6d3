"""Mutable-table semantics (operators/cdc.py) + gap fill
(operators/profile.py:gapfill_series) — planted-scenario tests.

The oracle queries (cdc_latest_state / cdc_collapse_net /
scd2_user_history / time_gapfill) hash-verify against DuckDB over the
real tables every pytest run; these tests pin the SEMANTIC edge cases
on tiny planted logs where each rule is visible by eye.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flow_pipeline_spark.operators.cdc import (
    collapse_signs, latest_state, scd2_intervals)
from flow_pipeline_spark.operators.profile import gapfill_series


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def log(spark):
    rows = [
        # key A: v1 insert, v2 update -> live with v2's state
        ("A", _ts(1), 1, "x", False),
        ("A", _ts(2), 2, "y", False),
        # key B: insert then DELETE wins -> key disappears
        ("B", _ts(1), 3, "x", False),
        ("B", _ts(3), 4, "x", True),
        # key C: DELETE then a LATER insert -> live (delete is old)
        ("C", _ts(1), 5, "x", True),
        ("C", _ts(4), 6, "z", False),
        # key D: tie on ts -> greater event_id wins
        ("D", _ts(5), 7, "old", False),
        ("D", _ts(5), 8, "new", False),
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, state string, del boolean")


def test_latest_state_upsert_tombstone_and_ties(log):
    out = {r["k"]: r for r in
           latest_state(log, ["k"], ["ts", "eid"], deleted_col="del")
           .collect()}
    assert set(out) == {"A", "C", "D"}          # B deleted, no resurrect
    assert out["A"]["state"] == "y"             # last version wins
    assert out["C"]["state"] == "z"             # later insert revives C
    assert out["D"]["state"] == "new"           # eid breaks the ts tie


def test_latest_state_without_tombstones_keeps_all_keys(log):
    out = latest_state(log, ["k"], ["ts", "eid"])
    assert out.count() == 4                      # one row per key


def test_latest_state_null_tombstone_flag_counts_as_live(spark):
    """A feed that only stamps the deleted flag on tombstones (NULL
    elsewhere) must not lose its un-stamped keys: NULL == live. Under a
    bare ``~col`` filter NULL evaluates to NULL and the row silently
    drops — the coalesce(_, false) form keeps it."""
    rows = [
        ("A", _ts(1), 1, "x", None),    # live, flag never stamped
        ("B", _ts(1), 2, "x", None),
        ("B", _ts(2), 3, "x", True),    # stamped tombstone still deletes
        ("C", _ts(1), 4, "x", False),   # explicit live
    ]
    log = spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, state string, del boolean")
    out = {r["k"] for r in
           latest_state(log, ["k"], ["ts", "eid"], deleted_col="del")
           .collect()}
    assert out == {"A", "C"}


def test_collapse_signs_cancellation_and_state(spark):
    rows = [
        # key A: +1, cancel, +1 (new state) -> net 1, state "a2"
        ("A", _ts(1), 1, "a1", 1),
        ("A", _ts(2), 2, "a1", -1),
        ("A", _ts(3), 3, "a2", 1),
        # key B: +1 then cancel -> net 0, key gone
        ("B", _ts(1), 4, "b1", 1),
        ("B", _ts(2), 5, "b1", -1),
        # key C: stray cancel only -> net < 0, key gone
        ("C", _ts(1), 6, "c1", -1),
    ]
    log = spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, state string, sign int")
    out = {r["k"]: r for r in
           collapse_signs(log, ["k"], "sign", ["ts", "eid"],
                          ["state"]).collect()}
    assert set(out) == {"A"}
    assert out["A"]["net"] == 1
    assert out["A"]["state"] == "a2"


def test_scd2_intervals_collapse_and_validity(spark):
    rows = [  # x x y x -> versions x(1..3), y(3..5), x(5..)
        ("U", _ts(1), 1, "x"),
        ("U", _ts(2), 2, "x"),
        ("U", _ts(3), 3, "y"),
        ("U", _ts(5), 4, "x"),
    ]
    log = spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, attr string")
    out = (scd2_intervals(log, ["k"], ["attr"], ["ts", "eid"], "ts")
           .orderBy("version").collect())
    assert [(r["attr"], r["version"]) for r in out] == \
        [("x", 1), ("y", 2), ("x", 3)]
    assert out[0]["effective_from"] == _ts(1)
    assert out[0]["effective_to"] == _ts(3)      # repeat at _ts(2) merged
    assert out[1]["effective_to"] == _ts(5)
    assert out[2]["effective_to"] is None and out[2]["is_current"]
    assert not out[0]["is_current"]


def test_scd2_null_attr_transitions(spark):
    rows = [("U", _ts(1), 1, "x"), ("U", _ts(2), 2, None),
            ("U", _ts(3), 3, None), ("U", _ts(4), 4, "x")]
    log = spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, attr string")
    out = (scd2_intervals(log, ["k"], ["attr"], ["ts", "eid"], "ts")
           .orderBy("version").collect())
    # x -> NULL counts as a change; NULL -> NULL does not; NULL -> x does
    assert [r["attr"] for r in out] == ["x", None, "x"]


def test_gapfill_policies_and_bounds(spark):
    rows = [("s", _ts(0), 2, 1.5), ("s", _ts(3), 4, 2.5),
            ("t", _ts(1), 1, 9.0)]
    series = spark.createDataFrame(
        rows, "k string, t timestamp, n long, g double")
    out = gapfill_series(series, ["k"], "t", "interval 1 minute",
                         {"n": "zero", "g": "locf"})
    got = {(r["k"], r["t"].minute): (r["n"], r["g"]) for r in out.collect()}
    # series s: minutes 0..3 materialize; 1,2 are fills
    assert got[("s", 0)] == (2, 1.5)
    assert got[("s", 1)] == (0, 1.5)             # zero + carried gauge
    assert got[("s", 2)] == (0, 1.5)
    assert got[("s", 3)] == (4, 2.5)
    # series t: single observation -> single row, no fills beyond bounds
    assert [m for (k, m) in got if k == "t"] == [1]


def test_gapfill_rejects_unknown_policy(spark):
    series = spark.createDataFrame(
        [("s", _ts(0), 1)], "k string, t timestamp, n long")
    with pytest.raises(ValueError, match="unknown fill policy"):
        gapfill_series(series, ["k"], "t", "interval 1 minute",
                       {"n": "interpolate"}).collect()
