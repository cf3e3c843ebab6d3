"""Flow-pipeline parity tests: synthetic flows → dashboard queries → 5-min
rollup → compaction, checked against an independent pandas/ipaddress oracle
(the reference ships no tests — SURVEY §5 strategy)."""

from __future__ import annotations

import ipaddress

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flow_pipeline_spark.operators.rollup import (
    build_rollup_5m,
    compact_rollup,
    rollup_flat,
    rollup_invariant_check,
    route_traffic_query,
)
from flow_pipeline_spark.plans import flow_queries as FQ
from flow_pipeline_spark.sources.mocker import flows_raw, synthetic_flows

N = 8000


@pytest.fixture(scope="module")
def flows(spark):
    df = flows_raw(synthetic_flows(spark, N, seed=7)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def fpd(flows) -> pd.DataFrame:
    return flows.toPandas()


def render(addr: bytes, etype: int) -> str:
    if etype == 0x800:
        return ".".join(str(b) for b in bytes(addr)[:4])
    return str(ipaddress.IPv6Address(bytes(addr)))


def test_generator_invariants(flows, fpd):
    assert len(fpd) == N
    assert set(fpd["Etype"]) == {0x800, 0x86DD}
    # all 9 AS pairs (FIXTURES.md F1 invariant)
    assert len(fpd.groupby(["SrcAS", "DstAS"])) == 9
    # non-decreasing by construction (cumulative jitter steps over id
    # order); the old `or True` short-circuit made this unfalsifiable
    # (round-7 review)
    assert fpd["TimeReceived"].is_monotonic_increasing
    assert (fpd["Bytes"] < 1500).all() and (fpd["Packets"] < 100).all()
    # ≥3 distinct 5-min buckets and ≥2 dates would need long spans; at 250ms
    # mean step 8000 rows ≈ 33 min → ≥3 buckets
    assert fpd["TimeReceived"].dt.floor("5min").nunique() >= 3


def test_generator_deterministic(spark):
    a = synthetic_flows(spark, 500, seed=7).toPandas()
    b = synthetic_flows(spark, 500, seed=7).toPandas()
    pd.testing.assert_frame_equal(a, b)
    c = synthetic_flows(spark, 500, seed=8).toPandas()
    assert not a["Bytes"].equals(c["Bytes"])


def test_instant_traffic(flows, fpd):
    got = FQ.instant_traffic(flows).toPandas()
    exp = (
        fpd.assign(t=(fpd["TimeReceived"].dt.floor("min").astype("int64") // 10**9 * 1000),
                   traffic=fpd["Bytes"] * fpd["SamplingRate"])
        .groupby("t", as_index=False)["traffic"].sum()
        .rename(columns={"traffic": "sumbytes"})
        .sort_values("t", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_top_src_ips(flows, fpd):
    got = FQ.top_src_ips(flows, k=None).toPandas()
    exp = (
        fpd.assign(
            srcip=[render(a, e) for a, e in zip(fpd["SrcAddr"], fpd["Etype"])],
            traffic=fpd["Bytes"] * fpd["SamplingRate"])
        .groupby("srcip", as_index=False)["traffic"].sum()
        .rename(columns={"traffic": "sumbytes"})
        .sort_values(["sumbytes", "srcip"], ascending=[False, True],
                     ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_top_ports(flows, fpd):
    got = FQ.top_dst_ports(flows, k=None).toPandas()
    exp = (
        fpd.assign(traffic=fpd["Bytes"] * fpd["SamplingRate"])
        .groupby(fpd["DstPort"])["traffic"].sum().reset_index()
        .rename(columns={"DstPort": "port", "traffic": "sumbytes"})
        .sort_values(["sumbytes", "port"], ascending=[False, True],
                     ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rollup_nested_shape(flows, fpd):
    got = build_rollup_5m(flows).toPandas()
    slot = fpd["TimeReceived"].dt.floor("5min")
    per = (
        fpd.assign(Timeslot=slot)
        .groupby(["Date", "Timeslot", "SrcAS", "DstAS", "Etype"])
        .agg(Bytes=("Bytes", "sum"), Packets=("Packets", "sum"),
             Count=("Bytes", "size"))
        .reset_index()
    )
    tot = (
        per.groupby(["Date", "Timeslot", "SrcAS", "DstAS"])
        .agg(Bytes=("Bytes", "sum"), Packets=("Packets", "sum"),
             Count=("Count", "sum")).reset_index()
    )
    assert len(got) == len(tot)
    g = got.set_index(["Timeslot", "SrcAS", "DstAS"])
    for _, r in tot.iterrows():
        row = g.loc[(r["Timeslot"], r["SrcAS"], r["DstAS"])]
        assert row["Bytes"] == r["Bytes"]
        assert row["Count"] == r["Count"]
        # nested arrays: per-EType entries sorted by EType
        etypes = [e["EType"] for e in row["ETypeMap"]]
        assert etypes == sorted(etypes)
        sub = per[(per["Timeslot"] == r["Timeslot"]) & (per["SrcAS"] == r["SrcAS"])
                  & (per["DstAS"] == r["DstAS"])]
        assert sum(e["Bytes"] for e in row["ETypeMap"]) == sub["Bytes"].sum()


def test_summing_merge_tree_invariant(spark, flows):
    """Partial blocks (micro-batches) → append → compaction ≡ direct rollup.
    This is the OPTIMIZE TABLE semantics (README.md:164-183)."""
    # simulate 3 insert blocks producing partial rollup rows
    blocks = [flows.filter(F.col("SequenceNum") % 3 == i) for i in range(3)]
    partials = blocks[0].transform(rollup_flat)
    for b in blocks[1:]:
        partials = partials.unionByName(rollup_flat(b))
    assert partials.count() > rollup_flat(flows).count()  # dup keys exist
    assert rollup_invariant_check(flows, partials)
    # compaction idempotent
    once = compact_rollup(partials)
    twice = compact_rollup(once)
    assert once.exceptAll(twice).isEmpty() and twice.exceptAll(once).isEmpty()


def test_rollup_routing_equivalence(flows):
    rollup = rollup_flat(flows)
    via_rollup = route_traffic_query(flows, rollup, ["SrcAS"], interval_s=600)
    via_raw = route_traffic_query(flows, None, ["SrcAS"], interval_s=600)
    a = via_rollup.orderBy("t", "SrcAS").toPandas()
    b = via_raw.orderBy("t", "SrcAS").toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_batch_demo_end_to_end(spark, tmp_path):
    """The demo wiring: generate → persist → rollup → compact → panels all
    produce consistent results from one call."""
    from flow_pipeline_spark.demo import run_batch_demo

    panels = run_batch_demo(spark, str(tmp_path / "demo"), rows=5000)
    counts = {k: df.count() for k, df in panels.items()}
    assert counts["top_src_ips"] == 10
    assert counts["top_src_ports"] == 10
    assert counts["instant_traffic"] > 0
    assert counts["rollup"] > 0
    # rollup total bytes == raw total bytes (compaction preserved mass)
    from pyspark.sql import functions as F
    raw_bytes = (spark.read.parquet(str(tmp_path / "demo/flows_raw"))
                 .agg(F.sum("Bytes")).collect()[0][0])
    rollup_bytes = panels["rollup"].agg(F.sum("Bytes")).collect()[0][0]
    assert raw_bytes == rollup_bytes


def test_top_addr_render_after_topk_matches_render_all(spark):
    """Round-11: the top-k IP panels re-aggregate and cut NATIVELY on a
    canonical key and render only the publishing rows — results must be
    row-identical to the render-everything form (k=None prefix), on an
    adversarial corpus: v4 rows colliding on the first-4-bytes render,
    v4-mapped v6, NULL etype (v6 arm by the CASE), empty/NULL addrs, and
    exact sumbytes ties at the k boundary."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    def r(addr, etype, b):
        return Row(SrcAddr=addr, Etype=etype, Bytes=b, SamplingRate=1)

    v4 = 0x800
    v6 = 0x86DD
    rows = [
        # two DIFFERENT 16-byte addrs, same first 4 bytes, etype v4:
        # renders collide ("1.2.3.4") and must merge
        r(bytes([1, 2, 3, 4]) + b"\x00" * 11 + b"\x01", v4, 100),
        r(bytes([1, 2, 3, 4]) + b"\x00" * 11 + b"\x02", v4, 50),
        # v4-mapped v6: renders via the v6 arm (no dotted special form)
        r(b"\x00" * 10 + b"\xff\xff" + bytes([1, 2, 3, 4]), v6, 120),
        # plain v6
        r(b"\x20\x01\x0d\xb8" + b"\x00" * 12, v6, 90),
        # NULL etype -> the CASE's otherwise arm (v6 render)
        r(b"\x20\x01\x0d\xb8" + b"\x00" * 12, None, 5),
        # exact tie group at the boundary (distinct v4 renders, equal sums)
        r(bytes([9, 9, 9, 1]) + b"\x00" * 12, v4, 60),
        r(bytes([9, 9, 9, 2]) + b"\x00" * 12, v4, 60),
        r(bytes([9, 9, 9, 3]) + b"\x00" * 12, v4, 60),
        # NULL / empty addrs in both arms -> one NULL-render group
        r(None, v4, 7),
        r(b"", v6, 7),
        # short and long addrs (the kernel pads/truncates to 16)
        r(b"\x20\x01", v6, 40),
        r(b"\x20\x01" + b"\x00" * 14, v6, 3),   # == padded short one
        r(b"\x20\x01\x0d\xb8" + b"\x00" * 12 + b"\xaa", v6, 2),
    ]
    flows = spark.createDataFrame(
        rows, "SrcAddr binary, Etype int, Bytes long, SamplingRate long")
    full = FQ.top_src_ips(flows, k=None).toPandas()
    for k in (1, 2, 3, 4, 5, 8, 20):
        got = FQ.top_src_ips(flows, k=k).toPandas()
        exp = full.head(k).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # k=0 stays an empty top-0
    assert FQ.top_src_ips(flows, k=0).count() == 0
    # and the short-vs-padded v6 pair really did merge in BOTH forms
    key = full["srcip"].tolist()
    assert len(key) == len(set(k for k in key if k is not None)) + \
        (1 if key.count(None) else 0)
