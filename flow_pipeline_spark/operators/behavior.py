"""Behavioral analytics: funnel conversion and cohort retention.

The event-sequence query classes every product-analytics deployment
runs beside its dashboards (the reference's Grafana tier stops at
panel aggregates; ClickHouse ships windowFunnel()/retention() as
dedicated aggregate functions — these are the Spark-native forms,
built from joins and aggregates so Catalyst keeps the whole plan
optimizable).

Both stay in exact integer arithmetic (counts, epoch-derived bucket
indexes, HALF-UP e4 ratios — the repo-wide `_ratio_e4` device) so
results hash-match the DuckDB oracles bit-for-bit.

Scale notes in each function; the common theme: everything keys on the
user column, so each stage is one user-keyed shuffle (or a broadcast
when the surviving-user set is small), and event rows never fan out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: list[str], *,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           horizon_secs: int | None = None) -> DataFrame:
    """Ordered-funnel conversion: how many users performed ``steps`` in
    order (each step strictly after the previous one; with
    ``horizon_secs``, all within that window of their step-1 time —
    ClickHouse ``windowFunnel`` semantics, earliest-entry variant).

    Returns one row per stage: (stage, step, n_users,
    conversion_e4) — conversion from stage 1 in exact HALF-UP integer
    ten-thousandths; stage 1's conversion is 10000 by construction.

    Semantics: a user's stage-k time is the EARLIEST event of step k
    strictly after their stage-(k-1) time (min-chaining). This is the
    standard funnel definition and is order-deterministic; it does not
    backtrack (a later step-1 event is never reconsidered), matching
    the ClickHouse earliest-entry behavior.

    Scale: stage k is one filtered aggregate (min ts per user) joined
    to the survivors of stage k-1 — |steps|-1 user-keyed joins over
    MONOTONICALLY SHRINKING user sets; the event table is scanned once
    per step with the step's type filter pushed to the scan, and rows
    aggregate before any join. Each stage frame is lazily
    localCheckpoint-ed (the repeated_span_table idiom), so stage k's
    survivors materialize exactly once and are REUSED by stage k+1 and
    by the count pass — without the cut, every count re-runs its whole
    stage chain from the raw events and the plan degenerates to
    O(|steps|^2) scans."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(u.alias("u")).agg(F.min(t).alias("t1"))
           .select("u", "t1", F.col("t1").alias("tk"))
           .localCheckpoint(eager=False))
    stages = [cur]
    for step in steps[1:]:
        nxt = (events.filter(F.col(type_col) == step)
               .select(u.alias("u"), t.alias("_ts"))
               .join(cur.select("u", "t1", "tk"), "u")
               .filter(F.col("_ts") > F.col("tk")))
        if horizon_secs is not None:
            nxt = nxt.filter(
                F.col("_ts") <= F.col("t1")
                + F.expr(f"INTERVAL {int(horizon_secs)} SECONDS"))
        cur = (nxt.groupBy("u", "t1")
               .agg(F.min("_ts").alias("tk"))
               .select("u", "t1", "tk")
               .localCheckpoint(eager=False))
        stages.append(cur)
    counts = [df.agg(F.count("*").cast("long").alias("n")) for df in stages]
    rows = None
    for i, c in enumerate(counts):
        r = c.select(F.lit(i + 1).cast("long").alias("stage"),
                     F.lit(steps[i]).alias("step"),
                     F.col("n").alias("n_users"))
        rows = r if rows is None else rows.unionByName(r)
    base = F.broadcast(counts[0].select(F.col("n").alias("_n1")))
    return (rows.crossJoin(base)
            .select("stage", "step", "n_users",
                    F.when(F.col("_n1") == 0, F.lit(0)).otherwise(
                        F.expr("(20000 * n_users + _n1) div (2 * _n1)"))
                    .cast("long").alias("conversion_e4"))
            .orderBy("stage"))


def retention(events: DataFrame, *, user_col: str = "user_id",
              ts_col: str = "ts", bucket_secs: int = 604_800,
              max_k: int | None = None) -> DataFrame:
    """Cohort retention: users grouped by first-activity bucket
    (weekly by default), counted again in each later bucket they were
    active. Returns (cohort, k, n_users, retained_e4) — ``cohort`` is
    the integer bucket index (epoch div bucket_secs), ``k`` the offset
    in buckets (k=0 is the cohort size itself, retained_e4 = 10000),
    ``retained_e4`` the HALF-UP integer ten-thousandths of the cohort
    still active at offset k.

    Scale: the raw table reduces to DISTINCT (user, bucket) in one
    partial-aggregated shuffle; cohorts are a per-user min over that
    (same keys, exchange reused); the final join keys on the user and
    the output is |cohorts|x|offsets| tiny rows. Event rows never join
    anything."""
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_secs) \
        .cast("long")
    # lazy checkpoints (round-10): `active` feeds the cohort aggregate
    # AND the join, `counts` feeds the k=0 sizes AND the ratio join —
    # without the cuts each reference re-planned the chain from the raw
    # scan (4 scans in the plan for one logical pass)
    active = (events.select(F.col(user_col).alias("u"),
                            b.alias("bucket"))
              .distinct()
              .localCheckpoint(eager=False))
    cohorts = active.groupBy("u").agg(F.min("bucket").alias("cohort"))
    ret = (active.join(cohorts, "u")
           .select("cohort", (F.col("bucket") - F.col("cohort"))
                   .alias("k"), "u"))
    if max_k is not None:
        ret = ret.filter(F.col("k") <= max_k)
    # count(*), not count(distinct u): `active` is already DISTINCT on
    # (u, bucket) and cohort/k are functions of that pair, so the rows
    # are unique per (cohort, k, u) — the distinct form planned an
    # extra keyed re-aggregate for identical output (round-7 review)
    counts = (ret.groupBy("cohort", "k")
              .agg(F.count("*").cast("long").alias("n_users"))
              .localCheckpoint(eager=False))
    size = (counts.filter(F.col("k") == 0)
            .select(F.col("cohort").alias("_c"),
                    F.col("n_users").alias("_n0")))
    return (counts.join(F.broadcast(size),
                        counts["cohort"] == F.col("_c"))
            .select("cohort", "k", "n_users",
                    F.expr("(20000 * n_users + _n0) div (2 * _n0)")
                    .cast("long").alias("retained_e4"))
            .orderBy("cohort", "k"))
