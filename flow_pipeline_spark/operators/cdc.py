"""Mutable-table semantics over an immutable event log.

The ClickHouse MergeTree family the reference deploys on
(``compose/clickhouse/create.sh:60`` MergeTree, ``:88``
SummingMergeTree — the summing form is ``operators/rollup.py``) has
two sibling engines every CH deployment reaches for the moment rows
mutate: **ReplacingMergeTree** (last-version-wins upsert compaction —
the CDC "apply" step) and **CollapsingMergeTree** (+1/-1 sign
cancellation). Warehouses spell the same operations MERGE INTO /
``apply_changes``; this module is their Spark-native batch form:
pure window/aggregate compositions, no UDFs, no driver loops.

Also here: the SCD Type-2 dimension BUILD (``scd2_intervals``) — the
producer of the validity-interval tables that
``operators/temporal.py:asof_join`` consumes at query time.

Cross-engine determinism: every "latest" is a ``row_number`` over an
explicit (ORDER BY ... DESC) list whose last column must be unique
(callers pass the event id), so the winning row is the same on any
engine or partitioning — never a float argmax, never an unordered
``last()``.

Scale: all three operators shuffle exactly once on the entity key and
carry only the columns they output; per-key state inside the window is
one running comparison, never a buffered history. At 100 TB the
compaction is the same shape ClickHouse runs in its background merges
— a key-partitioned scan — and AQE handles skewed keys (hot entities)
via split-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _desc_order(order_cols: list[str]):
    return [F.col(c).desc() for c in order_cols]


def latest_state(log: DataFrame, keys: list[str], order_cols: list[str],
                 *, deleted_col: str | None = None) -> DataFrame:
    """ReplacingMergeTree(ver) FINAL / CDC upsert-apply: one row per
    key — the row with the greatest ``order_cols`` tuple (pass a
    unique id last to pin ties). With ``deleted_col`` naming a boolean
    column, a key whose WINNING row is a tombstone disappears entirely
    (ClickHouse's ``is_deleted`` form; DELETE in a CDC feed) — an
    older live row never resurrects a deleted key. A NULL flag counts
    as LIVE (``coalesce(_, false)``): feeds that only stamp the flag on
    tombstones don't silently lose their un-stamped keys.

    Scale: one key-partitioned window (rank-1 filter compiles to a
    WindowGroupLimit pushdown in Spark 3.5+, so only the per-key top
    row survives the sort buffer); no join, no second scan."""
    w = W.partitionBy(*keys).orderBy(*_desc_order(order_cols))
    out = (log.withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") == 1).drop("__rn"))
    if deleted_col is not None:
        out = out.filter(~F.coalesce(F.col(deleted_col), F.lit(False)))
    return out


def collapse_signs(log: DataFrame, keys: list[str], sign_col: str,
                   order_cols: list[str],
                   state_cols: list[str]) -> DataFrame:
    """CollapsingMergeTree: the log holds +1 (state) and -1 (cancel)
    rows; a key survives iff ``sum(sign) > 0``, carrying the latest
    +1 row's ``state_cols`` plus the net count. Equal numbers of
    +1/-1 rows cancel to nothing — the engine's crash-safe way to
    retract previously-inserted rows.

    Scale: one key-bounded aggregate for the net + one window over
    the +1 subset for the state, joined on the key — both shuffles
    are on the same key so AQE coalesces them into one exchange
    reuse; state never includes cancelled history."""
    net = (log.groupBy(*keys)
           .agg(F.sum(sign_col).cast("long").alias("net"))
           .filter(F.col("net") > 0))
    latest_pos = latest_state(log.filter(F.col(sign_col) > 0),
                              keys, order_cols)
    return net.join(latest_pos.select(*keys, *state_cols), keys)


def scd2_intervals(log: DataFrame, keys: list[str], attr_cols: list[str],
                   order_cols: list[str], ts_col: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse the per-key change log to
    one row per ATTRIBUTE VERSION — consecutive rows with identical
    ``attr_cols`` merge; each version carries
    ``effective_from`` (its first ``ts_col``), ``effective_to`` (the
    next version's start, NULL while current), ``version`` (1-based
    per key) and ``is_current``. This is the table
    ``temporal.asof_join`` consumes for point-in-time enrichment.

    Scale: two windows over the same key partitioning (change-detect
    lag, then version lead) — one shuffle, no self-join; rows shrink
    at the change filter before the second window."""
    w = W.partitionBy(*keys).orderBy(*order_cols)
    # first row of a key always opens a version; after that, null-safe
    # inequality on any attribute (NULL -> NULL is NOT a change,
    # x -> NULL and NULL -> x are)
    changed = F.lag(F.lit(1)).over(w).isNull()
    for c in attr_cols:
        changed = changed | ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    versions = (log.withColumn("__chg", changed)
                .filter(F.col("__chg")).drop("__chg"))
    wv = W.partitionBy(*keys).orderBy(*order_cols)
    return (versions
            .withColumn("version", F.row_number().over(wv))
            .withColumn("effective_from", F.col(ts_col))
            .withColumn("effective_to", F.lead(F.col(ts_col)).over(wv))
            .withColumn("is_current", F.col("effective_to").isNull())
            .select(*keys, *attr_cols, "version",
                    "effective_from", "effective_to", "is_current"))
