"""Temporal joins Spark lacks as builtins — as-of (point-in-time) join.

The reference README describes enrichment of flows with ASN/country/customer
dimensions (README.md:44-51). Real enrichment dims are *slowly changing*
(AS ownership, geo mappings drift), so the correct join is point-in-time:
each flow matches the latest dimension row at-or-before its timestamp.
Neither Spark nor ClickHouse (at the reference snapshot) ships an ASOF
join; DuckDB does, which we use as an independent oracle.

Implementation is the union trick — O(n log n) per key via one window, no
range-join explosion:

  1. tag event rows 0 / dim rows 1, union on (key, t, payload…);
  2. one window per key ordered (t, is_dim DESC) — a dim row sorts before
     events at the same t, making the match inclusive (dim.t <= e.t);
  3. last(payload, ignorenulls=True) propagates the latest dim values;
  4. keep event rows.

Scale: ONE shuffle on the key (both inputs co-partitioned by the window),
state per task = one row of look-back. Compare: expressing this as a range
join (dim.t <= e.t AND e.t < dim.next_t) needs a self-window on the dim
plus a range join that Catalyst turns into a broadcast-nested-loop unless
binned. The union form is the plan you want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(events: DataFrame, dim: DataFrame, key: str, *,
              event_time: str = "t", dim_time: str = "t",
              payload: list[str]) -> DataFrame:
    """Left as-of join: for each event row, the ``payload`` columns of the
    dim row with the greatest ``dim_time`` <= event time for the same key
    (inclusive); NULL payload when no dim row precedes the event.

    ``dim`` must be unique per (key, dim_time) — pre-aggregate otherwise
    (duplicate timestamps make any asof semantics ambiguous).
    """
    e = events.withColumn("__is_dim", F.lit(0))
    for c in payload:
        if c in events.columns:
            # the old keep-existing-values path silently MIXED an
            # already-present events column into the last(ignorenulls)
            # propagation: an event inherited a stale non-null value
            # from an EARLIER EVENT instead of the preceding dim row,
            # and the "NULL when no dim precedes" contract broke
            # (round-7 review) — ambiguous input, refuse loudly
            raise ValueError(
                f"asof_join: events already has a column {c!r} named in "
                f"payload — rename or drop it before the join")
        e = e.withColumn(c, F.lit(None))
    d = dim.select(
        F.col(key), F.col(dim_time).alias(event_time),
        *[F.col(c) for c in payload]).withColumn("__is_dim", F.lit(1))
    extra = [c for c in e.columns if c not in d.columns]
    for c in extra:
        d = d.withColumn(c, F.lit(None))
    u = e.select(sorted(e.columns)).unionByName(d.select(sorted(d.columns)))

    w = (W.partitionBy(key)
         .orderBy(F.col(event_time).asc(), F.col("__is_dim").desc())
         .rowsBetween(W.unboundedPreceding, 0))
    for c in payload:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__is_dim") == 0).drop("__is_dim")
