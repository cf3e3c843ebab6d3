"""The SURVEY.md §2 operator inventory as (Spark builder, DuckDB oracle) pairs.

Each entry maps one operator class of the reference pipeline onto the
driver's test warehouse (TESTDATA.md): the ``events`` table plays the role
of the flow stream (user_id ~ AS/IP key, value ~ Bytes, event_type ~
EType/port), ``lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region`` plays the
enrichment-join class, ``documents``/``embeddings`` carry the dedup /
text-QC / similarity tier.

Conventions (driver contract):
- every computed column aliased identically in Spark and SQL;
- double aggregates rounded (4dp) in BOTH engines so value-hashes are
  bitwise-stable despite summation-order differences;
- every result totally ordered by explicit keys (hash compare is
  order-insensitive, but ORDER BY + LIMIT top-k needs deterministic ties —
  every LIMIT is preceded by a full tie-breaking sort).

Scale notes are attached per query: what the plan must look like at 100 TB
(broadcast vs shuffle, pushdown, partial aggregation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.tables import load_table
from ..functions.timeutil import to_start_of_five_minute, to_start_of_minute


@dataclass(frozen=True)
class QueryDef:
    """One checkable operator: Spark builder + equivalent DuckDB SQL.

    ``oracle`` is None for ops not expressible in ANSI SQL (the driver then
    records a rows-only check)."""
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def _q(name: str, oracle: Optional[str], doc: str = ""):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(spark=fn, oracle=oracle, doc=doc)
        return fn
    return wrap


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


# ---------------------------------------------------------------------------
# Flow-dashboard analogs over `events`  (viz-ch.json / viz.json query family)
# ---------------------------------------------------------------------------

@_q(
    "instant_traffic_1m",
    """
    SELECT date_trunc('minute', ts) AS t,
           round(sum(value), 4)    AS sum_value,
           count(*)                AS n
    FROM events GROUP BY t ORDER BY t
    """,
    doc="A1/A6/O1 — 'Instant traffic' (viz-ch.json:74): toStartOfMinute + "
        "sum(expr) GROUP BY t ORDER BY t. Scale: partial agg map-side, one "
        "shuffle on the minute bucket; scan prunes to (ts, value).",
)
def instant_traffic_1m(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy(to_start_of_minute(F.col("ts")).alias("t"))
        .agg(F.round(F.sum("value"), 4).alias("sum_value"),
             F.count("*").alias("n"))
        .orderBy("t")
    )


@_q(
    "rate_30s",
    """
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 30) * 30 AS bucket,
           round(sum(value) * 8 / 30, 4)          AS bits_per_sec
    FROM events GROUP BY bucket ORDER BY bucket
    """,
    doc="A2/A6 — PG dashboard rate query (viz.json:62): 30-s buckets via "
        "epoch integer division, sum*8/30 normalized rate.",
)
def rate_30s(spark, sf_dir):
    bucket = ((F.unix_timestamp("ts") / 30).cast("long") * 30).alias("bucket")
    return (
        _events(spark, sf_dir)
        .groupBy(bucket)
        .agg(F.round(F.sum("value") * 8 / 30, 4).alias("bits_per_sec"))
        .orderBy("bucket")
    )


@_q(
    "top_talkers",
    """
    SELECT user_id, round(sum(value), 4) AS sum_value, count(*) AS n
    FROM events GROUP BY user_id
    ORDER BY sum_value DESC, user_id ASC LIMIT 10
    """,
    doc="A5/O2 — top-N table panels (viz-ch.json:233,479): group by talker "
        "key, ORDER BY agg DESC LIMIT k. Scale: TakeOrderedAndProject — "
        "per-partition top-k then driver merge of k*P rows, no global sort.",
)
def top_talkers(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("sum_value"),
             F.count("*").alias("n"))
        .orderBy(F.desc("sum_value"), F.asc("user_id"))
        .limit(10)
    )


@_q(
    "top_event_types",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type ASC LIMIT 10
    """,
    doc="A3/A5/O2 — 'top ports' panel analog (viz-ch.json:358): count() by "
        "small-cardinality key.",
)
def top_event_types(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(10)
    )


@_q(
    "rollup_5m",
    """
    SELECT CAST(ts AS DATE)                                       AS date,
           make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300) * 1000000) AS timeslot,
           user_id, event_type,
           round(sum(value), 4) AS sum_value, count(*) AS n
    FROM events
    GROUP BY date, timeslot, user_id, event_type
    ORDER BY date, timeslot, user_id, event_type
    """,
    doc="A4/A6/A7/W4 — the flows_5m rollup as a batch groupBy (clickhouse "
        "create.sh:92-110): 5-min tumbling slot + multi-key group. Scale: "
        "this IS the pre-aggregation that answers dashboard queries without "
        "touching raw — see operators/rollup.py for the stored variant.",
)
def rollup_5m(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.to_date("ts").alias("date"),
            to_start_of_five_minute(F.col("ts")).alias("timeslot"),
            "user_id", "event_type",
        )
        .agg(F.round(F.sum("value"), 4).alias("sum_value"),
             F.count("*").alias("n"))
        .orderBy("date", "timeslot", "user_id", "event_type")
    )


@_q(
    "pair_matrix",
    """
    SELECT user_id, event_type, round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY user_id, event_type
    ORDER BY sum_value DESC, user_id ASC, event_type ASC
    LIMIT 20
    """,
    doc="A4/A5/O2 — (SrcAS,DstAS)-pair top-k analog (README.md:174-183).",
)
def pair_matrix(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy(F.desc("sum_value"), F.asc("user_id"), F.asc("event_type"))
        .limit(20)
    )


@_q(
    "time_filtered_scan",
    """
    SELECT event_id, user_id, event_type, round(value, 4) AS value
    FROM events
    WHERE ts >= (SELECT min(ts) FROM events) + INTERVAL 1 HOUR
      AND event_type = 'click'
    ORDER BY event_id
    LIMIT 100
    """,
    doc="P2/P5/P6/O1 — $timeFilter + equality predicate + projection "
        "(viz-ch.json:75, README.md:174-178). Scale: both predicates push "
        "to the parquet scan; Date-partition pruning when partitioned.",
)
def time_filtered_scan(spark, sf_dir):
    e = _events(spark, sf_dir)
    lo = e.agg((F.min("ts") + F.expr("INTERVAL 1 HOUR")).alias("lo"))
    # scalar-subquery via broadcast cross join: stays distributed, no collect
    return (
        e.crossJoin(F.broadcast(lo))
        .filter((F.col("ts") >= F.col("lo")) & (F.col("event_type") == "click"))
        .select("event_id", "user_id", "event_type",
                F.round("value", 4).alias("value"))
        .orderBy("event_id")
        .limit(100)
    )


@_q(
    "partitioned_day_scan",
    """
    SELECT event_type,
           count(*)             AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-09'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="P5 partition pruning — the reference's toDate($dateFilter) trick "
        "(viz-ch.json:75; clickhouse create.sh:45 PARTITION BY Date): scan "
        "a Date-partitioned layout (the raw-persist MV's, "
        "streaming/jobs.py:58) with a day predicate. The predicate prunes "
        "whole day DIRECTORIES before any IO — the plan carries "
        "PartitionFilters, not a data filter (tests/test_plans.py). At "
        "100 TB a 5-day panel reads 5 partitions, not the table.",
)
def partitioned_day_scan(spark, sf_dir):
    from ..sources.tables import partitioned_events_dir
    part = spark.read.parquet(partitioned_events_dir(spark, sf_dir))
    return (
        part.filter(F.col("day").between(F.to_date(F.lit("2024-01-05")),
                                         F.to_date(F.lit("2024-01-09"))))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("event_type")
    )


@_q(
    "conditional_class",
    """
    SELECT CASE WHEN value >= 500 THEN 'high'
                WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS cls,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY cls ORDER BY cls
    """,
    doc="P7 — if(EType = 0x800, ..., ...) conditional expression "
        "(viz-ch.json:233) as CASE/when-otherwise.",
)
def conditional_class(spark, sf_dir):
    cls = (
        F.when(F.col("value") >= 500, "high")
        .when(F.col("value") >= 100, "mid")
        .otherwise("low")
        .alias("cls")
    )
    return (
        _events(spark, sf_dir)
        .groupBy(cls)
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("cls")
    )


@_q(
    "ipv4_render",
    """
    SELECT event_id,
           (user_id * 2654435761) % 4294967296 AS ipnum,
           CAST(((user_id * 2654435761) % 4294967296) // 16777216 % 256 AS VARCHAR)
           || '.' ||
           CAST(((user_id * 2654435761) % 4294967296) // 65536 % 256 AS VARCHAR)
           || '.' ||
           CAST(((user_id * 2654435761) % 4294967296) // 256 % 256 AS VARCHAR)
           || '.' ||
           CAST(((user_id * 2654435761) % 4294967296) % 256 AS VARCHAR) AS ip
    FROM events WHERE event_id < 100 ORDER BY event_id
    """,
    doc="P8/P9/P12 — IPv4NumToString semantics (viz-ch.json:233) as pure "
        "JVM expressions; u32 derived deterministically (Knuth hash) from "
        "user_id since the warehouse has no IP column. The binary-addr "
        "variants are unit-tested in tests/test_ip_functions.py.",
)
def ipv4_render(spark, sf_dir):
    from ..functions.ip import ipv4_num_to_string
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_id") < 100)
        .withColumn("ipnum", (F.col("user_id") * 2654435761) % 4294967296)
        .select("event_id", "ipnum",
                ipv4_num_to_string(F.col("ipnum")).alias("ip"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Join / set-op / window classes  (SURVEY §2.5)
# ---------------------------------------------------------------------------

@_q(
    "enrichment_join",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY region, nation
    ORDER BY region, nation
    """,
    doc="J1 — the described-but-unshipped enrichment join (README.md:44-51; "
        "SrcCountry/DstCountry columns pb.go:140-143): fact joined to dim "
        "chain. Scale: orders pre-aggregates to one (sum, count) row per "
        "custkey BEFORE the join, so the custkey shuffle carries "
        "|customers| rows instead of |orders|; nation/region broadcast "
        "(no shuffle).",
)
def enrichment_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.sum("o_totalprice").alias("rev"),
                     F.count("*").alias("cnt")))
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("rev"), 2).alias("revenue"),
             F.sum("cnt").alias("n_orders"))
        .orderBy("region", "nation")
    )


@_q(
    "revenue_top_customers",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 10
    """,
    doc="J1/A1/O2 — fact-fact join + top-k (TPC-H Q-3/Q-10 shape). Scale: "
        "lineitem pre-aggregates to one revenue row per orderkey BEFORE "
        "joining (partial-agg pushdown Catalyst won't do itself): the "
        "orderkey shuffle then carries |orders| rows instead of |lineitem| "
        "(~4× smaller, and the join build side shrinks the same way). "
        "Per-custkey partials reduce again before the customer join; AQE "
        "handles skew; top-k is TakeOrderedAndProject.",
)
def revenue_top_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    per_order = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("rev"))
    )
    per_cust = (
        per_order.join(o.select("o_orderkey", "o_custkey"),
                       per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@_q(
    "set_ops",
    """
    SELECT n_nationkey FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier
    ) t ORDER BY n_nationkey
    """,
    doc="J2 — set operations (unionByName/intersect/except available; the "
        "reference never needed them, SURVEY §2.5).",
)
def set_ops(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")).distinct()
    return c.intersect(s).orderBy("n_nationkey")


@_q(
    "window_latest_event",
    """
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1 AND user_id < 50
    ORDER BY user_id
    """,
    doc="J3 — window function (rank/lag class; PromQL-rate parity needs "
        "these, SURVEY §2.5-§2.6 W7). Scale: one shuffle on user_id; "
        "filter user_id<50 pushes below the window via predicate pushdown "
        "on the partition key.",
)
def window_latest_event(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        _events(spark, sf_dir)
        .filter(F.col("user_id") < 50)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


@_q(
    "range_band_join",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 100.0), ('mid', 100.0, 500.0),
             ('high', 500.0, 1e18))
    SELECT band, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band ORDER BY band
    """,
    doc="J1 (range-join class) — interval containment join, the same shape "
        "as longest-prefix IP→ASN enrichment (operators/enrich.py does the "
        "IP variant with coarse-bucket equi-join + broadcast; here the "
        "band dim broadcasts and Catalyst nest-loops 3 rows — free).",
)
def range_band_join(spark, sf_dir):
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e18)],
        "band string, lo double, hi double")
    e = _events(spark, sf_dir)
    return (
        e.join(F.broadcast(bands),
               (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("band")
    )


@_q(
    "distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="A9 — distinct aggregation (the reference never needed DISTINCT; "
        "SURVEY §2.3 notes it as a gap we close). Scale: two-phase "
        "partial-distinct shuffle; approx_count_distinct available for the "
        "sketch path.",
)
def distinct_users(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


@_q(
    "value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="W7 (quantile summaries) — exact interpolated percentiles "
        "(Prometheus-quantile analog, perfs.json panels). Spark "
        "`percentile` ≡ DuckDB quantile_cont. Scale: exact percentiles "
        "need a per-group sort; percentile_approx (t-digest) is the "
        "100 TB path, same call shape.",
)
def value_percentiles(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
             F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
             F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"))
        .orderBy("event_type")
    )


@_q(
    "sliding_rate_5m",
    """
    WITH buckets AS (
      SELECT user_id,
             (CAST(floor(epoch(ts)) AS BIGINT) // 30) * 30 AS t,
             sum(value) AS v
      FROM events WHERE user_id < 20 GROUP BY user_id, t),
    rated AS (
      SELECT user_id, t,
             round(sum(v) OVER (PARTITION BY user_id ORDER BY t
                                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                   / 300.0, 4) AS rate_5m
      FROM buckets)
    SELECT user_id, t, rate_5m FROM rated ORDER BY user_id, t
    """,
    doc="W7 — PromQL rate(m[5m]) parity (perfs.json:97,258,...): 30-s "
        "scrape buckets, sliding 10-bucket (5-min) window sum / 300 s. "
        "One shuffle on user_id serves both the groupBy and the window "
        "(same partitioning, Catalyst reuses the exchange).",
)
def sliding_rate_5m(spark, sf_dir):
    bucket = ((F.unix_timestamp("ts") / 30).cast("long") * 30).alias("t")
    buckets = (
        _events(spark, sf_dir)
        .filter(F.col("user_id") < 20)
        .groupBy("user_id", bucket)
        .agg(F.sum("value").alias("v"))
    )
    w = (W.partitionBy("user_id").orderBy("t").rowsBetween(-9, 0))
    return (
        buckets
        .withColumn("rate_5m", F.round(F.sum("v").over(w) / 300.0, 4))
        .select("user_id", "t", "rate_5m")
        .orderBy("user_id", "t")
    )


@_q(
    "metrics_rate_sum_by",
    """
    WITH inc AS (
      SELECT event_type, CAST(user_id % 3 AS INTEGER) AS instance,
             (CAST(floor(epoch(ts)) AS BIGINT) // 30) * 30 AS b,
             sum(CAST(floor(value * 10) AS BIGINT)) AS inc
      FROM events GROUP BY event_type, instance, b),
    ctr AS (
      SELECT event_type, instance, b,
             CAST(sum(inc) OVER (PARTITION BY event_type, instance
                                 ORDER BY b) % 50000 AS BIGINT) AS counter
      FROM inc),
    delta AS (
      SELECT event_type, instance, b, counter,
             counter - lag(counter) OVER (PARTITION BY event_type, instance
                                          ORDER BY b) AS d
      FROM ctr),
    adj AS (
      SELECT event_type, instance, b,
             CASE WHEN d IS NULL THEN NULL
                  WHEN d < 0 THEN counter ELSE d END AS d
      FROM delta),
    rated AS (
      SELECT event_type, instance, b AS t,
             round(sum(d) OVER (PARTITION BY event_type, instance ORDER BY b
                                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                   / 300.0, 4) AS rate
      FROM adj)
    SELECT event_type, t, round(sum(rate), 4) AS rate
    FROM rated GROUP BY event_type, t ORDER BY event_type, t
    """,
    doc="W7/S10 — full PromQL observability parity (perfs.json:97,258,464: "
        "sum by (label)(rate(counter[5m]))): cumulative per-series counters "
        "WITH planted resets (modulo wrap), reset-adjusted rate() — a "
        "decrease means restart, post-reset value is the delta — then "
        "sum-by-label across instances (operators/promql.py; the same "
        "counter_rate/sum_by run over MetricsListener output in "
        "tests/test_streaming.py). Scale: one shuffle on the series key "
        "serves lag + bucket agg + sliding frame; sum-by re-aggregates "
        "|series×buckets| tiny rows.",
)
def metrics_rate_sum_by(spark, sf_dir):
    from ..operators.promql import counter_rate, sum_by
    e = _events(spark, sf_dir)
    b = ((F.unix_timestamp("ts") / 30).cast("long") * 30)
    # one explicit series-key shuffle up front: partitioning by (event_type,
    # instance) clusters every downstream requirement — the 3-key bucket
    # aggregate (subset partitioning satisfies superset grouping), the
    # cumulative-sum window, the lag window, and the sliding rate frame all
    # reuse this single exchange instead of re-shuffling per step
    inc = (
        e.select("event_type",
                 (F.col("user_id") % 3).cast("int").alias("instance"),
                 b.alias("b"), F.floor(F.col("value") * 10).alias("v"))
        .repartition("event_type", "instance")
        .groupBy("event_type", "instance", "b")
        .agg(F.sum("v").alias("inc"))
    )
    wc = W.partitionBy("event_type", "instance").orderBy("b")
    ctr = (inc.withColumn("counter", F.sum("inc").over(wc) % 50000)
           .withColumn("ts", F.timestamp_seconds("b")))
    rates = counter_rate(ctr, series_cols=["event_type", "instance"],
                         ts_col="ts", value_col="counter")
    return sum_by(rates, ["event_type"]).orderBy("event_type", "t")


@_q(
    "approx_top_talkers",
    """
    SELECT user_id, count(*) AS est_count,
           count(*) + (SELECT count(*) FROM events) // 2049 AS upper_bound
    FROM events GROUP BY user_id
    ORDER BY est_count DESC, user_id ASC LIMIT 10
    """,
    doc="A5/O2 sketch path — heavy hitters via mergeable Misra-Gries "
        "(operators/scale.py:approx_top_k): the shuffle is bounded at "
        "`capacity` summary rows per partition regardless of key "
        "cardinality — the 100 TB form of top-talkers when the key is an "
        "IP/user/URL space too wide to groupBy-count. With capacity=2048 ≥ "
        "the distinct-key count at every test SF no trim fires, the sketch "
        "is exact, and DuckDB's plain count(*) top-k (plus the same "
        "deterministic n/(capacity+1) upper-bound arithmetic) hash-matches "
        "— the trimmed regime's bounds are pytest-asserted on skewed "
        "synthetic data (tests/test_scale_ops.py).",
)
def approx_top_talkers(spark, sf_dir):
    from ..operators.scale import approx_top_k
    return approx_top_k(_events(spark, sf_dir), "user_id", k=10,
                        capacity=2048)


@_q(
    "ipv6_render",
    """
    WITH base AS (
      SELECT event_id, (event_id * 2654435761) % 4294967296 AS n
      FROM events WHERE event_id < 2000),
    g AS (
      SELECT event_id, n,
             ((n % 256) * 256 + ((n // 256) % 256))                    AS g1,
             (((n // 65536) % 256) * 256 + ((n // 16777216) % 256))    AS g2
      FROM base)
    SELECT event_id, CAST(n AS BIGINT) AS n,
           CASE WHEN g1 = 0 AND g2 = 0 THEN '::'
                WHEN g2 = 0 THEN format('{:x}', g1) || '::'
                WHEN g1 = 0 THEN '0:' || format('{:x}', g2) || '::'
                ELSE format('{:x}', g1) || ':' || format('{:x}', g2) || '::'
           END AS v6
    FROM g ORDER BY event_id
    """,
    doc="P9/P13 — RFC-5952 IPv6 render with a cross-engine oracle: both "
        "engines derive the same u32 per row; Spark lays it out as the "
        "reference's FixedString(16) demo layout (little-endian u32, "
        "zero-padded — README.md:192-215, e.g. 3232235777 → '101:a8c0::') "
        "and renders via the pandas-UDF kernel; DuckDB computes the "
        "expected compressed string arithmetically — an independent "
        "derivation, so ::-compression rules are genuinely cross-checked.",
)
def ipv6_render(spark, sf_dir):
    from ..functions.ip import ipv6_num_to_string, reinterpret_u32_as_bytes16
    n = (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_id") < 2000)
        .select("event_id", n.cast("long").alias("n"))
        .withColumn("v6", ipv6_num_to_string(
            reinterpret_u32_as_bytes16(F.col("n"))))
        .orderBy("event_id")
    )


@_q(
    "asof_enrichment",
    """
    WITH dim AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             round(max(value), 4) AS dim_rate
      FROM events WHERE event_id % 97 = 0 GROUP BY user_id, t),
    ev AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events WHERE user_id < 30)
    SELECT ev.event_id, ev.user_id, ev.t, dim.dim_rate
    FROM ev ASOF LEFT JOIN dim
      ON ev.user_id = dim.user_id AND ev.t >= dim.t
    ORDER BY ev.event_id
    """,
    doc="As-of (point-in-time) join — slowly-changing-dimension enrichment "
        "(the temporal form of README.md:44-51's processor). Spark has no "
        "ASOF builtin: implemented as union + last(ignorenulls) window "
        "(operators/temporal.py — one shuffle on the key, O(1) look-back "
        "state). Oracle is DuckDB's NATIVE ASOF LEFT JOIN — an independent "
        "implementation, not a transliteration.",
)
def asof_enrichment(spark, sf_dir):
    from ..operators.temporal import asof_join
    e = _events(spark, sf_dir)
    t = F.unix_timestamp("ts").cast("long")
    dim = (e.filter(F.col("event_id") % 97 == 0)
           .groupBy("user_id", t.alias("t"))
           .agg(F.round(F.max("value"), 4).alias("dim_rate")))
    ev = (e.filter(F.col("user_id") < 30)
          .select("event_id", "user_id", t.alias("t")))
    return (asof_join(ev, dim, "user_id", payload=["dim_rate"])
            .select("event_id", "user_id", "t", "dim_rate")
            .orderBy("event_id"))


@_q(
    "user_sessions",
    """
    WITH ordered AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             event_id
      FROM events WHERE user_id < 50),
    flagged AS (
      SELECT user_id, t, event_id,
             CASE WHEN t - lag(t) OVER w > 1800
                       OR lag(t) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    sessions AS (
      SELECT user_id, t,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(max(t) - min(t) AS BIGINT) AS duration_s
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="W8 — sessionization (30-min inactivity gap) as lag + running sum "
        "of session starts, identical in both dialects so boundaries "
        "hash-match exactly (Spark's native session_window has the same "
        "semantics but no cross-engine oracle). Scale: one shuffle on "
        "user_id serves the lag window, the cumulative sum, and the final "
        "group-by — Catalyst reuses the exchange; state per task is one "
        "row of look-back, not the session contents.",
)
def user_sessions(spark, sf_dir):
    t = F.unix_timestamp("ts").alias("t")
    ordered = (_events(spark, sf_dir)
               .filter(F.col("user_id") < 50)
               .select("user_id", t, "event_id"))
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    flagged = ordered.withColumn(
        "new_session",
        F.when(F.col("t") - F.lag("t").over(w) > 1800, 1)
         .when(F.lag("t").over(w).isNull(), 1)
         .otherwise(0))
    wc = (W.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(W.unboundedPreceding, 0))
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wc).cast("long"))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"),
             (F.max("t") - F.min("t")).cast("long").alias("duration_s"))
        .orderBy("user_id", "session_id")
    )


@_q(
    "approx_percentiles",
    """
    SELECT event_type,
           round(quantile_disc(value, 0.5), 4)  AS p50,
           round(quantile_disc(value, 0.95), 4) AS p95,
           round(quantile_disc(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="W7 sketch path — percentile_approx (Greenwald-Khanna mergeable "
        "sketch): fixed-size per-partition state, one narrow shuffle "
        "regardless of row count; the 100 TB substitute for exact quantiles "
        "(value_percentiles). The sketch always returns an ACTUAL data "
        "element; with accuracy ≥ per-group row count the rank error is "
        "< 1, so at oracle SF (≤1e6 rows/group) the result is exactly the "
        "discrete quantile DuckDB's quantile_disc picks — a deterministic "
        "hash-checkable oracle. At larger accuracy<N scales the same plan "
        "degrades gracefully to ±N/accuracy rank error (pytest bound).",
)
def approx_percentiles(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 1_000_000)
             .alias("p"))
        .select("event_type",
                F.round(F.col("p")[0], 4).alias("p50"),
                F.round(F.col("p")[1], 4).alias("p95"),
                F.round(F.col("p")[2], 4).alias("p99"))
        .orderBy("event_type")
    )


@_q(
    "traffic_cube",
    """
    SELECT event_type, CAST(user_id % 4 AS BIGINT) AS cohort,
           round(sum(value), 4) AS sum_value, count(*) AS n
    FROM events
    GROUP BY CUBE(event_type, cohort)
    ORDER BY event_type NULLS FIRST, cohort NULLS FIRST
    """,
    doc="Grouping sets / CUBE — multi-level rollup reporting in one pass "
        "(Spark expands to a single shuffle with grouping-id).",
)
def traffic_cube(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn(
        "cohort", (F.col("user_id") % 4).cast("long"))
    return (
        e.cube("event_type", "cohort")
        .agg(F.round(F.sum("value"), 4).alias("sum_value"),
             F.count("*").alias("n"))
        .orderBy(F.asc_nulls_first("event_type"),
                 F.asc_nulls_first("cohort"))
    )


# ---------------------------------------------------------------------------
# Derived-flows parity: map `events` onto the flow schema IN BOTH DIALECTS,
# then run the exact dashboard aggregates (integer sums — no float rounding).
# ---------------------------------------------------------------------------

_DERIVED_FLOWS_SQL = """
      SELECT ts                                   AS TimeReceived,
             CAST(floor(value * 100) AS BIGINT)   AS Bytes,
             CASE CAST(user_id % 3 AS INTEGER) WHEN 0 THEN 1
                  WHEN 1 THEN 100 ELSE 1000 END   AS SamplingRate,
             CAST(65000 + user_id % 3 AS INTEGER) AS SrcAS,
             CAST(65000 + event_id % 3 AS INTEGER) AS DstAS,
             CAST(event_id % 65536 AS INTEGER)    AS SrcPort
      FROM events
"""


def _derived_flows(spark, sf_dir):
    e = _events(spark, sf_dir)
    sampling = (
        F.when(F.col("user_id") % 3 == 0, 1)
        .when(F.col("user_id") % 3 == 1, 100)
        .otherwise(1000)
    )
    return e.select(
        F.col("ts").alias("TimeReceived"),
        F.floor(F.col("value") * 100).cast("long").alias("Bytes"),
        sampling.alias("SamplingRate"),
        (65000 + F.col("user_id") % 3).cast("int").alias("SrcAS"),
        (65000 + F.col("event_id") % 3).cast("int").alias("DstAS"),
        (F.col("event_id") % 65536).cast("int").alias("SrcPort"),
    )


@_q(
    "flows_instant_traffic",
    f"""
    SELECT CAST(floor(epoch(date_trunc('minute', TimeReceived))) AS BIGINT) * 1000 AS t,
           CAST(sum(Bytes * SamplingRate) AS BIGINT) AS sumbytes
    FROM ({_DERIVED_FLOWS_SQL}) flows
    GROUP BY t ORDER BY t
    """,
    doc="A1/A6/O1 — the exact 'Instant traffic' panel (viz-ch.json:74): "
        "toUInt64(toStartOfMinute(ts))*1000 + sum(Bytes*SamplingRate), on "
        "flow-shaped rows derived from events identically in both engines. "
        "Integer arithmetic end-to-end: exact hash parity.",
)
def flows_instant_traffic(spark, sf_dir):
    from .flow_queries import instant_traffic
    return instant_traffic(_derived_flows(spark, sf_dir))


@_q(
    "flows_top_ports",
    f"""
    SELECT SrcPort AS port, CAST(sum(Bytes * SamplingRate) AS BIGINT) AS sumbytes
    FROM ({_DERIVED_FLOWS_SQL}) flows
    GROUP BY port ORDER BY sumbytes DESC, port ASC LIMIT 10
    """,
    doc="A5/O2 — 'Top source ports' panel (viz-ch.json:358).",
)
def flows_top_ports(spark, sf_dir):
    from .flow_queries import top_src_ports
    return top_src_ports(_derived_flows(spark, sf_dir), k=10)


@_q(
    "flows_as_matrix",
    f"""
    SELECT SrcAS, DstAS, CAST(sum(Bytes * SamplingRate) AS BIGINT) AS sumbytes, count(*) AS n
    FROM ({_DERIVED_FLOWS_SQL}) flows
    GROUP BY SrcAS, DstAS ORDER BY SrcAS, DstAS
    """,
    doc="A4 — per-(SrcAS,DstAS) traffic matrix (README.md:174-183).",
)
def flows_as_matrix(spark, sf_dir):
    f = _derived_flows(spark, sf_dir)
    return (
        f.groupBy("SrcAS", "DstAS")
        .agg(F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("sumbytes"),
             F.count("*").alias("n"))
        .orderBy("SrcAS", "DstAS")
    )


@_q(
    "flows_rollup_5m",
    f"""
    SELECT CAST(TimeReceived AS DATE) AS Date,
           make_timestamp(((CAST(floor(epoch(TimeReceived)) AS BIGINT) // 300) * 300) * 1000000) AS Timeslot,
           SrcAS, DstAS,
           CAST(sum(Bytes) AS BIGINT) AS Bytes, count(*) AS Count
    FROM ({_DERIVED_FLOWS_SQL}) flows
    GROUP BY Date, Timeslot, SrcAS, DstAS
    ORDER BY Date, Timeslot, SrcAS, DstAS
    """,
    doc="A4/A7/W4 — the flows_5m rollup group key (create.sh:92-110) on "
        "derived flows; stored-rollup variant exercised in "
        "tests/test_flow_pipeline.py (SummingMergeTree invariant).",
)
def flows_rollup_5m(spark, sf_dir):
    from ..functions.timeutil import to_start_of_five_minute
    f = _derived_flows(spark, sf_dir)
    return (
        f.groupBy(
            F.to_date("TimeReceived").alias("Date"),
            to_start_of_five_minute(F.col("TimeReceived")).alias("Timeslot"),
            "SrcAS", "DstAS")
        .agg(F.sum("Bytes").alias("Bytes"), F.count("*").alias("Count"))
        .orderBy("Date", "Timeslot", "SrcAS", "DstAS")
    )


@_q(
    "flows_pg_port_panel",
    f"""
    SELECT SrcPort AS src_port, count(*) AS n,
           CAST(sum(Bytes) AS BIGINT) AS sumbytes
    FROM ({_DERIVED_FLOWS_SQL}) flows
    GROUP BY src_port ORDER BY src_port
    """,
    doc="A3/A5 — the Postgres dashboard panels (viz.json:206,311,416,521): "
        "SELECT key, count(*), sum(bytes) GROUP BY key — raw bytes, no "
        "sampling multiplier, no limit (Grafana sorts client-side; we order "
        "by key for determinism). Scale: partial count+sum map-side, one "
        "shuffle of (port -> 2 longs).",
)
def flows_pg_port_panel(spark, sf_dir):
    f = _derived_flows(spark, sf_dir)
    return (
        f.groupBy(F.col("SrcPort").alias("src_port"))
        .agg(F.count("*").alias("n"), F.sum("Bytes").alias("sumbytes"))
        .orderBy("src_port")
    )


_PG_IP_CASE_V6 = """CASE WHEN g1 = 0 AND g2 = 0 THEN '::'
                       WHEN g2 = 0 THEN format('{:x}', g1) || '::'
                       WHEN g1 = 0 THEN '0:' || format('{:x}', g2) || '::'
                       ELSE format('{:x}', g1) || ':' ||
                            format('{:x}', g2) || '::'
                  END"""

_PG_IP_QUAD_BE = """
               CAST((n // 16777216) % 256 AS VARCHAR) || '.' ||
               CAST((n // 65536) % 256 AS VARCHAR) || '.' ||
               CAST((n // 256) % 256 AS VARCHAR) || '.' ||
               CAST(n % 256 AS VARCHAR)"""


@_q(
    "flows_pg_src_ip_panel",
    f"""
    WITH base AS (
      SELECT (event_id * 2654435761) % 4294967296 AS n,
             CAST(event_id % 3 AS INTEGER) AS layout,
             CAST(floor(value * 100) AS BIGINT) AS bytes
      FROM events),
    g AS (
      SELECT *,
             ((n % 256) * 256 + ((n // 256) % 256))                 AS g1,
             (((n // 65536) % 256) * 256 + ((n // 16777216) % 256)) AS g2
      FROM base),
    r AS (
      SELECT CASE
               WHEN layout = 2 THEN '0.0.0.0'
               WHEN layout = 0 THEN {_PG_IP_QUAD_BE}
               ELSE {_PG_IP_CASE_V6}
             END AS src_ip,
             bytes
      FROM g)
    SELECT src_ip, count(*) AS n, CAST(sum(bytes) AS BIGINT) AS sumbytes
    FROM r GROUP BY src_ip ORDER BY src_ip
    """,
    doc="P10/A3/A5 — the Postgres dashboard 'Top source IPs' panel "
        "(viz.json:206: SELECT src_ip, count(*), sum(bytes) GROUP BY "
        "src_ip) where src_ip is the GO-rendered string the inserter "
        "stored (net.IP.String(), nil→'0.0.0.0'; inserter.go:131-140). "
        "Three layouts exercised: IPv4-mapped 16-byte (Go To4() dotted "
        "quad), plain 16-byte (RFC-5952 v6), and nil (the '0.0.0.0' "
        "substitute). Spark renders AFTER aggregating on raw bytes "
        "(pandas-UDF input = |distinct addrs|, not |rows|); DuckDB "
        "re-derives every render arithmetically — independent derivation "
        "cross-checks the Go semantics.",
)
def flows_pg_src_ip_panel(spark, sf_dir):
    from ..functions.ip import (
        go_ip_to_string,
        reinterpret_u32_as_bytes16,
        u32_to_v4mapped_bytes16,
    )
    e = _events(spark, sf_dir)
    n = ((F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)).cast("long")
    layout = (F.col("event_id") % 3).cast("int")
    addr = (
        F.when(layout == 2, F.lit(None).cast("binary"))
        .when(layout == 0, u32_to_v4mapped_bytes16(n))
        .otherwise(reinterpret_u32_as_bytes16(n))
    )
    flows = e.select(addr.alias("SrcAddr"),
                     F.floor(F.col("value") * 100).cast("long").alias("Bytes"))
    pre = (flows.groupBy("SrcAddr")
           .agg(F.count("*").alias("_n"), F.sum("Bytes").alias("_sb")))
    return (
        pre.groupBy(go_ip_to_string(F.col("SrcAddr")).alias("src_ip"))
        .agg(F.sum("_n").alias("n"), F.sum("_sb").alias("sumbytes"))
        .orderBy("src_ip")
    )


@_q(
    "flows_pg_dst_ip_panel",
    f"""
    WITH base AS (
      SELECT ((event_id + 7919) * 2654435761) % 4294967296 AS n,
             CAST(user_id % 3 AS INTEGER) AS layout,
             CAST(floor(value * 100) AS BIGINT) AS bytes
      FROM events),
    g AS (
      SELECT *,
             ((n % 256) * 256 + ((n // 256) % 256))                 AS g1,
             (((n // 65536) % 256) * 256 + ((n // 16777216) % 256)) AS g2
      FROM base),
    r AS (
      SELECT CASE
               WHEN layout = 0 THEN '0.0.0.0'
               WHEN layout = 1 THEN {_PG_IP_QUAD_BE}
               ELSE {_PG_IP_CASE_V6}
             END AS dst_ip,
             bytes
      FROM g)
    SELECT dst_ip, count(*) AS n, CAST(sum(bytes) AS BIGINT) AS sumbytes
    FROM r GROUP BY dst_ip ORDER BY dst_ip
    """,
    doc="P10/A3/A5 — the Postgres dashboard 'Top destination IPs' panel "
        "(viz.json:416), dst twin of flows_pg_src_ip_panel with a distinct "
        "address derivation and a different layout mix (keyed on user_id) "
        "so the two panels cover different render-path distributions.",
)
def flows_pg_dst_ip_panel(spark, sf_dir):
    from ..functions.ip import (
        go_ip_to_string,
        reinterpret_u32_as_bytes16,
        u32_to_v4mapped_bytes16,
    )
    e = _events(spark, sf_dir)
    n = (((F.col("event_id") + 7919) * F.lit(2654435761))
         % F.lit(4294967296)).cast("long")
    layout = (F.col("user_id") % 3).cast("int")
    addr = (
        F.when(layout == 0, F.lit(None).cast("binary"))
        .when(layout == 1, u32_to_v4mapped_bytes16(n))
        .otherwise(reinterpret_u32_as_bytes16(n))
    )
    flows = e.select(addr.alias("DstAddr"),
                     F.floor(F.col("value") * 100).cast("long").alias("Bytes"))
    pre = (flows.groupBy("DstAddr")
           .agg(F.count("*").alias("_n"), F.sum("Bytes").alias("_sb")))
    return (
        pre.groupBy(go_ip_to_string(F.col("DstAddr")).alias("dst_ip"))
        .agg(F.sum("_n").alias("n"), F.sum("_sb").alias("sumbytes"))
        .orderBy("dst_ip")
    )


@_q(
    "flows_top_src_ips",
    """
    WITH base AS (
      SELECT (event_id * 2654435761) % 4294967296 AS n,
             event_id % 2 = 0 AS is_v4,
             CAST(floor(value * 100) AS BIGINT) AS bytes,
             CASE CAST(user_id % 3 AS INTEGER) WHEN 0 THEN 1
                  WHEN 1 THEN 100 ELSE 1000 END AS sampling
      FROM events),
    g AS (
      SELECT *,
             ((n % 256) * 256 + ((n // 256) % 256))                 AS g1,
             (((n // 65536) % 256) * 256 + ((n // 16777216) % 256)) AS g2
      FROM base),
    r AS (
      SELECT CASE WHEN is_v4 THEN
               CAST(n % 256 AS VARCHAR) || '.' ||
               CAST((n // 256) % 256 AS VARCHAR) || '.' ||
               CAST((n // 65536) % 256 AS VARCHAR) || '.' ||
               CAST((n // 16777216) % 256 AS VARCHAR)
             ELSE CASE WHEN g1 = 0 AND g2 = 0 THEN '::'
                       WHEN g2 = 0 THEN format('{:x}', g1) || '::'
                       WHEN g1 = 0 THEN '0:' || format('{:x}', g2) || '::'
                       ELSE format('{:x}', g1) || ':' ||
                            format('{:x}', g2) || '::'
                  END
             END AS srcip,
             bytes * sampling AS sb
      FROM g)
    SELECT srcip, CAST(sum(sb) AS BIGINT) AS sumbytes
    FROM r GROUP BY srcip
    ORDER BY sumbytes DESC, srcip LIMIT 20
    """,
    doc="P8/P9/A5/O2 — 'Top source IPs' (viz-ch.json:233): dual IPv4/IPv6 "
        "render + traffic top-k, on flows derived from events identically "
        "in both engines. Spark stores each u32 in the reference's "
        "FixedString(16) layout (little-endian first-4-bytes, README.md:"
        "192-215) and runs the production top_src_ips plan (conv/hex "
        "big-endian decode for the v4 arm, RFC-5952 pandas-UDF render for "
        "the v6 arm); DuckDB re-derives both renders arithmetically — an "
        "independent derivation, so layout, byte order, and ::-compression "
        "are all cross-checked. Mocker-sourced variant stays covered in "
        "tests/test_flow_pipeline.py.",
)
def flows_top_src_ips(spark, sf_dir):
    from ..functions.ip import reinterpret_u32_as_bytes16
    from .flow_queries import top_src_ips
    e = _events(spark, sf_dir)
    n = (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)
    sampling = (
        F.when(F.col("user_id") % 3 == 0, 1)
        .when(F.col("user_id") % 3 == 1, 100)
        .otherwise(1000)
    )
    flows = e.select(
        reinterpret_u32_as_bytes16(n.cast("long")).alias("SrcAddr"),
        F.when(F.col("event_id") % 2 == 0, 0x800)
         .otherwise(0x86DD).cast("int").alias("Etype"),
        F.floor(F.col("value") * 100).cast("long").alias("Bytes"),
        sampling.cast("long").alias("SamplingRate"),
    )
    return top_src_ips(flows, k=20)


@_q(
    "flows_top_dst_ips",
    """
    WITH base AS (
      SELECT ((event_id + 7919) * 2654435761) % 4294967296 AS n,
             user_id % 2 = 0 AS is_v4,
             CAST(floor(value * 100) AS BIGINT) AS bytes,
             CASE CAST(user_id % 3 AS INTEGER) WHEN 0 THEN 1
                  WHEN 1 THEN 100 ELSE 1000 END AS sampling
      FROM events),
    g AS (
      SELECT *,
             ((n % 256) * 256 + ((n // 256) % 256))                 AS g1,
             (((n // 65536) % 256) * 256 + ((n // 16777216) % 256)) AS g2
      FROM base),
    r AS (
      SELECT CASE WHEN is_v4 THEN
               CAST(n % 256 AS VARCHAR) || '.' ||
               CAST((n // 256) % 256 AS VARCHAR) || '.' ||
               CAST((n // 65536) % 256 AS VARCHAR) || '.' ||
               CAST((n // 16777216) % 256 AS VARCHAR)
             ELSE CASE WHEN g1 = 0 AND g2 = 0 THEN '::'
                       WHEN g2 = 0 THEN format('{:x}', g1) || '::'
                       WHEN g1 = 0 THEN '0:' || format('{:x}', g2) || '::'
                       ELSE format('{:x}', g1) || ':' ||
                            format('{:x}', g2) || '::'
                  END
             END AS dstip,
             bytes * sampling AS sb
      FROM g)
    SELECT dstip, CAST(sum(sb) AS BIGINT) AS sumbytes
    FROM r GROUP BY dstip
    ORDER BY sumbytes DESC, dstip LIMIT 20
    """,
    doc="P8/P9/A5/O2 — 'Top destination IPs' (viz-ch.json:479): the DstAddr "
        "twin of flows_top_src_ips, distinct address derivation and "
        "EType split so the two panels exercise different v4/v6 mixes.",
)
def flows_top_dst_ips(spark, sf_dir):
    from ..functions.ip import reinterpret_u32_as_bytes16
    from .flow_queries import top_dst_ips
    e = _events(spark, sf_dir)
    n = ((F.col("event_id") + 7919) * F.lit(2654435761)) % F.lit(4294967296)
    sampling = (
        F.when(F.col("user_id") % 3 == 0, 1)
        .when(F.col("user_id") % 3 == 1, 100)
        .otherwise(1000)
    )
    flows = e.select(
        reinterpret_u32_as_bytes16(n.cast("long")).alias("DstAddr"),
        F.when(F.col("user_id") % 2 == 0, 0x800)
         .otherwise(0x86DD).cast("int").alias("Etype"),
        F.floor(F.col("value") * 100).cast("long").alias("Bytes"),
        sampling.cast("long").alias("SamplingRate"),
    )
    return top_dst_ips(flows, k=20)


@_q(
    "flows_top_dst_ports",
    f"""
    SELECT CAST((SrcPort + 13) % 65536 AS INTEGER) AS port,
           CAST(sum(Bytes * SamplingRate) AS BIGINT) AS sumbytes
    FROM ({_DERIVED_FLOWS_SQL}) flows
    GROUP BY port ORDER BY sumbytes DESC, port ASC LIMIT 10
    """,
    doc="A5/O2 — 'Top destination ports' panel (viz-ch.json:604).",
)
def flows_top_dst_ports(spark, sf_dir):
    from .flow_queries import top_dst_ports
    f = _derived_flows(spark, sf_dir).withColumn(
        "DstPort", ((F.col("SrcPort") + 13) % 65536).cast("int"))
    return top_dst_ports(f, k=10)


@_q(
    "flows_rollup_nested",
    f"""
    WITH flows AS (
      SELECT CAST(TimeReceived AS DATE) AS Date,
             make_timestamp(((CAST(floor(epoch(TimeReceived)) AS BIGINT)
                              // 300) * 300) * 1000000) AS Timeslot,
             SrcAS, DstAS,
             CASE WHEN SrcPort % 2 = 0 THEN 2048 ELSE 34525 END AS EType,
             Bytes,
             CAST(SrcPort % 7 + 1 AS BIGINT) AS Packets
      FROM ({_DERIVED_FLOWS_SQL}) f),
    per AS (
      SELECT Date, Timeslot, SrcAS, DstAS, EType,
             CAST(sum(Bytes) AS BIGINT)   AS Bytes,
             CAST(sum(Packets) AS BIGINT) AS Packets,
             count(*)                     AS Count
      FROM flows GROUP BY Date, Timeslot, SrcAS, DstAS, EType)
    SELECT Date, Timeslot, SrcAS, DstAS,
           to_json(list_sort(list(struct_pack(
             EType := EType, Bytes := Bytes,
             Packets := Packets, Count := Count)))) AS ETypeMap,
           CAST(sum(Bytes) AS BIGINT)   AS Bytes,
           CAST(sum(Packets) AS BIGINT) AS Packets,
           CAST(sum(Count) AS BIGINT)   AS Count
    FROM per GROUP BY Date, Timeslot, SrcAS, DstAS
    ORDER BY Date, Timeslot, SrcAS, DstAS
    """,
    doc="A8 — the ETypeMap Nested parallel-array reconstruction "
        "(create.sh:78-83,100-103) as sorted array<struct<EType,Bytes,"
        "Packets,Count>> via the production build_rollup_5m operator, on "
        "events-derived flows. The nested column is serialized with "
        "to_json in BOTH engines so the driver's value-hash compares the "
        "full per-EType sub-aggregation (struct field order and list sort "
        "are lexicographic in both). Mocker-sourced invariant "
        "(rollup ≡ re-agg of raw) stays in tests/test_flow_pipeline.py.",
)
def flows_rollup_nested(spark, sf_dir):
    from ..operators.rollup import ROLLUP_KEY, build_rollup_5m
    f = _derived_flows(spark, sf_dir).select(
        F.to_date("TimeReceived").alias("Date"),
        "TimeReceived", "SrcAS", "DstAS",
        F.when(F.col("SrcPort") % 2 == 0, 2048)
         .otherwise(34525).cast("int").alias("Etype"),
        "Bytes",
        (F.col("SrcPort") % 7 + 1).cast("long").alias("Packets"),
    )
    return (build_rollup_5m(f)
            .withColumn("ETypeMap", F.to_json("ETypeMap"))
            .orderBy(*ROLLUP_KEY))


@_q(
    "customers_no_orders",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey LIMIT 50
    """,
    doc="Anti join (TPC-H Q22 shape) — NOT EXISTS as left_anti: the probe "
        "side streams through a hash join that emits only non-matching "
        "rows, never materializing matches. Scale: orders side reduces to "
        "distinct custkeys before the join (Catalyst pushes the distinct "
        "into the join build); no row multiplication, one shuffle.",
)
def customers_no_orders(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
        .limit(50)
    )


@_q(
    "nations_with_big_orders",
    """
    SELECT n.n_nationkey, n.n_name
    FROM nation n
    WHERE EXISTS (
      SELECT 1 FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey AND o.o_totalprice > 300000)
    ORDER BY n.n_nationkey
    """,
    doc="Semi join — EXISTS as left_semi: emits each nation at most once, "
        "no duplicate-row blowup from the many-orders side. Scale: the "
        "filtered orders⋈customer side shrinks first (predicate pushdown), "
        "then the 25-row nation side broadcasts.",
)
def nations_with_big_orders(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000)
    big_nations = o.join(c, o.o_custkey == c.c_custkey).select("c_nationkey")
    return (
        n.join(big_nations, n.n_nationkey == big_nations.c_nationkey,
               "left_semi")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@_q(
    "flows_routed_traffic",
    f"""
    WITH flows AS (
      SELECT TimeReceived, SrcAS, Bytes,
             CAST(SrcPort % 7 + 1 AS BIGINT) AS Packets
      FROM ({_DERIVED_FLOWS_SQL}) f)
    SELECT make_timestamp(((CAST(floor(epoch(TimeReceived)) AS BIGINT)
                            // 600) * 600) * 1000000) AS t,
           SrcAS,
           CAST(sum(Bytes) AS BIGINT)   AS Bytes,
           CAST(sum(Packets) AS BIGINT) AS Packets,
           count(*)                     AS Count
    FROM flows GROUP BY t, SrcAS ORDER BY t, SrcAS
    """,
    doc="§4 pre-aggregation routing, oracled end-to-end: the Spark side "
        "builds the stored flows_5m rollup (partial sums) from derived "
        "flows and answers a 10-minute/SrcAS traffic query FROM THE "
        "ROLLUP via route_traffic_query; DuckDB aggregates the raw rows "
        "directly. Hash-equality proves the SummingMergeTree-style "
        "rollup tier is lossless for every eligible dashboard query — "
        "the property that lets 100 TB dashboards run at ~1e-4 of raw "
        "cost (integer sums, so bit-exact).",
)
def flows_routed_traffic(spark, sf_dir):
    from ..operators.rollup import route_traffic_query, rollup_flat
    f = _derived_flows(spark, sf_dir).select(
        F.to_date("TimeReceived").alias("Date"),
        "TimeReceived", "SrcAS", "DstAS",
        F.when(F.col("SrcPort") % 2 == 0, 2048)
         .otherwise(34525).cast("int").alias("Etype"),
        "Bytes",
        (F.col("SrcPort") % 7 + 1).cast("long").alias("Packets"),
    )
    rollup = rollup_flat(f)
    return (route_traffic_query(f, rollup, ["SrcAS"], interval_s=600)
            .orderBy("t", "SrcAS"))


@_q(
    "late_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape — EXISTS as a left_semi join feeding an aggregate: "
        "orders with at least one line shipped >60 days after order date, "
        "counted by priority. The correlated predicate becomes a join "
        "condition (l_shipdate > o_orderdate + 60d) on the semi join; the "
        "date window prunes orders at the scan; no row multiplication "
        "from multi-line orders.",
)
def late_order_priority(spark, sf_dir):
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                 & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))))
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    cond = ((o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > F.date_add(o.o_orderdate, 60)))
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_q(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY nation ORDER BY revenue DESC, nation ASC
    """,
    doc="J1 (deepest topology) — TPC-H Q5 shape: 6-table join with the "
        "customer-and-supplier-same-nation condition. Scale: region filter "
        "prunes nation (broadcast) which prunes supplier (broadcast, "
        "~|suppliers|/|nations| rows); lineitem⋈orders⋈customer shuffle "
        "on orderkey/custkey; the co-nation equality rides the supplier "
        "broadcast join as a residual condition — no extra shuffle.",
)
def local_supplier_volume(spark, sf_dir):
    l = _li(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE"))
    dim = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .select("s_suppkey", "s_nationkey", "n_name"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(dim),
              (l.l_suppkey == dim.s_suppkey)
              & (c.c_nationkey == dim.s_nationkey))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


@_q(
    "event_type_pivot",
    """
    SELECT CAST(user_id % 8 AS BIGINT) AS cohort,
           round(sum(CASE WHEN event_type = 'click' THEN value END), 4)    AS click,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
           round(sum(CASE WHEN event_type = 'view' THEN value END), 4)     AS view
    FROM events GROUP BY cohort ORDER BY cohort
    """,
    doc="Pivot — groupBy().pivot(values).sum(): long→wide reshape in one "
        "pass (per-protocol / per-EType traffic columns). Pinning the "
        "pivot values keeps it a single-pass plan; unpinned, Spark first "
        "runs a distinct scan to discover columns. Same shuffle shape as "
        "any multi-aggregate group-by.",
)
def event_type_pivot(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn(
        "cohort", (F.col("user_id") % 8).cast("long"))
    return (
        e.groupBy("cohort")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.round(F.sum("value"), 4))
        .orderBy("cohort")
    )


@_q(
    "tpch_q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Scalar (ungrouped) aggregation — TPC-H Q6: every predicate pushes "
        "to the parquet scan, partials combine map-side, and the 'shuffle' "
        "is one row per task to a single reducer. The cheapest query shape "
        "there is at any scale.",
)
def tpch_q6(spark, sf_dir):
    l = _li(spark, sf_dir)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                     2).alias("revenue"),
             F.count("*").alias("n"))
    )


@_q(
    "priority_linecount",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Conditional aggregation — TPC-H Q12 shape on this warehouse's "
        "columns: sum(CASE WHEN ...) pivots a predicate into two counters "
        "in ONE pass (the dashboard idiom for v4-vs-v6 or high-vs-low "
        "traffic splits without two scans). Ship-date filter prunes "
        "lineitem before the orderkey join.",
)
def priority_linecount(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    l = (_li(spark, sf_dir)
         .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date")))
         .select("l_orderkey", "l_returnflag"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


@_q(
    "range_window_sum",
    """
    WITH ev AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id,
             round(value, 4) AS value
      FROM events WHERE user_id < 10)
    SELECT user_id, t, event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 300 PRECEDING AND CURRENT ROW), 4) AS sum_5m
    FROM ev ORDER BY user_id, t, event_id
    """,
    doc="RANGE-framed window — per event, total traffic from the SAME key "
        "in the trailing 5 minutes (event-time frame, unlike the "
        "row-count frames of sliding_rate_5m): burst detection over "
        "irregular event spacing. One shuffle on user_id; frame state is "
        "the 300-second look-back, independent of row density.",
)
def range_window_sum(spark, sf_dir):
    ev = (_events(spark, sf_dir)
          .filter(F.col("user_id") < 10)
          .select("user_id", F.unix_timestamp("ts").alias("t"), "event_id",
                  F.round("value", 4).alias("value")))
    w = (W.partitionBy("user_id").orderBy("t").rangeBetween(-300, 0))
    return (ev.withColumn("sum_5m", F.round(F.sum("value").over(w), 4))
            .select("user_id", "t", "event_id", "sum_5m")
            .orderBy("user_id", "t", "event_id"))


@_q(
    "part_type_revenue",
    """
    SELECT p.p_type,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_type
    ORDER BY revenue DESC, p_type ASC LIMIT 15
    """,
    doc="J1/A1/O2 — fact⋈product-dimension revenue rollup (TPC-H Q-14 "
        "family). Scale: part is a classic broadcast dimension "
        "(|part| ≪ |lineitem|); with it broadcast the lineitem side never "
        "shuffles before aggregation — partials reduce map-side and the "
        "exchange carries one row per p_type.",
)
def part_type_revenue(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("p_type"))
        .limit(15)
    )


@_q(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                       AS avg_qty,
           round(avg(l_extendedprice), 4)                                  AS avg_price,
           round(avg(l_discount), 4)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="A1-A4/P5/P12 — the canonical pricing-summary aggregate (TPC-H Q1 "
        "shape) proving expression-arg aggregation at scale; the flow "
        "equivalent is sum(Bytes*SamplingRate) (viz-ch.json:74).",
)
def tpch_q1(spark, sf_dir):
    l = _li(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Mutable-table semantics (ReplacingMergeTree / CollapsingMergeTree / SCD2)
# and time-series densification (WITH FILL) — operators/cdc.py, profile.py
# ---------------------------------------------------------------------------

@_q(
    "cdc_latest_state",
    """
    WITH feed AS (
      SELECT user_id, ts, event_id, event_type, round(value, 4) AS value,
             (event_id % 11 = 0) AS is_del
      FROM events),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM feed)
    SELECT user_id, ts AS last_ts, event_type AS last_event_type,
           value AS last_value
    FROM r WHERE rn = 1 AND NOT is_del
    ORDER BY user_id
    """,
    doc="ReplacingMergeTree(ver) FINAL / CDC upsert-apply "
        "(operators/cdc.py:latest_state) — the sibling of the reference's "
        "MergeTree/SummingMergeTree engines (create.sh:60,88) for rows "
        "that MUTATE: the event log is read as a per-user upsert feed "
        "(version = (ts, event_id), every 11th op a tombstone) and "
        "compacts to one live row per key; a key whose WINNING row is a "
        "delete disappears — an older live row never resurrects it. "
        "Determinism: the unique event_id pins version ties cross-engine. "
        "Scale: ONE key-partitioned window with a rank-1 limit "
        "(WindowGroupLimit pushes the top-1 into the sort), no join, no "
        "second scan — the shape of a CH background merge.",
)
def cdc_latest_state(spark, sf_dir):
    from ..operators.cdc import latest_state
    feed = (_events(spark, sf_dir)
            .select("user_id", "ts", "event_id", "event_type",
                    F.round("value", 4).alias("value"),
                    (F.col("event_id") % 11 == 0).alias("is_del")))
    live = latest_state(feed, ["user_id"], ["ts", "event_id"],
                        deleted_col="is_del")
    return (live.select("user_id", F.col("ts").alias("last_ts"),
                        F.col("event_type").alias("last_event_type"),
                        F.col("value").alias("last_value"))
            .orderBy("user_id"))


@_q(
    "cdc_collapse_net",
    """
    WITH log AS (
      SELECT user_id, ts, event_id, event_type, round(value, 4) AS value,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM events),
    net AS (
      SELECT user_id, CAST(sum(sign) AS BIGINT) AS net
      FROM log GROUP BY user_id HAVING sum(sign) > 0),
    pos AS (
      SELECT user_id, event_type, value, row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM log WHERE sign > 0)
    SELECT net.user_id, net.net, pos.event_type AS last_event_type,
           pos.value AS last_value
    FROM net JOIN pos ON pos.user_id = net.user_id AND pos.rn = 1
    ORDER BY net.user_id
    """,
    doc="CollapsingMergeTree (operators/cdc.py:collapse_signs) — +1 state "
        "rows cancelled by -1 rows; a key survives iff sum(sign) > 0 "
        "(here the event-parity sign leaves 71 of 150 keys), carrying "
        "the latest +1 row's state. Registered as a demoted variant: the "
        "keyed-compaction class is windowed via cdc_latest_state (same "
        "rank-1 device; collapse adds the sign aggregate already "
        "windowed via flows_routed_traffic's net-sum) — DuckDB-oracled "
        "every pytest run. Scale: net aggregate + rank-1 window share "
        "the key partitioning; cancelled history never joins.",
)
def cdc_collapse_net(spark, sf_dir):
    from ..operators.cdc import collapse_signs
    log = (_events(spark, sf_dir)
           .select("user_id", "ts", "event_id", "event_type",
                   F.round("value", 4).alias("value"),
                   F.when(F.col("event_id") % 2 == 0, 1)
                   .otherwise(-1).alias("sign")))
    out = collapse_signs(log, ["user_id"], "sign", ["ts", "event_id"],
                         ["event_type", "value"])
    return (out.select("user_id", "net",
                       F.col("event_type").alias("last_event_type"),
                       F.col("value").alias("last_value"))
            .orderBy("user_id"))


@_q(
    "scd2_user_history",
    """
    WITH src AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE user_id % 31 = 0),
    chg AS (
      SELECT *, lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM src),
    v AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS version
      FROM chg WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type, CAST(version AS INT) AS version,
           ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY version) AS effective_to,
           (lead(ts) OVER (PARTITION BY user_id
                           ORDER BY version) IS NULL) AS is_current
    FROM v ORDER BY user_id, version
    """,
    doc="SCD Type-2 dimension BUILD (operators/cdc.py:scd2_intervals) — "
        "collapse each key's change log to one row per attribute "
        "VERSION with (effective_from, effective_to, is_current) "
        "validity intervals; the producer of the tables asof_enrichment "
        "consumes at query time (the dim side of J1's point-in-time "
        "join). Registered as a demoted variant: the lag change-detect "
        "device is windowed via user_sessions, the validity lead via "
        "asof_enrichment's interval semantics — DuckDB-oracled every "
        "pytest run. Scale: two windows over ONE key partitioning; rows "
        "shrink at the change filter between them.",
)
def scd2_user_history(spark, sf_dir):
    from ..operators.cdc import scd2_intervals
    src = (_events(spark, sf_dir)
           .filter(F.col("user_id") % 31 == 0)
           .select("user_id", "event_type", "ts", "event_id"))
    out = scd2_intervals(src, ["user_id"], ["event_type"],
                         ["ts", "event_id"], "ts")
    return (out.select("user_id", "event_type",
                       F.col("version").cast("int").alias("version"),
                       "effective_from", "effective_to", "is_current")
            .orderBy("user_id", "version"))


@_q(
    "time_gapfill",
    """
    WITH base AS (
      SELECT event_type, date_trunc('hour', ts) AS t,
             count(*) AS n, round(sum(value), 4) AS sv
      FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(t) AS mn, max(t) AS mx FROM base
          GROUP BY 1),
    grid AS (
      SELECT event_type AS g_type,
             unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS g_t
      FROM b)
    SELECT g_type AS event_type, g_t AS t,
           CAST(coalesce(base.n, 0) AS BIGINT) AS n,
           last_value(base.sv IGNORE NULLS) OVER (
             PARTITION BY g_type ORDER BY g_t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv_locf
    FROM grid LEFT JOIN base
      ON base.event_type = g_type AND base.t = g_t
    ORDER BY event_type, t
    """,
    doc="Time-series gap fill — ClickHouse ORDER BY .. WITH FILL STEP / "
        "INTERPOLATE (the dashboard densification Grafana needs for "
        "continuous lines; P15's sequence generation, now as a QUERY "
        "operator): every missing hourly bucket between each series' "
        "own bounds materializes, counters zero-fill, the gauge carries "
        "last-observation-forward (operators/profile.py:gapfill_series). "
        "~5%% of the sf0.01 grid rows are fills. Determinism: sv rounds "
        "to 4dp BEFORE the carry, so LOCF copies identical bits. Scale: "
        "the grid generates per-key from a key-bounded aggregate "
        "(sequence+explode, rows = dashboard range, never data-sized); "
        "fill join and LOCF window reuse the aggregate's key "
        "partitioning — no new corpus-wide shuffle.",
)
def time_gapfill(spark, sf_dir):
    from ..operators.profile import gapfill_series
    base = (_events(spark, sf_dir)
            .groupBy("event_type", F.date_trunc("hour", "ts").alias("t"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sv")))
    filled = gapfill_series(base, ["event_type"], "t", "interval 1 hour",
                            {"n": "zero", "sv": "locf"})
    return (filled.select("event_type", "t",
                          F.col("n").cast("long").alias("n"),
                          F.col("sv").alias("sv_locf"))
            .orderBy("event_type", "t"))


# ---------------------------------------------------------------------------
# Z-order (Morton) multi-dimensional layout — operators/scale.py
# ---------------------------------------------------------------------------

from ..operators.scale import zorder_key_sql as _zsql  # noqa: E402

_Z_SU = "(least(user_id, 4095) * 255) // 4095"
_Z_SM = ("(((day(ts)-1)*1440 + hour(ts)*60 + minute(ts)) * 255) // 44639")

@_q(
    "zorder_bucket_stats",
    f"""
    WITH z AS (
      SELECT user_id,
             (day(ts)-1)*1440 + hour(ts)*60 + minute(ts) AS m,
             {_zsql([_Z_SU, _Z_SM], 8)} AS zkey
      FROM events)
    SELECT CAST(zkey >> 8 AS BIGINT) AS z_bucket,
           count(*) AS n,
           CAST(min(user_id) AS BIGINT) AS u_min,
           CAST(max(user_id) AS BIGINT) AS u_max,
           CAST(min(m) AS BIGINT) AS m_min,
           CAST(max(m) AS BIGINT) AS m_max
    FROM z GROUP BY z_bucket ORDER BY z_bucket
    """,
    doc="Z-order (Morton) layout key — the multi-dimensional form of the "
        "O3 clustering tier (Delta OPTIMIZE ZORDER BY; the device that "
        "makes parquet min/max stats prune predicates on EVERY "
        "interleaved dimension, not just the leading sort column): "
        "user and minute-of-month scale to 8 bits by exact integer "
        "division and bit-interleave into a 16-bit Morton key, entirely "
        "codegen'd bitwise expressions (operators/scale.py:zorder_key; "
        "the oracle unrolls the SAME 32 terms via zorder_key_sql). The "
        "per-bucket min/max spans in the output ARE the locality "
        "evidence: each top-8-bit bucket covers a compact (user x time) "
        "hyper-rectangle. Registered as a demoted variant — the layout "
        "tier's windowed face is the compaction/pruning pair "
        "(partitioned_day_scan, flows_routed_traffic); file-skipping is "
        "pinned by test_zorder_layout_prunes_row_groups. Scale: one "
        "per-row projection + a 256-row aggregate; zorder_repartition "
        "is the write-side operator (one range shuffle at OPTIMIZE "
        "time buys pruning on every later read).",
)
def zorder_bucket_stats(spark, sf_dir):
    from ..operators.scale import zorder_key, zscale
    e = _events(spark, sf_dir)
    m = ((F.dayofmonth("ts") - 1) * 1440 + F.hour("ts") * 60
         + F.minute("ts"))
    su = zscale(F.least(F.col("user_id"), F.lit(4095)), 0, 4095, 8)
    sm = zscale(m, 0, 44639, 8)
    z = zorder_key([su, sm], 8)
    return (e.select(F.col("user_id"), m.alias("m"), z.alias("zkey"))
            .groupBy(F.shiftright("zkey", 8).cast("long").alias("z_bucket"))
            .agg(F.count("*").alias("n"),
                 F.min("user_id").cast("long").alias("u_min"),
                 F.max("user_id").cast("long").alias("u_max"),
                 F.min("m").cast("long").alias("m_min"),
                 F.max("m").cast("long").alias("m_max"))
            .orderBy("z_bucket"))


@_q(
    "uniq_state_rollup",
    None,  # the persisted states are DataSketches HLL blobs — DuckDB
    # has no DataSketches, and the estimator's internals are not
    # SQL-replicable; merge ≡ direct-sketch EXACT equality and the
    # estimate-vs-exact bound are pytest-asserted. The md5-register
    # twin (uniq_register_rollup) carries the windowed oracle for this
    # class.
    doc="AggregatingMergeTree / uniqState+uniqMerge "
        "(operators/rollup.py:uniq_state,uniq_merge) — the distinct-count "
        "sibling of the SummingMergeTree rollup tier: per-(event_type, "
        "hour) HLL sketch STATES (DataSketches, ~2^lgk bytes/key) persist "
        "like any column and RE-AGGREGATE to the per-type distinct-user "
        "panel without touching raw rows — the device that makes "
        "'distinct users last 30 days' a |buckets|-row merge instead of "
        "a raw 100 TB re-scan. Rows-only (no DuckDB DataSketches); "
        "pytest pins merge(per-bucket states) ≡ direct sketch EXACTLY "
        "and the estimate within HLL error of exact distinct; the exact "
        "twin is windowed via distinct_users.",
)
def uniq_state_rollup(spark, sf_dir):
    from ..operators.rollup import uniq_merge, uniq_state
    e = _events(spark, sf_dir)
    states = uniq_state(
        e.withColumn("hour", F.date_trunc("hour", "ts")),
        ["event_type", "hour"], "user_id")
    return (uniq_merge(states, ["event_type"])
            .select("event_type",
                    F.col("approx_distinct").cast("long")
                    .alias("approx_distinct_users"))
            .orderBy("event_type"))


@_q(
    "uniq_register_rollup",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 7))
               ::BIGINT AS h
      FROM events),
    st AS (
      SELECT event_type, hr, h >> 22 AS bucket,
             max(CASE WHEN (h & 4194303) = 0 THEN 23
                      ELSE 23 - length(bin(h & 4194303)) END) AS r
      FROM h GROUP BY 1, 2, 3),
    regs AS (SELECT event_type, bucket, max(r) AS r FROM st GROUP BY 1, 2),
    per AS (
      SELECT event_type, count(*) AS n_regs,
             sum(1::BIGINT << (23 - r)) AS s_present
      FROM regs GROUP BY 1),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
           FROM events GROUP BY 1)
    SELECT per.event_type,
           CAST(n_regs AS BIGINT) AS n_regs,
           CAST(s_present + (64 - n_regs) * 8388608 AS BIGINT) AS s_scaled,
           CAST(floor((0.709 * 3435973836800.0)
                      / (s_present + (64 - n_regs) * 8388608) + 0.5)
                AS BIGINT) AS est_e2,
           CAST(n_exact AS BIGINT) AS n_exact
    FROM per JOIN ex USING (event_type) ORDER BY event_type
    """,
    doc="AggregatingMergeTree / uniqState+uniqMerge, the DETERMINISTIC "
        "register-rows form (operators/rollup.py:uniq_register_state/"
        "uniq_register_merge) — per-(type, hour) HLL register rows "
        "persist like any column (<=64 rows/key: (bucket, max leading-"
        "zero rank) from a 28-bit md5-derived hash) and fold to the "
        "per-type panel by an associative per-bucket max — the device "
        "that answers 'distinct users, any window' from stored states "
        "instead of a raw re-scan; sums get this free (SummingMergeTree "
        "rollup tier), distinct counts need the -State/-Merge pair. "
        "EVERYTHING is exact: registers are a pure function of the "
        "value set (engine/partitioning/merge-order/lifecycle-"
        "independent — pytest pins identical output when the state is "
        "built in two incremental halves), s_scaled an exact int64, the "
        "raw estimate ONE pinned double division HALF-UP at e2 (no "
        "small-range correction branch — no libm ln in the surface; "
        "~13%% envelope at m=64, HLL_P raises it). n_exact rides along: "
        "the A9 exact-distinct answer in the same row (subsumes the "
        "demoted distinct_users). The DataSketches-native twin "
        "(uniq_state/uniq_merge, rows-only uniq_state_rollup) is the "
        "production-accuracy path with a documented path-dependence "
        "caveat. Scale: state build is one partial-aggregated shuffle "
        "of register rows, never raw values; every later rollup touches "
        "|keys|*64 rows.",
)
def uniq_register_rollup(spark, sf_dir):
    from ..operators.rollup import uniq_register_merge, uniq_register_state
    e = _events(spark, sf_dir)
    st = uniq_register_state(
        e.withColumn("hr", F.date_trunc("hour", "ts")),
        ["event_type", "hr"], "user_id")
    m = uniq_register_merge(st, ["event_type"])
    ex = (e.groupBy("event_type")
          .agg(F.countDistinct("user_id").cast("long").alias("n_exact")))
    return (m.join(ex, "event_type")
            .select("event_type", "n_regs", "s_scaled", "est_e2",
                    "n_exact")
            .orderBy("event_type"))


@_q(
    "histogram_state_quantiles",
    """
    WITH v AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
      FROM events),
    st AS (
      SELECT event_type, d,
             CAST(least(greatest((v100 * 100) // 50000, 0), 99) AS INT)
               AS bin,
             count(*) AS cnt
      FROM v GROUP BY 1, 2, 3),
    m AS (SELECT event_type, bin, sum(cnt) AS cnt FROM st GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM m)
    SELECT event_type, CAST(max(total) AS BIGINT) AS total,
           CAST(min(CASE WHEN cum * 10000 >= 5000 * total THEN bin END)
                AS BIGINT) AS p50_bin,
           CAST(min(CASE WHEN cum * 10000 >= 9000 * total THEN bin END)
                AS BIGINT) AS p90_bin,
           CAST(min(CASE WHEN cum * 10000 >= 9900 * total THEN bin END)
                AS BIGINT) AS p99_bin,
           CAST(min(CASE WHEN cum * 10000 >= 5000 * total THEN bin END)
                * 500 AS BIGINT) AS p50_lo,
           CAST(min(CASE WHEN cum * 10000 >= 9000 * total THEN bin END)
                * 500 AS BIGINT) AS p90_lo,
           CAST(min(CASE WHEN cum * 10000 >= 9900 * total THEN bin END)
                * 500 AS BIGINT) AS p99_lo
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    doc="quantileState/quantileMerge (operators/rollup.py:"
        "histogram_state/histogram_merge_quantiles) — the percentile "
        "member of the -State/-Merge family: per-(type, day) fixed-width "
        "bin counts persist as the state (plainly summable rows, <=100/"
        "key), fold per type by a groupBy sum, and any quantile reads "
        "from the merged cumulative histogram at bin-width resolution — "
        "raw rows never re-scan ('p99 of any window' from stored "
        "states). Pure integer arithmetic end to end: the v100 device, "
        "clamped integer-div binning, rank picks by exact cum*1e4 >= "
        "q_e4*total comparison. Registered as a demoted variant: the "
        "percentile class keeps value_percentiles (exact) windowed with "
        "approx_percentiles its sketch twin; the -State/-Merge class is "
        "windowed via uniq_register_rollup. Scale: one partial-"
        "aggregated state shuffle; every later quantile touches "
        "|keys|*n_bins rows.",
)
def histogram_state_quantiles(spark, sf_dir):
    from ..operators.rollup import histogram_merge_quantiles, histogram_state
    v = (_events(spark, sf_dir)
         .select("event_type", F.date_trunc("day", "ts").alias("d"),
                 F.floor(F.col("value") * 100 + F.lit(0.5))
                 .cast("long").alias("v100")))
    st = histogram_state(v, ["event_type", "d"], "v100",
                         lo=0, hi=50000, n_bins=100)
    out = histogram_merge_quantiles(
        st, ["event_type"],
        [("p50", 5000), ("p90", 9000), ("p99", 9900)],
        lo=0, hi=50000, n_bins=100)
    return (out.select("event_type", "total", "p50_bin", "p90_bin",
                       "p99_bin", "p50_lo", "p90_lo", "p99_lo")
            .orderBy("event_type"))


@_q(
    "segment_bitmap_overlap",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click'
                 AND ts < TIMESTAMP '2024-01-02'),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase'
                 AND ts >= TIMESTAMP '2024-01-29')
    SELECT 'click' AS a_seg, 'purchase' AS b_seg,
           CAST((SELECT count(*) FROM a) AS BIGINT) AS a_card,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS b_card,
           CAST((SELECT count(*) FROM (SELECT user_id FROM a
                 INTERSECT SELECT user_id FROM b)) AS BIGINT) AS and_card,
           CAST((SELECT count(*) FROM (SELECT user_id FROM a
                 UNION SELECT user_id FROM b)) AS BIGINT) AS or_card,
           CAST((SELECT count(*) FROM (SELECT user_id FROM a
                 EXCEPT SELECT user_id FROM b)) AS BIGINT) AS andnot_card
    """,
    doc="groupBitmap set-expression cardinalities (operators/rollup.py:"
        "bitmap_state/bitmap_merge/bitmap_set_cardinalities) — the EXACT "
        "member of the -State/-Merge family and the one no sketch can "
        "replace: per-(event_type, day) chunked distinct-set states "
        "persist, fold per type (proving re-aggregation), and segment "
        "overlap reads as per-chunk array intersect/union/except summed "
        "— bitmapAndCardinality('click','purchase') etc. from stored "
        "states, the raw event history never re-scanned. The segments "
        "are TIME-WINDOWED (first-day clickers vs last-two-day "
        "purchasers) by filtering the day-keyed STATE rows before the "
        "fold — 'distinct users in any window, any set expression' is "
        "exactly what the day-grained states buy. Registered as "
        "a demoted variant per the window discipline: the -State/-Merge "
        "class is windowed via uniq_register_rollup, row-level set ops "
        "via set_ops. In production the states are a stored table (the "
        "AggregatingMergeTree loop); here the query builds them inline "
        "from events first. Scale: collect_set reduces raw rows to "
        "distincts map-side before the one state shuffle; chunking "
        "bounds every row at 2^16 values; the overlap join ships only "
        "two segments' state rows.",
)
def segment_bitmap_overlap(spark, sf_dir):
    from ..operators.rollup import (bitmap_merge, bitmap_set_cardinalities,
                                    bitmap_state)
    ev = _events(spark, sf_dir).select(
        "event_type", F.date_trunc("day", "ts").alias("d"), "user_id")
    st = bitmap_state(ev, ["event_type", "d"], "user_id")
    # in production `st` is the stored state table; cut lineage so the
    # two segment reads below scan the states once, not events twice
    st = st.localCheckpoint(eager=False)
    a = bitmap_merge(
        st.filter((F.col("event_type") == "click")
                  & (F.col("d") < "2024-01-02")), []) \
        .select("chunk", "vals")
    b = bitmap_merge(
        st.filter((F.col("event_type") == "purchase")
                  & (F.col("d") >= "2024-01-29")), []) \
        .select("chunk", "vals")
    return (bitmap_set_cardinalities(a, b)
            .select(F.lit("click").alias("a_seg"),
                    F.lit("purchase").alias("b_seg"),
                    "a_card", "b_card", "and_card", "or_card",
                    "andnot_card"))


@_q(
    "kmv_segment_overlap",
    """
    WITH a_h AS (
      SELECT DISTINCT ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                         1, 15))::BIGINT AS h
      FROM events WHERE event_type = 'click'
        AND ts < TIMESTAMP '2024-01-02'),
    b_h AS (
      SELECT DISTINCT ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                         1, 15))::BIGINT AS h
      FROM events WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-29'),
    a_k AS (SELECT h FROM a_h ORDER BY h LIMIT 32),
    b_k AS (SELECT h FROM b_h ORDER BY h LIMIT 32),
    u_k AS (SELECT h FROM (SELECT h FROM a_k UNION SELECT h FROM b_k)
            ORDER BY h LIMIT 32),
    est AS (
      SELECT
        (SELECT CASE WHEN count(*) < 32 THEN count(*) * 100
                ELSE CAST(floor(3100.0 * 1152921504606846976.0
                                / greatest(max(h), 1) + 0.5) AS BIGINT)
                END FROM a_k) AS a_est_e2,
        (SELECT CASE WHEN count(*) < 32 THEN count(*) * 100
                ELSE CAST(floor(3100.0 * 1152921504606846976.0
                                / greatest(max(h), 1) + 0.5) AS BIGINT)
                END FROM b_k) AS b_est_e2,
        (SELECT CASE WHEN count(*) < 32 THEN count(*) * 100
                ELSE CAST(floor(3100.0 * 1152921504606846976.0
                                / greatest(max(h), 1) + 0.5) AS BIGINT)
                END FROM u_k) AS union_est_e2,
        (SELECT count(*) FROM u_k
         WHERE h IN (SELECT h FROM a_k)
           AND h IN (SELECT h FROM b_k)) AS m,
        (SELECT count(*) FROM u_k) AS nu)
    SELECT 'click' AS a_seg, 'purchase' AS b_seg,
           a_est_e2, b_est_e2, union_est_e2,
           CAST((20000 * m + nu) // (2 * nu) AS BIGINT) AS jaccard_e4,
           CAST((2 * union_est_e2 * m + nu) // (2 * nu) AS BIGINT)
             AS inter_est_e2
    FROM est
    """,
    doc="KMV (k-minimum-values) sketch segment overlap (operators/"
        "rollup.py:kmv_state/kmv_merge/kmv_set_estimates) — the "
        "APPROXIMATE twin of segment_bitmap_overlap on the IDENTICAL "
        "time-windowed segments, and the -State/-Merge family's last "
        "member: O(k)-per-key states (the k smallest 60-bit md5 hashes "
        "of the distinct values — Bar-Yossef 2002, Beyer 2007) that, "
        "unlike HLL, answer INTERSECTION/Jaccard estimates: an element "
        "of the union's min-k belongs to A iff it's in A's min-k, so "
        "matches read off by array intersection. The whole read — "
        "estimates included — is pinned arithmetic (exact below k; one "
        "double division of two exactly-representable values, HALF-UP; "
        "integer-div e4 devices), hence this full-value oracle: DuckDB "
        "reproduces the ESTIMATES bit-for-bit, not just the sketch. "
        "Registered as a demoted variant (the -State/-Merge class is "
        "windowed via uniq_register_rollup; exact set ops via "
        "segment_bitmap_overlap's class twin set_ops). Scale: state "
        "build is one (key, hash) dedup shuffle + a WindowGroupLimit "
        "rank (k rows/key survive map-side); the overlap touches 3k "
        "longs — segment overlap at 10^10 users, where the bitmap's "
        "O(distinct) store is impossible.",
)
def kmv_segment_overlap(spark, sf_dir):
    from ..operators.rollup import kmv_merge, kmv_set_estimates, kmv_state
    k = 32
    ev = _events(spark, sf_dir).select(
        "event_type", F.date_trunc("day", "ts").alias("d"), "user_id")
    st = kmv_state(ev, ["event_type", "d"], "user_id", k=k)
    st = st.localCheckpoint(eager=False)   # stored-state stand-in
    a = kmv_merge(
        st.filter((F.col("event_type") == "click")
                  & (F.col("d") < "2024-01-02")), [], k=k).select("kmv")
    b = kmv_merge(
        st.filter((F.col("event_type") == "purchase")
                  & (F.col("d") >= "2024-01-29")), [], k=k).select("kmv")
    return (kmv_set_estimates(a, b, k=k)
            .select(F.lit("click").alias("a_seg"),
                    F.lit("purchase").alias("b_seg"),
                    "a_est_e2", "b_est_e2", "union_est_e2",
                    "jaccard_e4", "inter_est_e2"))
