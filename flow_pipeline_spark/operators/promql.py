"""PromQL-parity observability queries (SURVEY W7 — the perfs.json tier).

The reference's ops dashboards are PromQL over scraped counters:
``rate(metric[5m])`` at 15-30s resolution, ``sum by (label)(...)``, and
quantile summaries (reference compose/grafana/dashboards/perfs.json:97,
258,464,916; scrape cadence compose/prometheus/prometheus.yml:2-3). This
module expresses the same semantics over a metrics TABLE — either the
:class:`~flow_pipeline_spark.streaming.metrics.MetricsListener` output
(our `insert_count` analog) or any (series labels, ts, counter) frame.

PromQL ``rate()`` semantics reproduced:
- counters only ever increase; a DECREASE means the process restarted
  (counter reset) and the post-reset value is itself the delta — PromQL's
  reset adjustment, implemented as ``when(delta < 0, value)``;
- the rate at time t is the reset-adjusted increase over the trailing
  window divided by the window span in seconds;
- ``sum by (labels)`` aggregates series AFTER the per-series rate (rating
  a summed counter would double-count resets).

Scale: one shuffle on the series key serves the lag, the bucket groupBy,
and the sliding frame (same partitioning — Catalyst reuses the exchange);
the sum-by re-aggregates |series × buckets| tiny rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..streaming.metrics import MetricsListener


def metrics_table(spark: SparkSession, listener: MetricsListener) -> DataFrame:
    """The listener's per-batch progress as a queryable DataFrame — the
    scrape-target analog (S10). ``num_input_rows`` per batch is summed into
    a cumulative ``rows_total`` counter per query name, which is what a
    Prometheus client would export."""
    rows = [
        (p["name"] or str(p["query_id"]), int(p["batch_id"] or 0),
         p["timestamp"], int(p["num_input_rows"] or 0),
         float(p["processed_rows_per_second"] or 0.0),
         int(p["duration_ms"] or 0))
        for p in listener.progress
    ]
    df = spark.createDataFrame(
        rows, "name string, batch_id long, ts_str string, "
              "num_input_rows long, processed_rows_per_second double, "
              "duration_ms long")
    w = (W.partitionBy("name").orderBy("batch_id")
         .rowsBetween(W.unboundedPreceding, 0))
    return (df.withColumn("ts", F.to_timestamp("ts_str"))
            .withColumn("rows_total", F.sum("num_input_rows").over(w))
            .drop("ts_str"))


def counter_rate(df: DataFrame, *, series_cols: list[str],
                 ts_col: str = "ts", value_col: str = "counter",
                 bucket_s: int = 30, window_s: int = 300) -> DataFrame:
    """``rate(value[window])`` per series at ``bucket_s`` resolution.

    Per series: reset-adjusted delta between consecutive samples (lag),
    bucketed to ``bucket_s``, sliding-summed over ``window_s/bucket_s``
    buckets, divided by the window span — the PromQL estimator on a
    regular scrape grid. Output: series_cols + (t, rate).
    """
    n_buckets = window_s // bucket_s
    ws = W.partitionBy(*series_cols).orderBy(ts_col)
    delta = F.col(value_col) - F.lag(value_col).over(ws)
    adjusted = (
        F.when(delta.isNull(), F.lit(None))          # first sample: no delta
        .when(delta < 0, F.col(value_col))           # counter reset
        .otherwise(delta)
    )
    bucket = ((F.unix_timestamp(ts_col) / bucket_s).cast("long")
              * bucket_s).alias("t")
    per_bucket = (
        df.withColumn("_d", adjusted)
        .groupBy(*series_cols, bucket)
        .agg(F.sum("_d").alias("_inc"))
    )
    wf = (W.partitionBy(*series_cols).orderBy("t")
          .rowsBetween(-(n_buckets - 1), 0))
    return (
        per_bucket
        .withColumn("rate",
                    F.round(F.sum("_inc").over(wf) / float(window_s), 4))
        .select(*series_cols, "t", "rate")
    )


def sum_by(rates: DataFrame, labels: list[str]) -> DataFrame:
    """``sum by (labels)(rate(...))`` — aggregate series after rating."""
    return (rates.groupBy(*labels, "t")
            .agg(F.round(F.sum("rate"), 4).alias("rate"))
            .select(*labels, "t", "rate"))
