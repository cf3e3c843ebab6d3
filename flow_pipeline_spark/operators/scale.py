"""Scale mechanics: skew-salted joins and bucketed (co-located) joins.

These are the two shuffle strategies the reference never needed (ClickHouse
ran on one node; its only parallelism knob was 2 Kafka partitions,
docker-compose-postgres-collect.yml:26-28) but a 1000-executor deployment
of the same workload does:

- **Salting** — flow traffic is power-law by AS/IP: one hot SrcAS can be
  10^4× the median, so a plain hash-partition join stalls on one straggler
  task. AQE's skew-join split (enabled in session.py) handles the sort-merge
  case at runtime; ``salted_join`` is the explicit form for when the skewed
  side must join a non-broadcastable mid-size table — fact keys get a random
  salt in [0, n), the other side is replicated n× with every salt, so the
  hot key spreads over n tasks. Equivalence to the unsalted join is tested.

- **Bucketing** — two big tables repeatedly joined on the same key (e.g.
  flows ⋈ flows self-join, orders ⋈ lineitem) shuffle on every query unless
  both are written bucketed on the join key: then Catalyst plans a
  SortMergeJoin with NO Exchange on either side — the join is co-located at
  write time, once, instead of shuffled at read time, every query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, other: DataFrame, key: str, *,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Join ``fact`` (skew-keyed) with ``other`` on ``key``, spreading each
    fact key across ``n_salts`` partitions.

    ``other`` is replicated ×n_salts (explode of a literal salt array) —
    use only when ``other`` is too big to broadcast but ≪ fact; the
    replication cost is n_salts·|other| rows shuffled vs a straggler task
    processing the whole hot key alone. Row-for-row equivalent to
    ``fact.join(other, key, how)``.
    """
    if how not in ("inner", "left"):
        # replicating `other` would duplicate its unmatched rows under
        # right/full-outer semantics
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    f = fact.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                          F.lit(n_salts))).cast("int"))
    o = other.withColumn("__salt", F.explode(salts))
    out = f.join(o, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, *,
                   n_buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Persist ``df`` hash-bucketed on ``key`` (saveAsTable — bucket
    metadata lives in the catalog). Joins/aggregations on ``key`` between
    tables bucketed with the same bucket count then plan with no Exchange.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    w = w.sortBy(sort_by or key)
    w.saveAsTable(table, format="parquet")


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — the
    co-located join (zero shuffle on both sides; verified by plan test)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
