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


def _fact_salt(n_salts: int):
    """The fact-side salt column: a uniform pseudo-random int in
    [0, n_salts) derived from the row-unique monotonically_increasing_id,
    so a hot key's rows spread across all n_salts shuffle keys. One
    definition, used by salted_join AND pinned directly by the spread
    test (round-7 review: the test re-implemented the expression inline,
    so it kept passing no matter what salted_join actually did)."""
    return (F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                   F.lit(n_salts))).cast("int")


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
    f = fact.withColumn("__salt", _fact_salt(n_salts))
    o = other.withColumn("__salt", F.explode(salts))
    out = f.join(o, [key, "__salt"], how)
    return out.drop("__salt")


def approx_top_k(df: DataFrame, key_col: str, k: int = 10, *,
                 capacity: int = 2048) -> DataFrame:
    """Heavy hitters without a full-key shuffle: mergeable Misra-Gries.

    The exact top-k (``groupBy(key).count()``) shuffles one row per
    DISTINCT key — fine for ports, hostile at 100 TB for high-cardinality
    keys (IPs, user ids, URLs). This sketch bounds the shuffle at
    ``capacity`` rows PER PARTITION regardless of key cardinality:

    - map side: one ``mapInPandas`` pass keeps a Misra-Gries summary of at
      most ``capacity`` counters per partition (per Arrow batch: one
      ``np.unique`` pre-aggregation, then a summary merge — never a
      per-row Python loop over raw rows);
    - merge: partition summaries union by key-sum (the mergeable-summaries
      construction: trimming to the (capacity+1)-th largest value keeps the
      total undercount ≤ n/(capacity+1), Agarwal et al., "Mergeable
      Summaries"); here the post-union trim is skipped — estimates only
      get tighter — and the final top-k orders the summed estimates.

    Output: (key, est_count, upper_bound), top-k by estimate descending
    (ties on key ascending). Guarantees: ``est_count ≤ true ≤
    upper_bound = est_count + floor(n/(capacity+1))``, and every key with
    true frequency > n/(capacity+1) survives into the merged summary.
    With ``capacity ≥`` the partition-level distinct-key count no trim ever
    fires and the sketch IS the exact count (the oracle-checkable regime,
    same trick as approx_percentiles).

    The sketch is defined over NON-NULL keys: null rows are excluded from
    both the counters and ``n`` (so the error bound is relative to the
    non-null row count, matching a SQL ``GROUP BY key`` oracle filtered to
    ``key IS NOT NULL``). A SQL GROUP BY would additionally report one NULL
    group; callers that need it should count nulls separately — mixing it
    into the sketch would loosen every bound for a group no ranking query
    wants.
    """
    import numpy as np
    import pandas as pd

    key_type = dict(df.dtypes)[key_col]
    out_schema = (f"k {key_type}, cnt long, is_meta boolean")

    def kernel(batches):
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            vals, cnts = np.unique(pdf[key_col].dropna().to_numpy(),
                                   return_counts=True)
            # n counts the same population the counters see (non-null keys)
            # so upper_bound stays tight and oracle-comparable under nulls
            n_rows += int(cnts.sum())
            for v, c in zip(vals.tolist(), cnts.tolist()):
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                sub = sorted(counters.values(), reverse=True)[capacity]
                counters = {v: c - sub for v, c in counters.items()
                            if c > sub}
        yield pd.DataFrame({
            "k": list(counters.keys()) + [None],
            "cnt": list(counters.values()) + [n_rows],
            "is_meta": [False] * len(counters) + [True],
        })

    summaries = df.select(key_col).mapInPandas(kernel, out_schema)
    total = (summaries.filter(F.col("is_meta"))
             .agg(F.sum("cnt").alias("__n")))
    merged = (summaries.filter(~F.col("is_meta"))
              .groupBy("k")
              .agg(F.sum("cnt").alias("est_count")))
    return (
        merged.crossJoin(F.broadcast(total))
        .withColumn("upper_bound",
                    F.col("est_count")
                    + (F.col("__n") / (capacity + 1)).cast("long"))
        .select(F.col("k").alias(key_col), "est_count", "upper_bound")
        .orderBy(F.desc("est_count"), F.asc(key_col))
        .limit(k)
    )


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


def zscale(col: Column, mn: int, mx: int, bits: int) -> Column:
    """Scale an integer column with known [mn, mx] bounds to
    [0, 2**bits) — ``(v-mn)*(2^bits-1) div (mx-mn)``. The Spark form
    is floor-of-double-division (cast long truncates, values are
    non-negative); IEEE division is correctly rounded, so floor equals
    exact integer division whenever the numerator stays below ~2^52 —
    which ``bits <= 16`` and any sane dimension bound guarantee. The
    DuckDB oracle uses true integer ``//`` (see ``zorder_key_sql``);
    the oracle queries hash-verify the equality."""
    span = max(mx - mn, 1)
    return ((col - F.lit(mn)) * F.lit((1 << bits) - 1) / F.lit(span)) \
        .cast("long")


def zorder_key(scaled_cols: list[Column], bits: int) -> Column:
    """Morton (Z-order) key: interleave the bits of already-scaled
    integer columns (each in [0, 2**bits)). Pure bitwise expressions —
    2*bits*len(cols) codegen'd terms, no UDF — and bit-identical in any
    engine with >> & << (the DuckDB oracle unrolls the same terms).

    Why: sorting/partitioning 100 TB by ONE column makes predicates on
    every OTHER column scan everything; a Z-order layout makes each
    parquet file a small hyper-rectangle in ALL interleaved dimensions,
    so min/max row-group stats prune multi-dimensional predicates
    (Delta OPTIMIZE ZORDER BY / ClickHouse multi-column ORDER BY with
    space-filling-curve intuition). The O3 clustering tier's
    multi-dimensional form."""
    d = len(scaled_cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(scaled_cols):
        for b in range(bits):
            z = z + ((F.shiftright(c, b).bitwiseAND(F.lit(1)))
                     .cast("long") * F.lit(1 << (b * d + i)))
    return z


def zorder_key_sql(scaled_sql: list[str], bits: int) -> str:
    """The SAME Morton interleave as ``zorder_key``, rendered as an SQL
    expression string for the DuckDB oracle."""
    d = len(scaled_sql)
    terms = []
    for i, e in enumerate(scaled_sql):
        for b in range(bits):
            terms.append(f"((({e}) >> {b}) & 1) * {1 << (b * d + i)}")
    return " + ".join(terms)


def zorder_repartition(df: DataFrame, cols_bounds: list[tuple[str, int, int]],
                       n_partitions: int, *, bits: int = 8) -> DataFrame:
    """Lay ``df`` out in Z-order over the given (col, min, max) integer
    dimensions: range-partition then sort-within-partitions on the
    Morton key, so each output file covers a compact hyper-rectangle
    and row-group min/max stats prune predicates on ANY of the
    dimensions. Write the result with ``.write.parquet`` — this is the
    OPTIMIZE-side operator (one shuffle at write time buys pruning on
    every subsequent read), the multi-dimensional sibling of the
    compaction tier's single-key ``sortWithinPartitions``."""
    scaled = [zscale(F.col(c), mn, mx, bits) for c, mn, mx in cols_bounds]
    z = zorder_key(scaled, bits)
    return (df.withColumn("__z", z)
            .repartitionByRange(n_partitions, "__z")
            .sortWithinPartitions("__z")
            .drop("__z"))
