"""Link-graph analytics: PageRank over an edge table.

Why it belongs in the training-data tier: web-crawl curation weights
sources by graph centrality (Common Crawl publishes harmonic-centrality
and PageRank domain ranks; OpenWebText/WebText filtered by inbound-link
signals), and a flows deployment ranks ASes by the same recurrence over
the traffic graph. The reference engine has no graph surface; this is
built from the public algorithm (Page et al. 1999) the way Spark should
run it — edge-table joins and aggregates, never a driver-side matrix.

EXACT integer arithmetic end to end (the repo-wide discipline): ranks
live as integer billionths (e9). Per iteration
``r'(v) = (15·base + 85·inc(v)) div 100`` with
``base = 10^9 div N`` and
``inc(v) = Σ_{u→v} (r(u)·w(u,v)) div s(u)`` where ``s(u)`` is u's total
out-weight — every step is integer multiply/divide/sum, so the result
is independent of float summation order, partitioning, and engine; the
DuckDB oracle unrolls the same recurrence through CTEs and matches
hash-exact. Deviations from the paper, both deliberate and shared with
GraphX's ``staticPageRank``: fixed iteration count (no convergence
test) and no dangling-mass redistribution (a sink's rank leaks; rank
ordering — what curation consumes — is unaffected for the connected
graphs this targets).

Scale: per iteration ONE edge shuffle (the incoming-mass groupBy on
dst) + a broadcast-size join of the rank vector (|nodes| rows — tiny
next to |edges|); out-weights compute once and persist across rounds.
``localCheckpoint`` per round cuts lineage exactly as kmeans_fit /
bpe_train do. Rank-vector rows never exceed |nodes|; edges never
materialize per-iteration copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E9 = 1_000_000_000


def pagerank(edges: DataFrame, *, n_iters: int = 3,
             src: str = "src", dst: str = "dst",
             weight: str | None = None) -> DataFrame:
    """Weighted PageRank over ``edges``; returns (node, rank_e9) with
    ranks in exact integer billionths. ``weight`` must be a positive
    integer column (None → unweighted, w = 1); damping is fixed at
    85/100 so the recurrence stays in integers."""
    w = (F.col(weight) if weight is not None else F.lit(1)) \
        .cast("long").alias("w")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w) \
        .localCheckpoint(eager=True)
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    base = E9 // max(n, 1)
    outw = (e.groupBy("u").agg(F.sum("w").alias("s"))
            .localCheckpoint(eager=True))

    r = nodes.select("node", F.lit(base).cast("long").alias("r"))
    for _ in range(n_iters):
        inc = (e.join(F.broadcast(r.withColumnRenamed("node", "u")), "u")
               .join(F.broadcast(outw), "u")
               .select(F.col("v").alias("node"),
                       F.expr("(r * w) div s").alias("c"))
               .groupBy("node").agg(F.sum("c").alias("inc")))
        r = (nodes.join(inc, "node", "left")
             .select("node",
                     F.expr(f"(15L * {base}L + 85L * coalesce(inc, 0L)) "
                            "div 100L").cast("long").alias("r"))
             .localCheckpoint(eager=True))
    return r.select(F.col("node"), F.col("r").alias("rank_e9"))
