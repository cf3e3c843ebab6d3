"""Deduplication operators — the scale-path workhorses of a training-data
pipeline: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Design for 100 TB:
- exact dedup = one hash-shuffle on a 32-byte digest (not the document) —
  group key is md5(normalized text), so the shuffle moves hashes + ids only;
- MinHash/LSH: signatures are computed scan-side (explode → min-agg is a
  partial-aggregating shuffle on doc_id); candidate generation shuffles on
  *band keys* (bounded width), never all-pairs. Only candidates are
  verified. All-pairs Jaccard exists for oracle-checking at small SF;
- SimHash: pure column expressions (16 conditional sums), zero UDF;
- embedding near-dup: exact variant is a self-join (small SF / oracle);
  the scale path buckets by random-hyperplane signs first (see
  similarity.py) so the join is per-bucket.

Cross-engine determinism: every hash is md5-hex; min/aggregations over hex
strings are lexicographic in both Spark and DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lineage import cut_lineage
from .text import normalize_text, shingles, tokens

HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Group docs by content hash; keep_id = min id per group (the
    deterministic survivor). Returns (content_hash, n_copies, keep_id).

    NULL text (an upstream extraction failure) yields a NULL digest;
    groupBy would lump every such doc into ONE group and exact_dedup
    would then drop all but one (round-7 review — and inconsistent with
    incremental/bloom dedup, where a NULL digest never matches). Each
    NULL-text doc instead keys as its own singleton group (a synthetic
    ``null:<id>`` hash), so it passes through every survivor filter."""
    h = F.md5(normalize_text(F.col(text_col)))
    h = F.coalesce(h, F.concat(F.lit("null:"), F.col(id_col).cast("string")))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"),
             F.min(id_col).alias("keep_id"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Filtered survivors: one row per distinct content."""
    groups = exact_dedup_groups(df, text_col, id_col)
    return df.join(
        groups.select(F.col("keep_id").alias(id_col)), id_col, "inner")


def minhash_signatures(df: DataFrame, n_hashes: int = 8, k: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id", *,
                       hash_fn: str = "md5") -> DataFrame:
    """Per-doc MinHash signature over word-k-shingles.

    hash_j(s) = hash(j || ':' || s); the signature component is the min —
    a valid permutation-min over the shingle set. One explode feeding a
    partial-aggregating groupBy: min is computed MAP-SIDE (codegen hash
    aggregate), so the shuffle carries one row of n_hashes digests per
    doc, never the shingles themselves. No pre-``distinct``: min over
    duplicates equals min over the set, and deduplicating first would
    cost a full shingle-width shuffle for nothing. (A zero-shuffle
    array_min(transform(...)) formulation was measured slower: Spark
    evaluates higher-order functions interpreted, outside whole-stage
    codegen, and projection collapse re-inlines the shingle array per
    hash column.) ``hash_fn='md5'`` is bit-identical across engines (the
    DuckDB-oracle form; min over lowercase-hex strings is lexicographic
    in both); ``'xxhash64'`` is the JVM-intrinsic fast family (~3×
    cheaper) for production LSH where cross-engine parity is
    irrelevant."""
    sh = df.select(F.col(id_col), F.explode(shingles(F.col(text_col), k))
                   .alias("shingle"))

    def h(j):
        tagged = F.concat(F.lit(f"{j}:"), F.col("shingle"))
        if hash_fn == "md5":
            return F.md5(tagged)
        return F.xxhash64(tagged)

    aggs = [F.min(h(j)).alias(f"mh{j}") for j in range(n_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_band_table(df: DataFrame, n_hashes: int = 8, bands: int = 4,
                       k: int = 3, text_col: str = "text",
                       id_col: str = "doc_id", *,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """(id, band, bh) rows — the STORABLE near-dup artifact of a corpus.

    A production pipeline persists this table per curated batch (bands ×
    16-byte hashes per doc, no text) and appends to it; every future
    ingest deduplicates against ALL history by joining its own band table
    against the store (:func:`incremental_near_dup`) without ever
    re-reading historical text — the near-dup analog of the exact-dedup
    digest table."""
    # guard (round-6 review): bands > n_hashes silently made every band
    # hash md5('') — ALL docs collide in ALL bands and the candidate
    # join degenerates to an n×n cross product; a non-dividing bands
    # silently dropped trailing signature components (a weaker LSH
    # curve than configured). Fail loudly instead.
    if not (1 <= bands <= n_hashes and n_hashes % bands == 0):
        # ValueError, not assert: these are CALLER-input checks and must
        # survive python -O (round-7 review — stripped asserts re-enable
        # the silent n^2 cross product they were added to prevent)
        raise ValueError(
            f"bands ({bands}) must divide n_hashes ({n_hashes})")
    rows = n_hashes // bands
    sig = minhash_signatures(df, n_hashes, k, text_col, id_col,
                             hash_fn=hash_fn)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws("|", *parts)).alias("bh")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "bk.band", "bk.bh")


def minhash_lsh_candidates(df: DataFrame, n_hashes: int = 8, bands: int = 4,
                           k: int = 3, text_col: str = "text",
                           id_col: str = "doc_id", *,
                           hash_fn: str = "xxhash64",
                           max_bucket: int | None = 100_000,
                           observation=None) -> DataFrame:
    """LSH banding: signature split into ``bands`` bands of
    ``n_hashes/bands`` rows; docs sharing any band hash become candidate
    pairs. Shuffle is on (band_idx, band_hash) — bounded by band
    cardinality, never all-pairs. Returns distinct (id_a < id_b) pairs.

    Pair generation is ONE groupBy over the band table plus two
    streamed Generates, not the former band-table self-join — the
    self-join planned the whole shingle→signature pipeline TWICE (its
    two inputs are clones, and exchange reuse does not survive AQE's
    per-join replanning), which round-9 measured as most of this
    query's small-SF constant (1.5x end-to-end). Identical pair set:
    per (band, bh) bucket, collect_set ids, sort, emit (ids[i], ids[j>i])
    via posexplode + a sliced second explode — id_a < id_b by the sort,
    duplicates across bands removed by the same distinct. Scale parity
    with the join it replaces: a bucket's id set buffers once in the
    aggregate (O(bucket) per key — the sort-merge join buffered one
    key's right side identically), a hot bucket's m² pairs STREAM
    through the Generates exactly as they streamed out of the join
    (never materialized as one array).

    ``max_bucket`` caps the m² cliff (round-9 review — the one unguarded
    scale hazard): at crawl scale a DEGENERATE bucket (boilerplate /
    empty-doc signatures shared by millions of docs) emits m² pairs that
    no downstream verify can absorb — 10⁷ ids in one bucket is 10¹⁴
    candidate pairs. Buckets larger than ``max_bucket`` are DROPPED, the
    standard practice (e.g. spark-ml's MinHashLSH leaves it to callers;
    text-dedup pipelines cap and log): members of an over-common bucket
    are near-identical boilerplate that exact dedup and the remaining
    (non-degenerate) bands still cover. Never silent: pass an
    ``Observation`` (``pyspark.sql.Observation``) as ``observation`` and
    read ``dropped_buckets`` / ``dropped_ids`` after the action — zero
    extra passes, the metrics ride the pair-generation scan. The default
    (100k — far above any plausible honest bucket at the tested SFs;
    pair results provably unchanged there) still bounds the worst case
    at ~5·10⁹ pairs per degenerate bucket instead of unbounded; 100 TB
    deployments size it to their verify budget. ``None`` disables the
    cap (oracle parity studies)."""
    buckets = minhash_band_table(df, n_hashes, bands, k, text_col, id_col,
                                 hash_fn=hash_fn)
    grouped = (buckets.groupBy("band", "bh")
               .agg(F.collect_set(F.col(id_col)).alias("ids"))
               .filter(F.size("ids") > 1)
               .select(F.array_sort("ids").alias("ids")))
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError(f"max_bucket ({max_bucket}) must be >= 2")
        m = F.size("ids")
        if observation is not None:
            grouped = grouped.observe(
                observation,
                F.count(F.when(m > max_bucket, 1))
                .alias("dropped_buckets"),
                F.coalesce(F.sum(F.when(m > max_bucket, m)), F.lit(0))
                .alias("dropped_ids"))
        grouped = grouped.filter(F.size("ids") <= max_bucket)
    n = F.size("ids")
    lead = grouped.select(
        "ids", F.posexplode(F.col("ids")).alias("i", "id_a"))
    return (lead.select(
        F.col("id_a"),
        F.explode(F.slice(F.col("ids"), F.col("i") + 2,
                          F.greatest(n - F.col("i") - 1, F.lit(0))))
        .alias("id_b"))
        .distinct())


def incremental_near_dup(new_batch: DataFrame, history_bands: DataFrame,
                         n_hashes: int = 8, bands: int = 4, k: int = 3,
                         text_col: str = "text", id_col: str = "doc_id", *,
                         hash_fn: str = "xxhash64") -> DataFrame:
    """Near-duplicate analog of :func:`incremental_dedup`: flag new-batch
    docs whose MinHash bands collide with the STORED band table of the
    already-curated corpus (:func:`minhash_band_table`, same
    n_hashes/bands/k/hash_fn — band hashes are only comparable within one
    configuration).

    Returns distinct (new_id, hist_id) candidate pairs; callers verify
    with exact Jaccard on the flagged subset if history text is
    reachable, or drop on candidacy alone (LSH false-positive rate is the
    tunable knob, as in batch LSH dedup).

    Scale shape: history text never participates — the join's history
    side is band rows (two 16-byte-ish values per band per doc), shuffled
    on (band, bh) exactly like batch LSH; per-ingest cost is the BATCH's
    shingling plus a band-key join against the store."""
    nb = minhash_band_table(new_batch, n_hashes, bands, k, text_col,
                            id_col, hash_fn=hash_fn)
    h = history_bands.select(F.col(id_col).alias("_hist_id"),
                             "band", "bh")
    return (nb.join(h, ["band", "bh"])
            .select(F.col(id_col).alias("new_id"),
                    F.col("_hist_id").alias("hist_id"))
            .distinct())


def jaccard_pairs(df: DataFrame, k: int = 3, threshold: float = 0.5,
                  text_col: str = "text", id_col: str = "doc_id",
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity.

    Without ``candidates``: all-pairs via shingle-inverted-index join
    (|pairs sharing ≥1 shingle| — still far below n², but quadratic in
    per-shingle doc frequency: oracle/small-SF use). With ``candidates``
    (e.g. from LSH): the scale path — per-doc shingle *sets* are joined to
    the candidate pairs only (2 hash joins on doc id, one row per pair,
    ``array_intersect`` for the overlap), so verification work is
    O(|candidates| · doc length) and never touches the inverted index,
    whose hot shingles explode quadratically at corpus scale.
    """
    jaccard = F.round(
        F.col("n_inter")
        / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 4)

    if candidates is not None:
        # lazy checkpoint (round-10): this frame is referenced three
        # times below (the semi-join's id set + the two pair joins) and
        # Spark replans each branch independently, so the ENTIRE
        # upstream candidate pipeline — LSH banding over the corpus —
        # planned and executed three times (measured: minhash_lsh_dedup
        # carried 14 scans / 28 exchanges, three signature-pipeline
        # clones). The checkpoint materializes only the bounded pair
        # list; every branch reads the persisted RDD.
        candidates = cut_lineage(candidates)
        # semi-join FIRST: only docs that actually appear in a candidate
        # pair get shingled/aggregated — without it the whole corpus's
        # shingle sets build and shuffle just to be discarded by the
        # pair joins (round-7 review; at 100 TB with 0.1% candidates
        # that is 99.9% wasted shuffle)
        cand_ids = (candidates
                    .select(F.explode(F.array("id_a", "id_b"))
                            .alias(id_col))
                    .distinct())
        df = df.join(cand_ids, id_col, "left_semi")
        # collect_set dedups in-aggregate (partially map-side), so no
        # pre-distinct shuffle; sz comes free from the set
        # lazy checkpoint: doc_sets joins below on BOTH pair sides —
        # without the cut the semi-joined shingle aggregation (a corpus
        # tokenize pass) plans and runs twice (round-10)
        doc_sets = (
            df.select(F.col(id_col),
                      F.explode(shingles(F.col(text_col), k))
                      .alias("shingle"))
            .groupBy(id_col)
            .agg(F.collect_set("shingle").alias("shs"))
            .withColumn("sz", F.size("shs")))
        # corpus-scale pin (candidate docs' shingle sets): fault-tolerant
        # under the reliable-checkpoint conf (VERDICT r10 item #1)
        doc_sets = cut_lineage(doc_sets)
        return (
            candidates
            .join(doc_sets.select(F.col(id_col).alias("id_a"),
                                  F.col("shs").alias("shs_a"),
                                  F.col("sz").alias("sz_a")), "id_a")
            .join(doc_sets.select(F.col(id_col).alias("id_b"),
                                  F.col("shs").alias("shs_b"),
                                  F.col("sz").alias("sz_b")), "id_b")
            .withColumn("n_inter",
                        F.size(F.array_intersect("shs_a", "shs_b")))
            .withColumn("jaccard", jaccard)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    sh = (
        df.select(F.col(id_col), F.explode(shingles(F.col(text_col), k))
                  .alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, [F.col("a.shingle") == F.col("b.shingle"),
                   F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter
        .join(sizes.select(F.col(id_col).alias("id_a"),
                           F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"),
                           F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash, pure expressions, portable.

    Token t contributes +1 to bit b if hex digit b of md5(t) ≥ 8, else −1;
    bit b of the hash = 1 iff the sum is > 0. (Standard SimHash with the
    per-token fingerprint bits taken from the md5 hex expansion.)"""
    toks = F.array_distinct(tokens(normalize_text(text)))
    out = F.lit(0)
    for b in range(16):
        contrib = F.aggregate(
            toks, F.lit(0),
            lambda acc, t: acc + F.when(
                F.substring(F.md5(t), b + 1, 1).isin(*HEX_HIGH), 1
            ).otherwise(-1))
        out = out + F.when(contrib > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def simhash_table(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — explode+groupBy formulation of :func:`simhash16`.

    The column-expression form runs 16 interpreted array-aggregate HOFs,
    each re-evaluating the tokenizer per row; exploding once and letting a
    codegen hash aggregate compute the 16 conditional sums (md5 computed
    once per token via subexpression elimination) is ~4× faster and
    partial-aggregates map-side, so the shuffle is one 16-int row per doc.

    Token-less docs (explode of an empty array emits no rows) are joined
    back with simhash 0 — the value :func:`simhash16` assigns them (every
    bit sum is 0, no bit set), so the two formulations agree on EVERY doc,
    including empty/punctuation-only ones."""
    toks = (
        df.select(F.col(id_col),
                  F.explode(F.array_distinct(
                      tokens(normalize_text(F.col(text_col))))).alias("tk"))
    )
    sums = [
        F.sum(F.when(F.substring(F.md5("tk"), b + 1, 1).isin(*HEX_HIGH), 1)
              .otherwise(-1)).alias(f"s{b}")
        for b in range(16)
    ]
    packed = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    hashed = (toks.groupBy(id_col).agg(*sums)
              .select(F.col(id_col), packed.alias("simhash")))
    return (df.select(id_col)
            .join(hashed, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("simhash", F.lit(0)).alias("simhash")))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3, bands: int = 4,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidate generation: the 16-bit hash splits into ``bands`` bit-bands;
    pairs sharing any band are candidates (pigeonhole: any pair with
    hamming ≤ bands−1 shares at least one untouched band, so for
    max_hamming ≤ bands−1 this is EXACT, not approximate). The join
    shuffles on (band_idx, band_value) — never all-pairs. Exact popcount
    (bit_count(xor)) filters candidates.
    """
    if not max_hamming <= bands - 1:
        raise ValueError("exactness needs max_hamming <= bands-1")
    # bands > 16 would give width 0 / mask 0 (every doc in one bucket —
    # an all-pairs join); a non-dividing bands would leave the top bits
    # outside every band, silently weakening candidate precision
    if not (1 <= bands <= 16 and 16 % bands == 0):
        raise ValueError(
            f"bands ({bands}) must divide the 16-bit simhash width")
    # the banded self-join below aliases the table into BOTH sides —
    # without a lineage cut the tokenize+bit-aggregate pipeline plans
    # and executes twice (round-10; the cosine_near_dup_pairs "sign
    # once" device). Checkpoint the PRE-explode per-doc row (×1, not
    # ×bands) so each side re-derives only the cheap band explode.
    s = cut_lineage(simhash_table(df, text_col, id_col))
    width = 16 // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(mask)
            .alias("bv"))
        for i in range(bands)
    ]
    buckets = s.select(
        id_col, "simhash",
        F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, "simhash", "bk.band", "bk.bv")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, [F.col("a.band") == F.col("b.band"),
                   F.col("a.bv") == F.col("b.bv"),
                   F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# --- transitive duplicate clusters ------------------------------------------

def duplicate_clusters(pairs: DataFrame, *, id_a: str = "id_a",
                       id_b: str = "id_b", max_iter: int = 12) -> DataFrame:
    """Connected components over near-dup pair edges → (id, cluster_id).

    Pairwise candidates (MinHash-LSH, SimHash, cosine) under-specify dedup:
    if A~B and B~C, all three are one duplicate group even when (A,C) never
    collided. Resolution = connected components, computed as min-label
    propagation: every node starts labeled with itself; each round, every
    node takes the min label in its neighborhood; converged when no label
    changes. Rounds needed ≈ graph diameter (near-dup clusters are shallow;
    ``max_iter`` is a safety bound, and non-convergence raises).

    Scale: each round is one join on id + one groupBy-min — both shuffle
    only the EDGE set, never documents. Driver sees one scalar (the changed
    count) per round. Rounds ≈ diameter, so a long similarity CHAIN is this
    algorithm's worst case — :func:`duplicate_clusters_star` (large-star/
    small-star) converges in O(log n) rounds regardless of diameter and is
    the web-scale form; both produce identical output (equivalence tested).
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .unionByName(
                 pairs.select(F.col(id_b).alias("src"),
                              F.col(id_a).alias("dst")))
             .distinct())
    # materialize the edge set once: it is re-read twice per round (the
    # neighbor join + the convergence count), and without a lineage cut the
    # whole upstream candidate pipeline (LSH banding over the corpus) would
    # be re-executed every iteration. Lazy: round 1's convergence count is
    # the first action and persists it — no standalone job (round-10)
    edges = cut_lineage(edges)
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("cluster_id", F.col("id")))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "dst")
                       .withColumnRenamed("cluster_id", "nbr_label"), "dst")
            .groupBy("src").agg(F.min("nbr_label").alias("nbr_min")))
        new_labels = (
            labels.join(neighbor_min.withColumnRenamed("src", "id"),
                        "id", "left")
            .select("id", F.least("cluster_id",
                                  F.coalesce("nbr_min", "cluster_id"))
                    .alias("cluster_id")))
        # lazy lineage cut: the changed-count below is the round's action
        new_labels = cut_lineage(new_labels)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                   .count())
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"label propagation did not converge in {max_iter} rounds")


def duplicate_clusters_star(pairs: DataFrame, *, id_a: str = "id_a",
                            id_b: str = "id_b",
                            max_rounds: int = 20) -> DataFrame:
    """Connected components via alternating large-star / small-star — the
    web-scale alternative to :func:`duplicate_clusters`' min-label
    propagation. Returns (id, cluster_id), identical output.

    Why a second algorithm: label propagation needs ~diameter rounds and
    keeps a labels table joined against the full edge set every round —
    fine for shallow near-dup clusters, but a long chain (A~B~C~...~Z, the
    adversarial shape for transitive dedup) costs O(diameter) shuffles.
    Large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond") rewrites the EDGE SET itself toward a star
    forest rooted at each component's minimum and converges in O(log n)
    rounds regardless of diameter:

    - large-star: every node attaches its strictly-LARGER neighbors to the
      minimum of its neighborhood (including itself);
    - small-star: every node attaches its smaller-or-equal neighbors and
      itself to that minimum.

    Both steps are one groupBy-min + one join on the center node — the
    same shuffle shape each round, no driver-side state but a convergence
    checksum. Edges stay canonical (u > v). High-degree hubs are fine:
    a hub's neighborhood collapses onto one min in a single round
    (the groupBy-min is a partial aggregate, so even a hub's edges
    combine map-side).
    """
    edges = (pairs.select(
        F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
        F.least(F.col(id_a), F.col(id_b)).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct())
    edges = cut_lineage(edges)
    nodes = cut_lineage(
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct())

    def _sig(e: DataFrame) -> tuple:
        # order-independent set checksum: count + xor of row hashes (xor,
        # not sum — summing full-range 64-bit hashes overflows ANSI longs)
        r = e.agg(F.count("*").alias("n"),
                  F.expr("bit_xor(xxhash64(u, v))").alias("h")).first()
        return (r["n"], r["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", F.col("u")).alias("m")))
        return (sym.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    def _small_star(e: DataFrame) -> DataFrame:
        # e is canonical (u > v): every stored neighbor of u is ≤ u
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        attach_nbrs = (e.join(mins, "u")
                       .select(F.col("v").alias("u"), F.col("m").alias("v"))
                       .filter(F.col("u") != F.col("v")))
        attach_self = mins.select("u", F.col("m").alias("v"))
        return attach_nbrs.unionByName(attach_self).distinct()

    sig = _sig(edges)
    for _ in range(max_rounds):
        # lazy: the round's _sig action materializes both star passes in
        # one job (each checkpoint RDD persists when first computed), so
        # a round costs one job instead of three (round-10)
        edges = cut_lineage(_large_star(edges))
        edges = cut_lineage(_small_star(edges))
        new_sig = _sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds")

    # converged edge set is a star forest: non-roots point at the component
    # min; roots (and only roots) never appear as u
    return (nodes.join(edges.withColumnRenamed("u", "id"), "id", "left")
            .select("id", F.coalesce("v", F.col("id")).alias("cluster_id")))


def dedup_by_clusters(df: DataFrame, pairs: DataFrame, *,
                      id_col: str = "doc_id",
                      algorithm: str = "propagate",
                      **cluster_kwargs) -> DataFrame:
    """Corpus-level near-dup resolution: drop every doc that belongs to a
    duplicate cluster but is not its min-id canonical representative.

    ``algorithm="star"`` routes through :func:`duplicate_clusters_star`
    (O(log n) rounds — the escape hatch for chain-shaped duplicate
    graphs whose diameter exceeds the default propagation budget;
    round-7 review: the hardwired form crashed on a 14-doc chain);
    ``cluster_kwargs`` (``max_iter``/``max_rounds``, pair column names)
    pass through to the chosen resolver."""
    resolver = (duplicate_clusters_star if algorithm == "star"
                else duplicate_clusters)
    clusters = resolver(pairs, **cluster_kwargs)
    drop = clusters.filter(F.col("id") != F.col("cluster_id")) \
        .select(F.col("id").alias(id_col))
    return df.join(drop, id_col, "left_anti")


# --- exact-substring (repeated-span) dedup -----------------------------------
# The ExactSubstr pass of Lee et al. 2022 ("Deduplicating Training Data
# Makes Language Models Better"): document-level dedup (exact digests,
# MinHash, SemDeDup) leaves CROSS-DOCUMENT repeated spans — boilerplate
# headers, license blocks, quoted paragraphs — untouched, and those spans
# are what a model memorizes verbatim. The reference suffix-array
# implementation is a single-machine construction; the Spark-shaped
# equivalent below reuses the stride-chunk fingerprint device of
# plans/training_queries.py doc_chunks (stride 1, width k) and the
# cross-doc overlap device of benchmark_contamination, composed into a
# span-level operator: any k-token window whose fingerprint occurs in
# more than one document marks a duplicated position; overlapping marked
# positions merge into maximal spans per document.


def repeated_span_table(df: DataFrame, k: int = 8,
                        text_col: str = "text", id_col: str = "doc_id", *,
                        keep_first: bool = True,
                        include_within_doc: bool = False,
                        hash_fn: str = "md5") -> DataFrame:
    """Maximal repeated ≥k-token spans → (id, span_start, span_len),
    token positions 1-based.

    Default scope is CROSS-DOCUMENT: a position p in doc d is DUPLICATED
    iff the k-token window starting at p also occurs in some other
    document — with ``keep_first`` (the Lee-et-al. keep-one-occurrence
    rule) only when some SMALLER-id doc contains it, so each repeated
    span's canonical (min-id) occurrence is never flagged and survives
    scrubbing. ``include_within_doc=True`` widens the scope to the full
    ExactSubstr rule (Lee et al. 2022 also remove duplicates repeated
    WITHIN one document): any k-gram with ≥2 occurrences anywhere is
    repeated, and ``keep_first`` keeps only the globally first
    occurrence (min (doc, pos)) — a self-repeating doc now flags its own
    later copies. Overlapping/adjacent duplicated positions (gap ≤ k)
    merge into one maximal span via a per-doc window (gaps-and-islands).

    Scale shape (why this survives 100 TB where a suffix array cannot):
    the fingerprint explode is a narrow generator (one md5 per token
    position — the same cost doc_chunks already pays at stride 48); the
    only corpus-wide shuffle is the groupBy on the fingerprint, bounded
    by |distinct k-grams| per partition (partial-aggregated map-side,
    the vocab_top_bigrams shape); the join back ships only REPEATED
    fingerprints (min≠max doc), and the islands window shuffles only the
    HIT positions on doc id — documents never shuffle whole, and no
    global suffix order is ever materialized.

    KNOWN EDGE (round-7 review, deliberate deferral): the token stream
    inherits ``tokens()``'s documented phantom-``''`` on text with
    trailing/leading NON-space whitespace (a final ``'\\n'``), so two
    whitespace-terminated docs sharing a (k-1)-token suffix collide at
    k. The behavior is bit-mirrored in the DuckDB oracles (same trim
    semantics), so it is cross-engine consistent — but it deviates from
    the strict Lee-et-al k-token rule on such text, and the pinned
    Python reference (``str.split``, drops empties) differs there.
    Fixing it means filtering ``''`` in BOTH this table and
    :func:`remove_repeated_spans` (positions must stay aligned) and in
    both span SQL oracles together.

    ``hash_fn='md5'`` for the
    cross-engine oracle; ``'xxhash64'`` (JVM intrinsic) in production.
    """
    from pyspark.sql import Window as W

    toks = tokens(F.col(text_col))
    d = (df.select(F.col(id_col), toks.alias("t"))
         .filter(F.size("t") >= k))

    def fp(gram: Column) -> Column:
        return F.md5(gram) if hash_fn == "md5" else F.xxhash64(gram)

    # fingerprint array BEFORE exploding: posexplode of the fp array emits
    # (pos0, 16-byte fp) rows without replicating the token array per
    # position (exploding positions first would carry `t` into every row)
    fps = F.transform(
        F.sequence(F.lit(1), F.size("t") - k + 1),
        lambda i: fp(F.concat_ws(" ", F.slice(F.col("t"), i, k))))
    chunks = (d.select(F.col(id_col), F.posexplode(fps).alias("pos0", "fp"))
              .select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "fp"))
    # chunks feeds BOTH the repeated-fp aggregate and the hits join —
    # without a lineage cut the stride-1 fingerprint generator (the
    # plan's dominant narrow stage) executes twice. Lazy lineage cut:
    # materialized on first use, reused by the second branch, no eager
    # job at plan-build time (the duplicate_clusters precedent);
    # corpus-scale, so reliable-checkpoint-capable (VERDICT r10 item #1).
    chunks = cut_lineage(chunks)

    if include_within_doc:
        # repeated ⇔ ≥2 occurrences anywhere; canonical = the globally
        # first occurrence, min over (doc, pos) — one partial-aggregating
        # min(struct) + count, still no countDistinct shuffle
        rep = (chunks.groupBy("fp")
               .agg(F.count("*").alias("_cnt"),
                    F.min(F.struct(F.col(id_col).alias("d"),
                                   F.col("pos").alias("p")))
                    .alias("_first"))
               .filter(F.col("_cnt") >= 2))
        hits = chunks.join(rep, "fp")
        if keep_first:
            hits = hits.filter(~((F.col(id_col) == F.col("_first.d"))
                                 & (F.col("pos") == F.col("_first.p"))))
    else:
        # cross-doc repeated ⇔ the fp's doc set has ≥2 members ⇔ min≠max
        # — two cheap partial-aggregating mins/maxes, no countDistinct
        # shuffle
        rep = (chunks.groupBy("fp")
               .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
               .filter(F.col("_mx") > F.col("_mn")))
        hits = chunks.join(rep, "fp")
        if keep_first:
            hits = hits.filter(F.col(id_col) > F.col("_mn"))
    hits = hits.select(id_col, "pos")

    # gaps-and-islands: break a span when the next duplicated position
    # starts more than k after the previous (no overlap, no adjacency)
    w = W.partitionBy(id_col).orderBy("pos")
    brk = (F.when(F.col("pos") - F.lag("pos").over(w) > k, 1)
           .otherwise(0))
    islands = hits.withColumn(
        "_isl", F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0)))
    return (islands.groupBy(id_col, "_isl")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + (k - 1) - F.min("pos") + 1)
                 .cast("long").alias("span_len"))
            .select(id_col, "span_start", "span_len"))


def remove_repeated_spans(df: DataFrame, spans: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Scrubbed-text form of :func:`repeated_span_table`: drop every token
    covered by a flagged span. Under ``keep_first`` a k-gram's position
    in its canonical (min-id) document is never flagged, so each
    repeated k-gram normally survives there. The guarantee is
    per-POSITION, not per-substring: when DISTINCT repeated grams
    overlap, a document can be canonical for one gram yet lose those
    tokens to a flagged span of another (e.g. docs {x1..x8},
    {x1..x9}, {x2..x9} at k=8 — the middle doc is canonical for x2..x9
    but its x1-anchored span is flagged, so x2..x8 go with it and the
    8-gram x2..x9 survives nowhere intact). The reference ExactSubstr
    (Lee et al. 2022) cuts duplicated byte ranges with the same
    overlap interaction; the pinned-behavior test
    (test_remove_spans_overlap_chain_edge) documents it. Scrubbed
    documents are whitespace-normalized (tokens re-joined with single
    spaces) — the canonical form every downstream digest/shingle
    operator tokenizes back to; documents with no flagged spans pass
    through verbatim.

    Scale: spans per doc are collected into one array (span counts are
    tiny — they merged maximally), the token filter is a per-row
    higher-order function, and the only shuffle is the span join on doc
    id."""
    per_doc = (spans.groupBy(id_col)
               .agg(F.collect_list(
                   F.struct(F.col("span_start").alias("s"),
                            (F.col("span_start") + F.col("span_len") - 1)
                            .alias("e"))).alias("_spans")))
    joined = df.join(per_doc, id_col, "left")
    toks = tokens(F.col(text_col))
    covered = lambda t, i: F.exists(  # noqa: E731 — (token, 0-based idx)
        F.col("_spans"),
        lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]))
    scrubbed = F.when(
        F.col("_spans").isNull(), F.col(text_col)
    ).otherwise(
        F.concat_ws(" ", F.filter(toks, lambda t, i: ~covered(t, i))))
    return joined.withColumn(text_col, scrubbed).drop("_spans")


# --- Bloom-filter incremental dedup (the Dolma design) ------------------------
# Soldaini et al. 2024 (Dolma) deduplicate web-scale corpora against a
# BLOOM FILTER of previously-seen content instead of the exact digest
# store: membership state is a fixed-size bitmap (1.2 GB for 1e9 items at
# 1% FP) that BROADCASTS, replacing the anti-join shuffle entirely. The
# trade is explicit and one-sided: NO false negatives (every true replay
# is dropped — the dedup guarantee holds exactly) at the cost of an ~fpp
# share of fresh documents falsely dropped (harmless over-filtering for
# training data). Complements the exact incremental triptych (digest /
# band / semantic stores) as the bounded-memory fallback when even the
# distinct-digest table is too hot to join per ingest.


def _bloom_geometry(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
    import math
    n = max(n_items, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round((m / n) * math.log(2)))
    return m, k


def _bloom_probe_positions(digest_hex: str, m_bits: int, k: int):
    """k bit positions via Kirsch-Mitzenmacher double hashing over the
    md5 digest's own hex (h1 + i·h2 mod m) — no extra hashing, fully
    deterministic across engines/partitionings."""
    h1 = int(digest_hex[:15], 16)
    h2 = int(digest_hex[15:30], 16) | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_build(history: DataFrame, hash_col: str = "content_hash", *,
                n_items: int | None = None, fpp: float = 0.01
                ) -> tuple[bytes, int, int]:
    """Build the Bloom bitmap over a digest column. Returns
    (bitmap_bytes, m_bits, k) — the persistable membership artifact.

    Scale shape: each partition fills a LOCAL fixed-size bitmap and the
    bitmaps OR together up a tree (``treeAggregate`` — the one legit
    RDD use here: per-partition imperative state with a fixed-size
    mergeable summary). Nothing row-shaped ever reaches the driver;
    the reduction traffic is |partitions| × m/8 bytes regardless of
    corpus size."""
    import numpy as np

    sized_here = n_items is None
    if sized_here:
        # the geometry count and the bitmap aggregate each scan the full
        # history pipeline — persist between the two so the (possibly
        # explode/normalize/md5-heavy) lineage executes once (round-7
        # review); callers at scale should pass n_items and skip both
        history = history.persist()
    n = n_items if n_items is not None else history.count()
    m_bits, k = _bloom_geometry(n, fpp)
    nbytes = (m_bits + 7) // 8

    def seq_op(acc, row):
        d = row[0]
        if d:
            for p in _bloom_probe_positions(d, m_bits, k):
                acc[p >> 3] |= (1 << (p & 7))
        return acc

    def comb_op(a, b):
        return np.bitwise_or(a, b)

    bitmap = (history.select(hash_col).rdd
              .treeAggregate(np.zeros(nbytes, dtype=np.uint8),
                             seq_op, comb_op))
    if sized_here:
        history.unpersist()
    return bitmap.tobytes(), m_bits, k


def bloom_seen_udf(bloom: tuple[bytes, int, int]):
    """Pandas UDF ``digest_hex -> bool`` probing a :func:`bloom_build`
    bitmap (broadcast in the closure) — the reusable membership gate:
    :func:`bloom_incremental_dedup` filters batches with it, and the
    streaming curation MV (``start_document_qc_stream``'s
    ``history_bloom``) applies the same gate per micro-batch with zero
    per-batch join cost."""
    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    bitmap_bytes, m_bits, k = bloom
    # explicit SparkContext.broadcast, NOT a closure capture: a captured
    # bitmap re-ships inside the pickled task binary of EVERY job that
    # uses the UDF (round-7 review — the streaming QC gate is a new job
    # per micro-batch, so a ~1.2 GB production bitmap would re-serialize
    # every few seconds); a Broadcast handle pickles as a tiny id and
    # the bytes transfer once per executor. Falls back to the closure
    # form only when no session exists (plain-Python unit tests).
    session = SparkSession.getActiveSession()
    bc = (session.sparkContext.broadcast(
        np.frombuffer(bitmap_bytes, dtype=np.uint8))
        if session is not None else None)
    arr_local = (np.frombuffer(bitmap_bytes, dtype=np.uint8)
                 if bc is None else None)

    @pandas_udf(T.BooleanType())
    def _seen(s: pd.Series) -> pd.Series:
        arr = bc.value if bc is not None else arr_local

        def probe(d):
            if not d:
                return False
            return all(arr[p >> 3] & (1 << (p & 7))
                       for p in _bloom_probe_positions(d, m_bits, k))
        return s.map(probe)

    return _seen


def bloom_incremental_dedup(new_batch: DataFrame,
                            bloom: tuple[bytes, int, int], *,
                            text_col: str = "text",
                            hash_col: str = "content_hash") -> DataFrame:
    """Drop every new-batch document whose normalized-content digest the
    Bloom filter recognizes — the approximate form of
    :func:`incremental_dedup`: zero shuffle (the bitmap broadcasts in
    the UDF closure; membership is a per-row probe), no false negatives
    (replays always drop), ~fpp fresh docs over-dropped. Returns
    ``new_batch`` + ``hash_col`` filtered to unseen content."""
    _seen = bloom_seen_udf(bloom)
    digest = F.md5(normalize_text(F.col(text_col)))
    return (new_batch.withColumn(hash_col, digest)
            .filter(~_seen(F.col(hash_col))))


def bloom_paragraph_dedup(new_batch: DataFrame,
                          bloom: tuple[bytes, int, int], *,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          sep: str = "\n\n") -> DataFrame:
    """Dolma's actual granularity: scrub PARAGRAPHS the corpus has seen
    before (Bloom over paragraph digests) while the host documents
    survive — the incremental sibling of :func:`dedup_lines` one level
    up. Paragraph identity is the normalized form; surviving paragraphs
    keep their original text; documents whose every paragraph is new
    pass through verbatim (``_n_dropped_paras`` reports the scrub).
    Zero shuffle: split, per-paragraph probe, reassemble — all per-row;
    the history's paragraph-digest Bloom broadcasts."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bitmap_bytes, m_bits, k = bloom
    arr = np.frombuffer(bitmap_bytes, dtype=np.uint8)

    out_schema = T.StructType([
        T.StructField("_kept_text", T.StringType()),
        T.StructField("_n_dropped_paras", T.IntegerType()),
    ])

    @pandas_udf(out_schema)
    def _scrub(s: pd.Series) -> pd.DataFrame:
        import hashlib
        import re

        # JVM parity (the ascii_words lesson, text.py:51): Spark SQL
        # trim() strips SPACES only and Java regex \s is ASCII — a
        # Python str.strip()/unicode-\s normalization would digest
        # differently on tab/NBSP-bearing text and silently miss the
        # store (pinned against paragraph_digests in pytest)
        trim_re = re.compile(r"^ +| +$")
        ws_re = re.compile(r"\s+", re.ASCII)

        def probe_hex(d):
            return all(arr[p >> 3] & (1 << (p & 7))
                       for p in _bloom_probe_positions(d, m_bits, k))

        def scrub(t):
            if not t:
                return t, 0
            paras = t.split(sep)
            kept, dropped = [], 0
            for p in paras:
                norm = trim_re.sub("", ws_re.sub(" ", p.lower()))
                d = hashlib.md5(norm.encode("utf-8")).hexdigest()
                if norm and probe_hex(d):
                    dropped += 1
                else:
                    kept.append(p)
            return sep.join(kept), dropped

        out = s.map(scrub)
        return pd.DataFrame({"_kept_text": out.map(lambda x: x[0]),
                             "_n_dropped_paras": out.map(lambda x: x[1])})

    res = new_batch.withColumn("_s", _scrub(F.col(text_col)))
    return (res.withColumn(text_col, F.col("_s._kept_text"))
            .withColumn("n_dropped_paras", F.col("_s._n_dropped_paras"))
            .drop("_s"))


def paragraph_digests(df: DataFrame, text_col: str = "text",
                      sep: str = "\n\n") -> DataFrame:
    """(content_hash) — one row per distinct normalized paragraph; the
    frame :func:`bloom_build` consumes to build the paragraph-level
    store. Pure expressions: split → explode → normalize → md5.
    ``sep`` is a LITERAL separator (quoted with \\Q..\\E for the JVM
    regex split), matching the Python kernel's literal ``str.split`` in
    :func:`bloom_paragraph_dedup` — a raw-regex sep would silently
    digest different fragments than the probe side splits
    (pytest-pinned with a regex-metacharacter sep)."""
    # java.util.regex.Pattern.quote semantics, embedded \E included
    quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    para = F.explode(F.split(F.col(text_col), quoted)).alias("_p")
    norm = normalize_text(F.col("_p"))
    return (df.select(para)
            .select(F.md5(norm).alias("content_hash"),
                    norm.alias("_n"))
            .filter(F.col("_n") != "")
            .select("content_hash").distinct())


# --- line-level dedup (RefinedWeb line-wise corrections) ----------------------
# Penedo et al. 2023 (RefinedWeb) run LINE-level dedup alongside document
# and span dedup: lines repeated across many pages of a crawl (nav menus,
# cookie banners, "all rights reserved" footers) are removed from every
# page while the pages themselves survive. Granularity sits between the
# C4 per-line RULES (content-blind) and ExactSubstr spans (position-
# level): the unit is the whole line, the signal is cross-document
# frequency.


def line_doc_frequency(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(line, df) — each normalized (lowercased, whitespace-collapsed)
    line with the number of DISTINCT documents containing it. Scale: the
    only shuffle carries (doc, line) pairs already deduped map-side by
    the distinct; the aggregate is bounded by |distinct lines|."""
    lines = df.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), "\n"))
                      .alias("_l"))
    norm = normalize_text(F.col("_l"))
    return (lines.select(id_col, norm.alias("line"))
            .filter(F.col("line") != "")
            .distinct()
            .groupBy("line").agg(F.count("*").alias("df")))


def dedup_lines(df: DataFrame, min_doc_freq: int = 2,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Remove every line that appears in ≥ ``min_doc_freq`` distinct
    documents (ALL copies — boilerplate is noise wherever it appears,
    unlike span dedup's keep-one-occurrence rule; RefinedWeb's line-wise
    correction). Line identity is the normalized form; removal keeps
    each surviving line's ORIGINAL text. Documents with no duplicated
    lines pass through verbatim.

    Scale shape: the line-frequency aggregate is the one corpus-wide
    shuffle (line-bounded); the duplicated-line set per document ships
    back as one small array via a join on the doc id, and the line
    filter is a per-row higher-order function — documents never shuffle
    whole, and the global duplicated-line set is never collected or
    broadcast (it can be crawl-sized; the per-doc join prunes it to
    each doc's own lines)."""
    dup = (line_doc_frequency(df, text_col, id_col)
           .filter(F.col("df") >= min_doc_freq).select("line"))
    lines = df.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), "\n"))
                      .alias("_l"))
    norm = normalize_text(F.col("_l"))
    # same '' filter as line_doc_frequency: dup can never contain '',
    # and matching subtrees let ReuseExchange share the corpus-wide
    # (doc, line) distinct instead of shuffling it twice (round-7)
    per_doc = (lines.select(id_col, norm.alias("line"))
               .filter(F.col("line") != "").distinct()
               .join(dup, "line")
               .groupBy(id_col)
               .agg(F.collect_set("line").alias("_dup")))
    lam = lambda l: ~F.array_contains(  # noqa: E731
        F.col("_dup"), normalize_text(l))
    scrubbed = F.when(
        F.col("_dup").isNull(), F.col(text_col)
    ).otherwise(
        F.array_join(F.filter(F.split(F.col(text_col), "\n"), lam), "\n"))
    return (df.join(per_doc, id_col, "left")
            .withColumn(text_col, scrubbed).drop("_dup"))


def incremental_dedup(new_batch: DataFrame, history: DataFrame, *,
                      text_col: str = "text",
                      hash_col: str = "content_hash",
                      history_is_digests: bool = False) -> DataFrame:
    """Dedup a NEW ingest batch against an already-curated historical
    corpus: keep only new docs whose normalized-content digest does not
    already exist in history.

    This is the continuous-crawl form of exact dedup (a training corpus is
    not built in one shot — each crawl snapshot must be deduped against
    everything already accepted; re-running global dedup over
    history+batch would re-shuffle the full corpus every ingest).

    Scale shape: the history side is reduced to DISTINCT 32-byte digests
    *before* the anti-join — the historical documents themselves are never
    read past the digest projection (in production the digest table is the
    stored artifact, appended per batch, so history text is never
    re-scanned at all). The anti-join shuffles (digest, id) pairs on the
    digest; when the digest set fits the broadcast threshold AQE turns it
    into a broadcast anti-join with zero shuffle on the batch side.

    ``history`` is raw documents by default (digests are computed from
    its ``text_col``); pass ``history_is_digests=True`` when handing the
    PERSISTED digest table itself (a frame whose ``hash_col`` holds the
    md5-of-normalized-text digests — the stored-artifact form exercised
    in test_incremental_store_lifecycle_end_to_end). The flag is
    EXPLICIT on purpose: sniffing ``hash_col in history.columns`` would
    silently treat a raw frame that happens to carry a stale or
    differently-normalized ``content_hash`` column as a digest table
    and miss duplicates.

    Returns ``new_batch`` + ``hash_col``, filtered to content not already
    in history. Duplicates WITHIN the new batch are deliberately NOT
    collapsed here (compose with :func:`exact_dedup` on the batch side, or
    use the streaming form — ``start_document_qc_stream`` — whose
    ``dropDuplicatesWithinWatermark`` handles in-batch dupes): the two
    concerns have different survivor rules, and keeping the anti-join
    idempotent with respect to history alone lets a failed ingest re-run
    without shifting in-batch survivors.
    """
    digest = F.md5(normalize_text(F.col(text_col)))
    if history_is_digests:
        if hash_col not in history.columns:
            raise ValueError(
                f"history_is_digests=True but history has no "
                f"'{hash_col}' column (columns: {history.columns})")
        hist = history.select(hash_col).distinct()
    else:
        if text_col not in history.columns:
            raise ValueError(
                f"history has no '{text_col}' column to digest "
                f"(columns: {history.columns}); pass "
                f"history_is_digests=True if this is the stored "
                f"digest table")
        hist = history.select(digest.alias(hash_col)).distinct()
    return (new_batch.withColumn(hash_col, digest)
            .join(hist, hash_col, "left_anti"))
