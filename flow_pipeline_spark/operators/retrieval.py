"""Ranked keyword retrieval over the corpus: BM25 and tf-idf.

A curation pipeline needs targeted *retrieval*, not just dedup/QC:
pull the documents most relevant to a probe query (contamination
audits, topic-quota checks, building eval slices, RAG baselines over
the training corpus). The reference engine has no search surface
(flows are numeric); this tier is part of the training-data extension,
built from the public BM25 literature (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond"; the idf form
is Lucene's non-negative variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

Spark-first shape:
- the INDEX is a postings table ``(term, doc id, tf, dl)`` — one
  explode + one groupBy, bounded by |distinct (doc, term)|, the
  persistable artifact (write it bucketed BY TERM and query-time
  lookups become single-bucket scans);
- SEARCH filters postings to the query's terms FIRST (an ``isin``
  over a literal list — pushed to the parquet scan of a stored
  postings table), so corpus-wide work is |query terms| postings
  lists, never the full index;
- corpus stats (N, total token count) ride 1-row broadcasts; the
  per-term document frequencies of the query terms are a tiny
  broadcast join.

Cross-engine determinism: the only libm call is ``ln`` (idf). Each
(term, doc) contribution is fixed-pointed HALF-UP to integer
millionths BEFORE summing (the doc_perplexity device — see
plans/training_queries.py), ranking compares the exact integer sum,
and the float score is derived from that integer at the end — the
JVM-vs-C-runtime last-ulp lottery cannot flip a rank or a 4dp
boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .text import tokens


def bm25_postings(docs: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Build the BM25 postings table: one row per (term, document) with
    the term frequency and the document length in tokens.

    Returns ``(term, <id_col>, tf, dl)``. This is the index artifact —
    persist it (bucketed by ``term``) and reuse across queries; dl is
    carried through the explode from the pre-split array size so no
    second pass or per-doc join is needed.

    Scale: one shuffle, the (id, term) partial-aggregated groupBy,
    bounded by |distinct (doc, term)| — the standard inverted-index
    build. Tokenization is the repo-wide whitespace split (text.tokens),
    lowercased. Empty/whitespace-only documents contribute NOTHING:
    ``tokens('')`` is ``['']`` and the empty token is filtered, so a
    blank doc neither mints a bogus '' term nor inflates the corpus
    stats (n_docs/total_len derive from postings downstream)."""
    toks = tokens(F.lower(F.col(text_col)))
    return (docs
            .select(F.col(id_col),
                    F.size(toks).cast("long").alias("dl"),
                    F.explode(toks).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term", id_col, "dl")
            .agg(F.count("*").cast("long").alias("tf"))
            .select("term", id_col, "tf", "dl"))


def _contribution_e6(tf: Column, dl: Column, df_t: Column, n_docs: Column,
                     total_len: Column, k1: float, b: float) -> Column:
    """Per-(term, doc) BM25 contribution, HALF-UP at integer millionths.

    ``idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with
    ``dl/avgdl`` expanded to ``(dl·N)/total`` (exact integer product,
    one double division) — operand order mirrored verbatim in the
    DuckDB oracle so every IEEE-defined step is bit-identical and the
    single ``ln`` is absorbed by the e6 rounding."""
    idf = F.log(F.lit(1.0)
                + (n_docs - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)))
    denom = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                              + F.lit(b) * (dl * n_docs) / total_len)
    contrib = idf * (tf * F.lit(k1 + 1.0)) / denom
    return F.floor(contrib * F.lit(1e6) + F.lit(0.5)).cast("long")


def bm25_score(postings: DataFrame, query_terms: list[str], *,
               id_col: str = "doc_id", k1: float = 1.2,
               b: float = 0.75,
               corpus_stats: tuple[int, int] | None = None,
               stats_df: DataFrame | None = None) -> DataFrame:
    """Score every document matching ≥1 query term against the query.

    Returns ``(<id_col>, score_e6, score)`` — ``score_e6`` is the exact
    integer sum of fixed-point contributions (rank on THIS), ``score``
    its float rendering (``score_e6 / 1e6``).

    Scale: postings filter to the query's terms first (literal ``isin``
    — a pushed parquet filter on a stored index); N and total-length
    ride 1-row broadcasts; per-term df is a count window over the
    already-filtered hits — NOT a second derivation of the postings
    pipeline: Spark plans each DataFrame branch independently (no CTE
    materialization, and exchange reuse does not survive AQE
    replanning), so the former ``hits.groupBy(term)`` broadcast join
    re-tokenized the whole corpus for the in-plan form (round-10
    measurement: 3 full scans in bm25_search's plan, this was one of
    them). The window's shuffle is |hits| rows — query-term postings
    only. Corpus-wide work at query time: NONE when stats are supplied
    (``corpus_stats`` — the stored pair — or ``stats_df``, a 1-row
    aggregate the caller derives more cheaply than from postings);
    the self-contained fallback aggregates the full postings table."""
    q = sorted(set(query_terms))
    hits = postings.filter(F.col("term").isin(q))
    if corpus_stats is not None:
        n_docs, total_len = corpus_stats
        stats = F.broadcast(
            postings.sparkSession.createDataFrame(
                [(int(n_docs), int(total_len))],
                "_n_docs long, _total_len long"))
    elif stats_df is not None:
        # caller-supplied 1-row (_n_docs, _total_len) frame — e.g.
        # bm25_search derives it from one narrow doc scan (no explode,
        # no shuffle) instead of aggregating the whole postings build
        stats = F.broadcast(stats_df)
    else:
        # corpus stats from the FULL postings table (1-row broadcast);
        # stats stay in the plan — no driver-side count at build time
        stats = F.broadcast(postings.agg(
            F.countDistinct(id_col).cast("long").alias("_n_docs"),
            F.sum("tf").cast("long").alias("_total_len")))
    wdf = W.partitionBy("term")
    contrib = _contribution_e6(
        F.col("tf"), F.col("dl"), F.col("_df"),
        F.col("_n_docs"), F.col("_total_len"), k1, b)
    return (hits
            .withColumn("_df", F.count("*").over(wdf).cast("long"))
            .crossJoin(stats)
            .withColumn("_c_e6", contrib)
            .groupBy(id_col)
            .agg(F.sum("_c_e6").alias("score_e6"))
            .select(id_col, "score_e6",
                    (F.col("score_e6") / F.lit(1e6)).alias("score")))


def bm25_search(docs: DataFrame, query_terms: list[str], k: int = 10, *,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents for a term query, end to end: build (or
    conceptually reuse) the postings index and rank by BM25.

    Returns ``(<id_col>, score)`` in rank order; ties broken by
    ascending id on the EXACT integer score so the cut is deterministic
    on any partitioning. The ranking compiles to TakeOrderedAndProject
    (per-partition top-k, driver merges k·P rows) — no global sort."""
    # corpus stats (N docs with >=1 token, total token count) from ONE
    # narrow pass over the docs — numerically identical to aggregating
    # the postings table (count distinct id == count of docs with a
    # non-empty token; sum(tf) == total non-empty tokens) but with no
    # explode and no (term, doc) shuffle; round-10 cut bm25_search's
    # plan from 3 full tokenize pipelines to 1 (+ this narrow scan)
    ntok = F.size(F.filter(tokens(F.lower(F.col(text_col))),
                           lambda t: t != F.lit("")))
    stats_df = (docs.select(ntok.alias("_nt"))
                .agg(F.count(F.when(F.col("_nt") > 0, True))
                     .cast("long").alias("_n_docs"),
                     F.coalesce(F.sum("_nt"), F.lit(0))
                     .cast("long").alias("_total_len")))
    scored = bm25_score(bm25_postings(docs, text_col=text_col,
                                      id_col=id_col),
                        query_terms, id_col=id_col, k1=k1, b=b,
                        stats_df=stats_df)
    return (scored
            .orderBy(F.desc("score_e6"), F.asc(id_col))
            .limit(k)
            .select(id_col, "score"))


def tfidf_top_terms(docs: DataFrame, k: int = 3, *,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf — the
    classic keyword-extraction pass (topic labeling, cluster naming,
    quota auditing by dominant term).

    idf is the same smoothed non-negative form as BM25's; the weight is
    ``tf · idf`` fixed-pointed at e6, ranked per document on the exact
    integer (ties → lexicographic term). Returns
    ``(<id_col>, rank, term, tfidf)``.

    Scale (round-11, the bm25_search device): the plan previously held
    THREE tokenize pipelines — ``postings`` was referenced by the
    n_docs aggregate, the df(term) aggregate, and the scoring join, and
    Spark re-plans each DataFrame branch independently. Now n_docs
    comes from one NARROW doc scan (count of docs with ≥1 non-empty
    token — integer-identical to countDistinct(id) over postings, no
    explode) and df(term) is a count window over postings partitioned
    by term (integer-identical to the groupBy + self-join). ONE
    tokenize pipeline; the corpus-wide shuffles carry postings rows,
    never text; the per-doc top-k window partitions by document."""
    postings = bm25_postings(docs, text_col=text_col, id_col=id_col)
    ntok = F.size(F.filter(tokens(F.lower(F.col(text_col))),
                           lambda t: t != F.lit("")))
    stats = F.broadcast(
        docs.select(ntok.alias("_nt"))
        .agg(F.count(F.when(F.col("_nt") > 0, True))
             .cast("long").alias("_n_docs")))
    idf = F.log(F.lit(1.0) + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5)))
    w_e6 = F.floor(F.col("tf") * idf * F.lit(1e6) + F.lit(0.5)) \
        .cast("long")
    wdf = W.partitionBy("term")
    wr = W.partitionBy(id_col).orderBy(F.desc("_w_e6"), F.asc("term"))
    return (postings
            .withColumn("_df", F.count("*").over(wdf).cast("long"))
            .crossJoin(stats)
            .withColumn("_w_e6", w_e6)
            .withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "term",
                    (F.col("_w_e6") / F.lit(1e6)).alias("tfidf")))


# --- positional index / exact phrase match -----------------------------------


def positional_postings(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Positional inverted index: one row per (term, document) with the
    sorted 0-based token positions — the artifact phrase queries run
    against (persist bucketed BY TERM, like :func:`bm25_postings`).

    Scale: one corpus-wide shuffle (the (term, doc) groupBy, map-side
    partials); the positions array is bounded by the term's in-document
    frequency, never the document text."""
    toks = tokens(F.lower(F.col(text_col)))
    return (docs
            .select(F.col(id_col),
                    F.posexplode(toks).alias("pos", "term"))
            .filter(F.col("term") != "")   # blank doc -> [''] -> nothing
            .groupBy("term", id_col)
            .agg(F.sort_array(F.collect_list("pos")).alias("positions")))


def phrase_match(docs: DataFrame, phrase: list[str], *,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Exact consecutive-phrase search: documents containing the token
    sequence ``phrase``, with occurrence counts — THE decontamination
    primitive (find training documents that contain a benchmark question
    verbatim; n-gram-overlap dedup only bounds it probabilistically).

    Device (the classic positional-index phrase walk, set-algebraic):
    each phrase slot i joins the index on its term and shifts that
    term's positions by −i, turning "term_i at position p" into "a
    candidate phrase START at p − i"; a document matches where ALL
    slots agree — the intersection of its per-slot start sets. Repeated
    words in the phrase are handled naturally (each slot contributes
    its own shifted set from the same postings row).

    Returns ``(<id_col>, n_matches)`` for matching documents only,
    ordered by id; ``n_matches`` counts distinct start positions
    (overlapping occurrences each count).

    Scale: the slot table (|phrase| rows) broadcasts onto the index;
    only documents containing ≥1 phrase term reach the per-doc
    aggregate, carrying position arrays, never text. Against a STORED
    index the term filter is a pushed parquet predicate over the term
    buckets."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    n = len(phrase)
    spark = docs.sparkSession
    slots = spark.createDataFrame(
        [(i, w.lower()) for i, w in enumerate(phrase)],
        "slot int, term string")
    post = positional_postings(docs, text_col=text_col, id_col=id_col)
    shifted = (post.join(F.broadcast(slots), "term")
               .select(id_col, "slot",
                       F.transform("positions",
                                   lambda p: p - F.col("slot"))
                       .alias("starts")))
    # fold the per-slot start sets with array_intersect; collect_list
    # order is nondeterministic but intersection is commutative, so the
    # result is partitioning-independent
    inter = F.expr("aggregate(slice(_sets, 2, size(_sets) - 1), _sets[0], "
                   "(acc, x) -> array_intersect(acc, x))")
    return (shifted.groupBy(id_col)
            .agg(F.countDistinct("slot").alias("_n_slots"),
                 F.collect_list("starts").alias("_sets"))
            .filter(F.col("_n_slots") == n)
            .select(F.col(id_col), F.size(inter).alias("n_matches"))
            .filter(F.col("n_matches") > 0)
            .orderBy(id_col))


def merge_postings(base: DataFrame, delta: DataFrame, *,
                   id_col: str = "doc_id") -> DataFrame:
    """Incremental index maintenance: merge a delta postings table
    (new or RE-CRAWLED documents, built by :func:`bm25_postings` over
    the delta docs) into a stored base index. Delta wins per document —
    every base row for a doc id present in the delta is dropped, so an
    updated document's old terms disappear; merge ≡ full rebuild is the
    pytest oracle.

    Scale: the base never re-tokenizes and never shuffles on the term —
    the only wide op is the doc-id anti-join, broadcast while the
    delta's doc set is small (the common nightly-crawl shape). Persist
    the result bucketed BY TERM like the original index; pair with
    :func:`postings_stats` to refresh the stored (n_docs, total_len)
    pair that makes query cost index-size-independent."""
    upd = delta.select(id_col).distinct()
    kept = (base.join(F.broadcast(upd), id_col, "left_anti")
            .select(*base.columns))
    return kept.unionByName(delta.select(*base.columns))


def postings_stats(postings: DataFrame, *,
                   id_col: str = "doc_id") -> tuple[int, int]:
    """(n_docs, total_token_len) of a postings table — the stored
    corpus-stats pair :func:`bm25_score` accepts to skip the in-plan
    aggregate (store it next to the index at build/merge time). One
    bounded aggregate; sum(tf) IS the total token count because the
    index preserves term multiplicity."""
    r = postings.agg(
        F.countDistinct(id_col).cast("long").alias("n"),
        F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("t")).first()
    return int(r["n"]), int(r["t"])
