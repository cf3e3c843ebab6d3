"""Distributed BPE tokenizer induction — the training step behind every
LLM tokenizer (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"), Spark-shaped.

Production BPE trainers (HuggingFace tokenizers, SentencePiece-BPE) train
on the WORD-FREQUENCY table, not the raw corpus — the corpus is touched
exactly once to count words. This implementation keeps that shape
distributed end to end:

1. one corpus pass: explode tokens → groupBy word → count
   (vocab-bounded shuffle, the ``vocab_top_bigrams`` shape);
2. per merge round, over the VOCAB table only: explode adjacent symbol
   pairs (weighted by word freq) → pair-count aggregate (bounded by
   |distinct pairs|, partial map-side) → driver collects ONE row (the
   argmax pair, ties lexicographic) → the merge applies map-side as a
   fold expression over each word's symbol array. ``localCheckpoint``
   per round cuts lineage exactly as kmeans_fit / label propagation do.

At 100 TB the corpus cost is the single word-count pass; every round is
vocab-table-sized, independent of corpus size — which is why this
formulation survives scale while a corpus-resident trainer cannot.

Reference parity: no analog in /root/reference (the flow pipeline has no
text tier); this extends the training-data tier next to
vocab_top_bigrams (plans/training_queries.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .lineage import cut_lineage
from .text import tokens

END = "▁"  # end-of-word sentinel (SentencePiece's block char)


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the one corpus-wide pass. Lowercased whitespace
    words; the shuffle carries one row per distinct word per partition."""
    return (df.select(F.explode(tokens(F.lower(F.col(text_col))))
                      .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _initial_symbols(word: Column) -> Column:
    """Character symbols + end-of-word sentinel on the last one (the
    classic BPE alphabet: 'low' -> [l, o, w▁])."""
    chars = F.split(word, "")
    n = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == n - 1, F.concat(c, F.lit(END)))
        .otherwise(c))


def _adjacent_pairs(symbols: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs."""
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(symbols, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))


def _apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Replace every adjacent (a, b) with a+b — a left fold with a
    one-symbol lookbehind ('pending') accumulator, pure expressions.
    Consecutive runs merge left-to-right ((a,a,a) -> (aa, a) for a==b),
    matching the reference Python BPE's scan order."""
    merged = F.lit(a + b)
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"))

    def step(acc, s):
        out, pend = acc["out"], acc["pend"]
        take = pend.isNotNull() & (pend == a) & (s == b)
        return F.when(take,
                      F.struct(F.concat(out, F.array(merged)).alias("out"),
                               F.lit(None).cast("string").alias("pend"))) \
            .otherwise(F.struct(
                F.when(pend.isNotNull(), F.concat(out, F.array(pend)))
                .otherwise(out).alias("out"),
                s.alias("pend")))

    def finish(acc):
        return F.when(acc["pend"].isNotNull(),
                      F.concat(acc["out"], F.array(acc["pend"]))) \
            .otherwise(acc["out"])

    return F.aggregate(symbols, acc0, step, finish)


# Per-round pair-table collect bound for bpe_train's merge batching:
# 4096 tiny (a, b, n) rows — a few hundred KB on the driver. When the
# distinct-pair table fits under it, the batcher sees the COMPLETE
# counts and can prove several sequential argmaxes from one collect;
# when it doesn't (web-scale symbol inventories), the unseen-tail
# bounds make acceptance maximally conservative and behavior degrades
# gracefully to the classic one-merge-per-job loop.
_PAIR_COLLECT_LIMIT = 4096


def _accept_merge_batch(rows: list, k_limit: int,
                        max_accept: int) -> list[tuple[str, str]]:
    """The maximal PREFIX of merges provably equal to running the
    argmax-recount loop one merge at a time, decided from ONE collected
    pair table (round-11, VERDICT r10 item #3's merge batching).

    ``rows``: (a, b, n) tuples sorted by (n DESC, a ASC, b ASC) — the
    trainer's exact tie order — possibly truncated at ``k_limit``.

    Soundness argument (each accepted merge is the argmax of its
    sequential round):
    - merging (a, b) only changes counts of pairs TOUCHING a or b, and
      creates pairs involving the new symbol a+b. A candidate disjoint
      from every accepted merge's {a, b, a+b} keeps its exact count.
    - changed pairs only DECREASE (bounded by their old count); created
      pairs (x, a+b) / (a+b, y) are bounded by their parent's old count
      (every occurrence was x,a,b / a,b,y) PLUS, iff the concatenation
      a+b collides with a pre-existing symbol string, that symbol's own
      old pair count — hence the 2x slack when a collision is possible.
    - so a candidate with count STRICTLY above every old count of every
      pair touching the accepted set (tail-bounded when the table is
      truncated; doubled under possible concat collision) must still be
      the global argmax after those merges apply; ties are impossible
      under the strict inequality, so the lexicographic tie-break never
      has to be replicated. The first candidate that cannot be proven
      stops the batch (later rows are smaller and fail a fortiori).

    Equality with the one-merge-at-a-time loop is pytest-fuzzed against
    py_bpe_reference (test_training_ops.py)."""
    complete = len(rows) < k_limit
    tail = 0 if complete else rows[-1][2]
    a0, b0, n0 = rows[0]
    accepted = [(a0, b0)]
    blocked = {a0, b0, a0 + b0}
    for a, b, n in rows[1:]:
        if len(accepted) >= max_accept or n <= 0:
            break
        if a in blocked or b in blocked:
            continue
        acc_set = set(accepted)
        m = tail
        for qa, qb, qn in rows:
            if (qa, qb) in acc_set:
                continue        # accepted merges vanish when applied
            if qa in blocked or qb in blocked:
                m = max(m, qn)
        collide = (not complete) or any(
            qa == xa + xb or qb == xa + xb
            for xa, xb in accepted for qa, qb, _qn in rows)
        if n > (2 * m if collide else m):
            accepted.append((a, b))
            blocked |= {a, b, a + b}
        else:
            break
    return accepted


def bpe_train(df: DataFrame, n_merges: int = 10,
              text_col: str = "text",
              min_freq: int = 1) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a document corpus. Returns the
    ordered merge list [(a, b), ...] — the tokenizer model artifact.

    Determinism: the argmax pair breaks count ties lexicographically on
    (a, b), so the learned merges are identical on any engine, cluster
    size, or partitioning (pytest-asserted equal to an independent
    single-process reference implementation on the same word counts).

    ``min_freq`` is the production knob for web-scale vocabularies: a
    crawl's word table is vocab-bounded but heavy-tailed (typos, ids,
    URLs — hundreds of millions of singletons), and every merge round
    touches the whole table. Pruning words below ``min_freq`` (every
    real trainer does this; HF tokenizers' ``min_frequency``) shrinks
    the per-round table by the tail's share while barely moving the
    pair counts the argmax reads — singletons contribute ≤ min_freq-1
    to any pair.
    """
    # lazy checkpoints (round-10): each round's ONLY action is the
    # argmax collect — an eager checkpoint added a second full job per
    # round just to materialize the merged vocab that the next round's
    # collect would have materialized anyway. eager=False keeps the
    # lineage cut (the checkpoint RDD persists when the next round's
    # pair-count computes it) at half the jobs, and the LAST round's
    # vocab — which nothing reads — never materializes at all.
    vocab = cut_lineage(
        word_freq_table(df, text_col)
        .filter(F.col("freq") >= min_freq)
        .select("word", "freq",
                _initial_symbols(F.col("word")).alias("symbols")))
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        # one bounded collect per ROUND (round-11): the top
        # _PAIR_COLLECT_LIMIT pairs instead of only the argmax row —
        # _accept_merge_batch proves as many sequential argmaxes as the
        # table supports from this single job (3 jobs for the sf0.1
        # 8-merge config), and all of a batch's merges apply as ONE
        # chained map-side rewrite. Merge list is bit-identical to the
        # one-at-a-time loop (soundness note on _accept_merge_batch;
        # fuzz-pinned against py_bpe_reference).
        rows = (vocab.select("freq",
                             F.explode(_adjacent_pairs(F.col("symbols")))
                             .alias("p"))
                .groupBy("p.a", "p.b").agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(_PAIR_COLLECT_LIMIT).collect())
        if not rows or rows[0]["n"] <= 0:
            break
        batch = _accept_merge_batch(
            [(r["a"], r["b"], r["n"]) for r in rows],
            _PAIR_COLLECT_LIMIT, n_merges - len(merges))
        col = F.col("symbols")
        for a, b in batch:
            merges.append((a, b))
            col = _apply_merge(col, a, b)
        vocab = cut_lineage(vocab.withColumn("symbols", col))
    return merges


def bpe_symbol_stats(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text") -> DataFrame:
    """Corpus symbol statistics under a trained merge list: (symbol,
    freq), the learned subword vocabulary with usage counts — what a
    tokenizer build publishes alongside the merges."""
    vocab = word_freq_table(df, text_col).select(
        "word", "freq", _initial_symbols(F.col("word")).alias("symbols"))
    col = F.col("symbols")
    for a, b in merges:
        col = _apply_merge(col, a, b)
    return (vocab.select("freq", F.explode(col).alias("symbol"))
            .groupBy("symbol").agg(F.sum("freq").alias("freq")))


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Encode documents under a trained merge list (ordered application
    per word, the standard BPE encoder). An Arrow-batched pandas UDF on
    purpose: encoding applies |merges| sequential rewrites per word —
    expression-folding each one would build an O(|merges|)-deep plan —
    and this is exactly the swap point where a real tokenizer
    (HuggingFace/SentencePiece, weights loaded once per worker) slots in,
    the ``hashed_tf_embed`` pattern. Parity with the trainer's fold
    semantics is pytest-asserted against the same reference encoder."""
    from .text import ascii_words

    merge_list = list(merges)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        def word_syms(w):
            syms = list(w[:-1]) + [w[-1] + END] if w else []
            for a, b in merge_list:
                syms = _py_apply_merge(syms, a, b)
            return syms

        # ascii_words, NOT str.split(): the trainer tokenizes with the
        # JVM ASCII \s+ — a Unicode-whitespace split here would segment
        # words the trainer never saw (parity pinned in tests)
        return s.map(lambda t: [sym for w in ascii_words((t or "").lower())
                                for sym in word_syms(w)])

    return df.withColumn(out_col, _enc(F.col(text_col)))


def _assemble_per_doc(df: DataFrame, words: DataFrame, vocab: DataFrame,
                      toks, *, id_col: str, out_col: str,
                      keep_input_cols: bool) -> DataFrame:
    """Shared reassembly for the vocab-table encoders: broadcast the
    word→pieces map onto the exploded corpus tokens, regroup per doc.

    ``keep_input_cols=True`` (the general contract) re-attaches every
    input column via a left join back to ``df`` — a corpus×corpus
    id-keyed join (one extra exchange + two sorts at scale) that exists
    ONLY to carry input columns and give wordless docs an empty array.
    ``keep_input_cols=False`` (round-11) returns just (id, out_col)
    WITHOUT the join: the per-doc groupBy already yields one row per
    word-bearing doc, and wordless docs (empty/whitespace/NULL text —
    plus NULL ids, which the join form's null-never-matches semantics
    sent to the empty side too) come from a narrow no-shuffle scan
    unioned in. Row-set identical to the join form projected to
    (id, out_col); pinned by tests. Every production caller selects
    exactly those columns — guide §2.4 (remove shuffles outright) /
    §8 (don't re-attach via a join what a union can carry)."""
    per_doc_src = words if keep_input_cols \
        else words.filter(F.col(id_col).isNotNull())
    per_doc = (per_doc_src.join(F.broadcast(vocab), "_word")
               .groupBy(id_col)
               .agg(F.flatten(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("_pos"), F.col("_syms")))),
                   lambda x: x["_syms"])).alias(out_col)))
    empty = F.array().cast("array<string>")
    if keep_input_cols:
        return (df.join(per_doc, id_col, "left")
                .withColumn(out_col,
                            F.coalesce(F.col(out_col), empty)))
    has_word = F.coalesce(F.exists(toks, lambda w: w != F.lit("")),
                          F.lit(False))
    empties = (df.filter(F.col(id_col).isNull() | ~has_word)
               .select(F.col(id_col), empty.alias(out_col)))
    return per_doc.unionByName(empties)


def bpe_encode_vocab(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id",
                     out_col: str = "bpe_tokens", *,
                     keep_input_cols: bool = True) -> DataFrame:
    """Vocab-table encoder — the SCALE form of :func:`bpe_encode`
    (pytest-asserted equal): every production tokenizer encodes each
    DISTINCT word once, not each occurrence. Corpus tokens never touch
    Python:

    1. one narrow pass explodes (id, pos, word) rows (JVM tokenize);
    2. the DISTINCT-word table — the same vocab-bounded frame
       ``bpe_train`` iterates on — encodes once per word through the
       Python kernel (|vocab| invocations total, regardless of corpus
       size; the real-tokenizer swap point, now off the hot path);
    3. the word→subwords map broadcast-joins back to the corpus tokens
       and per-doc arrays reassemble via sort-by-position + flatten.

    Cost shape at 100 TB: the corpus pays one explode + one broadcast
    hash join + one per-doc groupBy (the only shuffle, keyed on
    ``id_col`` — which must be unique per row); Python work is
    O(|vocab|·|merges|), corpus-size-independent. Empty/whitespace-only
    documents get an empty array. ``keep_input_cols=False`` returns
    only (id, out_col) and skips the input-column join-back entirely
    (:func:`_assemble_per_doc`) — the form every production caller
    wants."""
    toks = tokens(F.lower(F.col(text_col)))
    words = (df.select(F.col(id_col),
                       F.posexplode(toks).alias("_pos", "_word"))
             .filter(F.col("_word") != ""))

    merge_list = list(merges)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _enc_word(s: pd.Series) -> pd.Series:
        def word_syms(w):
            syms = list(w[:-1]) + [w[-1] + END] if w else []
            for a, b in merge_list:
                syms = _py_apply_merge(syms, a, b)
            return syms
        return s.map(word_syms)

    vocab = (words.select(F.col("_word")).distinct()
             .withColumn("_syms", _enc_word(F.col("_word"))))
    return _assemble_per_doc(df, words, vocab, toks, id_col=id_col,
                             out_col=out_col,
                             keep_input_cols=keep_input_cols)


# --- Unigram LM tokenizer (SentencePiece, Kudo 2018) -----------------------
#
# The OTHER production tokenizer family: instead of learning merges
# bottom-up, start from a large substring seed vocabulary and iterate
# EM, keeping the pieces the corpus actually uses. This implementation
# is the hard-EM (Viterbi) variant: the E-step assigns each word its
# single best segmentation under the current piece counts, the M-step
# re-counts pieces; pruning drops the least-used multi-character pieces
# each round (real SentencePiece uses soft EM with forward-backward
# expected counts and a loss-based prune — the deviation is deliberate
# and documented here; hard EM keeps every comparison EXACT, see below).
#
# Determinism: Viterbi never touches floats. A segmentation's
# probability is prod(count_p) / total^n, so two candidates compare
# exactly by big-integer cross-multiplication
# (p1·total^n2 <=> p2·total^n1); ties break on fewer pieces, then the
# lexicographically smaller piece tuple. The learned model is identical
# on any engine, cluster size, or partitioning — pytest-asserted equal
# to an independent Fraction-arithmetic reference implementation.
#
# Scale shape (mirrors bpe_train): one corpus pass builds the
# word-frequency table; every EM round touches only that vocab-bounded
# table (the Python Viterbi kernel runs once per DISTINCT word), and the
# per-round piece-count aggregate collects the MODEL (|pieces| rows, the
# kmeans-centroid pattern) — never corpus rows.


def substring_seed_table(df: DataFrame, max_piece_len: int = 6,
                         text_col: str = "text", *,
                         word_table: DataFrame | None = None) -> DataFrame:
    """(piece, freq) — every substring of length 1..max_piece_len of
    every word, weighted by word frequency (occurrence-counted: 'aaa'
    contributes 'aa' twice). Pure JVM expressions over the word table;
    the shuffle is bounded by |distinct substrings|. Pass an already-
    built/checkpointed ``word_table`` (word, freq) to skip the corpus
    pass — unigram_train does, so train start pays ONE tokenize scan."""
    wf = (word_table if word_table is not None
          else word_freq_table(df, text_col))
    w, n = F.col("word"), F.length("word")
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)),
            lambda l: w.substr(i, l))))
    return (wf.select(F.col("freq"), F.explode(subs).alias("piece"))
            .groupBy("piece").agg(F.sum("freq").alias("freq")))


def _viterbi_factory(counts: dict[str, int], max_piece_len: int,
                     scoring: str = "exact",
                     max_word_len: int | None = None):
    """Shared exact-arithmetic Viterbi segmenter. Score of a prefix
    state: (n_unknown, prob_score, n_pieces, pieces) — fewer unknown
    single-char fallbacks always wins, then the probability score, then
    fewer pieces, then the lexicographically smaller tuple. Unknown
    characters (never seen in training) emit themselves as OOV pieces.
    The per-state order is extension-stable (additive/multiplicative
    components; the piece tuple compares at an index unchanged by
    appending a common suffix), so the DP's best-per-position equals
    the global argmin over ALL segmentations — the property the
    enumeration-based DuckDB oracle relies on.

    ``scoring`` picks the probability arithmetic:

    - ``"exact"`` (default): exact big-int cross-multiply —
      p1·total^n2 vs p2·total^n1 over the raw count products. Identical
      on any engine but NOT expressible in fixed-width SQL (hundreds of
      bits; DuckDB tops out at HUGEINT), so exact-mode queries stay
      pytest-verified against the Fraction reference.
    - ``"qexp"`` (round-10; VERDICT r9 item #3): quantized-exponent
      scoring — each count contributes floor(2·log2 c) computed EXACTLY
      as (c·c).bit_length()−1, the segmentation scores
      Σ_i e(c_i) − n·E with E = floor(2·log2 total). All small-integer
      arithmetic, reproducible bit-for-bit in ANY engine (DuckDB:
      length(bin(c*c))−1) — the oracle-able mode. Quantization step is
      √2 (counts within 1.41× tie and fall to the structural
      tie-breaks), the impact-quantization idea from search engines
      applied to the segmenter. Valid while c·c and total·total fit
      the engine's widest integer (DuckDB HUGEINT: c < 2^63 — loud
      overflow, never silent).

    ``max_word_len``: words longer than this emit themselves whole as a
    single OOV piece instead of segmenting — WordPiece's
    max_input_chars_per_word device (HF BERT default 100 → [UNK]): at
    crawl scale unbounded tokens (URLs, base64 blobs) would otherwise
    dominate segmentation cost, and the oracle's mask enumeration needs
    a hard length bound. ``None`` (default) never truncates."""
    total = sum(counts.values()) or 1

    if scoring == "qexp":
        big_e = (total * total).bit_length() - 1

        def extend(state, piece, c):
            u0, s0, n0, t0 = state
            if c > 0:
                e = (c * c).bit_length() - 1
                return (u0, s0 + e - big_e, n0 + 1, t0 + (piece,))
            return (u0 + 1, s0 - big_e, n0 + 1, t0 + (piece,))

        def better(s1, s2):
            u1, p1, n1, t1 = s1
            u2, p2, n2, t2 = s2
            if u1 != u2:
                return u1 < u2
            if p1 != p2:
                return p1 > p2
            if n1 != n2:
                return n1 < n2
            return t1 < t2

        init = (0, 0, 0, ())
    elif scoring == "exact":
        def extend(state, piece, c):
            u0, p0, n0, t0 = state
            if c > 0:
                return (u0, p0 * c, n0 + 1, t0 + (piece,))
            return (u0 + 1, p0, n0 + 1, t0 + (piece,))

        def better(s1, s2):
            u1, p1, n1, t1 = s1
            u2, p2, n2, t2 = s2
            if u1 != u2:
                return u1 < u2
            lhs, rhs = p1 * total ** n2, p2 * total ** n1
            if lhs != rhs:
                return lhs > rhs
            if n1 != n2:
                return n1 < n2
            return t1 < t2

        init = (0, 1, 0, ())
    else:
        raise ValueError(f"unknown scoring {scoring!r}")

    def segment(word: str) -> list[str]:
        if not word:
            return []
        if max_word_len is not None and len(word) > max_word_len:
            return [word]
        best: list = [None] * (len(word) + 1)
        best[0] = init
        for j in range(1, len(word) + 1):
            for i in range(max(0, j - max_piece_len), j):
                if best[i] is None:
                    continue
                piece = word[i:j]
                c = counts.get(piece, 0)
                if c <= 0 and j - i > 1:
                    continue
                # unknown single char: OOV fallback, counted in the
                # unknown dimension so known pieces always dominate
                cand = extend(best[i], piece, c)
                if best[j] is None or better(cand, best[j]):
                    best[j] = cand
        return list(best[len(word)][3])

    return segment


def _segment_word_udf(counts: dict[str, int], max_piece_len: int,
                      scoring: str = "exact",
                      max_word_len: int | None = None):
    segment = _viterbi_factory(counts, max_piece_len, scoring,
                               max_word_len)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _seg(s: pd.Series) -> pd.Series:
        return s.map(segment)

    return _seg


def unigram_train(df: DataFrame, *, n_iters: int = 3,
                  vocab_size: int | None = None,
                  max_piece_len: int = 6, seed_size: int = 2000,
                  prune_frac: float = 0.2,
                  scoring: str = "exact",
                  max_word_len: int | None = None,
                  text_col: str = "text") -> dict[str, int]:
    """Learn a unigram-LM piece vocabulary from a document corpus.
    Returns {piece: count} — the tokenizer model artifact (hard-EM
    counts; piece probability = count/total).

    Seed = top ``seed_size`` substrings by (freq desc, piece asc) PLUS
    every single character (coverage: any training word stays
    segmentable; single chars are never pruned). Each round: Viterbi-
    segment every distinct word (exact integer scoring — see module
    notes), re-count pieces weighted by word freq, drop zero-count
    multi-char pieces, then prune the bottom ``prune_frac`` of
    multi-char pieces by (count asc, piece asc), not below
    ``vocab_size``."""
    # lazy: the seed-table collect below is the first action and
    # materializes the checkpoint; the EM rounds then reuse it
    wf = cut_lineage(word_freq_table(df, text_col))
    seed = substring_seed_table(df, max_piece_len, text_col,
                                word_table=wf)
    chars = seed.filter(F.length("piece") == 1)
    top = (seed.filter(F.length("piece") > 1)
           .orderBy(F.desc("freq"), F.asc("piece")).limit(seed_size))
    counts = {r["piece"]: r["freq"]
              for r in chars.unionByName(top).collect()}
    char_set = {p for p in counts if len(p) == 1}

    for _ in range(n_iters):
        seg = _segment_word_udf(counts, max_piece_len, scoring,
                                max_word_len)
        new = (wf.select("freq", F.explode(seg(F.col("word")))
                         .alias("piece"))
               .groupBy("piece").agg(F.sum("freq").alias("freq"))
               .collect())
        counts = {r["piece"]: r["freq"] for r in new}
        # coverage floor: a char squeezed out by larger pieces this
        # round must stay segment-able next round / at encode time
        for ch in char_set:
            counts.setdefault(ch, 1)
        multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                       key=lambda kv: (kv[1], kv[0]))
        floor = vocab_size if vocab_size is not None else 0
        n_prunable = max(0, len(counts) - max(floor, 0))
        n_drop = min(int(len(multi) * prune_frac), n_prunable, len(multi))
        for p, _c in multi[:n_drop]:
            del counts[p]
    return counts


def unigram_encode_vocab(df: DataFrame, model: dict[str, int],
                         *, max_piece_len: int = 6,
                         scoring: str = "exact",
                         max_word_len: int | None = None,
                         text_col: str = "text", id_col: str = "doc_id",
                         out_col: str = "pieces",
                         keep_input_cols: bool = True) -> DataFrame:
    """Encode documents under a trained unigram model — the vocab-table
    scale form (the :func:`bpe_encode_vocab` shape): each DISTINCT word
    Viterbi-segments once through the Python kernel (|vocab| calls,
    corpus-size-independent), the word→pieces map broadcast-joins back
    to the JVM-exploded corpus tokens, per-doc arrays reassemble by
    position. Corpus tokens never touch Python; ``id_col`` must be
    unique per row."""
    toks = tokens(F.lower(F.col(text_col)))
    words = (df.select(F.col(id_col),
                       F.posexplode(toks).alias("_pos", "_word"))
             .filter(F.col("_word") != ""))
    seg = _segment_word_udf(model, max_piece_len, scoring, max_word_len)
    vocab = (words.select("_word").distinct()
             .withColumn("_syms", seg(F.col("_word"))))
    return _assemble_per_doc(df, words, vocab, toks, id_col=id_col,
                             out_col=out_col,
                             keep_input_cols=keep_input_cols)


def py_unigram_reference(word_freqs: dict[str, int], *, n_iters: int = 3,
                         vocab_size: int | None = None,
                         max_piece_len: int = 6, seed_size: int = 2000,
                         prune_frac: float = 0.2) -> dict[str, int]:
    """Independent single-process reference for :func:`unigram_train`
    — the pytest oracle. Same seed, tie, coverage, and prune rules, but
    the Viterbi uses ``fractions.Fraction`` probabilities (a different
    arithmetic path than the trainer's big-int cross-multiply) so
    agreement checks the algorithm, not a shared kernel."""
    from fractions import Fraction

    seed: dict[str, int] = {}
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i:i + l]] = seed.get(w[i:i + l], 0) + f
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in seed.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    counts = dict(chars) | dict(multi)
    char_set = set(chars)

    def segment(word: str, cnt: dict[str, int]) -> list[str]:
        total = sum(cnt.values()) or 1
        best: list = [None] * (len(word) + 1)
        # state: (n_unknown, Fraction prob, n_pieces, tuple)
        best[0] = (0, Fraction(1), 0, ())
        for j in range(1, len(word) + 1):
            for i in range(max(0, j - max_piece_len), j):
                if best[i] is None:
                    continue
                piece = word[i:j]
                c = cnt.get(piece, 0)
                u0, p0, n0, t0 = best[i]
                if c > 0:
                    cand = (u0, p0 * Fraction(c, total), n0 + 1,
                            t0 + (piece,))
                elif j - i == 1:
                    cand = (u0 + 1, p0, n0 + 1, t0 + (piece,))
                else:
                    continue
                cur = best[j]
                if cur is None or (cand[0], -cand[1], cand[2], cand[3]) < \
                        (cur[0], -cur[1], cur[2], cur[3]):
                    best[j] = cand
        return list(best[len(word)][3])

    for _ in range(n_iters):
        new: dict[str, int] = {}
        for w, f in word_freqs.items():
            if not w:
                continue
            for p in segment(w, counts):
                new[p] = new.get(p, 0) + f
        counts = new
        for ch in char_set:
            counts.setdefault(ch, 1)
        multi_l = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                         key=lambda kv: (kv[1], kv[0]))
        floor = vocab_size if vocab_size is not None else 0
        n_prunable = max(0, len(counts) - max(floor, 0))
        n_drop = min(int(len(multi_l) * prune_frac), n_prunable,
                     len(multi_l))
        for p, _c in multi_l[:n_drop]:
            del counts[p]
    return counts


def _py_apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Single-process reference of :func:`_apply_merge` — same
    left-to-right scan, same run semantics. Shared by bpe_encode and the
    parity tests."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def py_bpe_reference(word_freqs: dict[str, int],
                     n_merges: int) -> list[tuple[str, str]]:
    """Independent single-process BPE trainer over a word-frequency dict
    (the textbook algorithm) — the pytest oracle for :func:`bpe_train`.
    Same tie rule: max count, then lexicographic (a, b)."""
    vocab = {w: list(w[:-1]) + [w[-1] + END] for w in word_freqs if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                # count OCCURRENCES, overlapping runs included — matches
                # the distributed pair explode, which emits every
                # adjacent position
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        vocab = {w: _py_apply_merge(s, *pair) for w, s in vocab.items()}
    return merges
