"""Token-budget sequence packing and per-source quota sampling.

The last mile of a training-data pipeline: after curation/dedup, documents
must be (a) rebalanced across sources, (b) shuffled deterministically, and
(c) packed into fixed-token-budget training sequences. All three are
implemented here as pure DataFrame expressions — no Python UDFs — with the
same cross-engine md5 determinism device as ``train_val_split``
(plans/training_queries.py): assignment is a function of the row's key
alone, so it is identical in any engine, on any cluster size, across runs.

Scale design (100 TB):
- Packing windows are PARTITIONED BY a bounded shard key (first hex char of
  an md5 → 16 shards here; a production run widens to substr(md5,1,3) →
  4096 shards). No global ORDER BY ever materializes on one task — each
  shard packs independently, which is exactly how a multi-worker tokenizer
  fleet consumes them. The md5 ordering WITHIN a shard doubles as the
  deterministic global shuffle a training run needs.
- Quota sampling is one window over the grouping key (source) — shuffle
  keys are |sources|, not |docs|, and the per-source rank never needs the
  document text: project keys first, join text back only for survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def det_shard(key: Column, salt: str, hex_chars: int = 1) -> Column:
    """Deterministic shard id: first `hex_chars` hex chars of
    md5(key||salt) — 16**hex_chars shards, identical in any engine."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))),
                       1, hex_chars)


def det_order(key: Column, salt: str) -> Column:
    """Deterministic pseudo-random sort key (the 'global shuffle' of a
    training run, without rand()'s partition-layout dependence)."""
    return F.md5(F.concat(key.cast("string"), F.lit(salt)))


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   key_col: str = "doc_id", shard_hex_chars: int = 1,
                   salt: str = ":pack") -> DataFrame:
    """Assign every document to a (shard, seq) training sequence.

    Streaming first-fit packing in closed form: within a shard, documents
    are laid out in deterministic-shuffle order and seq = floor(exclusive
    running token count / budget) — a document whose tokens straddle a
    boundary opens the next sequence (standard concat-then-chunk packing, à
    la GPT-style pretraining where document boundaries are soft). Every
    sequence except a shard's last therefore spans ≥budget tokens.

    Pure window function — no state, no UDF; cost is one shuffle on the
    shard key.
    """
    key = F.col(key_col)
    shard = det_shard(key, salt + ":shard", shard_hex_chars)
    order = det_order(key, salt + ":order")
    out = df.withColumn("shard", shard).withColumn("_ord", order)
    w = (Window.partitionBy("shard").orderBy("_ord", key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return (out
            .withColumn("seq", F.floor(cum_before / F.lit(budget)))
            .drop("_ord"))


def quota_sample(df: DataFrame, group_col: str, quota: int,
                 key_col: str = "doc_id",
                 salt: str = ":quota") -> DataFrame:
    """Keep at most `quota` rows per group, chosen by deterministic md5
    rank (NOT first-seen order, which would bias toward early crawl
    segments). Adds `rn` (1-based md5 rank within group) and `kept`.

    The classic per-domain cap of web-corpus curation (C4 keeps ≤
    constant pages per domain to stop boilerplate-heavy sites from
    dominating). One window over the group key; the rank is computed on
    (group, key, order) columns only — at scale, project those three,
    rank, then semi-join survivors back to the wide table.
    """
    key = F.col(key_col)
    w = (Window.partitionBy(group_col)
         .orderBy(det_order(key, salt), key_col))
    return (df.withColumn("rn", F.row_number().over(w))
            .withColumn("kept", F.col("rn") <= quota))


def mixture_sample(df: DataFrame, rates: dict[str, float],
                   group_col: str = "source", key_col: str = "doc_id",
                   default_rate: float = 1.0,
                   salt: str = ":mix") -> DataFrame:
    """Epoch-aware source mixing: sample each group at its configured
    RATE, where rates above 1 replicate (extra training epochs of that
    source) and fractional parts downsample deterministically — the
    data-mixture step of a pretraining run (e.g. wikipedia at 3.0 epochs,
    common-crawl at 0.6), which ``quota_sample``'s hard per-source cap
    cannot express.

    rate r = k + f (k = ⌊r⌋): every row emits epochs 0..k-1
    unconditionally; epoch k survives iff the first 4 hex chars of
    md5(key ‖ salt ‖ epoch) compare below the 4-hex threshold
    round(f·65536) — fixed-width lowercase-hex string comparison IS
    numeric comparison, identical in any engine (the train_val_split
    device), and keying the hash on (row, epoch) makes every epoch's
    fractional draw independent.

    Adds an ``epoch`` column (a row kept at rate 2.5 appears with epoch
    0, 1, and — for ~half of rows — 2). Scale: one generator explode
    (×⌈r⌉, narrow, no shuffle) and a per-row hash — membership is a pure
    function of (key, epoch), invariant to partitioning and cluster
    size.

    Preconditions (validated/handled here, not left to silent
    misbehavior): every rate must be ≥ 0 — a negative rate has no epoch
    semantics and would otherwise build a descending ``sequence()`` plus a
    nonsense negative threshold string; null sampling keys are coalesced
    to a sentinel so a null-keyed row still draws a deterministic
    fractional-epoch verdict instead of being dropped unconditionally
    (md5(NULL) is NULL, and NULL < thr is never true). Note the
    limitation that implies: ALL null-keyed rows share the sentinel and
    therefore share ONE draw per epoch (all kept or all dropped at the
    fractional epoch) — deterministic sampling is a function of the key,
    and null rows are indistinguishable. If per-row sampling of
    null-keyed rows matters, supply a non-null surrogate key column.
    """
    bad = {s: r for s, r in {**rates, "<default>": default_rate}.items()
           if r < 0}
    if bad:
        raise ValueError(f"mixture_sample rates must be >= 0, got {bad}")

    def _thr_hex(f: float) -> str:
        # clamp: f≈0.99999 would round to 65536 = "10000", a 5-char hex
        # that string-compares BELOW "ffff" and silently inverts the gate
        return format(min(round(f * 65536), 65535), "04x")

    k_col: Column = F.lit(int(default_rate))
    thr_col: Column = F.lit(_thr_hex(default_rate - int(default_rate)))
    for src, r in rates.items():
        k, f = int(r), r - int(r)
        cond = F.col(group_col) == src
        k_col = F.when(cond, F.lit(k)).otherwise(k_col)
        thr_col = F.when(cond, F.lit(_thr_hex(f))).otherwise(thr_col)
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))
    out = (df.withColumn("_k", k_col).withColumn("_thr", thr_col)
           .withColumn("epoch",
                       F.explode(F.sequence(F.lit(0), F.col("_k"))))
           .filter((F.col("epoch") < F.col("_k"))
                   | (F.substring(
                       F.md5(F.concat(key, F.lit(salt),
                                      F.col("epoch").cast("string"))),
                       1, 4) < F.col("_thr")))
           .drop("_k", "_thr"))
    return out


def shard_manifest(df: DataFrame, *, key_col: str = "doc_id",
                   text_col: str = "text", shard_hex_chars: int = 1,
                   salt: str = ":publish") -> DataFrame:
    """Release manifest for a shard-published corpus: per shard,
    (shard, n_docs, n_tokens, content_digest_60) — the digest is the
    bit_xor of each document's 60-bit content hash (first 15 hex chars
    of md5(text) as an integer), ORDER-INDEPENDENT by construction, so
    two publishes of the same corpus produce identical manifests no
    matter how rows were partitioned. Exact integers end to end;
    hash-matches the DuckDB oracle.

    Scale: one partial-aggregated shuffle to 16**shard_hex_chars rows;
    per-row work is two md5s fused into the scan."""
    from .text import token_count

    key = F.col(key_col)
    shard = det_shard(key, salt + ":shard", shard_hex_chars)
    h = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10) \
        .cast("long")
    return (df.select(shard.alias("shard"),
                      token_count(F.col(text_col)).alias("_nt"),
                      h.alias("_h"))
            .groupBy("shard")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("_nt").cast("long").alias("n_tokens"),
                 F.expr("bit_xor(_h)").cast("long")
                 .alias("content_digest_60"))
            .orderBy("shard"))


def write_training_shards(df: DataFrame, out_dir: str, *,
                          key_col: str = "doc_id",
                          text_col: str = "text",
                          shard_hex_chars: int = 1,
                          salt: str = ":publish") -> DataFrame:
    """Publish the curated corpus as deterministic training shards:
    every document lands in shard = first ``shard_hex_chars`` hex chars
    of md5(key||salt) (16**n shards, engine- and partitioning-
    independent — republishing an identical corpus yields identical
    shard membership), written as parquet partitioned BY SHARD so a
    training loader reads one directory per shard. Returns the
    :func:`shard_manifest` computed from the data AS WRITTEN (read
    back from ``out_dir``) — the manifest certifies the artifact on
    disk, not the plan that produced it.

    Scale: the write is one narrow pass (the shard column is a per-row
    projection; partitioned write shuffles nothing by itself); use
    ``df.repartition("shard")`` first when the target filesystem
    penalizes many small files per directory."""
    spark = df.sparkSession
    out = df.withColumn(
        "shard", det_shard(F.col(key_col), salt + ":shard",
                           shard_hex_chars))
    out.write.partitionBy("shard").mode("overwrite").parquet(out_dir)
    written = spark.read.parquet(out_dir).drop("shard")
    return shard_manifest(written, key_col=key_col, text_col=text_col,
                          shard_hex_chars=shard_hex_chars, salt=salt)


def materialize_sequences(df: DataFrame, token_col: str, budget: int,
                          *, key_col: str = "doc_id",
                          shard_hex_chars: int = 1,
                          salt: str = ":pack") -> DataFrame:
    """Assemble the actual training sequences :func:`pack_sequences`
    assigns: one row per (shard, seq) with the documents' token arrays
    concatenated IN the deterministic-shuffle order the packer laid
    them out in. Returns (shard, seq, n_docs, n_tokens, tokens) —
    what a pretraining loader consumes (soft document boundaries,
    concat-then-chunk).

    Scale: one shuffle on (shard, seq) — the reassembly groupBy, the
    bpe_encode_vocab device; each group holds ~budget tokens, so state
    per group is bounded by the budget, not the corpus."""
    key = F.col(key_col)
    packed = pack_sequences(
        df.withColumn("_n_tok", F.size(F.col(token_col))),
        "_n_tok", budget, key_col=key_col,
        shard_hex_chars=shard_hex_chars, salt=salt).drop("_n_tok")
    ordk = det_order(key, salt + ":order")
    return (packed
            .withColumn("_ord", ordk)
            .groupBy("shard", "seq")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.size(F.col(token_col))).cast("long")
                 .alias("n_tokens"),
                 F.flatten(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("_ord"), key.alias("_k"),
                                  F.col(token_col).alias("_t")))),
                     lambda x: x["_t"])).alias("tokens"))
            .orderBy("shard", "seq"))


def weighted_sample(df: DataFrame, weight_col: str, k: int, *,
                    key_col: str = "doc_id", group_col: str | None = None,
                    salt: str = ":wsample") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES reservoir (2006), the standard way to
    downsample a corpus proportionally to a quality/importance score:
    each row draws u ∈ (0, 1] from md5(key||salt) (the repo's
    deterministic-uniform device: first 15 hex chars + 1 over 2^60 —
    the numerator ranges to 2^60 so its long→double conversion ROUNDS
    above 2^53; u is bit-identical on any engine because IEEE-754
    prescribes ONE correctly-rounded result for that conversion and
    the power-of-two divide is exact, not because u is exactly
    representable) and ranks by
    ``-ln(u)/w``; the k SMALLEST keys win (equivalently the largest
    u^(1/w) — inclusion probability proportional to weight). The rank
    key is pinned HALF-UP at integer millionths before ranking (the
    doc_perplexity ln device) with ties broken on ``key_col``, so the
    selected set is engine- and partitioning-independent and
    reproducible forever from the salt.

    ``group_col`` draws k per group (per-source sampling). Adds
    ``wkey_e6``. Rows whose weight is NULL, zero or negative are
    EXCLUDED up front (A-ES is defined for w > 0; without the filter a
    w=0 row's rank key is NULL under Spark's non-ANSI division and
    NULLS FIRST ordering would hand it guaranteed selection — the
    exact inverse of zero inclusion probability). Scale: one hash +
    one ln per row fused into the scan; the only shuffle is the
    per-group top-k window (TakeOrdered when ungrouped at heart —
    row_number over the group key here)."""
    df = df.filter(F.col(weight_col) > 0)
    key = F.col(key_col)
    h = F.conv(F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15),
        16, 10).cast("long")
    u = (h + F.lit(1)) / F.lit(float(1 << 60))
    wkey = F.floor(F.lit(1e6) * (-F.log(u) / F.col(weight_col))
                   + F.lit(0.5)).cast("long")
    out = df.withColumn("wkey_e6", wkey)
    if group_col is None:
        # ungrouped: a Window with empty partitionBy would ship EVERY
        # row to one task (round-6 review) — the same selection (k
        # smallest rank keys, key_col ties) compiles to
        # TakeOrderedAndProject via orderBy+limit: per-partition top-k,
        # driver merges k·P rows, no single-partition shuffle
        return out.orderBy("wkey_e6", key_col).limit(k)
    w = Window.partitionBy(group_col).orderBy("wkey_e6", key_col)
    return (out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))
