"""Text-analysis operators for the training-data pipeline tier.

All hot-path logic is native ``pyspark.sql.functions`` (JVM, codegen) —
no Python UDFs, with ONE deliberate exception: the zlib
compression-ratio signal (stdlib C, Arrow-batched; no JVM-expression
equivalent exists). Where cross-engine (DuckDB-oracle) determinism is
needed, hashes are md5-hex (identical lowercase hex in Spark and DuckDB)
rather than engine-specific hash functions.

Operators: tokenization/counting, quality scoring, n-gram language ID,
document fingerprinting, shingling (shared with dedup).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker substrings per language for the n-gram language-ID heuristic.
# Counting marker *occurrences* in the lowercased text; argmax wins, 'en'
# on ties (deterministic order). Markers are function words — the standard
# trigram/stopword profile approach compressed to a portable expression.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " a "],
    "es": [" el ", " la ", " de ", " y "],
    "de": [" der ", " und ", " die ", " das "],
    "zh": ["的", "是", "在", "了"],
}

# NOTE: consumers build TWO devices from this list that must stay
# equivalent — token EQUALITY (isin / DuckDB `IN`, the oracle form) and a
# whitespace-anchored regex ALTERNATION (classifier_features_e4's codegen
# form). The equivalence holds because each entry, re.escape'd, matches
# exactly itself and nothing else between whitespace; an entry containing
# regex metacharacters or one that is a strict prefix of another stays
# safe ONLY because the alternation is escaped and anchored on both sides.
STOPWORDS = ["the", "a", "an", "of", "and", "in", "to", "is"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization. ≡ DuckDB string_split_regex(trim(x),'\\s+').

    KNOWN QUIRK, mirrored bit-for-bit in every DuckDB oracle (the _TOKS
    device): ``trim`` strips SPACES only, so text with leading/trailing
    NON-space whitespace (a final '\\n' is the common case) keeps one
    phantom ``''`` token, and empty text tokenizes to ``['']`` — counts
    derived from this are consistently off-by-one on such text in BOTH
    engines. Consumers that must exclude empties filter explicitly
    (``bm25_postings``, ``positional_postings``, ``stopword_ratio`` via
    isin, ``hashed_tf_embed_native``); :func:`ascii_words` (the Python
    kernel mirror) drops empties and therefore matches the FILTERED
    consumers, not raw ``size(tokens(x))``. Normalizing with
    :func:`normalize_text`/:func:`clean_unicode` first removes the
    phantom entirely."""
    return F.split(F.trim(text), r"\s+")


import re as _re_mod  # noqa: E402  (module-level: shared by kernels below)

_WS_ASCII = _re_mod.compile(r"\s+", _re_mod.ASCII)


def ascii_words(text: str) -> list[str]:
    """Python-side mirror of :func:`tokens` for Arrow kernels: Java regex
    ``\\s`` is ASCII-only ([ \\t\\n\\x0B\\f\\r]) while Python's default
    ``str.split()`` splits on UNICODE whitespace (NBSP, ideographic
    space, ...), which silently diverges from every JVM/DuckDB tokenizer
    in this repo on real web text. ``re.ASCII`` pins the same class;
    empty tokens are dropped, matching the JVM side's
    ``filter(t != '')`` / trim behavior. Every pandas kernel that
    tokenizes (hashed_tf_embed, bpe_encode) MUST use this, never
    ``str.split()``."""
    return [w for w in _WS_ASCII.split(text) if w]


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word pieces of ≤4 chars — a BPE-like
    upper bound computed as ceil(len/4) summed over words, pure expressions."""
    return F.aggregate(
        tokens(text), F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int"))


def occurrence_count(text: Column, marker: str) -> Column:
    """# of NON-OVERLAPPING occurrences of ``marker`` — portable
    replace-and-measure: (len(x) - len(replace(x, m, ''))) / len(m).
    ADJACENT repetitions of a space-padded marker count once per
    non-overlapping match (' the the ' counts 1 for ' the ': the first
    replace consumes the shared middle space) — RE2 (the DuckDB oracle
    engine) has no lookaround, so this replace device is the portable
    form and the oracle mirrors the same undercount exactly. Fine for
    the lang-ID argmax it feeds (relative scores); the classifier's
    stopword feature uses lookaround anchors on the Spark side with a
    token-equality oracle instead."""
    pad = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return ((F.length(pad) - F.length(F.replace(pad, F.lit(marker), F.lit(""))))
            / len(marker)).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            c = occurrence_count(text, m)
            s = c if s is None else s + c
        out[lang] = s
    return out


def predict_lang(text: Column) -> Column:
    """argmax over lang scores, ties broken by LANG_MARKERS order.

    Portable, oracle-checkable STAND-IN for a real language classifier —
    a 4-language marker-count heuristic will misclassify heavily on wild
    text. Swap point: a fastText-class model (e.g. lid.176) replaces
    exactly this function with one Arrow-batched pandas UDF
    ``text → lang`` (the :func:`~..operators.similarity.hashed_tf_embed`
    pattern — model weights load once per worker, batches stream
    through); every consumer (``lang_id``, ``stratified_sample``, the QC
    stream) keeps the same column contract and plan shape."""
    scores = lang_scores(text)
    langs = list(scores)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither letters, digits nor
    whitespace. Unicode classes (``\\p{L}\\p{N}`` — round-6 review: the
    old ASCII ``[A-Za-z0-9]`` scored every CJK/Cyrillic/accented letter
    as punctuation, so non-Latin documents got punct_ratio ≈ 1 and the
    quality gates rejected them wholesale). Java regex and DuckDB's RE2
    agree on these classes for the corpus's characters; the oracle
    mirrors the identical class."""
    n_punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    return F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 4)


def digit_ratio(text: Column) -> Column:
    n_dig = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return F.round(n_dig / F.greatest(F.length(text), F.lit(1)), 4)


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(
        toks, lambda t: F.lower(t).isin(STOPWORDS)))
    return F.round(n_stop / F.greatest(F.size(toks), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: long enough, low punctuation noise, sane
    stopword density (natural language has some), moderate token length.
    Deterministic, portable to SQL (mirrored in plans.queries)."""
    n_tok = token_count(text)
    len_ok = F.least(n_tok / 50.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5)
    stop_ok = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return F.round((len_ok * 0.5 + punct_pen * 0.3 + stop_ok * 0.2), 4)


def normalize_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace,
    trim. Collapse runs BEFORE trim (round-6 review): Spark's trim()
    strips SPACES only, so the old trim-first order left a trailing
    '\\n' as a trailing ' ' — two copies of a page differing only by a
    final newline digested differently and escaped exact/incremental/
    Bloom dedup. Every DuckDB oracle and the Bloom probe kernel mirror
    this exact operation order (trim(regexp_replace(lower(x)))), so
    cross-engine digests stay bit-identical."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def scrub_controls(text: Column) -> Column:
    """JVM-side unicode hygiene (one codegen'd regexp pass, zero UDF):
    drop C0/C1 control characters — KEEPING the line-structure trio
    \\n, \\r and \\t (CR survives standalone use deliberately; inside
    :func:`clean_unicode` the trailing whitespace collapse absorbs
    it) — plus zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) and soft
    hyphens; map NBSP and ideographic space to a plain space. The
    mojibake half of crawl cleanup that needs no normalization tables —
    compose with :func:`nfkc_normalize` for the full gate
    (:func:`clean_unicode`)."""
    out = F.regexp_replace(
        text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F"
              "\\u200B-\\u200D\\uFEFF\\u00AD]", "")
    return F.regexp_replace(out, "[\\u00A0\\u3000]", " ")


def nfkc_normalize(text: Column) -> Column:
    """NFKC unicode normalization (fullwidth → ASCII, ligatures split,
    compatibility forms folded — the core of what ftfy/crawl cleanup
    does after encoding repair). The JVM exposes no normalization
    expression, so this is a DELIBERATE Arrow-batched Python edge (the
    zlib-ratio precedent): stdlib ``unicodedata.normalize`` over the
    batch, one C call per row, no tokenization, no per-row JVM
    round-trip. NULLs pass through."""
    @F.pandas_udf("string")
    def _nfkc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda v: v if v is None
                     else unicodedata.normalize("NFKC", v))
    return _nfkc(text)


def clean_unicode(text: Column) -> Column:
    """The crawl-text cleanup gate: :func:`nfkc_normalize` (Arrow edge)
    FIRST, then :func:`scrub_controls` (JVM), then whitespace collapse.
    Scrub runs after NFKC deliberately: NFKC itself mints scrub targets
    (U+2007 figure space normalizes to NBSP) while producing none of
    its own inputs' classes back — the reverse order would leak them.
    Run BEFORE tokenization/dedup so canonical forms agree across
    differently-encoded copies of the same page."""
    return F.trim(F.regexp_replace(
        scrub_controls(nfkc_normalize(text)), r"\s+", " "))


def fingerprint(text: Column, n_tokens: int = 8) -> Column:
    """Document fingerprint: md5 of the first-n-token normalized prefix —
    a locality-insensitive prefix hash (cheap near-head-dup detector)."""
    toks = tokens(normalize_text(text))
    return F.md5(F.concat_ws(" ", F.slice(toks, 1, n_tokens)))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingle array (dedup primitive). Empty array for docs
    shorter than k tokens — which means SUB-k-TOKEN DOCS ARE INVISIBLE
    to every shingle-based near-dup path (MinHash signatures, the band
    table, LSH candidates, n-gram Jaccard): they emit no rows into the
    artifact and can never appear in a candidate pair. Deliberate (a
    2-token doc has no k=3 similarity structure); cover short docs with
    exact/line dedup, which key on the full normalized content.

    Built by zip_with-ing the token array against its own shifted slices
    (k-1 zips), NOT by indexing ``element_at(toks, i)`` inside a
    ``transform`` lambda: expressions referenced inside a lambda body are
    re-evaluated per element, so the indexed form re-runs the whole
    normalize+split chain 3× per shingle (~30× slower per row at k=3,
    doc≈50 tokens)."""
    toks = tokens(normalize_text(text))
    n = F.size(toks)
    arr = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        # tail entries beyond n-(k-1) lose their right-hand part (concat_ws
        # skips the null pad) but the final slice cuts them off
        arr = F.zip_with(arr, shifted,
                         lambda a, b: F.concat_ws(" ", a, b))
    return F.when(n >= k, F.slice(arr, 1, n - (k - 1))) \
        .otherwise(F.array().cast("array<string>"))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full per-document QC profile — one pass, all JVM expressions."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars_calc"),
        token_count(t).alias("n_tokens"),
        F.round(F.aggregate(tokens(t), F.lit(0),
                            lambda a, x: a + F.length(x)).cast("double")
                / F.greatest(token_count(t), F.lit(1)), 4).alias("avg_token_len"),
        punct_ratio(t).alias("punct_ratio"),
        digit_ratio(t).alias("digit_ratio"),
        stopword_ratio(t).alias("stop_ratio"),
        quality_score(t).alias("quality"),
        predict_lang(t).alias("pred_lang"),
        fingerprint(t).alias("fp"),
    )


# --- PII detection / redaction ----------------------------------------------
# Every production curation stack (C4, RefinedWeb, Dolma) scrubs PII before
# training. Patterns are deliberately restricted to the regex subset with
# IDENTICAL semantics in Java regex (Spark, codegen'd JVM-side) and RE2
# (DuckDB oracle): character classes, bounded repetition, alternation — no
# backreferences, no lookaround. Order matters: email before ip (an email's
# host part may contain dotted digits), phone last (digit runs inside an
# already-redacted token can't re-fire because the mask is alphabetic).
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (size of regexp_extract_all)."""
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def scrub_pii(text: Column) -> Column:
    """Redact all PII kinds, in PII_PATTERNS order. Pure JVM regexp_replace
    chain — no Python in the loop, whole-stage-codegen friendly."""
    out = text
    for _, pat, mask in PII_PATTERNS:
        out = F.regexp_replace(out, pat, mask)
    return out


def residual_pii(text: Column) -> Column:
    """Total PII matches remaining in a text — 0 after scrub_pii, by
    construction (masks are alphabetic and cannot re-match)."""
    total = F.lit(0)
    for kind, _, _ in PII_PATTERNS:
        total = total + pii_count(text, kind)
    return total


# --- model-scored quality gate ----------------------------------------------

# Linear quality model over the QC features above — the logreg/fastText
# quality-classifier surrogate every large curation pipeline runs (GPT-3's
# LR-over-features reference filter, CCNet's fasttext LM gate). The weights
# here are fixed literals; a production model's coefficient vector arrives
# the same way (a literal/broadcast array), so the plan shape — one narrow
# map-side projection, zero shuffle, zero UDF — is already the 100 TB form.
#
# ALL model arithmetic is exact-integer (features in ten-thousandths,
# weights ×10, margin in hundred-thousandths). Measured necessity, not
# style: weights have 1 decimal and features 4, so the float margin lands
# EXACTLY on decimal .xxxx5 boundaries for ~10% of documents, where
# round(x, 4) is an implementation lottery — Java BigDecimal HALF_UP reads
# the double's exact binary expansion while DuckDB scales-and-floors, and
# they legally disagree whenever the scaled double crosses .5 by an ulp
# (observed 3/500 docs). Integer HALF_UP division has no such boundary.
CLF_BIAS_E5 = -150_000            # -1.5, in hundred-thousandths
CLF_WEIGHTS_E1 = {
    "f_len": 22,     # +2.2  enough tokens (saturating)
    "f_stop": 16,    # +1.6  natural-language stopword density
    "f_punct": -28,  # -2.8  punctuation noise
    "f_digit": -19,  # -1.9  digit noise
    "f_wlen": 8,     # +0.8  sane mean word length (saturating)
}


def _ratio_e4(num: Column, den: Column) -> Column:
    """HALF_UP(10000·num/den) in exact integer arithmetic (num>=0, den>=1):
    floor((20000·num + den) / (2·den)). The float division's floor is exact
    here: quotients are ≤ ~1e8 (ulp ≈ 1.5e-8) while the distance from an
    integer boundary is ≥ 1/(2·den) ≥ ~5e-5 for any real document. Long
    math: int32 num·20000 overflows at ~100k chars."""
    num = num.cast("long")
    den = den.cast("long")
    return F.floor((num * 20000 + den) / (den * 2)).cast("long")


def classifier_features_e4(text: Column) -> dict[str, Column]:
    """The model's feature vector in integer ten-thousandths — exact in
    any engine (counts, integer multiply/divide only; no float round).

    Counting devices chosen for codegen, not elegance: higher-order
    functions (filter+isin, aggregate) are CodegenFallback — interpreted
    per element — and measured ~200µs/doc on this gate; the equivalent
    regex/length forms fuse into the whole-stage-codegen'd scan
    (stopword hits via a whitespace-anchored alternation on the padded
    lowered text ≡ token equality; summed token length ≡ non-whitespace
    char count — every non-ws char belongs to exactly one token). The
    DuckDB oracle keeps its list_filter/list_aggregate derivation: same
    integers, independent device."""
    toks = tokens(text)
    n_tok = F.size(toks)
    m = F.greatest(n_tok, F.lit(1))
    import re as _re
    # re.escape each stopword: no behavior change for the current list,
    # but a future entry with a regex metacharacter would otherwise
    # silently diverge from the oracle's token-equality (`IN`) device
    # instead of failing loudly (see the STOPWORDS note above)
    n_stop = F.size(F.regexp_extract_all(
        F.concat(F.lit(" "), F.lower(text), F.lit(" ")),
        F.lit(r"(?<=\s)(?:"
              + "|".join(_re.escape(s) for s in STOPWORDS)
              + r")(?=\s)"), F.lit(0)))
    n_chars = F.greatest(F.length(text), F.lit(1))
    n_punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    n_digit = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    sum_wlen = F.length(F.regexp_replace(text, r"\s", ""))
    avg_wlen_e4 = _ratio_e4(sum_wlen, m)
    return {
        # least(n_tok/100, 1): 10000*n_tok/100 = 100*n_tok exactly
        "f_len": F.least(n_tok.cast("long") * 100, F.lit(10000).cast("long")),
        "f_stop": _ratio_e4(n_stop, m),
        "f_punct": _ratio_e4(n_punct, n_chars),
        "f_digit": _ratio_e4(n_digit, n_chars),
        # least(avg_wlen/10, 1) at 4dp: HALF_UP(avg_e4/10), capped
        "f_wlen": F.least(
            F.floor((avg_wlen_e4 + 5) / 10).cast("long"),
            F.lit(10000).cast("long")),
    }


def classifier_z_e4(text: Column) -> Column:
    """The model's margin in integer ten-thousandths,
    z_e4 = HALF_UP((bias_e5 + Σ w_e1·f_e4) / 10). The keep/drop decision
    must gate on the SIGN of this margin, not on the calibrated score: a
    z of -0.0001 produces a score that 4dp-rounds to exactly 0.5000, so
    `score >= 0.5` would flip the decision the margin made."""
    feats = classifier_features_e4(text)
    z_e5 = F.lit(CLF_BIAS_E5).cast("long")
    for name, w in CLF_WEIGHTS_E1.items():
        z_e5 = z_e5 + F.lit(w) * feats[name]
    mag = F.floor((F.abs(z_e5) + 5) / 10).cast("long")
    return F.when(z_e5 < 0, -mag).otherwise(mag)


def classifier_z(text: Column) -> Column:
    """The margin as a double, z_e4/10000 — one correctly-rounded IEEE
    division of the exact integer margin, bit-identical in any engine."""
    return classifier_z_e4(text) / F.lit(10000.0)


def classifier_score(z: Column) -> Column:
    """Quality score in (0, 1): softsign calibration of the margin,
    score = (z/(1+|z|) + 1) / 2, deliberately UNROUNDED.

    Softsign, not the logistic sigmoid, on purpose: exp() is NOT a
    correctly-rounded IEEE op — libm implementations (JVM vs DuckDB's C
    runtime) legally differ in the last ulp, which can flip a 4dp-rounded
    score on a boundary. Softsign is division and abs only — correctly
    rounded IEEE ops, so given the 4dp-rounded z the score double is
    BIT-IDENTICAL across engines with no rounding needed; a final
    round(·, 4) would actually break parity (measured: Java BigDecimal
    HALF_UP vs DuckDB's scaled-nearbyint disagree when the scaled value
    sits within an ulp of .5). Same monotone gate (score >= 0.5 ⇔ z >= 0).
    """
    return (z / (F.lit(1.0) + F.abs(z)) + F.lit(1.0)) / F.lit(2.0)


# --- C4 line-level filtering (Raffel et al. 2020, §2.2) ----------------------
# The C4 cleanup is LINE-structured: pages are edited line-by-line before
# page-level verdicts. Distinct from every per-doc gate above — the device
# is split-lines → per-line rules → reassemble, all JVM expressions.

C4_TERMINAL = (".", "!", "?", '"')


def _line_kept(line: Column, min_words: int = 5) -> Column:
    """C4 line rules: ends in terminal punctuation, has ≥``min_words``
    words, and does not mention javascript (case-insensitive). Default 5,
    the paper's threshold (Raffel et al. 2020 §2.2: 'only retained lines
    that ... contained at least 5 words')."""
    t = F.trim(line)
    return (F.substring(t, -1, 1).isin(*C4_TERMINAL)
            & (F.size(F.split(t, r"\s+")) >= min_words)
            & ~F.lower(t).contains("javascript"))


def c4_clean_lines(text: Column, min_words: int = 5) -> Column:
    """Array of surviving lines under the C4 line rules."""
    return F.filter(F.split(text, "\n"),
                    lambda line: _line_kept(line, min_words))


def c4_page_dropped(text: Column, min_kept_lines: int = 5,
                    min_words: int = 5) -> Column:
    """C4 page-level verdict: drop pages containing '{' or 'lorem ipsum',
    or retaining fewer than ``min_kept_lines`` lines after the line rules
    (C4 uses 'fewer than 3 sentences'; the line proxy keeps the rule a
    pure expression — the knob is explicit)."""
    low = F.lower(text)
    return (low.contains("{")
            | low.contains("lorem ipsum")
            | (F.size(c4_clean_lines(text, min_words)) < min_kept_lines))


def blocklist_page_flag(text: Column, blocklist: list[str]) -> Column:
    """C4's remaining §2.2 page rule: True iff the page contains any
    term from a blocklist (the paper uses the public 'List of Dirty,
    Naughty, Obscene or Otherwise Bad Words'; the list here is a
    parameter — ship your deployment's list, this module hard-codes
    none). Matching is TOKEN equality on the lowercased whitespace
    tokenization — the STOPWORDS device — not substring containment,
    so 'class' never trips a blocklist containing 'ass' (the known
    false-positive C4 is criticized for; the deviation from the
    paper's substring behavior is deliberate and documented here).

    Scale: the blocklist folds into one constant-vectorized
    ``arrays_overlap`` against a literal array — a pure per-row
    expression, zero shuffle, zero UDF, fused into the scan like every
    other page gate."""
    bl = F.array(*[F.lit(w.lower()) for w in blocklist])
    return F.arrays_overlap(tokens(F.lower(text)), bl)


def blocklist_filter(df: DataFrame, blocklist: list[str],
                     text_col: str = "text") -> DataFrame:
    """Apply :func:`blocklist_page_flag`: adds ``blocked`` (page
    contains a blocklisted token)."""
    return df.withColumn(
        "blocked", blocklist_page_flag(F.col(text_col), blocklist))


def c4_filter(df: DataFrame, text_col: str = "text",
              min_kept_lines: int = 5, min_words: int = 5) -> DataFrame:
    """Apply the C4 cleanup: per-line edit + page verdict. Adds
    ``c4_text`` (kept lines re-joined with newlines) and ``c4_dropped``.
    Scale: pure per-row expressions — fuses into the scan, zero shuffle,
    zero UDF; the cheapest structural gate, so it runs before any wide
    op, exactly where C4 runs it."""
    t = F.col(text_col)
    return (df.withColumn("c4_text",
                          F.array_join(c4_clean_lines(t, min_words), "\n"))
            .withColumn("c4_dropped",
                        c4_page_dropped(t, min_kept_lines, min_words)))


# --- Gopher quality rules (Rae et al. 2021, Table A1) ------------------------

def gopher_flags(text: Column) -> dict[str, Column]:
    """The Gopher document-quality rules as named boolean columns (True =
    rule VIOLATED). All pure expressions; thresholds are the paper's.

    - word count outside [50, 100000]
    - mean word length outside [3, 10]
    - symbol-to-word ratio (# or ...) > 0.1
    - fraction of words with an alphabetic character < 0.80
    - fewer than 2 distinct stop words present
    """
    toks = tokens(text)
    n = F.size(toks)
    m = F.greatest(n, F.lit(1))
    mean_wlen = (F.aggregate(toks, F.lit(0),
                             lambda a, t: a + F.length(t)) / m)
    n_sym = (F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."),
                                         F.lit(0))))
    n_alpha_words = F.size(F.filter(
        toks, lambda t: t.rlike("[A-Za-z]")))
    n_stop_distinct = F.size(F.filter(
        F.lit(STOPWORDS),
        lambda s: F.array_contains(
            F.transform(toks, lambda t: F.lower(t)), s)))
    return {
        "bad_word_count": (n < 50) | (n > 100_000),
        "bad_mean_word_length": (mean_wlen < 3) | (mean_wlen > 10),
        "bad_symbol_ratio": (n_sym / m) > 0.1,
        "bad_alpha_fraction": (n_alpha_words / m) < 0.80,
        "bad_stopword_count": n_stop_distinct < 2,
    }


def gopher_keep(text: Column) -> Column:
    """Overall Gopher verdict: keep iff no rule fires."""
    out = F.lit(True)
    for flag in gopher_flags(text).values():
        out = out & ~flag
    return out


# --- unigram-LM perplexity gate (train / persist / score split) --------------
# CCNet's actual pipeline trains the LM on a REFERENCE corpus, persists it,
# and scores every future crawl batch against it. These two functions make
# that split literal: train_unigram_lm(batch_N) -> a small (tok, c, n_total)
# table you persist; score_with_lm(batch_N1, lm) scores the NEXT batch under
# the STORED model via a broadcast join — the self-scored registry query
# (plans/training_queries.py doc_perplexity) is the same arithmetic with
# train and score fused over one corpus. Swap point for a real model: a
# KenLM/NN scorer replaces score_with_lm with one Arrow-batched pandas UDF
# (weights load once per worker); train_unigram_lm's output table is then
# the model artifact path instead.


def train_unigram_lm(docs: DataFrame, text_col: str = "text",
                     vocab_size: int = 2000) -> DataFrame:
    """Train a unigram LM: top-``vocab_size`` tokens with corpus counts,
    plus the corpus token total stamped on every row. Persist the result
    (it IS the model — a few thousand rows).

    Scale: the groupBy is vocab-bounded (one row per distinct token per
    partition); the total rides a 1-row broadcast, so the only wide op is
    the tiny vocab aggregate."""
    toks = docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    # total = sum of token-array sizes over a NARROW doc scan — the same
    # count the exploded aggregate produced (explode emits one row per
    # element), without planning a second tokenize+explode pipeline
    # (round-10; the doc_perplexity device)
    total = F.broadcast(docs.agg(
        F.coalesce(F.sum(F.size(tokens(F.lower(F.col(text_col))))),
                   F.lit(0)).alias("n_total")))
    vocab = (toks.groupBy("tok").agg(F.count("*").alias("c"))
             .orderBy(F.desc("c"), F.asc("tok")).limit(vocab_size))
    # the model table is referenced several times by every consumer
    # (scoring join + n_total reduce; DSIR trains TWO of these) — each
    # reference re-planned the tokenize+vocab pipeline. Lazy
    # localCheckpoint pins the ≤vocab_size-row artifact after its first
    # materialization (round-10; the duplicate_clusters device) — the
    # corpus is tokenized once per trained model, not once per use.
    return vocab.crossJoin(total).localCheckpoint(eager=False)


def score_with_lm(docs: DataFrame, lm: DataFrame,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Score a document batch under a PREVIOUSLY-TRAINED unigram LM
    (:func:`train_unigram_lm` output, typically read back from parquet):
    avg negative log2 probability per token, count-1 floor for OOV.

    Fixed-point scoring (per-token nll HALF-UP to integer millionths,
    integer-division average — see doc_perplexity's rationale) so scores
    are reproducible bit-for-bit across engines and runs.

    Scale: the LM broadcasts to the scoring join — the exploded batch
    never shuffles on the token; the only wide op is the per-doc partial
    aggregate. Returns (id_col, n_tokens, avg_nll_bits)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    # n_total is stamped on every lm row; reduce it back to one broadcast
    # row so OOV tokens (left-join null) still see the trained total
    total = F.broadcast(lm.agg(F.max("n_total").alias("n_total")))
    vocab = lm.select("tok", "c")
    nll = -F.log(F.coalesce(F.col("c"), F.lit(1)) / F.col("n_total")) \
        / F.log(F.lit(2.0))
    nll_e6 = F.floor(nll * 1e6 + F.lit(0.5)).cast("long")
    return (toks.join(F.broadcast(vocab), "tok", "left")
            .crossJoin(total)
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum(nll_e6).alias("_s"))
            .select(id_col, "n_tokens",
                    (F.expr("(2 * _s + 100 * n_tokens) div (200 * n_tokens)")
                     / 10000.0).alias("avg_nll_bits")))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    vocab_size: int = 2000,
                    bigram_size: int = 5000
                    ) -> tuple[DataFrame, DataFrame]:
    """Train a bigram LM with unigram backoff — one n-gram order up from
    :func:`train_unigram_lm`, the step toward CCNet's KenLM 5-gram.
    Returns (unigram_table, bigram_table):

    - unigram: the :func:`train_unigram_lm` artifact (tok, c, n_total);
    - bigram: top-``bigram_size`` adjacent pairs (a, b, c2, c1) whose
      LEFT token is in the unigram vocab, with c1 = count(a) stamped on
      the row so the table is self-contained (p(b|a) = c2/c1 needs no
      join at scoring time).

    Both tables are the persistable model. Scale: the pair aggregate is
    bounded by |distinct bigrams| (map-side partials, the
    vocab_top_bigrams shape); top-K is TakeOrdered with the
    deterministic (count desc, a, b) total order."""
    toks_arr = tokens(F.lower(F.col(text_col)))
    uni = train_unigram_lm(docs, text_col, vocab_size)
    n = F.size(toks_arr)
    pairs = F.zip_with(
        F.slice(toks_arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks_arr, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    bic = (docs.select(F.explode(pairs).alias("p"))
           .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
           .agg(F.count("*").alias("c2")))
    bi = (bic.join(uni.select(F.col("tok").alias("a"),
                              F.col("c").alias("c1")), "a")
          .orderBy(F.desc("c2"), F.asc("a"), F.asc("b"))
          .limit(bigram_size))
    # same device as train_unigram_lm's return: the ≤bigram_size-row
    # model table otherwise re-plans the pair explode+aggregate into
    # every scoring reference
    return uni, bi.localCheckpoint(eager=False)


def score_with_bigram_lm(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         alpha: float = 0.4) -> DataFrame:
    """Score documents under a trained bigram-backoff LM (stupid
    backoff, Brants et al. 2007): position 1 scores under the unigram;
    position i ≥ 2 scores p(b|a) = c2/c1 when the bigram is in the
    table, else α·p_uni(b) (α = 0.4, the paper's constant; count-1 OOV
    floor as everywhere). Scores are the usual FIXED-POINT per-token
    nll (HALF-UP integer millionths, exact integer-division average) so
    both engines agree bitwise given the same tables. Returns (id,
    n_tokens, avg_nll_bits, n_backoff) — n_backoff counts positions
    that fell to the unigram.

    Scale: both tables broadcast to the scoring joins; the exploded
    pair stream never shuffles on the token; the only wide op is the
    per-doc partial aggregate."""
    toks_arr = tokens(F.lower(F.col(text_col)))
    n = F.size(toks_arr)
    pairs = F.zip_with(
        F.slice(toks_arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks_arr, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    pr = (docs.select(F.col(id_col), F.explode(pairs).alias("p"))
          .select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b")))
    total = F.broadcast(uni.agg(F.max("n_total").alias("_n")))
    uvoc = uni.select(F.col("tok").alias("b"), F.col("c").alias("_cb"))
    btab = bi.select("a", "b", "c2", "c1")

    def e6(nll: Column) -> Column:
        return F.floor(nll * 1e6 + F.lit(0.5)).cast("long")

    ln2 = F.log(F.lit(2.0))
    pair_rows = (pr.join(F.broadcast(btab), ["a", "b"], "left")
                 .join(F.broadcast(uvoc), "b", "left")
                 .crossJoin(total)
                 .select(
                     F.col(id_col),
                     F.when(F.col("c2").isNotNull(),
                            e6(-F.log(F.col("c2") / F.col("c1")) / ln2))
                     .otherwise(
                         e6(-F.log(F.lit(alpha)
                                   * F.coalesce(F.col("_cb"), F.lit(1))
                                   / F.col("_n")) / ln2))
                     .alias("nll_e6"),
                     F.when(F.col("c2").isNull(), 1).otherwise(0)
                     .alias("backoff")))
    first = (docs.select(F.col(id_col),
                         F.element_at(toks_arr, 1).alias("b"))
             .filter(F.col("b").isNotNull())
             .join(F.broadcast(uvoc), "b", "left")
             .crossJoin(total)
             .select(F.col(id_col),
                     e6(-F.log(F.coalesce(F.col("_cb"), F.lit(1))
                               / F.col("_n")) / ln2).alias("nll_e6"),
                     F.lit(0).alias("backoff")))
    return (pair_rows.unionByName(first)
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum("nll_e6").alias("_s"),
                 F.sum("backoff").cast("long").alias("n_backoff"))
            .select(id_col, "n_tokens",
                    (F.expr("(2 * _s + 100 * n_tokens) "
                            "div (200 * n_tokens)") / 10000.0)
                    .alias("avg_nll_bits"),
                    "n_backoff"))


def dsir_log_ratio(docs: DataFrame, target_lm: DataFrame,
                   raw_lm: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """DSIR importance log-ratio (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score each document by
    how much more a TARGET-domain language model likes it than the RAW
    crawl's model — avg_t [log2 p_target(t) − log2 p_raw(t)] per token.
    DSIR selects pretraining data matching a target domain (books,
    Wikipedia, code) from a raw crawl by resampling on exactly this
    ratio; both models here are the hashed/unigram stand-ins the paper
    itself uses (hashed n-gram models, not neural LMs).

    Both LMs are :func:`train_unigram_lm` tables (persist-then-score —
    train once on the domain sample and the raw sample, score every
    future crawl batch). Arithmetic rides the SAME fixed-point device as
    :func:`score_with_lm`: each model's per-token nll rounds HALF-UP to
    integer millionths, the ratio is the EXACT integer difference of the
    two pinned integers (llr_e6 = nll_raw − nll_target), and the per-doc
    average is one integer division (truncating toward zero in both
    Spark and DuckDB — the dataset_card device), so scores are
    bit-reproducible cross-engine. Returns (id, n_tokens,
    avg_llr_bits) — positive means the target model prefers the doc.

    Scale: both LM tables broadcast to the scoring join (vocab-bounded);
    the exploded corpus never shuffles on the token; the only wide op is
    the per-doc partial aggregate — the doc_perplexity plan with one
    extra broadcast."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))

    def nll_e6(c: Column, n: Column) -> Column:
        nll = -F.log(F.coalesce(c, F.lit(1)) / n) / F.log(F.lit(2.0))
        return F.floor(nll * 1e6 + F.lit(0.5)).cast("long")

    t_total = F.broadcast(target_lm.agg(F.max("n_total").alias("_nt")))
    r_total = F.broadcast(raw_lm.agg(F.max("n_total").alias("_nr")))
    t_vocab = target_lm.select("tok", F.col("c").alias("_ct"))
    r_vocab = raw_lm.select("tok", F.col("c").alias("_cr"))
    llr = (nll_e6(F.col("_cr"), F.col("_nr"))
           - nll_e6(F.col("_ct"), F.col("_nt")))
    return (toks.join(F.broadcast(t_vocab), "tok", "left")
            .join(F.broadcast(r_vocab), "tok", "left")
            .crossJoin(t_total).crossJoin(r_total)
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum(llr).alias("_s"))
            .select(id_col, "n_tokens",
                    # truncate-toward-zero integer division — identical
                    # in Spark `div` and DuckDB `//` for either sign
                    # (HALF-UP when non-negative; see dataset_card)
                    (F.expr("(2 * _s + 100 * n_tokens) "
                            "div (200 * n_tokens)") / 10000.0)
                    .alias("avg_llr_bits")))


def dsir_top_k(docs: DataFrame, target_lm: DataFrame, raw_lm: DataFrame,
               k: int, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Deterministic DSIR selection: the top-``k`` documents by
    importance log-ratio (ties → lowest id). The paper resamples with
    Gumbel noise for diversity; the Gumbel transform needs libm ``ln``
    of a hash-derived uniform — a cross-engine last-ulp lottery this
    repo's oracle discipline avoids — so the shipped selector is the
    deterministic top-k analog, and a production deployment wanting the
    stochastic form adds md5-derived Gumbel keys at its own risk.
    Plan: the score table is per-doc (tiny vs the corpus); top-k is
    TakeOrdered, no global sort."""
    scored = dsir_log_ratio(docs, target_lm, raw_lm,
                            text_col=text_col, id_col=id_col)
    return (scored.orderBy(F.desc("avg_llr_bits"), F.asc(id_col))
            .limit(k))


# --- compression-ratio QC ----------------------------------------------------

def compression_ratio(text: Column) -> Column:
    """DEFLATE compression ratio len(zlib(text)) / len(text) — the
    Gopher/RefinedWeb-family redundancy signal: highly repetitive or
    templated documents compress far below natural prose, gibberish
    compresses above it, so curation gates keep a middle band.

    A pandas UDF on purpose (stdlib ``zlib``, one C call per row over the
    Arrow batch): there is no JVM-expression equivalent, and the byte
    work is all in C. No DuckDB oracle can mirror zlib — the registry
    entry is rows-only; correctness is pinned by pytest on documents
    with known redundancy structure."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def r(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)
        return s.map(r)

    return _ratio(text)
