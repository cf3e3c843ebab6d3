"""Text-analysis operators for the training-data pipeline tier.

All hot-path logic is native ``pyspark.sql.functions`` (JVM, codegen) —
no Python UDFs. Where cross-engine (DuckDB-oracle) determinism is needed,
hashes are md5-hex (identical lowercase hex in Spark and DuckDB) rather
than engine-specific hash functions.

Operators: tokenization/counting, quality scoring, n-gram language ID,
document fingerprinting, shingling (shared with dedup).
"""

from __future__ import annotations

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

STOPWORDS = ["the", "a", "an", "of", "and", "in", "to", "is"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization. ≡ DuckDB string_split_regex(trim(x),'\\s+')."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word pieces of ≤4 chars — a BPE-like
    upper bound computed as ceil(len/4) summed over words, pure expressions."""
    return F.aggregate(
        tokens(text), F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int"))


def occurrence_count(text: Column, marker: str) -> Column:
    """# of occurrences of ``marker`` — portable replace-and-measure:
    (len(x) - len(replace(x, m, ''))) / len(m)."""
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
    """argmax over lang scores, ties broken by LANG_MARKERS order."""
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
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
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
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column, n_tokens: int = 8) -> Column:
    """Document fingerprint: md5 of the first-n-token normalized prefix —
    a locality-insensitive prefix hash (cheap near-head-dup detector)."""
    toks = tokens(normalize_text(text))
    return F.md5(F.concat_ws(" ", F.slice(toks, 1, n_tokens)))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingle array (dedup primitive). Empty array for docs
    shorter than k tokens.

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
