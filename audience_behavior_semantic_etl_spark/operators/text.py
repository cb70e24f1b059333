"""Text-analysis operators for training-data pipelines: tokenization,
language-ID heuristic, quality scoring, token counting, document
fingerprinting.

All pure Column algebra (JVM-side, codegen'd) — no Python UDFs. The
tokenizer is deliberately defined with portable primitives (lower,
regexp_replace, split) so an independent SQL engine (DuckDB oracle)
reproduces it bit-for-bit; hashes are md5-based for the same reason
(engine-native hash functions are not portable).

At 100 TB these run as map-only stages over the documents scan —
no shuffle at all; only the aggregate variants (per-language stats)
shuffle, on low-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny embedded stopword lists for the lang-ID heuristic (public,
# high-frequency function words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "pas", "pour", "que", "dans"],
}

ENGLISH_STOPWORDS = STOPWORDS["en"]


def tokens(text: Column | str) -> Column:
    """Portable word tokenizer: lowercase, strip non-alphanumerics,
    split on runs of spaces, drop empties."""
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9 ]+", " ")
    return F.filter(F.split(cleaned, r" +"), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def avg_word_len(text: Column | str) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.round(total.cast("double") / F.greatest(F.size(t), F.lit(1)), 4)


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or ENGLISH_STOPWORDS
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(sw)))
    return F.round(hits.cast("double") / F.greatest(F.size(t), F.lit(1)), 4)


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.round(n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)), 4)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs with
    low punctuation density and sane word lengths — the usual cheap
    pre-filter before expensive dedup/classification stages."""
    tc = token_count(text).cast("double")
    length_term = F.least(tc / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    wl = avg_word_len(text)
    wl_term = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((length_term * 0.4 + punct_term * 0.3 + wl_term * 0.3), 4)


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language heuristic: argmax over languages of
    stopword hits; 'und' (undetermined) when no stopwords hit."""
    t = tokens(text)

    def _hits(sw: list[str]):
        def fn(x):
            return x.isin(sw)

        return fn

    scores = [(lang, F.size(F.filter(t, _hits(sw)))) for lang, sw in STOPWORDS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    # first language (in fixed iteration order) reaching the max
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(expr)
    return expr


# PII patterns, deliberately restricted to regex constructs shared by
# Java regex and RE2 (character classes, bounded repeats, \b, \d) so
# the DuckDB oracle applies the IDENTICAL patterns. Order matters:
# emails before IPs (an email's domain may contain digits+dots), card
# numbers before phones (a 16-digit run matches both).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{12,19}\b", "<NUM>"),
    (r"\+?\d[\d() -]{6,}\d", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Scrub common PII shapes (emails, IPv4s, long card-like digit
    runs, phone numbers) with typed placeholder tokens — the cheap
    regex pass every training-data pipeline runs before tokenization.
    Pure JVM-side regexp_replace chain: map-only, no UDF, no shuffle;
    at 100 TB this fuses into the scan projection."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def fingerprint(text: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the raw text (portable across
    engines). Near-dup fingerprints live in operators.dedup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def repetition_score(toks: Column, k: int = 3) -> Column:
    """Intra-document repetition: 1 - distinct_k_gram_windows /
    total_k_gram_windows over the token array — 0 for fully novel
    text, approaching 1 for looping/boilerplate text (the standard
    repeated-n-gram quality gate for LLM corpora; cross-document span
    duplication is operators.dedup.duplicated_spans). ``toks`` must be
    a MATERIALIZED tokens column (shingles_from_tokens performance
    contract). Documents with fewer than k tokens score 0."""
    n = F.size(toks)
    total = F.greatest(n - k + 1, F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), total), lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )
    return F.when(
        n >= k,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(wins)).cast("double") / total, 4
        ),
    ).otherwise(F.lit(0.0))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full profile. Tokens are materialized ONCE at a
    projection boundary — inlining ``tokens(text)`` into every metric
    re-runs the regex tokenizer per metric per row (Catalyst does not
    CSE across duplicated expression subtrees)."""
    t = F.col("__toks")
    staged = df.withColumn("__toks", tokens(text_col))
    # stage 2: metrics that only need the token array + raw text
    total_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    awl = F.round(total_len.cast("double") / F.greatest(F.size(t), F.lit(1)), 4)
    sw_hits = F.size(F.filter(t, lambda x: x.isin(ENGLISH_STOPWORDS)))
    swr = F.round(sw_hits.cast("double") / F.greatest(F.size(t), F.lit(1)), 4)

    def _hits(sw: list[str]):
        def fn(x):
            return x.isin(sw)

        return fn

    scores = [(lang, F.size(F.filter(t, _hits(sw)))) for lang, sw in STOPWORDS.items()]
    best = F.greatest(*[s for _, s in scores])
    lang_expr = F.lit("und")
    for lang, s in reversed(scores):
        lang_expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(lang_expr)

    staged = staged.withColumns(
        {
            "n_tokens": F.size(t),
            "avg_word_len": awl,
            "stopword_ratio": swr,
            "punct_ratio": punct_ratio(text_col),
            "lang_pred": lang_expr,
            "fp": fingerprint(text_col),
        }
    )
    # stage 3: quality from the (materialized) cheap metrics
    length_term = F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))
    wl_term = F.when(
        (F.col("avg_word_len") >= 3) & (F.col("avg_word_len") <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return staged.withColumn(
        "quality", F.round(length_term * 0.4 + punct_term * 0.3 + wl_term * 0.3, 4)
    ).drop("__toks")
