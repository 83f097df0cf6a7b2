"""Text-analysis operators for LLM-training-data pipelines.

Extension surface (not in the reference, which processes market quotes
— see BASELINE.json north star): language ID, quality scoring, token
counting, document fingerprinting. All pure Spark SQL expressions —
no Python in the hot path — so they run at full codegen speed over
100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deliberately deterministic + SQL-expressible:
# production would swap in fastText/CLD3 behind the same column
# contract.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "et", "des", "une", "est", "dans", "pour", "qui"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "eine", "mit", "den"],
    "it": ["il", "di", "che", "per", "con", "una", "sono", "del", "non", "più"],
    "pt": ["os", "de", "que", "uma", "com", "para", "não", "mais", "foi", "ele"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), "\\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count (BPE-ish subword estimate belongs in
    `bpe_token_estimate`)."""
    return F.size(tokens(col))


def bpe_token_estimate(col: str | Column) -> Column:
    """Deterministic BPE-ish token-count estimate: word-piece regex
    split (letters / digits / other runs), the standard ~chars/4 proxy
    refined by punctuation splits. Chosen to be expressible in both
    Spark and ANSI SQL for oracle parity."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    # long alpha runs cost extra subword splits: ~1 per 6 chars beyond
    # the first 6 of each word, approximated globally. floor() is
    # explicit: Spark's double→long cast truncates but DuckDB's
    # rounds, so the oracle must see the same floor.
    alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    extra = F.floor(F.greatest(F.lit(0.0), (alpha_chars - pieces * 6) / F.lit(6.0)))
    return (pieces + extra).cast("long")


def stopword_ratio(col: str | Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are in ``stopwords`` (case-folded)."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Heuristic document quality in [0, 1]: mean-word-length sanity,
    punctuation density, and non-alphanumeric noise. Mirrors the usual
    Gopher/C4-style rule family, kept SQL-pure."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    mean_word_len = n_chars / F.greatest(n_tok, F.lit(1.0))
    # ideal mean word length ~3..10 chars
    len_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.0)
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    punct_ok = F.when(punct_ratio <= 0.2, 1.0 - punct_ratio * 2).otherwise(0.0)
    short = F.when(n_tok >= 10, 1.0).otherwise(n_tok / 10.0)
    return (len_ok * 0.4 + punct_ok * 0.3 + short * 0.3)


def lang_id(col: str | Column) -> Column:
    """Stopword-marker language ID: argmax over per-language marker-hit
    counts; 'und' (undetermined) when nothing matches.

    Deterministic tie-break: language code ascending (so 'de' beats
    'en' on equal score) — ties must be stable for oracle parity.
    """
    toks = tokens(col)
    # Build argmax as a fold over a fixed language list (sorted for the
    # deterministic tie-break).
    scored = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(
            F.filter(toks, lambda t: F.array_contains(markers, F.lower(t)))
        )
        scored.append((lang, score))
    expr = F.lit("und")
    # iterate reversed so earlier (alphabetically smaller) langs win ties
    for lang, score in reversed(scored):
        prev_better = F.lit(False)
        for l2, s2 in scored:
            if l2 < lang:
                prev_better = prev_better | (s2 >= score)
            elif l2 > lang:
                prev_better = prev_better | (s2 > score)
        expr = F.when((score > 0) & ~prev_better, F.lit(lang)).otherwise(expr)
    return expr


LANGS = sorted(LANG_MARKERS)


def lang_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-language marker-hit counts as an aggregation: explode tokens
    once → one ``sum(when(tok in markers))`` per language → one row per
    doc ``(id, s_de, s_en, ...)``.

    The fast, scale-correct shape (same rationale as
    :func:`~..dedup.minhash_signatures`): whole-stage codegen with
    map-side combine, and the groupBy is a natural optimizer barrier —
    downstream argmax/filter expressions reference cheap aggregated
    columns, where the :func:`lang_id` Column form re-inlines its
    interpreted higher-order-function subtrees at every reference
    (measured 2× under predicate pushdown).
    """
    tok = df.select(
        F.col(id_col).alias(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    aggs = [
        F.sum(
            F.when(F.lower(F.col("tok")).isin(LANG_MARKERS[lang]), 1).otherwise(0)
        ).alias(f"s_{lang}")
        for lang in LANGS
    ]
    return tok.groupBy(id_col).agg(*aggs)


def lang_id_from_scores() -> Column:
    """Argmax over the ``s_<lang>`` columns of :func:`lang_scores` —
    alphabetical tie-break, 'und' when no marker hits. Semantically
    identical to :func:`lang_id` (asserted in tests)."""
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    expr = F.lit(LANGS[-1])
    for lang in reversed(LANGS[:-1]):
        expr = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def fingerprint(col: str | Column) -> Column:
    """128-bit content fingerprint of normalized text (md5 hex).

    md5 is available in both Spark and DuckDB, so fingerprints are
    oracle-checkable. Normalization: lowercase + whitespace collapse.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


# PII patterns restricted to the RE2 ∩ Java-regex common subset so a
# DuckDB oracle sees identical matches (same patterns as pii_flag).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def redact_pii(col: str | Column) -> Column:
    """PII redaction transform: emails, IPv4s and phone-shaped
    substrings replaced with typed placeholders, applied in the fixed
    ``PII_PATTERNS`` order (deterministic; email first so an address's
    host part can't be half-eaten by the IP pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stat panel: token count, char count, mean word
    length, stopword ratio (en), quality score, fingerprint, lang guess."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars_computed"),
        F.round(F.length(c) / F.greatest(token_count(c), F.lit(1)), 6).alias(
            "mean_word_len"
        ),
        F.round(stopword_ratio(c, LANG_MARKERS["en"]), 6).alias("stopword_ratio_en"),
        F.round(quality_score(c), 6).alias("quality_score"),
        fingerprint(c).alias("fingerprint"),
        lang_id(c).alias("lang_guess"),
    )


def bpe_merge_pairs(
    df: DataFrame, text_col: str = "text", min_count: int = 50
) -> DataFrame:
    """First BPE merge iteration: adjacent character-pair frequencies
    over the corpus, the statistic a tokenizer build computes before
    each merge (Sennrich et al. 2016, public algorithm).

    Scale design — the classic BPE trick: aggregate the corpus to a
    token-frequency table FIRST (vocabulary-bounded, one shuffle over
    16-byte-ish tokens), then explode character pairs over DISTINCT
    tokens only, weighting each pair by the token's corpus count. The
    expensive per-character explode therefore runs over |vocab| rows,
    not |corpus| rows — at 100 TB the vocabulary is millions while the
    corpus is trillions of tokens. Pure codegen'd SQL (substring over
    a sequence); no UDF.

    Returns ``(a, b, pair_count)`` for pairs seen ≥ ``min_count``
    times (weighted) — the arg-max row is the first merge.
    """
    tok = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tok_cnt"))
    )
    pairs = tok.select(
        "tok_cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> struct(substring(tok, i, 1) AS a,"
                "             substring(tok, i + 1, 1) AS b))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("a"), F.col("p.b").alias("b")
        )
        .agg(F.sum("tok_cnt").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
