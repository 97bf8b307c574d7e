"""Text-analysis operator library (north-star extension: lang-ID, quality
scoring, token counting, document fingerprinting).

Every function returns a Column built from JVM-side primitives (split /
higher-order folds / regex) so the operators fuse into the scan pipeline —
no Python in the data path at any scale. Each has an exact DuckDB SQL twin
(the ``*_SQL`` helpers) used by the Tier-A oracle queries in
queries/llm_text.py; the twins mirror the arithmetic op-for-op so outputs
are bit-identical (see parity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists — enough signal for an n-gram/stopword
#: heuristic language ID; order fixes the argmax preference chain.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit", "für", "von"],
    "es": ["el", "la", "de", "y", "es", "con", "para", "los"],
    "fr": ["le", "la", "et", "les", "des", "est", "pour", "avec"],
    "zh": ["的", "是", "了", "在", "和", "有", "不", "人"],
}

_FP_MOD = 2147483647  # 2^31 - 1: keeps acc*31 + h inside bigint


def tokens(text: Column) -> Column:
    """Whitespace tokenizer (the fixture's documents are space-joined)."""
    return F.split(text, " ")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish tokenizer: alnum runs, punctuation-separated, empties
    dropped (both engines keep edge empties from regex splits — filter)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
    )


def stopword_hits(toks: Column, lang: str) -> Column:
    """Distinct-token overlap with a language's stopword list."""
    lits = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), lits))


def lang_id(toks: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, fixed preference
    chain (en > de > es > fr > zh on ties, matching dict order) — an
    explicit CASE chain so both engines agree bit-for-bit."""
    scores = {lang: stopword_hits(toks, lang) for lang in STOPWORDS}
    langs = list(STOPWORDS)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [scores[lo] for lo in langs[langs.index(lang) + 1 :]]
        cond = scores[lang] >= F.greatest(*later) if len(later) > 1 else (
            scores[lang] >= later[0]
        )
        expr = F.when(cond, lang).otherwise(expr)
    return expr


def quality_score(text: Column, toks: Column) -> Column:
    """Composite quality heuristic in [0, 1]: length saturation, stopword
    density, non-alnum penalty — ratios of exact integers, so both engines
    divide the same values."""
    n_chars = F.length(text).cast("double")
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    n_toks = F.size(toks).cast("double")
    all_hits = stopword_hits(toks, "en")
    for lang in ("de", "es", "fr", "zh"):
        all_hits = all_hits + stopword_hits(toks, lang)
    stop_ratio = F.least(
        all_hits.cast("double") * F.lit(4.0) / n_toks, F.lit(1.0)
    )
    stripped = F.regexp_replace(text, "[^a-z0-9 ]", "")
    punct_ratio = (n_chars - F.length(stripped).cast("double")) / n_chars
    return (
        F.lit(0.5) * length_score
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )


def token_hash(tok: Column) -> Column:
    """Cross-engine 24-bit token hash: first 6 md5 hex chars as an int.
    (xxhash64 would be faster but is Spark-only — md5 exists identically
    on both engines, and the fingerprint is IO-bound anyway.)"""
    return F.conv(F.substring(F.md5(tok), 1, 6), 16, 10).cast("long")


def fingerprint(toks: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    (acc*31 + token_hash) mod 2^31-1 over the token sequence — a
    Karp-Rabin-style signature; equal docs ⇒ equal prints, reordered
    docs ⇒ different prints (unlike set-based hashes)."""
    hashes = F.transform(toks, token_hash)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % _FP_MOD,
    )


# ---------------------------------------------------------------- SQL twins

def _stopword_hits_sql(toks: str, lang: str) -> str:
    lits = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect(list_distinct({toks}), [{lits}]))"


def lang_id_sql(toks: str) -> str:
    """DuckDB twin of lang_id (same CASE chain)."""
    langs = list(STOPWORDS)
    scores = {lang: _stopword_hits_sql(toks, lang) for lang in langs}
    expr = f"'{langs[-1]}'"
    for lang in reversed(langs[:-1]):
        later = [scores[lo] for lo in langs[langs.index(lang) + 1 :]]
        big = (
            f"greatest({', '.join(later)})" if len(later) > 1 else later[0]
        )
        expr = f"CASE WHEN {scores[lang]} >= {big} THEN '{lang}' ELSE {expr} END"
    return expr


def quality_score_sql(text: str, toks: str) -> str:
    """DuckDB twin of quality_score (op-for-op mirror)."""
    n_chars = f"CAST(length({text}) AS DOUBLE)"
    length_score = f"least({n_chars} / 500.0, 1.0)"
    n_toks = f"CAST(len({toks}) AS DOUBLE)"
    hits = " + ".join(_stopword_hits_sql(toks, g) for g in STOPWORDS)
    stop_ratio = f"least(CAST({hits} AS DOUBLE) * 4.0 / {n_toks}, 1.0)"
    stripped = f"regexp_replace({text}, '[^a-z0-9 ]', '', 'g')"
    punct_ratio = f"({n_chars} - CAST(length({stripped}) AS DOUBLE)) / {n_chars}"
    return (
        f"0.5 * {length_score} + 0.3 * {stop_ratio}"
        f" + 0.2 * (1.0 - {punct_ratio})"
    )


def token_hash_sql(tok: str) -> str:
    return f"CAST('0x' || substring(md5({tok}), 1, 6) AS BIGINT)"


def fingerprint_sql(toks: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> {token_hash_sql('t')})), "
        f"(acc, h) -> (acc * 31 + h) % {_FP_MOD})"
    )


def bpe_ish_tokens_sql(text: str) -> str:
    return (
        f"list_filter(str_split_regex(lower({text}), '[^a-z0-9]+'),"
        " t -> t <> '')"
    )
