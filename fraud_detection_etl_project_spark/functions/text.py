"""Text-analysis column expressions for the ``documents`` table.

LLM-data-pipeline primitives (north star, BASELINE.json): token counting,
quality scoring, language-ID heuristics, and document fingerprinting — all as
native Column expressions so they run inside WholeStageCodegen over a parquet
scan (no UDFs, no collect; linear scans that scale to 100 TB trivially).

The fixture's ``text`` is space-separated tokens; the helpers still normalize
whitespace first so they behave on real text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.functions.rounding import fxr

# Small, fixed stopword list — deliberately tiny and engine-portable (the
# same list is embedded in the DuckDB oracles, plans/queries.py).
STOPWORDS = ["the", "a", "of", "and", "to", "in"]

# Marker tokens for the n-gram-free language-ID heuristic. Real language ID
# uses char n-gram profiles; the portable heuristic here scores marker-token
# hits, which is the same shape (feature match -> argmax) and SQL-expressible.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
}


def normalized(text) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def tokens(text) -> Column:
    return F.split(normalized(text), " ")


def token_count(text) -> Column:
    return F.size(tokens(text))


def char_count(text) -> Column:
    return F.length(text)


def avg_token_len(text) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def stopword_ratio(text) -> Column:
    toks = tokens(text)
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return stops.cast("double") / F.size(toks)


def uniq_token_ratio(text) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def quality_score(text) -> Column:
    """Composite [0,1]-ish quality score: length band + vocabulary diversity
    + stopword presence. Deterministic, portable, monotone in the usual
    heuristics (very short or highly repetitive docs score low)."""
    n = token_count(text)
    len_ok = F.when((n >= 20) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    # fxr, not F.round: the DuckDB oracles mirror the same floor(x*1e4+0.5)
    # formula, so both engines cross rounding boundaries identically.
    return fxr((len_ok + uniq_token_ratio(text) + F.least(stopword_ratio(text) * 5, F.lit(1.0))) / 3.0, 4)


def lang_guess(text) -> Column:
    """Argmax of marker-token hit counts; 'und' (undetermined) when no
    marker hits. Ties broken by fixed language order (en,es,de,fr)."""
    toks = tokens(text)
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text (md5 hex).

    md5 is chosen over xxhash64 here because it is bit-identical across
    engines (Spark, DuckDB, Postgres) — fingerprints written by this engine
    are joinable with fingerprints computed elsewhere.
    """
    return F.md5(normalized(text).cast("binary"))
