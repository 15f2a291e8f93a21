"""Text-analysis operators for a large-scale training-data pipeline.

All hot-path expressions are native Catalyst (whole-stage codegen, no
Python): language-ID by marker-word hits, quality scoring from
length/punctuation/stopword ratios, token counting (whitespace + a
BPE-ish regex split), and md5 document fingerprinting over normalized
text. Each has an exact ANSI-SQL oracle (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small deterministic marker-word sets per language (n-gram-heuristic
# stand-in; the point is the distributed plumbing, not NLP quality)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans", "que", "une", "des"],
    "tr": ["ve", "bir", "bu", "için", "ile", "olarak", "daha", "gibi", "çok", "en"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"],
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (normalize runs first)."""
    return F.split(F.trim(F.regexp_replace(text, r"\s+", " ")), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: letter runs / digit runs / single symbols
    (GPT-2-ish boundary classes), cheap proxy for BPE token budgeting.
    regexp_extract_all so the same RE2 pattern runs in the DuckDB oracle."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)
    )


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[\pP]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punctuation
    soup, reasonable word lengths."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    wl = mean_word_len(text)
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * punct_penalty * wl_score, 6)


def _marker_pred(markers: list[str]):
    # NB: a (t, m=markers) default-arg lambda would make PySpark bind the
    # array *index* into m (2-arg HOF form) — build the closure explicitly
    return lambda t: t.isin(markers)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    toks = tokens(F.lower(text))
    out = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, _marker_pred(markers)))
        out.append((lang, hits))
    return out


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; ties break by language order (en
    first) — deterministic."""
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct(hits.alias("hits"), F.lit(i).alias("ord"), F.lit(lang).alias("lang"))
          for i, (lang, hits) in enumerate(scores)]
    )
    best = F.array_max(
        F.transform(
            pairs,
            lambda p: F.struct(
                p["hits"].alias("hits"), (-p["ord"]).alias("nord"), p["lang"].alias("lang")
            ),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-normalized text
    (md5 so DuckDB can oracle it bit-for-bit)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )
