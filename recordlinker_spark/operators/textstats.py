"""Text-analysis operators for training-data pipelines.

Corpus-quality primitives over a ``documents(doc_id, text, ...)``
table, all pure Catalyst expressions (no Python in the scan path):

* token_counts      — whitespace tokens + a BPE-ish subword estimate.
* quality_scores    — length/punctuation/stopword/uppercase ratios and
  a composite [0,1] quality score.
* language_id       — n-gram/stopword-hit heuristic over a small set of
  built-in language profiles (en/de/fr/es), emitting (lang, confidence).
* fingerprints      — 64-bit rolling-hash document fingerprint (md5 of
  the normalized text's 8-gram min-hash, deterministic across engines).

These are engine extensions (not in CDCgov/RecordLinker, which is
record-PII-only); they follow the same design rule as the linkage
operators: expressions first, shuffles only where semantics demand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def _tokens(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != ""
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, n_subwords): whitespace tokens plus a
    BPE-ish estimate (ceil(chars/4) per token, the common ~4-chars-per-
    token heuristic, computed exactly from per-token lengths)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.trim(F.col(text_col))).cast("long").alias("n_chars"),
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
        ).cast("long").alias("n_subwords"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0,1]."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    upper_ratio = F.when(
        n_chars > 0, F.length(F.regexp_replace(text, "[^A-Z]", "")) / n_chars
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS["en"]))
    )
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    # composite: reward stopword presence + sane token lengths, punish
    # punctuation/uppercase walls; clamped to [0,1]
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(0.5)
            + F.lit(1.0) * stop_ratio
            - F.lit(1.0) * punct_ratio
            - F.lit(0.5) * upper_ratio
            + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 0.2).otherwise(-0.2),
        ),
    )
    return docs.select(
        "doc_id",
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, confidence): argmax stopword-hit-rate over
    built-in profiles; 'und' (undetermined) when no profile hits."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    def _hit_count(words: list[str]) -> Column:
        # nb: a two-arg lambda would be read by F.filter as (elem, index)
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    hits = {lang: _hit_count(words) for lang, words in _STOPWORDS.items()}
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # deterministic tie-break: language order en < de < fr < es wins ties
    for lang in ["es", "fr", "de", "en"]:
        best_lang = F.when(hits[lang] >= best_hits, F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(best_hits, hits[lang])
    conf = F.when(n > 0, best_hits / n).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        F.when(best_hits > 0, best_lang).otherwise(F.lit("und")).alias("lang_pred"),
        F.round(conf, 6).alias("confidence"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """(doc_id, fingerprint): deterministic document fingerprint — the
    minimum md5 over the normalized text's character k-grams (a 1-hash
    MinHash; identical across Spark and DuckDB for oracle checks).

    Output is one row per input doc: a NULL ``text`` yields a
    (doc_id, NULL) fingerprint row through the explode path itself —
    greatest(NULL, 1) is 1 (greatest skips NULLs), so every doc emits
    at least one position row and min(md5(NULL)) aggregates to NULL.
    No join-back needed (an earlier left join here doubled the docs
    scan for no behavioral effect)."""
    # explode a position generator and slice at top level: the md5 +
    # variable-position substring stay in whole-stage codegen instead
    # of an interpreted HOF lambda (the documented thread-scaling trap);
    # map-side partial min keeps the exchange at ~|docs| rows
    # trim AFTER the whitespace collapse, matching the DuckDB oracle
    # twin and the dedup normalizer — without it a whitespace-edged
    # text fingerprints differently across engines
    normed = F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    ex = (
        docs.select("doc_id", normed.alias("_t"))
        .select(
            "doc_id",
            "_t",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("_t") - F.lit(k - 1), F.lit(1)),
                )
            ).alias("_i"),
        )
        .select(
            "doc_id",
            F.md5(F.substring(F.col("_t"), F.col("_i"), F.lit(k))).alias("g"),
        )
    )
    return ex.groupBy("doc_id").agg(F.min("g").alias("fingerprint"))
