"""Text-analysis operators for large-scale training-data pipelines, over the
flat ``documents`` table (doc_id, text, lang, source, n_chars).

Everything is native Column expressions (whole-stage codegen, zero UDFs) and
every derived value is defined by arithmetic/string ops that evaluate
identically in DuckDB, so each operator carries a full SQL oracle:

* fingerprint — md5 of the text (content-addressable doc identity).
* token count — separator counting via length-difference (exact in both
  engines; regexp tokenizers differ subtly across engines so are avoided
  in oracle-checked paths).
* language id — stopword-marker counting heuristic: count occurrences of
  high-frequency function words per language, argmax with a fixed
  priority order.
* quality score — integer-scaled heuristic from length, word count and
  stopword density (the classic pretraining quality gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Integer-only arithmetic throughout: DuckDB *rounds* on CAST(double AS
# BIGINT) while Spark truncates, so doubles never reach a cast here — the
# only division is wrapped in FLOOR (exact for these value ranges).
#
# length-diff of a literal fragment = occurrences * len(frag) — exact,
# engine-agnostic, division-free.
def _lendiff_sql(col: str, frag: str) -> str:
    esc = frag.replace("'", "''")
    return f"(LENGTH({col}) - LENGTH(REPLACE({col}, '{esc}', '')))"


_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " que ", " los "],
}


def lang_score_sql(lang: str, col: str = "text") -> str:
    """Marker score = sum of length-diffs (occurrence counts scaled by
    marker length — a deliberate, engine-identical weighting)."""
    return "(" + " + ".join(_lendiff_sql(col, m) for m in _LANG_MARKERS[lang]) + ")"


def lang_pred_sql(col: str = "text") -> str:
    """argmax over language marker scores, fixed priority en>de>fr>es;
    'und' (undetermined) when every score is 0."""
    scores = {lang: lang_score_sql(lang, col) for lang in _LANG_MARKERS}
    best = " , ".join(scores.values())
    cases = " ".join(
        f"WHEN {scores[lang]} = GREATEST({best}) THEN '{lang}'"
        for lang in ("en", "de", "fr", "es")
    )
    return f"(CASE WHEN GREATEST({best}) = 0 THEN 'und' {cases} END)"


def word_count_sql(col: str = "text") -> str:
    """words = spaces + 1 on single-space-normalized text (the space
    fragment has length 1, so the length-diff IS the count)."""
    return f"({_lendiff_sql(col, ' ')} + 1)"


def quality_score_sql(col: str = "text") -> str:
    """Integer quality score in [0, 100]: rewards stopword density and
    mid-range length (the usual C4/Gopher-style gates, integer-scaled)."""
    stop = lang_score_sql("en", col)
    wc = word_count_sql(col)
    len_ok = f"(CASE WHEN LENGTH({col}) BETWEEN 200 AND 20000 THEN 40 ELSE 0 END)"
    stop_term = f"LEAST(40, CAST(FLOOR(100.0 * {stop} / {wc}) AS BIGINT))"
    word_ok = f"(CASE WHEN {wc} >= 20 THEN 20 ELSE 0 END)"
    return f"({len_ok} + {stop_term} + {word_ok})"


def text_profile(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, n_words, lang_pred, quality) — one codegen
    projection, no shuffle."""
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fingerprint"),
        F.expr(word_count_sql()).alias("n_words"),
        F.expr(lang_pred_sql()).alias("lang_pred"),
        F.expr(quality_score_sql()).alias("quality"),
    )


def text_profile_oracle(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, md5(text) AS fingerprint, {word_count_sql()} AS n_words, "
        f"{lang_pred_sql()} AS lang_pred, {quality_score_sql()} AS quality FROM {table}"
    )
