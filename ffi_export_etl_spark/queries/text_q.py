"""Text-analysis queries over the documents table (extension surface):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is native Column expressions — tokenization, regex extraction,
higher-order array functions — so the hot path stays inside whole-stage
codegen with zero Python per row. Ratios divide exact integer counts, so
Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table

# BPE-ish pretokenizer: letter runs, digit runs, single non-space symbols.
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to")

# (lang, marker words) for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
}


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), r"\s+")


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words + BPE-ish regex tokens."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_toks()).alias("n_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").cast("int").alias("n_chars_calc"),
    )


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio / mean-word-length quality scoring with a
    keep/drop flag — the standard pretraining-corpus filter shape."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_words = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_wl = (F.length("text") - (n_words - 1)) / n_words  # exact ints -> double
    stop_ratio = n_stop / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stop_ratio"),
        mean_wl.alias("mean_word_len"),
        (
            (n_words >= 20) & (stop_ratio < F.lit(0.5)) & (mean_wl >= F.lit(2.0))
        ).alias("keep"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic with deterministic argmax
    (priority en > de > es on ties; 'und' = no markers at all)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    s_en, s_de, s_es = scores["en"], scores["de"], scores["es"]
    predicted = (
        F.when((s_en == 0) & (s_de == 0) & (s_es == 0), F.lit("und"))
        .when((s_en >= s_de) & (s_en >= s_es), F.lit("en"))
        .when(s_de >= s_es, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_es.alias("score_es"),
        predicted.alias("predicted_lang"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprint: md5 over the sorted distinct
    vocabulary (bag-normalized dedup key) + distinct-token count."""
    d = load_table(spark, sf_dir, "documents")
    vocab = F.array_sort(F.array_distinct(_toks()))
    return d.select(
        "doc_id",
        F.md5(F.encode(F.array_join(vocab, " "), "UTF-8")).alias("fingerprint"),
        F.size(vocab).alias("n_distinct_tokens"),
    )


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_scores": text_quality_scores,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
}

_DUCK_TOKS = "regexp_split_to_array(text, '\\s+')"

ORACLE = {
    "text_token_stats": f"""
        SELECT doc_id,
               CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_words,
               CAST(len(regexp_extract_all(text,
                    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER)
                   AS n_bpe_tokens,
               CAST(length(text) AS INTEGER) AS n_chars_calc
        FROM documents
    """,
    "text_quality_scores": f"""
        WITH t AS (
            SELECT doc_id, text,
                   CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_words,
                   CAST(len(list_filter({_DUCK_TOKS},
                        x -> x IN ('the','a','of','and','to'))) AS INTEGER)
                       AS n_stopwords
            FROM documents
        )
        SELECT doc_id, n_words, n_stopwords,
               n_stopwords / n_words AS stop_ratio,
               (length(text) - (n_words - 1)) / n_words AS mean_word_len,
               (n_words >= 20 AND n_stopwords / n_words < 0.5
                AND (length(text) - (n_words - 1)) / n_words >= 2.0) AS keep
        FROM t
    """,
    "text_langid": f"""
        WITH t AS (
            SELECT doc_id, lang AS labeled_lang,
                   CAST(len(list_filter({_DUCK_TOKS},
                        x -> x IN ('the','a','and','of'))) AS INTEGER) AS score_en,
                   CAST(len(list_filter({_DUCK_TOKS},
                        x -> x IN ('der','die','das','und'))) AS INTEGER) AS score_de,
                   CAST(len(list_filter({_DUCK_TOKS},
                        x -> x IN ('el','la','los','que'))) AS INTEGER) AS score_es
            FROM documents
        )
        SELECT doc_id, labeled_lang, score_en, score_de, score_es,
               CASE WHEN score_en = 0 AND score_de = 0 AND score_es = 0 THEN 'und'
                    WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
                    WHEN score_de >= score_es THEN 'de'
                    ELSE 'es' END AS predicted_lang
        FROM t
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_DUCK_TOKS})), ' '))
                   AS fingerprint,
               CAST(len(list_distinct({_DUCK_TOKS})) AS INTEGER)
                   AS n_distinct_tokens
        FROM documents
    """,
}
