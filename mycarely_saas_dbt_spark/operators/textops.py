"""Text analysis operators for LLM training-data pipelines (SURVEY §7 M5).

All operators are pure Catalyst expressions (no Python UDFs) over the
``documents`` table — tokenization, token counting, quality scoring,
language ID (stopword-profile heuristic), and document fingerprinting.
Each ships a DuckDB oracle computing identical values.

Scale notes (100 TB): every op here is embarrassingly parallel per-row
(narrow transformations — no shuffle at all except the final stats groupBy,
which map-side combines). This is the shape you want for a 1000-executor
corpus scan: one pass, predicate pushdown, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources

# stopword-profile language markers (tiny on purpose — the heuristic is the
# operator; swap in real profiles for production corpora)
LANG_MARKERS = {
    "en": ["the", "a", "is", "and", "of"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "que", "y", "una"],
}
EN_STOPWORDS = ["the", "a", "is", "and", "of", "to", "in"]


def _toks(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def _hits(tokens: F.Column, words: list[str]) -> F.Column:
    """Occurrence count of `words` within the token array (JVM lambda —
    stays inside codegen, unlike a Python UDF)."""
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(__toks, t -> t IN ({lst})))")


def with_text_features(docs: DataFrame) -> DataFrame:
    """Tokenize + token stats: counts, distinct ratio, regex word count."""
    return (
        docs.withColumn("__toks", _toks())
        .withColumn("n_tokens", F.size("__toks").cast("long"))
        .withColumn(
            "n_distinct_tokens", F.size(F.array_distinct("__toks")).cast("long")
        )
        .withColumn(
            "n_alnum_words",
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)).cast(
                "long"
            ),
        )
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sources(spark, sf_dir)
    return with_text_features(spark.table("documents")).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "n_alnum_words"
    )


O_TOKEN_STATS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_alnum_words
FROM documents
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation, lexical diversity,
    stopword balance — the standard cheap pre-filter before expensive
    dedup/training steps."""
    register_sources(spark, sf_dir)
    d = with_text_features(spark.table("documents"))
    stop_ratio = (
        _hits(F.col("__toks"), EN_STOPWORDS).cast("double") / F.col("n_tokens")
    )
    diversity = F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")
    length_sat = F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
    return d.select(
        "doc_id",
        F.col("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        diversity.alias("diversity"),
        length_sat.alias("length_sat"),
        (0.4 * length_sat + 0.4 * diversity + 0.2 * (1.0 - stop_ratio)).alias(
            "quality_score"
        ),
    )


_SQL_STOP_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

O_QUALITY = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct
    FROM documents
),
f AS (
    SELECT doc_id, n_tokens,
        CAST(len(list_filter(toks, t -> t IN ({_SQL_STOP_LIST}))) AS DOUBLE)
            / n_tokens AS stopword_ratio,
        CAST(n_distinct AS DOUBLE) / n_tokens AS diversity,
        least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS length_sat
    FROM t
)
SELECT doc_id, n_tokens, stopword_ratio, diversity, length_sat,
       0.4 * length_sat + 0.4 * diversity + 0.2 * (1.0 - stopword_ratio)
           AS quality_score
FROM f
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: argmax of marker-hit counts with a
    deterministic priority order; 'und' when nothing matches."""
    register_sources(spark, sf_dir)
    d = spark.table("documents").withColumn("__toks", _toks())
    scores = {l: _hits(F.col("__toks"), ws) for l, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, "und")
    for lang in LANG_MARKERS:  # insertion order = tie-break priority
        pred = pred.when(scores[lang] == best, lang)
    out = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        *[scores[l].cast("long").alias(f"score_{l}") for l in LANG_MARKERS],
    )
    return out


def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({lst})))"


O_LANG_ID = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (
    SELECT doc_id, lang,
           {_marker_sql('en')} AS score_en,
           {_marker_sql('fr')} AS score_fr,
           {_marker_sql('de')} AS score_de,
           {_marker_sql('es')} AS score_es
    FROM t
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN greatest(score_en, score_fr, score_de, score_es) = 0 THEN 'und'
            WHEN score_en = greatest(score_en, score_fr, score_de, score_es) THEN 'en'
            WHEN score_fr = greatest(score_en, score_fr, score_de, score_es) THEN 'fr'
            WHEN score_de = greatest(score_en, score_fr, score_de, score_es) THEN 'de'
            ELSE 'es' END AS predicted_lang,
       CAST(score_en AS BIGINT) AS score_en,
       CAST(score_fr AS BIGINT) AS score_fr,
       CAST(score_de AS BIGINT) AS score_de,
       CAST(score_es AS BIGINT) AS score_es
FROM s
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 over lowercased, whitespace-
    collapsed text) — the cheap exact-dup key for corpus-level dedup."""
    register_sources(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return spark.table("documents").select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


# DuckDB regexp_replace needs the 'g' flag (Spark replaces all by default)
O_FINGERPRINT = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) corpus rollup — the partition-planning view a
    100 TB pipeline uses to size splits."""
    register_sources(spark, sf_dir)
    return (
        with_text_features(spark.table("documents"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.avg(F.col("n_tokens").cast("double")).alias("avg_tokens"),
        )
    )


O_CORPUS_STATS = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avg_tokens
FROM documents
GROUP BY lang, source
"""


CURATION_MIN_QUALITY = 0.55


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline a training-data run actually executes:
    exact-dedup keep-list (lowest doc_id per content hash) → quality gate →
    per-language profile of the surviving corpus. One extra shuffle for the
    keep-list join beyond the individual operators; the quality features are
    computed once on the already-deduped survivors. Aggregates are
    order-independent (count / min / max / integer sum) so the oracle
    compare is exact."""
    register_sources(spark, sf_dir)
    docs = spark.table("documents")
    canonical = docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    kept = (
        docs.join(canonical.select("doc_id"), "doc_id")
        .join(q, "doc_id")
        .filter(F.col("quality_score") >= CURATION_MIN_QUALITY)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min("quality_score"), 6).alias("min_quality"),
        F.round(F.max("quality_score"), 6).alias("max_quality"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


O_CURATION = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct
    FROM documents
),
q AS (
    SELECT doc_id,
           0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         + 0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)
         + 0.2 * (1.0 - CAST(len(list_filter(toks, t -> t IN ({_SQL_STOP_LIST}))) AS DOUBLE)
                        / n_tokens) AS quality_score
    FROM t
),
canon AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT d.lang, COUNT(*) AS n_docs,
       ROUND(MIN(q.quality_score), 6) AS min_quality,
       ROUND(MAX(q.quality_score), 6) AS max_quality,
       CAST(SUM(length(d.text)) AS BIGINT) AS total_chars
FROM documents d
JOIN canon USING (doc_id)
JOIN q USING (doc_id)
WHERE q.quality_score >= {CURATION_MIN_QUALITY}
GROUP BY d.lang
"""


PAIRS = [
    ("text_token_stats", token_stats, O_TOKEN_STATS),
    ("text_quality", quality_scores, O_QUALITY),
    ("text_lang_id", lang_id, O_LANG_ID),
    ("text_fingerprint", fingerprints, O_FINGERPRINT),
    ("text_corpus_stats", corpus_stats, O_CORPUS_STATS),
    ("corpus_curation_pipeline", corpus_curation, O_CURATION),
]


def register_queries(register) -> None:
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle)
