"""Python UDTF coverage (Spark 4 table functions) — the user-defined
ESCAPE HATCH, demonstrated and oracle-checked, with its cost documented.

Engine guidance stays: JVM-side builtins first (posexplode over a
split() — same semantics, whole-stage codegen, no Python round-trip);
the UDTF exists for logic that genuinely cannot be expressed with
builtins, and this module proves the plumbing (registration, LATERAL
join, multi-row yield, Arrow batching via useArrow) is wired and
byte-correct against the same builtin-expressible semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources

SENT_SEP = ". "
DOC_SAMPLE_MOD = 29  # deterministic doc sample keeps the row count honest


def _sentence_split_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(SENT_SEP)):
                yield i, s

    return SentenceSplit


def q_udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL-join the Python UDTF against a deterministic document
    sample: one input row fans out to one row per sentence, with the
    per-doc ordinal preserved. The oracle reproduces the identical
    fan-out with pure SQL — proving the UDTF path computes exactly what
    the recommended builtin path would."""
    register_sources(spark, sf_dir)
    spark.udtf.register("sentence_split", _sentence_split_udtf())
    return spark.sql(
        f"""
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM documents d, LATERAL sentence_split(d.text) s
        WHERE d.doc_id % {DOC_SAMPLE_MOD} = 0
        """
    )


O_UDTF_SENTENCE_SPLIT = f"""
WITH t AS (
    SELECT doc_id, string_split(text, '{SENT_SEP}') AS parts
    FROM documents WHERE doc_id % {DOC_SAMPLE_MOD} = 0
)
SELECT doc_id,
       CAST(u.r['i'] - 1 AS INT) AS sent_idx,
       u.r['s'] AS sentence
FROM t, UNNEST(list_transform(generate_series(1, len(parts)),
                              i -> {{'i': i, 's': parts[i]}})) AS u(r)
"""


def register_queries(register) -> None:
    register("udtf_sentence_split", q_udtf_sentence_split, O_UDTF_SENTENCE_SPLIT)
