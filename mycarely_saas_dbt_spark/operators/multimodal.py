"""Multimodal column plumbing (SURVEY §7 M5).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas functions via ``mapInPandas``.
The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_image_real`` raises NotImplementedError unless PIL is
importable, and the registered pipeline uses ``fake_decode_features`` — a
deterministic pure-Python stand-in — so the Spark-side plumbing (schema,
batch iteration, partitioning, output shape) is real and tested even though
the codec is not.

Scale notes (100 TB):
  * payloads stay in executor memory as Arrow buffers — ``mapInPandas``
    streams batches (spark.sql.execution.arrow.maxRecordsPerBatch), so a
    1000-executor decode pass is bounded by batch size, not partition size;
  * metadata-only queries (the ``mm_binary_meta`` path) never touch Python:
    length/type checks are Catalyst expressions over the binary column;
  * repartition by a size-balanced key before decode when payload sizes are
    skewed (video >> thumbnail) — exposed via ``decode_partitions``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mycarely_saas_dbt_spark.sources.registry import register_sources

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata. In production the
    payload column comes from the lakehouse (image bytes etc.); here it is
    the utf-8 text, which keeps the pipeline runnable on the testdata."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes):
    """The real decode path — gated behind an import-try as the container
    has no imaging stack."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL; not available in this environment"
        ) from exc


def fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: FEATURE_DIM floats derived
    from byte statistics. STUB — replace with a real model/codec."""
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(sum(payload[:64]) % 997),
        float(n % 251),
        float(min(payload) if n else 0),
        float(max(payload) if n else 0),
        float(sum(payload) % 7919),
    ]


def extract_features(binary_df: DataFrame, decode_partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the payload column — the real
    mapInPandas plumbing a production decoder would plug into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": [
                        fake_decode_features(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    df = binary_df
    if decode_partitions:
        df = df.repartition(decode_partitions, "doc_id")
    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only path: pure Catalyst expressions over the binary column
    (never crosses into Python)."""
    register_sources(spark, sf_dir)
    b = with_binary_payload(spark.table("documents"))
    return b.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# DuckDB has no md5(BLOB); md5 over the varchar hashes the same utf-8 bytes
# as Spark's md5 over the binary cast.
O_MM_META = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def mm_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode pipeline with the stub extractor (rows-only
    driver check: the fake features are not SQL-expressible)."""
    register_sources(spark, sf_dir)
    feats = extract_features(with_binary_payload(spark.table("documents")))
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.size("features").alias("feature_dim"),
        F.element_at("features", 1).cast("double").alias("f0"),
    )


FRAME_BYTES = 512
FRAME_STRIDE = 997  # prime stride — frames sample the payload unaligned


def mm_frame_sample(spark, sf_dir):
    """Frame sampling over the opaque binary payload — the video/audio
    pattern (decode only every Nth frame) expressed on the binary column
    itself: strided fixed-size byte windows, each hashed. Spark side runs
    GENUINE binary ops (substring/md5 over BinaryType — the exact plumbing
    a real frame sampler feeds into a decode UDF); the DuckDB oracle
    exploits that the synthetic payload is ASCII text, hashing the same
    byte windows as VARCHAR. Narrow per-row pass, no shuffle."""
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, sf_dir)
    b = with_binary_payload(spark.table("documents")).filter(
        F.col("meta.n_bytes") >= FRAME_BYTES
    )
    frame_hashes = F.expr(
        f"transform(sequence(1, octet_length(payload) - {FRAME_BYTES} + 1, "
        f"{FRAME_STRIDE}), o -> md5(substring(payload, o, {FRAME_BYTES})))"
    )
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        frame_hashes.alias("fh"),
    ).select(
        "doc_id",
        "n_bytes",
        F.size("fh").cast("long").alias("n_frames"),
        F.element_at("fh", 1).alias("first_frame_md5"),
        # explicit floor: Spark int-cast truncates but DuckDB's cast ROUNDS
        F.element_at("fh", (F.floor(F.size("fh") / 2) + 1).cast("int")).alias(
            "mid_frame_md5"
        ),
    )


O_MM_FRAME_SAMPLE = f"""
WITH b AS (
    SELECT doc_id, text AS payload, length(text) AS n_bytes
    FROM documents WHERE length(text) >= {FRAME_BYTES}
),
f AS (
    SELECT doc_id, n_bytes,
           list_transform(generate_series(1, n_bytes - {FRAME_BYTES} + 1,
                                          {FRAME_STRIDE}),
                          o -> md5(substring(payload, o, {FRAME_BYTES}))) AS fh
    FROM b
)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(len(fh) AS BIGINT) AS n_frames,
       fh[1] AS first_frame_md5,
       fh[CAST(FLOOR(len(fh) / 2) AS INT) + 1] AS mid_frame_md5
FROM f
"""




# ---------------------------------------------------------------------------
# REAL audio decode (r6): the container gained no PIL, but WAV needs none —
# the stdlib `wave` module is a genuine container parser. Payloads are
# synthesized DETERMINISTICALLY from doc_id (PCM16 mono, sample i =
# ((i * (doc_id + 7) + 13) % 65536) - 32768), so the DuckDB oracle can
# predict the decode's output ARITHMETICALLY without parsing a byte:
# the entry is a real decode path (bytes -> container parse -> PCM
# features) with a full value oracle, not a rows-only stub.
# ---------------------------------------------------------------------------

WAV_RATE = 8000
WAV_BASE_FRAMES = 100
WAV_MOD_FRAMES = 400


def synth_wav_payloads(docs: DataFrame) -> DataFrame:
    """Arrow-batched WAV synthesis: each doc gets a PCM16 mono WAV whose
    frame count and samples derive from doc_id — the ingest stage a
    binaryFile scan would play in production (one narrow pass; payloads
    never leave executors)."""

    def run(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                n = WAV_BASE_FRAMES + int(doc_id) % WAV_MOD_FRAMES
                i = np.arange(n, dtype=np.int64)
                samples = ((i * (int(doc_id) + 7) + 13) % 65536 - 32768).astype(
                    "<i2"
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_RATE)
                    w.writeframes(samples.tobytes())
                ids.append(int(doc_id))
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return docs.select("doc_id").mapInPandas(run, "doc_id bigint, payload binary")


def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode over binary payloads: `wave` parses the RIFF/WAVE
    container (params + frames), numpy computes integer PCM features —
    frame count, duration, peak and summed |amplitude|. Every output is
    an integer the oracle derives independently from doc_id, so a decode
    regression (wrong endianness, off-by-one frame, header misparse)
    flips the hash.

    Scale shape: synth and decode are separate Arrow-batched narrow
    passes over the corpus (ingest | decode — the real pipeline boundary
    where payloads would arrive from a binaryFile scan); no shuffle at
    all until a consumer aggregates."""
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, sf_dir)
    payloads = synth_wav_payloads(spark.table("documents"))

    def run(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "framerate": [], "n_channels": [],
                "samp_width": [], "n_frames": [], "duration_ms": [],
                "peak_abs": [], "sum_abs": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
                    rate, nch, sw, nf = (
                        w.getframerate(), w.getnchannels(),
                        w.getsampwidth(), w.getnframes(),
                    )
                    pcm = np.frombuffer(w.readframes(nf), dtype="<i2").astype(
                        np.int64
                    )
                out["doc_id"].append(int(doc_id))
                out["framerate"].append(rate)
                out["n_channels"].append(nch)
                out["samp_width"].append(sw)
                out["n_frames"].append(nf)
                out["duration_ms"].append(nf * 1000 // rate)
                out["peak_abs"].append(int(np.abs(pcm).max()))
                out["sum_abs"].append(int(np.abs(pcm).sum()))
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id bigint, framerate bigint, n_channels bigint, samp_width bigint, "
        "n_frames bigint, duration_ms bigint, peak_abs bigint, sum_abs bigint",
    )


O_MM_AUDIO = f"""
WITH d AS (
    SELECT doc_id,
           {WAV_BASE_FRAMES} + doc_id % {WAV_MOD_FRAMES} AS n_frames
    FROM documents
),
pcm AS (
    SELECT d.doc_id, d.n_frames,
           ABS((i * (d.doc_id + 7) + 13) % 65536 - 32768) AS a
    FROM d, UNNEST(range(0, d.n_frames)) AS u(i)
)
SELECT doc_id,
       CAST({WAV_RATE} AS BIGINT) AS framerate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(2 AS BIGINT) AS samp_width,
       CAST(MAX(n_frames) AS BIGINT) AS n_frames,
       CAST(MAX(n_frames) * 1000 // {WAV_RATE} AS BIGINT) AS duration_ms,
       CAST(MAX(a) AS BIGINT) AS peak_abs,
       CAST(SUM(a) AS BIGINT) AS sum_abs
FROM pcm
GROUP BY doc_id
"""


def register_queries(register) -> None:
    register("mm_binary_meta", mm_binary_meta, O_MM_META)
    register("mm_fake_features", mm_fake_features, None)  # rows-only
    register("mm_frame_sample", mm_frame_sample, O_MM_FRAME_SAMPLE)
    register("mm_audio_decode", mm_audio_decode, O_MM_AUDIO)
