"""Multimodal (image/audio/video) column operators for the
training-data pipeline.

Media are opaque ``binary`` columns with a typed metadata struct;
the Spark-side plumbing (schema, Arrow batching, mapInPandas
signatures, frame slicing) is real and tested, while the actual
codec step is STUBBED: the container ships no image/audio libraries,
so ``decode_image_real`` raises NotImplementedError and the tested
path uses a deterministic md5-derived fake decode whose outputs a
SQL oracle can reproduce exactly.

Generalizes the reference's treat-everything-as-opaque-text stance
(python_mecab_ner reads txt gazetteer files only; see
/root/reference/python_mecab_ner/service/mecab_reader.py:81-97) to
the binary payloads a 100 TB web corpus actually carries
(input_hint: pages carry ``html:binary``).

Scale notes:
- metadata extraction is pure built-ins (length/md5/substring on
  binary) -> whole-stage codegen, no Python;
- decode/feature-extract is ``mapInPandas`` over Arrow batches: one
  Python roundtrip per batch, not per row, and the output schema is
  fixed so downstream stays relational;
- frame sampling is sequence+posexplode (JVM-side row generation),
  so a 2 h video blob never materializes per-frame Python objects.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# deterministic fake-media parameters (shared with the SQL oracle)
MIMES = ["image/png", "audio/wav", "video/mp4"]
FRAME_BYTES = 64  # fake fixed-size frame for video blobs


def synthesize_blobs(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic fake media: blob = utf-8 bytes of the text, mime
    assigned round-robin by id.  Stands in for real WARC payloads so
    every downstream operator works on genuine BinaryType columns."""
    blob = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        blob.alias("blob"),
        F.struct(
            F.element_at(F.array(*[F.lit(m) for m in MIMES]),
                         (F.col(id_col) % 3 + 1).cast("int")).alias("mime"),
            F.length(blob).cast("bigint").alias("n_bytes"),
        ).alias("meta"))


def blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """JVM-side metadata scan: byte length + 60-bit md5 checksum.  No
    Python; survives 100 TB because it is a pure projection."""
    b = F.col(blob_col)
    return df.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.length(b).cast("bigint").alias("n_bytes"),
        F.conv(F.substring(F.md5(b), 1, 15), 16, 10).cast("bigint")
        .alias("checksum"))


# --------------------------------------------------------------------------
# decode / feature extraction (mapInPandas; codec stubbed)
# --------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("mean_luma", IntegerType()),
])


def decode_image_real(blob: bytes):  # pragma: no cover - stub
    """Real codec hook (PIL/libvips).  Not available in this
    container; swap in when the image libs exist on executors."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_image_features (deterministic stand-in)")


def fake_image_features(blob: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in decode: features derived from the md5 of
    the bytes, so the Spark result has an exact DuckDB oracle."""
    h = int(hashlib.md5(blob).hexdigest()[:15], 16)
    return (32 + h % 480, 32 + (h >> 9) % 480, 1 + h % 4, h % 256)


def image_features(df: DataFrame, blob_col: str = "blob",
                   use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    The batch shape is the contract: each pandas batch arrives with
    bytes objects in ``blob_col``; one output row per input row; the
    codec runs once per row *inside* the batch loop (vectorizing a
    real codec means handing the whole column to the library)."""
    decode = decode_image_real if use_real_codec else fake_image_features

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [decode(b) for b in pdf[blob_col]]
            out = {"doc_id": pdf["doc_id"].astype("int64")}
            for i, name in enumerate(("width", "height", "n_channels",
                                      "mean_luma")):
                out[name] = [f[i] for f in feats]
            import pandas as pd
            yield pd.DataFrame(out).astype(
                {c: "int32" for c in ("width", "height", "n_channels",
                                      "mean_luma")})

    return df.select("doc_id", blob_col).mapInPandas(
        extract, schema=IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("rms", IntegerType()),
])

_SAMPLE_RATES = (8000, 16000, 22050, 44100)


def decode_audio_real(blob: bytes):  # pragma: no cover - stub
    """Real codec hook (soundfile/librosa).  Not available in this
    container; swap in when the audio libs exist on executors."""
    raise NotImplementedError(
        "audio codec not available in this environment; "
        "use fake_audio_features (deterministic stand-in)")


def fake_audio_features(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decode (md5-derived, SQL-reproducible):
    (sample_rate, n_samples, rms)."""
    h = int(hashlib.md5(blob).hexdigest()[:15], 16)
    rate = _SAMPLE_RATES[h % 4]
    return (rate, len(blob) * 4, h % 1024)


def audio_features(df: DataFrame, blob_col: str = "blob",
                   use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched audio decode + feature extraction (mapInPandas) —
    the audio twin of image_features, same batch-shape contract."""
    decode = decode_audio_real if use_real_codec else fake_audio_features

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            feats = [decode(b) for b in pdf[blob_col]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "sample_rate": pd.Series([f[0] for f in feats], dtype="int32"),
                "n_samples": pd.Series([f[1] for f in feats], dtype="int64"),
                "rms": pd.Series([f[2] for f in feats], dtype="int32"),
            })

    return df.select("doc_id", blob_col).mapInPandas(
        extract, schema=AUDIO_FEATURE_SCHEMA)


def resize_plan(df: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize PLAN for decoded images: new dims
    fitting the target box, computed with exact integer arithmetic
    (w * target div max(w, h)) — pure codegen, no Python.  The actual
    pixel resample belongs to the stubbed codec; this operator carries
    the numbers every downstream vision pipeline needs (and at 100 TB
    the planning projection costs nothing)."""
    return df.withColumn(
        "new_width", F.expr(f"int(width * {target} div greatest(width, height))")
    ).withColumn(
        "new_height", F.expr(f"int(height * {target} div greatest(width, height))"))


def sample_frames(df: DataFrame, blob_col: str = "blob",
                  every_k: int = 4) -> DataFrame:
    """Frame sampling for video blobs: treat the blob as fixed-size
    frames, keep every k-th, emit (doc_id, frame_idx, frame_sig).

    sequence()+explode generates frame indexes JVM-side; substring on
    the binary column slices each frame without Python.  At 100 TB the
    row multiplier is n_frames/k and the work stays in codegen."""
    b = F.col(blob_col)
    n_frames = F.floor(F.length(b) / FRAME_BYTES).cast("int")
    idxs = F.when(n_frames > 0,
                  F.filter(F.sequence(F.lit(0), n_frames - 1),
                           lambda i: i % every_k == 0)
                  ).otherwise(F.array().cast("array<int>"))
    frame = F.substring(b, F.col("frame_idx") * FRAME_BYTES + 1, FRAME_BYTES)
    return (df.select("doc_id", b.alias(blob_col),
                      F.explode(idxs).alias("frame_idx"))
            .select("doc_id", F.col("frame_idx").cast("int").alias("frame_idx"),
                    F.conv(F.substring(F.md5(frame), 1, 15), 16, 10)
                    .cast("bigint").alias("frame_sig")))
