"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``BinaryType`` columns plus typed metadata. The
Spark-side plumbing — schema, partition sizing, Arrow batch shape,
``mapInPandas`` signatures — is real and tested; the actual
decode/resample kernels are stubbed (image/audio libraries are not in
this container) behind ``NotImplementedError`` with a deterministic
fake used by tests (``fake_decode=True``).

At scale the ingest path is ``spark.read.format("binaryFile")`` (one
row per object: path, modificationTime, length, content) with
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs
fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary",
    "binary_metadata",
    "decode_image_features",
    "decode_audio_features",
    "sample_frames",
]


def attach_binary(df: DataFrame, src_col: str, out_col: str = "content") -> DataFrame:
    """Materialize a binary payload column from a string/bytes column —
    test/synthetic path; production reads format('binaryFile')."""
    return df.withColumn(out_col, F.col(src_col).cast("binary"))


def binary_metadata(df: DataFrame, bin_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Typed metadata over an opaque binary column — size + content
    hash, pure JVM expressions (no Python)."""
    return df.select(
        F.col(id_col),
        F.length(F.col(bin_col)).alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_md5"),
    )


_IMAGE_FEATURE_SCHEMA = "id long, n_bytes long, width int, height int, mean_px double"


def decode_image_features(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Decode images and emit per-image features via ``mapInPandas``
    (Arrow-batched; one Python worker per partition — the only sane
    place for a codec).

    ``fake_decode=True`` derives deterministic pseudo-features from the
    bytes so the distributed plumbing is testable without codecs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "install pillow/opencv and decode pdf[bin_col] here"
                )
            blobs = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    # deterministic fake: derive "dimensions" from content
                    "width": blobs.map(lambda b: 1 + (len(b) % 64)).astype("int32"),
                    "height": blobs.map(lambda b: 1 + ((len(b) // 64) % 64)).astype("int32"),
                    "mean_px": blobs.map(lambda b: round(sum(b[:256]) / max(1, len(b[:256])), 6)).astype("float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=_IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    bin_col: str = "content",
    id_col: str = "doc_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Video frame sampling stub: emits (id, frame_idx, frame_bytes)
    rows. The fake path slices the blob into fixed-size 'frames' to
    exercise the one-to-many batch shape (input row → n output rows)."""

    schema = "id long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError("video codec not available; wire pyav/ffmpeg here")
            out_ids, out_idx, out_frames = [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                chunks = [blob[i : i + 16] for i in range(0, len(blob), 16)]
                for fi, ch in enumerate(chunks[::every_n]):
                    out_ids.append(_id)
                    out_idx.append(fi)
                    out_frames.append(bytes(ch))
            yield pd.DataFrame({"id": out_ids, "frame_idx": out_idx, "frame": out_frames})

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


_AUDIO_FEATURE_SCHEMA = "id long, n_bytes long, duration_s double, sample_rate int, rms double"


def decode_audio_features(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    fake_decode: bool = False,
    assumed_rate: int = 16_000,
) -> DataFrame:
    """Audio decode stub via ``mapInPandas`` — same contract as the
    image path: real schema/partitioning/batch shape, codec behind
    NotImplementedError (wire soundfile/librosa there), deterministic
    fake deriving duration/rms from the raw bytes for tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "audio codec not available in this environment; "
                    "install soundfile/librosa and decode pdf[bin_col] here"
                )
            blobs = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    # fake: bytes as 16-bit mono samples at assumed_rate
                    "duration_s": blobs.map(
                        lambda b: round(len(b) / 2 / assumed_rate, 6)
                    ).astype("float64"),
                    "sample_rate": assumed_rate,
                    "rms": blobs.map(
                        lambda b: round(
                            (sum(x * x for x in b[:512]) / max(1, len(b[:512]))) ** 0.5, 6
                        )
                    ).astype("float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=_AUDIO_FEATURE_SCHEMA)
