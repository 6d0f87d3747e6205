"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``BinaryType`` columns plus typed metadata. The
Spark-side plumbing — schema, partition sizing, Arrow batch shape,
``mapInPandas`` signatures — is real and tested, and so is the decode
for uncompressed container formats, which need no codec library:

- **BMP** images (24-bit uncompressed): pure ``struct`` header parse +
  numpy pixel statistics;
- **WAV** audio (PCM): stdlib ``wave`` + numpy RMS.

Compressed formats (JPEG/PNG/MP3/MP4) require codec libraries that are
not in this container; those paths raise ``NotImplementedError`` at
the exact line a pillow/soundfile/pyav call would slot into. The
deterministic fake (``fake_decode=True``) exercises the distributed
batch shapes for any payload.

NULL payload rows are EXCLUDED by every decoder/hasher here (r17
self-review): ``bytes(None)`` inside the Arrow worker otherwise dies
with a cryptic TypeError mid-executor, and a missing blob has no
features/signature to contribute (the text family's explode-drop
semantics). Filter upstream if you need the gap rows accounted.

At scale the ingest path is ``spark.read.format("binaryFile")`` (one
row per object: path, modificationTime, length, content) with
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs
fits executor memory.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary",
    "binary_metadata",
    "decode_bmp",
    "decode_wav",
    "decode_image_features",
    "decode_audio_features",
    "sample_frames",
    "ahash_bmp",
    "ahash_bytes",
    "image_ahash",
    "audio_fingerprint_wav",
    "audio_fingerprints",
    "synthesize_wav",
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


# ---------------------------------------------------------------------------
# real decoders (no codec library needed)
# ---------------------------------------------------------------------------


def decode_bmp(blob: bytes) -> tuple[int, int, float]:
    """(width, height, mean_px) for an uncompressed 24-bit BMP —
    struct header parse + numpy over the pixel rows (bottom-up layout,
    4-byte row padding excluded from the mean)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24bpp uncompressed BMP (got bpp={bpp})")
    # reject degenerate headers loudly (r17 self-review): a negative
    # width makes the frombuffer count negative (numpy then reads the
    # WHOLE buffer), and zero-area images would emit a silent NaN mean
    if width <= 0 or height == 0:
        raise ValueError(f"malformed BMP dimensions {width}x{height}")
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    px = np.frombuffer(blob, dtype=np.uint8, count=stride * height, offset=data_off)
    rows = px.reshape(height, stride)[:, : width * 3]
    return width, height, float(rows.astype(np.float64).mean())


def decode_wav(blob: bytes, rms_frames: int = 65536) -> tuple[float, int, float]:
    """(duration_s, sample_rate, rms) for a PCM WAV via the stdlib
    ``wave`` reader; RMS over the first ``rms_frames`` 16-bit frames."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        rate, nframes, width = w.getframerate(), w.getnframes(), w.getsampwidth()
        raw = w.readframes(min(nframes, rms_frames))
    duration = nframes / rate if rate else 0.0
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise NotImplementedError(f"PCM width {width} not handled")
    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
    return duration, rate, rms


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

    BMP payloads decode for real (``decode_bmp``); compressed formats
    raise at the line a pillow/opencv call slots into.
    ``fake_decode=True`` derives deterministic pseudo-features from the
    bytes instead, for plumbing tests with arbitrary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, ws, hs, means = [], [], [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                blob = bytes(blob)
                if fake_decode:
                    w, h = 1 + (len(blob) % 64), 1 + ((len(blob) // 64) % 64)
                    m = round(sum(blob[:256]) / max(1, len(blob[:256])), 6)
                elif blob[:2] == b"BM":
                    w, h, m = decode_bmp(blob)
                    m = round(m, 6)
                else:
                    raise NotImplementedError(
                        "compressed image codec not available in this "
                        "environment; install pillow/opencv and decode here"
                    )
                ids.append(_id), nb.append(len(blob))
                ws.append(w), hs.append(h), means.append(m)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_px": pd.Series(means, dtype="float64"),
                }
            )

    return (
        df.filter(F.col(bin_col).isNotNull())
        .select(id_col, bin_col)
        .mapInPandas(run, schema=_IMAGE_FEATURE_SCHEMA)
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    bin_col: str = "content",
    id_col: str = "doc_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Video frame sampling: emits (id, frame_idx, frame_bytes) rows.
    Real video demuxing needs pyav/ffmpeg (not in this container) —
    that path raises; the fake path slices the blob into fixed-size
    'frames' to exercise the one-to-many batch shape (input row →
    n output rows)."""

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

    return (
        df.filter(F.col(bin_col).isNotNull())
        .select(id_col, bin_col)
        .mapInPandas(run, schema=schema)
    )


_AUDIO_FEATURE_SCHEMA = "id long, n_bytes long, duration_s double, sample_rate int, rms double"


def decode_audio_features(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    fake_decode: bool = False,
    assumed_rate: int = 16_000,
) -> DataFrame:
    """Audio feature extraction via ``mapInPandas`` — same contract as
    the image path. PCM WAV payloads (RIFF magic) decode for real with
    the stdlib ``wave`` reader (``decode_wav``); compressed audio
    raises where a soundfile/librosa call slots in; the deterministic
    fake derives duration/rms from raw bytes for plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, durs, rates, rmss = [], [], [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                blob = bytes(blob)
                if fake_decode:
                    dur = round(len(blob) / 2 / assumed_rate, 6)
                    rate = assumed_rate
                    rms = round(
                        (sum(x * x for x in blob[:512]) / max(1, len(blob[:512]))) ** 0.5, 6
                    )
                elif blob[:4] == b"RIFF":
                    dur, rate, rms = decode_wav(blob)
                    dur, rms = round(dur, 6), round(rms, 6)
                else:
                    raise NotImplementedError(
                        "compressed audio codec not available in this "
                        "environment; install soundfile/librosa and decode here"
                    )
                ids.append(_id), nb.append(len(blob))
                durs.append(dur), rates.append(rate), rmss.append(rms)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return (
        df.filter(F.col(bin_col).isNotNull())
        .select(id_col, bin_col)
        .mapInPandas(run, schema=_AUDIO_FEATURE_SCHEMA)
    )


def ahash_bmp(blob: bytes, grid: int = 8) -> int:
    """Average hash (aHash — the classic perceptual image hash,
    public technique): decode, grayscale, RESIZE to ``grid``×``grid``
    by block means (the stdlib resize this container's lack of codec
    libraries otherwise denies us), then one bit per cell — 1 iff the
    cell mean exceeds the grid's mean. Near-identical images (noise,
    re-encode, small edits) land within a few bits of Hamming
    distance; the hash is deterministic, so signatures are
    reproducible across runs and machines."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24bpp uncompressed BMP (got bpp={bpp})")
    if width <= 0 or height == 0:  # see decode_bmp: loud, not a NaN/overread
        raise ValueError(f"malformed BMP dimensions {width}x{height}")
    flipped = height > 0  # positive height = bottom-up row order
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    px = np.frombuffer(blob, dtype=np.uint8, count=stride * height, offset=data_off)
    rows = px.reshape(height, stride)[:, : width * 3].astype(np.float64)
    gray = rows.reshape(height, width, 3).mean(axis=2)
    if flipped:
        gray = gray[::-1]
    # block-mean resize: split both axes into `grid` runs (sizes differ
    # by at most 1 when not divisible) and average each cell
    cells = np.empty((grid, grid), dtype=np.float64)
    for i, rband in enumerate(np.array_split(gray, grid, axis=0)):
        for j, cell in enumerate(np.array_split(rband, grid, axis=1)):
            cells[i, j] = cell.mean() if cell.size else 0.0
    bits = (cells > cells.mean()).astype(np.uint64).ravel()
    h = 0
    for i, b in enumerate(bits):
        h |= int(b) << i
    # fold to signed 64-bit (Spark LongType)
    return h - (1 << 64) if h >= (1 << 63) else h


def ahash_bytes(blob: bytes, bits: int = 60) -> int:
    """Average hash over a raw byte strip: the aHash recipe
    (:func:`ahash_bmp`) applied to the payload as a 1-D grayscale
    signal — ``bits`` block means, one bit per block, 1 iff the block
    mean exceeds the whole-payload mean. LOCALITY-sensitive: payloads
    differing by a few localized bytes land within a few bits of
    Hamming distance. The comparison is done in exact integer
    arithmetic (``block_sum * total_len > total_sum * block_len``) so
    the signature is bit-reproducible in any engine — no float-tie
    divergence between numpy and a SQL oracle."""
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
    n = arr.size
    if n == 0:
        return 0
    blk = (np.arange(n) * bits) // n
    block_sum = np.zeros(bits, np.int64)
    np.add.at(block_sum, blk, arr)
    block_len = np.bincount(blk, minlength=bits).astype(np.int64)
    total_sum, total_len = int(arr.sum()), n
    h = 0
    for j in range(bits):
        if int(block_sum[j]) * total_len > total_sum * int(block_len[j]):
            h |= 1 << j
    return h


def image_ahash(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    grid: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Per-image perceptual hashes via ``mapInPandas`` (Arrow-batched
    decode, the multimodal hot-path shape). Returns (id, ahash long).
    Pair with :func:`fabrix_spark.operators.dedup.hamming_pairs`
    (bits=64) for banded image near-dup at corpus scale: signatures
    are 8 bytes/image, candidates come from a chunk equi-join, and the
    corpus of image bytes is read exactly once, here.

    ``fake=True`` swaps the 2-D BMP decode for :func:`ahash_bytes` —
    the same aHash algorithm on the raw byte strip (60 bits). It is
    still locality-sensitive (near-identical payloads → small Hamming
    distance) and works on any payload, so it exercises the full
    signature→banded-join pipeline without codec libraries; a real
    image decode slots in at ``fake=False``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                ids.append(_id)
                if fake:
                    hs.append(ahash_bytes(bytes(blob)))
                else:
                    hs.append(ahash_bmp(bytes(blob), grid))
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"), "ahash": pd.Series(hs, dtype="int64")}
            )

    return (
        df.filter(F.col(bin_col).isNotNull())
        .select(id_col, bin_col)
        .mapInPandas(run, schema="id long, ahash long")
    )


def audio_fingerprint_wav(blob: bytes, frames: int = 64) -> int:
    """Energy-delta audio fingerprint (the classic Haitsma-Kalker
    shape, public technique, reduced to one band): decode PCM, split
    into ``frames`` equal windows, one bit per adjacent-window pair —
    1 iff energy increases. Robust to gain changes (energy RATIOS
    drive the bits) and small noise; deterministic, so fingerprints
    reproduce across runs and machines. Returns a signed 64-bit int
    (``frames``-1 ≤ 64 bits, Spark LongType)."""
    if frames < 2 or frames > 65:
        raise ValueError("frames must be in [2, 65] for a 64-bit fingerprint")
    import io
    import wave

    if blob[:4] != b"RIFF":
        raise NotImplementedError(
            "compressed audio codec not available in this environment; "
            "install soundfile/librosa and decode here"
        )
    with wave.open(io.BytesIO(blob)) as w:
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    samples = np.frombuffer(raw, dtype=dtype).astype(np.int64)
    # per-window energies via ONE cumulative sum instead of a Python
    # list comprehension over 64 array_split views (the 64 tiny numpy
    # calls per row dominated the kernel — guide §4.2: hand the whole
    # row to vectorized code once). Window boundaries replicate
    # np.array_split exactly: r = n % frames leading windows of
    # q+1 samples, the rest of q. Energies are exact int64 (squares
    # ≤ 2^30, so any real clip is far from overflow — the old float64
    # path was only exact below 2^53 total).
    sq = samples * samples
    cs = np.zeros(len(sq) + 1, dtype=np.int64)
    np.cumsum(sq, out=cs[1:])
    q, r = divmod(len(samples), frames)
    sizes = np.full(frames, q, dtype=np.int64)
    sizes[:r] += 1
    bounds = np.zeros(frames + 1, dtype=np.int64)
    np.cumsum(sizes, out=bounds[1:])
    energies = cs[bounds[1:]] - cs[bounds[:-1]]
    bits = (np.diff(energies) > 0).astype(np.uint8)
    h = int.from_bytes(
        np.packbits(np.pad(bits, (0, 64 - len(bits))), bitorder="little").tobytes(),
        "little",
    )
    return h - (1 << 64) if h >= (1 << 63) else h


def synthesize_wav(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    rate: int = 8000,
) -> DataFrame:
    """Wrap a raw-bytes column as canonical mono 16-bit PCM WAV blobs
    (``wave``-module header, payload truncated to even length so every
    byte pair is one little-endian int16 sample) — the synthetic-audio
    path for exercising the audio operators against deterministic
    bytes, mirroring :func:`attach_binary` for images. Arrow-batched
    ``mapInPandas``; returns (id_col, content binary). The input is
    ``spread()`` first: per-row wave encoding is CPU-bound Python, and
    a single-row-group parquet input would otherwise pin the whole
    chain (this + the downstream fingerprint pass) to ONE task — a
    no-op on real multi-split inputs."""
    from .util import spread

    df = spread(df)

    # the canonical header is a fixed 44-byte RIFF preamble — build it
    # with struct.pack instead of driving the wave-module state machine
    # per row (byte-identical output, pinned by
    # test_synthesize_wav_header_matches_wave_module; ~20× less Python
    # per row — guide §4.2). Only the two length fields vary.
    import struct

    fmt = struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for _id, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                raw = raw[: len(raw) // 2 * 2]
                blob = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(raw))
                    + b"WAVEfmt "
                    + fmt
                    + b"data"
                    + struct.pack("<I", len(raw))
                    + raw
                )
                ids.append(_id)
                blobs.append(blob)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "content": blobs}
            )

    return df.filter(F.col(payload_col).isNotNull()).select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, content binary"
    )


def audio_fingerprints(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    frames: int = 64,
) -> DataFrame:
    """Per-clip audio fingerprints via ``mapInPandas`` (Arrow-batched,
    audio bytes read exactly once). Returns (id, afp long). Pair with
    :func:`fabrix_spark.operators.dedup.hamming_pairs` (bits=64) for
    banded audio near-dup at corpus scale — the audio twin of
    :func:`image_ahash`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                ids.append(_id)
                hs.append(audio_fingerprint_wav(bytes(blob), frames))
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"), "afp": pd.Series(hs, dtype="int64")}
            )

    return (
        df.filter(F.col(bin_col).isNotNull())
        .select(id_col, bin_col)
        .mapInPandas(run, schema="id long, afp long")
    )
