"""Multimodal columns — image/audio/video payloads as opaque ``binary``
columns with typed metadata, plus the Pandas-UDF decode/feature path
(BASELINE.json north star).

The decode step is ONE code path with tiered decoders: PIL when it
imports; a pure-stdlib baseline-PNG codec (``functions/png_min.py``)
for PNG payloads when PIL is absent — so real image decode works even
in this imageless container and is golden-tested everywhere, no
skips; and for bytes neither tier can parse — including this
fixture's synthetic text payloads — a deterministic sha256-derived
stub that the DuckDB oracle reproduces exactly. So the oracle stays
green regardless of installed libraries, and the real path is always
under test (tests/test_multimodal.py). The Spark-side plumbing —
binary columns, Arrow-batched ``mapInPandas``, explicit output
schema, partition-preserving batch iteration — is identical in every
tier.

Scale notes: payload bytes ride in the row (parquet binary columns are
page-compressed and column-pruned away by any query not selecting
them); feature extraction is ``mapInPandas`` so Python sees Arrow
record batches (thousands of rows per batch), never row-at-a-time
pickling. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from end2end_data_pipeline_spark.functions import png_min
from end2end_data_pipeline_spark.functions import texthash as th
from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import load_table

try:  # decode libraries are absent in this environment by design
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


@query(
    "multimodal_meta",
    # `text || ':w'`, not concat(): a NULL payload must yield NULL
    # metadata on BOTH engines, and DuckDB's variadic concat() skips
    # NULL args (width would come out as md5h(':w') while n_bytes and
    # the sha are NULL) where `||` null-propagates like Spark's concat
    # (r13 null-flood sweep).
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha,
           CAST(16 + {th.md5h("(text || ':w')", th.DUCK)} % 1024 AS INT) AS width,
           CAST(16 + {th.md5h("(text || ':h')", th.DUCK)} % 1024 AS INT) AS height
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads, computed entirely JVM-side:
    byte length, content hash, and (stub) decoded dimensions derived
    deterministically from the content. This is the 'cheap metadata
    without decoding' path a media pipeline runs at full scale."""
    docs = load_table(spark, sf_dir, "documents")
    w_h = th.md5h("concat(text, ':w')", th.SPARK)
    h_h = th.md5h("concat(text, ':h')", th.SPARK)
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("text").cast("binary"), 256).alias("payload_sha"),
        F.expr(f"CAST(16 + {w_h} % 1024 AS INT)").alias("width"),
        F.expr(f"CAST(16 + {h_h} % 1024 AS INT)").alias("height"),
    ).orderBy("doc_id")


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("mean_luma", IntegerType(), False),
    ]
)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fallback decode: fake dimensions derived from the
    content hash, so non-image payloads (and this container, which has
    no PIL) get stable, oracle-checkable features and the Arrow
    plumbing is exercised end-to-end."""
    digest = hashlib.sha256(payload).digest()
    return {
        "format": "fake/raw",
        "width": 16 + digest[0] * 4,
        "height": 16 + digest[1] * 4,
        "n_channels": 1 + digest[2] % 4,
        "mean_luma": digest[3],
    }


def _decode_real(payload: bytes) -> dict:
    """Real decode (requires PIL): format, dimensions, band count, and
    integer mean luminance over the 8-bit grayscale rendering."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    gray = img.convert("L").tobytes()
    return {
        "format": (img.format or "unknown").lower(),
        "width": img.width,
        "height": img.height,
        "n_channels": len(img.getbands()),
        "mean_luma": int(sum(gray) // max(1, len(gray))),
    }


def _decode_png_min(payload: bytes) -> dict:
    """PIL-less real decode for baseline PNGs via the pure-stdlib
    codec: true dimensions/bands and the same ITU-R 601-2 mean-luma
    rendering as the PIL tier."""
    w, h, mode, pixels = png_min.decode_png(payload)
    return {
        "format": "png",
        "width": w,
        "height": h,
        "n_channels": len(mode),
        "mean_luma": png_min.luma(pixels, mode),
    }


def decode_features(payload: bytes) -> dict:
    """ONE decode path, tiered: PIL when importable; the stdlib
    baseline-PNG codec for PNGs otherwise; the deterministic stub for
    bytes neither can parse (including this fixture's text payloads —
    so the stub oracle stays green on any machine)."""
    if _HAS_PIL:
        try:
            return _decode_real(payload)
        except (OSError, ValueError, SyntaxError):
            # UnidentifiedImageError subclasses OSError; truncated or
            # malformed payloads can also surface as ValueError
            # (decompression) or SyntaxError (PIL's PNG plugin raises
            # it for bad headers) — any undecodable byte string falls
            # back to the stub instead of crashing the task
            pass
    else:
        try:
            return _decode_png_min(payload)
        except ValueError:
            pass
    return _decode_stub(payload)


def _extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow record batches in, feature rows out."""
    for pdf in batches:
        feats = [decode_features(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "format": [f["format"] for f in feats],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "n_channels": [f["n_channels"] for f in feats],
                "mean_luma": [f["mean_luma"] for f in feats],
            }
        )


def _sha_byte(duck_sha_expr: str, k: int) -> str:
    """DuckDB expression for byte ``k`` of a sha256 digest rendered as
    hex — the oracle-side mirror of ``hashlib.sha256(...).digest()[k]``
    (same '0x'||substr trick as ``texthash.md5h``)."""
    return f"(('0x' || substr({duck_sha_expr}, {2 * k + 1}, 2))::INT)"


_SHA = "sha256(text)"

@query(
    "multimodal_decode_features",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'fake/raw' AS format,
           CAST(16 + {_sha_byte(_SHA, 0)} * 4 AS INT) AS width,
           CAST(16 + {_sha_byte(_SHA, 1)} * 4 AS INT) AS height,
           CAST(1 + {_sha_byte(_SHA, 2)} % 4 AS INT) AS n_channels,
           CAST({_sha_byte(_SHA, 3)} AS INT) AS mean_luma
    FROM documents WHERE text IS NOT NULL ORDER BY doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract path: binary payload column ->
    Arrow-batched ``mapInPandas`` -> typed feature rows. The decode
    itself is the stub above; everything Spark-side (binary encoding,
    batch transfer, schema contract) is the production shape. The stub
    derives dimensions from sha256 digest bytes, which the DuckDB
    oracle reproduces exactly — so the whole Arrow round-trip is
    value-checked, not just smoke-tested."""
    docs = load_table(spark, sf_dir, "documents")
    # payload-less rows (NULL text) are SKIPPED by the decode pass —
    # the dead-letter semantics of a media pipeline: there is nothing
    # to decode, and the non-nullable feature schema stays honest
    # (r13 null-flood sweep; the oracle filters identically)
    payloads = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return payloads.mapInPandas(_extract_features, FEATURE_SCHEMA).orderBy("doc_id")


RESIZE_TARGET = (64, 64)
FRAME_SAMPLE_EVERY_MS = 1000

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("resized", BinaryType(), False),
    ]
)


def _resize_stub(payload: bytes, target: tuple[int, int]) -> bytes:
    """Deterministic fallback resize: byte projection to target w*h
    bytes (repeat/truncate the content hash) so output SIZE and
    determinism match what a real thumbnail path must guarantee."""
    w, h = target
    need = w * h
    digest = hashlib.sha256(payload).digest()
    return (digest * (need // len(digest) + 1))[:need]


def resize_payload(payload: bytes, target: tuple[int, int]) -> bytes:
    """ONE resize path, tiered like ``decode_features``: PIL grayscale
    thumbnail when PIL parses the payload; stdlib PNG decode +
    nearest-neighbor grayscale resize for PNGs otherwise; the
    deterministic stub for everything else — every tier emits exactly
    ``target[0] * target[1]`` bytes."""
    if _HAS_PIL:
        try:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload))
            return img.convert("L").resize(target).tobytes()
        except OSError:
            pass
    else:
        try:
            w, h, mode, pixels = png_min.decode_png(payload)
            return png_min.resize_gray_nearest(
                png_min.to_gray(pixels, mode), w, h, target
            )
        except ValueError:
            pass
    return _resize_stub(payload, target)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "width": RESIZE_TARGET[0],
                "height": RESIZE_TARGET[1],
                "resized": [resize_payload(p, RESIZE_TARGET) for p in pdf["payload"]],
            }
        )


@query(
    "multimodal_resize",
    # the 64x64 stub thumbnail is the 32-byte sha256 digest repeated
    # exactly 4096/32 = 128 times, so its hex form is the hex digest
    # repeated 128 times — exact in DuckDB.
    oracle="""
    SELECT doc_id,
           CAST(64 AS INT) AS width,
           CAST(64 AS INT) AS height,
           repeat(sha256(text), 128) AS resized_hex
    FROM documents WHERE text IS NOT NULL ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/resize path: binary in, fixed-shape binary out through
    Arrow-batched ``mapInPandas``. The decode/encode is stubbed; the
    engine-side contract (schema, batch shape, per-partition
    parallelism, binary round-trip) is real. At 100 TB this is the
    pattern for bulk image normalization: no shuffle, map-only, output
    parquet binary columns. The registered query hex-encodes the bytes
    at the output boundary purely so the DuckDB oracle can value-check
    the binary round-trip (raw binary stringifies engine-specifically);
    production consumers would keep the ``resized`` binary column."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    resized = payloads.mapInPandas(_resize_batches, RESIZE_SCHEMA)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.lower(F.hex("resized")).alias("resized_hex"),
    ).orderBy("doc_id")


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """One input row (a 'video') fans out to one row per sampled frame
    — the mapInPandas analog of a generator/explode with Python decode
    in the loop. Frame count is derived from payload size (stub for
    container duration); each frame is a deterministic slice."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(1, len(payload) // 100)  # stub: ~1 frame/100 bytes
            for i in range(n_frames):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_ts_ms"].append(i * FRAME_SAMPLE_EVERY_MS)
                lo = (i * 100) % max(1, len(payload) - 32)
                out["frame"].append(bytes(payload[lo : lo + 32]))
        yield pd.DataFrame(out)


@query(
    "multimodal_frame_sample",
    # Frame math mirrored in SQL: n_frames = max(1, n_bytes // 100),
    # frame i = 32 bytes at offset (i*100) % max(1, n_bytes-32). The
    # documents fixture is pure ASCII (asserted in tests), so byte
    # slices of the payload equal char slices of the text and DuckDB's
    # substr reproduces them; frames are hex-encoded at the boundary
    # because raw binary stringifies engine-specifically.
    oracle=f"""
    WITH fanout AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             text,
             unnest(range(0, greatest(1, octet_length(encode(text)) // 100)))
               AS frame_idx
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * {FRAME_SAMPLE_EVERY_MS} AS BIGINT) AS frame_ts_ms,
           lower(hex(encode(substr(text,
               CAST((frame_idx * 100) % greatest(1, n_bytes - 32) AS INT) + 1,
               32)))) AS frame_hex
    FROM fanout ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling path (video/audio): each binary payload explodes
    into N typed frame rows inside the Arrow batch iterator — the
    production shape for ffmpeg-style frame extraction (map-side fanout,
    no shuffle until someone aggregates frames)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    frames = payloads.mapInPandas(_frame_sample_batches, FRAME_SCHEMA)
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_ts_ms",
        F.lower(F.hex("frame")).alias("frame_hex"),
    ).orderBy("doc_id", "frame_idx")


# --- audio tier -------------------------------------------------------
# WAV parses with the stdlib ``wave`` module, so unlike images the
# REAL audio decode needs no optional dependency: header fields plus
# exact-integer PCM16 energy stats. Non-WAV bytes fall to the same
# deterministic sha256 stub contract as the image tier.

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("codec", StringType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("sum_abs_pcm", LongType(), False),
        StructField("peak_pcm", IntegerType(), False),
    ]
)


def _audio_stub(payload: bytes) -> dict:
    digest = hashlib.sha256(payload).digest()
    return {
        "codec": "fake/raw",
        "n_channels": 1 + digest[0] % 2,
        "sample_rate": 8000 * (1 + digest[1] % 6),
        "n_frames": int.from_bytes(digest[2:4], "big"),
        "duration_ms": 0,
        "sum_abs_pcm": 0,
        "peak_pcm": 0,
    }


def audio_features(payload: bytes) -> dict:
    """Real WAV parse when the bytes are RIFF/WAVE; deterministic stub
    otherwise. PCM16 energy accumulates in exact integers (|sample|
    sum + peak), so any two runs — or engines — agree bit-for-bit;
    duration_ms floors the exact rational frames*1000/rate."""
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch, sw, rate, n_frames = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            pcm = w.readframes(n_frames)
        out = {
            "codec": f"pcm{8 * sw}",
            "n_channels": n_ch,
            "sample_rate": rate,
            "n_frames": n_frames,
            "duration_ms": n_frames * 1000 // rate if rate else 0,
            "sum_abs_pcm": 0,
            "peak_pcm": 0,
        }
        if sw == 2 and pcm:
            import numpy as np

            v = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
            a = np.abs(v.astype(np.int64))
            out["sum_abs_pcm"] = int(a.sum())
            out["peak_pcm"] = int(a.max())
        return out
    except (wave.Error, EOFError, ValueError):
        return _audio_stub(payload)


def _extract_audio(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow record batches in, audio rows out."""
    for pdf in batches:
        feats = [audio_features(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "codec": [f["codec"] for f in feats],
                "n_channels": [f["n_channels"] for f in feats],
                "sample_rate": [f["sample_rate"] for f in feats],
                "n_frames": [f["n_frames"] for f in feats],
                "duration_ms": [f["duration_ms"] for f in feats],
                "sum_abs_pcm": [f["sum_abs_pcm"] for f in feats],
                "peak_pcm": [f["peak_pcm"] for f in feats],
            }
        )


def extract_audio_features(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> typed audio features, Arrow-batched.
    Same plumbing contract as the image tier: explicit schema,
    partition-preserving batches, no row-at-a-time Python."""
    return payloads.mapInPandas(_extract_audio, AUDIO_SCHEMA)


# --- video tier -------------------------------------------------------
# The AVI container's headers parse with pure stdlib struct unpacking
# (functions/avi_min.py), so like WAV — and unlike full video decode —
# the REAL metadata tier needs no optional dependency: resolution,
# frame count, and frame duration straight from avih. Non-AVI bytes
# fall to the deterministic sha256 stub contract of the other tiers.

VIDEO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("container", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("usec_per_frame", LongType(), False),
        StructField("duration_ms", LongType(), False),
    ]
)


def _video_stub(payload: bytes) -> dict:
    digest = hashlib.sha256(payload).digest()
    return {
        "container": "fake/raw",
        "width": 16 * (1 + digest[0] % 8),
        "height": 16 * (1 + digest[1] % 8),
        "n_frames": int.from_bytes(digest[2:4], "big"),
        "usec_per_frame": 0,
        "duration_ms": 0,
    }


def video_features(payload: bytes) -> dict:
    """Real AVI header parse when the bytes are RIFF/AVI; deterministic
    stub otherwise — the video analog of ``audio_features``."""
    from end2end_data_pipeline_spark.functions.avi_min import parse_avi

    meta = parse_avi(payload)
    if meta is None:
        return _video_stub(payload)
    return {k: meta[k] for k in (
        "container", "width", "height", "n_frames",
        "usec_per_frame", "duration_ms",
    )}


def _extract_video(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [video_features(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "container": [f["container"] for f in feats],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "n_frames": [f["n_frames"] for f in feats],
                "usec_per_frame": [f["usec_per_frame"] for f in feats],
                "duration_ms": [f["duration_ms"] for f in feats],
            }
        )


def extract_video_features(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> typed container metadata, Arrow-
    batched — same plumbing contract as the image and audio tiers."""
    return payloads.mapInPandas(_extract_video, VIDEO_SCHEMA)


# --- exact PNG pixel-stat tier ---------------------------------------
# The tiered ``decode_features`` prefers PIL when importable, whose
# convert('L') ROUNDS the ITU-R 601-2 luma while the stdlib codec
# FLOORS — fine for the stubbed census, wrong for a hash oracle. This
# extractor pins the pure-stdlib codec (functions/png_min.py) so the
# numbers are identical on every machine, PIL installed or not.

PNG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("mean_luma", LongType(), False),
        StructField("sum_gray", LongType(), False),
        StructField("rgb_checksum", LongType(), False),
    ]
)


def png_pixel_stats(payload: bytes) -> dict:
    """Exact integer pixel statistics for a baseline PNG via the
    stdlib codec: floored per-pixel ITU-R 601-2 luma (summed and
    mean'd in exact integers) plus the raw channel-sum checksum."""
    import numpy as np

    w, h, mode, pixels = png_min.decode_png(payload)
    nch = len(mode)
    px = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
    if mode in ("L", "LA"):
        gray = px.reshape(-1, nch)[:, 0]
    else:
        rgb = px.reshape(-1, nch)
        gray = (rgb[:, 0] * 299 + rgb[:, 1] * 587 + rgb[:, 2] * 114) // 1000
    return {
        "format": "png",
        "width": w,
        "height": h,
        "n_channels": nch,
        "mean_luma": int(gray.sum() // max(1, len(gray))),
        "sum_gray": int(gray.sum()),
        "rgb_checksum": int(px.sum()),
    }


def _extract_png_stats(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [png_pixel_stats(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "format": [f["format"] for f in feats],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "n_channels": [f["n_channels"] for f in feats],
                "mean_luma": [f["mean_luma"] for f in feats],
                "sum_gray": [f["sum_gray"] for f in feats],
                "rgb_checksum": [f["rgb_checksum"] for f in feats],
            }
        )


def extract_png_stats(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> exact PNG pixel statistics, Arrow-
    batched — the hash-oracle-grade image tier (raises on non-PNG
    bytes rather than stubbing: a parity query wants loud failures)."""
    return payloads.mapInPandas(_extract_png_stats, PNG_STATS_SCHEMA)
