"""Multimodal operator unit tests: the Arrow/mapInPandas plumbing must
be deterministic and schema-exact even though the decode itself is a
stub (the container has no image/audio libraries by design)."""

from __future__ import annotations

import pytest

from end2end_data_pipeline_spark.operators.multimodal import (
    FRAME_SCHEMA,
    RESIZE_SCHEMA,
    RESIZE_TARGET,
    _decode_stub,
    _resize_stub,
    multimodal_decode_features,
    multimodal_frame_sample,
    multimodal_resize,
)

SF = "/root/testdata/sf0.001"


def test_decode_stub_deterministic():
    a = _decode_stub(b"payload-1")
    assert a == _decode_stub(b"payload-1")
    assert a != _decode_stub(b"payload-2")
    assert 16 <= a["width"] <= 16 + 255 * 4


def test_resize_stub_shape():
    out = _resize_stub(b"whatever bytes", RESIZE_TARGET)
    assert len(out) == RESIZE_TARGET[0] * RESIZE_TARGET[1]
    assert out == _resize_stub(b"whatever bytes", RESIZE_TARGET)


def test_decode_features_schema_and_rows(spark):
    df = multimodal_decode_features(spark, SF)
    assert df.schema == (
        df.schema.__class__(df.schema.fields)
    )  # stable StructType
    rows = df.limit(5).collect()
    assert len(rows) == 5
    assert all(r.n_bytes > 0 for r in rows)


def test_resize_output_contract(spark):
    df = multimodal_resize(spark, SF)
    # registered query hex-encodes the binary at the output boundary
    assert df.columns == ["doc_id", "width", "height", "resized_hex"]
    rows = df.limit(3).collect()
    for r in rows:
        # 2 hex chars per output byte
        assert len(r.resized_hex) == RESIZE_TARGET[0] * RESIZE_TARGET[1] * 2
        assert (r.width, r.height) == RESIZE_TARGET


def test_documents_fixture_is_ascii(spark):
    """The frame-sample oracle equates byte slices of the payload with
    char slices of the text — valid only while the documents fixture is
    pure ASCII. If this ever fails, the oracle must switch to a
    byte-accurate form."""
    from end2end_data_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF, "documents")
    n_multibyte = docs.where(
        F.octet_length("text") != F.length("text")
    ).count()
    assert n_multibyte == 0


def test_frame_sample_fanout(spark):
    df = multimodal_frame_sample(spark, SF)
    assert df.columns == ["doc_id", "frame_idx", "frame_ts_ms", "frame_hex"]
    # one doc fans out to multiple frames with millisecond spacing
    first = df.where("doc_id = 0").collect()
    assert len(first) >= 1
    assert [r.frame_idx for r in first] == list(range(len(first)))
    assert all(r.frame_ts_ms == r.frame_idx * 1000 for r in first)


def test_frame_sample_counts_match_payload_size(spark):
    from end2end_data_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.octet_length("text").alias("n")
    )
    expected = {r.doc_id: max(1, r.n // 100) for r in docs.collect()}
    got = {
        r.doc_id: r.cnt
        for r in multimodal_frame_sample(spark, SF)
        .groupBy("doc_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert got == expected


# --- real-decode path (one code path, optional dependency) ---------------

def test_dispatch_falls_back_to_stub_on_non_image_bytes():
    """Text bytes are not an image: the dispatcher must produce the
    stub's deterministic features whether or not PIL is installed —
    this is what keeps the registered queries oracle-green."""
    from end2end_data_pipeline_spark.operators.multimodal import (
        decode_features,
        resize_payload,
    )

    payload = b"just some document text, definitely not a PNG"
    assert decode_features(payload) == _decode_stub(payload)
    assert resize_payload(payload, RESIZE_TARGET) == _resize_stub(
        payload, RESIZE_TARGET
    )


def test_real_decode_of_genuine_png():
    """Golden test for the real path, tier-agnostic: a genuine PNG
    decodes to its true dimensions/bands, not the stub's hash-derived
    fakes — via PIL when installed, via the stdlib baseline-PNG codec
    otherwise (no skips either way)."""
    from end2end_data_pipeline_spark.functions.png_min import encode_png
    from end2end_data_pipeline_spark.operators.multimodal import decode_features

    png = encode_png(5, 3, bytes([120, 200, 10]) * 15, "RGB")
    feats = decode_features(png)
    assert feats["format"] == "png"
    assert (feats["width"], feats["height"]) == (5, 3)
    assert feats["n_channels"] == 3
    # constant image: both tiers apply the ITU-R 601-2 weights exactly
    assert feats["mean_luma"] == (120 * 299 + 200 * 587 + 10 * 114) // 1000


def test_real_resize_of_genuine_png():
    from end2end_data_pipeline_spark.functions.png_min import encode_png
    from end2end_data_pipeline_spark.operators.multimodal import resize_payload

    png = encode_png(100, 40, bytes([77]) * 4000, "L")
    out = resize_payload(png, RESIZE_TARGET)
    assert len(out) == RESIZE_TARGET[0] * RESIZE_TARGET[1]
    assert set(out) == {77}  # constant image stays constant through resize


def test_real_decode_falls_back_on_malformed_payload(monkeypatch):
    """Payloads that make the real decoder raise ValueError/SyntaxError
    (truncated/corrupt images) fall back to the stub instead of
    crashing the task."""
    from end2end_data_pipeline_spark.operators import multimodal

    for exc in (ValueError("bad zlib"), SyntaxError("broken PNG header"), OSError("x")):
        def boom(payload, _exc=exc):
            raise _exc

        monkeypatch.setattr(multimodal, "_decode_real", boom)
        monkeypatch.setattr(multimodal, "_HAS_PIL", True)
        assert multimodal.decode_features(b"junk") == _decode_stub(b"junk")


def test_audio_features_real_wav(spark):
    """The stdlib WAV tier parses real PCM16 audio: header fields,
    exact duration floor, and exact-integer energy stats."""
    import io
    import wave

    from end2end_data_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    def make_wav(rate, samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                b"".join(s.to_bytes(2, "little", signed=True) for s in samples)
            )
        return buf.getvalue()

    samples = [0, 100, -200, 300, -32768]
    rows = [
        (1, make_wav(16000, samples)),
        (2, make_wav(8000, [5] * 12000)),  # 1.5 s
        (3, b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    a = got[1]
    assert (a["codec"], a["n_channels"], a["sample_rate"]) == ("pcm16", 1, 16000)
    assert a["n_frames"] == 5
    assert a["sum_abs_pcm"] == 0 + 100 + 200 + 300 + 32768
    assert a["peak_pcm"] == 32768
    b = got[2]
    assert b["duration_ms"] == 1500 and b["sum_abs_pcm"] == 5 * 12000
    assert got[3]["codec"] == "fake/raw"  # deterministic stub fallback


def test_audio_from_tar_shards(spark, tmp_path):
    """Audio payloads ride the WebDataset shard path like images."""
    import io
    import wave

    from pyspark.sql import functions as F

    from end2end_data_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )
    from end2end_data_pipeline_spark.sources.webdataset import (
        read_webdataset_samples,
        write_tar_shards,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x01\x00" * 882)  # 441 stereo frames = 10 ms
    write_tar_shards([("clip0", {"wav": buf.getvalue(), "txt": b"x"})], str(tmp_path))
    payloads = read_webdataset_samples(spark, str(tmp_path)).select(
        F.lit(0).cast("long").alias("doc_id"),
        F.col("files")["wav"].alias("payload"),
    )
    r = extract_audio_features(payloads).collect()[0]
    assert (r["n_channels"], r["sample_rate"], r["n_frames"]) == (2, 44100, 441)
    assert r["duration_ms"] == 10 and r["sum_abs_pcm"] == 882
