"""WebDataset tar-shard source: member explode, sample regrouping,
multi-suffix keys, and dead-letter routing for corrupt shards."""

from __future__ import annotations

from end2end_data_pipeline_spark.sources.webdataset import (
    read_tar_shards,
    read_webdataset_samples,
    tar_shard_dead_letters,
    write_tar_shards,
)


def _corpus():
    return [
        (f"sample{i:03d}", {"jpg": bytes([i]) * (i + 1), "txt": f"caption {i}".encode(),
                            "cls.txt": b"7"})
        for i in range(5)
    ]


def test_members_roundtrip(spark, tmp_path):
    write_tar_shards(_corpus(), str(tmp_path), shard_size=3)
    rows = read_tar_shards(spark, str(tmp_path)).collect()
    assert len(rows) == 15  # 5 samples x 3 members
    got = {(r["key"], r["ext"]): bytes(r["content"]) for r in rows}
    assert got[("sample002", "jpg")] == b"\x02\x02\x02"
    assert got[("sample004", "txt")] == b"caption 4"
    # multi-suffix member keys to the same sample
    assert got[("sample000", "cls.txt")] == b"7"
    assert all(r["size"] == len(bytes(r["content"])) for r in rows)
    # two shards of 3 and 2 samples
    assert len({r["shard"] for r in rows}) == 2


def test_sample_regrouping(spark, tmp_path):
    write_tar_shards(_corpus(), str(tmp_path), shard_size=100)
    samples = {r["key"]: r for r in read_webdataset_samples(spark, str(tmp_path)).collect()}
    assert set(samples) == {f"sample{i:03d}" for i in range(5)}
    s1 = samples["sample001"]
    assert s1["n_files"] == 3
    assert set(s1["files"]) == {"jpg", "txt", "cls.txt"}
    assert bytes(s1["files"]["txt"]) == b"caption 1"
    assert s1["sample_bytes"] == sum(len(b) for b in (b"\x01\x01", b"caption 1", b"7"))


def test_corrupt_shard_dead_letters(spark, tmp_path):
    write_tar_shards(_corpus(), str(tmp_path), shard_size=3)
    (tmp_path / "broken.tar").write_bytes(b"definitely not a tar file")
    members = read_tar_shards(spark, str(tmp_path)).collect()
    assert len(members) == 15  # corrupt shard absent, good shards intact
    dead = tar_shard_dead_letters(spark, str(tmp_path)).collect()
    assert [d["shard"].rsplit("/", 1)[-1] for d in dead] == ["broken.tar"]
    assert "Error" in dead[0]["error"] or "error" in dead[0]["error"].lower()


def test_empty_dir_is_empty_frame(spark, tmp_path):
    (tmp_path / "empty").mkdir()
    write_tar_shards([], str(tmp_path / "empty"))
    # binaryFile on a dir with no matches -> empty member frame
    assert read_tar_shards(spark, str(tmp_path / "empty")).collect() == []


def test_shard_to_multimodal_decode_composes(spark, tmp_path):
    """The full multimodal ingest path: REAL PNG bytes packed into tar
    shards -> sample read -> the engine's tiered image decode
    (png_min in this container) recovers true dimensions."""
    from pyspark.sql import functions as F

    from end2end_data_pipeline_spark.functions.png_min import encode_png
    from end2end_data_pipeline_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        _extract_features,
    )

    def png(w, h, v):
        return encode_png(w, h, bytes([v]) * (w * h), mode="L")

    corpus = [
        ("img000", {"png": png(4, 3, 10), "txt": b"a caption"}),
        ("img001", {"png": png(7, 2, 200), "txt": b"another"}),
    ]
    write_tar_shards(corpus, str(tmp_path))
    samples = read_webdataset_samples(spark, str(tmp_path))
    payloads = samples.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("key"),
        F.col("files")["png"].alias("payload"),
    )
    feats = {
        r["key"]: r
        for r in payloads.join(
            payloads.mapInPandas(_extract_features, FEATURE_SCHEMA), "doc_id"
        ).collect()
    }
    assert (feats["img000"]["width"], feats["img000"]["height"]) == (4, 3)
    assert (feats["img001"]["width"], feats["img001"]["height"]) == (7, 2)
    assert all(r["format"] == "png" for r in feats.values())
    assert feats["img000"]["mean_luma"] == 10
    assert feats["img001"]["mean_luma"] == 200


def test_unified_scan_matches_split_reads(spark, tmp_path):
    """read_tar_shards_unified must equal the two-function split —
    same member rows (error null) and same dead letters (error set,
    member fields null) — out of a single scan."""
    from end2end_data_pipeline_spark.sources.webdataset import (
        read_tar_shards_unified,
    )

    write_tar_shards(_corpus(), str(tmp_path), shard_size=3)
    (tmp_path / "broken.tar").write_bytes(b"definitely not a tar file")
    unified = read_tar_shards_unified(spark, str(tmp_path)).collect()

    good = [r for r in unified if r["error"] is None]
    dead = [r for r in unified if r["error"] is not None]
    members = read_tar_shards(spark, str(tmp_path)).collect()
    letters = tar_shard_dead_letters(spark, str(tmp_path)).collect()

    key = lambda r: (r["shard"], r["member"])  # noqa: E731
    assert sorted((key(r), bytes(r["content"])) for r in good) == sorted(
        (key(r), bytes(r["content"])) for r in members
    )
    assert [(r["shard"], r["error"]) for r in dead] == [
        (r["shard"], r["error"]) for r in letters
    ]
    assert all(r["key"] is None and r["content"] is None for r in dead)


def test_truncated_tar_is_all_or_nothing(spark, tmp_path):
    """A tar that truncates MID-archive (valid header, cut data) must
    contribute zero member rows and exactly one dead letter — partial
    rows beside a dead letter would double-count on repair+replay."""
    import tarfile as tarmod

    write_tar_shards(_corpus(), str(tmp_path), shard_size=5)
    whole = (tmp_path / "shard-00000.tar").read_bytes()
    # cut INSIDE the second member's data region (layout: h1@0, d1@512,
    # h2@1024, d2@1536): the first member parses fully and would be
    # emitted by a non-buffering explode, then reading the second
    # member's truncated data raises — the exact partial-rows scenario.
    # (A cut at a header boundary reads as clean EOF — undetectable
    # without an external index; tar framing, not an engine gap.)
    (tmp_path / "trunc.tar").write_bytes(whole[: 512 * 3 + 100])
    with tarmod.open(tmp_path / "trunc.tar") as tf:
        import pytest

        with pytest.raises((tarmod.TarError, EOFError, OSError)):
            for m in tf:
                tf.extractfile(m)

    members = read_tar_shards(spark, str(tmp_path)).collect()
    letters = tar_shard_dead_letters(spark, str(tmp_path)).collect()
    assert all(r["shard"].endswith("shard-00000.tar") for r in members)
    assert len(members) == 15
    assert [r["shard"].endswith("trunc.tar") for r in letters] == [True]


def test_duplicate_member_resolves_to_last_entry(spark, tmp_path):
    """A tar may legally carry two members with the same key+ext (an
    appended replacement). Under the default
    spark.sql.mapKeyDedupPolicy=EXCEPTION a duplicate map key kills
    the whole read; the sample regrouping must instead keep the LAST
    occurrence in archive order — the member a sequential tar
    extractor would leave on disk — and count only kept members."""
    import io
    import tarfile as tarmod

    p = tmp_path / "shard-00000.tar"
    with tarmod.open(p, "w") as tf:
        for name, blob in (
            ("b/sample.txt", b"from-b"),
            ("a/zzz.jpg", b"img"),
        ):
            info = tarmod.TarInfo(name=name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
        # append a second member with the SAME name (keys include the
        # directory, so this is a true key+ext collision)
        info = tarmod.TarInfo(name="b/sample.txt")
        blob = b"replacement"
        info.size = len(blob)
        tf.addfile(info, io.BytesIO(blob))

    members = read_tar_shards(spark, str(tmp_path)).collect()
    assert len(members) == 3  # the raw explode keeps both duplicates

    samples = {
        r["key"]: r
        for r in read_webdataset_samples(spark, str(tmp_path)).collect()
    }
    dup = samples["b/sample"]
    # tar last-entry-wins: the appended "replacement" shadows "from-b"
    assert bytes(dup["files"]["txt"]) == b"replacement"
    assert dup["n_files"] == 1
    assert dup["sample_bytes"] == len(b"replacement")


def test_streaming_shards_match_batch_and_are_exactly_once(spark, tmp_path):
    """Shards arriving over time: the streaming unified explode must
    (a) produce exactly the batch reader's rows for what has landed,
    and (b) process each shard exactly once across restarts — a second
    availableNow run after a new shard lands appends ONLY that shard's
    members (file-source checkpoint)."""
    from end2end_data_pipeline_spark.sources.webdataset import (
        read_tar_shards_unified,
        stream_tar_shards_unified,
    )

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    write_tar_shards(_corpus()[:3], str(land), shard_size=2, prefix="wave1")
    (land / "broken.tar").write_bytes(b"definitely not a tar file")

    def run_once():
        q = (
            stream_tar_shards_unified(spark, str(land))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(sink).collect()
    want = read_tar_shards_unified(spark, str(land)).collect()
    key = lambda r: (r["shard"], r["member"], r["error"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert sum(r["error"] is not None for r in got) == 1

    # wave 2: one new shard; replay must append only its members
    write_tar_shards(_corpus()[3:], str(land), shard_size=2, prefix="wave2")
    run_once()
    got2 = spark.read.parquet(sink).collect()
    assert len(got2) == len(got) + 2 * 3  # 2 new samples x 3 members
    new_rows = [r for r in got2 if "wave2" in r["shard"]]
    assert len(new_rows) == 6
    # wave-1 rows were not reprocessed (exactly once per shard)
    assert (
        sorted(key(r) for r in got2 if "wave2" not in r["shard"])
        == sorted(map(key, got))
    )


def test_distributed_writer_roundtrips(spark, tmp_path):
    """The cluster-scale writer: samples written from executors via
    repartitionByRange + per-partition packing must read back (through
    the ordinary shard reader) byte-identical to the input, with keys
    contiguous per shard and shard_size respected."""
    from pyspark.sql import functions as F  # noqa: F401

    from end2end_data_pipeline_spark.sources.webdataset import (
        write_tar_shards_distributed,
    )

    rows = [
        (f"k{i:04d}", {"txt": f"text {i}".encode(), "bin": bytes([i % 251]) * 3})
        for i in range(37)
    ]
    df = spark.createDataFrame(
        rows, "key string, files map<string, binary>"
    )
    out = str(tmp_path / "shards")
    write_tar_shards_distributed(df, out, shard_size=5, n_partitions=4)

    members = read_tar_shards(spark, out).collect()
    got = {(r["key"], r["ext"]): bytes(r["content"]) for r in members}
    want = {(k, e): b for k, files in rows for e, b in files.items()}
    assert got == want

    # shard_size respected: every shard holds <= 5 samples
    import collections

    per_shard = collections.Counter(
        r["shard"] for r in members if r["ext"] == "txt"
    )
    assert max(per_shard.values()) <= 5
    # range partitioning: each shard's keys form a contiguous run of
    # the global sorted key order within its partition file
    by_shard = collections.defaultdict(list)
    for r in members:
        if r["ext"] == "txt":
            by_shard[r["shard"]].append(r["key"])
    for shard, keys in by_shard.items():
        assert keys == sorted(keys), shard


def test_shard_skew_profile_invariants_and_plan(spark, tmp_path):
    """``docs_shard_skew_profile`` (the distributed writer's
    registry-visible audit): the one-row profile must report the
    order-invariant totals (VERDICT r8 #3 — shard membership is
    sampling-dependent, so only totals are checkable), flag nothing,
    and read shards + documents exactly once each."""
    import re

    from end2end_data_pipeline_spark.operators.ingest_parity import (
        SKEW_DOC_LIMIT,
        docs_shard_skew_profile,
    )

    df = docs_shard_skew_profile(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 1, plan[:1500]
    assert len(re.findall(r"FileScan binaryFile", plan)) == 1, plan[:1500]

    [row] = df.collect()
    assert row["n_samples"] == SKEW_DOC_LIMIT
    assert row["n_roundtrip_ok"] == SKEW_DOC_LIMIT
    assert row["n_bytes"] > 0
    assert row["n_shards_over_cap"] == 0
    assert row["n_range_overlaps"] == 0
    assert row["n_dead_letters"] == 0


def test_shard_skew_profile_survives_empty_corpus(spark, tmp_path):
    """Zero documents -> the writer publishes no shards and the profile
    degrades to an all-zero row instead of crashing (the empty-input
    contract every registered query carries)."""
    from end2end_data_pipeline_spark.operators.ingest_parity import (
        docs_shard_skew_profile,
    )

    sf = tmp_path / "empty_sf"
    sf.mkdir()
    for t in ("documents",):
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(sf / f"{t}.parquet"))
        )
    [row] = docs_shard_skew_profile(spark, str(sf)).collect()
    assert tuple(row) == (0, 0, 0, 0, 0, 0)
