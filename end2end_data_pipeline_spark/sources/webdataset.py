"""WebDataset-style tar-shard source — the standard packing for
large-scale multimodal training data (image/audio/text samples stored
as ``{key}.{ext}`` members inside sequentially-readable ``.tar``
shards; Beaumont et al.'s img2dataset / the WebDataset convention).

The engine side: Spark's ``binaryFile`` source lists and reads whole
shards (one task per shard — tars are not splittable, so shard size IS
the parallelism unit; at 100 TB pack shards to ~1 GB like any other
object), and a pure-stdlib ``tarfile`` explode inside Arrow-batched
``mapInPandas`` emits one row per member. No extra dependency; the
same degradation-free tier policy as the Avro codec
(``sources/avro_min.py``) and the PNG codec (``functions/png_min.py``).

Corrupt shards follow the dead-letter convention of
``decode_events_avro_dlq``: unreadable tars yield one row per shard in
the companion dead-letter output instead of failing the job — at
100 TB a handful of truncated objects is routine and must not kill a
multi-hour read.

Reference scope note: the reference pipeline has no multimodal
ingest; this source backs the engine's multimodal operator family
(``operators/multimodal.py``), which the build brief makes first-class.
"""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("ext", T.StringType(), False),
        T.StructField("member", T.StringType(), False),
        # position within the archive — tar semantics shadow earlier
        # members with later same-named ones, so consumers that dedup
        # must be able to keep the LAST occurrence
        T.StructField("ordinal", T.IntegerType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)

DEAD_LETTER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("error", T.StringType(), False),
    ]
)

# One row per member PLUS one row per unreadable shard (member fields
# null, ``error`` set) — both streams out of a SINGLE scan, for
# consumers that want members and dead letters without reading every
# shard twice.
UNIFIED_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("ext", T.StringType(), True),
        T.StructField("member", T.StringType(), True),
        T.StructField("ordinal", T.IntegerType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _split_member(name: str) -> tuple[str, str]:
    """WebDataset convention: ``dir/key.ext`` → (key, ext); the FIRST
    dot after the basename starts the extension, so ``a/b.cls.txt``
    keys as ``a/b`` with ext ``cls.txt`` (multi-suffix members stay
    one sample)."""
    d, base = posixpath.split(name)
    stem, _, ext = base.partition(".")
    return (posixpath.join(d, stem) if d else stem, ext)


def _explode_members(batches, *, want_errors: bool):
    import pandas as pd

    for pdf in batches:
        cols = ("shard", "key", "ext", "member", "ordinal", "size", "content")
        out = {k: [] for k in cols}
        err = {"shard": [], "error": []}
        for path, blob in zip(pdf["path"], pdf["content"]):
            # Buffer the whole shard: a tar that truncates mid-archive
            # raises partway through iteration, and rows emitted before
            # the raise would otherwise appear in BOTH the member output
            # and the dead-letter output — double-counting members when
            # the quarantined shard is repaired and replayed. A shard is
            # all-or-nothing: either every member row or one error row.
            rows: list[tuple] = []
            try:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob)), mode="r:*") as tf:
                    for ordinal, m in enumerate(tf):
                        if not m.isfile():
                            continue
                        f = tf.extractfile(m)
                        key, ext = _split_member(m.name)
                        rows.append(
                            (path, key, ext, m.name, ordinal, m.size,
                             f.read() if f is not None else None)
                        )
            except (tarfile.TarError, EOFError, OSError) as exc:
                err["shard"].append(path)
                err["error"].append(f"{type(exc).__name__}: {exc}")
                continue
            for row in rows:
                for k, v in zip(cols, row):
                    out[k].append(v)
        yield pd.DataFrame(err if want_errors else out)


def read_tar_shards(spark: SparkSession, path: str, glob: str = "*.tar") -> DataFrame:
    """One row per member across every shard under ``path``:
    (shard, key, ext, member, ordinal, size, content). Corrupt shards
    are silently absent here — read them via
    ``tar_shard_dead_letters``."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(
        lambda it: _explode_members(it, want_errors=False), MEMBER_SCHEMA
    )


def tar_shard_dead_letters(
    spark: SparkSession, path: str, glob: str = "*.tar"
) -> DataFrame:
    """(shard, error) for every shard the member explode cannot read —
    route to quarantine, never fail the read."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(
        lambda it: _explode_members(it, want_errors=True), DEAD_LETTER_SCHEMA
    )


def _explode_unified(batches):
    import pandas as pd

    for pdf in batches:
        cols = ("shard", "key", "ext", "member", "ordinal", "size",
                "content", "error")
        out = {k: [] for k in cols}
        for path, blob in zip(pdf["path"], pdf["content"]):
            # Same all-or-nothing shard buffering as _explode_members.
            rows: list[tuple] = []
            try:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob)), mode="r:*") as tf:
                    for ordinal, m in enumerate(tf):
                        if not m.isfile():
                            continue
                        f = tf.extractfile(m)
                        key, ext = _split_member(m.name)
                        rows.append(
                            (path, key, ext, m.name, ordinal, m.size,
                             f.read() if f is not None else None, None)
                        )
            except (tarfile.TarError, EOFError, OSError) as exc:
                rows = [(path, None, None, None, None, None, None,
                         f"{type(exc).__name__}: {exc}")]
            for row in rows:
                for k, v in zip(cols, row):
                    out[k].append(v)
        yield pd.DataFrame(out)


def read_tar_shards_unified(
    spark: SparkSession, path: str, glob: str = "*.tar"
) -> DataFrame:
    """Members AND dead letters from ONE scan: good shards explode to
    member rows (``error`` null), unreadable shards to a single row
    with ``error`` set and member fields null. At 100 TB this is the
    shape to use when a job consumes both streams — the two-function
    API (``read_tar_shards`` + ``tar_shard_dead_letters``) reads every
    shard twice; this reads each once and the split is a filter."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_explode_unified, UNIFIED_SCHEMA)


# binaryFile's fixed schema, spelled out because streaming file
# sources require an explicit schema (no inference pass at 100 TB).
_BINARYFILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modificationTime", T.TimestampType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def stream_tar_shards_unified(
    spark: SparkSession, path: str, glob: str = "*.tar"
) -> DataFrame:
    """Streaming arrival for the WebDataset front door: shards landing
    continuously in object storage are discovered by the file stream
    source and exploded by the SAME unified worker as the batch
    reader — member rows and dead-letter rows out of one pass, each
    shard processed exactly once across restarts (file-source
    checkpointing tracks seen paths; tars are not splittable, so the
    shard is the natural exactly-once unit). Stateless map, so any
    sink mode works; pair with ``trigger(availableNow=True)`` for
    catch-up backfills exactly like the Avro frame stream
    (``streaming/pipeline.py``)."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_explode_unified, UNIFIED_SCHEMA)


def read_webdataset_samples(
    spark: SparkSession, path: str, glob: str = "*.tar"
) -> DataFrame:
    """Members regrouped into SAMPLES (the WebDataset unit): one row
    per key with a ``files`` map<ext, binary>. Grouping shuffles on
    (shard, key) — at scale members of one sample are adjacent in one
    shard, so the shuffle moves each sample once; n_files lets quality
    filters drop incomplete samples (e.g. image without caption).

    A tar may legally contain two members with the same key+ext
    (an appended replacement — tar semantics shadow the earlier
    member); under Spark's default
    ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` a duplicate map key
    would kill the whole read, so duplicates are resolved FIRST,
    keeping the LAST occurrence in archive order (max ordinal — the
    same member a sequential tar extractor would leave on disk);
    ``n_files``/``sample_bytes`` count the kept members only."""
    members = read_tar_shards(spark, path, glob)
    deduped = (
        members.groupBy("shard", "key", "ext")
        .agg(
            F.max(F.struct("ordinal", "member", "size", "content")).alias("pick"),
        )
        .select(
            "shard",
            "key",
            "ext",
            F.col("pick.size").alias("size"),
            F.col("pick.content").alias("content"),
        )
    )
    return (
        deduped.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("ext", "content"))
            ).alias("files"),
            F.count("*").alias("n_files"),
            F.sum("size").cast("bigint").alias("sample_bytes"),
        )
    )


def write_tar_shards(
    rows: Sequence[tuple[str, dict[str, bytes]]],
    out_dir: str,
    shard_size: int = 1000,
    prefix: str = "shard",
) -> list[str]:
    """Local helper (tests / small exports): pack (key, {ext: bytes})
    samples into ``{prefix}-{i:05d}.tar`` shards of ``shard_size``
    samples. The cluster-scale equivalent is
    ``write_tar_shards_distributed`` (repartitionByRange + executor-
    side packing)."""
    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    for i in range(0, len(rows), shard_size):
        p = os.path.join(out_dir, f"{prefix}-{i // shard_size:05d}.tar")
        with tarfile.open(p, "w") as tf:
            for key, files in rows[i : i + shard_size]:
                for ext, blob in sorted(files.items()):
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(blob)
                    tf.addfile(info, io.BytesIO(blob))
        paths.append(p)
    return paths


def write_tar_shards_distributed(
    samples: DataFrame,
    out_dir: str,
    shard_size: int = 1000,
    n_partitions: int | None = None,
    prefix: str = "shard",
) -> None:
    """The cluster-scale shard writer the local helper's docstring
    promises: ``samples`` is (key string, files map<string, binary>);
    rows are range-partitioned by key (keeps each shard's keys
    contiguous — the sequential-read locality WebDataset exists for)
    and each executor packs its partition into ``{prefix}-{partition:
    05d}-{seq:05d}.tar`` files of ``shard_size`` samples, written
    straight from the worker. ``out_dir`` must be storage every
    executor can reach (a shared/object path in production; any local
    dir on local[*]). No driver collect and no shuffle beyond the one
    range partitioning — at 100 TB the write scales with executors.

    Commit protocol: each attempt packs into a PRIVATE temp name and
    atomically renames into place only after the tar closes cleanly,
    so a killed attempt leaves no torn shard behind and concurrent
    speculative attempts never interleave writes — last completed
    rename wins, and the final name is deterministic per (partition,
    sequence), so retries stay idempotent. On a rename-less object
    store, front ``out_dir`` with a committer or a
    filesystem-semantics layer — the same caveat as any direct-write
    sink."""
    if n_partitions is not None:
        samples = samples.repartitionByRange(n_partitions, "key")
    else:
        samples = samples.repartitionByRange("key")
    samples = samples.sortWithinPartitions("key")

    def pack(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: list[tuple[str, dict[str, bytes]]] = []
        seq = 0

        attempt = TaskContext.get().attemptNumber()

        def flush():
            nonlocal seq
            if not buf:
                return
            final = os.path.join(out_dir, f"{prefix}-{pid:05d}-{seq:05d}.tar")
            tmp = os.path.join(
                out_dir, f".{prefix}-{pid:05d}-{seq:05d}.attempt-{attempt}.tmp"
            )
            try:
                with tarfile.open(tmp, "w") as tf:
                    for key, files in buf:
                        for ext, blob in sorted(files.items()):
                            info = tarfile.TarInfo(name=f"{key}.{ext}")
                            info.size = len(blob)
                            tf.addfile(info, io.BytesIO(blob))
                os.replace(tmp, final)  # atomic publish, all-or-nothing
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
            buf.clear()
            seq += 1

        for pdf in batches:
            for key, files in zip(pdf["key"], pdf["files"]):
                buf.append(
                    (key, {e: bytes(b) for e, b in files.items()})
                )
                if len(buf) >= shard_size:
                    flush()
        flush()
        yield pd.DataFrame({"n": []})

    os.makedirs(out_dir, exist_ok=True)
    # mapInPandas + a count action drives the per-partition pack; the
    # returned frame is empty — the write IS the effect.
    samples.mapInPandas(pack, "n long").count()
