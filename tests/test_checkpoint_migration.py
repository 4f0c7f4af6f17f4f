"""Checkpoint upgrade across a shuffle-partition change (VERDICT r12
#5) — the sharpest remaining 100 TB operational edge: the number of
state partitions of a stateful streaming query is FROZEN into the
checkpoint at first start (documented at
``operators/warehouse_ops.py`` in ``abandoned_views_stream_replay``'s
conf block). A production job that restarts after someone retunes
``spark.sql.shuffle.partitions`` must NOT silently shard its state
differently (that would orphan every existing state row); Spark's
contract is to restore the frozen value from the checkpoint's offset
metadata and keep running correctly. This test proves that contract
end to end:

- phase 1 runs a stateful count with shuffle.partitions=8 and drains
  file A;
- phase 2 RESTARTS from the same checkpoint with the session retuned
  to 3 and drains file B;
- the final counts must equal the batch answer over A ∪ B (state
  survived the restart), the state store must still have exactly 8
  partition directories (the frozen knob won over the new session
  conf), and every offsets entry must record the frozen value.

Remediation, for the record: state CANNOT be re-sharded in place —
to change state partitioning you drain the old query, start a new
checkpoint, and rebuild state from the source (or run an offline
state-repartition job). The test pins the behavior that makes the
naive restart safe rather than corrupting."""

from __future__ import annotations

import datetime as dt
import json
import os

FROZEN = "8"
RETUNED = "3"


def _rows(spec):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    return [
        (key, t0 + dt.timedelta(seconds=i))
        for i, key in enumerate(spec)
    ]


def _drain(spark, feed, ckpt, name):
    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    counts = stream.groupBy("key").count()
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _state_partition_dirs(ckpt):
    root = os.path.join(ckpt, "state", "0")
    return sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and d.isdigit()
    )


def test_checkpoint_survives_shuffle_partition_retune(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # phase 1: first start freezes 8 into the checkpoint
        spark.conf.set("spark.sql.shuffle.partitions", FROZEN)
        spark.createDataFrame(
            _rows(["a", "a", "b"]), "key string, ts timestamp"
        ).write.mode("append").parquet(feed)
        _drain(spark, feed, ckpt, "ckpt_mig_p1")
        assert _state_partition_dirs(ckpt) == [
            str(i) for i in range(int(FROZEN))
        ]

        # phase 2: session retuned to 3, SAME checkpoint, more data
        spark.conf.set("spark.sql.shuffle.partitions", RETUNED)
        spark.createDataFrame(
            _rows(["a", "b", "b", "c"]), "key string, ts timestamp"
        ).write.mode("append").parquet(feed)
        _drain(spark, feed, ckpt, "ckpt_mig_p2")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # state survived the restart: counts accumulate across both phases
    got = {
        r["key"]: r["count"]
        for r in spark.table("ckpt_mig_p2").collect()
    }
    assert got == {"a": 3, "b": 3, "c": 1}, got

    # the frozen knob won over the retuned session conf: still exactly
    # 8 state partition dirs (3 would mean the state was re-sharded —
    # the silent-corruption mode this test exists to rule out)
    assert _state_partition_dirs(ckpt) == [
        str(i) for i in range(int(FROZEN))
    ]

    # and the offset log records the frozen value in every entry,
    # including those written AFTER the retune
    offsets_dir = os.path.join(ckpt, "offsets")
    # digit-named entries only: the checkpoint file manager also writes
    # hidden binary .N.crc sidecars next to each offsets file
    entries = sorted(e for e in os.listdir(offsets_dir) if e.isdigit())
    assert len(entries) >= 2  # at least one batch per phase
    for entry in entries:
        with open(os.path.join(offsets_dir, entry)) as f:
            lines = [ln for ln in f.read().splitlines() if ln.startswith("{")]
        meta = next(
            (
                json.loads(ln)
                for ln in lines
                if "shuffle.partitions" in ln
            ),
            None,
        )
        assert meta is not None, f"no conf metadata in offsets/{entry}"
        assert (
            meta["conf"]["spark.sql.shuffle.partitions"] == FROZEN
        ), (entry, meta["conf"])
