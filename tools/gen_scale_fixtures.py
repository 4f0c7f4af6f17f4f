"""Deterministic fixture UP-SCALER for scaling-curve measurement.

The driver testdata stops at sf0.1 (TESTDATA.md), so SCALE.md's
"linear at 100 TB" arguments were analytic only (VERDICT r11 #2).
This tool materializes sf0.3 / sf1.0 fixtures inside the repo
(``scale_fixtures/sfX``, git-ignored) by stacking k key-remapped
copies of sf0.1 — copy 0 is the original data bit-for-bit, copy c
offsets every join key by ``c * STRIDE`` so the star schema stays
referentially intact while cardinalities grow exactly k-fold.

Two transforms keep the WORK growth honest (naive replication would
fabricate superlinear behavior the operators don't have):

- ``documents.text``: copy c > 0 appends a per-copy tag to every
  whitespace token. Any injective per-copy token mapping preserves
  within-copy shingle-set structure exactly (same Jaccard matrix as
  sf0.1) while making cross-copy shingle sets disjoint — so near-dup
  pair counts grow k-fold, not C(k,2)-fold as identical text would.
  Disjointness could in principle leak if a copy-0 token naturally
  ended with a tag ("...zb" etc.); scanned r13: the sf0.1 corpus has
  31 distinct tokens and NONE ends with z[b-j], so the claim is
  strict for this corpus (re-run the scan if the driver testdata
  generator ever changes its vocabulary).
- ``embeddings.embedding``: copy c rotates the float vector by
  (c * 7) mod dim. Norm- and geometry-preserving within a copy,
  decorrelating across copies — ANN/cosine near-dup candidate counts
  again grow k-fold instead of quadratically.

region/nation are fixed-cardinality dimensions (as in TPC-H) and are
copied unchanged.

Usage:
    PYTHONPATH=. python tools/gen_scale_fixtures.py            # 0.3 and 1.0
    PYTHONPATH=. python tools/gen_scale_fixtures.py 0.3        # one target
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(REPO, "scale_fixtures")

# larger than any key in the sf0.1 fixture (max observed ~6e5), so
# per-copy key ranges can never collide — and clear of the
# MERGE_INS_OFFSET = 10_000_000 band docs_merge_upsert_profile
# reserves for its rekeyed insert clones (a 10M stride put copy-1
# doc_ids exactly where the synthetic changeset inserts land, turning
# the oracle's collision-free assumption false at sf>=0.3)
STRIDE = 100_000_000

# sf -> number of stacked sf0.1 copies
TARGETS = {"0.3": 3, "1.0": 10}

# table -> int64 key columns offset per copy (the star-schema edges)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FIXED_DIMS = ("region", "nation")

# files per output table: enough splits that fan_out() never has to
# rescue the scan, few enough that task overhead stays negligible
N_FILES = {"lineitem": 16, "events": 8, "orders": 8}
DEFAULT_FILES = 4


def _copy_tag(c: int) -> str:
    # letters only: survives any alnum-preserving tokenizer unchanged
    return "z" + chr(ord("a") + c)


def scale_table(spark, name: str, k: int):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    if name in FIXED_DIMS:
        return df
    dim = None
    if name == "embeddings":
        dim = len(df.select("embedding").first()[0])
    copies = []
    for c in range(k):
        off = c * STRIDE
        cp = df
        for col in KEY_COLS[name]:
            cp = cp.withColumn(col, (F.col(col) + F.lit(off)).cast("bigint"))
        if name == "documents" and c > 0:
            tag = _copy_tag(c)
            cp = cp.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", r"$1" + tag)
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        if name == "embeddings" and c > 0:
            r = (c * 7) % dim
            if r:
                cp = cp.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r + 1}, {dim - r}), "
                        f"slice(embedding, 1, {r}))"
                    ),
                )
        copies.append(cp)
    out = copies[0]
    for cp in copies[1:]:
        out = out.unionByName(cp)
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    wanted = sys.argv[1:] or list(TARGETS)
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gen-scale-fixtures")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf in wanted:
        k = TARGETS[sf]
        out_dir = os.path.join(OUT_ROOT, f"sf{sf}")
        os.makedirs(out_dir, exist_ok=True)
        for name in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            dest = os.path.join(out_dir, f"{name}.parquet")
            # resume only past COMPLETE tables: a write interrupted
            # mid-job leaves dest without Spark's _SUCCESS marker (or
            # with only _temporary), and silently serving it would
            # poison every sweep built on the fixture (r12 review)
            if os.path.exists(os.path.join(dest, "_SUCCESS")):
                print(f"sf{sf}/{name}: exists, skipping")
                continue
            t0 = time.time()
            out = scale_table(spark, name, k)
            nf = N_FILES.get(name, DEFAULT_FILES)
            out.repartition(nf).write.mode("overwrite").parquet(dest)
            n = spark.read.parquet(dest).count()
            print(f"sf{sf}/{name}: {n} rows in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
