"""Multi-dimensional data-layout audit: Z-order curve vs linear sort
under zone-map (min/max) file skipping.

The reference's one layout trick is 1-D partition pruning (minute
partitions, ``db/clickhouse_table_schema.sql:15,19``); lakehouse tables
at 100 TB face the harder problem of BOX predicates over two
uncorrelated dimensions, where any linear sort clusters one dimension
and scatters the other. This audit quantifies the classic fix —
interleaved-bit (Morton) ordering — by simulating both layouts' zone
maps from the same cell grid and counting the files a box predicate
actually touches.

Everything is exact integer arithmetic (bit extraction, scaled integer
bucketing, truncating division on non-negative operands), so Spark and
DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.functions import texthash as th
from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import (
    load_table,
    session_cached,
    sf_tag,
)

ZBITS = 6  # 6 bits per dimension -> 64x64 bucket grid, 12-bit z-space
N_BUCKETS = 1 << ZBITS
FILE_ZSPAN = 64  # z-values per simulated file -> 64 files cover z-space
# Box predicate, bucket-aligned on both dims (an 8x8 cell box): aligned
# boxes make the z-order benefit crisp (the box is a contiguous z-run),
# but the zone-map math below computes honest per-file min/max and
# would price an unaligned box just as correctly.
BOX_LO, BOX_HI = 16, 23
EPOCH = "1990-01-01"  # any date before every l_shipdate in the fixture


def _interleave(x: str, y: str, dialect: str) -> str:
    """Morton interleave of two ZBITS-bit non-negative ints — x in the
    even bit positions, y in the odd — as portable integer arithmetic
    (shift/mask on Spark, >> on DuckDB; no engine-specific intrinsics).
    """
    if dialect == th.SPARK:
        def bit(v: str, i: int) -> str:
            return f"(shiftright({v}, {i}) & 1)"
    else:
        def bit(v: str, i: int) -> str:
            return f"(({v} >> {i}) & 1)"
    terms = []
    for i in range(ZBITS):
        terms.append(f"{bit(x, i)} * {1 << (2 * i)}")
        terms.append(f"{bit(y, i)} * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _bucket(v: str, lo: str, hi: str, div: str) -> str:
    """Scale v in [lo, hi] to a bucket in [0, N_BUCKETS): exact integer
    scaling with truncating division (operands non-negative, so Spark
    DIV and DuckDB // agree)."""
    return f"((({v}) - ({lo})) * {N_BUCKETS}) {div} (({hi}) - ({lo}) + 1)"


_SCAN_COND = (
    f"max_x >= {BOX_LO} AND min_x <= {BOX_HI} "
    f"AND max_y >= {BOX_LO} AND min_y <= {BOX_HI}"
)


def _file_summary_sql(layout: str, files_cte: str) -> str:
    return f"""
      SELECT '{layout}' AS layout,
             count(*) AS n_files,
             CAST(SUM(CASE WHEN {_SCAN_COND} THEN 1 ELSE 0 END) AS BIGINT)
                 AS files_scanned,
             CAST(SUM(CASE WHEN {_SCAN_COND} THEN n_rows ELSE 0 END)
                  AS BIGINT) AS rows_scanned,
             CAST(SUM(n_match) AS BIGINT) AS rows_matching,
             CAST(SUM(n_rows) AS BIGINT) AS total_rows
      FROM {files_cte}"""


@query(
    "lineitem_zorder_zonemap",
    oracle=f"""
    WITH src AS (
      SELECT datediff('day', DATE '{EPOCH}', CAST(l_shipdate AS DATE))
                 AS day, l_partkey AS part
      FROM lineitem
    ), bounds AS (
      SELECT CAST(min(day) AS BIGINT) AS dmin, CAST(max(day) AS BIGINT) AS dmax,
             CAST(min(part) AS BIGINT) AS pmin, CAST(max(part) AS BIGINT) AS pmax
      FROM src
    ), cells AS (
      SELECT {_bucket('day', 'dmin', 'dmax', '//')} AS xb,
             {_bucket('part', 'pmin', 'pmax', '//')} AS yb,
             count(*) AS n
      FROM src, bounds GROUP BY 1, 2
    ), graded AS (
      SELECT xb, yb, n, {_interleave('xb', 'yb', th.DUCK)} AS z,
             CASE WHEN xb BETWEEN {BOX_LO} AND {BOX_HI}
                   AND yb BETWEEN {BOX_LO} AND {BOX_HI}
                  THEN n ELSE 0 END AS n_match
      FROM cells
    ), zfiles AS (
      SELECT z // {FILE_ZSPAN} AS file_id,
             min(xb) AS min_x, max(xb) AS max_x,
             min(yb) AS min_y, max(yb) AS max_y,
             SUM(n) AS n_rows, SUM(n_match) AS n_match
      FROM graded GROUP BY 1
    ), lfiles AS (
      SELECT xb AS file_id,
             min(xb) AS min_x, max(xb) AS max_x,
             min(yb) AS min_y, max(yb) AS max_y,
             SUM(n) AS n_rows, SUM(n_match) AS n_match
      FROM graded GROUP BY 1
    )
    {_file_summary_sql('zorder', 'zfiles')}
    UNION ALL
    {_file_summary_sql('linear', 'lfiles')}
    ORDER BY layout
    """,
)
def lineitem_zorder_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear-sort zone-map audit over (ship-day, partkey):
    bucket both dimensions to a 64x64 grid, interleave bits into a
    Morton z-value, simulate 64 files per layout (z-range files vs
    ship-day-range files), build each file's min/max zone map, and
    price the box predicate day,part in [{BOX_LO},{BOX_HI}]^2 against
    both layouts — files scanned, rows scanned, and the true match
    count.

    Scale: ONE corpus pass builds the O(N_BUCKETS^2) cell grid
    (map-side combined groupBy); every layout comparison after that is
    arithmetic over <=4096 cell rows. The 1-row bounds aggregate is
    broadcast back onto the scan (the waived scalar-attach shape). In
    production the z-value feeds ``repartitionByRange(z)`` + per-file
    parquet min/max stats — this audit computes exactly the skipping
    those stats would deliver, before paying for the rewrite."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(f"datediff(l_shipdate, DATE '{EPOCH}')")
        .cast("bigint")
        .alias("day"),
        F.col("l_partkey").cast("bigint").alias("part"),
    )
    bounds = li.agg(
        F.min("day").alias("dmin"),
        F.max("day").alias("dmax"),
        F.min("part").alias("pmin"),
        F.max("part").alias("pmax"),
    )
    cells = (
        li.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(_bucket("day", "dmin", "dmax", "DIV")).alias("xb"),
            F.expr(_bucket("part", "pmin", "pmax", "DIV")).alias("yb"),
        )
        .groupBy("xb", "yb")
        .agg(F.count("*").alias("n"))
    )
    in_box = (
        F.col("xb").between(BOX_LO, BOX_HI)
        & F.col("yb").between(BOX_LO, BOX_HI)
    )
    # O(N_BUCKETS^2) bounded frame feeding both layout rollups —
    # session-cached so the corpus scan runs once and repeats share
    # ONE InMemoryRelation (same convention as the O(types) grid in
    # sessions_markov_transitions)
    import os

    graded = session_cached(
        spark,
        f"zorder_graded_{sf_tag(os.path.abspath(sf_dir))}",
        cells.select(
            "xb",
            "yb",
            "n",
            F.expr(_interleave("xb", "yb", th.SPARK)).alias("z"),
            F.when(in_box, F.col("n")).otherwise(F.lit(0)).alias("n_match"),
        )
        .coalesce(1),
    )

    def file_summary(layout: str, file_id) -> DataFrame:
        files = graded.groupBy(file_id.alias("file_id")).agg(
            F.min("xb").alias("min_x"),
            F.max("xb").alias("max_x"),
            F.min("yb").alias("min_y"),
            F.max("yb").alias("max_y"),
            F.sum("n").alias("n_rows"),
            F.sum("n_match").alias("n_match"),
        )
        scanned = F.expr(_SCAN_COND)
        return files.agg(
            F.count("*").alias("n_files"),
            F.sum(scanned.cast("bigint")).cast("bigint").alias(
                "files_scanned"
            ),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("rows_scanned"),
            F.sum("n_match").cast("bigint").alias("rows_matching"),
            F.sum("n_rows").cast("bigint").alias("total_rows"),
        ).select(
            F.lit(layout).alias("layout"),
            "n_files",
            "files_scanned",
            "rows_scanned",
            "rows_matching",
            "total_rows",
        )

    zsum = file_summary("zorder", F.expr(f"z DIV {FILE_ZSPAN}"))
    lsum = file_summary("linear", F.col("xb"))
    return zsum.unionAll(lsum).orderBy("layout")


lineitem_zorder_zonemap.__doc__ = lineitem_zorder_zonemap.__doc__.replace(
    "{BOX_LO}", str(BOX_LO)
).replace("{BOX_HI}", str(BOX_HI))


# Parquet footer introspection: the fixture's lineitem columns, used
# to enumerate the oracle's expected per-column rows (the oracle
# cannot open footers through a view, so it asserts the reconciliation
# INVARIANTS — footer value counts equal the logical row count, byte
# accounting sane — the docs_shard_skew_profile idiom: engine audits
# the physical artifact, oracle pins what the artifact must agree
# with).
FOOTER_TABLE = "lineitem"
FOOTER_COLUMNS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate",
)


def _footer_chunks(frames):
    """mapInPandas over a (path) manifest: open each parquet footer
    with pyarrow (metadata only — no data pages touched) and emit one
    row per row-group x column chunk. File-granular map work, the
    shape a 100 TB lake audit runs at: one footer read per file, no
    data I/O."""
    import pandas as pd
    import pyarrow.parquet as pq

    for pdf in frames:
        out = {
            "column_name": [], "n_values": [],
            "compressed_bytes": [], "uncompressed_bytes": [],
        }
        for path in pdf["path"]:
            md = pq.ParquetFile(path).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    out["column_name"].append(col.path_in_schema)
                    out["n_values"].append(col.num_values)
                    out["compressed_bytes"].append(col.total_compressed_size)
                    out["uncompressed_bytes"].append(col.total_uncompressed_size)
        yield pd.DataFrame(out)


_FOOTER_ORACLE_COLS = ", ".join(f"('{c}')" for c in FOOTER_COLUMNS)


@query(
    "parquet_footer_health",
    oracle=f"""
    WITH cols(column_name) AS (VALUES {_FOOTER_ORACLE_COLS}),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM {FOOTER_TABLE})
    SELECT column_name,
           n_rows AS n_values,
           CAST(1 AS BIGINT) AS footer_rows_match,
           CAST(1 AS BIGINT) AS bytes_positive
    FROM cols, n ORDER BY column_name
    """,
)
def parquet_footer_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-health audit from parquet FOOTERS: per column, the
    total value count, whether footer accounting reconciles with the
    logical row count (a torn write, a truncated file, or a buggy
    writer breaks this first), and whether every chunk reports
    positive byte sizes. The footer pass reads metadata only — the
    audit a lakehouse runs over millions of files before trusting a
    snapshot, at one footer fetch per file.

    Scale: the manifest (one row per file) is the only driver-side
    state; footer reads are Arrow-batched map work over the manifest
    partitions; the rollup shuffles O(#columns) rows. The logical
    row count joins in as a broadcast single-row frame — the audit
    never scans data pages."""
    import glob as globmod
    import os

    roots = globmod.glob(os.path.join(sf_dir, f"{FOOTER_TABLE}.parquet"))
    paths = sorted(
        part
        for root in roots
        for part in (
            globmod.glob(os.path.join(root, "*.parquet"))
            if os.path.isdir(root)
            else [root]
        )
    )
    manifest = spark.createDataFrame([(p,) for p in paths], "path string")
    chunks = manifest.repartition(max(len(paths) // 16, 1)).mapInPandas(
        _footer_chunks,
        "column_name string, n_values long, compressed_bytes long,"
        " uncompressed_bytes long",
    )
    per_col = chunks.groupBy("column_name").agg(
        F.sum("n_values").cast("bigint").alias("n_values"),
        F.min(
            ((F.col("compressed_bytes") > 0)
             & (F.col("uncompressed_bytes") > 0)).cast("int")
        ).alias("bytes_positive_i"),
    )
    n_rows = load_table(spark, sf_dir, FOOTER_TABLE).agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    return (
        per_col.crossJoin(F.broadcast(n_rows))
        .select(
            "column_name",
            "n_values",
            (F.col("n_values") == F.col("n_rows"))
            .cast("bigint")
            .alias("footer_rows_match"),
            F.col("bytes_positive_i").cast("bigint").alias("bytes_positive"),
        )
        .orderBy("column_name")
    )
