"""Bucketed co-located tables: shuffle-free equi-joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Persisting each side ``bucketBy(B, key)`` (hash of the join
key → B files per partition) makes the bucketing a TABLE property the
planner can trust: a join of two tables bucketed the same way on the
join key reads bucket i of each side on the same task — **no Exchange
on either side, at any data size** (tests pin the plan). ``sortBy``
additionally pre-sorts within buckets so sort-merge joins skip or
shrink their sort.

The reference has no analog (single-process CSV, ``data_io.py:53-77``);
this is the Spark-native answer to its repeated per-capture-folder
re-reads: land transcripts once, bucketed by ``conv_id``, and every
downstream per-conversation join/agg in the extraction DAG co-locates.

Bucket-count guidance: pick B so a bucket of the LARGER table is a few
hundred MB (B ≈ table_bytes / 256 MB, rounded to a power of two);
both sides must use the SAME B (Spark 3/4 can also coalesce
mismatched-but-divisible bucket counts via
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    bucket_cols: tuple[str, ...] = ("conv_id",),
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table.

    ``path`` makes it an external table (data at ``path``, metadata in
    the metastore); default is a managed table under the warehouse dir.
    """
    writer = df.write.mode(mode).format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(buckets, *bucket_cols).sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table (bucketing metadata rides along for free —
    `spark.table`, not a path read, or the planner can't use it)."""
    return spark.table(table)
