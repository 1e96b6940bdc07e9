"""Production table layout — partitioned, clustered gold/silver writes.

The reference leans on Postgres b-tree indexes for its hot predicates
(donations/models.py:36,52,81,90,96,109,118; composite indexes
pots/models.py:313-323). At lake scale those become (SURVEY.md §4):

  - **partition columns**: coarse pruning before any I/O — e.g.
    donations by ``date(donated_at)`` serves the F4/F5 range predicates
    by touching only in-range directories;
  - **clustering (sort-within-partition)**: parquet min-max row-group
    stats serve the residual predicates (donor/recipient/pot lookups) —
    each row group covers a narrow key range, so point/range filters
    skip most row groups inside the surviving partitions.

``write_clustered`` realizes both with plain parquet (Delta/Iceberg get
the same layout plus clustering DDL). The repartition before write also
controls file count: one shuffle partition per (partition-dir, bucket)
keeps files ~target size instead of cores x directories tiny files —
the classic small-file failure mode at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols``, rows inside each
    file sorted by ``cluster_cols`` (min-max stats → row-group skipping).

    ``files_per_partition`` scales write parallelism for big partitions:
    rows are bucketed by hash(cluster_cols) % n so each output file still
    covers a narrow, sorted cluster-key range.
    """
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        bucket = F.pmod(F.hash(*[F.col(c) for c in cluster_cols]), F.lit(files_per_partition))
        shaped = df.repartition(*parts, bucket)
    else:
        shaped = df.repartition(*parts)
    (
        shaped.sortWithinPartitions(*partition_cols, *cluster_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_pruned(spark: SparkSession, path: str, predicate: Column) -> DataFrame:
    """Read back with a predicate; partition-column predicates prune
    directories (visible as PartitionFilters in .explain), the rest push
    into parquet row-group stats."""
    return spark.read.parquet(path).filter(predicate)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Catalog-managed bucketed table: rows hash-distributed into
    ``n_buckets`` files by ``bucket_cols``, optionally sorted within each.

    This is the co-located join mechanism for repeated fact⋈fact joins
    (donations⋈payouts on account, silver⋈silver on natural key): two
    tables bucketed the same way join with ZERO exchange — the shuffle is
    paid once at write time instead of per query. Bucket counts must
    match (or divide) across join sides; pick ~(table size / 128 MB)
    rounded to a power of two so buckets stay scan-sized at 100 TB.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
