"""Partitioned/clustered layout tests (SURVEY.md §4 index-replacement row).

Verifies the two scale mechanisms actually engage:
  - partition pruning: a date predicate reaches the scan as a
    PartitionFilter and the non-matching directories are not read;
  - clustering: rows inside each written file are sorted by the cluster
    key, so parquet min-max stats can skip row groups.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from django_indexer_spark.sources.storage import read_pruned, write_clustered


def test_write_clustered_partitions_prune_and_cluster_sorts(spark, tmp_path):
    out = str(tmp_path / "donations_gold")
    df = spark.range(0, 1000).select(
        F.col("id").alias("donation_id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 5).cast("int")).alias("day"),
        F.concat(F.lit("donor_"), (F.col("id") % 37).cast("string")).alias("donor_id"),
        (F.col("id") * 10).alias("amount"),
    )
    write_clustered(df, out, partition_cols=["day"], cluster_cols=["donor_id"])

    # hive-style partition directories, one per day
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{out}/day=*"))
    assert dirs == [f"day=2024-01-0{d}" for d in range(1, 6)]

    # partition predicate prunes: only the matching directory is scanned
    pruned = read_pruned(spark, out, F.col("day") == "2024-01-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == 200
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert all("day=2024-01-03" in f for f in files)

    # clustering: within each file rows are sorted by donor_id
    one_file = next(iter(files))
    rows = [
        r["donor_id"]
        for r in spark.read.parquet(one_file.replace("file://", "")).collect()
    ]
    assert rows == sorted(rows)

    # round-trip completeness
    assert spark.read.parquet(out).count() == 1000


def test_write_clustered_files_per_partition_buckets(spark, tmp_path):
    out = str(tmp_path / "bucketed")
    df = spark.range(0, 400).select(
        (F.col("id") % 2).cast("int").alias("part"),
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("cluster_key"),
    )
    write_clustered(
        df, out, partition_cols=["part"], cluster_cols=["cluster_key"], files_per_partition=3
    )
    # hash(cluster)%3 bounds each dir at ≤3 files (collisions and AQE
    # coalescing can merge buckets — the guarantee is the upper bound,
    # which is what prevents the cores x dirs small-file explosion)
    for p in (0, 1):
        files = glob.glob(f"{out}/part={p}/*.parquet")
        assert 1 <= len(files) <= 3
    assert spark.read.parquet(out).count() == 400


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    from django_indexer_spark.sources.storage import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_t")
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "buckets_t.fact_a", ["k"], 8, sort_cols=["k"])
    write_bucketed(b, "buckets_t.fact_b", ["k"], 8, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the fact⋈fact (sort-merge) path: at real scale neither
        # side broadcasts; locally the 10k-row table would
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta = spark.table("buckets_t.fact_a")
        tb = spark.table("buckets_t.fact_b")
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the write paid the shuffle once; the join pays none
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS buckets_t.fact_a")
        spark.sql("DROP TABLE IF EXISTS buckets_t.fact_b")
        spark.sql("DROP DATABASE IF EXISTS buckets_t")
