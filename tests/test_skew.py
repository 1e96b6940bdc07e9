"""Skew handling: AQE runtime skew-join split vs explicit salting.

Two complementary mechanisms for the reference's '30% of donations go to
one pot' key-skew shape (donations/models.py pot FK concentration):

- AQE skew-join (`spark.sql.adaptive.skewJoin.*`, on by default in
  session.py): at runtime, a shuffle partition larger than
  skewedPartitionFactor x median AND skewedPartitionThresholdInBytes is
  split into advisory-sized chunks, each joined against a copy of the
  matching right-side partition. Zero code changes, handles skew
  discovered at runtime — the DEFAULT answer.
- operators.joins.salted_join: explicit (key, salt) re-keying. Needed
  only when ONE key is so hot that even a split chunk would blow past
  executor memory in downstream per-key state (window/agg after the
  join), or when the engine must bound per-task state a priori. Costs a
  right-side replication per salt. Proven result-invariant by the
  j_salted_skew gate (oracle = the unsalted join).

This module proves the AQE half actually fires: with thresholds scaled
to fixture size, the final adaptive plan must mark the sort-merge join
skew=true and still return exactly the unskewed-correct result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import spark_confs

# thresholds scaled so the fixture-sized hot partition (~2 MB) trips the
# same machinery that defaults (256 MB / factor 5) trip at cluster scale
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    # keep the post-join coalescer from merging the split chunks back
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8192",
}


def test_aqe_skew_join_splits_hot_key(spark):
    with spark_confs(spark, _SKEW_CONFS):
        n = 120_000
        hot_share = 9  # 9 of 10 rows land on key 0 → ~90% single-key skew
        left = spark.range(n).select(
            F.when(F.col("id") % 10 < hot_share, F.lit(0))
            .otherwise(F.col("id") % 97 + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(98).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )

        joined = left.join(right, "k", "inner")
        # collect() executes joined's OWN query execution, so the
        # adaptive plan inspected below is the finalized one
        rows = joined.collect()

        # every left row matches exactly one right key → row count and
        # sum(v) are the plain-join ground truth
        assert len(rows) == n
        assert sum(r["v"] for r in rows) == n * (n - 1) // 2

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan}"


def test_aqe_and_salted_join_agree_on_skewed_fixture(spark):
    """Same skewed input → AQE-split plain join and salted_join return
    identical aggregates (the two mechanisms are interchangeable on
    results, they differ only in WHERE the skew is broken)."""
    from django_indexer_spark.operators.joins import salted_join

    with spark_confs(spark, _SKEW_CONFS):
        left = spark.range(50_000).select(
            F.when(F.col("id") % 5 < 4, F.lit(7)).otherwise(F.col("id") % 31).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(31).select(
            F.col("id").alias("k"), (F.col("id") + 100).alias("w")
        )

        plain = (
            left.join(right, "k", "inner")
            .groupBy("k")
            .agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        )
        salted = (
            salted_join(left, right, "k", n_salts=8)
            .groupBy("k")
            .agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        )
        p = {r["k"]: (r["sv"], r["sw"]) for r in plain.collect()}
        s = {r["k"]: (r["sv"], r["sw"]) for r in salted.collect()}
        assert p == s
