"""Runtime bloom-filter join pruning — the 100 TB fact-scan reducer.

Spark's InjectRuntimeFilter (on by default, verified in session.py's
conf) builds a bloom filter from a SELECTIVE dim-side predicate at
runtime and applies `might_contain` on the fact side BEFORE the join
shuffle — rows that cannot match never enter the exchange. At cluster
scale the stock thresholds are exactly right (creation side <= 10 MB,
application-side scan >= 10 GB: a filtered dim vs a 100 TB fact); the
fixtures are far below the application threshold, so these tests scale
the thresholds down to prove the machinery itself fires and preserves
results.

This is the runtime complement to the STATIC pruning already guarded
elsewhere: parquet predicate pushdown (test_plans), partition pruning
and Z-order footer-stats pruning (sources/storage tests). Together:
static pruning removes files/row-groups a literal predicate excludes;
the bloom filter removes rows a JOIN excludes, which no static rule can
see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import spark_confs

SF_DIR = "/root/testdata/sf0.001"

_CONFS = {
    # force a shuffle join: broadcast joins don't need the bloom filter
    # (the dim rides along with every task anyway)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # fixture-scale the fact-side trigger (default 10 GB)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the dim side eligible (default 10 MB — fine, set for clarity)
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def test_selective_dim_filter_injects_bloom_on_fact_scan(spark):
    with spark_confs(spark, _CONFS):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
            F.col("p_size") == 1
        )
        j = (
            li.join(part, li["l_partkey"] == part["p_partkey"])
            .groupBy("p_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys, f"no runtime bloom filter injected:\n{phys}"
        # the filter must sit on the FACT (lineitem) branch, keyed by the
        # join key — i.e. upstream of the exchange, where it saves the
        # shuffle, not after it
        fact_lines = [ln for ln in phys.splitlines() if "might_contain" in ln]
        assert any("l_partkey" in ln for ln in fact_lines), fact_lines


def test_bloom_filtered_join_preserves_results(spark):
    """The bloom filter is a may-contain prune (false positives re-checked
    by the join itself) — results must be bit-identical with and without
    the runtime filter."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(F.col("p_size") == 1)

    def run():
        return sorted(
            (r["p_type"], r["n"], float(r["qty"]))
            for r in (
                li.join(part, li["l_partkey"] == part["p_partkey"])
                .groupBy("p_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                    .cast("double")
                    .alias("qty"),
                )
                .collect()
            )
        )

    with spark_confs(spark, _CONFS):
        with_bloom = run()
    with spark_confs(
        spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    ):
        without_bloom = run()

    assert with_bloom == without_bloom and len(with_bloom) > 0
