"""Aggregation operators — SURVEY.md §2.4 (A1-A10).

The reference computes its stats with O(entities x queries) Python loops
(tasks.py:188-327, one QuerySet per pot/account); here each stats family is
ONE grouped aggregation — map-side partial aggregation + a single shuffle —
then a broadcast join back to the entity table (plans/account_stats.py,
plans/pot_stats.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.amounts import guarded_amount


def conditional_sum(flag: Column, value: Column, alias: str) -> Column:
    """A5 — pivot-by-flag aggregation (tasks.py:188-257 matching_pool split):
    sum(value) restricted to rows where ``flag`` holds, in ONE pass over the
    fact table instead of the reference's two filtered queries per pot."""
    return F.sum(F.when(flag, value)).alias(alias)


def conditional_count(flag: Column, alias: str) -> Column:
    return F.count(F.when(flag, F.lit(1))).alias(alias)


def guarded_amount_sum(col: str, alias: str) -> Column:
    """A6 — digit-guarded sum of u128 string amounts (tasks.py:200-204)."""
    return F.sum(guarded_amount(col)).alias(alias)


def distinct_count(df: DataFrame, col: str) -> DataFrame:
    """A3 exact — countDistinct (base/api.py:74-79, tasks.py:285-287)."""
    return df.agg(F.countDistinct(col).alias(f"distinct_{col}"))


def approx_distinct_count(df: DataFrame, col: str, rsd: float = 0.02) -> DataFrame:
    """A3 at 100 TB — HyperLogLog++ sketch. Exact countDistinct of a
    high-cardinality key is a full shuffle of the key; the sketch is a
    map-side-combinable fixed-size state. Exposed as a first-class variant
    (SURVEY.md §2.4 A3 note)."""
    return df.agg(F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}"))


def welch_ttest(
    df: DataFrame,
    group_col: str,
    arm_col: Column,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Welch's two-sample t statistic per group — the A/B-test readout
    over an event log (arms usually assigned by a deterministic hash of
    the unit id, so re-runs and engines agree). Output per group: both
    arms' n/mean and the t statistic.

    Scale design: ONE map-side-combined shuffle — conditional decimal
    sums of 3-dp-rounded values (DECIMAL(18,3)) and their EXACT squares
    (DECIMAL(38,6) holds any (18,3)² without rounding) fold
    order-independently, means/variances derive arithmetically from the
    six folded scalars, so the t is bit-stable cross-engine. The 3-dp
    input quantization is the portability contract: a lossless-square
    decimal beats a 6-dp input whose square would round on the cast.
    Sample variance uses n-1; groups where either arm has n < 2 or
    both variances are zero emit t = NULL rather than dividing by
    zero."""
    v = F.col(value_col).cast("double")
    vd = F.round(v, 3).cast("decimal(18,3)")
    a = arm_col.cast("boolean")

    def _s(cond: Column, expr, alias: str) -> Column:
        return F.sum(F.when(cond, expr).otherwise(F.lit(None))).alias(alias)

    g = df.groupBy(group_col).agg(
        F.count(F.when(a, F.lit(1))).alias("n_a"),
        F.count(F.when(~a, F.lit(1))).alias("n_b"),
        _s(a, vd, "__sa"),
        _s(~a, vd, "__sb"),
        _s(a, (vd * vd).cast("decimal(38,6)"), "__qa"),
        _s(~a, (vd * vd).cast("decimal(38,6)"), "__qb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("__sa").cast("double") / na
    mb = F.col("__sb").cast("double") / nb
    # sample variance: (Σv² − n·mean²) / (n − 1)
    va = (F.col("__qa").cast("double") - na * ma * ma) / (na - 1)
    vb = (F.col("__qb").cast("double") - nb * mb * mb) / (nb - 1)
    se = F.sqrt(va / na + vb / nb)
    t = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se > 0),
        F.round((ma - mb) / se, round_dp),
    )
    return g.select(
        group_col,
        "n_a",
        "n_b",
        F.round(ma, round_dp).alias("mean_a"),
        F.round(mb, round_dp).alias("mean_b"),
        t.alias("t_stat"),
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: Column,
    weight_col: Column,
    alias: str = "weighted_median",
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value v such
    that the weight at or below v reaches half the group's total weight
    — percentile_cont's weighted cousin, which no SQL engine ships as a
    built-in. The right center for "median price paid" style questions
    where each row carries a volume, not one vote.

    ``value_col`` and ``weight_col`` must be EXACT types (decimal/int):
    the cumulative fold is then order-independent and engine-exact, so
    the crossing point is unambiguous cross-engine (no double cumsum
    whose association order could flip a boundary row).

    Scale design: collapse to one row per (group, value) FIRST (map-side
    combined shuffle, state = distinct values, not rows), then ONE
    running-sum window per group over that collapsed relation and a
    min() re-aggregate of the crossing values. The window partition
    holds distinct values per group — bounded by the value domain, not
    the fact table; a group whose distinct-value count rivals its row
    count should pre-round values to the precision the question needs
    (the same bucketing trade every exact-percentile path makes)."""
    per_value = (
        df.select(
            F.col(group_col), value_col.alias("__v"), weight_col.alias("__w")
        )
        .groupBy(group_col, "__v")
        .agg(F.sum("__w").alias("__w"))
    )
    w_run = (
        Window.partitionBy(group_col)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = per_value.select(
        F.col(group_col),
        F.col("__v"),
        F.sum("__w").over(w_run).alias("__cum"),
        F.sum("__w").over(w_all).alias("__tot"),
    )
    return (
        cum.filter(F.col("__cum") * 2 >= F.col("__tot"))
        .groupBy(group_col)
        .agg(
            F.min("__v").alias(alias),
            F.min("__tot").alias("total_weight"),
        )
    )
