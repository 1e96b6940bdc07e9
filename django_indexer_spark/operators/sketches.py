"""Bounded-state sketch operators (north-star extension, same family as
aggregates.approx_distinct_count's HLL note).

The 100 TB problem with exact frequency queries: ``groupBy(token)`` over
a corpus token stream shuffles EVERY occurrence — the shuffle is the size
of the corpus. A frequent-items sketch bounds the state: per-partition
Misra-Gries summaries of capacity k (O(k) memory, one pass, no shuffle)
whose union provably contains every item with global frequency > N/(k+1),
then an exact recount of only those candidates (broadcast semi-join —
the shuffle shrinks from |corpus| to |heavy occurrences|).

Because the candidate set is a SUPERSET of the true heavy hitters and the
recount is exact, the final output is deterministic and identical to the
full groupBy + HAVING — which is exactly what makes it oracle-checkable
(the sketch changes the PLAN, never the ANSWER).

The per-partition sketch runs in mapInPandas (Arrow batches; vectorized
value_counts merge, never per-row Python) — the documented custom-operator
slow path, used here because a decrement-counter sketch is genuinely
inexpressible in DataFrame algebra. Merge rule is the standard summary
merge (Agarwal et al., "Mergeable Summaries", PODS'12): sum counters,
and when more than k survive, subtract the (k+1)-th largest count from
all and drop the non-positive — preserving the MG error bound n_p/(k+1)
per partition; pigeonhole lifts it to N/(k+1) across the union.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def misra_gries_candidates(values: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-items candidates, capacity ``k``.

    Input: any DataFrame with a string column ``col`` (one row per
    occurrence). Output: distinct candidate values — every value whose
    global count exceeds N/(k+1) is guaranteed present (possibly plus
    false positives; callers recount exactly). O(k) state per partition,
    zero shuffle before the final distinct (which is over ≤ k×partitions
    rows)."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = pd.Series(dtype="int64")
        for pdf in batches:
            counts = pdf[col].value_counts()
            state = state.add(counts, fill_value=0)
            if len(state) > k:
                # mergeable-summary decrement: subtract the (k+1)-th
                # largest from ALL counters, drop non-positive — ≤ k
                # survive, and each event charges ≥ (k+1)·thresh of
                # discarded weight, giving the n_p/(k+1) error bound
                thresh = state.nlargest(k + 1).iloc[-1]
                state = state - thresh
                state = state[state > 0]
        yield pd.DataFrame({col: state.index.astype(str)})

    return values.select(col).mapInPandas(sketch, f"{col} string").distinct()


def heavy_hitters(
    values: DataFrame, col: str, k: int, count_alias: str = "n_occurrences"
) -> DataFrame:
    """Exact heavy hitters: every value of ``col`` whose occurrence count
    exceeds N/(k+1), with its EXACT count — computed without a full-stream
    groupBy. Three jobs:

      1. per-partition MG sketch → candidate superset (no shuffle);
      2. broadcast-semi-join the stream against candidates + recount
         (shuffle carries only candidate occurrences);
      3. total N (1-row count) cross-joined for the threshold filter.

    Output == ``groupBy(col).count().filter(cnt * (k+1) > N)`` — the
    sketch only prunes the shuffle. Deterministic; fully oracle-checkable.
    """
    candidates = misra_gries_candidates(values, col, k)
    total = values.agg(F.count(F.lit(1)).alias("__N"))
    counted = (
        values.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col(count_alias) * (k + 1) > F.col("__N"))
        .drop("__N")
    )


def kmv_distinct_estimate(
    df: DataFrame, col: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    hash every value to a uniform fraction, keep the k smallest DISTINCT
    fractions; if the k-th smallest is f_k, the estimate is (k-1)/f_k
    (k uniform order statistics ⇒ E[f_k] ≈ k/n). Fewer than k distinct
    values ⇒ the sketch IS the distinct set and the count is exact.

    Unlike HLL (whose register layout is engine-private — see
    a3_approx_distinct's rows-only gate), KMV built on md5 is
    deterministic AND cross-engine exact: the hash fraction folds the
    first 13 hex digits (52 bits — exact in a double on any engine), so
    the k-th order statistic, hence the estimate, is bit-identical in
    DuckDB — an oracle-checkable approximate-distinct.

    Scale shape: one narrow map (hash), distinct (uniform-key shuffle of
    the DISTINCT values only), then a TakeOrdered of k rows — the
    driver/final state is O(k) no matter the corpus. The sketch is also
    mergeable (union two sketches' fractions, re-take the k smallest) —
    the partial-aggregate form a 1000-executor rollup uses.

    Returns one row: (n_kept, est_distinct)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string")))
    frac = F.conv(F.substring(h, 1, 13), 16, 10).cast("long").cast("double") / F.lit(
        float(16**13)
    )
    # NULLs never enter the sketch: a NULL value hashes to a NULL fraction,
    # which Spark's ascending sort puts FIRST — it would occupy a k-min
    # slot (inflating n_kept and displacing the true k-th minimum) while
    # the DuckDB oracle's NULLS LAST ordering excludes it. count_distinct
    # semantics ignore NULL, so drop it before the distinct.
    mins = (
        df.select(frac.alias("f"))
        .filter(F.col("f").isNotNull())
        .distinct()
        .orderBy("f")
        .limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(float(k - 1))) / F.max("f")),
            4,
        ).alias("est_distinct"),
    )


def cm_error_profile(
    df: DataFrame, col: str, depth: int = 4, width: int = 64, salt: str = "cm"
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) with its exact
    error profile: per distinct value → (value, exact_count, cm_estimate,
    overcount). cm_estimate = min over ``depth`` rows of the counter the
    value hashes to; overcount = estimate - exact >= 0 always (counters
    only ever ADD colliding values' mass — the one-sided error is the
    sketch's contract, and the output proves it per value).

    Rounds out the sketch family: MG (heavy hitters), KMV (distinct),
    HLL (engine-native distinct) — CM answers point frequency queries in
    O(depth x width) space. Like KMV, the md5-derived bucket makes the
    whole sketch deterministic AND engine-portable (8 hex digits → int →
    mod width), so unlike HLL it is fully oracle-checkable.

    Scale shape: ONE corpus pass builds the counters via a map-side
    partial-aggregated groupBy over (row, bucket) — the counter frame is
    depth x width cells no matter the corpus, so it broadcasts; the
    per-value estimate join touches only distinct values. The sketch is
    mergeable (cell-wise sum), which is what a 1000-executor rollup or a
    streaming foreachBatch fold uses."""
    v = F.col(col).cast("string")
    buckets = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"{salt}{r}:"), v)), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("b"),
            )
            for r in range(depth)
        ]
    )
    occ = df.select(v.alias("__v"), buckets.alias("__bs"))
    counters = (
        occ.select(F.explode("__bs").alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    exact = occ.groupBy(F.col("__v").alias("value")).agg(
        F.count(F.lit(1)).alias("exact_count"), F.first("__bs").alias("__bs")
    )
    est = (
        exact.select("value", "exact_count", F.explode("__bs").alias("rb"))
        .join(
            F.broadcast(counters),
            (F.col("rb.r") == F.col("r")) & (F.col("rb.b") == F.col("b")),
        )
        .groupBy("value", "exact_count")
        .agg(F.min("cell").cast("long").alias("cm_estimate"))
    )
    return est.select(
        "value",
        F.col("exact_count").cast("long").alias("exact_count"),
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_count")).cast("long").alias("overcount"),
    )


def kmv_set_estimates(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """KMV SET-OPERATION estimates (Beyer et al., SIGMOD 2007): union
    and intersection cardinality of two key sets from one merged k-min
    sketch — the mergeable form a 1000-executor rollup combines, and
    the standard pre-join cardinality probe (estimate |A ∩ B| before
    paying for the join).

    Construction: hash both sides with the SAME salted md5 fraction as
    ``kmv_distinct_estimate`` (52-bit fold — exact in a double on any
    engine), take the k smallest DISTINCT fractions of the UNION with
    per-value membership flags. For a value among the union's k minima,
    being in side X's own k-min sketch is equivalent to being in X at
    all (it has < k union values below it, so < k X-values), so the
    merged sketch carries exact membership — no second pass.

    Estimators (K = merged sketch, f_k = its largest fraction,
    ρ = |{v ∈ K : v ∈ A and v ∈ B}| / |K|):
    - est_union = (k-1)/f_k, or the exact count if |K| < k;
    - est_intersection = ρ · est_union (exact n_both when |K| < k).

    One uniform-key shuffle on the hashed value, O(k) final state.
    All arithmetic after the order statistic is IEEE double pinned to
    4 dp with the portable rounding — bit-identical cross-engine.
    Returns one row: (n_kept, n_both, est_union, est_intersection)."""

    def frac(c: str) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(c).cast("string")))
        return F.conv(F.substring(h, 1, 13), 16, 10).cast("long").cast(
            "double"
        ) / F.lit(float(16**13))

    tagged = (
        df_a.select(frac(col_a).alias("f"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .filter(F.col("f").isNotNull())
        .unionByName(
            df_b.select(
                frac(col_b).alias("f"), F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            ).filter(F.col("f").isNotNull())
        )
    )
    merged = (
        tagged.groupBy("f")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("f")
        .limit(k)
    )

    def _r4(c: F.Column) -> F.Column:
        return F.floor(c * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)

    n = F.count(F.lit(1))
    n_both = F.sum((F.col("in_a") * F.col("in_b")).cast("long"))
    est_union = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.max("f")
    )
    est_inter = F.when(n < k, n_both.cast("double")).otherwise(
        (n_both.cast("double") / n.cast("double")) * (F.lit(float(k - 1)) / F.max("f"))
    )
    return merged.agg(
        n.cast("long").alias("n_kept"),
        n_both.cast("long").alias("n_both"),
        _r4(est_union).alias("est_union"),
        _r4(est_inter).alias("est_intersection"),
    )


def bottomk_quantile_profile(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value: "F.Column",
    k: int = 64,
    salt: str = "q",
) -> DataFrame:
    """Uniform-sample quantile sketch with its EXACT error profile —
    the quantile sibling of ``cm_error_profile`` (frequencies) and
    ``kmv_distinct_estimate`` (cardinality): per group, keep the k
    rows with the smallest md5(salt:id) (a deterministic uniform
    sample — bottom-k by hash IS the sample, no RNG), take the
    sample's lower median, and report it NEXT TO the exact lower
    median so the gate measures the estimator's real error instead of
    trusting a bound.

    Medians are the LOWER median (position ⌈n/2⌉ in (value, id)
    order) — a value actually present in the data, so every output
    column is an exact integer; nothing to pin. Shape: two
    group-partitioned windows (hash rank for membership, value rank
    for the median pick), per-group state = k rows for the sketch
    side; at 100 TB the bottom-k membership is the same
    partial-aggregable trick KMV uses (per-partition top-k heaps,
    merge keeps the global bottom-k)."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col),
        F.col(id_col).alias("__id"),
        value.cast("long").alias("__v"),
        F.md5(
            F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
        ).alias("__h"),
    )
    w_h = Window.partitionBy(group_col).orderBy("__h", "__id")
    w_v = Window.partitionBy(group_col).orderBy("__v", "__id")
    exact = (
        base.withColumn("__rv", F.row_number().over(w_v))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
        .filter(F.col("__rv") == F.expr("(__n + 1) DIV 2"))
        .select(
            F.col(group_col),
            F.col("__n").cast("long").alias("n"),
            F.col("__v").alias("exact_median"),
        )
    )
    sample = base.withColumn("__rh", F.row_number().over(w_h)).filter(
        F.col("__rh") <= k
    )
    w_sv = Window.partitionBy(group_col).orderBy("__v", "__id")
    est = (
        sample.withColumn("__rv", F.row_number().over(w_sv))
        .withColumn(
            "__sn", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
        .filter(F.col("__rv") == F.expr("(__sn + 1) DIV 2"))
        .select(
            F.col(group_col),
            F.col("__sn").cast("long").alias("sample_n"),
            F.col("__v").alias("est_median"),
        )
    )
    return exact.join(est, group_col).select(
        group_col,
        "n",
        "sample_n",
        "exact_median",
        "est_median",
        F.abs(F.col("est_median") - F.col("exact_median"))
        .cast("long")
        .alias("abs_err"),
    )
