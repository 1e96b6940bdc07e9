"""Data-quality operators: column profiling, join-key skew diagnostics,
and Deequ-style constraint checks — the validation pass a training-data
pipeline runs before (and after) every heavy transform.

Reference parity note: the reference validates rows imperatively at
ingest time (per-model ``save()`` guards and admin spot checks, e.g.
donations/models.py:36-118 field constraints, accounts upserted with
implicit PK uniqueness). At 100 TB nobody validates row-at-a-time in
Python; the equivalent is a declarative one-pass aggregate over the
table that returns a small (check, violations) relation. That shape is
what this module provides.

Scale design:
- ``column_profile`` is ONE scan. The exact-distinct variant pays one
  Expand (rows × profiled columns) feeding partial aggregates — the
  classic single-pass/multi-distinct tradeoff, chosen over m separate
  scans because scan >> shuffle for wide tables. The ``approx`` variant
  replaces exact distinct with HLL partial aggregates (no Expand, no
  per-value shuffle) — that is the 100 TB default; exact is for gates
  and small dims.
- ``skew_profile`` aggregates per key FIRST (map-side partial combine,
  one shuffle of |keys| rows), derives the global total from the 1-row
  re-aggregate of the grouped counts (broadcast back), and top-k's with
  orderBy+limit (TakeOrderedAndProject — never a global sort).
- ``constraint_checks`` folds every row-level predicate into a single
  aggregate pass (sum of violation indicators + count/count_distinct
  for uniqueness); referential checks are LEFT ANTI join counts against
  the parent key set (bucketable/broadcastable by Catalyst). Output is
  a ≤ |checks|-row relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column stats in one scan: rows, nulls, distinct, min/max.

    Returns (column, n_rows, n_null, n_distinct, min_s, max_s) with one
    row per profiled column. min/max render as strings so the relation is
    type-uniform; doubles route through DECIMAL(18,2) for stable text.

    ``approx=True`` swaps exact ``count_distinct`` for
    ``approx_count_distinct`` — the no-Expand HLL plan to use at corpus
    scale where ±2% on distinct counts is fine.
    """
    names = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(col)
        )
        # min/max aggregate the NATIVE value (string-min of a numeric
        # column is lexicographic — "100" < "99"); rendering to text
        # happens after the aggregate, in the stack below
        aggs += [
            F.count(col).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    # unpivot the 1-row wide aggregate into per-column rows — stack()
    # over a single row is driver-negligible and keeps everything
    # JVM-side. Doubles render via DECIMAL(18,2) (Java's Double.toString
    # flips to scientific notation where ANSI casts do not).
    stack_args: list[str] = []
    for c in names:
        if dtypes[c] in ("double", "float"):
            mn = f"cast(cast(__min_{c} as decimal(18,2)) as string)"
            mx = f"cast(cast(__max_{c} as decimal(18,2)) as string)"
        else:
            mn, mx = f"cast(__min_{c} as string)", f"cast(__max_{c} as string)"
        stack_args.append(f"'{c}', __nn_{c}, __nd_{c}, {mn}, {mx}")
    n = len(names)
    return one.selectExpr(
        "__n",
        f"stack({n}, {', '.join(stack_args)}) as "
        "(col_name, __nn, n_distinct, min_s, max_s)",
    ).select(
        "col_name",
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).cast("long").alias("n_null"),
        F.col("n_distinct").cast("long"),
        "min_s",
        "max_s",
    )


def skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnostics for a prospective join/groupBy key: the top-N
    keys by frequency with their share of all rows and their ratio to the
    mean key frequency (the number that predicts reducer skew — a
    skew_ratio of 50 means the hot key's reducer does 50× the average
    work, the signal to salt or let AQE split it).

    Plan: groupBy(key).count() partial-aggregates map-side (one shuffle of
    |keys| rows); totals come from re-aggregating the GROUPED relation
    (1 row, broadcast back via crossJoin); top-N is orderBy+limit →
    TakeOrderedAndProject, never a full sort.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key_value",
            "cnt",
            F.round(F.col("cnt") * 100.0 / F.col("__total"), 4).alias(
                "share_pct"
            ),
            # cast before multiplying: cnt × nkeys in long overflows once
            # both are ~1e9-scale (hot key on a 100 TB fact table)
            F.round(
                F.col("cnt").cast("double") * F.col("__nkeys") / F.col("__total"),
                4,
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), "key_value")
        .limit(top_n)
    )


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull().cast("long"))


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    c = F.col(col)
    viol = ~((c >= F.lit(lo)) & (c <= F.lit(hi)))
    # NULL comparisons are NULL → treat missing as violating the range
    return (
        f"in_range({col},{lo},{hi})",
        F.coalesce(viol, F.lit(True)).cast("long"),
    )


def accepted_values(col: str, values: list[str]) -> tuple[str, Column]:
    viol = ~F.col(col).isin(values)
    return (
        f"accepted_values({col})",
        F.coalesce(viol, F.lit(True)).cast("long"),
    )


def matches_regex(col: str, pattern: str) -> tuple[str, Column]:
    viol = ~F.col(col).rlike(pattern)
    return (
        f"matches_regex({col})",
        F.coalesce(viol, F.lit(True)).cast("long"),
    )


def constraint_checks(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
    referential: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Declarative validation suite → (check, n_violations, passed).

    - ``row_checks``: (name, violation-indicator Column) pairs from the
      helpers above; ALL of them fold into ONE aggregate scan (each is a
      sum of 0/1 longs — pure partial-aggregate, no Expand).
    - ``unique_cols``: uniqueness via count − count_distinct (adds the
      multi-distinct Expand only when requested).
    - ``referential``: (child_col, parent_df, parent_col) — orphan count
      via LEFT ANTI join on the parent key set (Catalyst broadcasts small
      parents; bucketed layouts co-locate big ones).

    Everything unions into one ≤ |checks|-row relation, so a scheduler
    can gate a pipeline on ``passed = false`` rows without collecting
    anything big.
    """
    aggs: list[Column] = []
    names: list[str] = []
    for name, viol in row_checks:
        aggs.append(F.sum(viol).alias(f"__v{len(names)}"))
        names.append(name)
    for c in unique_cols or []:
        aggs.append(
            (F.count(F.col(c)) - F.count_distinct(F.col(c))).alias(
                f"__v{len(names)}"
            )
        )
        names.append(f"unique({c})")
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', __v{i}" for i, name in enumerate(names)
    )
    # 'check' is a reserved word in ANSI engines (DuckDB rejects it as a
    # bare alias) — check_name keeps the relation portable
    out = one.selectExpr(
        f"stack({len(names)}, {stack}) as (check_name, n_violations)"
    )
    for child_col, parent_df, parent_col in referential or []:
        orphans = (
            df.select(F.col(child_col))
            .filter(F.col(child_col).isNotNull())
            .join(
                parent_df.select(F.col(parent_col).alias(child_col)),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(
                F.lit(f"referential({child_col})").alias("check_name"),
                F.col("n_violations"),
            )
        )
        out = out.unionByName(orphans)
    return out.select(
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
