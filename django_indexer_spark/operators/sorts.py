"""Sort / limit / top-k / pagination / sampling — SURVEY.md §2.6 (O1-O5).

Deterministic pagination is a *convention* the engine enforces: every
paginated read must carry a total order (the reference's Meta.ordering,
accounts/models.py:64-65), otherwise pages are not reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_PAGE_SIZE = 30  # reference DRF default (base/settings.py:111-115)


def paginate(df: DataFrame, order_by: list, page: int = 1, page_size: int = DEFAULT_PAGE_SIZE) -> DataFrame:
    """O3 — page slice with a REQUIRED total order (O2).

    Spark >= 3.4 has a native offset; it pushes limit+offset into a single
    TakeOrderedAndProject when the order is present — no full sort
    materialization for early pages.
    """
    return df.orderBy(*order_by).offset((page - 1) * page_size).limit(page_size)


def paginate_after(
    df: DataFrame,
    keys: list[str],
    last_seen: tuple | list | None = None,
    page_size: int = DEFAULT_PAGE_SIZE,
    descending: bool = False,
) -> DataFrame:
    """O3 at 100× — keyset (seek) pagination: the page AFTER cursor
    ``last_seen`` (the previous page's final key tuple; None → first page).

    Offset pagination re-sorts the whole prefix: page p costs every task
    an O(p·size) heap plus a driver merge of p·size rows — fine for page
    2, pathological for page 10⁴ (the deep-crawl shape the reference's
    DRF paginator hits on /accounts). The seek form turns the prefix into
    a PREDICATE on the ordering keys, so the scan prunes (parquet
    min/max + pushed filter — at scale the ordering key is the sort/
    bucket column, so whole files skip), and every page costs the same
    O(page_size) heap regardless of depth.

    ``keys`` is the total order (O2 convention: must be unique as a
    tuple); ``last_seen`` matches it positionally. The lexicographic
    row-comparison (k1,k2) > (c1,c2) is expanded to the OR-of-prefix
    form because Spark SQL has no row-value comparison predicate.
    Walking pages by cursor partitions the ordered set exactly — the
    property tests/test_properties.py checks.

    NON-NULL CONTRACT: the ordering keys must be non-null for every row
    (and hence every cursor). SQL three-valued logic makes any comparison
    against NULL evaluate to NULL, so a NULL key row would silently fall
    out of every cursored page, and a None cursor component would make the
    whole predicate NULL (zero rows) — unlike the offset path, which still
    emits such rows. We enforce the cursor side eagerly (raise) because a
    bad cursor is a caller bug, not data skew."""
    cols = [F.col(k) for k in keys]
    if last_seen is not None:
        vals = list(last_seen) if isinstance(last_seen, (list, tuple)) else [last_seen]
        if len(vals) != len(cols):
            raise ValueError(f"cursor arity {len(vals)} != key arity {len(cols)}")
        if any(v is None for v in vals):
            raise ValueError(
                f"cursor {vals!r} contains None: keyset pagination requires a "
                f"non-null total order on {keys} (NULL comparisons are NULL in "
                "SQL, so a None cursor component would return zero rows)"
            )
        pred = None
        for i, c in enumerate(cols):
            strict = c < F.lit(vals[i]) if descending else c > F.lit(vals[i])
            for j in range(i):
                strict = strict & (cols[j] == F.lit(vals[j]))
            pred = strict if pred is None else pred | strict
        df = df.filter(pred)
    order = [c.desc() if descending else c.asc() for c in cols]
    return df.orderBy(*order).limit(page_size)


def top_k(df: DataFrame, order_by: list, k: int) -> DataFrame:
    """O4 — leaderboard head. Compiles to TakeOrderedAndProject: each task
    keeps a k-heap, driver merges — no global sort even at 100 TB."""
    return df.orderBy(*order_by).limit(k)


def seeded_sample_one(
    df: DataFrame, seed: int = 42, key_cols: list[str] | None = None
) -> DataFrame:
    """O5 — the reference's random.choice over registrations
    (lists/api.py:216-223): pick ONE arbitrary-but-stable row.

    Deterministic md5-keyed min pick, not rand(seed): order by
    md5(concat_ws(US, seed, key_cols…)) and take the first. Same
    uniform-pick semantics (md5 scrambles any key distribution), but
    bit-identical across engines — Spark and DuckDB produce the same
    lowercase md5 hex and compare strings bytewise, so the DuckDB
    oracle replays the pick exactly (round-5 verdict next-#1; the old
    rand(seed) form sampled from Spark's private XORShiftRandom stream
    and could only ever be rows-only checked). Changing ``seed``
    re-keys the hash → a different stable pick, preserving the
    reference's reseed-per-request behavior.

    ``key_cols`` (default: all columns) must identify the row and cast
    to string identically in both engines — use ids/strings, not
    floats. Compiles to TakeOrderedAndProject(1): per-task 1-heaps, no
    global sort, however big the scan."""
    keys = key_cols if key_cols is not None else list(df.columns)
    hashed = F.md5(
        F.concat_ws(
            "\x1f",
            F.lit(str(seed)),
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in keys],
        )
    )
    return df.orderBy(hashed, *[F.col(c) for c in keys]).limit(1)


def pareto_skyline(
    df: DataFrame,
    group_col: str,
    x_col: Column,
    y_col: Column,
    id_col: Column,
) -> DataFrame:
    """2-D Pareto skyline per group (both criteria MINIMIZED): the rows
    no other row dominates — x' ≤ x AND y' ≤ y with at least one
    strict. The multi-criteria shortlist ("cheapest AND earliest")
    that top-k on any single sort key cannot express.

    Distributed form: collapse to the min y per (group, x) first
    (map-side combined — dominated duplicates die before any window),
    then ONE ordered pass per group: a point survives iff its y is
    strictly below every y at strictly smaller x, i.e. below the
    running min over the RANGE frame ending 1 BEFORE the current x —
    the frame bound (not a lag) is what makes equal-x runs safe. The
    window partition holds distinct x values, not rows
    (weighted_median's contract).

    ``x_col``/``y_col`` must be integer-unit columns (cents, epoch
    days): RANGE frames demand a numeric order key, and integer min/
    compare is exact on any engine. ``id_col`` tags each surviving
    point with the smallest id among the rows that realize it."""
    per_x = (
        df.select(
            F.col(group_col),
            x_col.alias("__x"),
            y_col.alias("__y"),
            id_col.alias("__id"),
        )
        .groupBy(group_col, "__x")
        .agg(F.min(F.struct("__y", "__id")).alias("__best"))
        .select(
            group_col,
            "__x",
            F.col("__best.__y").alias("__y"),
            F.col("__best.__id").alias("__id"),
        )
    )
    w_prev = (
        Window.partitionBy(group_col)
        .orderBy("__x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prev_min = F.min("__y").over(w_prev)
    return (
        per_x.withColumn("__pm", prev_min)
        .filter(F.col("__pm").isNull() | (F.col("__y") < F.col("__pm")))
        .select(
            group_col,
            F.col("__x").alias("x"),
            F.col("__y").alias("y"),
            F.col("__id").alias("id"),
        )
    )


def rank_biased_overlap(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    depth: int = 20,
    p_num: int = 1,
    p_den: int = 2,
    dp: int = 6,
) -> DataFrame:
    """Truncated rank-biased overlap between two TOP-``depth`` rankings
    (each input: (id, rank) with ranks 1..depth) — "how much did the
    leaderboard change", the top-weighted comparison Kendall/Spearman
    can't give because they weight every position equally. RBO@d =
    (1−p)·Σ_{k≤d} p^{k−1}·|A_k ∩ B_k|/k with p = p_num/p_den.

    Exactness: p = 1/2 makes every weight p^{k−1} a dyadic rational
    held exactly in a double; overlap counts are integers off ONE
    inner join on id (agreement at depth k = #ids with
    max(rank_a, rank_b) ≤ k, a cumulative count over the join's max
    rank); per-depth terms pin ``dp`` dp and fold as DECIMAL(38,6).
    Everything after the two top-``depth`` inputs is ≤ depth rows —
    the depth spine is a literal sequence, never a fact-table scan."""
    if (p_num, p_den) != (1, 2):
        raise ValueError("only p = 1/2 keeps weights exactly dyadic")
    if not 1 <= depth <= 62:
        # the dyadic weight is a 64-bit shift: 1L << 62 is the last
        # power of two a BIGINT holds without overflow
        raise ValueError("depth must be in [1, 62]")
    pow10 = float(10**dp)
    p = p_num / p_den
    a = left.select(F.col(id_col).alias("__id"), F.col("rank").alias("__ra"))
    b = right.select(F.col(id_col).alias("__id"), F.col("rank").alias("__rb"))
    m = a.join(b, "__id").select(
        F.greatest("__ra", "__rb").alias("__m")
    )
    per_m = m.groupBy("__m").agg(F.count(F.lit(1)).alias("__c"))
    spine = left.sparkSession.range(1, depth + 1).select(
        F.col("id").cast("long").alias("k")
    )
    overlap = (
        spine.join(F.broadcast(per_m), F.col("__m") <= F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("x_k"))
    )
    # p^(k-1) = 1 / 2^(k-1) via an integer shift: exact on any engine,
    # immune to libm pow() ulp differences. The shifted 1 must be a
    # BIGINT: a 32-bit literal wraps negative at k-1 >= 31
    weight = F.expr(
        "1.0 / CAST(CAST(1 AS BIGINT) << CAST(k - 1 AS INT) AS DOUBLE)"
    )
    term = (
        F.floor(
            F.col("x_k").cast("double")
            / F.col("k").cast("double")
            * weight
            * F.lit(pow10)
            + F.lit(0.5)
        )
        / F.lit(pow10)
    ).cast("decimal(38,6)")
    return overlap.select(term.alias("__t")).agg(
        F.lit(depth).cast("long").alias("depth"),
        (
            F.floor(
                F.sum("__t").cast("double") * F.lit(1.0 - p) * F.lit(pow10)
                + F.lit(0.5)
            )
            / F.lit(pow10)
        ).alias("rbo"),
    )
