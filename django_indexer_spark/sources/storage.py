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
from pyspark.sql.window import Window


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


def zorder_bounds(
    df: DataFrame, cols: list[str]
) -> list[tuple[float, float]]:
    """Per-column (min, max) for Z-order normalization — one aggregate
    scan, bounded 2×|cols| driver collect (the sq8_bounds pattern).
    Layout jobs run this once per rewrite, then inline the bounds."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    # empty input / all-null column → min/max are None; (0.0, 0.0) makes
    # zorder_key's span<=0 branch pin the rank to 0 instead of crashing
    # the layout job
    return [
        (
            float(row[f"__lo_{c}"]) if row[f"__lo_{c}"] is not None else 0.0,
            float(row[f"__hi_{c}"]) if row[f"__hi_{c}"] is not None else 0.0,
        )
        for c in cols
    ]


def zorder_key(
    cols: list[str], bounds: list[tuple[float, float]], bits: int = 16
) -> Column:
    """Z-order (Morton) key: each column normalizes to a ``bits``-bit
    integer rank via its (min, max), then the bit planes interleave —
    column j's bit i lands at position i·n_cols + j. Sorting by this ONE
    key clusters rows so every file/row-group covers a small HYPER-CUBE
    of the combined key space: a predicate on ANY clustered column skips
    most files, instead of only predicates on the leading column of a
    lexicographic sort (the multi-column generalization of SURVEY §4's
    index mapping; same layout trick as Delta/Iceberg OPTIMIZE ZORDER).

    Pure JVM expression (shifts and masks over the normalized ranks) —
    generated as ONE SQL string, the _cell_sims py4j lesson. n_cols·bits
    must fit a signed long: n_cols·bits ≤ 62.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    max_rank = (1 << bits) - 1
    rank_exprs = []
    for c, (lo, hi) in zip(cols, bounds):
        span = hi - lo
        if span <= 0:
            rank_exprs.append("CAST(0 AS BIGINT)")
        else:
            rank_exprs.append(
                f"CAST(least({max_rank}, greatest(0, "
                f"floor((CAST(`{c}` AS DOUBLE) - CAST('{lo!r}' AS DOUBLE)) / "
                f"CAST('{span!r}' AS DOUBLE) * {max_rank}))) AS BIGINT)"
            )
    terms = []
    for j, r in enumerate(rank_exprs):
        for i in range(bits):
            # bit i of rank j → interleaved position i*n + j
            terms.append(f"shiftleft(shiftright({r}, {i}) & 1, {i * n + j})")
    return F.expr(" | ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by Z-order across ``zorder_cols``:
    range-partition on the Morton key (n_files contiguous key ranges →
    n_files hyper-cubes), sort within each, write one file per range.
    read_pruned predicates on ANY of the clustered columns then skip
    files/row-groups via min-max stats — proven by the footer-stats test
    (tests/test_storage.py) against the lexicographic layout."""
    bounds = zorder_bounds(df, zorder_cols)
    zk = zorder_key(zorder_cols, bounds, bits).alias("__zk")
    (
        df.withColumn("__zk", zk)
        .repartitionByRange(n_files, F.col("__zk"))
        .sortWithinPartitions("__zk")
        .drop("__zk")
        .write.mode(mode)
        .parquet(path)
    )


def compaction_plan(
    files: DataFrame,
    part_col: str,
    id_col: str,
    size_col: str,
    target: int,
    salt: str = "compact",
    num_partitions: int | None = None,
) -> DataFrame:
    """Small-file compaction plan: assign every input file to an output
    bin of ~``target`` combined size, per table partition — the planning
    half of Delta OPTIMIZE / Iceberg rewrite_data_files, and the direct
    answer to the small-file failure mode ``write_clustered``'s header
    documents. Greedy sequential fill in a seeded deterministic walk
    (md5('<salt>:<id>')): a file lands in bin

        floor(exclusive_running_size / target)

    which bounds the OUTPUT FILE COUNT — the quantity compaction
    exists to shrink — at ⌈partition total / target⌉ (each bin index is
    the running total divided by target, so a partition of S bytes uses
    at most ⌈S/target⌉ distinct bins), with no bin exceeding
    target + max_file_size. Individual bins right after a
    boundary-straddling file can come in under target; FFD would shave
    that at the cost of a global size sort that buys nothing once files
    are within an order of magnitude of each other, the normal
    compaction regime.

    Scale shape: the file list is METADATA (|files|, not table bytes) and
    the whole plan is the shared two-pass prefix-sum
    (sampling.grouped_prefix_sums): range-partition on (partition, walk
    key), per-slice sums feed a tiny offset window that broadcasts back —
    no partition's file list ever serializes through one reducer. Output
    is (partition, file id, size, bin), engine-exact integer arithmetic
    throughout."""
    from ..operators.sampling import grouped_prefix_sums

    cum = grouped_prefix_sums(
        files, id_col, size_col, part_col, salt=salt, num_partitions=num_partitions
    )
    return cum.select(
        F.col(part_col),
        F.col(id_col),
        F.col("__tok").cast("long").alias("size"),
        F.expr(f"(__cum - __tok) div {int(target)}").cast("long").alias("bin"),
    )


def rebalance_plan(
    df: DataFrame,
    shard_col: str,
) -> DataFrame:
    """Minimum-volume shard rebalancing plan: given current per-shard
    row loads, emit the (from_shard, to_shard, qty) transfers that
    equalize every shard to its fair target — the planning half of a
    cluster rebalance (consistent-hash ring repair, Kafka partition
    reassignment, HDFS mover), sized so total moved volume is exactly
    Σ surplus, the theoretical minimum.

    All-integer: targets are the Hamilton split of the total (total
    DIV n, remainders to the first total%n shards in key order); each
    surplus shard owns the half-open segment [cum_before, cum_after)
    of the global "excess" line, each deficit shard owns its segment
    of the identical-length "need" line, and a transfer is every
    overlap between a surplus and a deficit segment (qty = overlap
    length > 0). Segment alignment is the waterline trick: it yields
    at most n_surplus + n_deficit − 1 moves, provably minimal volume.

    Scale shape: ONE grouped count over the fact table; everything
    after is ≤|shards| rows — two windows over that tiny relation and
    one broadcast interval-overlap join (shards², but shards is the
    small side by definition). The moves list is the artifact an
    executor fleet consumes; the data movement itself would be a
    shuffle keyed by the plan."""
    loads = df.groupBy(shard_col).agg(F.count(F.lit(1)).alias("__load"))
    tot = loads.agg(
        F.sum("__load").alias("__tot"), F.count(F.lit(1)).alias("__n")
    )
    wk = Window.orderBy(F.col(shard_col).asc())
    t = (
        loads.crossJoin(F.broadcast(tot))
        .withColumn("__rk", F.row_number().over(wk))
        .select(
            shard_col,
            "__load",
            (
                F.expr("__tot DIV __n")
                + (F.col("__rk") <= F.expr("__tot % __n")).cast("long")
            ).alias("__target"),
        )
        .withColumn("__delta", F.col("__load") - F.col("__target"))
    )
    ws = Window.orderBy(F.col(shard_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sur = (
        t.filter(F.col("__delta") > 0)
        .withColumn("__hi", F.sum("__delta").over(ws))
        .select(
            F.col(shard_col).alias("from_shard"),
            (F.col("__hi") - F.col("__delta")).alias("__slo"),
            F.col("__hi").alias("__shi"),
        )
    )
    dfc = (
        t.filter(F.col("__delta") < 0)
        .withColumn("__hi", F.sum(-F.col("__delta")).over(ws))
        .select(
            F.col(shard_col).alias("to_shard"),
            (F.col("__hi") + F.col("__delta")).alias("__dlo"),
            F.col("__hi").alias("__dhi"),
        )
    )
    qty = F.least(F.col("__shi"), F.col("__dhi")) - F.greatest(
        F.col("__slo"), F.col("__dlo")
    )
    return (
        sur.join(
            F.broadcast(dfc),
            (F.col("__slo") < F.col("__dhi"))
            & (F.col("__dlo") < F.col("__shi")),
        )
        .select("from_shard", "to_shard", qty.cast("long").alias("qty"))
        .filter(F.col("qty") > 0)
    )


def _morton_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """Bit-interleaved (Morton / Z-order) key as a plain SQL expression —
    x in the even bit positions, y in the odd. Pure shifts/ANDs/ORs in
    one fixed parse shape, so the SAME string runs on Spark SQL and
    DuckDB and yields the identical BIGINT (2·bits ≤ 62)."""
    terms = []
    for j in range(bits):
        # every term fully parenthesized: << vs | precedence must not
        # depend on either engine's parser
        terms.append(f"(((({x_expr}) >> {j}) & 1) << {2 * j})")
        terms.append(f"(((({y_expr}) >> {j}) & 1) << {2 * j + 1})")
    return " | ".join(terms)


def zorder_plan(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    shift: int,
) -> DataFrame:
    """Z-order data-layout plan: interleave two 16-bit cell coordinates
    into a Morton key, assign each row to a fixed-width key-range file
    (``morton >> shift``), and report every file's 2-D bounding box —
    the planning half of Delta/Iceberg Z-ORDER clustering. The payoff
    the bounding boxes make visible: along a Z-curve a file's min/max
    stay tight in BOTH dimensions at once, so a predicate on EITHER
    column prunes files — a single-column sort gives tight boxes in
    one dimension and full-range boxes in the other.

    ``x_expr``/``y_expr`` must be SQL strings yielding integers in
    [0, 65536) (the caller scales domain → 16 bits with fixed integer
    literals — data-independent, no sampling pass). Fixed-width ranges
    instead of NTILE keep the whole plan ONE map-side projection plus
    one ≤-2^(32−shift)-row groupBy: no global sort, no
    single-partition window; occupancy varies per file exactly as
    fixed range boundaries do in production (the write path would
    range-partition by the same key)."""
    file_id = F.expr(f"({_morton_sql(x_expr, y_expr)}) >> {shift}").cast(
        "long"
    )
    return (
        df.select(
            file_id.alias("file_id"),
            F.expr(x_expr).cast("long").alias("__x"),
            F.expr(y_expr).cast("long").alias("__y"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )
