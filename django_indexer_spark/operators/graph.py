"""Iterative graph operators — connected components for near-dup clustering.

A real corpus dedup does not stop at candidate PAIRS: near-duplication is
transitive in practice (A~B, B~C ⇒ one cluster {A,B,C}), so the keep/drop
decision needs the connected components of the similarity graph, then one
canonical representative per component. The reference has no graph engine
and neither does Spark SQL — this is the classic iterative-DataFrame
algorithm expressed so Catalyst still owns every step.

Algorithm: min-label propagation. Every node starts labeled with itself;
each round a node adopts the minimum label among itself and its
neighbors. Labels only ever decrease, and the fixpoint (no change) is
exactly "label = min node id of my component". Rounds needed = graph
diameter — for near-dup clusters (LSH buckets produce near-cliques) that
is small single digits.

Scale shape per round: one shuffle join (edges ⋈ labels on dst) + one
groupBy(src) min — both keyed on node ids, partial-aggregated map-side.
Convergence is detected with a single scalar aggregate (sum of labels,
exact decimal so 100 TB of ids can't overflow): labels are monotonically
non-increasing, so an unchanged sum IS the fixpoint — no extra old⋈new
join just to diff. Each round materializes via ``iterative.cut_lineage``
to cut the exponentially-growing lineage an iterative self-referential
plan builds: reliable ``df.checkpoint`` when the session has a
checkpoint dir configured (cluster deploys — session.get_spark_cluster
sets one so per-round state survives executor loss), executor-local
``localCheckpoint`` otherwise (local mode has no durable store).

Shuffle width is sized from the EDGE COUNT, not the session default: the
similarity graph is orders of magnitude smaller than the corpus that
produced it (only docs with a near-dup candidate appear), so running its
per-round joins at corpus shuffle width just schedules empty tasks —
measured ~0.7 s/round of pure overhead for an 826-edge graph at width
32 vs ~0.1 s at width 1. The same rule sized UP is what a 100 TB run
needs: billions of pairs → thousands of partitions, set by the same
rows-per-partition target.

This is the two-relation core of the Hash-to-Min family (Rastogi et al.,
"Finding Connected Components in MapReduce", ICDE'13) without the
large-star/small-star edge rewriting — the rewrite halves rounds on
high-diameter graphs but complicates the plan; dedup graphs are
low-diameter, so propagation wins on simplicity and per-round cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..iterative import cut_lineage

# one reduce task per this many symmetrized edges. 100k rows is the
# measured sweet spot for the loops' per-round JOIN+fold tasks (a width
# sweep on a_hits_scores at sf0.1: 5M→6.0 s, 1M→5.4, 250k→5.2,
# 100k→4.6, 40k→4.9 — identical results at every width): below it task
# scheduling dominates, above it one core serializes multi-second join
# work. The session shuffle width still CAPS the answer (min() below),
# so a cluster-sized session is unaffected — this floor only widens
# small graphs that would otherwise run their rounds on one task.
ROWS_PER_PARTITION = 100_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns (id, component) for every node appearing in ``edges``, where
    ``component`` is the MINIMUM node id of the node's component — a
    deterministic, engine-independent cluster id.

    Raises RuntimeError if ``max_iter`` rounds don't converge (diameter
    larger than max_iter — raise the cap for path-shaped graphs).
    """
    # symmetrize once: propagation must flow both ways along an edge.
    # persist it — the edge list is re-joined EVERY round, and ``edges``
    # usually carries an expensive upstream plan (minhash-LSH candidate
    # generation); without the cache each round re-runs that whole
    # pipeline (measured 11.7 s → ~2 s for the sf0.1 dedup_clusters
    # gate query: rounds × candidate-generation cost)
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    n_sym = sym.count()  # materializes the cache; also sizes the shuffles

    spark = edges.sparkSession
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    width = max(1, min(int(prev_width), -(-n_sym // ROWS_PER_PARTITION)))
    try:
        # scope the reduced width to the propagation loop (session conf —
        # restored in finally; the loop is a driver-side build step, not
        # shared with concurrent query builds)
        spark.conf.set("spark.sql.shuffle.partitions", str(width))

        labels = cut_lineage(
            sym.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
        )
        prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels.select(F.col("id").alias("b"), "label"), "b")
                .groupBy("a")
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = cut_lineage(
                labels.join(nbr_min.withColumnRenamed("a", "id"), "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", F.col("label"))
                    ).alias("label"),
                )
            )
            new_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:  # labels only decrease: equal sum = fixpoint
                return labels.select(F.col("id"), F.col("label").alias("component"))
            prev_sum = new_sum
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            "(graph diameter exceeds max_iter)"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
        # per-round labels are localCheckpoint-materialized, so nothing
        # downstream references sym — safe to release
        sym.unpersist()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (id, rank).

    The influence/importance twin of connected_components: dedup wants
    "which docs are the same", lineage/abuse analysis wants "which nodes
    matter" (the reference's pot/donor graph is exactly this shape).
    Simplified standard variant: rank = (1-d)/N + d·Σ_in rank/out_deg,
    dangling mass not redistributed.

    Determinism/parity: per-target contribution sums accumulate as
    DECIMAL(38,18) (double sums are partitioning-order-dependent); all
    other arithmetic is IEEE double on identical operands, so ranks are
    engine-exact and the whole computation is oracle-checkable as
    unrolled SQL rounds.

    Scale shape per round: edges ⋈ ranks on src (uniform key), groupBy
    dst with map-side partial decimal sums, left join back to the node
    set — the same two-shuffle round as label propagation. The three
    loop-invariant frames (edge list, node set, out-degrees) are
    persisted once — the edge list usually carries an expensive upstream
    plan (here: the fact-fact purchase join) that would otherwise re-run
    EVERY round — and each round's ranks are localCheckpoint-materialized
    so plan lineage stays one-round deep instead of growing by two joins
    per iteration (analysis cost alone goes superlinear past ~5 unrolled
    rounds). The returned frame is the final checkpoint: independent of
    the persisted inputs, which are released before returning."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    n_edges = e.count()  # materializes the cache; also sizes the shuffles
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("__N"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg")).persist()
    base = F.lit(1.0 - damping)
    spark = edges.sparkSession
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    # same rows-per-partition rule as connected_components: the rank/graph
    # frames are edge-count-scale, usually far smaller than the corpus
    # whose session width we inherit — and the rule sizes UP identically
    # (billions of edges → thousands of reduce tasks)
    width = max(1, min(int(prev_width), -(-n_edges // ROWS_PER_PARTITION)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        ranks = nodes.crossJoin(F.broadcast(nn)).select(
            "id", (F.lit(1.0) / F.col("__N")).alias("rank")
        )
        for _ in range(iterations):
            contrib = (
                e.join(ranks.withColumnRenamed("id", "src"), "src")
                .join(deg, "src")
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("__deg")).cast("decimal(38,18)").alias("__c"),
                )
                .groupBy("id")
                .agg(F.sum("__c").cast("double").alias("__contrib"))
            )
            # eager: materializes this round and cuts lineage (cluster
            # with a checkpoint dir → df.checkpoint for fault tolerance)
            ranks = cut_lineage(
                nodes.crossJoin(F.broadcast(nn))
                .join(contrib, "id", "left")
                .select(
                    "id",
                    (
                        base / F.col("__N")
                        + F.lit(damping) * F.coalesce("__contrib", F.lit(0.0))
                    ).alias("rank"),
                )
            )
        return ranks
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
        e.unpersist()
        nodes.unpersist()
        deg.unpersist()


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    dp: int = 6,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) over a
    directed edge list → (kind, node_id, score) with kind ∈
    {'hub','authority'} — PageRank's bipartite twin: where pagerank
    ranks nodes by global stationary mass, HITS splits the signal into
    "good pointers" (hubs) and "good targets" (authorities), which is
    the natural readout on bipartite supplier→part / user→item graphs
    (a node can only be one of the two).

    Hub-seed asymmetry: hubs are seeded only over nodes WITH out-edges
    and authorities derive from them, so on a general digraph a node
    with only in-edges earns an authority score but never a hub score
    (and vice versa for out-only nodes on the authority side). That is
    exactly right for bipartite graphs; callers ranking a general
    digraph should not expect every node in both listings.

    Determinism/parity: scores are pinned to ``dp`` dp after every
    L1 normalization, so each round's inputs are exact DECIMAL(18,6)
    values; per-node sums fold as DECIMAL(38,6) (order-independent),
    and only the normalizing quotient touches IEEE double (identical
    operands both engines). Oracle-checkable as unrolled SQL rounds.

    Scale shape per round: two edge⋈score shuffle joins + two grouped
    decimal folds (uniform node keys), each normalizer a broadcast
    1-row aggregate; loop-invariant edge list persisted once, each
    round's scores cut_lineage-materialized (same iterative-lineage
    rule as pagerank/connected_components)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    pow10 = float(10**dp)

    def _pin(c) -> F.Column:
        return F.floor(c * F.lit(pow10) + F.lit(0.5)) / F.lit(pow10)

    d18 = "decimal(18,6)"
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    n_edges = e.count()
    spark = edges.sparkSession
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    width = max(1, min(int(prev_width), -(-n_edges // ROWS_PER_PARTITION)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        hubs = e.select("src").distinct().select(
            "src", F.lit(1.0).alias("h")
        )
        auth = None
        # Per half-round, the edge⋈score join + grouped fold is the
        # corpus-sized work, and it used to run TWICE: once under the
        # normalizer-sum job and again inside the normalized frame's
        # cut_lineage materialization. Materialize the RAW fold instead
        # (node-sized frame, still one checkpoint per half-round); the
        # normalizer sum and the pinned quotient then both read the
        # materialized fold — 2 edge joins per round, not 4. The
        # normalized frame stays lazy: it is a broadcast-crossJoin
        # projection over checkpointed data, so lineage is still cut
        # one half-round deep and its recompute (next-round join +
        # final output) is a node-sized scan.
        for _ in range(iterations):
            araw = cut_lineage(
                e.join(hubs, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("h").cast(d18)).alias("__a"))
            )
            asum = araw.agg(F.sum("__a").alias("__s"))
            auth = araw.crossJoin(F.broadcast(asum)).select(
                "dst",
                _pin(
                    F.col("__a").cast("double") / F.col("__s").cast("double")
                ).alias("a"),
            )
            hraw = cut_lineage(
                e.join(auth, "dst")
                .groupBy("src")
                .agg(F.sum(F.col("a").cast(d18)).alias("__h"))
            )
            hsum = hraw.agg(F.sum("__h").alias("__s"))
            hubs = hraw.crossJoin(F.broadcast(hsum)).select(
                "src",
                _pin(
                    F.col("__h").cast("double") / F.col("__s").cast("double")
                ).alias("h"),
            )
        return hubs.select(
            F.lit("hub").alias("kind"),
            F.col("src").alias("node_id"),
            F.col("h").alias("score"),
        ).unionAll(
            auth.select(
                F.lit("authority").alias("kind"),
                F.col("dst").alias("node_id"),
                F.col("a").alias("score"),
            )
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
        e.unpersist()


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected graph given as an edge list (direction and duplicates
    ignored; self-loops dropped).

    In a dedup pipeline this grades CLUSTER QUALITY: a candidate-pair
    graph whose components are triangle-dense is a set of true duplicate
    cliques, while triangle-free chains are transitive borderline links —
    exactly the cases a canonical-pick should treat differently.

    Scale shape — degree orientation (Suri & Vassilvitskii, WWW'11,
    "curse of the last reducer"): orient every edge toward the higher
    (degree, id) endpoint, then a triangle {r1<r2<r3} materializes from
    exactly ONE wedge (r1→r2, r1→r3) closed by the oriented edge r2→r3 —
    no double counting, and wedge fan-out per node is bounded by its
    OUT-degree, which orientation caps at O(√m) even for celebrity nodes.
    Joins are equi-joins on node ids (uniform after orientation); the
    per-node attribution is one explode + count."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    # localCheckpoint (eager), not persist: the result frame is returned
    # lazily so an unpersist hook has nowhere to live, and the edge list
    # is referenced by FIVE plan branches (two degree unions, the
    # orientation join, both wedge sides, the closing edge) — without
    # materialization each branch re-runs the whole upstream pair
    # generation (measured 2.3 s -> 1.7 s on the sf0.1 minhash pair
    # graph — the remaining cost IS the one pair-generation pass).
    # Edge lists are pair-bounded, small next to the corpus.
    und = cut_lineage(
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("__db"))
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    o = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
        )
    )
    e1 = o.select(F.col("s"), F.col("t").alias("t1"))
    e2 = o.select(F.col("s"), F.col("t").alias("t2"))
    wedges = e1.join(e2, "s").filter(F.col("t1") != F.col("t2"))
    closing = o.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    tri = wedges.join(closing, ["t1", "t2"])
    per_node = (
        tri.select(F.explode(F.array("s", "t1", "t2")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        deg.join(per_node, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    (F.coalesce("triangles", F.lit(0)) * 2).cast("double")
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coef"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree >= k — computed by the classic peel loop
    (drop all sub-k nodes, recompute degrees, repeat to fixpoint).

    Dedup reading: the 2-core of a candidate-pair graph is the set of
    docs inside NON-TRIVIAL duplicate structure (chains' endpoints and
    isolated pairs peel away; cliques and cycles survive) — a sharper
    keep/inspect signal than raw degree, complementary to
    triangle_counts' clique score.

    Scale shape per round: one degree aggregate over the surviving edge
    list + two semi-joins to drop edges touching peeled nodes — all
    keyed on node ids; the survivor set is localCheckpoint-materialized
    per round (iterative-lineage rule, same as connected_components) and
    convergence is ONE scalar count per round. Rounds needed = peel
    depth (bounded by graph degeneracy ordering length; small for the
    near-clique graphs dedup produces).

    Returns (id, core_degree) for the members, where core_degree is the
    node's degree WITHIN the k-core."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = (
        fwd.select("a", "b")
        .union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    n_sym = und.count()
    spark = edges.sparkSession
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    # edge-count-sized shuffle width, exactly as connected_components: the
    # peel loop's per-round joins on a small pair graph at corpus width
    # schedule mostly-empty tasks (measured 3.3 s -> 2.2 s at sf0.1 where
    # the 1652-edge graph peels in 3 rounds — the remaining cost is pair
    # generation + localCheckpoint floors); the same rule sizes UP for
    # billions of pairs
    width = max(1, min(int(prev_width), -(-n_sym // ROWS_PER_PARTITION)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        live = cut_lineage(und)  # directed both ways; one row per (a,b)
        # each round's survivor count IS the next round's "before" count —
        # one distinct-count before the loop, then one scalar per round
        n_alive = live.select("a").distinct().count()
        for _ in range(max_iter):
            deg = live.groupBy("a").agg(F.count(F.lit(1)).alias("__d"))
            keep = deg.filter(F.col("__d") >= k).select("a")
            n_before = n_alive
            n_keep = keep.count()
            n_alive = n_keep
            if n_keep == n_before:
                return (
                    live.groupBy("a")
                    .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
                    .select(F.col("a").alias("id"), "core_degree")
                )
            if n_keep == 0:
                return spark.createDataFrame([], "id long, core_degree long")
            live = cut_lineage(
                live.join(keep, "a", "left_semi")
                .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            )
        raise RuntimeError(
            f"k_core: no fixpoint after {max_iter} rounds (peel depth "
            "exceeds max_iter)"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
        und.unpersist()


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
) -> DataFrame:
    """SYNCHRONOUS label propagation (Raghavan et al. 2007) — community
    detection over an undirected edge list, the denser-than-components
    grouping (CC merges anything connected; LPA groups around local
    majority structure). Deterministic by construction: every node
    starts labeled with its own id, and each round EVERY node
    simultaneously adopts the most frequent label among its NEIGHBORS
    (count DESC, then label ASC on ties; a node with no neighbors keeps
    its label). Classic async LPA is order-dependent — the synchronous
    fixed-round form trades faster convergence for replayability, which
    is exactly what lets a SQL oracle replay each round.

    ``rounds`` is fixed (synchronous LPA can oscillate on bipartite
    structure rather than converge, so production runs pick a small
    fixed count anyway). Per round: one edge⋈labels shuffle join + one
    (node,label) count + one top-1 window — all keyed on node ids,
    shuffle width sized from the edge count like connected_components;
    per-round cut_lineage keeps the plan linear in rounds.

    Returns (id, label) for every node appearing in ``edges``."""
    from pyspark.sql.window import Window

    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    n_sym = sym.count()

    spark = edges.sparkSession
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    width = max(1, min(int(prev_width), -(-n_sym // ROWS_PER_PARTITION)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        labels = cut_lineage(
            sym.select(F.col("a").alias("id")).distinct().withColumn(
                "label", F.col("id")
            )
        )
        w = Window.partitionBy("a").orderBy(F.desc("n"), F.asc("label"))
        for _ in range(rounds):
            counts = (
                sym.join(labels.select(F.col("id").alias("b"), "label"), "b")
                .groupBy("a", "label")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            top = (
                counts.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(F.col("a").alias("id"), F.col("label").alias("new_label"))
            )
            labels = cut_lineage(
                labels.join(top, "id", "left").select(
                    "id", F.coalesce("new_label", "label").alias("label")
                )
            )
        return labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
        sym.unpersist()


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "id",
    rounds: int = 3,
) -> DataFrame:
    """Bounded-hop BFS from a seed set over an undirected edge list:
    (id, level) with the MINIMUM hop distance for every node reachable
    in ≤ ``rounds`` hops (seeds are level 0). The neighborhood-expansion
    primitive under "find everything within k links of these accounts"
    — the graph twin of the reference's one-hop activity fanout
    (activities/models.py:20-75 reads a flat neighbor list; this walks
    the closure to a fixed depth).

    Scale design: per round ONE frontier⋈edges shuffle join (shuffle
    width sized from the edge count like connected_components), one
    distinct, one LEFT ANTI against the visited set — each is keyed on
    node ids, cost ∝ frontier edge boundary, never the whole graph.
    Synchronous rounds + min-level semantics make every round exactly
    replayable as SQL (the oracle unrolls them as CTEs). Per-round
    cut_lineage keeps the plan linear in rounds; the loop exits early
    once a frontier comes back empty (the count is the same scalar
    action that materializes the round)."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    n_sym = sym.count()

    spark = edges.sparkSession
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    width = max(1, min(int(prev_width), -(-n_sym // ROWS_PER_PARTITION)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        levels = cut_lineage(
            seeds.select(F.col(seed_col).alias("id"))
            .distinct()
            .withColumn("level", F.lit(0).cast("long"))
        )
        frontier = levels.select("id")
        for r in range(1, rounds + 1):
            nxt = cut_lineage(
                sym.join(frontier.select(F.col("id").alias("a")), "a")
                .select(F.col("b").alias("id"))
                .distinct()
                .join(levels.select("id"), "id", "left_anti")
                .withColumn("level", F.lit(r).cast("long"))
            )
            if nxt.count() == 0:
                break
            levels = cut_lineage(levels.union(nxt))
            frontier = nxt.select("id")
        return levels
    finally:
        sym.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)


def neighborhood_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
    min_common: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """Jaccard similarity of node NEIGHBORHOODS for every node pair
    sharing at least ``min_common`` neighbors:

        J(a, b) = |N(a) ∩ N(b)| / (deg(a) + deg(b) − |N(a) ∩ N(b)|)

    — the classic link-prediction / entity-consolidation score ("these
    two accounts interact with the same set of counterparties"), applied
    here to the same candidate-pair graphs the dedup family builds.
    Direction, duplicate edges and self-loops are ignored.

    Scale shape: the pair list comes from a wedge join through the
    SHARED neighbor (two equi-joins on node id), never nodes × nodes —
    cost is Σ_c deg(c)², the wedge count. That sum is dominated by hub
    nodes, so ``max_degree`` (the standard frequency cap: a neighbor
    shared by everyone certifies nothing) drops rows of hubs ABOVE the
    cap from the wedge fanout while keeping their edges in the degree
    denominator — bounding per-neighbor fanout at max_degree². Degrees
    ride a key-partitioned join of the |V|-row degree table; J is an
    exact long ratio rounded to ``round_dp``."""
    lo, hi = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    und = cut_lineage(
        edges.select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("__deg"))
    wedge_src = sym.select(F.col("b").alias("c"), F.col("a").alias("n"))
    if max_degree is not None:
        hubs = deg.filter(F.col("__deg") > max_degree).select(F.col("a").alias("c"))
        wedge_src = wedge_src.join(F.broadcast(hubs), "c", "left_anti")
    left = wedge_src.select(F.col("c"), F.col("n").alias("na"))
    right = wedge_src.select(F.col("c"), F.col("n").alias("nb"))
    common = (
        left.join(right, "c")
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    da = deg.select(F.col("a").alias("na"), F.col("__deg").alias("__da"))
    db = deg.select(F.col("a").alias("nb"), F.col("__deg").alias("__db"))
    return (
        common.join(da, "na")
        .join(db, "nb")
        .select(
            F.col("na").alias("id_a"),
            F.col("nb").alias("id_b"),
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("__da") + F.col("__db") - F.col("common")).cast("double"),
                round_dp,
            ).alias("jaccard"),
        )
    )


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_col: str = "id",
    rounds: int = 3,
) -> DataFrame:
    """Bounded-round single-source(-set) shortest paths over an
    undirected WEIGHTED edge list: (id, dist) with the minimum-cost
    path from any seed using ≤ ``rounds`` edges — ``bfs_levels``'s
    weighted twin (hop count becomes Σ edge weights), i.e. ``rounds``
    synchronous Bellman-Ford relaxations. Weights must be non-negative
    integers so every distance is engine-exact.

    Each round is ONE dist⋈edges shuffle join plus a min-groupBy over
    (old dists ∪ relaxed candidates) — full relaxation, so round r is
    exactly "min cost over paths of ≤ r edges" and the oracle replays
    it as unrolled CTEs. At real graph scale you'd relax only the
    nodes whose dist improved last round (delta-stepping's frontier
    trick, the same LEFT ANTI ``bfs_levels`` uses); the full-relax
    form is kept here because it IS the replayable spec, and the
    per-round cost is still edge-count-sized, never nodes². Per-round
    cut_lineage keeps the plan linear in rounds."""
    fwd = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"), F.col(weight).alias("w")
    )
    sym = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    ).persist()
    n_sym = sym.count()

    spark = edges.sparkSession
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    width = max(1, min(int(prev_width), -(-n_sym // ROWS_PER_PARTITION)))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        dist = cut_lineage(
            seeds.select(F.col(seed_col).alias("id"))
            .distinct()
            .withColumn("dist", F.lit(0).cast("long"))
        )
        for _ in range(rounds):
            cand = sym.join(
                dist.select(F.col("id").alias("a"), "dist"), "a"
            ).select(
                F.col("b").alias("id"),
                (F.col("dist") + F.col("w")).cast("long").alias("dist"),
            )
            dist = cut_lineage(
                dist.union(cand).groupBy("id").agg(F.min("dist").alias("dist"))
            )
        return dist
    finally:
        sym.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
