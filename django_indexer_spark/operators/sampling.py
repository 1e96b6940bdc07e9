"""Deterministic sampling, splits, length bucketing, decontamination —
training-data pipeline operators (north-star extension, same family as
operators/dedup.py and operators/text.py).

Everything here is hash-deterministic, NOT rand()-based: a training
pipeline needs samples and splits that are (a) reproducible across runs
and engines, (b) stable under re-partitioning, and (c) consistent per
document — a doc must land in the same split every run or eval leaks
into train. ``rand(seed)`` gives none of that (it is engine- and
partitioning-dependent, see o5_seeded_sample's rows-only oracle);
key-hash bucketing gives all three AND an exact DuckDB oracle.

Hash: md5 of the salted id, first 24 bits as an integer. md5 avalanche
matters here — a polynomial rolling hash is LINEAR in the trailing
character, so sequential numeric ids land in runs of adjacent buckets
(measured: a 10% band caught 16% of 0..299 and a 10%-wide middle band
caught 0) — fine for fingerprint equality (dedup), disqualifying for
sampling. The hex→int fold is plain base-16 arithmetic, exact in DuckDB
too. Salting decorrelates independent samples; the modulus-10000 bucket
gives 0.01% granularity.

Scale notes: every operator is a narrow map or a fingerprint equi-join —
no shuffle for sampling/splits, one shuffle on the n-gram fingerprint
for decontamination (the same bounded join shape as the LSH candidate
generators; never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokenize, word_ngrams_from_tokens

BUCKETS = 10_000  # 0.01% sampling granularity


def hash_bucket(id_col: Column | str, salt: str) -> Column:
    """Stable per-key bucket in [0, BUCKETS): first 24 md5 bits of
    '<salt>:<id>' mod BUCKETS. Same arithmetic renders in DuckDB
    (oracles._HEX24), so sampled sets are oracle-checkable row-for-row."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % BUCKETS


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep keys whose bucket falls
    below fraction*BUCKETS. Unlike df.sample(), membership is a pure
    function of the key — re-runs, retries, and engine swaps all see the
    SAME sample, and two tables sampled with the same salt stay aligned
    on their join keys (sample-then-join works)."""
    return df.filter(hash_bucket(id_col, salt) < int(round(fraction * BUCKETS)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing op
    (down-sample dominant languages/sources, keep rare ones whole), the
    key-hash twin of df.sampleBy(). Strata missing from ``fractions`` get
    ``default_fraction``. Same key+salt ⇒ same bucket across strata, so
    rebalancing a source never changes WHICH of its docs survive, only
    how many."""
    b = hash_bucket(id_col, salt)
    s = F.col(stratum_col)
    thresh = F.lit(int(round(default_fraction * BUCKETS)))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(s == stratum, F.lit(int(round(frac * BUCKETS)))).otherwise(thresh)
    return df.filter(b < thresh)


def per_group_cap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n: int,
    salt: str = "cap",
) -> DataFrame:
    """Exactly min(N, |group|) rows per group, hash-deterministic — the
    balanced-subset op (N eval docs per source/language, N examples per
    label). Order within a group is (md5(salt|id), id): a pure key
    function, so the SAME docs survive on any cluster, any partitioning,
    any run — and adding new docs to a group only ever displaces the
    hash-largest survivors (stable under append, like hash_sample).

    For per-DOMAIN crawl caps, key ``group_col`` on the PSL-backed
    registrable domain (``functions.urls.url_features(df, psl=...)`` /
    ``functions.psl.registered_domain_psl``), not the label heuristic:
    the heuristic collapses every *.github.io / *.blogspot.com tenant
    to one group, turning a per-domain cap into a silent mass-drop of
    the largest tenant hosts (round-11 verdict #1).

    Scale: one shuffle on the group key; the rank compiles to
    WindowGroupLimit, so each map task pre-prunes to its local top-N
    before the exchange — the shuffle carries at most tasks×N rows per
    group, not the group."""
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    val_fraction: float = 0.0,
    salt: str = "split",
) -> DataFrame:
    """Adds a 'split' column ∈ {train, val, test} by key hash — the
    leak-proof split: a document's split never changes across runs, and
    dedup upstream guarantees near-dups can't straddle splits by id
    (pair with dedup.* for content-level leak protection)."""
    b = hash_bucket(id_col, salt)
    test_hi = int(round(test_fraction * BUCKETS))
    val_hi = test_hi + int(round(val_fraction * BUCKETS))
    return df.withColumn(
        "split",
        F.when(b < test_hi, F.lit("test"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("train")),
    )


# sequence-packing length bands: (label, inclusive upper token bound)
DEFAULT_LENGTH_BOUNDS: list[tuple[str, int]] = [
    ("tiny", 16),
    ("short", 64),
    ("medium", 256),
    ("long", 1024),
]


def length_bucket(text_col: Column | str, bounds=None) -> Column:
    """Token-length band for sequence packing / batch shaping: documents
    batched within a band waste at most band_width - 1 pad tokens each.
    CASE chain over the token count — pure codegen."""
    bounds = DEFAULT_LENGTH_BOUNDS if bounds is None else bounds
    n = F.size(tokenize(text_col))
    expr = F.lit("xlong")
    for label, hi in reversed(bounds):
        expr = F.when(n <= hi, F.lit(label)).otherwise(expr)
    return expr


def length_bucket_stats(df: DataFrame, text_col: str, bounds=None) -> DataFrame:
    """Per-band doc count + token totals — the packing planner's input
    (how many batches of each sequence length a corpus yields)."""
    n = F.size(tokenize(text_col))
    return (
        df.select(length_bucket(text_col, bounds).alias("length_bucket"), n.alias("n_tok"))
        .groupBy("length_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.max("n_tok").alias("max_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tok_col: str,
    max_seq_len: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining batch
    layout): documents are laid end to end in ``id_col`` order and the
    token stream is cut every ``max_seq_len`` tokens; a document's
    ``pack_id`` is the chunk its FIRST token lands in. Deterministic and
    engine-exact: the running offset is an integer window sum and the
    chunk index is integer division — no doubles anywhere.

    Scale: a single global cumulative sum is a one-reducer sort, so the
    packing unit is ``partition_col`` (shard / split / language — whatever
    the loader treats as independent streams): each partition packs
    independently and in parallel, which is exactly how a 1000-worker data
    loader consumes packed shards. Pass None only for small corpora.
    A document longer than max_seq_len simply spans several chunks —
    packing never truncates; truncation policy belongs to the loader."""
    w = (
        Window.partitionBy(partition_col) if partition_col is not None else Window.partitionBy()
    ).orderBy(F.col(id_col)).rowsBetween(Window.unboundedPreceding, -1)
    prev = F.coalesce(F.sum(F.col(n_tok_col)).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("__prev_tok", prev)
        .withColumn("pack_id", F.expr(f"__prev_tok div {int(max_seq_len)}"))
        .drop("__prev_tok")
    )


def temperature_mix_weights(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.3,
    round_digits: int = 9,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-corpus standard,
    mT5/XLM-R style): a stratum with natural share p gets adjusted share
    q ∝ p^alpha, flattening the distribution toward uniform as alpha→0.
    Returns one row per stratum: n_docs, p_share (natural), q_share
    (temperature-adjusted), mix_weight = q/p — the up/down-sampling
    multiplier a loader (or stratified_hash_sample, fractions scaled by
    mix_weight) applies to hit the target mix.

    Cross-engine exactness: p is a double ratio of exact longs; p^alpha
    is the one libm call (probed identical Spark/DuckDB for these
    operands); the normalizer Z sums p^alpha as DECIMAL(38,18) so the
    sum is order-independent, then q = double(pa)/double(Z) is one
    IEEE-exact division. Outputs rounded to ``round_digits``.

    Scale: two 1-row aggregates broadcast-crossed onto a ≤|strata|-row
    frame — the whole operator is O(strata) after one count shuffle."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("__N"))
    p = F.col("n_docs") / F.col("__N")
    with_pa = counts.crossJoin(F.broadcast(total)).withColumn(
        "__pa", F.pow(p, F.lit(alpha)).cast("decimal(38,18)")
    )
    z = with_pa.agg(F.sum("__pa").alias("__Z"))
    q = F.col("__pa").cast("double") / F.col("__Z").cast("double")
    return (
        with_pa.crossJoin(F.broadcast(z))
        .select(
            F.col(stratum_col).alias("stratum"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(p, round_digits).alias("p_share"),
            F.round(q, round_digits).alias("q_share"),
            F.round(q / p, round_digits).alias("mix_weight"),
        )
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int = 1,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic corpus shuffle: global order = md5('<salt>:<id>') —
    a seeded permutation that is a pure key function (reproducible across
    runs/engines/partitionings, unlike orderBy(rand(seed))). Changing the
    salt is re-shuffling with a new seed.

    Emits ``shuffle_shard`` (which of ``n_shards`` output shards the doc
    belongs to — an independently-consumable stream for a data loader)
    and ``shuffle_pos`` (the doc's position WITHIN its shard). Sharding
    first is what makes this scale: each shard's row_number window sorts
    only its own slice, so the permutation materializes with n_shards-way
    parallelism instead of one global sort reducer; at 100 TB you pick
    n_shards ≈ loader worker count. md5 avalanche guarantees shards are
    uniform and the within-shard order is independent of the id order."""
    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    shard = (hash_bucket(id_col, f"{salt}-shard") % n_shards).cast("long")
    w = Window.partitionBy("shuffle_shard").orderBy("shuffle_key", id_col)
    return (
        df.withColumn("shuffle_key", key)
        .withColumn("shuffle_shard", shard)
        .withColumn("shuffle_pos", F.row_number().over(w).cast("long"))
    )


def contaminated_ids(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Test-set decontamination, the n-gram-overlap standard: corpus docs
    sharing ANY word n-gram with the eval set are contaminated (their
    presence in training data would leak eval answers).

    Shape for 100 TB: explode the (small) eval side into distinct n-gram
    fingerprints, explode the corpus likewise, and semi-join on the
    fingerprint — one shuffle keyed on the gram hash, never a doc×doc
    comparison. Tokens materialize into a column BEFORE the shingle
    transform (the word_ngrams lambda-reevaluation trap)."""
    def grams(df: DataFrame, keep_id: bool) -> DataFrame:
        toks = df.select(
            *([F.col(id_col)] if keep_id else []), tokenize(text_col).alias("__toks")
        )
        g = toks.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode(word_ngrams_from_tokens(F.col("__toks"), n)).alias("gram"),
        ).filter(F.size(F.split(F.col("gram"), " ")) >= F.lit(n))
        return g.select(*([F.col(id_col)] if keep_id else []), F.md5("gram").alias("g"))

    eval_grams = grams(eval_set, keep_id=False).distinct()
    corpus_grams = grams(corpus, keep_id=True)
    return (
        corpus_grams.join(eval_grams, "g", "left_semi").select(id_col).distinct()
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Corpus minus contaminated docs (J7 anti-join on the flagged ids)."""
    bad = contaminated_ids(corpus, eval_set, text_col, id_col, n)
    return corpus.join(bad, id_col, "left_anti")


def grouped_prefix_sums(
    df: DataFrame,
    id_col: str,
    token_col: str,
    group_col: str,
    salt: str = "budget",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running token totals in seeded-shuffle order — the
    two-pass ranked_global shape shared by token_budget_sample and
    pps_systematic_sample: repartitionByRange on (group, md5 walk key)
    keeps each partition's slice contiguous; per-(partition, group) sums
    feed a tiny prefix-offset window that broadcasts back; the running
    total is offset + partition-local cumsum. No group ever serializes
    onto one reducer. Returns (group, id, __tok, __cum) with __cum
    INCLUDING the row's own tokens."""
    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(group_col), F.col(id_col), F.col(token_col).cast("long").alias("__tok")
    ).withColumn("__hk", key)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = keyed.repartitionByRange(n, F.col(group_col), F.col("__hk")).withColumn(
        "__pid", F.spark_partition_id()
    )
    sizes = ranged.groupBy("__pid", group_col).agg(F.sum("__tok").alias("__n"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "__pid", group_col, F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = (
        Window.partitionBy("__pid", group_col)
        .orderBy("__hk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ranged.join(F.broadcast(offsets), ["__pid", group_col]).withColumn(
        "__cum", (F.col("__off") + F.sum("__tok").over(w_local)).cast("long")
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    token_col: str,
    group_col: str,
    budget: int | DataFrame,
    salt: str = "budget",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group token-budget selection: walk each group's docs in seeded-
    shuffle order (md5('<salt>:<id>') — a pure key function, so the
    selected set is reproducible across runs/engines) and keep the prefix
    whose cumulative token count stays within ``budget``. This is the
    "sample N training tokens per source" mixing step that follows
    temperature_mix_weights: weights pick the per-source budgets, this
    operator materializes the doc set that spends them.

    Scale shape — the ranked_global two-pass pattern, NOT a per-source
    window (a 100 TB source would serialize onto one reducer):
    repartitionByRange on (group, hash-key) keeps each partition's slice
    contiguous in the walk order; per-(partition, group) token sums feed
    a prefix-sum window over <= num_partitions x |groups| tiny rows whose
    offsets broadcast back; the running total is then offset + a
    partition-local cumsum. A doc whose tokens would cross the budget is
    excluded, and (cumsum being monotone) so is every doc after it.

    ``budget`` is either one int for every group or a (group, budget)
    DataFrame — |groups| rows, broadcast onto the cumsum — which is how
    temperature_mix_weights' q_shares become per-source budgets (see the
    sample_mix_pipeline gate query).

    Returns (group, id, tokens, cum_tokens) for the selected docs.
    """
    cum = grouped_prefix_sums(df, id_col, token_col, group_col, salt, num_partitions)
    if isinstance(budget, DataFrame):
        picked = cum.join(F.broadcast(budget), group_col).filter(
            F.col("__cum") <= F.col("budget")
        )
    else:
        picked = cum.filter(F.col("__cum") <= budget)
    return picked.select(
        group_col,
        id_col,
        F.col("__tok").alias("tokens"),
        F.col("__cum").alias("cum_tokens"),
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    token_col: str,
    group_col: str,
    stride: int,
    salt: str = "budget",
    num_partitions: int | None = None,
) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling: walk
    each group's docs in seeded-shuffle order and select every doc whose
    cumulative-token interval [cum - tokens, cum) crosses a stride
    boundary (stride, 2*stride, ...) — the survey-sampling classic for
    "pick ~1 doc per N tokens, bigger docs proportionally more often".
    P(select) = min(tokens/stride, 1); expected picks = group_tokens /
    stride; a doc larger than the stride is always selected.

    Entirely INTEGER arithmetic on the shared two-pass prefix sums
    (grouped_prefix_sums) — no libm, no rounding: the selected set is
    bit-identical across engines and partitionings, unlike weight^(1/u)
    reservoir schemes whose pow() keys sit one ulp from a rank flip.

    Returns (group, id, tokens, cum_tokens) for the selected docs."""
    cum = grouped_prefix_sums(df, id_col, token_col, group_col, salt, num_partitions)
    # integer DIV on purpose (float division + cast truncates differently
    # near exact multiples): a boundary is crossed iff the two quotients
    # differ
    crosses = F.expr(f"(__cum DIV {stride}) > ((__cum - __tok) DIV {stride})")
    return cum.filter(crosses).select(
        group_col,
        id_col,
        F.col("__tok").alias("tokens"),
        F.col("__cum").alias("cum_tokens"),
    )


def stratified_ipw_estimate(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    design: dict[str, int],
    default_num: int,
    salt: str = "ipw",
    dp: int = 6,
) -> DataFrame:
    """Biased stratified sample + inverse-propensity reconstruction —
    the mixture-reweighting mechanic every training-data pipeline
    needs when it downsamples hot strata ("keep 1/4 of clicks, all
    errors") but still must report UNBIASED totals. ``design`` maps
    stratum → keep numerator over the hash-bucket modulus (keep iff
    bucket < num); the inverse weight is the exact rational
    modulus/num, so the estimator n_kept·(B/num) involves no float
    until the final pinned division.

    Output per stratum: true n, kept n, the design fraction, the
    IPW-estimated total (pinned), and the signed error — the gate's
    point is that the MECHANICS are exact and engine-identical; the
    error column is the sampling noise itself, honestly surfaced.
    One scan, one grouped fold; membership is the same md5 bucket
    arithmetic every sampling gate here uses."""
    pow10 = float(10**dp)
    num = F.coalesce(
        *[
            F.when(F.col(stratum_col) == F.lit(k), F.lit(v))
            for k, v in sorted(design.items())
        ],
        F.lit(default_num),
    ) if design else F.lit(default_num)
    b = hash_bucket(id_col, salt)
    kept = (b < num).cast("long")
    g = df.select(
        F.col(stratum_col).alias("stratum"), num.alias("__num"), kept.alias("__k")
    ).groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("__k").cast("long").alias("n_kept"),
        F.min("__num").cast("long").alias("keep_num"),
    )
    est = (
        F.floor(
            (F.col("n_kept") * F.lit(BUCKETS)).cast("double")
            / F.col("keep_num").cast("double")
            * F.lit(pow10)
            + F.lit(0.5)
        )
        / F.lit(pow10)
    )
    return g.select(
        "stratum",
        "n_true",
        "n_kept",
        "keep_num",
        F.lit(BUCKETS).cast("long").alias("keep_den"),
        est.alias("est_total"),
        (est - F.col("n_true").cast("double")).alias("est_error"),
    )


def poisson_cdf24(kmax: int = 7) -> list[int]:
    """Cumulative Poisson(1) thresholds scaled to 24-bit integers:
    T_k = ⌊CDF(k)·2²⁴⌋. A 24-bit md5 uniform u gets weight
    min{k : u < T_k} (else kmax) — the inverse-CDF draw done entirely
    in INTEGER comparisons, so resample weights are bit-identical on
    any engine (no float compare anywhere). Computed once in Python;
    the float CDF only picks the integer literals."""
    import math

    out, cdf, term = [], 0.0, math.exp(-1.0)
    for k in range(kmax):
        cdf += term
        out.append(math.floor(cdf * (1 << 24)))
        term /= k + 1
    return out


def poisson_bootstrap_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value: Column,
    b: int = 32,
    salt: str = "boot",
    dp: int = 6,
) -> DataFrame:
    """Per-group mean with a Poisson-bootstrap confidence band — the
    one-pass distributed bootstrap (Chamandy et al., Google 2012):
    true resampling-with-replacement needs n draws per replicate and
    is unshardable, but for large n the multinomial resample counts
    converge to independent Poisson(1) weights, so EVERY replicate is
    just a weighted aggregate over the SAME single scan. Replicate b's
    weight for a row is the inverse-CDF Poisson(1) draw off a 24-bit
    md5 uniform, compared against integer thresholds (poisson_cdf24)
    rendered as fixed-width lowercase HEX LITERALS — hex of equal
    length orders lexicographically as the integer it encodes, so the
    draw is pure string compares (no conv()), bit-identical anywhere.

    Shape: the ``b`` weights build as ONE array in a codegen projection
    (⌈b/5⌉ md5s per row — each digest yields five 24-bit uniforms),
    posexplode fans each row to its (replicate, weight) pairs, and ONE
    groupBy(group, replicate) folds Σw·x (DECIMAL(38,0) integer units),
    Σw, Σx and n map-side — the shuffle carries ≤ groups·b·tasks
    combined rows, never the fan-out. Replicate means then rank inside
    each group (b rows) and the 2nd / (b−1)th order statistics form
    the ~93.75% band at b = 32. Replicates whose weights all landed 0
    (only possible for near-empty groups) drop out of the order
    statistics rather than read as mean 0.

    Why the fan-out form: the flat-wide alternative (2·b aggregate
    buffers + a stack() melt) is the same arithmetic but its ~3000-node
    expression tree costs ~4 s of DRIVER planning per build — Catalyst
    analysis, not execution, was the bottleneck (execution is ~0.1 s
    either way at sf0.1).

    ``value`` must be an integer-unit column; only the replicate means
    and the point estimate are pinned (``dp``)."""
    pow10 = float(10**dp)

    def _pin(c: Column) -> Column:
        return F.floor(c * F.lit(pow10) + F.lit(0.5)) / F.lit(pow10)

    ts = poisson_cdf24()
    hexts = [format(t, "06x") for t in ts]
    x = value.cast("long")
    cid = F.col(id_col).cast("string")
    hashed = df.select(
        F.col(group_col),
        x.alias("__x"),
        *[
            F.md5(F.concat(F.lit(f"{salt}:g{g_}:"), cid)).alias(f"__h{g_}")
            for g_ in range((b + 4) // 5)
        ],
    )
    # one SQL-parsed expression for the whole weight array: building
    # ~b·|thresholds| Column objects costs one py4j round-trip EACH
    # (~1.3 s of pure driver time at b=32); a single expr() string
    # parses JVM-side
    weight_sql = []
    for i in range(b):
        grp, chunk = divmod(i, 5)
        s = f"substring(__h{grp}, {1 + 6 * chunk}, 6)"
        w = str(len(ts))
        for k in range(len(ts) - 1, -1, -1):
            w = f"CASE WHEN {s} < '{hexts[k]}' THEN {k} ELSE {w} END"
        weight_sql.append(w)
    fan = hashed.select(
        F.col(group_col),
        "__x",
        F.posexplode(F.expr("array(" + ", ".join(weight_sql) + ")")).alias(
            "rep", "__w"
        ),
    )
    per_rep = fan.groupBy(group_col, "rep").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__x").cast("decimal(38,0)")).alias("__sx"),
        F.sum((F.col("__w") * F.col("__x")).cast("decimal(38,0)")).alias(
            "__s"
        ),
        F.sum(F.col("__w").cast("long")).cast("long").alias("__c"),
    )
    melted = per_rep.select(
        F.col(group_col),
        "n",
        _pin(
            F.col("__sx").cast("double") / F.col("n").cast("double")
        ).alias("mean"),
        "rep",
        F.when(
            F.col("__c") > 0,
            _pin(F.col("__s").cast("double") / F.col("__c").cast("double")),
        ).alias("rep_mean"),
    ).filter(F.col("rep_mean").isNotNull())
    w_asc = Window.partitionBy(group_col).orderBy(
        F.col("rep_mean").asc(), F.col("rep").asc()
    )
    ranked = melted.select(
        group_col,
        "n",
        "mean",
        "rep_mean",
        F.row_number().over(w_asc).alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__m"),
    )
    # one conditional fold, NOT a lo⋈hi self-join: two plan branches
    # off the same agg re-run the whole scan+fold twice
    return ranked.groupBy(group_col).agg(
        F.min("n").alias("n"),
        F.min("mean").alias("mean"),
        F.max(F.when(F.col("__r") == 2, F.col("rep_mean"))).alias(
            "boot_lo"
        ),
        F.max(
            F.when(F.col("__r") == F.col("__m") - 1, F.col("rep_mean"))
        ).alias("boot_hi"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "dsir",
    top_k: int | None = None,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, public method): score every RAW document by how much more
    likely its hashed n-gram features are under the TARGET corpus
    distribution than under the raw corpus distribution, then select
    the highest-weight documents. The published recipe, concretized
    deterministically:

    - features = word unigrams + bigrams (the paper's choice), hashed
      into ``n_buckets`` buckets with the module's md5 arithmetic
      (``hash_bucket``'s base-16 fold, so the whole computation has an
      exact DuckDB twin; the paper uses a 10k-bucket hash — any B
      works, collisions are part of the method);
    - bucket distributions with add-``alpha`` smoothing:
      p_f = (t_f + α)/(T + αB) on target, q_f = (r_f + α)/(R + αB) on
      raw;
    - log importance weight of a doc = Σ over its gram OCCURRENCES of
      (ln p_f − ln q_f), each ln pinned to 6 dp and folded as exact
      DECIMAL(28,6) — order-independent, bit-identical cross-engine
      (the token_entropy rule);
    - the paper resamples with Gumbel noise; the deterministic
      production variant selects top-``top_k`` by (log_weight desc,
      id asc) — reproducible across runs and engines. ``top_k=None``
      skips selection (weights only).

    Scale shape: one pass over each corpus for the bucket counts
    (B-row dims), the log-ratio dim broadcast onto the exploded gram
    stream, ONE doc-key shuffle for the per-doc fold, and top-k as
    TakeOrdered + a semi-join flag — never a global single-partition
    window. Raw docs with no tokens score 0.0 via the doc spine."""
    spark = raw.sparkSession
    lit_b = float(alpha) * n_buckets

    def grams(df: DataFrame) -> DataFrame:
        # MATERIALIZE the token array before the bigram lambda: with a
        # raw tokenize() expression, element_at re-evaluates the whole
        # split per element (higher-order fns run interpreted) — the
        # word_ngrams_from_tokens trap, measured 10x+ on this operator
        toked = df.select(
            F.col(id_col).alias("__id"), tokenize(text_col).alias("__tk")
        )
        tk = F.col("__tk")
        bigrams = F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - 2),
                lambda i: F.concat(
                    F.element_at(tk, i + 1),
                    F.lit(" "),
                    F.element_at(tk, i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        g = toked.select(
            "__id", F.explode(F.concat(tk, bigrams)).alias("__gram")
        )
        h = F.md5(F.concat(F.lit(f"{salt}:"), F.col("__gram")))
        return g.select(
            "__id",
            (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % n_buckets).alias(
                "__bucket"
            ),
        )

    def dist(df: DataFrame, cnt_name: str) -> DataFrame:
        return grams(df).groupBy("__bucket").agg(
            F.count(F.lit(1)).cast("long").alias(cnt_name)
        )

    spine = spark.range(n_buckets).select(F.col("id").alias("__bucket"))
    t = dist(target, "__t")
    r = dist(raw, "__r")
    dim = (
        spine.join(t, "__bucket", "left")
        .join(r, "__bucket", "left")
        .select(
            "__bucket",
            F.coalesce("__t", F.lit(0)).alias("__t"),
            F.coalesce("__r", F.lit(0)).alias("__r"),
        )
    )
    w_all = Window.partitionBy()
    # the dim is B rows — the unpartitioned totals window is dim-sized,
    # never corpus-sized. Total columns must NOT be the case-folded
    # twins of the count columns ('__T' vs '__t'): Spark's default
    # case-insensitive resolver makes withColumn REPLACE the count.
    dim = dim.withColumn("__t_tot", F.sum("__t").over(w_all)).withColumn(
        "__r_tot", F.sum("__r").over(w_all)
    )

    def pin6(c: Column) -> Column:
        return (F.floor(c * 1e6 + F.lit(0.5)) / 1e6).cast("decimal(28,6)")

    lp = pin6(F.log((F.col("__t") + alpha) / (F.col("__t_tot") + lit_b)))
    lq = pin6(F.log((F.col("__r") + alpha) / (F.col("__r_tot") + lit_b)))
    lr_dim = dim.select("__bucket", (lp - lq).alias("__lr"))
    scored = (
        grams(raw)
        .join(F.broadcast(lr_dim), "__bucket")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("__lr").cast("double").alias("log_weight"),
        )
    )
    out = (
        raw.select(F.col(id_col).alias("__id"))
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_features", F.lit(0).cast("long")).alias("n_features"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )
    if top_k is None:
        return out
    picked = (
        out.orderBy(F.desc("log_weight"), F.asc(id_col))
        .limit(int(top_k))
        .select(F.col(id_col).alias("__pick"))
    )
    return out.join(
        F.broadcast(picked), F.col(id_col) == F.col("__pick"), "left"
    ).select(
        id_col,
        "n_features",
        "log_weight",
        F.col("__pick").isNotNull().alias("selected"),
    )
