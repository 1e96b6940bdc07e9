"""DuckDB oracle SQL — one ANSI-SQL twin per fixture query.

Each statement reproduces the Spark query's semantics EXACTLY, including
the parity policy (decimal intermediates → double outputs, identical
aliases, identical tie-breaks). Queries that are not SQL-expressible
(seeded sampling) are deliberately absent — the driver then records a
rows-only check.
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["stats_overview"] = """
SELECT d.total_donations_usd, d.total_donations_count, d.unique_donors,
       p.total_payouts_usd, p.unique_recipients
FROM (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_donations_usd,
         COUNT(*) AS total_donations_count,
         COUNT(DISTINCT o_custkey) AS unique_donors
  FROM orders
) d, (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_payouts_usd,
         COUNT(DISTINCT l_suppkey) AS unique_recipients
  FROM lineitem WHERE l_linestatus = 'F'
) p
"""

ORACLES["f1_eq_filter"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderstatus = 'F'
"""

ORACLES["f2_in_list"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
"""

ORACLES["f4_range_pred"] = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""

ORACLES["f6_or_null_repair"] = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE value IS NULL
   OR CAST(json_extract_string(props, '$.k') AS INT) < 10
   OR (event_type = 'error' AND value > 150)
"""

ORACLES["f7_json_regex"] = """
SELECT event_id, json_extract_string(props, '$.k') AS k
FROM events
WHERE regexp_matches(json_extract_string(props, '$.k'), '^9[0-9]$')
"""

ORACLES["f9_suffix_match"] = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%Y' OR regexp_matches(p_name, '^[a-z]+ [a-z]*e$')
"""

ORACLES["f10_prefix_extract"] = """
SELECT p_partkey, substr(p_type, 2) AS type_rest
FROM part WHERE p_type LIKE 'S%'
"""

ORACLES["j1_fk_chain_revenue"] = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""

ORACLES["j4_semi_join"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""

ORACLES["j7_anti_join"] = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""

ORACLES["j6_asof_nearest"] = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id, p.user_id, c.click_id,
         abs(p.ts_us - c.click_us) AS diff_us, c.click_us
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id AND abs(p.ts_us - c.click_us) <= 3600000000
)
SELECT event_id, user_id, click_id, diff_us
FROM j
QUALIFY row_number() OVER (
  PARTITION BY event_id
  ORDER BY diff_us ASC NULLS LAST, click_us ASC NULLS LAST
) = 1
"""

ORACLES["j8_self_double_fk"] = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY cust_nation, supp_nation
"""

ORACLES["a3_distinct_by_group"] = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS unique_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""

ORACLES["a4_grouped_stats"] = """
SELECT c.c_custkey, c.c_name,
       COALESCE(s.total_spent, 0.0) AS total_spent,
       COALESCE(s.n_orders, 0) AS n_orders
FROM customer c
LEFT JOIN (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
) s USING (c_custkey)
"""

ORACLES["a5_conditional_pivot"] = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS returned_revenue,
       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS returned_count,
       CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS kept_revenue,
       COUNT(CASE WHEN l_returnflag <> 'R' THEN 1 END) AS kept_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

ORACLES["a6_guarded_sum"] = """
WITH raw AS (
  SELECT event_type, json_extract_string(props, '$.k') AS s FROM events
), canon AS (
  -- canonical_digits twin: strip leading zeros, '' -> '0' (no lookahead; RE2-safe)
  SELECT event_type, s,
         CASE WHEN regexp_replace(s, '^0+', '') = '' THEN '0'
              ELSE regexp_replace(s, '^0+', '') END AS c
  FROM raw
), g AS (
  SELECT event_type,
         CASE WHEN regexp_matches(s, '^[0-9]+$') AND length(c) <= 38
              THEN CAST(c AS DECIMAL(38,0)) END AS amt
  FROM canon
)
SELECT event_type,
       CAST(SUM(amt) AS BIGINT) AS amount_sum,
       CAST(SUM(CASE WHEN amt IS NOT NULL AND amt <> 0 THEN amt END) AS BIGINT) AS amount_sum_nonzero,
       COUNT(CASE WHEN amt IS NULL THEN 1 END) AS n_unparsable
FROM g GROUP BY event_type
"""

ORACLES["a9_distinct_projection"] = """
SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity >= 45
"""

ORACLES["w1_latest_per_user"] = """
SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
) = 1
"""

ORACLES["w3_rank_leaderboard"] = """
WITH per_nation AS (
  SELECT n_name,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, total_balance,
       rank() OVER (ORDER BY total_balance DESC, n_name ASC) AS rank
FROM per_nation
"""

ORACLES["w_global_rank"] = """
SELECT o_orderkey, o_totalprice,
       rank() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
FROM orders
"""

ORACLES["o3_pagination"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_custkey LIMIT 30 OFFSET 30
"""

ORACLES["o3_keyset_page"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment > 'BUILDING'
   OR (c_mktsegment = 'BUILDING' AND c_custkey > 500)
ORDER BY c_mktsegment, c_custkey
LIMIT 30
"""

ORACLES["o4_top_k"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 25
"""

# o5_seeded_sample — deterministic md5-keyed min pick (seed 42 on
# c_custkey): both engines emit identical lowercase md5 hex and compare
# strings bytewise, so the picked row matches bit for bit. chr(31) is
# the same unit separator Spark's concat_ws uses in seeded_sample_one.
ORACLES["o5_seeded_sample"] = """
SELECT c_custkey, c_name
FROM customer
ORDER BY md5(concat_ws(chr(31), '42', CAST(c_custkey AS VARCHAR))), c_custkey
LIMIT 1
"""

ORACLES["setop_union_dedup"] = """
SELECT DISTINCT o_orderkey, o_custkey, o_totalprice
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 200000
)
"""

ORACLES["j_salted_skew"] = """
SELECT c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

ORACLES["t3_upsert_last_writer"] = """
WITH all_rows AS (
  SELECT o_orderkey, o_custkey, o_totalprice, 1 AS version FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice, 2 AS version
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, o_custkey, o_totalprice, version
FROM all_rows
QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1
"""

ORACLES["activity_feed_by_type"] = """
WITH acts AS (
  SELECT CASE event_type
           WHEN 'purchase' THEN 'Donate_Direct'
           WHEN 'signup'  THEN 'Register_Batch'
           WHEN 'view'    THEN 'Submit_Application'
           WHEN 'error'   THEN 'Challenge_Payout'
           ELSE 'Remove_List_Admin' END AS type,
         CASE WHEN event_type <> 'click' THEN props END AS action_result,
         epoch_us(ts) AS ts_us,
         event_id
  FROM events
), latest AS (
  SELECT * FROM acts
  QUALIFY row_number() OVER (
    PARTITION BY action_result, type ORDER BY ts_us DESC, event_id DESC
  ) = 1
)
SELECT type,
       CAST(count(*) AS BIGINT) AS n_activities,
       max(ts_us) AS last_us
FROM latest
GROUP BY type
"""

ORACLES["c3_ts_convert"] = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       strftime(ts, '%d-%m-%Y') AS date_key,
       CAST(hour(ts) AS BIGINT) AS hour_of_day
FROM events
"""

ORACLES["c_date_arithmetic"] = """
SELECT o_orderkey,
       CAST(datediff('day', o_orderdate, TIMESTAMP '1998-12-01') AS BIGINT) AS age_days,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS order_dow
FROM orders
"""

ORACLES["w_running_total"] = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS running_revenue,
       CAST(count(*) OVER w AS BIGINT) AS running_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

ORACLES["c6_decimal_math"] = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS total_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# North-star extension oracles. Several are generated programmatically so
# the hash seeds / hyperplane literals are BY CONSTRUCTION identical to the
# Spark expressions (both derive from the same Python values).
# --------------------------------------------------------------------------

# shared DuckDB fragments mirroring operators/text.py
_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
_WORDSET = f"list_distinct({_TOKS})"
_FP = "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))"

ORACLES["dedup_exact"] = f"""
SELECT {_FP} AS fp, min(doc_id) AS canonical_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""

# provenance-aware pick — mirrors operators/dedup.py provenance_dedup:
# survivor minimizes (source rank, id) within the fingerprint group
ORACLES["dedup_provenance"] = f"""
WITH t AS (
  SELECT doc_id, CAST(substr(source, 4) AS INT) AS prio, {_FP} AS fp
  FROM documents
), r AS (
  SELECT fp, doc_id, prio,
         row_number() OVER (PARTITION BY fp ORDER BY prio, doc_id) AS rn,
         count(*) OVER (PARTITION BY fp) AS n
  FROM t
)
SELECT fp, doc_id AS canonical_id, prio AS canonical_priority,
       CAST(n AS BIGINT) AS n_copies
FROM r WHERE rn = 1
"""


def _minhash_sql(num_hashes: int = 8, bands: int = 4, source: str = "documents") -> tuple[str, str]:
    """(bands_sql, pairs_sql) mirroring dedup.minhash_bands/candidate_pairs:
    word-3-gram shingles, h_i = min md5('<i>:'||shingle), band_key =
    md5(concat_ws('|', slice of signature))."""
    rows_per_band = num_hashes // bands
    hcols = ",\n         ".join(
        f"list_aggregate(list_transform(s, x -> md5('{i}:' || x)), 'min') AS h{i}"
        for i in range(num_hashes)
    )
    band_rows = ",\n    ".join(
        "({b}, md5(concat_ws('|', {cols})))".format(
            b=b,
            cols=", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    bands_sql = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM {source}
), sh AS (
  SELECT doc_id,
         list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2])
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM toks
), sig AS (
  SELECT doc_id,
         {hcols}
  FROM sh
)
SELECT doc_id, bk.band AS band, bk.band_key AS band_key
FROM sig, (VALUES {band_rows}) ignored(x, y)
CROSS JOIN LATERAL (SELECT x AS band, y AS band_key) bk
"""
    # simpler formulation: unnest a per-row list of (band, band_key) structs
    band_structs = ", ".join(
        "{{'band': {b}, 'band_key': md5(concat_ws('|', {cols}))}}".format(
            b=b,
            cols=", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    bands_sql = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM {source}
), sh AS (
  SELECT doc_id,
         list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2])
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM toks
), sig AS (
  SELECT doc_id,
         {hcols}
  FROM sh
), banded AS (
  SELECT doc_id, unnest([{band_structs}]) AS bk FROM sig
)
SELECT doc_id, bk.band AS band, bk.band_key AS band_key FROM banded
"""
    pairs_sql = f"""
WITH b AS ({bands_sql})
SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
FROM b a JOIN b c ON a.band = c.band AND a.band_key = c.band_key AND a.doc_id < c.doc_id
"""
    return bands_sql, pairs_sql


_BANDS_SQL, _PAIRS_SQL = _minhash_sql(8, 4)
ORACLES["dedup_minhash_bands"] = _BANDS_SQL
ORACLES["dedup_minhash_pairs"] = _PAIRS_SQL
# s_stream_dedup_index — the incremental index's pair log across any
# batch split must equal the one-shot banded candidate pairs (T9
# batch-split equivalence), so the oracle IS the batch pairs SQL.
ORACLES["s_stream_dedup_index"] = _PAIRS_SQL


# dedup_lsh_recall's oracle is registered further down (after _hex24_sql,
# which its deterministic doc-sample predicate needs).

# triangle counts over the minhash pair graph — mirrors
# operators/graph.py triangle_counts: degree-(id) orientation, one wedge
# per triangle closed by the oriented third edge
ORACLES["graph_triangles"] = f"""
WITH und AS (
  SELECT id_a AS a, id_b AS b FROM ({_PAIRS_SQL}) p
), deg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
  GROUP BY id
), o AS (
  SELECT CASE WHEN da.degree < db.degree
                OR (da.degree = db.degree AND u.a < u.b)
              THEN u.a ELSE u.b END AS s,
         CASE WHEN da.degree < db.degree
                OR (da.degree = db.degree AND u.a < u.b)
              THEN u.b ELSE u.a END AS t
  FROM und u JOIN deg da ON da.id = u.a JOIN deg db ON db.id = u.b
), tri AS (
  SELECT e1.s AS x, e1.t AS y, e2.t AS z
  FROM o e1
  JOIN o e2 ON e1.s = e2.s AND e1.t <> e2.t
  JOIN o e3 ON e3.s = e1.t AND e3.t = e2.t
), per_node AS (
  SELECT id, CAST(count(*) AS BIGINT) AS triangles
  FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
  GROUP BY id
)
SELECT d.id AS doc_id, d.degree,
       coalesce(p.triangles, 0) AS triangles,
       CASE WHEN d.degree >= 2
            THEN round((coalesce(p.triangles, 0) * 2)::DOUBLE
                       / (d.degree * (d.degree - 1)), 6)
            ELSE 0.0 END AS clustering_coef
FROM deg d LEFT JOIN per_node p USING (id)
"""


def _kcore_sql(k: int = 2, rounds: int = 8) -> str:
    """Unrolled peel mirroring graph.k_core over the minhash pair graph:
    each round keeps nodes whose degree within the surviving subgraph is
    >= k. ``rounds`` must cover the fixture's peel depth — extra rounds
    are no-ops at the fixpoint, so overshooting is safe."""
    # MATERIALIZED throughout: DuckDB inlines plain CTEs per reference,
    # and each round references the previous edge set twice — without
    # materialization the pairs subquery expands 2^rounds times (observed
    # as file-handle exhaustion re-opening the parquet per inline)
    steps = []
    prev_e = "und"
    for r in range(1, rounds + 1):
        steps.append(
            f"a{r} AS MATERIALIZED (SELECT a FROM {prev_e} GROUP BY a HAVING count(*) >= {k})"
        )
        steps.append(
            f"e{r} AS MATERIALIZED (SELECT u.a, u.b FROM {prev_e} u "
            f"JOIN a{r} x ON u.a = x.a JOIN a{r} y ON u.b = y.a)"
        )
        prev_e = f"e{r}"
    body = ",\n".join(steps)
    return f"""
WITH pairs AS MATERIALIZED (SELECT * FROM ({_PAIRS_SQL}) p),
und AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM pairs
  ) GROUP BY a, b
),
{body}
SELECT a AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
FROM {prev_e} GROUP BY a
"""


ORACLES["graph_kcore"] = _kcore_sql(2, 8)


def _simhash_sql(bits: int = 32) -> str:
    """Mirrors dedup.simhash_table: rolling word hash
    fold((acc*31+ascii)%(2^31-1)), 32 ±1 bit votes, sign → bit."""
    votes = ",\n       ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(bits)
    )
    terms = " + ".join(f"(CASE WHEN v{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(bits))
    return f"""
WITH words AS (
  SELECT doc_id, unnest({_WORDSET}) AS w FROM documents
), hashed AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(range(1, length(w) + 1), i -> ascii(substr(w, i, 1))::BIGINT)),
           (a, b) -> (a * 31 + b) % 2147483647) AS h
  FROM words
), votes AS (
  SELECT doc_id,
       {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM votes
"""


ORACLES["dedup_simhash"] = _simhash_sql(32)

ORACLES["dedup_ngram_jaccard"] = f"""
WITH w AS (
  SELECT doc_id, lang, source, unnest({_WORDSET}) AS word FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM w a JOIN w b
    ON a.word = b.word AND a.lang = b.lang AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
       round(CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE), 6) >= 0.8
"""

_COS = (
    "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))"
)

ORACLES["sim_cosine_topk"] = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id, embedding FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, round({_COS}, 6) AS cosine
  FROM q, c WHERE q.vec_id <> c.vec_id
)
SELECT q_id, c_id, cosine,
       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
FROM scored
QUALIFY rnk <= 5
"""


# sq8 quantized-search recall — mirrors operators/similarity.py
# sq8_bounds/sq8_quantize/sq8_topk/sq8_recall: per-dim min/max codebook,
# q = round((x-lo)/(hi-lo)*255) (degenerate dims -> 0), integer dot
# products (exact in double), round-6 quantized cosine with (desc, id)
# order, recall vs the exact float top-5 in integer basis points.
ORACLES["sim_sq8_recall"] = f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
bounds AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM ex GROUP BY pos),
codes AS (
  SELECT vec_id, pos,
         CASE WHEN hi = lo THEN 0
              ELSE CAST(round((x - lo) / (hi - lo) * 255, 0) AS BIGINT) END AS qv
  FROM ex JOIN bounds USING (pos)
),
norms AS (SELECT vec_id, sqrt(sum((qv * qv)::DOUBLE)) AS nrm FROM codes GROUP BY vec_id),
qdots AS (
  SELECT a.vec_id AS q_id, b.vec_id AS c_id, sum((a.qv * b.qv)::DOUBLE) AS dp
  FROM codes a JOIN codes b USING (pos)
  WHERE a.vec_id < 8 AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
approx AS (
  SELECT q_id, c_id,
         CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN 0.0
              ELSE round(dp / (na.nrm * nb.nrm), 6) END AS qcos
  FROM qdots
  JOIN norms na ON na.vec_id = q_id
  JOIN norms nb ON nb.vec_id = c_id
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, c_id ASC) <= 5
),
exact AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 8
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id ORDER BY round({_COS}, 6) DESC, c.vec_id ASC) <= 5
),
hits AS (
  SELECT e.q_id, count(*) AS n_hit
  FROM exact e JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
  GROUP BY 1
)
SELECT q.q_id,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(h.n_hit * 10000 // 5, 0) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT q_id FROM exact) q LEFT JOIN hits h USING (q_id)
"""


def _rp_recall_sql(n_planes: int = 16, dim: int = 64, k: int = 5) -> str:
    """Mirrors sim_rp_recall: 16 literal JL planes (plane_weights), exact
    vs projected cosine top-k, per-query overlap in basis points."""
    from ..operators.similarity import plane_weights

    ws = plane_weights(n_planes, dim)
    proj_list = "[" + ", ".join(
        f"list_dot_product(embedding::DOUBLE[], [{', '.join(repr(x) for x in ws[p])}]::DOUBLE[])"
        for p in range(n_planes)
    ) + "]"
    pcos = (
        "list_dot_product(q.p, c.p) / "
        "(sqrt(list_dot_product(q.p, q.p)) * sqrt(list_dot_product(c.p, c.p)))"
    )
    return f"""
WITH exact_scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, round({_COS}, 6) AS cosine
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q,
       embeddings c
  WHERE q.vec_id <> c.vec_id
), exact AS (
  SELECT q_id, c_id FROM exact_scored
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) <= {k}
), pe AS (
  SELECT vec_id, {proj_list} AS p FROM embeddings
), rp_scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, round({pcos}, 6) AS cosine
  FROM (SELECT * FROM pe WHERE vec_id < 8) q, pe c
  WHERE q.vec_id <> c.vec_id
), rp AS (
  SELECT q_id, c_id FROM rp_scored
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) <= {k}
), ov AS (
  SELECT exact.q_id, count(*) AS n_overlap
  FROM exact JOIN rp USING (q_id, c_id) GROUP BY 1
)
SELECT qv.vec_id AS q_id,
       CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(n_overlap, 0) * 10000 // {k} AS BIGINT) AS recall_bp
FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) qv
LEFT JOIN ov ON ov.q_id = qv.vec_id
"""


ORACLES["sim_rp_recall"] = _rp_recall_sql(16, 64, 5)


def _ann_lsh_sql(
    n_planes: int = 4, dim: int = 64, k: int = 5, multi_probe: bool = False
) -> str:
    from ..operators.similarity import plane_weights

    ws = plane_weights(n_planes, dim)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{', '.join(repr(w) for w in ws[p])}]::DOUBLE[]) > 0 THEN {2**p} ELSE 0 END)"
        for p in range(n_planes)
    )
    # multi-probe: the query also probes every bucket at Hamming distance 1
    # (flip each plane bit) — a candidate's single bucket matches at most
    # one probe, so IN-list membership is exactly the exploded-probe join
    probes = ", ".join(
        ["q.bucket"] + [f"xor(q.bucket, {2**p})" for p in range(n_planes)]
    )
    on = f"c.bucket IN ({probes})" if multi_probe else "q.bucket = c.bucket"
    return f"""
WITH b AS (
  SELECT vec_id, embedding, CAST({bucket_terms} AS BIGINT) AS bucket FROM embeddings
), q AS (SELECT * FROM b WHERE vec_id < 8),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, round({_COS}, 6) AS cosine
  FROM q JOIN b c ON {on} AND q.vec_id <> c.vec_id
)
SELECT q_id, c_id, cosine,
       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
FROM scored
QUALIFY rnk <= {k}
"""


ORACLES["sim_ann_lsh"] = _ann_lsh_sql(4, 64, 5)
ORACLES["sim_ann_multiprobe"] = _ann_lsh_sql(4, 64, 5, multi_probe=True)


def _prefix_ann_sql(n_planes: int = 4, dim: int = 64, k: int = 5) -> str:
    """s_stream_ann_index twin: per-vector single-probe LSH top-k over
    the vectors whose batch (vec_id-midpoint split, same integer-div
    formula the Spark gate computes) is <= its own — T10's prefix-ANN
    invariant as one self-join with a batch inequality."""
    from ..operators.similarity import plane_weights

    ws = plane_weights(n_planes, dim)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{', '.join(repr(w) for w in ws[p])}]::DOUBLE[]) > 0 THEN {2**p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"""
WITH m AS (
  SELECT (min(vec_id) + max(vec_id)) // 2 AS mid FROM embeddings
), b AS (
  SELECT vec_id, embedding, CAST({bucket_terms} AS BIGINT) AS bucket,
         CASE WHEN vec_id < (SELECT mid FROM m) THEN 1 ELSE 2 END AS batch
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, round({_COS}, 6) AS cosine
  FROM b q JOIN b c
    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id AND c.batch <= q.batch
)
SELECT q_id, c_id, cosine,
       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
FROM scored
QUALIFY rnk <= {k}
"""


ORACLES["s_stream_ann_index"] = _prefix_ann_sql(4, 64, 5)


def _near_dup_sql(threshold: float, n_planes: int = 4, dim: int = 64) -> str:
    from ..operators.similarity import plane_weights

    ws = plane_weights(n_planes, dim)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{', '.join(repr(w) for w in ws[p])}]::DOUBLE[]) > 0 THEN {2**p} ELSE 0 END)"
        for p in range(n_planes)
    )
    pair_cos = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return f"""
WITH bkt AS (
  SELECT vec_id, embedding, CAST({bucket_terms} AS BIGINT) AS bucket FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, round({pair_cos}, 6) AS cosine
FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({pair_cos}, 6) >= {threshold}
"""


ORACLES["dedup_embedding_cosine"] = _near_dup_sql(0.3, 4, 64)

# IVF: centroids = embeddings vec_id<8 (same deterministic 'trained' set
# the Spark side collects and inlines); cosine rounded to 6dp, ties to
# the lowest centroid id — mirrors _cell_sims/array_max exactly.
_IVF_COS = (
    "list_dot_product(e.embedding::DOUBLE[], c.cv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(c.cv, c.cv)))"
)

ORACLES["sim_ivf_assign"] = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8
),
pairs AS (
  SELECT e.vec_id, c.cid, round({_IVF_COS}, 6) AS sim
  FROM embeddings e CROSS JOIN cent c
)
SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id, sim AS centroid_sim
FROM pairs
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1
"""

ORACLES["sim_ivf_search"] = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT e.vec_id AS c_id, e.embedding AS c_vec, c.cid AS centroid_id
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY round({_IVF_COS}, 6) DESC, c.cid ASC) = 1
),
probes AS (
  SELECT e.vec_id AS q_id, e.embedding AS q_vec, c.cid AS centroid_id
  FROM embeddings e CROSS JOIN cent c
  WHERE e.vec_id >= 8 AND e.vec_id < 16
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY round({_IVF_COS}, 6) DESC, c.cid ASC) <= 2
),
scored AS (
  SELECT p.q_id, a.c_id,
         round(list_dot_product(p.q_vec::DOUBLE[], a.c_vec::DOUBLE[]) /
               (sqrt(list_dot_product(p.q_vec::DOUBLE[], p.q_vec::DOUBLE[])) *
                sqrt(list_dot_product(a.c_vec::DOUBLE[], a.c_vec::DOUBLE[]))), 6) AS cosine
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id AND p.q_id <> a.c_id
)
SELECT q_id, c_id, cosine,
       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
FROM scored
QUALIFY rnk <= 5
"""

# SemDeDup — mirrors operators/similarity.py semantic_dedup: assignment is
# the sim_ivf_assign mirror (rounded cosine, ties to lowest cid); a vector
# is kept iff no lower-id same-cell vector has round(cos, 6) >= 0.25.
ORACLES["dedup_semantic"] = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY round({_IVF_COS}, 6) DESC, c.cid ASC) = 1
),
dups AS (
  SELECT DISTINCT b.vec_id AS dup_id
  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.25
)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS centroid_id,
       (d.dup_id IS NULL) AS kept
FROM assigned a LEFT JOIN dups d ON a.vec_id = d.dup_id
"""

# salting is plan-only: the salted variant must produce the identical
# result, so its oracle IS the unsalted SQL (the invariance proof)
ORACLES["dedup_semantic_salted"] = ORACLES["dedup_semantic"]

# k-means (2 Lloyd iterations, k=8, cosine assignment, seeds = vec_id<8) —
# mirrors operators/similarity.py lloyd_means/kmeans_train exactly: sims
# rounded to 6dp with ties to the lowest cid; means via order-independent
# exact decimal(27,9) sums -> one double division rounded to 6dp with the
# PORTABLE floor(q*1e6 + 0.5)/1e6 form (engine-native round() splits on
# ulp-of-half-boundary quotients — see lloyd_means docstring); elements
# widen FLOAT->DOUBLE before the decimal cast because DuckDB's direct
# FLOAT->DECIMAL scales in float precision and mangles the 9th digit on
# most elements (Spark's cast takes the true nearest); an empty
# cluster keeps its previous centroid (LEFT JOIN + coalesce).
ORACLES["sim_kmeans_train"] = f"""
WITH seeds AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8
),
a1 AS (
  SELECT e.vec_id, e.embedding, c.cid
  FROM embeddings e CROSS JOIN seeds c
  QUALIFY row_number() OVER (
    PARTITION BY e.vec_id ORDER BY round({_IVF_COS}, 6) DESC, c.cid ASC) = 1
),
m1 AS (
  SELECT cid, r.range AS pos,
         floor(CAST(SUM(CAST(CAST(embedding[r.range + 1] AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE)
               / COUNT(*) * 1e6 + 0.5) / 1e6 AS c_val
  FROM a1 CROSS JOIN range(64) r
  GROUP BY cid, r.range
),
c2 AS (
  SELECT s.cid, coalesce(m.cv, s.cv) AS cv
  FROM seeds s LEFT JOIN (
    SELECT cid, list(c_val ORDER BY pos) AS cv FROM m1 GROUP BY cid
  ) m USING (cid)
),
a2 AS (
  SELECT e.vec_id, e.embedding, c.cid
  FROM embeddings e CROSS JOIN c2 c
  QUALIFY row_number() OVER (
    PARTITION BY e.vec_id ORDER BY round({_IVF_COS}, 6) DESC, c.cid ASC) = 1
),
m2 AS (
  SELECT cid, r.range AS pos,
         floor(CAST(SUM(CAST(CAST(embedding[r.range + 1] AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE)
               / COUNT(*) * 1e6 + 0.5) / 1e6 AS c_val,
         COUNT(*) AS n_members
  FROM a2 CROSS JOIN range(64) r
  GROUP BY cid, r.range
)
SELECT CAST(cid AS BIGINT) AS centroid_id, CAST(pos AS BIGINT) AS pos,
       c_val, n_members
FROM m2
"""

# text metrics — mirrors operators/text.py quality_score/token_count/fingerprint
_STOP_EN = "['the', 'and', 'of', 'to', 'a', 'in', 'is', 'it']"
_STOP_DE = "['der', 'die', 'das', 'und', 'ist', 'nicht', 'ein']"
_STOP_FR = "['le', 'la', 'les', 'et', 'est', 'une', 'dans']"
_STOP_ES = "['el', 'la', 'los', 'y', 'es', 'una', 'que']"

ORACLES["text_metrics"] = f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id, text, len(toks) AS n_tok,
         length(regexp_replace(lower(text), '[^a-zA-Z0-9]+', '', 'g')) AS n_alnum,
         len(list_filter(toks, t -> list_contains({_STOP_EN}, t))) AS n_stop,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM base
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       round(
         (CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN n_alnum / greatest(n_tok, 1) >= 2.0
               AND n_alnum / greatest(n_tok, 1) <= 12.0 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN CAST(n_stop AS DOUBLE) / CAST(greatest(n_tok, 1) AS DOUBLE) >= 0.01 THEN 0.2 ELSE 0.0 END)
       + (CASE WHEN CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) <= 0.2 THEN 0.1 ELSE 0.0 END)
       , 4) AS quality,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
FROM m
"""

ORACLES["text_lang_id"] = f"""
WITH base AS (
  SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents
), hits AS (
  SELECT doc_id, lang, text,
         len(list_filter(toks, t -> list_contains({_STOP_DE}, t))) AS de,
         len(list_filter(toks, t -> list_contains({_STOP_FR}, t))) AS fr,
         len(list_filter(toks, t -> list_contains({_STOP_ES}, t))) AS es
  FROM base
)
SELECT doc_id, lang,
       CASE
         WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
         WHEN regexp_matches(text, '[äöüßÄÖÜ]') OR (de > fr AND de > es AND de > 0) THEN 'de'
         WHEN fr > es AND fr > 0 THEN 'fr'
         WHEN es > 0 THEN 'es'
         ELSE 'en'
       END AS lang_pred,
       (CASE
         WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
         WHEN regexp_matches(text, '[äöüßÄÖÜ]') OR (de > fr AND de > es AND de > 0) THEN 'de'
         WHEN fr > es AND fr > 0 THEN 'fr'
         WHEN es > 0 THEN 'es'
         ELSE 'en'
       END) = lang AS agree
FROM hits
"""

def _hex24_sql(expr: str) -> str:
    """DuckDB twin of sampling.hash_bucket's md5-prefix integer: base-16
    fold over the first 6 hex chars (DuckDB 1.0 has no hex→int cast;
    the fold is exact integer arithmetic, identical to Spark's conv)."""
    h = f"substr(md5({expr}), 1, 6)"
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, 7), "
        f"i -> (strpos('0123456789abcdef', substr({h}, i, 1)) - 1)::BIGINT)), "
        f"(a, b) -> a * 16 + b)"
    )


# KMV distinct sketch — mirrors operators/sketches.py kmv_distinct_estimate:
# 13-hex-digit fold (52 bits, double-exact) of md5('kmv:'||value) -> the
# 256 smallest distinct fractions -> (k-1)/f_k
_KMV_FOLD = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 14), "
    "i -> (strpos('0123456789abcdef', "
    "substr(md5('kmv:' || CAST(o_custkey AS VARCHAR)), i, 1)) - 1)::BIGINT)), "
    "(a, b) -> a * 16 + b)"
)

ORACLES["a_kmv_distinct"] = f"""
WITH hashed AS (
  SELECT DISTINCT {_KMV_FOLD}::DOUBLE / 4503599627370496.0 AS f FROM orders
), mins AS (
  SELECT f FROM hashed ORDER BY f LIMIT 256
), sk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept,
         round(CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
                    ELSE 255.0 / max(f) END, 4) AS est_distinct
  FROM mins
)
SELECT (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS n_exact,
       n_kept, est_distinct
FROM sk
"""

_SAMPLE_B = _hex24_sql("'sample:' || CAST(doc_id AS VARCHAR)") + " % 10000"
_SPLIT_B = _hex24_sql("'split:' || CAST(doc_id AS VARCHAR)") + " % 10000"

# dedup_lsh_recall: deterministic 50% doc sample (salt 'lshr') on BOTH the
# truth and LSH-candidate sides, df<=64 cap on truth-join shingles —
# mirrors fixture_queries.dedup_lsh_recall exactly (see its docstring for
# the estimator argument).
_LSHR_B = _hex24_sql("'lshr:' || CAST(doc_id AS VARCHAR)") + " % 10000"
_LSHR_DOCS = f"(SELECT * FROM documents WHERE {_LSHR_B} < 5000)"
_PAIRS_LSHR_SQL = _minhash_sql(8, 4, source=_LSHR_DOCS)[1]

ORACLES["dedup_lsh_recall"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM {_LSHR_DOCS}
), sh AS (
  SELECT doc_id,
         list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2])
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM toks
), sx0 AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), keep AS (
  SELECT g FROM sx0 GROUP BY g HAVING count(*) <= 64
), sx AS (
  SELECT sx0.doc_id, sx0.g FROM sx0 JOIN keep USING (g)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sx GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sx a JOIN sx b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
), cand AS ({_PAIRS_LSHR_SQL}
), agg AS (
  SELECT (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM cand) AS n_cand,
         (SELECT count(*) FROM truth t
          JOIN cand c ON t.doc_a = c.id_a AND t.doc_b = c.id_b) AS n_hit
)
SELECT CAST(n_true AS BIGINT) AS n_true,
       CAST(n_cand AS BIGINT) AS n_cand,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST(CASE WHEN n_true = 0 THEN 0 ELSE n_hit * 10000 // n_true END AS BIGINT)
         AS recall_bp,
       CAST(CASE WHEN n_cand = 0 THEN 0 ELSE n_hit * 10000 // n_cand END AS BIGINT)
         AS precision_bp
FROM agg
"""

ORACLES["sample_hash_10pct"] = f"""
SELECT doc_id, lang, source FROM documents WHERE {_SAMPLE_B} < 1000
"""

ORACLES["sample_split_assign"] = f"""
SELECT doc_id,
       CASE WHEN {_SPLIT_B} < 2000 THEN 'test'
            WHEN {_SPLIT_B} < 3000 THEN 'val'
            ELSE 'train' END AS split
FROM documents
"""

ORACLES["sample_stratified"] = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_SAMPLE_B} < (CASE lang WHEN 'en' THEN 2000 WHEN 'zh' THEN 10000 ELSE 5000 END)
"""

ORACLES["sample_per_group_cap"] = """
SELECT doc_id, source, lang FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY md5('cap' || '|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
) <= 10
"""

ORACLES["text_length_buckets"] = f"""
WITH t AS (SELECT len({_TOKS}) AS n_tok FROM documents)
SELECT CASE WHEN n_tok <= 16 THEN 'tiny'
            WHEN n_tok <= 64 THEN 'short'
            WHEN n_tok <= 256 THEN 'medium'
            WHEN n_tok <= 1024 THEN 'long'
            ELSE 'xlong' END AS length_bucket,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(max(n_tok) AS BIGINT) AS max_tokens
FROM t GROUP BY 1
"""

# 2-gram shingles over toks — same formula as word_ngrams_from_tokens(n=2)
_GRAMS2 = (
    "list_transform(range(0, greatest(len(toks) - 2, 0) + 1), "
    "i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))"
)

ORACLES["text_repetition"] = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS distinct_tokens
  FROM base
), g AS (
  SELECT doc_id, unnest({_GRAMS2}) AS gram FROM base
), gf AS (
  SELECT doc_id, gram, count(*) AS c FROM g
  WHERE len(string_split(gram, ' ')) >= 2
  GROUP BY doc_id, gram
), a AS (
  SELECT doc_id, max(c) AS top, sum(c) AS total FROM gf GROUP BY doc_id
)
SELECT m.doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(distinct_tokens AS BIGINT) AS distinct_tokens,
       CAST(coalesce(top, 0) AS BIGINT) AS top_ngram_count,
       CAST(coalesce(total, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce((top * 10000) // total, 0) AS BIGINT) AS top_ngram_frac_bp
FROM m LEFT JOIN a USING (doc_id)
"""

# BPE-ish token estimate — mirrors operators/text.py bpe_token_estimate:
# ceil(alpha-run/4) subwords + one per digit + one per non-alnum-non-space
ORACLES["text_bpe_estimate"] = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_words,
       CAST(
         coalesce(list_sum(list_transform(
           regexp_extract_all(text, '[A-Za-z]+'),
           w -> (length(w) + 3) // 4)), 0)
         + length(regexp_replace(text, '[^0-9]', '', 'g'))
         + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
       AS BIGINT) AS bpe_tokens
FROM documents
"""

# Exact-substring duplication coverage — mirrors operators/text.py
# dup_span_coverage (n=8, min_docs=2): 0-based window starts, md5 window
# keys, interval union via running max(pos+8) over the doc-partitioned
# pos-ordered window.
ORACLES["text_dup_spans"] = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), docs AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM base
), wins AS (
  SELECT doc_id, unnest(range(0, len(toks) - 8 + 1)) AS pos, toks
  FROM docs WHERE len(toks) >= 8
), keyed AS (
  SELECT doc_id, pos, md5(array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')) AS h
  FROM wins
), shared AS (
  SELECT h FROM keyed GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), dup AS (
  SELECT k.doc_id, k.pos FROM keyed k JOIN shared USING (h)
), cov AS (
  SELECT doc_id,
         greatest(0, pos + 8 - greatest(pos, coalesce(max(pos + 8) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos))) AS covered
  FROM dup
), per_doc AS (
  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS dup_tokens FROM cov GROUP BY doc_id
)
SELECT d.doc_id, d.n_tokens,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       CASE WHEN d.n_tokens > 0
            THEN round(coalesce(p.dup_tokens, 0)::DOUBLE / d.n_tokens, 6)
            ELSE 0.0 END AS dup_frac
FROM docs d LEFT JOIN per_doc p USING (doc_id)
"""

# Span-removal surgery — mirrors operators/text.py dedup_spans_removed:
# same shared-window detection as text_dup_spans, windows explode to
# covered positions, anti-join against the position-exploded tokens,
# order-preserving reassembly.
ORACLES["text_span_removal"] = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), docs AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM base
), wins AS (
  SELECT doc_id, unnest(range(0, len(toks) - 8 + 1)) AS pos, toks
  FROM docs WHERE len(toks) >= 8
), keyed AS (
  SELECT doc_id, pos, md5(array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')) AS h
  FROM wins
), shared AS (
  SELECT h FROM keyed GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), dup AS (
  SELECT k.doc_id, k.pos FROM keyed k JOIN shared USING (h)
), covered AS (
  SELECT DISTINCT doc_id, pos + u.r AS tpos
  FROM dup, LATERAL (SELECT unnest(range(0, 8)) AS r) u
), tok_pos AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS tpos, unnest(toks) AS tok
  FROM docs
), kept AS (
  SELECT t.doc_id, t.tpos, t.tok
  FROM tok_pos t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
  WHERE c.doc_id IS NULL
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         string_agg(tok, ' ' ORDER BY tpos) AS cleaned_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, d.n_tokens,
       coalesce(a.kept_tokens, 0) AS kept_tokens,
       coalesce(a.cleaned_text, '') AS cleaned_text
FROM docs d LEFT JOIN agg a USING (doc_id)
"""

# PII regexes — byte-identical to operators/text.py PII_*_RE (both Java
# regex and RE2 parse them the same: no lookaround, no backrefs)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"
_PII_PHONE = r"\+\d{7,15}"

ORACLES["text_pii_scrub"] = f"""
WITH p AS (
  SELECT doc_id,
         text || ' contact ' || source || '@example.com'
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
              || ' tel +1415555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(
           t, '{_PII_EMAIL}', '[EMAIL]', 'g'), '{_PII_IPV4}', '[IP]', 'g'),
           '{_PII_PHONE}', '[PHONE]', 'g')) AS scrub_fp
FROM p
"""

ORACLES["pack_sequences"] = f"""
WITH t AS (
  SELECT doc_id, lang, len({_TOKS}) AS n_tok FROM documents
)
SELECT doc_id, lang,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(coalesce(sum(n_tok) OVER (
              PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
            AS BIGINT) AS pack_id
FROM t
"""

_GRAMS5 = (
    "list_transform(range(0, greatest(len(toks) - 5, 0) + 1), "
    "i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))"
)

ORACLES["dedup_decontaminate"] = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS} AS toks FROM documents
), egrams AS (
  SELECT DISTINCT md5(gram) AS g
  FROM (SELECT unnest({_GRAMS5}) AS gram FROM toks WHERE source = 'src0')
  WHERE len(string_split(gram, ' ')) >= 5
), cgrams AS (
  SELECT doc_id, md5(gram) AS g
  FROM (SELECT doc_id, unnest({_GRAMS5}) AS gram FROM toks WHERE source <> 'src0')
  WHERE len(string_split(gram, ' ')) >= 5
)
SELECT d.doc_id, d.source
FROM documents d
WHERE d.source <> 'src0'
  AND d.doc_id NOT IN (SELECT DISTINCT c.doc_id FROM cgrams c JOIN egrams e USING (g))
"""

ORACLES["multimodal_meta"] = """
SELECT doc_id AS media_id,
       'image' AS kind,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       'fixture://documents/' || doc_id AS source_uri
FROM documents
"""

# a3_approx_distinct — the Spark side outputs exact count + an
# error-bound boolean (|HLL approx − exact|/exact ≤ 0.10); the oracle
# replays the exact count and asserts the bound held. A hash mismatch
# now means the sketch violated its advertised rsd — a real check on
# the approximate path without requiring engine-identical sketches.
ORACLES["a3_approx_distinct"] = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
       TRUE AS within_rtol
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["f3_null_pred"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_shipdate < TIMESTAMP '1996-06-01'
"""

ORACLES["f5_time_window"] = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us
FROM events
WHERE epoch_us(ts) >= 1705276800000000 - 86400000000
  AND epoch_us(ts) <= 1705276800000000 + 86400000000
"""

ORACLES["j2_prefetch_array"] = """
SELECT c.c_custkey, c.c_name, s.order_keys, s.n_urgent
FROM customer c
JOIN (
  SELECT o_custkey AS c_custkey,
         array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
         count(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
) s USING (c_custkey)
"""

ORACLES["c12_format_2dp"] = """
SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS acctbal_str
FROM customer
"""

ORACLES["f11_conditional_unique"] = """
SELECT CASE WHEN value IS NOT NULL THEN event_type ELSE '__direct__' END AS pot_key,
       json_extract_string(props, '$.k') AS on_chain_id,
       MIN(event_id) AS winner_event_id,
       COUNT(*) AS n_claimants
FROM events
GROUP BY 1, 2
"""

ORACLES["j5_semi_in_subquery"] = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
"""

ORACLES["c1_c2_event_decode"] = """
WITH logged AS (
  SELECT event_id, 'EVENT_JSON:' || base64(encode(props)) AS log_line
  FROM events
)
SELECT event_id,
       CAST(json_extract_string(decode(from_base64(substr(log_line, 12))), '$.k') AS BIGINT) AS k
FROM logged
WHERE log_line LIKE 'EVENT_JSON:%'
"""

ORACLES["c7_c8_net_usd"] = """
WITH fees AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS total,
         CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(0.05 AS DECIMAL(4,2)), 2) AS DECIMAL(20,2)) AS protocol,
         CASE WHEN l_linenumber % 2 = 0
              THEN CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2)), 2) AS DECIMAL(20,2))
         END AS referrer,
         CASE WHEN l_returnflag = 'R'
              THEN CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(4,2)), 2) AS DECIMAL(20,2))
         END AS chef
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       CAST(total - protocol - COALESCE(referrer, 0) - COALESCE(chef, 0) AS DOUBLE) AS net_amount,
       CAST(round((total - protocol - COALESCE(referrer, 0) - COALESCE(chef, 0)) * CAST(0.85 AS DECIMAL(4,2)), 2) AS DOUBLE) AS net_usd
FROM fees
"""

ORACLES["a_argmax_customer"] = """
WITH m AS (
  SELECT c_mktsegment,
         max(struct_pack(a := c_acctbal, k := c_custkey, n := c_name)) AS t
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       (t).a AS top_acctbal,
       (t).k AS top_custkey,
       (t).n AS top_name
FROM m
"""

ORACLES["a_histogram"] = """
SELECT least(floor(o_totalprice / 50000), 9)::BIGINT AS bin,
       (least(floor(o_totalprice / 50000), 9) * 50000)::BIGINT AS bin_lo,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_total
FROM orders
GROUP BY 1, 2
"""

ORACLES["a_rollup_hierarchy"] = """
SELECT r_name, n_name,
       CAST(CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DECIMAL(38,0)) / 100 AS DOUBLE) AS total_balance,
       COUNT(*) AS n_customers,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""

ORACLES["a_percentiles"] = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""

# a_approx_percentile_bound — same pattern as the HLL gate: Spark
# outputs exact median + a rank-guarantee boolean on its t-digest
# estimate; the oracle replays the exact value and asserts the bound.
ORACLES["a_approx_percentile_bound"] = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50_exact,
       TRUE AS within_bound
FROM orders
GROUP BY o_orderstatus
"""

ORACLES["c16_array_explode"] = """
SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS word
FROM part WHERE p_partkey <= 500
"""

ORACLES["j6_asof_backward"] = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id, p.user_id, c.click_id,
         p.ts_us - c.click_us AS age_us, c.click_us
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id
   AND c.click_us <= p.ts_us
   AND p.ts_us - c.click_us <= 3600000000
)
SELECT event_id, user_id, click_id, age_us
FROM j
QUALIFY row_number() OVER (
  PARTITION BY event_id ORDER BY click_us DESC NULLS LAST
) = 1
"""

ORACLES["j6_interval_join_count"] = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id AS c_user, epoch_us(ts) AS click_us
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, COUNT(c.click_us) AS n_nearby_clicks
FROM p LEFT JOIN c
  ON c.c_user = p.user_id AND abs(p.ts_us - c.click_us) <= 600000000
GROUP BY p.event_id, p.user_id
"""

# ts_resample_interpolate — dense hourly grid per type (bounded by the
# type's observed min/max bucket), linear interpolation between the
# nearest observed neighbors; arithmetic mirrored term-for-term against
# the Spark side (decimal-exact bucket means, fixed-order IEEE fill).
ORACLES["ts_resample_interpolate"] = """
WITH obs AS (
  SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
         event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
  FROM events
  GROUP BY 1, 2
),
grid AS (
  SELECT event_type, unnest(range(b0, b1 + 1, 3600000000)) AS bucket_us
  FROM (SELECT event_type, min(bucket_us) AS b0, max(bucket_us) AS b1
        FROM obs GROUP BY event_type)
),
j AS (
  SELECT g.event_type, g.bucket_us, o.v
  FROM grid g LEFT JOIN obs o
    ON g.event_type = o.event_type AND g.bucket_us = o.bucket_us
),
n AS (
  SELECT event_type, bucket_us, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN bucket_us END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_us
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN bucket_us END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket_us
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM j
)
SELECT event_type, bucket_us,
       CASE WHEN v IS NOT NULL THEN v
            ELSE pv + (nv - pv) * (CAST(bucket_us - pb AS DOUBLE)
                                   / CAST(nb - pb AS DOUBLE))
       END AS value,
       v IS NULL AS is_interpolated
FROM n
"""

ORACLES["ts_hourly_rollup"] = """
SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       COUNT(DISTINCT user_id) AS active_users
FROM events
GROUP BY 1, 2
"""

# s_stream_windowed_rollup — batch-split invariance: the streaming
# append-mode windowed agg (time-midpoint split, no late drops by
# construction) must equal the plain hourly GROUP BY.
ORACLES["s_stream_windowed_rollup"] = """
SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
"""

# s_stream_interval_join — the inner stream-stream join emits each
# match exactly once (watermarks bound state, not emission), so the
# batch interval-join SQL is its oracle.
ORACLES["s_stream_interval_join"] = """
SELECT l.user_id,
       l.event_id AS view_id,
       epoch_us(l.ts) AS view_ts_us,
       r.event_id AS purchase_id,
       epoch_us(r.ts) AS purchase_ts_us
FROM events l
JOIN events r
  ON l.event_type = 'view'
 AND r.event_type = 'purchase'
 AND l.user_id = r.user_id
 AND epoch_us(r.ts) >= epoch_us(l.ts)
 AND epoch_us(r.ts) <= epoch_us(l.ts) + 86400000000
"""

# s_stream_sessionize — gaps-and-islands replay of the stateful
# sessionizer: break at inter-event gap >= 6h (the stream's strict
# `t - end < gap` continue test), prefix-sum the breaks into session
# ids, aggregate. Batch-split invariance (time-midpoint split, no late
# drops, sentinel-flushed timeouts) makes the streaming result equal
# this batch SQL exactly.
ORACLES["s_stream_sessionize"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
),
d AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   >= 21600000000 THEN 1 ELSE 0 END AS brk
  FROM e
),
g AS (
  SELECT user_id, t,
         sum(brk) OVER (
           PARTITION BY user_id ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sid
  FROM d
)
SELECT user_id,
       min(t) AS session_start_us,
       max(t) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM g
GROUP BY user_id, sid
"""

ORACLES["j9_gated_update"] = """
WITH updates AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name,
       u.n_urgent IS NOT NULL AS was_updated,
       CAST(CASE WHEN u.n_urgent IS NOT NULL
                 THEN CAST(c_acctbal AS DECIMAL(18,2)) + CAST(10 AS DECIMAL(18,2))
                 ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS DOUBLE) AS new_balance,
       COALESCE(u.n_urgent, 0) AS n_urgent
FROM customer c LEFT JOIN updates u USING (c_custkey)
"""

ORACLES["curation_pipeline"] = f"""
WITH base AS (
  SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id, lang, len(toks) AS n_tok,
         length(regexp_replace(lower(text), '[^a-zA-Z0-9]+', '', 'g')) AS n_alnum,
         len(list_filter(toks, t -> list_contains({_STOP_EN}, t))) AS n_stop,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
         length(text) AS n_chars,
         {_FP} AS fp
  FROM base
), scored AS (
  SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tokens,
         round(
           (CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN n_alnum / greatest(n_tok, 1) >= 2.0
                 AND n_alnum / greatest(n_tok, 1) <= 12.0 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN CAST(n_stop AS DOUBLE) / CAST(greatest(n_tok, 1) AS DOUBLE) >= 0.01 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) <= 0.2 THEN 0.1 ELSE 0.0 END)
         , 4) AS quality,
         fp
  FROM m
)
SELECT doc_id, lang, n_tokens, quality
FROM scored
QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) = 1 AND quality >= 0.5
"""

# --- round 2: clusters / dup-ngrams / vocab / sessionize / funnel ---------

# transitive closure over the LSH candidate-pair graph; cluster id =
# min reachable doc id (matches graph.connected_components' fixpoint)
ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE
pairs AS ({_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT DISTINCT a AS node, a AS lbl FROM edges
  UNION
  SELECT e.a AS node, r.lbl FROM edges e JOIN reach r ON r.node = e.b
),
lbl AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
)
SELECT doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM labeled
"""

# quality-weighted cluster canonical — mirrors dedup_cluster_best: the
# dedup_clusters recursive closure + (quality desc, id asc) argmax per
# multi-doc cluster; quality is the text_metrics/curation formula
ORACLES["dedup_cluster_best"] = f"""
WITH RECURSIVE
pairs AS ({_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT DISTINCT a AS node, a AS lbl FROM edges
  UNION
  SELECT e.a AS node, r.lbl FROM edges e JOIN reach r ON r.node = e.b
),
lbl AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
base AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_tok,
         length(regexp_replace(lower(text), '[^a-zA-Z0-9]+', '', 'g')) AS n_alnum,
         len(list_filter(toks, t -> list_contains({_STOP_EN}, t))) AS n_stop,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM base
), scored AS (
  SELECT doc_id,
         round(
           (CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN n_alnum / greatest(n_tok, 1) >= 2.0
                 AND n_alnum / greatest(n_tok, 1) <= 12.0 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN CAST(n_stop AS DOUBLE) / CAST(greatest(n_tok, 1) AS DOUBLE) >= 0.01 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) <= 0.2 THEN 0.1 ELSE 0.0 END)
         , 4) AS quality
  FROM m
), joined AS (
  SELECT l.cluster_id, l.node AS doc_id, s.quality
  FROM lbl l JOIN scored s ON s.doc_id = l.node
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       doc_id AS best_doc_id,
       quality AS best_quality,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM joined
QUALIFY row_number() OVER (
  PARTITION BY cluster_id ORDER BY quality DESC, doc_id ASC) = 1
"""

_GRAMS8 = (
    "list_transform(range(0, greatest(len(toks) - 8, 0) + 1), "
    "i -> array_to_string(list_slice(toks, i + 1, i + 8), ' '))"
)

ORACLES["dedup_dup_ngrams"] = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), g AS (
  SELECT doc_id, unnest({_GRAMS8}) AS gram FROM base
), gf AS (
  SELECT doc_id, gram FROM g WHERE len(string_split(gram, ' ')) >= 8
), dc AS (
  SELECT gram, count(DISTINCT doc_id) AS nd FROM gf GROUP BY gram
), pd AS (
  SELECT doc_id, count(*) AS n_grams,
         sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS dup_grams
  FROM gf JOIN dc USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(dup_grams, 0) AS BIGINT) AS dup_grams,
       CAST(coalesce((dup_grams * 10000) // n_grams, 0) AS BIGINT) AS dup_frac_bp
FROM documents d LEFT JOIN pd USING (doc_id)
"""

ORACLES["dedup_source_overlap"] = f"""
WITH base AS (
  SELECT source AS src, {_TOKS} AS toks FROM documents
), g AS (
  SELECT DISTINCT src, gram FROM (
    SELECT src, unnest({_GRAMS8}) AS gram FROM base
  ) WHERE len(string_split(gram, ' ')) >= 8
), sizes AS (
  SELECT src, count(*) AS n_grams FROM g GROUP BY src
), common AS (
  SELECT a.src AS s1, b.src AS s2, count(*) AS n_common
  FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT sa.src AS s1, sb.src AS s2,
       CAST(sa.n_grams AS BIGINT) AS n1,
       CAST(sb.n_grams AS BIGINT) AS n2,
       CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce(n_common * 10000 // (sa.n_grams + sb.n_grams - n_common), 0)
            AS BIGINT) AS jaccard_bp
FROM sizes sa
JOIN sizes sb ON sa.src < sb.src
LEFT JOIN common ON common.s1 = sa.src AND common.s2 = sb.src
"""

ORACLES["text_vocab_topk"] = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), v AS (
  SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
  FROM t GROUP BY token
), topk AS (
  SELECT * FROM v ORDER BY n_occurrences DESC, token ASC LIMIT 100
)
SELECT token,
       CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(rank() OVER (ORDER BY n_occurrences DESC, token ASC) AS BIGINT) AS rank
FROM topk
"""

ORACLES["ts_sessionize"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
), flagged AS (
  SELECT user_id, event_id, ts_us, value,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > 3600000000 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
), sessioned AS (
  SELECT user_id, ts_us, value,
         sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ts_us) AS start_us,
       max(ts_us) AS end_us,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM sessioned
GROUP BY user_id, session_idx
"""

ORACLES["ts_funnel"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), s AS (
  SELECT user_id, min(ts_us) AS s_ts FROM e
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(ts_us) AS c_ts
  FROM e JOIN s USING (user_id)
  WHERE event_type = 'click' AND ts_us >= s_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(ts_us) AS p_ts
  FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts_us >= c_ts
  GROUP BY e.user_id
)
SELECT 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s
UNION ALL
SELECT 'click_after_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM c
UNION ALL
SELECT 'purchase_after_click' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM p
"""

# temperature mixing: p^alpha via the shared libm pow (probed identical for
# these operands); normalizer summed as DECIMAL(38,18) = order-independent
# token-budget sampling — mirrors operators/sampling.py token_budget_sample:
# per-source cumulative token count in md5('budget:'||id) walk order, keep
# rows whose running total (including self) fits the budget.
ORACLES["sample_token_budget"] = f"""
WITH t AS (
  SELECT source, doc_id, CAST(len({_TOKS}) AS BIGINT) AS tokens,
         md5('budget:' || CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
), c AS (
  SELECT source, doc_id, tokens,
         CAST(sum(tokens) OVER (
           PARTITION BY source ORDER BY hk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT source, doc_id, tokens, cum_tokens FROM c WHERE cum_tokens <= 800
"""

# systematic PPS — mirrors operators/sampling.py pps_systematic_sample:
# same per-source cumsum as sample_token_budget, integer stride-crossing
# predicate
ORACLES["sample_pps_systematic"] = f"""
WITH t AS (
  SELECT source, doc_id, CAST(len({_TOKS}) AS BIGINT) AS tokens,
         md5('budget:' || CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
), c AS (
  SELECT source, doc_id, tokens,
         CAST(sum(tokens) OVER (
           PARTITION BY source ORDER BY hk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT source, doc_id, tokens, cum_tokens
FROM c WHERE (cum_tokens // 400) > ((cum_tokens - tokens) // 400)
"""

# mixing pipeline — temperature_mix_weights (over source) composed with
# token_budget_sample: budgets = floor(q_share * 8000), q_share exactly as
# the sample_temperature_mix oracle computes it (rounded to 9dp before the
# floor so both engines floor the same double)
ORACLES["sample_mix_pipeline"] = f"""
WITH c AS (
  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), t AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM c
), pa AS (
  SELECT stratum, CAST(pow(n_docs / N, 0.3) AS DECIMAL(38,18)) AS pa_dec
  FROM c, t
), z AS (
  SELECT sum(pa_dec) AS Z FROM pa
), b AS (
  SELECT stratum AS source,
         CAST(floor(round(CAST(pa_dec AS DOUBLE) / CAST(Z AS DOUBLE), 9) * 8000) AS BIGINT) AS budget
  FROM pa, z
), tok AS (
  SELECT source, doc_id, CAST(len({_TOKS}) AS BIGINT) AS tokens,
         md5('budget:' || CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
), cum AS (
  SELECT source, doc_id, tokens,
         CAST(sum(tokens) OVER (
           PARTITION BY source ORDER BY hk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM tok
)
SELECT c.source, c.doc_id, c.tokens, c.cum_tokens
FROM cum c JOIN b USING (source)
WHERE c.cum_tokens <= b.budget
"""

ORACLES["sample_temperature_mix"] = """
WITH c AS (
  SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
), t AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM c
), pa AS (
  SELECT stratum, n_docs, n_docs / N AS p,
         CAST(pow(n_docs / N, 0.3) AS DECIMAL(38,18)) AS pa_dec
  FROM c, t
), z AS (
  SELECT sum(pa_dec) AS Z FROM pa
)
SELECT stratum, n_docs,
       round(p, 9) AS p_share,
       round(CAST(pa_dec AS DOUBLE) / CAST(Z AS DOUBLE), 9) AS q_share,
       round((CAST(pa_dec AS DOUBLE) / CAST(Z AS DOUBLE)) / p, 9) AS mix_weight
FROM pa, z
"""

_SHARD8 = "(" + _hex24_sql("'shuffle-shard:' || CAST(doc_id AS VARCHAR)") + " % 10000) % 8"

ORACLES["sample_seeded_shuffle"] = f"""
WITH s AS (
  SELECT doc_id,
         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
         CAST({_SHARD8} AS BIGINT) AS shuffle_shard
  FROM documents
)
SELECT doc_id, shuffle_key, shuffle_shard,
       CAST(row_number() OVER (
         PARTITION BY shuffle_shard ORDER BY shuffle_key ASC, doc_id ASC
       ) AS BIGINT) AS shuffle_pos
FROM s
"""

# heavy hitters: the sketch is plan-only — the answer is the naive
# groupBy + HAVING count*(k+1) > N, which is exactly what we run here
ORACLES["text_heavy_hitters"] = f"""
WITH t AS (
  SELECT unnest({_TOKS}) AS token FROM documents
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS N FROM t
)
SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
FROM t, n
GROUP BY token, N
HAVING count(*) * 51 > N
"""

# unigram-LM bits-per-token: log2 over exact integer-valued doubles; the
# per-doc sum accumulates as DECIMAL(38,18) = order-independent
ORACLES["text_lm_quality"] = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), v AS (
  SELECT token, count(*) AS c FROM t GROUP BY token
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS N FROM t
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(CAST(log2(CAST(N AS DOUBLE)) - log2(CAST(c AS DOUBLE))
                           AS DECIMAL(38,18))) AS DOUBLE) / count(*), 9)
         AS bits_per_token
FROM t JOIN v USING (token), n
GROUP BY doc_id
"""

# BM25 (k1=1.2, b=0.75; k1+1 = 2.2 — same double as Spark's lit(1.2+1.0))
ORACLES["text_bm25"] = f"""
WITH l AS (
  SELECT doc_id, len({_TOKS}) AS dl FROM documents
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS N,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM l
), t AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), q AS (
  SELECT doc_id, token, count(*) AS tf FROM t
  WHERE token IN ('spark', 'hash', 'merge', 'vector')
  GROUP BY doc_id, token
), d AS (
  SELECT token, count(*) AS df FROM q GROUP BY token
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_matched_terms,
       round(CAST(sum(CAST(
         ln(1.0 + (N - df + 0.5) / (df + 0.5)) * (tf * 2.2)
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
         AS DECIMAL(38,18))) AS DOUBLE), 9) AS bm25
FROM q JOIN d USING (token) JOIN l USING (doc_id), s
GROUP BY doc_id
"""

# signature-level Jaccard estimate over the LSH candidate pairs: reuse the
# shared minhash signature CTE; n_agree/8.0 is exact (÷ power of two)
_SIG_AGREE = " + ".join(
    f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(8)
)
ORACLES["dedup_minhash_estimate"] = f"""
WITH pairs AS ({_PAIRS_SQL}),
sig AS (
  SELECT doc_id,
         {', '.join(f"list_aggregate(list_transform(s, x -> md5('{i}:' || x)), 'min') AS h{i}" for i in range(8))}
  FROM (
    SELECT doc_id,
           list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2])
                          for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
    FROM (SELECT doc_id, {_TOKS} AS w FROM documents)
  )
)
SELECT id_a, id_b,
       CAST({_SIG_AGREE} AS BIGINT) AS n_agree,
       ({_SIG_AGREE}) / 8.0 AS est_jaccard
FROM pairs
JOIN sig sa ON sa.doc_id = id_a
JOIN sig sb ON sb.doc_id = id_b
"""

ORACLES["ts_moving_avg"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
)
SELECT user_id, event_id, ts_us,
       ts_us - lag(ts_us) OVER w AS gap_us,
       CAST(count(*) OVER f AS BIGINT) AS n_in_frame,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE)
         / count(*) OVER f AS moving_avg
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC),
       f AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""

ORACLES["ts_range_window"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT user_id, event_id, ts_us,
       CAST(count(*) OVER f AS BIGINT) AS trailing_n,
       CAST(sum(k) OVER f AS BIGINT) AS trailing_k_sum
FROM e
WINDOW f AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""

ORACLES["dedup_fuzzy_names"] = """
SELECT a.c_custkey AS c1,
       b.c_custkey AS c2,
       CAST(a.c_nationkey AS BIGINT) AS block,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 1
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""

ORACLES["ts_retention_cohorts"] = """
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id
), joined AS (
  SELECT a.user_id, c.cohort_week, a.week - c.cohort_week AS "offset"
  FROM act a JOIN cohort c ON a.user_id = c.user_id
), sizes AS (
  SELECT cohort_week, count(DISTINCT user_id) AS n_cohort
  FROM cohort GROUP BY cohort_week
), cells AS (
  SELECT cohort_week, "offset", count(DISTINCT user_id) AS n_active
  FROM joined WHERE "offset" <= 3 GROUP BY cohort_week, "offset"
)
SELECT c.cohort_week, c."offset" AS offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(n_cohort AS BIGINT) AS n_cohort,
       CAST(n_active * 10000 // n_cohort AS BIGINT) AS retention_bp
FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
"""

ORACLES["setop_intersect_except"] = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""

ORACLES["a_ntile_bins"] = """
WITH b AS (
  SELECT o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         ntile(10) OVER (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
  FROM orders
)
SELECT o_orderstatus, CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(p) AS DOUBLE) AS lo,
       CAST(max(p) AS DOUBLE) AS hi
FROM b GROUP BY o_orderstatus, decile
"""

ORACLES["a_unpivot_measures"] = """
WITH g AS (
  SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS extendedprice,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount,
         CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax
  FROM lineitem
)
SELECT 'extendedprice' AS measure, extendedprice AS total FROM g
UNION ALL SELECT 'discount', discount FROM g
UNION ALL SELECT 'tax', tax FROM g
"""

ORACLES["a_cube_matrix"] = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CASE WHEN GROUPING(o_orderstatus) THEN 1 ELSE 0 END AS BIGINT) AS g_status,
       CAST(CASE WHEN GROUPING(o_orderpriority) THEN 1 ELSE 0 END AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ORACLES["q5_local_supplier_volume"] = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

ORACLES["q3_shipping_priority"] = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""

ORACLES["q10_returned_items"] = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
       n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate < TIMESTAMP '1998-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

# PageRank: unrolled rounds mirroring graph.pagerank — decimal-exact
# contribution sums; (1.0 - 0.85) written as the subtraction so both
# engines fold the identical double (0.15 the literal is a DIFFERENT one)
def _pagerank_sql(iterations: int = 3) -> str:
    rounds = ""
    prev = "r0"
    for i in range(1, iterations + 1):
        rounds += f""",
c{i} AS (
  SELECT dst AS id,
         CAST(sum(CAST(rank / deg AS DECIMAL(38,18))) AS DOUBLE) AS c
  FROM e JOIN {prev} ON {prev}.id = e.src JOIN deg ON deg.src = e.src
  GROUP BY dst
), r{i} AS (
  SELECT nodes.id, (1.0 - 0.85) / N + 0.85 * coalesce(c, 0.0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON c{i}.id = nodes.id
)"""
        prev = f"r{i}"
    return f"""
WITH e AS (
  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), nodes AS (
  SELECT src AS id FROM e UNION SELECT dst FROM e
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS N FROM nodes
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
), r0 AS (
  SELECT id, 1.0 / N AS rank FROM nodes CROSS JOIN nn
){rounds}
SELECT id, round(rank, 9) AS rank FROM {prev}
"""


ORACLES["graph_pagerank"] = _pagerank_sql(3)

# the direct aggregate — hash-equality against the two-batch fold on the
# Spark side is the incremental-maintenance invariant, checked cross-engine
ORACLES["t_incremental_stats"] = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_usd,
       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_usd,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_usd
FROM orders GROUP BY o_custkey
"""

ORACLES["a_pivot_matrix"] = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
"""

ORACLES["f_lookalike_ids"] = """
SELECT a.s_name AS name_a, b.s_name AS name_b,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
FROM supplier a JOIN supplier b
  ON length(a.s_name) = length(b.s_name) AND a.s_name < b.s_name
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""

# moment sums as exact decimals, one double formula at the end — the
# engine-exact corr/covar (built-in corr() accumulates order-dependently)
ORACLES["a_corr_covar"] = """
WITH g AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
         sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
  FROM lineitem GROUP BY l_returnflag
), d AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
         CAST(sxy AS DOUBLE) AS sxy
  FROM g
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round(sxy / nd - (sx / nd) * (sy / nd), 9) AS covar_pop,
       round((sxy / nd - (sx / nd) * (sy / nd))
             / (sqrt(sxx / nd - (sx / nd) * (sx / nd))
                * sqrt(syy / nd - (sy / nd) * (sy / nd))), 9) AS corr
FROM d
"""

# per-label centroid with decimal-exact components; scoring via the same
# sequential fold as sim_cosine_topk (list_dot_product == Spark aggregate)
ORACLES["sim_centroid_outliers"] = """
WITH x AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
), comp AS (
  SELECT label, pos,
         CAST(sum(CAST(val AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS c
  FROM x GROUP BY label, pos
), cent AS (
  SELECT label, list(c ORDER BY pos) AS centroid FROM comp GROUP BY label
)
SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       round(list_dot_product(e.embedding::DOUBLE[], cent.centroid) /
             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
              sqrt(list_dot_product(cent.centroid, cent.centroid))), 6)
         AS cos_to_centroid
FROM embeddings e JOIN cent USING (label)
"""

# One UNION ALL branch per profiled column — same exact aggregates the
# one-scan Spark plan folds together; doubles render via DECIMAL(18,2)
# on both engines (stable fixed-point text, no scientific notation).
_PROFILE_COLS = [
    ("o_orderkey", False),
    ("o_custkey", False),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]
ORACLES["qa_column_profile"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       CAST({f"CAST(min({c}) AS DECIMAL(18,2))" if dbl else f"min({c})"} AS VARCHAR) AS min_s,
       CAST({f"CAST(max({c}) AS DECIMAL(18,2))" if dbl else f"max({c})"} AS VARCHAR) AS max_s
FROM orders"""
    for c, dbl in _PROFILE_COLS
)

ORACLES["qa_skew_profile"] = """
WITH counts AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key_value, count(*) AS cnt
  FROM orders GROUP BY 1
), totals AS (
  SELECT sum(cnt) AS total, count(*) AS nkeys FROM counts
)
SELECT key_value, cnt,
       round(cnt * 100.0 / total, 4) AS share_pct,
       round(CAST(cnt AS DOUBLE) * nkeys / total, 4) AS skew_ratio
FROM counts, totals
ORDER BY cnt DESC, key_value ASC
LIMIT 10
"""

ORACLES["qa_constraint_checks"] = """
SELECT 'not_null(l_orderkey)' AS check_name,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM lineitem
UNION ALL
SELECT 'in_range(l_quantity,1.0,30.0)',
       CAST(sum(CASE WHEN l_quantity IS NULL
                 OR NOT (l_quantity >= 1.0 AND l_quantity <= 30.0)
            THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'in_range(l_discount,0.0,0.1)',
       CAST(sum(CASE WHEN l_discount IS NULL
                 OR NOT (l_discount >= 0.0 AND l_discount <= 0.1)
            THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'in_range(l_tax,0.0,0.08)',
       CAST(sum(CASE WHEN l_tax IS NULL
                 OR NOT (l_tax >= 0.0 AND l_tax <= 0.08)
            THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'accepted_values(l_returnflag)',
       CAST(sum(CASE WHEN l_returnflag IS NULL
                 OR l_returnflag NOT IN ('A', 'N', 'R')
            THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'referential(l_orderkey)',
       (SELECT count(*) FROM lineitem l
        WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'not_null(c_name)',
       CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM customer
UNION ALL
SELECT 'unique(c_custkey)',
       (SELECT count(c_custkey) - count(DISTINCT c_custkey) FROM customer)
"""
ORACLES["qa_constraint_checks"] = f"""
WITH checks AS ({ORACLES["qa_constraint_checks"]})
SELECT check_name, n_violations, n_violations = 0 AS passed FROM checks
"""

ORACLES["t_scd2_intervals"] = """
SELECT user_id, event_id, event_type,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER w AS valid_to_us,
       round(CAST(value AS DOUBLE), 2) AS value_2dp,
       lead(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
"""

ORACLES["ts_state_streaks"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
), flagged AS (
  SELECT user_id, event_id, ts_us, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
), streaked AS (
  SELECT user_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS streak_id
  FROM flagged
), runs AS (
  SELECT user_id, streak_id, event_type, count(*) AS len
  FROM streaked GROUP BY user_id, streak_id, event_type
), ranked AS (
  SELECT user_id, event_type, len,
         row_number() OVER (PARTITION BY user_id ORDER BY len DESC, event_type ASC) AS rn
  FROM runs
)
SELECT user_id,
       max(CASE WHEN rn = 1 THEN event_type END) AS best_type,
       CAST(max(CASE WHEN rn = 1 THEN len END) AS BIGINT) AS best_len,
       count(*) AS n_streaks
FROM ranked
GROUP BY user_id
"""

# Generated PQ/ADC oracle: same codebook seeds (vec_id < 8), same
# argmin (d ASC, code ASC == Spark's (d, j) struct array_min), same
# left-associative subspace sums, same sequential-fold dot products
# (list_dot_product == the zip_with/aggregate fold).
ORACLES["sim_pq_recall"] = f"""
WITH cent AS (
  SELECT vec_id AS j, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8
),
subs AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(s)),
codes AS (
  SELECT e.vec_id, t.s, c.j AS code
  FROM embeddings e CROSS JOIN subs t CROSS JOIN cent c
  QUALIFY row_number() OVER (
    PARTITION BY e.vec_id, t.s
    ORDER BY (list_dot_product(list_slice(c.cv, t.s*16+1, (t.s+1)*16),
                               list_slice(c.cv, t.s*16+1, (t.s+1)*16))
              - 2.0 * list_dot_product(list_slice(e.embedding::DOUBLE[], t.s*16+1, (t.s+1)*16),
                                       list_slice(c.cv, t.s*16+1, (t.s+1)*16))) ASC,
             c.j ASC) = 1
),
pairs AS (
  SELECT q.vec_id AS q_id, e.vec_id AS c_id,
         (list_dot_product(list_slice(q.embedding::DOUBLE[], 1, 16), list_slice(c0.cv, 1, 16)) + list_dot_product(list_slice(q.embedding::DOUBLE[], 17, 32), list_slice(c1.cv, 17, 32)) + list_dot_product(list_slice(q.embedding::DOUBLE[], 33, 48), list_slice(c2.cv, 33, 48)) + list_dot_product(list_slice(q.embedding::DOUBLE[], 49, 64), list_slice(c3.cv, 49, 64))) AS dotc,
         (list_dot_product(list_slice(c0.cv, 1, 16), list_slice(c0.cv, 1, 16)) + list_dot_product(list_slice(c1.cv, 17, 32), list_slice(c1.cv, 17, 32)) + list_dot_product(list_slice(c2.cv, 33, 48), list_slice(c2.cv, 33, 48)) + list_dot_product(list_slice(c3.cv, 49, 64), list_slice(c3.cv, 49, 64))) AS cnrm2,
         sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) AS qn
  FROM embeddings e
  JOIN codes k0 ON k0.vec_id = e.vec_id AND k0.s = 0
  JOIN cent c0 ON c0.j = k0.code
  JOIN codes k1 ON k1.vec_id = e.vec_id AND k1.s = 1
  JOIN cent c1 ON c1.j = k1.code
  JOIN codes k2 ON k2.vec_id = e.vec_id AND k2.s = 2
  JOIN cent c2 ON c2.j = k2.code
  JOIN codes k3 ON k3.vec_id = e.vec_id AND k3.s = 3
  JOIN cent c3 ON c3.j = k3.code
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
  WHERE q.vec_id <> e.vec_id
),
approx AS (
  SELECT q_id, c_id,
         CASE WHEN qn = 0 OR cnrm2 = 0 THEN 0.0
              ELSE round(dotc / (qn * sqrt(cnrm2)), 6) END AS qcos
  FROM pairs
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, c_id ASC) <= 5
),
exact AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 8
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id ORDER BY round({_COS}, 6) DESC, c.vec_id ASC) <= 5
),
hits AS (
  SELECT e.q_id, count(*) AS n_hit
  FROM exact e JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
  GROUP BY 1
)
SELECT q.q_id,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(h.n_hit * 10000 // 5, 0) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT q_id FROM exact) q LEFT JOIN hits h USING (q_id)
"""

ORACLES["t_scd2_asof"] = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), b AS (
  SELECT CAST((min(ts_us) + max(ts_us)) // 2 AS BIGINT) AS t_mid FROM e
), iv AS (
  SELECT user_id, event_id, event_type, ts_us AS valid_from,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS valid_to
  FROM e
)
SELECT user_id, event_id, event_type, valid_from AS valid_from_us, t_mid
FROM iv, b
WHERE valid_from <= t_mid AND (valid_to IS NULL OR valid_to > t_mid)
"""

ORACLES["text_vocab_encode"] = f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(tt, 1) AS pos, unnest(tt) AS tok
  FROM (SELECT doc_id, {_TOKS} AS tt FROM documents)
), counts AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
), vocab AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok ASC) - 1 AS BIGINT) AS tok_id
  FROM (SELECT * FROM counts ORDER BY n DESC, tok ASC LIMIT 100)
), enc AS (
  SELECT t.doc_id, t.pos, coalesce(v.tok_id, 100) AS tid
  FROM toks t LEFT JOIN vocab v USING (tok)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tid = 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
       array_to_string(list_slice(list(tid ORDER BY pos ASC), 1, 20), ',') AS ids_head
FROM enc GROUP BY doc_id
"""

# byte identity: the fake payload is the utf-8 encoding of text, and
# DuckDB's md5(VARCHAR) hashes the utf-8 bytes — same digest as Spark's
# md5(encode(text, 'utf-8')); octet_length(encode(..)) is the byte length
ORACLES["multimodal_byte_dedup"] = """
SELECT md5(text) AS payload_md5,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS canonical_media_id
FROM documents
GROUP BY 1, 2
"""

# The codec gate's payloads are synthesized in-plan from the media_id
# alone (plans/fixture_queries._synth_media_payload) and the whole
# decode→resample→PNG-transcode pipeline is deterministic pure
# numpy/stdlib, so the oracle is the precomputed literal fingerprints —
# sf-invariant by design (verified identical at sf0.001 and sf0.01).
# Any change to the codec's numerics shows up here as a hash mismatch.
ORACLES["multimodal_resize_fingerprint"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), 'd872b28aa04a75512fda14deeed80218', TRUE),
  (CAST(1 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), 'bfd2286020ce28c1c3ea553b335dd4da', TRUE),
  (CAST(2 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), '99c94fdb03e475f02e7a2e06e496667f', TRUE),
  (CAST(3 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), '78f6f78c2830ae856e386f987813b182', TRUE),
  (CAST(4 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), '3445a2d8365cb6cd5b474f95a2e92464', TRUE),
  (CAST(5 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), '6a92fd3e289918cb24e2c59c1b1fb145', TRUE),
  (CAST(6 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), 'ba4687799ac2afd07b5fa51ce257e616', FALSE),
  (CAST(7 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), 'd6a5be3b85b5467db2cffe0262f24339', FALSE),
  (CAST(8 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), '95122bae33f750a6e116758659f4da33', TRUE),
  (CAST(9 AS BIGINT), CAST(16 AS BIGINT), CAST(12 AS BIGINT), '4a1b4e662d07cd5af028eaa2453a08ac', TRUE)
) AS t(media_id, width, height, payload_md5, decoded)
"""

# the streaming state is batch-split invariant, so the oracle is the
# plain batch GROUP BY the two micro-batches must fold into
ORACLES["s_stream_exact_dedup"] = """
SELECT md5(text) AS payload_md5,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM documents
GROUP BY 1
"""

ORACLES["graph_copurchase_pairs"] = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b, count(*) AS n_orders
  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
FROM pairs
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
"""

# range(0, n, step) (exclusive stop) == Spark sequence(0, n-1, step)
# (inclusive stop) for n > 0 — both emit starts strictly below n
ORACLES["text_chunk_overlap"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS tt FROM documents
), s AS (
  SELECT doc_id, tt, unnest(range(0, len(tt), 48)) AS st
  FROM t WHERE len(tt) > 0
)
SELECT doc_id,
       CAST(st // 48 AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(tt, st + 1, st + 64)) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(tt, st + 1, st + 64), ' ') AS chunk_text
FROM s
"""

ORACLES["qa_embedding_profile"] = """
WITH n AS (
  SELECT CAST(label AS BIGINT) AS label,
         len(embedding) AS dim,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
       round(min(nrm), 6) AS norm_min,
       round(CAST(sum(CAST(nrm AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS norm_mean,
       round(max(nrm), 6) AS norm_max
FROM n GROUP BY label
"""

ORACLES["j_full_outer_reconcile"] = """
WITH li AS (
  SELECT l_orderkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS li_gross
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey, o.o_totalprice, li.l_orderkey, li.li_gross
  FROM orders o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT CASE WHEN o_orderkey IS NULL THEN 'lineitem_only'
            WHEN l_orderkey IS NULL THEN 'order_only'
            ELSE 'has_both' END AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(coalesce(CAST(o_totalprice AS DECIMAL(18,2)), 0)) AS DOUBLE) AS orders_total,
       CAST(sum(coalesce(li_gross, 0)) AS DOUBLE) AS lineitem_total
FROM j GROUP BY 1
"""

ORACLES["qa_sequence_gaps"] = """
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
adj AS (
  SELECT lag(k) OVER (ORDER BY k) AS prev_key, k AS next_key FROM k
)
SELECT prev_key, next_key, CAST(next_key - prev_key AS BIGINT) AS gap
FROM adj
WHERE prev_key IS NOT NULL AND next_key - prev_key > 1
ORDER BY gap DESC, prev_key ASC
LIMIT 100
"""

ORACLES["ts_zscore_anomaly"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(value AS DOUBLE) AS value,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
), stats AS (
  SELECT user_id, event_id, ts_us, value,
         count(v) OVER w AS n,
         CAST(sum(v) OVER w AS DOUBLE) AS s,
         CAST(sum(CAST(v * v AS DECIMAL(38,6))) OVER w AS DOUBLE) AS ss
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, ts_us, value,
       round((value - s / n) / sqrt(ss / n - (s / n) * (s / n)), 6) AS z
FROM stats
WHERE n >= 5
  AND abs(round((value - s / n) / sqrt(ss / n - (s / n) * (s / n)), 6)) > 2.0
"""

ORACLES["a_grouping_sets"] = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(CASE WHEN GROUPING(o_orderstatus) THEN 1 ELSE 0 END AS BIGINT) AS g_status,
       CAST(CASE WHEN GROUPING(o_orderpriority) THEN 1 ELSE 0 END AS BIGINT) AS g_priority,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""

ORACLES["link_fs_scores"] = """
WITH c AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_band
  FROM customer
),
p AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         COALESCE(a.c_mktsegment = b.c_mktsegment, FALSE) AS agree_seg,
         COALESCE(right(a.c_name, 1) = right(b.c_name, 1), FALSE) AS agree_name_digit,
         COALESCE(abs(a.c_acctbal - b.c_acctbal) < 1.0, FALSE) AS agree_bal
  FROM c a JOIN c b
    ON a.c_nationkey = b.c_nationkey AND a.bal_band = b.bal_band
   AND a.c_custkey < b.c_custkey
),
s AS (
  SELECT *,
         CAST(CASE WHEN agree_seg THEN CAST(2.169925 AS DECIMAL(18,6)) ELSE CAST(-3.0 AS DECIMAL(18,6)) END
          + CASE WHEN agree_name_digit THEN CAST(3.247928 AS DECIMAL(18,6)) ELSE CAST(-4.169925 AS DECIMAL(18,6)) END
          + CASE WHEN agree_bal THEN CAST(4.0 AS DECIMAL(18,6)) ELSE CAST(-2.247928 AS DECIMAL(18,6)) END AS DOUBLE) AS score
  FROM p
)
SELECT id_a, id_b, agree_seg, agree_name_digit, agree_bal, score,
       CASE WHEN score >= 4.0 THEN 'match'
            WHEN score >= 0.0 THEN 'possible'
            ELSE 'non_match' END AS decision
FROM s
"""

# BPE merge training: replays the 3 rounds — same word-frequency
# weighting, same (count DESC, pair ASC) tie-break, same triple-
# replace bounded-fixpoint merge application as bpe_train_merges.
ORACLES["text_bpe_train"] = r"""
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wf FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
f1 AS (SELECT regexp_replace(w, '(.)', '|\1', 'g') || '|' AS form, wf FROM words),
p1 AS (
  SELECT t.toks[g.i] AS left_tok, t.toks[g.i + 1] AS right_tok,
         CAST(sum(t.wf) AS BIGINT) AS pair_count
  FROM (SELECT list_filter(string_split(form, '|'), x -> x <> '') AS toks, wf FROM f1) t,
       UNNEST(range(1, len(t.toks))) AS g(i)
  GROUP BY 1, 2
),
b1 AS (SELECT CAST(1 AS BIGINT) AS merge_round, left_tok, right_tok, pair_count
       FROM p1 ORDER BY pair_count DESC, left_tok, right_tok LIMIT 1),
m1 AS (SELECT '|' || left_tok || '|' || right_tok || '|' AS pat,
              '|' || left_tok || right_tok || '|' AS rep FROM b1),
f2 AS (SELECT replace(replace(replace(form, m.pat, m.rep), m.pat, m.rep), m.pat, m.rep) AS form, wf
       FROM f1, m1 m),
p2 AS (
  SELECT t.toks[g.i] AS left_tok, t.toks[g.i + 1] AS right_tok,
         CAST(sum(t.wf) AS BIGINT) AS pair_count
  FROM (SELECT list_filter(string_split(form, '|'), x -> x <> '') AS toks, wf FROM f2) t,
       UNNEST(range(1, len(t.toks))) AS g(i)
  GROUP BY 1, 2
),
b2 AS (SELECT CAST(2 AS BIGINT) AS merge_round, left_tok, right_tok, pair_count
       FROM p2 ORDER BY pair_count DESC, left_tok, right_tok LIMIT 1),
m2 AS (SELECT '|' || left_tok || '|' || right_tok || '|' AS pat,
              '|' || left_tok || right_tok || '|' AS rep FROM b2),
f3 AS (SELECT replace(replace(replace(form, m.pat, m.rep), m.pat, m.rep), m.pat, m.rep) AS form, wf
       FROM f2, m2 m),
p3 AS (
  SELECT t.toks[g.i] AS left_tok, t.toks[g.i + 1] AS right_tok,
         CAST(sum(t.wf) AS BIGINT) AS pair_count
  FROM (SELECT list_filter(string_split(form, '|'), x -> x <> '') AS toks, wf FROM f3) t,
       UNNEST(range(1, len(t.toks))) AS g(i)
  GROUP BY 1, 2
),
b3 AS (SELECT CAST(3 AS BIGINT) AS merge_round, left_tok, right_tok, pair_count
       FROM p3 ORDER BY pair_count DESC, left_tok, right_tok LIMIT 1)
SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3
"""

# Count-Min sketch — mirrors operators/sketches.py cm_error_profile:
# same md5 8-hex-digit bucket (Spark conv(...,16,10) == DuckDB 0x cast),
# same 4x64 geometry, min-over-rows estimate, one-sided error.
ORACLES["a_cm_sketch_profile"] = r"""
WITH occ AS (
  SELECT CAST(user_id AS VARCHAR) AS v FROM events
),
cells AS (
  SELECT g.r,
         CAST(('0x' || substr(md5('cm' || g.r || ':' || v), 1, 8)) AS BIGINT) % 64 AS b,
         CAST(count(*) AS BIGINT) AS cell
  FROM occ, UNNEST(range(0, 4)) AS g(r)
  GROUP BY 1, 2
),
exact AS (
  SELECT v AS value, CAST(count(*) AS BIGINT) AS exact_count FROM occ GROUP BY v
),
est AS (
  SELECT e.value, e.exact_count, CAST(min(c.cell) AS BIGINT) AS cm_estimate
  FROM exact e, UNNEST(range(0, 4)) AS g(r)
  JOIN cells c
    ON c.r = g.r
   AND c.b = CAST(('0x' || substr(md5('cm' || g.r || ':' || e.value), 1, 8)) AS BIGINT) % 64
  GROUP BY 1, 2
)
SELECT value, exact_count, cm_estimate,
       CAST(cm_estimate - exact_count AS BIGINT) AS overcount
FROM est
"""

# CDC apply with deletes — mirrors sources/merge.py cdc_apply: per key the
# highest-version row wins (change rows beat the snapshot on ties via the
# src flag), and a winning 'D' tombstone removes the key.
ORACLES["t_cdc_apply"] = """
WITH snap AS (
  SELECT o_orderkey AS k, CAST(0 AS BIGINT) AS version, o_totalprice AS value,
         'I' AS op, 0 AS src
  FROM orders
), ch AS (
  SELECT l_orderkey AS k,
         CAST(l_linenumber AS BIGINT) * 1000000000
           + CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10
           + CASE WHEN l_returnflag = 'R' THEN 2
                  WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS version,
         l_extendedprice AS value,
         CASE WHEN l_returnflag = 'R' THEN 'D'
              WHEN l_returnflag = 'A' THEN 'U'
              ELSE 'I' END AS op, 1 AS src
  FROM lineitem
), u AS (
  SELECT * FROM snap UNION ALL SELECT * FROM ch
), r AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC, src DESC) AS rn
  FROM u
)
SELECT k, version, op, CAST(value AS DOUBLE) AS value
FROM r WHERE rn = 1 AND op <> 'D'
"""

# BPE encode — replays text_bpe_train's three merge rounds (same bounded
# triple-replace fixpoint) carrying the raw word through, APPLIES the
# third merge too (f4), then joins occurrences to the encoded vocab.
ORACLES["text_bpe_encode"] = r"""
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wf FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
f1 AS (SELECT w, regexp_replace(w, '(.)', '|\1', 'g') || '|' AS form, wf FROM words),
p1 AS (
  SELECT t.toks[g.i] AS left_tok, t.toks[g.i + 1] AS right_tok,
         CAST(sum(t.wf) AS BIGINT) AS pair_count
  FROM (SELECT list_filter(string_split(form, '|'), x -> x <> '') AS toks, wf FROM f1) t,
       UNNEST(range(1, len(t.toks))) AS g(i)
  GROUP BY 1, 2
),
b1 AS (SELECT left_tok, right_tok FROM p1
       ORDER BY pair_count DESC, left_tok, right_tok LIMIT 1),
m1 AS (SELECT '|' || left_tok || '|' || right_tok || '|' AS pat,
              '|' || left_tok || right_tok || '|' AS rep FROM b1),
f2 AS (SELECT w, replace(replace(replace(form, m.pat, m.rep), m.pat, m.rep), m.pat, m.rep) AS form, wf
       FROM f1, m1 m),
p2 AS (
  SELECT t.toks[g.i] AS left_tok, t.toks[g.i + 1] AS right_tok,
         CAST(sum(t.wf) AS BIGINT) AS pair_count
  FROM (SELECT list_filter(string_split(form, '|'), x -> x <> '') AS toks, wf FROM f2) t,
       UNNEST(range(1, len(t.toks))) AS g(i)
  GROUP BY 1, 2
),
b2 AS (SELECT left_tok, right_tok FROM p2
       ORDER BY pair_count DESC, left_tok, right_tok LIMIT 1),
m2 AS (SELECT '|' || left_tok || '|' || right_tok || '|' AS pat,
              '|' || left_tok || right_tok || '|' AS rep FROM b2),
f3 AS (SELECT w, replace(replace(replace(form, m.pat, m.rep), m.pat, m.rep), m.pat, m.rep) AS form, wf
       FROM f2, m2 m),
p3 AS (
  SELECT t.toks[g.i] AS left_tok, t.toks[g.i + 1] AS right_tok,
         CAST(sum(t.wf) AS BIGINT) AS pair_count
  FROM (SELECT list_filter(string_split(form, '|'), x -> x <> '') AS toks, wf FROM f3) t,
       UNNEST(range(1, len(t.toks))) AS g(i)
  GROUP BY 1, 2
),
b3 AS (SELECT left_tok, right_tok FROM p3
       ORDER BY pair_count DESC, left_tok, right_tok LIMIT 1),
m3 AS (SELECT '|' || left_tok || '|' || right_tok || '|' AS pat,
              '|' || left_tok || right_tok || '|' AS rep FROM b3),
f4 AS (SELECT w, replace(replace(replace(form, m.pat, m.rep), m.pat, m.rep), m.pat, m.rep) AS form, wf
       FROM f3, m3 m),
enc AS (
  SELECT w, len(list_filter(string_split(form, '|'), x -> x <> '')) AS n_toks FROM f4
),
dw AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(e.n_toks) AS BIGINT) AS n_bpe_tokens
FROM dw d JOIN enc e USING (w)
WHERE d.w <> ''
GROUP BY d.doc_id
"""


# Inverted index — term stats before the postings cap, postings ordered
# tf DESC then doc ASC, output = top-200 terms by (cf DESC, term ASC).
ORACLES["text_inverted_index"] = """
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')) AS term FROM documents
), tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY term, doc_id
), stats AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS df_docs,
         CAST(sum(tf) AS BIGINT) AS cf,
         array_to_string(
           list_transform(
             list_slice(list(doc_id ORDER BY tf DESC, doc_id ASC), 1, 5),
             x -> CAST(x AS VARCHAR)),
           ',') AS top_docs
  FROM tf GROUP BY term
)
SELECT term, df_docs, cf, top_docs
FROM stats WHERE df_docs >= 3
ORDER BY cf DESC, term ASC LIMIT 200
"""

# Seasonal decomposition — mirrors operators/windows.py seasonal_decompose
# exactly: DECIMAL window/group sums, every division pinned with the
# portable floor(x*1e6 + 0.5)/1e6 rounding before reuse.
ORACLES["ts_decompose"] = """
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_idx,
         SUM(CAST(value AS DECIMAL(18,2))) AS value_sum
  FROM events GROUP BY 1
), tr AS (
  SELECT hour_idx, value_sum,
         floor(CAST(SUM(value_sum) OVER w AS DOUBLE)
               / CAST(COUNT(*) OVER w AS DOUBLE) * 1e6 + 0.5) / 1e6 AS trend
  FROM hourly
  WINDOW w AS (ORDER BY hour_idx ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), det AS (
  SELECT hour_idx, value_sum, trend,
         CAST(floor((CAST(value_sum AS DOUBLE) - trend) * 1e6 + 0.5) / 1e6
              AS DECIMAL(28,6)) AS detr,
         hour_idx % 24 AS phase
  FROM tr
), ph AS (
  SELECT phase,
         floor(CAST(SUM(detr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS phase_mean
  FROM det GROUP BY phase
), gr AS (
  SELECT floor(CAST(SUM(CAST(phase_mean AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS grand
  FROM ph
), sea AS (
  SELECT phase, floor((phase_mean - grand) * 1e6 + 0.5) / 1e6 AS seasonal
  FROM ph, gr
)
SELECT d.hour_idx, CAST(d.value_sum AS DOUBLE) AS value, d.trend, s.seasonal,
       floor((CAST(d.value_sum AS DOUBLE) - d.trend - s.seasonal) * 1e6 + 0.5) / 1e6
         AS residual
FROM det d JOIN sea s ON d.phase = s.phase
"""

# streaming incremental CDC == one-shot batch CDC (fold associativity
# with retained tombstones) — the oracle IS the batch query's SQL
ORACLES["s_stream_cdc_apply"] = ORACLES["t_cdc_apply"]


def _kmv_fold_expr(expr: str) -> str:
    """13-hex-digit (52-bit, double-exact) fold of md5('kmv:'||expr) —
    the generic form of _KMV_FOLD for arbitrary value expressions."""
    return (
        "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 14), "
        "i -> (strpos('0123456789abcdef', "
        f"substr(md5('kmv:' || {expr}), i, 1)) - 1)::BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )


# KMV set ops — mirrors sketches.kmv_set_estimates: merged 256-min sketch
# with per-value membership, (k-1)/f_k union, rho-scaled intersection,
# portable 4dp pin; exacts computed directly.
ORACLES["a_kmv_setops"] = f"""
WITH ha AS (
  SELECT DISTINCT {_kmv_fold_expr("CAST(o_custkey AS VARCHAR)")}::DOUBLE
                  / 4503599627370496.0 AS f
  FROM orders
), hb AS (
  SELECT DISTINCT {_kmv_fold_expr("CAST(c_custkey AS VARCHAR)")}::DOUBLE
                  / 4503599627370496.0 AS f
  FROM customer
), u AS (
  SELECT f, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT f, 1 AS in_a, 0 AS in_b FROM ha
    UNION ALL
    SELECT f, 0 AS in_a, 1 AS in_b FROM hb
  ) GROUP BY f
), merged AS (
  SELECT * FROM u ORDER BY f LIMIT 256
), sk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
         floor((CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
                     ELSE 255.0 / max(f) END) * 1e4 + 0.5) / 1e4 AS est_union,
         floor((CASE WHEN count(*) < 256 THEN sum(in_a * in_b)::DOUBLE
                     ELSE (sum(in_a * in_b)::DOUBLE / count(*)::DOUBLE)
                          * (255.0 / max(f)) END) * 1e4 + 0.5) / 1e4
           AS est_intersection
  FROM merged
)
SELECT n_kept, n_both, est_union, est_intersection,
       (SELECT CAST(count(DISTINCT ck) AS BIGINT) FROM (
          SELECT o_custkey AS ck FROM orders
          UNION ALL SELECT c_custkey AS ck FROM customer)) AS exact_union,
       (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS exact_intersection
FROM sk
"""

# TF-IDF keywords — tf/df exact longs, ln pinned at 6dp after the
# multiply, (tfidf DESC, term ASC) rank, top 3 per doc.
ORACLES["text_tfidf_keywords"] = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term
), dfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY term
), n AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents
), s AS (
  SELECT tf.doc_id, tf.term,
         floor(tf.tf::DOUBLE * ln(n.n_docs::DOUBLE / dfq.df_docs::DOUBLE)
               * 1e6 + 0.5) / 1e6 AS tfidf
  FROM tf JOIN dfq USING (term), n
)
SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rk
  FROM s
) WHERE rk <= 3
"""

# synchronous LPA — replay of exactly 2 mode-of-neighbors rounds over the
# (distinct, symmetrized) LSH candidate-pair graph; community_size from
# the final labels.
ORACLES["graph_label_prop"] = f"""
WITH pairs AS ({_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
l0 AS (SELECT DISTINCT a AS id, a AS label FROM edges),
m1 AS (
  SELECT e.a, l.label, CAST(count(*) AS BIGINT) AS n
  FROM edges e JOIN l0 l ON l.id = e.b GROUP BY e.a, l.label
),
l1 AS (
  SELECT a AS id, label FROM m1
  QUALIFY row_number() OVER (PARTITION BY a ORDER BY n DESC, label ASC) = 1
),
m2 AS (
  SELECT e.a, l.label, CAST(count(*) AS BIGINT) AS n
  FROM edges e JOIN l1 l ON l.id = e.b GROUP BY e.a, l.label
),
l2 AS (
  SELECT a AS id, label FROM m2
  QUALIFY row_number() OVER (PARTITION BY a ORDER BY n DESC, label ASC) = 1
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(label AS BIGINT) AS label,
       CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS community_size
FROM l2
"""


# ts_attribution — same zero-padded ts||id||type key and RANGE frame as
# operators/windows.py touch_attribution; min/max ignore the NULL key on
# non-touch rows in both engines.
_ATTR_KEY = (
    "CASE WHEN event_type IN ('click','view') THEN "
    "lpad(CAST(ts_us AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 10, '0') || event_type END"
)

ORACLES["ts_attribution"] = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         CAST(value AS DOUBLE) AS value
  FROM events
), m AS (
  SELECT user_id, event_id, ts_us, event_type, value,
         min({_ATTR_KEY}) OVER w AS fk,
         max({_ATTR_KEY}) OVER w AS lk
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC
               RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
)
SELECT user_id,
       event_id AS conversion_id,
       ts_us AS conversion_ts,
       value AS conversion_value,
       CAST(substring(fk, 21, 10) AS BIGINT) AS first_touch_id,
       substring(fk, 31) AS first_touch_type,
       CAST(substring(lk, 21, 10) AS BIGINT) AS last_touch_id,
       substring(lk, 31) AS last_touch_type,
       ts_us - CAST(substring(lk, 1, 20) AS BIGINT) AS last_touch_gap
FROM m
WHERE event_type = 'purchase' AND fk IS NOT NULL
"""

# qa_winsorize — quantile_cont matches Spark's interpolated percentile
# (probed in a_percentiles); sums fold DECIMAL(38,6) of 6-dp values.
ORACLES["qa_winsorize"] = """
WITH e AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
), b AS (
  SELECT event_type,
         quantile_cont(v, 0.05) AS lo,
         quantile_cont(v, 0.95) AS hi
  FROM e GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       round(min(lo), 6) AS lo_bound,
       round(min(hi), 6) AS hi_bound,
       CAST(sum(CAST(round(v, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sum_raw,
       CAST(sum(CAST(round(least(greatest(v, lo), hi), 6) AS DECIMAL(38,6))) AS DOUBLE)
         AS sum_winsorized
FROM e JOIN b USING (event_type)
GROUP BY e.event_type
"""

# sim_hard_negatives — cosine band [0.2, 0.6) then per-anchor top-5.
ORACLES["sim_hard_negatives"] = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id, embedding FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, round({_COS}, 6) AS cosine
  FROM q, c WHERE q.vec_id <> c.vec_id
),
banded AS (
  SELECT * FROM scored WHERE cosine >= 0.2 AND cosine < 0.6
)
SELECT q_id, c_id, cosine,
       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
FROM banded
QUALIFY rnk <= 5
"""


# graph_bfs_levels — 3 synchronous BFS rounds unrolled as CTEs over the
# symmetrized LSH pair graph; min-level semantics via the NOT-IN guard
# against everything already leveled.
ORACLES["graph_bfs_levels"] = f"""
WITH pairs AS ({_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
l0 AS (SELECT id FROM (SELECT DISTINCT a AS id FROM edges) ORDER BY id LIMIT 5),
f1 AS (
  SELECT DISTINCT e.b AS id FROM edges e JOIN l0 ON e.a = l0.id
  WHERE e.b NOT IN (SELECT id FROM l0)
),
f2 AS (
  SELECT DISTINCT e.b AS id FROM edges e JOIN f1 ON e.a = f1.id
  WHERE e.b NOT IN (SELECT id FROM l0 UNION ALL SELECT id FROM f1)
),
f3 AS (
  SELECT DISTINCT e.b AS id FROM edges e JOIN f2 ON e.a = f2.id
  WHERE e.b NOT IN (SELECT id FROM l0 UNION ALL SELECT id FROM f1
                    UNION ALL SELECT id FROM f2)
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS level FROM l0
UNION ALL SELECT CAST(id AS BIGINT), CAST(1 AS BIGINT) FROM f1
UNION ALL SELECT CAST(id AS BIGINT), CAST(2 AS BIGINT) FROM f2
UNION ALL SELECT CAST(id AS BIGINT), CAST(3 AS BIGINT) FROM f3
"""

# qa_mad_anomaly — exact median + MAD per type, 0.6745-scaled robust z,
# flag after the same 6-dp rounding the Spark side applies.
ORACLES["qa_mad_anomaly"] = """
WITH e AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v FROM events
), med AS (
  SELECT event_type, quantile_cont(v, 0.5) AS med FROM e GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(v - med), 0.5) AS mad, min(med) AS med
  FROM e JOIN med USING (event_type) GROUP BY e.event_type
)
SELECT e.event_type, event_id, v AS value,
       round(0.6745 * (v - med) / mad, 6) AS robust_z
FROM e JOIN mad USING (event_type)
WHERE mad > 0 AND abs(round(0.6745 * (v - med) / mad, 6)) > 3.0
"""

# a_ab_ttest — md5 first-hex-digit parity arms; six exact decimal folds
# (values 3-dp DECIMAL(18,3), squares EXACT in DECIMAL(38,6)), Welch t
# derived arithmetically from the folded scalars.
ORACLES["a_ab_ttest"] = """
WITH e AS (
  SELECT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
           IN ('0','2','4','6','8','a','c','e') AS arm,
         CAST(round(CAST(value AS DOUBLE), 3) AS DECIMAL(18,3)) AS vd
  FROM events
), g AS (
  SELECT event_type,
         CAST(count(CASE WHEN arm THEN 1 END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN NOT arm THEN 1 END) AS BIGINT) AS n_b,
         sum(CASE WHEN arm THEN vd END) AS sa,
         sum(CASE WHEN NOT arm THEN vd END) AS sb,
         sum(CASE WHEN arm THEN CAST(vd * vd AS DECIMAL(38,6)) END) AS qa,
         sum(CASE WHEN NOT arm THEN CAST(vd * vd AS DECIMAL(38,6)) END) AS qb
  FROM e GROUP BY event_type
), d AS (
  SELECT event_type, n_a, n_b,
         CAST(sa AS DOUBLE) / n_a AS ma,
         CAST(sb AS DOUBLE) / n_b AS mb,
         (CAST(qa AS DOUBLE) - n_a * (CAST(sa AS DOUBLE) / n_a) * (CAST(sa AS DOUBLE) / n_a)) / (n_a - 1) AS va,
         (CAST(qb AS DOUBLE) - n_b * (CAST(sb AS DOUBLE) / n_b) * (CAST(sb AS DOUBLE) / n_b)) / (n_b - 1) AS vb
  FROM g
)
SELECT event_type, n_a, n_b,
       round(ma, 6) AS mean_a,
       round(mb, 6) AS mean_b,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND sqrt(va / n_a + vb / n_b) > 0
            THEN round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) END AS t_stat
FROM d
"""

# text_token_entropy — each -p·ln(p) term pinned 6 dp (portable floor
# rounding) before the DECIMAL(28,6) fold, like tfidf.
ORACLES["text_token_entropy"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), tot AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY doc_id
)
SELECT tf.doc_id,
       CAST(sum(CAST(floor(-((tf::DOUBLE / n::DOUBLE) * ln(tf::DOUBLE / n::DOUBLE))
                           * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))) AS DOUBLE)
         AS entropy_nats,
       CAST(count(*) AS BIGINT) AS n_distinct_tokens,
       CAST(min(n) AS BIGINT) AS n_tokens
FROM tf JOIN tot USING (doc_id)
GROUP BY tf.doc_id
"""



# qa_psi_drift — decile edges on the even-user reference split, pinned
# 6 dp before binning; PSI folded from 6-dp-rounded nonnegative terms
# as DECIMAL(28,6) (order-independent), proportions floored at 1e-4.
ORACLES["qa_psi_drift"] = """
WITH e AS (
  SELECT event_type, (user_id % 2 = 0) AS is_ref, CAST(value AS DOUBLE) AS v
  FROM events
), ed AS (
  SELECT event_type,
         quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS raw
  FROM e WHERE is_ref GROUP BY event_type
), edges AS (
  SELECT event_type,
         list_transform(raw, x -> floor(x * 1e6 + 0.5) / 1e6) AS edges
  FROM ed
), b AS (
  SELECT e.event_type, is_ref,
         len(list_filter(edges, x -> v > x)) AS bin
  FROM e JOIN edges USING (event_type)
), c AS (
  SELECT event_type, bin,
         CAST(count(CASE WHEN is_ref THEN 1 END) AS BIGINT) AS ca,
         CAST(count(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT) AS cb
  FROM b GROUP BY event_type, bin
), t AS (
  SELECT event_type, sum(ca) AS na, sum(cb) AS nb FROM c GROUP BY event_type
), p AS (
  SELECT c.event_type,
         greatest(ca / na, 1e-4) AS pa, greatest(cb / nb, 1e-4) AS pb,
         na, nb
  FROM c JOIN t USING (event_type)
), s AS (
  SELECT event_type,
         CAST(sum(CAST(round((pa - pb) * ln(pa / pb), 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS psi,
         CAST(min(na) AS BIGINT) AS n_ref,
         CAST(min(nb) AS BIGINT) AS n_cur
  FROM p GROUP BY event_type
)
SELECT event_type, psi, n_ref, n_cur, psi > 0.2 AS drifted FROM s
"""

# ts_markov_transitions — lag over the (ts, event_id) per-user total
# order; p = exact long ratio rounded 6 dp.
ORACLES["ts_markov_transitions"] = """
WITH s AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type,
         event_type AS next_type
  FROM events
), c AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type)
             AS DOUBLE), 6) AS p
FROM c
"""

# graph_jaccard_sim — part-part neighborhood Jaccard through shared
# orders on the bipartite order–part graph (order ids negated on the
# Spark side only to disambiguate; part-part rows are unaffected, so
# the oracle works in part/order space directly). A part's neighborhood
# is exactly its distinct order set, hence deg = per-part order count.
ORACLES["graph_jaccard_sim"] = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
deg AS (
  SELECT l_partkey AS id, CAST(count(*) AS BIGINT) AS deg FROM li GROUP BY 1
),
common AS (
  SELECT x.l_partkey AS na, y.l_partkey AS nb, CAST(count(*) AS BIGINT) AS common
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY x.l_partkey, y.l_partkey HAVING count(*) >= 2
)
SELECT CAST(na AS BIGINT) AS id_a, CAST(nb AS BIGINT) AS id_b, common,
       round(CAST(common AS DOUBLE) /
             CAST(da.deg + db.deg - common AS DOUBLE), 6) AS jaccard
FROM common
JOIN deg da ON da.id = na
JOIN deg db ON db.id = nb
"""

# storage_compaction_plan — the shared seeded-walk prefix sum
# (sample_pps_systematic shape): per event_type partition, running row
# totals in md5('compact:'||user_id) order; bin = exclusive-prefix
# integer division by the 512-row target.
ORACLES["storage_compaction_plan"] = """
WITH files AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS rows_
  FROM events GROUP BY event_type, user_id
), c AS (
  SELECT event_type, user_id, rows_,
         CAST(sum(rows_) OVER (
           PARTITION BY event_type
           ORDER BY md5('compact:' || CAST(user_id AS VARCHAR))
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM files
)
SELECT event_type, user_id, rows_ AS size, (cum - rows_) // 512 AS bin
FROM c
"""

# qa_benford_digits — leading digit via the first [1-9] of the value's
# string rendering (log-free, so exact powers of ten can't straddle a
# floor(log10) ulp); p_obs / p_exp pinned 6 dp BEFORE the chi-square /
# MAD terms, each term pinned and folded as DECIMAL(28,6).
ORACLES["qa_benford_digits"] = """
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]') AS INT) AS d
  FROM orders
  WHERE o_totalprice IS NOT NULL
    AND regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]') <> ''
), counts AS (
  SELECT grp, d, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
), spine AS (
  SELECT g.grp, dd.d
  FROM (SELECT DISTINCT grp FROM counts) g
  CROSS JOIN (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS d) dd
), full_ AS (
  SELECT s.grp, s.d, coalesce(c.c, 0) AS c,
         sum(coalesce(c.c, 0)) OVER (PARTITION BY s.grp) AS n
  FROM spine s LEFT JOIN counts c ON c.grp = s.grp AND c.d = s.d
), pinned AS (
  SELECT grp, d, c, n,
         floor((CAST(c AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS pobs,
         floor(log10(1.0 + 1.0 / d) * 1e6 + 0.5) / 1e6 AS pexp
  FROM full_
), terms AS (
  SELECT grp, n,
         CAST(floor((n * (pobs - pexp) * (pobs - pexp) / pexp) * 1e6 + 0.5) / 1e6
              AS DECIMAL(28,6)) AS chi_t,
         CAST(floor((abs(pobs - pexp) / 9.0) * 1e6 + 0.5) / 1e6
              AS DECIMAL(28,6)) AS mad_t
  FROM pinned
)
SELECT grp AS o_orderpriority,
       CAST(min(n) AS BIGINT) AS n,
       CAST(sum(chi_t) AS DOUBLE) AS chi2,
       CAST(sum(mad_t) AS DOUBLE) AS mad,
       CAST(sum(mad_t) AS DOUBLE) > 0.015 AS nonconforming
FROM terms GROUP BY grp
"""

# a_weighted_median — collapse to per-(group, value) decimal weight,
# one running-sum window, min value whose doubled cumulative weight
# reaches the total. All-decimal, so the crossing row is exact.
ORACLES["a_weighted_median"] = """
WITH pv AS (
  SELECT l_returnflag,
         CAST(round(CAST(l_extendedprice AS DOUBLE), 2) AS DECIMAL(18,2)) AS v,
         sum(CAST(round(CAST(l_quantity AS DOUBLE), 0) AS DECIMAL(18,3))) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM pv
)
SELECT l_returnflag,
       CAST(min(v) AS DOUBLE) AS weighted_median,
       CAST(min(tot) AS DOUBLE) AS total_weight
FROM c WHERE cum * 2 >= tot GROUP BY l_returnflag
"""

# ts_cusum_alarm — Page's recursion in closed form: decimal running sum
# minus min(0, decimal running min); baseline mean/sigma from exact
# decimal folds, every derived scalar pinned 6 dp; same +150 injected
# shift for day(ts) >= 16.
ORACLES["ts_cusum_alarm"] = """
WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(round(CAST(value AS DOUBLE)
                    + CASE WHEN day(ts) >= 16 THEN 150.0 ELSE 0.0 END, 3)
              AS DECIMAL(18,3)) AS vd
  FROM events
), b AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(vd) AS s,
         sum(CAST(vd * vd AS DECIMAL(38,6))) AS q
  FROM e GROUP BY 1 HAVING count(*) >= 2
), bs AS (
  SELECT event_type, n,
         floor((CAST(s AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS mean,
         floor(sqrt((CAST(q AS DOUBLE)
                     - n * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
                    / (n - 1)) * 1e6 + 0.5) / 1e6 AS sigma
  FROM b
), d AS (
  SELECT e.event_type, ts, event_id, CAST(vd AS DOUBLE) AS value, sigma,
         CAST(floor((CAST(vd AS DOUBLE) - mean - sigma * 0.5) * 1e6 + 0.5) / 1e6
              AS DECIMAL(18,6)) AS dpos,
         CAST(floor((mean - CAST(vd AS DOUBLE) - sigma * 0.5) * 1e6 + 0.5) / 1e6
              AS DECIMAL(18,6)) AS dneg
  FROM e JOIN bs USING (event_type) WHERE sigma > 0
), c AS (
  -- (28,6) pins: a (38,6) here would leave least()/minus no headroom
  -- and DuckDB would promote sp/sn to DOUBLE (observed float dust)
  SELECT * EXCLUDE (dpos, dneg),
         CAST(sum(dpos) OVER w AS DECIMAL(28,6)) AS cp,
         CAST(sum(dneg) OVER w AS DECIMAL(28,6)) AS cn
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s AS (
  -- min(0, running-min) via CASE: DuckDB's least() promotes decimal
  -- pairs to DOUBLE, which would poison the exact fold with float dust
  SELECT event_type, ts, event_id, value, sigma,
         cp - (CASE WHEN min(cp) OVER w < 0 THEN min(cp) OVER w
               ELSE CAST(0 AS DECIMAL(28,6)) END) AS sp,
         cn - (CASE WHEN min(cn) OVER w < 0 THEN min(cn) OVER w
               ELSE CAST(0 AS DECIMAL(28,6)) END) AS sn
  FROM c
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, ts, event_id, value,
       CAST(sp AS DOUBLE) AS cusum_pos,
       CAST(sn AS DOUBLE) AS cusum_neg
FROM s
WHERE CAST(sp AS DOUBLE) > sigma * 5.0 OR CAST(sn AS DOUBLE) > sigma * 5.0
"""

# qa_ks_test — ECDF steps are exact window counts over the per-(type,
# 3-dp value) collapse; each gap pinned 6 dp BEFORE max(); threshold
# 1.358*sqrt((na+nb)/(na*nb)) pinned the same way.
ORACLES["qa_ks_test"] = """
WITH e AS (
  SELECT event_type, day(ts) < 16 AS a,
         CAST(round(CAST(value AS DOUBLE), 3) AS DECIMAL(18,3)) AS v
  FROM events
), pv AS (
  SELECT event_type, v,
         CAST(count(CASE WHEN a THEN 1 END) AS BIGINT) AS ca,
         CAST(count(CASE WHEN NOT a THEN 1 END) AS BIGINT) AS cb
  FROM e GROUP BY 1, 2
), stepped AS (
  SELECT event_type,
         CAST(sum(ca) OVER wa AS BIGINT) AS na,
         CAST(sum(cb) OVER wa AS BIGINT) AS nb,
         floor(abs(CAST(sum(ca) OVER wr AS BIGINT) / CAST(sum(ca) OVER wa AS BIGINT)
                 - CAST(sum(cb) OVER wr AS BIGINT) / CAST(sum(cb) OVER wa AS BIGINT))
               * 1e6 + 0.5) / 1e6 AS gap
  FROM pv
  WINDOW wr AS (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY event_type)
)
SELECT event_type,
       CAST(min(na) AS BIGINT) AS n_a,
       CAST(min(nb) AS BIGINT) AS n_b,
       max(gap) AS ks_stat,
       floor(1.358 * sqrt((min(na) + min(nb)) / (min(na) * min(nb)))
             * 1e6 + 0.5) / 1e6 AS threshold,
       max(gap) > floor(1.358 * sqrt((min(na) + min(nb)) / (min(na) * min(nb)))
                        * 1e6 + 0.5) / 1e6 AS significant
FROM stepped WHERE na > 0 AND nb > 0
GROUP BY event_type
"""

# a_chi2_independence — full r×c spine (absent cells contribute their
# expected mass); margins/cells exact longs, each (o−e)²/e pinned 6 dp
# and folded DECIMAL(28,6); dow is 0=Sunday on both engines
# (Spark dayofweek−1 ↔ DuckDB dayofweek).
ORACLES["a_chi2_independence"] = """
WITH e AS (SELECT event_type AS a, dayofweek(ts) AS b FROM events),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM e GROUP BY 1, 2),
rm AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
cm AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT a) AS BIGINT) AS r,
               CAST(count(DISTINCT b) AS BIGINT) AS c FROM cells),
full_ AS (
  SELECT coalesce(cells.o, 0) AS o, rm.ra, cm.cb, tot.n, tot.r, tot.c
  FROM rm CROSS JOIN cm
  LEFT JOIN cells ON cells.a = rm.a AND cells.b = cm.b
  CROSS JOIN tot
), terms AS (
  SELECT n, r, c,
         CAST(floor(((o - ra * cb / n) * (o - ra * cb / n) / (ra * cb / n))
                    * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6)) AS t
  FROM full_
)
SELECT CAST(min(n) AS BIGINT) AS n,
       CAST((min(r) - 1) * (min(c) - 1) AS BIGINT) AS dof,
       CAST(sum(t) AS DOUBLE) AS chi2,
       floor(sqrt(CAST(sum(t) AS DOUBLE)
                  / (min(n) * least(min(r) - 1, min(c) - 1)))
             * 1e6 + 0.5) / 1e6 AS cramers_v
FROM terms
"""

# a_mannwhitney_u — doubled-rank integer folds (2·avg_rank = 2p+t+1)
# and the tie term Σ(t³−t) as DECIMAL(38,0); U and z derived in double
# from the folded integers, z pinned 6 dp.
ORACLES["a_mannwhitney_u"] = """
WITH e AS (
  SELECT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
           IN ('0','2','4','6','8','a','c','e') AS a,
         CAST(round(CAST(value AS DOUBLE), 3) AS DECIMAL(18,3)) AS v
  FROM events
), pv AS (
  SELECT event_type, v,
         CAST(count(CASE WHEN a THEN 1 END) AS BIGINT) AS ca,
         CAST(count(*) AS BIGINT) AS t
  FROM e GROUP BY 1, 2
), rk AS (
  SELECT event_type, ca, t,
         CAST(sum(t) OVER (PARTITION BY event_type ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - t AS p
  FROM pv
), g AS (
  SELECT event_type,
         CAST(sum(ca) AS BIGINT) AS n_a,
         CAST(sum(t) - sum(ca) AS BIGINT) AS n_b,
         CAST(sum(CAST(ca * (2 * p + t + 1) AS DECIMAL(38,0))) AS DOUBLE) AS r2,
         CAST(sum(CAST(t * t * t - t AS DECIMAL(38,0))) AS DOUBLE) AS tt
  FROM rk GROUP BY 1
)
SELECT event_type, n_a, n_b,
       (r2 - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0 AS u_stat,
       CASE WHEN n_a > 0 AND n_b > 0
             AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1)
                    - tt / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1))) > 0
            THEN floor(
              ((r2 - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0
               - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
              / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                     * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1)
                        - tt / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                                * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1))))
              * 1e6 + 0.5) / 1e6
       END AS z_stat
FROM g
"""

# ts_autocorrelation — hourly rollup exactly as ts_decompose's; one
# lag window per type, CASE-unpivot over generate_series(1,6), centered
# products pinned 6 dp and folded DECIMAL(38,6); full-series variance
# denominator.
ORACLES["ts_autocorrelation"] = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
         SUM(CAST(value AS DECIMAL(18,2))) AS value_sum
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
         floor(CAST(sum(value_sum) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mean
  FROM hourly GROUP BY 1
), lagged AS (
  SELECT h.event_type,
         CAST(value_sum AS DOUBLE) - mean AS d0,
         CAST(lag(value_sum, 1) OVER w AS DOUBLE) - mean AS d1,
         CAST(lag(value_sum, 2) OVER w AS DOUBLE) - mean AS d2,
         CAST(lag(value_sum, 3) OVER w AS DOUBLE) - mean AS d3,
         CAST(lag(value_sum, 4) OVER w AS DOUBLE) - mean AS d4,
         CAST(lag(value_sum, 5) OVER w AS DOUBLE) - mean AS d5,
         CAST(lag(value_sum, 6) OVER w AS DOUBLE) - mean AS d6
  FROM hourly h JOIN m USING (event_type)
  WINDOW w AS (PARTITION BY h.event_type ORDER BY hour_idx)
), pairs AS (
  SELECT event_type, lag_, d0,
         CASE lag_ WHEN 1 THEN d1 WHEN 2 THEN d2 WHEN 3 THEN d3
                   WHEN 4 THEN d4 WHEN 5 THEN d5 WHEN 6 THEN d6 END AS dk
  FROM lagged
  CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS lag_)
), num AS (
  SELECT event_type, lag_,
         sum(CAST(floor(d0 * dk * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6))) AS num,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs WHERE dk IS NOT NULL GROUP BY 1, 2
), den AS (
  SELECT event_type,
         sum(CAST(floor(d0 * d0 * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6))) AS den
  FROM lagged GROUP BY 1 HAVING den > 0
)
SELECT event_type, CAST(lag_ AS INT) AS lag,
       floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6 AS acf,
       n_pairs
FROM num JOIN den USING (event_type)
"""

# a_gini — doubled-rank decimal folds over the per-(class, value)
# collapse: rs = Σ v·t·(2p+t+1) = 2·Σi·x, G = rs/(n·Σx) − (n+1)/n
# pinned 6 dp; groups with negatives or zero total dropped.
ORACLES["a_gini"] = """
WITH pv AS (
  SELECT o_orderpriority,
         CAST(round(CAST(o_totalprice AS DOUBLE), 2) AS DECIMAL(18,2)) AS v,
         CAST(count(*) AS BIGINT) AS t
  FROM orders GROUP BY 1, 2
), rk AS (
  SELECT o_orderpriority, v, t,
         CAST(sum(t) OVER (PARTITION BY o_orderpriority ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - t AS p
  FROM pv
), g AS (
  SELECT o_orderpriority,
         CAST(sum(t) AS BIGINT) AS n,
         sum(CAST(v * t AS DECIMAL(38,2))) AS tot,
         sum(CAST(v * (t * (2 * p + t + 1)) AS DECIMAL(38,2))) AS rs,
         min(v) AS minv
  FROM rk GROUP BY 1
)
SELECT o_orderpriority, n,
       CAST(tot AS DOUBLE) AS total,
       floor((CAST(rs AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
              - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS gini
FROM g WHERE minv >= 0 AND tot > 0
"""

# text_zipf_fit — same tokenizer macro; rank ties break on the term
# string; x/y pinned 6 dp, centered products folded DECIMAL(38,6),
# slope/intercept/r² derived from the folded scalars and pinned.
ORACLES["text_zipf_fit"] = f"""
WITH counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest({_TOKS}) AS term FROM documents) GROUP BY 1
), head AS (
  SELECT term, c FROM counts ORDER BY c DESC, term ASC LIMIT 1000
), xy AS (
  SELECT floor(ln(CAST(row_number() OVER (ORDER BY c DESC, term ASC) AS DOUBLE))
               * 1e6 + 0.5) / 1e6 AS x,
         floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS y
  FROM head
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         floor(CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)
               * 1e6 + 0.5) / 1e6 AS mx,
         floor(CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / count(*)
               * 1e6 + 0.5) / 1e6 AS my
  FROM xy
), folds AS (
  SELECT min(n) AS n_terms,
         CAST(sum(CAST(floor((x - mx) * (y - my) * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(floor((x - mx) * (x - mx) * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(floor((y - my) * (y - my) * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS syy,
         min(mx) AS mx, min(my) AS my
  FROM xy CROSS JOIN m
)
SELECT CAST(n_terms AS BIGINT) AS n_terms,
       floor(sxy / sxx * 1e6 + 0.5) / 1e6 AS slope,
       floor((my - sxy / sxx * mx) * 1e6 + 0.5) / 1e6 AS intercept,
       floor(sxy * sxy / (sxx * syy) * 1e6 + 0.5) / 1e6 AS r2
FROM folds WHERE sxx > 0
"""

# a_wilson_ci — z² is WRITTEN as 1.96*1.96 (not a 3.8416 literal) so
# both engines square the same double; closed form mirrored op-by-op.
ORACLES["a_wilson_ci"] = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(count(CASE WHEN CAST(value AS DOUBLE) > 50.0 THEN 1 END)
              AS BIGINT) AS successes
  FROM events GROUP BY 1
)
SELECT event_type, n, successes,
  floor((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS rate,
  floor((
    (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
     + (1.96 * 1.96) / (2 * CAST(n AS DOUBLE)))
    / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
    - 1.96 * sqrt(CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
                  * (1 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + (1.96 * 1.96)
                    / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
  ) * 1e6 + 0.5) / 1e6 AS ci_lo,
  floor((
    (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
     + (1.96 * 1.96) / (2 * CAST(n AS DOUBLE)))
    / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
    + 1.96 * sqrt(CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
                  * (1 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + (1.96 * 1.96)
                    / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
  ) * 1e6 + 0.5) / 1e6 AS ci_hi
FROM g WHERE n > 0
"""

# ts_kaplan_meier — product-limit as exp of an exact decimal running
# sum of 6-dp-pinned ln(1 − d/n) terms; exhausted risk sets pin
# survival to exactly 0 via a running-max flag, never ln(0).
ORACLES["ts_kaplan_meier"] = """
WITH per_ep AS (
  SELECT user_id, event_type,
         min(epoch_us(ts) // 86400000000) AS first_day,
         max(epoch_us(ts) // 86400000000) AS last_day
  FROM events GROUP BY 1, 2
), subj AS (
  SELECT CASE WHEN first_day < 19727 THEN 'early' ELSE 'late' END AS cohort,
         CAST(last_day - first_day AS BIGINT) AS t,
         last_day < 19748 AS o
  FROM per_ep
), per_t AS (
  SELECT cohort, t,
         CAST(count(CASE WHEN o THEN 1 END) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS all_
  FROM subj GROUP BY 1, 2
), risked AS (
  SELECT cohort, t, d,
         CAST(sum(all_) OVER (PARTITION BY cohort) AS BIGINT)
           - (CAST(sum(all_) OVER wr AS BIGINT) - all_) AS n
  FROM per_t
  WINDOW wr AS (PARTITION BY cohort ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), curved AS (
  SELECT cohort, t, d, n,
         sum(CASE WHEN d < n
             THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
                             * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))
             ELSE CAST(0.0 AS DECIMAL(28,6)) END) OVER wr AS lnsum,
         max(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER wr AS exhausted
  FROM risked
  WINDOW wr AS (PARTITION BY cohort ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT cohort, t AS duration, n AS n_at_risk, d AS n_events,
       CASE WHEN exhausted = 1 THEN 0.0
            ELSE floor(exp(CAST(lnsum AS DOUBLE)) * 1e6 + 0.5) / 1e6
       END AS survival
FROM curved WHERE d > 0
"""

# j_band_join — the oracle states the SEMANTICS as a plain inequality
# join (DuckDB's optimizer can do that at gate scale); the Spark side
# is the bucketized-blocking rewrite whose output must be identical.
ORACLES["j_band_join"] = """
WITH l AS (
  SELECT c_custkey,
         CAST(round(CAST(c_acctbal AS DOUBLE) * 100, 0) AS BIGINT) AS lv
  FROM customer
), r AS (
  SELECT s_suppkey,
         CAST(round(CAST(s_acctbal AS DOUBLE) * 100, 0) AS BIGINT) AS rv
  FROM supplier
)
SELECT CAST(l.c_custkey AS BIGINT) AS c_custkey,
       CAST(r.s_suppkey AS BIGINT) AS s_suppkey,
       lv AS l_cents, rv AS r_cents, lv - rv AS diff_cents
FROM l JOIN r ON abs(lv - rv) <= 5000
"""

# a_theil_index — decimal totals, broadcast means, per-row
# (x/μ)ln(x/μ) terms pinned 6 dp into DECIMAL(38,6) folds, every
# derived scalar pinned; positive rows only.
ORACLES["a_theil_index"] = """
WITH pos AS (
  SELECT o_orderpriority AS g,
         CAST(round(CAST(o_totalprice AS DOUBLE), 2) AS DECIMAL(18,2)) AS v
  FROM orders
  WHERE CAST(round(CAST(o_totalprice AS DOUBLE), 2) AS DECIMAL(18,2)) > 0
), grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(v AS DECIMAL(38,2))) AS tot
  FROM pos GROUP BY 1
), grand AS (SELECT sum(tot) AS gtot, sum(n) AS gn FROM grp),
gm AS (
  SELECT g, n, tot,
         floor(CAST(tot AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS mu,
         floor(CAST(gtot AS DOUBLE) / gn * 1e6 + 0.5) / 1e6 AS gmu,
         floor(CAST(tot AS DOUBLE) / CAST(gtot AS DOUBLE) * 1e6 + 0.5) / 1e6 AS share
  FROM grp CROSS JOIN grand
), within AS (
  SELECT pos.g,
         sum(CAST(floor((CAST(v AS DOUBLE) / mu) * ln(CAST(v AS DOUBLE) / mu)
                        * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6))) AS tsum
  FROM pos JOIN gm ON pos.g = gm.g GROUP BY 1
)
SELECT gm.g AS o_orderpriority, n, CAST(tot AS DOUBLE) AS total, share,
       floor(CAST(tsum AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS theil_within,
       floor(share * (floor(ln(mu / gmu) * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6
         AS between_term
FROM gm JOIN within ON gm.g = within.g
"""

# o_pareto_skyline — min-y collapse per (group, x) with the smallest
# realizing id, then the strict-prefix RANGE running min; survivors
# sit strictly below every y at strictly smaller x.
ORACLES["o_pareto_skyline"] = """
WITH base AS (
  SELECT o_orderpriority AS g,
         CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS x,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS y,
         CAST(o_orderkey AS BIGINT) AS id
  FROM orders
), per_x AS (
  SELECT g, x, min(y) AS y FROM base GROUP BY 1, 2
), with_id AS (
  SELECT p.g, p.x, p.y, min(b.id) AS id
  FROM per_x p JOIN base b ON b.g = p.g AND b.x = p.x AND b.y = p.y
  GROUP BY 1, 2, 3
), sky AS (
  SELECT g, x, y, id,
         min(y) OVER (PARTITION BY g ORDER BY x
                      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM with_id
)
SELECT g AS o_orderpriority, x AS price_cents, y AS order_day,
       id AS o_orderkey
FROM sky WHERE pm IS NULL OR y < pm
"""

# j_grid_join_2d — semantics as a plain 2-D distance inequality join;
# the Spark side is the 3×3 grid-blocking rewrite whose output must be
# identical. Same Knuth hash, all-integer distance test.
ORACLES["j_grid_join_2d"] = """
WITH l AS (
  SELECT c_custkey,
         CAST(round(CAST(c_acctbal AS DOUBLE) * 100, 0) AS BIGINT) AS x,
         ((c_custkey * 2654435761) % 1000000 + 1000000) % 1000000 AS y
  FROM customer
), r AS (
  SELECT s_suppkey,
         CAST(round(CAST(s_acctbal AS DOUBLE) * 100, 0) AS BIGINT) AS x,
         ((s_suppkey * 2654435761) % 1000000 + 1000000) % 1000000 AS y
  FROM supplier
)
SELECT CAST(l.c_custkey AS BIGINT) AS c_custkey,
       CAST(r.s_suppkey AS BIGINT) AS s_suppkey,
       CAST((l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) AS BIGINT)
         AS dist2
FROM l JOIN r
  ON (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y)
     <= 2500000000
"""

# qa_table_fingerprint — identical canonical row string, md5 bucket /
# 60-bit signature split, xor + mod-Mersenne sum signatures.
ORACLES["qa_table_fingerprint"] = """
WITH rowstr AS (
  SELECT concat_ws('|',
    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
    CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
    CAST(CAST(round(CAST(l_quantity AS DOUBLE) * 100, 0) AS BIGINT) AS VARCHAR),
    CAST(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100, 0) AS BIGINT) AS VARCHAR),
    CAST(CAST(round(CAST(l_discount AS DOUBLE) * 100, 0) AS BIGINT) AS VARCHAR),
    CAST(CAST(round(CAST(l_tax AS DOUBLE) * 100, 0) AS BIGINT) AS VARCHAR),
    l_returnflag, l_linestatus,
    CAST(CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS VARCHAR)
  ) AS s
  FROM lineitem
), h AS (
  SELECT CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) % 32 AS bucket,
         CAST(('0x' || substr(md5(s), 9, 15)) AS BIGINT) AS sig
  FROM rowstr
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(sig) AS BIGINT) AS xor_sig,
       CAST(sum(CAST(sig AS HUGEINT)) % 2305843009213693951 AS BIGINT)
         AS sum_sig
FROM h GROUP BY 1
"""

# a_info_gain_split — $1000 bins, cumulative window, entropy terms
# pinned 6 dp in the identical parse shape, argmax by (gain DESC,
# threshold ASC) LIMIT 1.
ORACLES["a_info_gain_split"] = """
WITH f AS (
  SELECT CAST(floor(CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0)
                         AS BIGINT) / 100000) AS BIGINT) AS b,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), bins AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM f GROUP BY 1
), cum AS (
  SELECT b,
         CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS nl,
         CAST(sum(pos) OVER (ORDER BY b) AS BIGINT) AS pl
  FROM bins
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS pt
  FROM bins
), cand AS (
  SELECT b, nl, pl, nt, pt, nt - nl AS nr, pt - pl AS pr
  FROM cum CROSS JOIN tot WHERE nl < nt
), ent AS (
  SELECT b, nl, pl, nr, pr, nt,
    (CASE WHEN pt = 0 THEN 0.0 ELSE floor(-((CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)) * ln(CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))) * 1e6 + 0.5) / 1e6 END
   + CASE WHEN nt - pt = 0 THEN 0.0 ELSE floor(-((CAST(nt - pt AS DOUBLE) / CAST(nt AS DOUBLE)) * ln(CAST(nt - pt AS DOUBLE) / CAST(nt AS DOUBLE))) * 1e6 + 0.5) / 1e6 END) AS h_root,
    (CASE WHEN pl = 0 THEN 0.0 ELSE floor(-((CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)) * ln(CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))) * 1e6 + 0.5) / 1e6 END
   + CASE WHEN nl - pl = 0 THEN 0.0 ELSE floor(-((CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE)) * ln(CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE))) * 1e6 + 0.5) / 1e6 END) AS h_l,
    (CASE WHEN pr = 0 THEN 0.0 ELSE floor(-((CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE)) * ln(CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))) * 1e6 + 0.5) / 1e6 END
   + CASE WHEN nr - pr = 0 THEN 0.0 ELSE floor(-((CAST(nr - pr AS DOUBLE) / CAST(nr AS DOUBLE)) * ln(CAST(nr - pr AS DOUBLE) / CAST(nr AS DOUBLE))) * 1e6 + 0.5) / 1e6 END) AS h_r
  FROM cand
), scored AS (
  SELECT CAST((b + 1) * 100000 - 1 AS BIGINT) AS threshold,
         nl AS n_left, pl AS pos_left, nr AS n_right, pr AS pos_right,
         floor(h_l * 1e6 + 0.5) / 1e6 AS entropy_left,
         floor(h_r * 1e6 + 0.5) / 1e6 AS entropy_right,
         floor((h_root
                - floor((CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE)) * h_l * 1e6 + 0.5) / 1e6
                - floor((CAST(nr AS DOUBLE) / CAST(nt AS DOUBLE)) * h_r * 1e6 + 0.5) / 1e6)
               * 1e6 + 0.5) / 1e6 AS gain
  FROM ent
)
SELECT * FROM scored ORDER BY gain DESC, threshold ASC LIMIT 1
"""

# text_pmi_bigrams — identical tokenization (_TOKS), adjacent pairs
# via 1-based list indexing, one mirrored PMI parse shape pinned 6 dp.
ORACLES["text_pmi_bigrams"] = f"""
WITH t AS (
  SELECT {_TOKS} AS w FROM documents
), uni AS (
  SELECT u.x AS wd, CAST(count(*) AS BIGINT) AS c1
  FROM t, UNNEST(w) AS u(x) GROUP BY 1
), big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2, CAST(count(*) AS BIGINT) AS pair_n
  FROM t, UNNEST(range(1, len(w))) AS g(i)
  WHERE len(w) >= 2
  GROUP BY 1, 2
  HAVING count(*) >= 3
), nu AS (
  SELECT CAST(sum(c1) AS BIGINT) AS nu FROM uni
), nb AS (
  SELECT CAST(sum(len(w) - 1) AS BIGINT) AS nb FROM t WHERE len(w) >= 2
)
SELECT b.w1, b.w2, b.pair_n,
       floor(ln(((CAST(b.pair_n AS DOUBLE) * CAST(nu.nu AS DOUBLE))
                 * CAST(nu.nu AS DOUBLE))
                / ((CAST(nb.nb AS DOUBLE) * CAST(ca.c1 AS DOUBLE))
                   * CAST(cb.c1 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS pmi
FROM big b
JOIN uni ca ON b.w1 = ca.wd
JOIN uni cb ON b.w2 = cb.wd
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi DESC, b.w1 ASC, b.w2 ASC LIMIT 50
"""


# graph_sssp_bounded — 3 unrolled Bellman-Ford relaxations over the
# same minhash pair graph, weight = 1 + (id_a + id_b) % 5; round r is
# exactly "min cost over paths of <= r edges".
ORACLES["graph_sssp_bounded"] = f"""
WITH pairs AS ({_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b, 1 + ((id_a + id_b) % 5) AS w FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b, 1 + ((id_a + id_b) % 5) AS w FROM pairs
),
d0 AS (SELECT id, CAST(0 AS BIGINT) AS dist
       FROM (SELECT DISTINCT a AS id FROM edges) ORDER BY id LIMIT 5),
d1 AS (SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
         SELECT id, dist FROM d0
         UNION ALL
         SELECT e.b AS id, d0.dist + e.w AS dist
         FROM edges e JOIN d0 ON e.a = d0.id) GROUP BY id),
d2 AS (SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
         SELECT id, dist FROM d1
         UNION ALL
         SELECT e.b AS id, d1.dist + e.w AS dist
         FROM edges e JOIN d1 ON e.a = d1.id) GROUP BY id),
d3 AS (SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
         SELECT id, dist FROM d2
         UNION ALL
         SELECT e.b AS id, d2.dist + e.w AS dist
         FROM edges e JOIN d2 ON e.a = d2.id) GROUP BY id)
SELECT CAST(id AS BIGINT) AS doc_id, dist FROM d3
"""

# ts_ewma — identical 8-lag dyadic-weight form; every 2^-j literal is
# exact in double on both engines, sums mirrored left-assoc, final
# quotient pinned 6 dp.
ORACLES["ts_ewma"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS x
  FROM events
), l AS (
  SELECT user_id, event_id, x,
         lag(x, 1) OVER w AS x1,
         lag(x, 2) OVER w AS x2,
         lag(x, 3) OVER w AS x3,
         lag(x, 4) OVER w AS x4,
         lag(x, 5) OVER w AS x5,
         lag(x, 6) OVER w AS x6,
         lag(x, 7) OVER w AS x7
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(x AS BIGINT) AS value_cents,
       floor((
         (CASE WHEN x IS NOT NULL THEN CAST(x AS DOUBLE) * 1.0 ELSE 0.0 END
          + CASE WHEN x1 IS NOT NULL THEN CAST(x1 AS DOUBLE) * 0.5 ELSE 0.0 END
          + CASE WHEN x2 IS NOT NULL THEN CAST(x2 AS DOUBLE) * 0.25 ELSE 0.0 END
          + CASE WHEN x3 IS NOT NULL THEN CAST(x3 AS DOUBLE) * 0.125 ELSE 0.0 END
          + CASE WHEN x4 IS NOT NULL THEN CAST(x4 AS DOUBLE) * 0.0625 ELSE 0.0 END
          + CASE WHEN x5 IS NOT NULL THEN CAST(x5 AS DOUBLE) * 0.03125 ELSE 0.0 END
          + CASE WHEN x6 IS NOT NULL THEN CAST(x6 AS DOUBLE) * 0.015625 ELSE 0.0 END
          + CASE WHEN x7 IS NOT NULL THEN CAST(x7 AS DOUBLE) * 0.0078125 ELSE 0.0 END)
         /
         (CASE WHEN x IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END
          + CASE WHEN x1 IS NOT NULL THEN CAST(0.5 AS DOUBLE) ELSE 0.0 END
          + CASE WHEN x2 IS NOT NULL THEN CAST(0.25 AS DOUBLE) ELSE 0.0 END
          + CASE WHEN x3 IS NOT NULL THEN CAST(0.125 AS DOUBLE) ELSE 0.0 END
          + CASE WHEN x4 IS NOT NULL THEN CAST(0.0625 AS DOUBLE) ELSE 0.0 END
          + CASE WHEN x5 IS NOT NULL THEN CAST(0.03125 AS DOUBLE) ELSE 0.0 END
          + CASE WHEN x6 IS NOT NULL THEN CAST(0.015625 AS DOUBLE) ELSE 0.0 END
          + CASE WHEN x7 IS NOT NULL THEN CAST(0.0078125 AS DOUBLE) ELSE 0.0 END)
       ) * 1e6 + 0.5) / 1e6 AS ewma
FROM l
"""

# a_cohens_kappa — identical lang_id CASE chain as text_lang_id; kappa
# arithmetic mirrored: chance products pinned 6 dp into DECIMAL(38,6)
# folds, p_o / p_e / kappa pinned.
ORACLES["a_cohens_kappa"] = f"""
WITH base0 AS (
  SELECT lang, text, {_TOKS} AS toks FROM documents
), hits AS (
  SELECT lang, text,
         len(list_filter(toks, t -> list_contains({_STOP_DE}, t))) AS de,
         len(list_filter(toks, t -> list_contains({_STOP_FR}, t))) AS fr,
         len(list_filter(toks, t -> list_contains({_STOP_ES}, t))) AS es
  FROM base0
), base AS (
  SELECT lang AS a,
       CASE
         WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
         WHEN regexp_matches(text, '[äöüßÄÖÜ]') OR (de > fr AND de > es AND de > 0) THEN 'de'
         WHEN fr > es AND fr > 0 THEN 'fr'
         WHEN es > 0 THEN 'es'
         ELSE 'en'
       END AS b
  FROM hits
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
  FROM base
), ma AS (
  SELECT a AS k, CAST(count(*) AS BIGINT) AS na FROM base GROUP BY 1
), mb AS (
  SELECT b AS k, CAST(count(*) AS BIGINT) AS nb FROM base GROUP BY 1
), pe0 AS (
  SELECT CAST(sum(CAST(
           floor(CAST(na * nb AS DOUBLE) / CAST(n * n AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS DECIMAL(38,6))) AS DOUBLE) AS pe_raw
  FROM ma JOIN mb USING (k) CROSS JOIN tot
), s AS (
  SELECT n,
         floor(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS po,
         floor(pe_raw * 1e6 + 0.5) / 1e6 AS pe
  FROM tot CROSS JOIN pe0
)
SELECT n AS n_items, po AS p_observed, pe AS p_expected,
       floor((po - pe) / (1.0 - pe) * 1e6 + 0.5) / 1e6 AS kappa
FROM s
"""

# a_apportion_seats — all-integer Hamilton quotas; leftovers by
# (remainder DESC, key ASC) row_number.
ORACLES["a_apportion_seats"] = """
WITH g AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM g
), q AS (
  SELECT c_nationkey, n,
         CAST(1000 * n // nt AS BIGINT) AS base_seats,
         CAST((1000 * n) % nt AS BIGINT) AS rem
  FROM g CROSS JOIN tot
), r AS (
  SELECT c_nationkey, n, base_seats, rem,
         row_number() OVER (ORDER BY rem DESC, c_nationkey ASC) AS rk,
         1000 - sum(base_seats) OVER () AS leftover
  FROM q
)
SELECT c_nationkey, n, base_seats,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra_seat,
       CAST(base_seats + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS seats
FROM r
"""

# dedup_ppjoin — the oracle is the brute-force pairwise DEFINITION the
# prefix-filter theorem guarantees the Spark rewrite matches; same
# pinned Jaccard and >= 0.8 cut. Token universe = distinct word
# TRIGRAM shingles (docs with < 3 words emit none and drop out), same
# as the Spark side's ngram=3 — see the gate docstring for why words
# alone are degenerate on this corpus.
_TRISET = (
    f"list_distinct(list_transform(range(1, len({_TOKS}) - 1), "
    f"i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2])))"
)
ORACLES["dedup_ppjoin"] = f"""
WITH d0 AS (
  SELECT doc_id, {_TRISET} AS s FROM documents
), dd AS (
  SELECT doc_id, s, CAST(len(s) AS BIGINT) AS n FROM d0 WHERE len(s) > 0
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
         a.n AS n_a, b.n AS n_b
  FROM dd a JOIN dd b ON a.doc_id < b.doc_id
), j AS (
  SELECT doc_a, doc_b, n_inter, n_a, n_b,
         floor(CAST(n_inter AS DOUBLE)
               / CAST(n_a + n_b - n_inter AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS jaccard
  FROM p
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       n_inter, n_a, n_b, jaccard
FROM j WHERE jaccard >= 0.8
"""

# ts_sliding_distinct — (day,user) dedup, 7-way fanout, semi-join to
# observed days, count distinct per day.
ORACLES["ts_sliding_distinct"] = """
WITH ud AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events
), days AS (
  SELECT DISTINCT d FROM ud
), x AS (
  SELECT ud.d + g.j AS day, ud.user_id
  FROM ud, UNNEST(range(0, 7)) AS g(j)
)
SELECT CAST(x.day AS BIGINT) AS day,
       CAST(count(DISTINCT x.user_id) AS BIGINT) AS n_distinct
FROM x JOIN days ON days.d = x.day
GROUP BY 1
"""

# ts_interval_coalesce — same running-max-end gaps-and-islands with
# (start, event_id) ordering; nested intervals never reopen.
ORACLES["ts_interval_coalesce"] = """
WITH b AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts)
           + greatest(CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT),
                      0) * 1000 AS e2
  FROM events
), m AS (
  SELECT user_id, event_id, s, e2,
         max(e2) OVER (PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pe
  FROM b
), isl AS (
  SELECT user_id, s, e2,
         sum(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM m
), g AS (
  SELECT user_id, isl, min(s) AS lo, max(e2) AS hi, count(*) AS nn
  FROM isl GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(nn) AS BIGINT) AS n_raw,
       CAST(count(*) AS BIGINT) AS n_merged,
       CAST(sum(hi - lo) AS BIGINT) AS covered
FROM g GROUP BY 1
"""

# storage_rebalance_plan — Hamilton targets in key order, aligned
# surplus/deficit cumulative segments, overlaps are the moves.
ORACLES["storage_rebalance_plan"] = """
WITH loads AS (
  SELECT event_type AS k, CAST(count(*) AS BIGINT) AS ld
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(sum(ld) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n
  FROM loads
), tt AS (
  SELECT k, ld,
         t // n + CASE WHEN row_number() OVER (ORDER BY k) <= t % n
                       THEN 1 ELSE 0 END AS target
  FROM loads CROSS JOIN tot
), dl AS (
  SELECT k, ld - target AS delta FROM tt
), sur AS (
  SELECT k AS from_shard,
         sum(delta) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - delta AS slo,
         sum(delta) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS shi
  FROM dl WHERE delta > 0
), dfc AS (
  SELECT k AS to_shard,
         sum(-delta) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) + delta AS dlo,
         sum(-delta) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS dhi
  FROM dl WHERE delta < 0
)
SELECT from_shard, to_shard,
       CAST(least(shi, dhi) - greatest(slo, dlo) AS BIGINT) AS qty
FROM sur JOIN dfc ON slo < dhi AND dlo < shi
WHERE least(shi, dhi) - greatest(slo, dlo) > 0
"""

# storage_zorder_boxes — morton expression generated by the SAME
# _morton_sql builder the Spark side uses (only integer division
# spelling differs: DIV vs //); fixed-width ranges, per-file boxes.
ORACLES["storage_zorder_boxes"] = """
WITH c AS (
  SELECT CAST(round(CAST(c_acctbal AS DOUBLE) * 100, 0) AS BIGINT) AS cents,
         CAST(c_nationkey AS BIGINT) AS nk
  FROM customer
), m AS (
  SELECT ((((((cents + 99999) * 65536 // 1100000) >> 0) & 1) << 0) | ((((nk * 2621) >> 0) & 1) << 1) | (((((cents + 99999) * 65536 // 1100000) >> 1) & 1) << 2) | ((((nk * 2621) >> 1) & 1) << 3) | (((((cents + 99999) * 65536 // 1100000) >> 2) & 1) << 4) | ((((nk * 2621) >> 2) & 1) << 5) | (((((cents + 99999) * 65536 // 1100000) >> 3) & 1) << 6) | ((((nk * 2621) >> 3) & 1) << 7) | (((((cents + 99999) * 65536 // 1100000) >> 4) & 1) << 8) | ((((nk * 2621) >> 4) & 1) << 9) | (((((cents + 99999) * 65536 // 1100000) >> 5) & 1) << 10) | ((((nk * 2621) >> 5) & 1) << 11) | (((((cents + 99999) * 65536 // 1100000) >> 6) & 1) << 12) | ((((nk * 2621) >> 6) & 1) << 13) | (((((cents + 99999) * 65536 // 1100000) >> 7) & 1) << 14) | ((((nk * 2621) >> 7) & 1) << 15) | (((((cents + 99999) * 65536 // 1100000) >> 8) & 1) << 16) | ((((nk * 2621) >> 8) & 1) << 17) | (((((cents + 99999) * 65536 // 1100000) >> 9) & 1) << 18) | ((((nk * 2621) >> 9) & 1) << 19) | (((((cents + 99999) * 65536 // 1100000) >> 10) & 1) << 20) | ((((nk * 2621) >> 10) & 1) << 21) | (((((cents + 99999) * 65536 // 1100000) >> 11) & 1) << 22) | ((((nk * 2621) >> 11) & 1) << 23) | (((((cents + 99999) * 65536 // 1100000) >> 12) & 1) << 24) | ((((nk * 2621) >> 12) & 1) << 25) | (((((cents + 99999) * 65536 // 1100000) >> 13) & 1) << 26) | ((((nk * 2621) >> 13) & 1) << 27) | (((((cents + 99999) * 65536 // 1100000) >> 14) & 1) << 28) | ((((nk * 2621) >> 14) & 1) << 29) | (((((cents + 99999) * 65536 // 1100000) >> 15) & 1) << 30) | ((((nk * 2621) >> 15) & 1) << 31)) >> 27 AS file_id,
         (cents + 99999) * 65536 // 1100000 AS x, nk * 2621 AS y
  FROM c
)
SELECT CAST(file_id AS BIGINT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
FROM m GROUP BY 1
"""

ORACLES["q9_product_profit"] = """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY n_name, o_year
"""

# a_roc_auc — tie-averaged rank AUC with exact integer numerator and
# denominator; only the quotient is pinned.
ORACLES["a_roc_auc"] = """
WITH b AS (
  SELECT o_orderpriority AS g,
         CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), ps AS (
  SELECT g, s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
  FROM b GROUP BY 1, 2
), st AS (
  SELECT g, c, p,
         CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS bb
  FROM ps
), ag AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS n_pos,
         CAST(sum(p * (2 * bb + c + 1)) AS BIGINT) AS r2
  FROM st GROUP BY 1
)
SELECT g AS o_orderpriority, n, n_pos,
       CAST(n - n_pos AS BIGINT) AS n_neg,
       CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
         floor(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
               / CAST(2 * n_pos * (n - n_pos) AS DOUBLE) * 1e6 + 0.5) / 1e6
       END AS auc
FROM ag
"""

# ts_period_over_period — calendar self-joins on exact yyyymm codes;
# absent periods stay NULL.
ORACLES["ts_period_over_period"] = """
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS month,
         CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
), b AS (
  SELECT month, rev,
         CASE WHEN month % 100 = 1 THEN month - 100 + 11
              ELSE month - 1 END AS pm,
         month - 100 AS py
  FROM m
)
SELECT b.month, b.rev,
       CASE WHEN mm.rev IS NOT NULL AND mm.rev != 0 THEN
         floor(CAST(b.rev - mm.rev AS DOUBLE) / CAST(mm.rev AS DOUBLE)
               * 1e6 + 0.5) / 1e6 END AS mom_pct,
       CASE WHEN yy.rev IS NOT NULL AND yy.rev != 0 THEN
         floor(CAST(b.rev - yy.rev AS DOUBLE) / CAST(yy.rev AS DOUBLE)
               * 1e6 + 0.5) / 1e6 END AS yoy_pct
FROM b
LEFT JOIN m mm ON mm.month = b.pm
LEFT JOIN m yy ON yy.month = b.py
"""

# dedup_cdc_chunks — same md5-of-trailing-8 boundary rule (hex-bucket
# arithmetic = conv vs 0x-cast), 1-based substr on both engines.
ORACLES["dedup_cdc_chunks"] = """
WITH d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS ln FROM documents
), st AS (
  SELECT doc_id, text, ln,
         list_concat([CAST(1 AS BIGINT)],
           CASE WHEN ln >= 9 THEN
             list_filter(range(2, ln - 6),
               i -> CAST(('0x' || substr(md5(substr(text,
                          CAST(i AS INTEGER), 8)), 1, 8)) AS BIGINT)
                    % 64 = 0)
           ELSE [] END) AS starts
  FROM d
), pos AS (
  SELECT doc_id, text, ln, CAST(g.j AS BIGINT) AS chunk_idx,
         CAST(starts[CAST(g.j AS INTEGER)] AS BIGINT) AS start
  FROM st, UNNEST(range(1, CAST(len(starts) AS BIGINT) + 1)) AS g(j)
), ch AS (
  SELECT doc_id, text, chunk_idx, start,
         coalesce(lead(start) OVER (PARTITION BY doc_id ORDER BY chunk_idx),
                  ln + 1) - start AS length
  FROM pos
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, chunk_idx, start,
       CAST(length AS BIGINT) AS length,
       md5(substr(text, CAST(start AS INTEGER), CAST(length AS INTEGER)))
         AS chunk_md5
FROM ch
"""

# a_pareto_8020 — integer crossing test 10·(cum−own) < 8·total; only
# the selected head's share is pinned.
ORACLES["a_pareto_8020"] = """
WITH ent AS (
  SELECT o_orderpriority AS g, o_custkey AS e,
         CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS val
  FROM orders GROUP BY 1, 2
), st AS (
  SELECT g, val,
         CAST(sum(val) OVER (PARTITION BY g ORDER BY val DESC, e ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(sum(val) OVER (PARTITION BY g) AS BIGINT) AS tot
  FROM ent
), nn AS (
  SELECT g, val, cum, tot,
         CASE WHEN 10 * (cum - val) < 8 * tot THEN 1 ELSE 0 END AS needed
  FROM st
)
SELECT g AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(needed) AS BIGINT) AS n_vital,
       CAST(sum(CASE WHEN needed = 1 THEN val END) AS BIGINT) AS vital_cents,
       CAST(min(tot) AS BIGINT) AS total_cents,
       floor(CAST(sum(CASE WHEN needed = 1 THEN val END) AS DOUBLE)
             / CAST(min(tot) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS vital_share
FROM nn GROUP BY 1
"""

# a_mutual_information — arithmetic dow (epoch_day+4)%7 on both
# engines; per-cell terms pinned into DECIMAL(38,6) folds.
ORACLES["a_mutual_information"] = """
WITH j AS (
  SELECT event_type AS a,
         CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS cab
  FROM events GROUP BY 1, 2
), ma AS (
  SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM j GROUP BY 1
), mb AS (
  SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM j GROUP BY 1
), tot AS (
  SELECT CAST(sum(cab) AS BIGINT) AS n FROM j
), t AS (
  SELECT n,
         CAST(floor((CAST(cab AS DOUBLE) / CAST(n AS DOUBLE))
              * ln((CAST(cab AS DOUBLE) * CAST(n AS DOUBLE))
                   / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)))
              * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6)) AS term
  FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
)
SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(term) AS DOUBLE) AS mi_nats
FROM t GROUP BY 1
"""

# text_bigram_lm — identical tokenization, Laplace bigram model from
# exact counts, per-bigram −ln p pinned into decimal folds per doc.
ORACLES["text_bigram_lm"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), p AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM t, UNNEST(range(1, len(w))) AS g(i)
  WHERE len(w) >= 2
), model AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM p GROUP BY 1, 2
), marg AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM model GROUP BY 1
), v AS (
  SELECT CAST(count(DISTINCT u.x) AS BIGINT) AS vv
  FROM t, UNNEST(w) AS u(x)
), s AS (
  SELECT p.doc_id,
         CAST(floor(-ln((CAST(c12 AS DOUBLE) + 1.0)
                        / (CAST(c1 AS DOUBLE) + CAST(vv AS DOUBLE)))
                    * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6)) AS nll
  FROM p JOIN model USING (w1, w2) JOIN marg USING (w1) CROSS JOIN v
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(CAST(sum(nll) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS xent_nats
FROM s GROUP BY 1
"""

# q17_small_quantity — correlated scalar subquery rewritten as a
# grouped aggregate joined back; integer threshold 5·q·n < Σq.
ORACLES["q17_small_quantity"] = """
WITH branded AS (
  SELECT l_partkey,
         CAST(round(CAST(l_quantity AS DOUBLE) * 100, 0) AS BIGINT) AS q,
         CAST(round(CAST(l_extendedprice AS DOUBLE) * 100, 0) AS BIGINT)
           AS ep
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#12'
), a AS (
  SELECT l_partkey AS pk, CAST(sum(q) AS BIGINT) AS qsum,
         CAST(count(*) AS BIGINT) AS n
  FROM branded GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_small,
       CAST(coalesce(sum(ep), 0) AS BIGINT) AS lost_revenue_cents
FROM branded JOIN a ON l_partkey = pk
WHERE 5 * q * n < qsum
"""

# text_nb_classifier — same Laplace model from exact counts, per-token
# ln terms pinned into decimal folds, argmax (score DESC, class ASC).
ORACLES["text_nb_classifier"] = f"""
WITH t0 AS (
  SELECT doc_id, lang, {_TOKS} AS w FROM documents
), toks AS (
  SELECT doc_id, lang, u.x AS w FROM t0, UNNEST(w) AS u(x)
), classes AS (
  SELECT lang AS cls, CAST(count(*) AS BIGINT) AS dc FROM documents
  GROUP BY 1
), nd AS (
  SELECT CAST(sum(dc) AS BIGINT) AS nd FROM classes
), wc AS (
  SELECT lang AS cls, w, CAST(count(*) AS BIGINT) AS cwc FROM toks
  GROUP BY 1, 2
), ct AS (
  SELECT cls, CAST(sum(cwc) AS BIGINT) AS ctok FROM wc GROUP BY 1
), v AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS vv FROM toks
), cl AS (
  SELECT c.cls,
         floor(ln(CAST(c.dc AS DOUBLE) / CAST(nd.nd AS DOUBLE))
               * 1e6 + 0.5) / 1e6 AS lprior,
         ct.ctok + v.vv AS den
  FROM classes c JOIN ct ON c.cls = ct.cls CROSS JOIN v CROSS JOIN nd
), scored AS (
  SELECT tk.doc_id, tk.lang AS lbl, c.cls,
         sum(CAST(floor(ln((CAST(coalesce(s.cwc, 0) AS DOUBLE) + 1.0)
                           / CAST(c.den AS DOUBLE)) * 1e6 + 0.5) / 1e6
                  AS DECIMAL(38,6))) AS sll
  FROM toks tk CROSS JOIN cl c
  LEFT JOIN wc s ON s.cls = c.cls AND s.w = tk.w
  GROUP BY 1, 2, 3
), fin AS (
  SELECT s.doc_id, s.lbl, s.cls,
         CAST(sll AS DOUBLE) + c2.lprior AS score
  FROM scored s JOIN cl c2 ON s.cls = c2.cls
), ranked AS (
  SELECT doc_id, lbl, cls,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cls ASC) AS rn
  FROM fin
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lbl AS label, cls AS pred,
       cls = lbl AS correct
FROM ranked WHERE rn = 1
"""

# o_rank_overlap_rbo — dyadic weights via integer shift (immune to
# libm pow ulp); agreement at depth k from the max-rank cumulative.
ORACLES["o_rank_overlap_rbo"] = """
WITH rev AS (
  SELECT l_partkey,
         row_number() OVER (ORDER BY v DESC, l_partkey ASC) AS rank
  FROM (SELECT l_partkey,
               CAST(sum(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100, 0)
                             AS BIGINT)) AS BIGINT) AS v
        FROM lineitem GROUP BY 1)
  QUALIFY rank <= 20
), qty AS (
  SELECT l_partkey,
         row_number() OVER (ORDER BY v DESC, l_partkey ASC) AS rank
  FROM (SELECT l_partkey,
               CAST(sum(CAST(round(CAST(l_quantity AS DOUBLE) * 100, 0)
                             AS BIGINT)) AS BIGINT) AS v
        FROM lineitem GROUP BY 1)
  QUALIFY rank <= 20
), m AS (
  SELECT greatest(rev.rank, qty.rank) AS mm
  FROM rev JOIN qty USING (l_partkey)
), pm AS (
  SELECT mm, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1
), spine AS (
  SELECT CAST(g.k AS BIGINT) AS k FROM UNNEST(range(1, 21)) AS g(k)
), ov AS (
  SELECT k, CAST(coalesce(sum(c), 0) AS BIGINT) AS x_k
  FROM spine LEFT JOIN pm ON pm.mm <= spine.k GROUP BY 1
), tm AS (
  SELECT CAST(floor(CAST(x_k AS DOUBLE) / CAST(k AS DOUBLE)
              * (1.0 / CAST(CAST(1 AS BIGINT) << CAST(k - 1 AS INTEGER)
                            AS DOUBLE))
              * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6)) AS t
  FROM ov
)
SELECT CAST(20 AS BIGINT) AS depth,
       floor(CAST(sum(t) AS DOUBLE) * 0.5 * 1e6 + 0.5) / 1e6 AS rbo
FROM tm
"""

# qa_monotonic_violations — simulated arrival jitter (ts + (cents mod
# 7000)·1000 µs), lag over event_id order, integer regressions.
ORACLES["qa_monotonic_violations"] = """
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(ts)
           + ((CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT)
               % 7000 + 7000) % 7000) * 1000 AS arr
  FROM events
), l AS (
  SELECT user_id, arr,
         lag(arr) OVER (PARTITION BY user_id ORDER BY event_id) AS parr
  FROM e
), r AS (
  SELECT user_id,
         CASE WHEN parr IS NOT NULL AND arr < parr THEN parr - arr
              ELSE 0 END AS reg
  FROM l
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(max(reg) AS BIGINT) AS max_regression
FROM r GROUP BY 1
"""

# a_lift_gains — integer tie-safe decile bucketing, capture/lift pinned
# only at the end.
ORACLES["a_lift_gains"] = """
WITH b AS (
  SELECT o_orderpriority AS g,
         CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), ps AS (
  SELECT g, s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
  FROM b GROUP BY 1, 2
), st AS (
  SELECT g, c, p,
         CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY s DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS bb,
         CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS t,
         CAST(sum(p) OVER (PARTITION BY g) AS BIGINT) AS pt
  FROM ps
), pb AS (
  SELECT g, 10 * bb // t + 1 AS bk,
         CAST(sum(c) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS np,
         CAST(min(t) AS BIGINT) AS tt, CAST(min(pt) AS BIGINT) AS ppt
  FROM st GROUP BY 1, 2
)
SELECT g AS o_orderpriority, CAST(bk AS BIGINT) AS bucket, n, np AS n_pos,
       floor(CAST(sum(np) OVER (PARTITION BY g ORDER BY bk
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(ppt AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cum_capture,
       floor(CAST(np * tt AS DOUBLE) / CAST(n * ppt AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS lift
FROM pb
"""

# sample_ipw_totals — same md5-bucket membership, exact rational
# inverse weights, estimate pinned only at the final division.
ORACLES["sample_ipw_totals"] = """
WITH e AS (
  SELECT event_type AS stratum,
         CASE event_type WHEN 'click' THEN 2500 WHEN 'view' THEN 5000 ELSE 10000 END AS num,
         CASE WHEN list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 7), i -> (strpos('0123456789abcdef', substr(substr(md5('ipw:' || CAST(event_id AS VARCHAR)), 1, 6), i, 1)) - 1)::BIGINT)), (a, b) -> a * 16 + b) % 10000 < (CASE event_type WHEN 'click' THEN 2500 WHEN 'view' THEN 5000 ELSE 10000 END)
              THEN 1 ELSE 0 END AS k
  FROM events
)
SELECT stratum,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(k) AS BIGINT) AS n_kept,
       CAST(min(num) AS BIGINT) AS keep_num,
       CAST(10000 AS BIGINT) AS keep_den,
       floor(CAST(sum(k) * 10000 AS DOUBLE) / CAST(min(num) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS est_total,
       floor(CAST(sum(k) * 10000 AS DOUBLE) / CAST(min(num) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 - CAST(count(*) AS DOUBLE) AS est_error
FROM e GROUP BY 1
"""

# setop_bag_ops — native bag semantics on both engines.
ORACLES["setop_bag_ops"] = """
SELECT 'intersect_all' AS op, CAST(nationkey AS BIGINT) AS nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'except_all' AS op, CAST(nationkey AS BIGINT) AS nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier
)
"""

# a_sketch_quantile — bottom-64-by-md5 sample, lower medians, all
# integer columns.
ORACLES["a_sketch_quantile"] = """
WITH base AS (
  SELECT event_type AS g, event_id AS id,
         CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS v,
         md5('q:' || CAST(event_id AS VARCHAR)) AS h
  FROM events
), ex AS (
  SELECT g, n, v AS exact_median FROM (
    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS rv,
           CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
    FROM base) WHERE rv = (n + 1) // 2
), sm AS (
  SELECT g, id, v FROM (
    SELECT g, id, v,
           row_number() OVER (PARTITION BY g ORDER BY h, id) AS rh
    FROM base) WHERE rh <= 64
), es AS (
  SELECT g, sn AS sample_n, v AS est_median FROM (
    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS rv,
           CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS sn
    FROM sm) WHERE rv = (sn + 1) // 2
)
SELECT ex.g AS event_type, CAST(n AS BIGINT) AS n,
       CAST(sample_n AS BIGINT) AS sample_n,
       exact_median, est_median,
       CAST(abs(est_median - exact_median) AS BIGINT) AS abs_err
FROM ex JOIN es ON ex.g = es.g
"""

# ---------------------------------------------------------------------------
# Round-7 oracles
# ---------------------------------------------------------------------------

# q13_customer_distribution — LEFT OUTER + NULL-safe count, then the
# histogram of counts (zero-order customers land in c_count = 0).
ORACLES["q13_customer_distribution"] = """
WITH pc AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM pc GROUP BY 1
"""

# q21_exclusive_fault — double-correlated EXISTS / NOT EXISTS on the
# same fact, the definitional form of the Spark semi+anti rewrite.
ORACLES["q21_exclusive_fault"] = """
WITH osp AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), f AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
  WHERE l_returnflag = 'R'
), cand AS (
  SELECT f.l_orderkey, f.l_suppkey FROM f
  WHERE EXISTS (SELECT 1 FROM osp o
                WHERE o.l_orderkey = f.l_orderkey
                  AND o.l_suppkey <> f.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM f f2
                    WHERE f2.l_orderkey = f.l_orderkey
                      AND f2.l_suppkey <> f.l_suppkey)
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM cand JOIN supplier s ON s.s_suppkey = cand.l_suppkey
GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 20
"""

# a_spearman_rho — doubled midranks (2r + t − 1, exact integers under
# ties), five DECIMAL(38,0) moment folds, only the quotient pinned.
ORACLES["a_spearman_rho"] = """
WITH rows_ AS (
  SELECT l_returnflag AS g,
         CAST(round(CAST(l_quantity AS DOUBLE), 3) AS DECIMAL(18,3)) AS x,
         CAST(round(CAST(l_extendedprice AS DOUBLE), 3) AS DECIMAL(18,3)) AS y
  FROM lineitem
), d AS (
  SELECT g,
    2 * rank() OVER (PARTITION BY g ORDER BY x)
      + count(*) OVER (PARTITION BY g, x) - 1 AS dx,
    2 * rank() OVER (PARTITION BY g ORDER BY y)
      + count(*) OVER (PARTITION BY g, y) - 1 AS dy
  FROM rows_
), s AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(dx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
    CAST(sum(CAST(dy AS DECIMAL(38,0))) AS DOUBLE) AS sy,
    CAST(sum(CAST(dx * dx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
    CAST(sum(CAST(dy * dy AS DECIMAL(38,0))) AS DOUBLE) AS syy,
    CAST(sum(CAST(dx * dy AS DECIMAL(38,0))) AS DOUBLE) AS sxy
  FROM d GROUP BY g
)
SELECT g AS l_returnflag, n,
  CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
        AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
    THEN floor((CAST(n AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n AS DOUBLE) * syy - sy * sy))
               * 1e6 + 0.5) / 1e6
  END AS rho
FROM s
"""

# a_hits_scores — 2 HITS rounds unrolled; every per-node sum is a
# decimal fold of 6-dp-pinned scores, each normalizer one scalar.
ORACLES["a_hits_scores"] = """
WITH e AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                  CAST(l_partkey AS BIGINT) AS dst
  FROM lineitem
), a1r AS (
  SELECT dst, sum(CAST(1.0 AS DECIMAL(18,6))) AS a FROM e GROUP BY 1
), a1s AS (SELECT sum(a) AS s FROM a1r),
a1 AS (
  SELECT dst, floor(CAST(a AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 AS a
  FROM a1r, a1s
), h1r AS (
  SELECT src, sum(CAST(a AS DECIMAL(18,6))) AS h
  FROM e JOIN a1 USING (dst) GROUP BY 1
), h1s AS (SELECT sum(h) AS s FROM h1r),
h1 AS (
  SELECT src, floor(CAST(h AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 AS h
  FROM h1r, h1s
), a2r AS (
  SELECT dst, sum(CAST(h AS DECIMAL(18,6))) AS a
  FROM e JOIN h1 USING (src) GROUP BY 1
), a2s AS (SELECT sum(a) AS s FROM a2r),
a2 AS (
  SELECT dst, floor(CAST(a AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 AS a
  FROM a2r, a2s
), h2r AS (
  SELECT src, sum(CAST(a AS DECIMAL(18,6))) AS h
  FROM e JOIN a2 USING (dst) GROUP BY 1
), h2s AS (SELECT sum(h) AS s FROM h2r),
h2 AS (
  SELECT src, floor(CAST(h AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 AS h
  FROM h2r, h2s
), both_ AS (
  SELECT 'hub' AS kind, src AS node_id, h AS score FROM h2
  UNION ALL
  SELECT 'authority' AS kind, dst AS node_id, a AS score FROM a2
)
SELECT kind, node_id, score FROM (
  SELECT kind, node_id, score,
         row_number() OVER (PARTITION BY kind
                            ORDER BY score DESC, node_id ASC) AS r
  FROM both_
) WHERE r <= 10
"""

# text_ngram_coverage — exact integer running sums over the top-25
# head; the only float is the final coverage quotient.
ORACLES["text_ngram_coverage"] = f"""
WITH terms AS (
  SELECT unnest({_TOKS}) AS term FROM documents
), counts AS (
  SELECT term, count(*) AS c FROM terms GROUP BY 1
), total AS (
  SELECT sum(CAST(c AS DECIMAL(38,0))) AS t FROM counts
), head AS (
  SELECT term, c FROM counts ORDER BY c DESC, term ASC LIMIT 25
), ranked AS (
  SELECT row_number() OVER (ORDER BY c DESC, term ASC) AS r,
         sum(CAST(c AS DECIMAL(38,0)))
           OVER (ORDER BY c DESC, term ASC ROWS UNBOUNDED PRECEDING) AS cum
  FROM head
), per AS (
  SELECT r, cum, cutoff
  FROM ranked, UNNEST([5, 10, 25]) AS u(cutoff)
  WHERE r <= cutoff
)
SELECT CAST(cutoff AS BIGINT) AS cutoff,
       CAST(max(r) AS BIGINT) AS n_terms,
       floor(CAST(max(cum) AS DOUBLE) / CAST((SELECT t FROM total) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS coverage
FROM per GROUP BY 1
"""


def _holt_oracle() -> str:
    """ts_holt_linear — generated so the dyadic weight literals are BY
    CONSTRUCTION identical to the Spark expression (both derive from
    windows.holt_weights' Fraction arithmetic); the num/den sums mirror
    the Spark left-assoc order exactly."""
    from ..operators.windows import holt_weights

    ws = holt_weights(8)
    num_terms = []
    den_terms = []
    for j, w in enumerate(ws):
        xj = "CAST(cents AS DOUBLE)" if j == 0 else (
            f"CAST(lag(cents, {j}) OVER w AS DOUBLE)"
        )
        pres = "TRUE" if j == 0 else f"lag(cents, {j}) OVER w IS NOT NULL"
        # CAST the weight to DOUBLE explicitly: a bare numeric literal is
        # DECIMAL in DuckDB, and double/DECIMAL division detours through
        # a decimal path that loses the last ulp — enough to flip the
        # 6-dp pin when the quotient sits on a half boundary (observed
        # on the sf0.01 fixture)
        num_terms.append(
            f"(CASE WHEN {pres} THEN {xj} * CAST({w!r} AS DOUBLE) "
            f"ELSE 0.0 END)"
        )
        den_terms.append(
            f"(CASE WHEN {pres} THEN CAST({w!r} AS DOUBLE) ELSE 0.0 END)"
        )
    num = "(" + " + ".join(num_terms) + ")"
    den = "(" + " + ".join(den_terms) + ")"
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, cents,
       floor({num} / {den} * 1e6 + 0.5) / 1e6 AS holt_next
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
"""


ORACLES["ts_holt_linear"] = _holt_oracle()

# dedup_containment — brute-force pairwise DEFINITION of asymmetric
# containment on the same trigram-shingle universe as dedup_ppjoin.
ORACLES["dedup_containment"] = f"""
WITH d0 AS (
  SELECT doc_id, {_TRISET} AS s FROM documents
), dd AS (
  SELECT doc_id, s, CAST(len(s) AS BIGINT) AS n FROM d0 WHERE len(s) > 0
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
         a.n AS n_a, b.n AS n_b
  FROM dd a JOIN dd b ON a.doc_id <> b.doc_id
), j AS (
  SELECT doc_a, doc_b, n_inter, n_a, n_b,
         floor(CAST(n_inter AS DOUBLE) / CAST(n_a AS DOUBLE) * 1e6 + 0.5)
           / 1e6 AS containment
  FROM p
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       n_inter, n_a, n_b, containment
FROM j WHERE containment >= 0.9
"""

# sim_mips_topk — the SAME lifted-space arithmetic, list ops mirrored
# (list_dot_product == the Spark sequential fold, proven by the sim
# family); M² is the max corpus norm², lift = sqrt(M² − ‖x‖²).
ORACLES["sim_mips_topk"] = """
WITH m AS (
  SELECT max(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
    AS m2
  FROM embeddings
), c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_vec,
         list_concat(
           embedding::DOUBLE[],
           [sqrt(m.m2 - list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[]))]
         ) AS c_aug
  FROM embeddings, m
), q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec,
         list_concat(embedding::DOUBLE[], [CAST(0.0 AS DOUBLE)]) AS q_aug
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.q_id, c.c_id,
         round(list_dot_product(q.q_aug, c.c_aug)
               / (sqrt(list_dot_product(q.q_aug, q.q_aug))
                  * sqrt(list_dot_product(c.c_aug, c.c_aug))), 6)
           AS lifted_cosine,
         round(list_dot_product(q.q_vec, c.c_vec), 6) AS inner_product
  FROM q, c WHERE q.q_id <> c.c_id
)
SELECT q_id, c_id, lifted_cosine, inner_product,
       row_number() OVER (PARTITION BY q_id
                          ORDER BY lifted_cosine DESC, c_id ASC) AS rnk
FROM scored
QUALIFY rnk <= 5
"""


def _bootstrap_oracle(b: int = 32, salt: str = "boot") -> str:
    """a_bootstrap_ci — generated so the integer Poisson(1) thresholds
    and the per-replicate md5 salts are BY CONSTRUCTION identical to
    sampling.poisson_bootstrap_ci; 2·b mirrored agg expressions, then
    the same 2nd / (m−1)th order-statistic pick."""
    from ..operators.sampling import poisson_cdf24

    ts = poisson_cdf24()
    hexts = [format(t, "06x") for t in ts]
    aggs = []
    means = []
    for i in range(b):
        grp, chunk = divmod(i, 5)
        # fixed-width lowercase hex compares lexicographically as the
        # integer it encodes — same string-compare form as the Spark side
        u = (
            f"substr(md5('{salt}:g{grp}:' || "
            f"CAST(event_id AS VARCHAR)), {1 + 6 * chunk}, 6)"
        )
        w = f"{len(ts)}"
        for k in range(len(ts) - 1, -1, -1):
            w = f"CASE WHEN {u} < '{hexts[k]}' THEN {k} ELSE {w} END"
        aggs.append(
            f"sum(CAST(({w}) * x AS DECIMAL(38,0))) AS s{i},\n"
            f"  sum(CAST(({w}) AS BIGINT)) AS c{i}"
        )
        means.append(
            f"('b{i}', CASE WHEN c{i} > 0 THEN floor(CAST(s{i} AS DOUBLE)"
            f" / CAST(c{i} AS DOUBLE) * 1e6 + 0.5) / 1e6 END)"
        )
    agg_sql = ",\n  ".join(aggs)
    vals = ",\n    ".join(means)
    return f"""
WITH base AS (
  SELECT event_type AS g, event_id,
         CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS x
  FROM events
), folded AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS DECIMAL(38,0))) AS sx,
  {agg_sql}
  FROM base GROUP BY g
), melted AS (
  SELECT g, n,
         floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS mean,
         u.rep, u.rep_mean
  FROM folded, LATERAL (
    SELECT * FROM (VALUES
    {vals}
    ) AS t(rep, rep_mean)
  ) AS u
  WHERE u.rep_mean IS NOT NULL
), ranked AS (
  SELECT g, n, mean, rep_mean,
         row_number() OVER (PARTITION BY g ORDER BY rep_mean ASC, rep ASC)
           AS r,
         count(*) OVER (PARTITION BY g) AS m
  FROM melted
)
SELECT lo.g AS event_type, lo.n, lo.mean,
       lo.rep_mean AS boot_lo, hi.rep_mean AS boot_hi
FROM ranked lo JOIN ranked hi ON lo.g = hi.g
WHERE lo.r = 2 AND hi.r = hi.m - 1
"""


ORACLES["a_bootstrap_ci"] = _bootstrap_oracle()

# q20_dominant_supplier — the definitional nested form: EXISTS over a
# grouped-threshold subquery, integer cross-multiplied share test.
ORACLES["q20_dominant_supplier"] = """
WITH wli AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(round(CAST(l.l_quantity AS DOUBLE) * 100, 0) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%widget%'
    AND l.l_shipdate >= DATE '1996-01-01'
    AND l.l_shipdate <  DATE '1999-01-01'
), cell AS (
  SELECT l_partkey, l_suppkey, sum(q) AS cq
  FROM wli GROUP BY 1, 2
), tot AS (
  SELECT l_partkey, sum(q) AS tq FROM wli GROUP BY 1
)
SELECT s.s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM cell c JOIN tot t ON c.l_partkey = t.l_partkey
  WHERE c.l_suppkey = s.s_suppkey AND 10 * c.cq > 3 * t.tq
)
ORDER BY s.s_name
"""

# a_ols2_price_model — mirrored two-pass centered-moment OLS; every
# pin, fold type and the Cramer solve match aggregates.ols_two_features
# operation for operation.
ORACLES["a_ols2_price_model"] = """
WITH rows_ AS (
  SELECT l_returnflag AS g,
         CAST(round(CAST(l_quantity AS DOUBLE), 3) AS DECIMAL(18,3)) AS x1,
         CAST(round(CAST(l_discount AS DOUBLE), 3) AS DECIMAL(18,3)) AS x2,
         CAST(round(CAST(l_extendedprice AS DOUBLE), 3) AS DECIMAL(18,3)) AS y
  FROM lineitem
), m AS (
  SELECT g, x1, x2, y,
    floor(CAST(sum(CAST(x1 AS DECIMAL(38,3))) OVER w AS DOUBLE)
          / CAST(count(*) OVER w AS DOUBLE) * 1e6 + 0.5) / 1e6 AS m1,
    floor(CAST(sum(CAST(x2 AS DECIMAL(38,3))) OVER w AS DOUBLE)
          / CAST(count(*) OVER w AS DOUBLE) * 1e6 + 0.5) / 1e6 AS m2,
    floor(CAST(sum(CAST(y AS DECIMAL(38,3))) OVER w AS DOUBLE)
          / CAST(count(*) OVER w AS DOUBLE) * 1e6 + 0.5) / 1e6 AS my
  FROM rows_
  WINDOW w AS (PARTITION BY g)
), c AS (
  SELECT g, m1, m2, my,
         CAST(x1 AS DOUBLE) - m1 AS d1,
         CAST(x2 AS DOUBLE) - m2 AS d2,
         CAST(y AS DOUBLE) - my AS dy
  FROM m
), f AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         min(m1) AS m1, min(m2) AS m2, min(my) AS my,
         CAST(sum(CAST(floor(d1 * d1 * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS a11,
         CAST(sum(CAST(floor(d2 * d2 * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS a22,
         CAST(sum(CAST(floor(d1 * d2 * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS a12,
         CAST(sum(CAST(floor(d1 * dy * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS c1,
         CAST(sum(CAST(floor(d2 * dy * 1e6 + 0.5) / 1e6
                       AS DECIMAL(38,6))) AS DOUBLE) AS c2
  FROM c GROUP BY g
), s AS (
  SELECT *, a11 * a22 - a12 * a12 AS det FROM f
), t AS (
  SELECT *,
         (c1 * a22 - c2 * a12) / det AS b1r,
         (c2 * a11 - c1 * a12) / det AS b2r
  FROM s
)
SELECT g AS l_returnflag, n,
  CASE WHEN det > 0 THEN
    floor((my - (floor(b1r * 1e6 + 0.5) / 1e6) * m1
              - (floor(b2r * 1e6 + 0.5) / 1e6) * m2) * 1e6 + 0.5) / 1e6
  END AS beta0,
  CASE WHEN det > 0 THEN floor(b1r * 1e6 + 0.5) / 1e6 END AS beta1,
  CASE WHEN det > 0 THEN floor(b2r * 1e6 + 0.5) / 1e6 END AS beta2
FROM t
"""

# ts_top_paths — same session cut as ts_sessionize's oracle (a new
# session starts only when the gap STRICTLY exceeds 1h, matching
# windows.sessionize's `> gap` semantics; an exactly-one-hour gap stays
# in-session), then lead()x2 trigram paths.
ORACLES["ts_top_paths"] = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), marked AS (
  SELECT *,
         CASE WHEN ts_us - lag(ts_us) OVER w > 3600000000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT *,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked
), tri AS (
  SELECT event_type || '>' || lead(event_type, 1) OVER w
                    || '>' || lead(event_type, 2) OVER w AS path,
         lead(event_type, 2) OVER w IS NOT NULL AS full_
  FROM sess
  WINDOW w AS (PARTITION BY user_id, session_idx ORDER BY ts_us, event_id)
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM tri WHERE full_
GROUP BY path ORDER BY n DESC, path ASC LIMIT 20
"""

# ---------------------------------------------------------------------------
# Round-10 ingest gates. The pHash / audio / crawl oracles pin literal rows
# (the multimodal_resize_fingerprint precedent: payloads are synthesized
# in-plan from ids alone and every operator in the chain is deterministic
# pure numpy/stdlib — verified identical at sf0.001 and sf0.01); the
# WebDataset oracle REGENERATES the gate's input in SQL, a genuinely
# independent twin of the pack->unpack identity.
# ---------------------------------------------------------------------------

_PHASH_PAIR_ROWS = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(5 AS BIGINT), CAST(0 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(7 AS BIGINT), CAST(0 AS BIGINT))
) AS t(id_a, id_b, hamming)
"""

# the found pairs: (0,1) subsampling re-encode ham 2, (0,2) +1 brightness
# ham 2, (4,5)/(6,7) restart-marker re-encodes ham 0; the (0,3) lattice-
# noise candidate (ham 4) is generated by the banded join and FILTERED,
# and the cross-family pairs (~25-32 bits) never even collide on a band.
ORACLES["multimodal_phash_pairs"] = _PHASH_PAIR_ROWS

# batch-split equivalence: the incremental index over ANY split must find
# exactly the one-shot pairs — the oracle is the SAME literal rows.
ORACLES["s_stream_phash_index"] = _PHASH_PAIR_ROWS

ORACLES["multimodal_audio_fingerprint"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(8000 AS BIGINT), CAST(1 AS BIGINT), CAST(16 AS BIGINT), CAST(4000 AS BIGINT), CAST(500000 AS BIGINT), CAST(353544 AS BIGINT), CAST(500000 AS BIGINT), CAST(437500 AS BIGINT), CAST(440000 AS BIGINT), CAST(0 AS BIGINT), TRUE),
  (CAST(1 AS BIGINT), CAST(16000 AS BIGINT), CAST(1 AS BIGINT), CAST(16 AS BIGINT), CAST(4000 AS BIGINT), CAST(250000 AS BIGINT), CAST(176768 AS BIGINT), CAST(250000 AS BIGINT), CAST(1000000 AS BIGINT), CAST(1000000 AS BIGINT), CAST(0 AS BIGINT), TRUE),
  (CAST(2 AS BIGINT), CAST(8000 AS BIGINT), CAST(2 AS BIGINT), CAST(16 AS BIGINT), CAST(2400 AS BIGINT), CAST(300000 AS BIGINT), CAST(223598 AS BIGINT), CAST(399994 AS BIGINT), CAST(601563 AS BIGINT), CAST(600000 AS BIGINT), CAST(0 AS BIGINT), TRUE),
  (CAST(3 AS BIGINT), CAST(4000 AS BIGINT), CAST(1 AS BIGINT), CAST(8 AS BIGINT), CAST(2000 AS BIGINT), CAST(500000 AS BIGINT), CAST(630416 AS BIGINT), CAST(890625 AS BIGINT), CAST(199219 AS BIGINT), CAST(200015 AS BIGINT), CAST(0 AS BIGINT), TRUE),
  (CAST(4 AS BIGINT), CAST(8000 AS BIGINT), CAST(1 AS BIGINT), CAST(32 AS BIGINT), CAST(2400 AS BIGINT), CAST(300000 AS BIGINT), CAST(494975 AS BIGINT), CAST(700000 AS BIGINT), CAST(328125 AS BIGINT), CAST(330000 AS BIGINT), CAST(0 AS BIGINT), TRUE),
  (CAST(5 AS BIGINT), CAST(22050 AS BIGINT), CAST(2 AS BIGINT), CAST(16 AS BIGINT), CAST(32 AS BIGINT), CAST(1451 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE),
  (CAST(6 AS BIGINT), CAST(44100 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(1149 AS BIGINT), CAST(26063 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE),
  (CAST(7 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE)
) AS t(media_id, sample_rate, channels, bits, n_frames, duration_us, rms_ppm, peak_ppm, dominant_mhz, centroid_mhz, flatness_ppm, decoded)
"""

# closed-form pins: RMS of an amp-0.5 sine = 0.5/sqrt(2) -> 353544 ppm
# (int16-quantized); dominant bin at 8 kHz / 1024-pt rfft = 7.8125 Hz
# steps -> 437.5 Hz for the 440 Hz tone; a sine's spectral flatness
# rounds to 0 ppm. Rows 5/6/7 pin the header-only and non-audio paths.

ORACLES["crawl_fingerprint"] = """
SELECT * FROM (VALUES
  (CAST(848188907037144256 AS BIGINT), 'http://site-a.example/utf8', 'f0e5e822ffdf03a40cc2e77614c5b499', 'en', CAST(1000000 AS BIGINT)),
  (CAST(3648792395323294965 AS BIGINT), 'http://site-b.example/cp1252', 'a6d6d406e4d67d8937b7e2350783ec95', 'en', CAST(1000000 AS BIGINT)),
  (CAST(3991669309340562403 AS BIGINT), 'http://site-b.example/latin1', '506c657bae426037edbd354a837eee8f', 'en', CAST(800000 AS BIGINT)),
  (CAST(-4124666547714091060 AS BIGINT), 'http://site-b.example/de', '17f9715aa8eb993d7ec95a927c017a3c', 'de', CAST(800000 AS BIGINT))
) AS t(doc_id, source_uri, text_md5, lang, quality_ppm)
"""

# absences are the point: the warcinfo record, the 404, the image/png
# response, and the truncated tail record must produce NO rows.

ORACLES["webdataset_roundtrip"] = """
SELECT printf('k%04d', i) AS sample_key,
       'jpg' AS ext,
       md5(printf('img-payload-%04d', i)) AS part_md5,
       CAST(length(printf('img-payload-%04d', i)) AS BIGINT) AS n_bytes
FROM range(12) t(i)
UNION ALL
SELECT printf('k%04d', i),
       'txt',
       md5(printf('caption %04d text', i)),
       CAST(length(printf('caption %04d text', i)) AS BIGINT)
FROM range(12) t(i)
"""

# Round 11 (round-10 verdict "prefer the SQL twin where expressible"):
# this oracle now RECOMPUTES everything — re-parses the two bodies with
# the crawl_robots_rules machinery (group selection included), compiles
# each RFC 9309 pattern to an anchored regex ('*' -> '.*', trailing '$'
# kept, metachars escaped), and picks the verdict by longest-pattern-
# wins with Allow beating Disallow on ties; unmatched/no-rule URLs
# default TRUE. Literal rows are gone.
ORACLES["crawl_robots_verdicts"] = r"""
WITH bodies(host, body) AS (VALUES
  ('site-a.example',
   'User-agent: trainbot' || chr(10) || 'Disallow: /private' || chr(10) ||
   'Allow: /private/public' || chr(10) || 'Disallow: /*.pdf$' || chr(10) ||
   'Disallow: /tmp*' || chr(10) || 'Allow: /tmp*/keep' || chr(10) ||
   'Disallow: /x' || chr(10) || 'Allow: /x' || chr(10) || '' || chr(10) ||
   'User-agent: *' || chr(10) || 'Disallow: /' || chr(10)),
  ('site-b.example',
   'User-agent: *' || chr(10) || 'Disallow: /' || chr(10) ||
   'Allow: /pub' || chr(10) || 'Disallow:' || chr(10))
), lines AS (
  SELECT host,
         unnest(string_split(body, chr(10))) AS raw,
         unnest(range(len(string_split(body, chr(10))))) AS ln
  FROM bodies
), cleaned AS (
  SELECT host, ln, trim(regexp_replace(raw, '#.*$', '')) AS clean FROM lines
), parsed AS (
  SELECT host, ln,
         lower(trim(regexp_extract(clean, '^([^:]*):', 1))) AS field,
         trim(regexp_extract(clean, '^[^:]*:(.*)$', 1)) AS value
  FROM cleaned
  WHERE contains(clean, ':')
), fr AS (
  SELECT * FROM parsed WHERE field IN ('user-agent', 'allow', 'disallow')
), marked AS (
  SELECT host, ln, field, value,
         (field = 'user-agent') AS is_ua,
         coalesce(
           lag(field = 'user-agent') OVER (PARTITION BY host ORDER BY ln),
           FALSE
         ) AS prev_ua
  FROM fr
), blocks AS (
  SELECT host, ln, field, value, is_ua,
         sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY ln) AS block,
         max(CASE WHEN is_ua AND lower(value) = 'trainbot' THEN 1 ELSE 0 END)
           OVER (PARTITION BY host) AS has_token
  FROM marked
), agents AS (
  SELECT DISTINCT host, block, lower(value) AS agent
  FROM blocks WHERE is_ua AND value <> ''
), rules AS (
  SELECT r.host, r.value AS pattern, (r.field = 'allow') AS allowed
  FROM (SELECT * FROM blocks
        WHERE NOT is_ua AND NOT (field = 'disallow' AND value = '')) r
  JOIN agents a ON r.host = a.host AND r.block = a.block
  WHERE a.agent = CASE WHEN r.has_token = 1 THEN 'trainbot' ELSE '*' END
), rule_re AS (
  SELECT host, pattern, allowed,
         '^' || replace(
           regexp_replace(
             CASE WHEN pattern LIKE '%$'
                  THEN substr(pattern, 1, len(pattern) - 1)
                  ELSE pattern END,
             '([\\\[\]{}()+?^$|.])', '\\\1', 'g'),
           '*', '.*')
         || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS re
  FROM rules
), urls(id, url) AS (VALUES
  (0, 'https://site-a.example/private/secret.html'),
  (1, 'https://site-a.example/private/public/page'),
  (2, 'https://site-a.example/doc.pdf'),
  (3, 'https://site-a.example/doc.pdfx'),
  (4, 'https://site-a.example/a/deep/doc.pdf'),
  (5, 'https://site-a.example/tmp-cache/file'),
  (6, 'https://site-a.example/tmp-cache/keep'),
  (7, 'https://site-a.example/x/tied'),
  (8, 'https://site-a.example/open/page'),
  (9, 'https://site-b.example/anything'),
  (10, 'https://site-b.example/pub/page'),
  (11, 'https://no-rules.example/whatever')
), u AS (
  SELECT id, url,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS host,
         coalesce(nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?#]*)', 1), ''), '/') AS path
  FROM urls
), matched AS (
  SELECT u.id, r.pattern, r.allowed,
         row_number() OVER (PARTITION BY u.id
                            ORDER BY len(r.pattern) DESC, r.allowed DESC) AS rk
  FROM u JOIN rule_re r ON u.host = r.host
  WHERE regexp_matches(u.path, r.re)
)
SELECT CAST(u.id AS BIGINT) AS id, u.url,
       coalesce(m.allowed, TRUE) AS allowed
FROM u LEFT JOIN (SELECT id, allowed FROM matched WHERE rk = 1) m
  ON u.id = m.id
"""

# verdict coverage: RFC 9309 wildcard '/*.pdf$' (anchored — /doc.pdfx
# passes), '/tmp*' with the longer '/tmp*/keep' Allow override, equal-length
# Allow-beats-Disallow tie ('/x'), group selection (trainbot's group, not
# '*'), site-b's '*' group with blank-Disallow dropped, and the
# no-rules-host default TRUE.

# ---------------------------------------------------------------------------
# Round-10 wave 2 — container/EXIF/video metadata, transforms, image stats,
# audio segmentation/resampling, caption alignment, sitemaps. All inputs are
# synthesized in-plan from ids (or literal strings) and every operator is
# deterministic pure numpy/stdlib/codegen, so the oracles pin literal rows
# (generated from a verified run, identical at sf0.001/sf0.01). Closed-form
# anchors inside the literals: a solid fill scores exactly 0 entropy/std/
# sharpness, a 0/255 checkerboard exactly 1.0 bit, a 32-level ramp exactly
# 5.0 bits; the VAD cuts exactly (0-200ms, 500-700ms) at sine RMS A/sqrt(2);
# v1 mvhd 90000*7 units at 90 kHz = exactly 7000 ms.
# ---------------------------------------------------------------------------

ORACLES["multimodal_container_meta"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'image/gif', CAST(68 AS BIGINT), '41cca5a5808f925a13963f8366333fd7', CAST(7 AS BIGINT), CAST(5 AS BIGINT), FALSE),
  (CAST(1 AS BIGINT), 'image/bmp', CAST(54 AS BIGINT), 'e17d939ecf9a0ab34e51694bea5ff540', CAST(640 AS BIGINT), CAST(480 AS BIGINT), FALSE),
  (CAST(2 AS BIGINT), 'image/bmp', CAST(26 AS BIGINT), '5dd8511dbf7fd52d5f32fb95092fe5a9', CAST(100 AS BIGINT), CAST(80 AS BIGINT), FALSE),
  (CAST(3 AS BIGINT), 'image/tiff', CAST(38 AS BIGINT), '581e98755117ae74a4478641d69a032f', CAST(320 AS BIGINT), CAST(240 AS BIGINT), FALSE),
  (CAST(4 AS BIGINT), 'image/tiff', CAST(38 AS BIGINT), '961dce655e8bfcaed5d5ac6dcdf6d3bc', CAST(64 AS BIGINT), CAST(32 AS BIGINT), FALSE),
  (CAST(5 AS BIGINT), 'image/webp', CAST(30 AS BIGINT), '475e43e2fd7995899390cbef0abf8f45', CAST(800 AS BIGINT), CAST(600 AS BIGINT), FALSE),
  (CAST(6 AS BIGINT), 'image/webp', CAST(26 AS BIGINT), 'b4fce49d14140e698bbe2075ceed0745', CAST(800 AS BIGINT), CAST(600 AS BIGINT), FALSE),
  (CAST(7 AS BIGINT), 'image/webp', CAST(30 AS BIGINT), '15542afd3c876e3052f22865d1bb6f1b', CAST(1024 AS BIGINT), CAST(768 AS BIGINT), FALSE),
  (CAST(8 AS BIGINT), 'video/mp4', CAST(556 AS BIGINT), 'ef8a5db9b88dbbacd4367e0b73709926', CAST(640 AS BIGINT), CAST(360 AS BIGINT), FALSE),
  (CAST(9 AS BIGINT), 'audio/x-wav', CAST(8044 AS BIGINT), '464d8b5b31e1192cc151862e0dde1c43', CAST(365 AS BIGINT), CAST(365 AS BIGINT), FALSE),
  (CAST(10 AS BIGINT), 'image/jpeg', CAST(319 AS BIGINT), '4f75fb6df2eb62a6a146ee3ae0786973', CAST(8 AS BIGINT), CAST(8 AS BIGINT), FALSE),
  (CAST(11 AS BIGINT), 'image/png', CAST(68 AS BIGINT), 'dc3f36c134870fcb08ff1b9579bfda77', CAST(2 AS BIGINT), CAST(2 AS BIGINT), TRUE),
  (CAST(12 AS BIGINT), 'application/gzip', CAST(33 AS BIGINT), 'e8419833619b23b7f046622e15069552', CAST(34 AS BIGINT), CAST(34 AS BIGINT), FALSE),
  (CAST(13 AS BIGINT), 'application/x-tar', CAST(10240 AS BIGINT), 'd532517f15aa372d1a9c36bad073a784', CAST(1 AS BIGINT), CAST(161 AS BIGINT), FALSE),
  (CAST(14 AS BIGINT), 'text/html', CAST(43 AS BIGINT), '078bdbc708ea1e8649e9865001ec72bd', CAST(44 AS BIGINT), CAST(44 AS BIGINT), FALSE),
  (CAST(15 AS BIGINT), CAST(NULL AS VARCHAR), CAST(32 AS BIGINT), '72796d54bf54850edd4b88712083a4a5', CAST(33 AS BIGINT), CAST(33 AS BIGINT), FALSE)
) AS t(media_id, mime, n_bytes, content_md5, width, height, decoded)
"""

ORACLES["multimodal_exif_meta"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(6 AS BIGINT), 'Acme', 'Cam9000', '2026:08:16 10:00:00', '2026:08:15 09:30:00', CAST(1024 AS BIGINT), CAST(768 AS BIGINT), TRUE),
  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'Globex', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), TRUE),
  (CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE),
  (CAST(3 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE)
) AS t(media_id, orientation, make, model, datetime, datetime_original, pixel_x, pixel_y, parsed)
"""

ORACLES["multimodal_video_meta"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'isom', CAST(50000 AS BIGINT), CAST(2 AS BIGINT), CAST(640 AS BIGINT), CAST(360 AS BIGINT), 'avc1', 'mp4a', TRUE),
  (CAST(1 AS BIGINT), 'isom', CAST(7000 AS BIGINT), CAST(2 AS BIGINT), CAST(640 AS BIGINT), CAST(360 AS BIGINT), 'avc1', 'mp4a', TRUE),
  (CAST(2 AS BIGINT), 'isom', CAST(50000 AS BIGINT), CAST(2 AS BIGINT), CAST(1920 AS BIGINT), CAST(1080 AS BIGINT), 'hvc1', 'mp4a', TRUE),
  (CAST(3 AS BIGINT), 'isom', CAST(50000 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), 'mp4a', TRUE),
  (CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), FALSE)
) AS t(media_id, brand, duration_ms, n_tracks, width, height, video_codec, audio_codec, parsed)
"""

ORACLES["multimodal_transform_fingerprint"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(32 AS BIGINT), CAST(32 AS BIGINT), '906da6dd9ebe11e9e7179053f1f28f9d', TRUE),
  (CAST(1 AS BIGINT), CAST(32 AS BIGINT), CAST(32 AS BIGINT), '197a9e134aa09030fff6845841d559d0', TRUE),
  (CAST(2 AS BIGINT), CAST(32 AS BIGINT), CAST(32 AS BIGINT), '228366a2ab5d5aee08a5e93381124bf4', TRUE),
  (CAST(3 AS BIGINT), CAST(32 AS BIGINT), CAST(32 AS BIGINT), '4d4adcec221c37905893bdc46de3b66d', TRUE),
  (CAST(4 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), '938da64751b5d8cb717d78e62427c4ae', TRUE),
  (CAST(5 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), '492e8de22c51d0f6ec2b782063a55a71', FALSE)
) AS t(media_id, width, height, payload_md5, decoded)
"""

ORACLES["multimodal_image_stats"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(16 AS BIGINT), CAST(16 AS BIGINT), 'RGB', CAST(770000 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE),
  (CAST(1 AS BIGINT), CAST(32 AS BIGINT), CAST(32 AS BIGINT), 'RGB', CAST(1232559 AS BIGINT), CAST(581409 AS BIGINT), CAST(7295882 AS BIGINT), CAST(4708498 AS BIGINT), TRUE),
  (CAST(2 AS BIGINT), CAST(32 AS BIGINT), CAST(32 AS BIGINT), 'RGB', CAST(1303633 AS BIGINT), CAST(841083 AS BIGINT), CAST(6909586 AS BIGINT), CAST(48933451 AS BIGINT), TRUE),
  (CAST(3 AS BIGINT), CAST(32 AS BIGINT), CAST(32 AS BIGINT), 'RGB', CAST(1227188 AS BIGINT), CAST(748332 AS BIGINT), CAST(5000000 AS BIGINT), CAST(3692995 AS BIGINT), TRUE),
  (CAST(4 AS BIGINT), CAST(16 AS BIGINT), CAST(16 AS BIGINT), 'RGB', CAST(1275000 AS BIGINT), CAST(1275000 AS BIGINT), CAST(1000000 AS BIGINT), CAST(1040400000 AS BIGINT), TRUE),
  (CAST(5 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE)
) AS t(media_id, width, height, mode, mean0_e4, std0_e4, entropy_ubits, sharpness_e3, decoded)
"""

ORACLES["multimodal_audio_segments"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(200 AS BIGINT), CAST(353544 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(500 AS BIGINT), CAST(700 AS BIGINT), CAST(353544 AS BIGINT))
) AS t(media_id, segment_idx, start_ms, end_ms, rms_ppm)
"""

ORACLES["multimodal_resample_fingerprint"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(16000 AS BIGINT), CAST(8000 AS BIGINT), 'c88ca0569f32ca4ffda37211bd55c861', TRUE),
  (CAST(1 AS BIGINT), CAST(16000 AS BIGINT), CAST(4000 AS BIGINT), 'c1f1ce6bc5108be9f113171a0e5bc771', TRUE),
  (CAST(2 AS BIGINT), CAST(16000 AS BIGINT), CAST(4800 AS BIGINT), 'd4c7fdc979dad72cc43718b4d415253d', TRUE),
  (CAST(3 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), FALSE),
  (CAST(4 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), FALSE)
) AS t(media_id, sample_rate, n_frames, payload_md5, decoded)
"""

ORACLES["captions_frame_align"] = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1500 AS BIGINT), CAST(0 AS BIGINT), 'first cue second line'),
  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(3900 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)),
  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(5000 AS BIGINT), CAST(1 AS BIGINT), 'second cue'),
  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(2000 AS BIGINT), CAST(0 AS BIGINT), 'vtt cue one'),
  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(360001500 AS BIGINT), CAST(1 AS BIGINT), 'very late cue')
) AS t(media_id, frame_idx, ts_ms, cue_idx, caption)
"""

# Round 11: the sitemap oracle now REGENERATES both XML docs and
# recomputes the explode in SQL (element split with positions, loc/
# lastmod/priority extraction, preamble drop) — independent twin.
ORACLES["crawl_sitemap_entries"] = r"""
WITH docs(warc_id, xml) AS (VALUES
  (1, '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
      || '<url><loc>https://ex.org/</loc><lastmod>2026-01-01</lastmod><priority>0.8</priority></url>'
      || '<url><loc> https://ex.org/a </loc></url>'
      || '<url><loc>https://ex.org/b</loc><lastmod> 2026-02-03T04:05:06+00:00 </lastmod></url>'
      || '</urlset>'),
  (2, '<sitemapindex><sitemap><loc>https://ex.org/sitemap1.xml</loc>'
      || '<lastmod>2026-03-01</lastmod></sitemap>'
      || '<sitemap><loc>https://ex.org/sitemap2.xml</loc></sitemap></sitemapindex>')
), blocks AS (
  SELECT warc_id,
         unnest(string_split_regex(xml, '<(?:url|sitemap)>')) AS block,
         unnest(range(len(string_split_regex(xml, '<(?:url|sitemap)>')))) AS bidx,
         contains(xml, '<sitemapindex') AS is_index
  FROM docs
)
SELECT CAST(warc_id AS BIGINT) AS warc_id,
       CAST(bidx - 1 AS BIGINT) AS entry_idx,
       CASE WHEN is_index THEN 'sitemap' ELSE 'url' END AS kind,
       regexp_extract(block, '<loc>\s*([^<\s]+)\s*</loc>', 1) AS loc,
       nullif(regexp_extract(block, '<lastmod>\s*([^<\s]+)\s*</lastmod>', 1), '') AS lastmod,
       CAST(nullif(regexp_extract(block, '<priority>\s*([^<\s]+)\s*</priority>', 1), '') AS DOUBLE) AS priority
FROM blocks
WHERE regexp_extract(block, '<loc>\s*([^<\s]+)\s*</loc>', 1) <> ''
"""

# ---------------------------------------------------------------------------
# Round-10 wave 3 — raw WARC record explode, HTML head metadata, sentence
# split, frame timestamps (engine-side half of the video seam), blob
# striping. Literal rows generated from a verified run (sf-invariant),
# except the striping oracle which REGENERATES payloads and recomputes the
# manifest independently in SQL.
# ---------------------------------------------------------------------------

ORACLES["crawl_warc_records"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'warcinfo', CAST(NULL AS VARCHAR), 'application/warc-fields', CAST(NULL AS BIGINT), 'f95978304a75e1bad7a5d20cc27543d7'),
  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'response', 'http://site-a.example/utf8', 'text/html; charset=utf-8', CAST(200 AS BIGINT), '0cffd91a27f032a415fbbf703858fd04'),
  (CAST(0 AS BIGINT), CAST(2 AS BIGINT), 'response', 'http://site-a.example/missing', 'text/html', CAST(404 AS BIGINT), 'bcf86c7ca95b929ac3e2478e906f5cfd'),
  (CAST(0 AS BIGINT), CAST(3 AS BIGINT), 'response', 'http://site-a.example/logo', 'image/png', CAST(200 AS BIGINT), '44b3507172ceeb6361fd0fe2e047087c'),
  (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'response', 'http://site-b.example/cp1252', 'Text/HTML; charset=windows-1252', CAST(200 AS BIGINT), '87a3156f05c639f28b5a2ac92f53aed3'),
  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'response', 'http://site-b.example/latin1', 'text/html', CAST(200 AS BIGINT), 'd3fae54049c266620c4b24c56850c8d6'),
  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'response', 'http://site-b.example/de', 'text/html; charset=utf-8', CAST(200 AS BIGINT), 'f28198d3eaa56c5ac2932270ed453cb6')
) AS t(warc_id, record_idx, warc_type, target_uri, content_type, http_status, body_md5)
"""

ORACLES["crawl_html_meta"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'My Page', 'A test page', 'OG Title', 'https://e.com/i.png', 'https://e.com/page', 'en-US'),
  (CAST(1 AS BIGINT), 'Groß', 'Dave''s home page', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'de'),
  (CAST(2 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
) AS t(page_id, title, description, og_title, og_image, canonical, lang_attr)
"""

ORACLES["text_sentence_split"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'First one.'),
  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'Second here!'),
  (CAST(0 AS BIGINT), CAST(2 AS BIGINT), 'Is this third?'),
  (CAST(0 AS BIGINT), CAST(3 AS BIGINT), 'Yes.'),
  (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'Written by J. Smith.'),
  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'Next sentence.'),
  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'No terminal punctuation at all'),
  (CAST(3 AS BIGINT), CAST(0 AS BIGINT), 'He said "Stop!" Then: nothing.'),
  (CAST(3 AS BIGINT), CAST(1 AS BIGINT), 'Trailing spaces.')
) AS t(doc_id, sentence_idx, sentence)
"""

ORACLES["multimodal_frame_timestamps"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'b11f98ca0dc6f3200911f91bf1b9ee94'),
  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(12500 AS BIGINT), '5168144b82bfe12a89b8bfac2ca378ce'),
  (CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(25000 AS BIGINT), '74b822c9f7fedb6e0cc89990ef086f22'),
  (CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(37500 AS BIGINT), 'de14e4d04399624ee34279b6396841c3'),
  (CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'd2446c73017f8491cca8d6c78f3083f7'),
  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1750 AS BIGINT), '4f25fe67904c85ea0c1786bc97bdb9cb'),
  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3500 AS BIGINT), '715dc6874032e7b83455981b82638759'),
  (CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(5250 AS BIGINT), '98f8c1d55bc893f5efcbf9622cf005a9'),
  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), '906c4e5fe9fc01c21956da89fa4686b4'),
  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(12500 AS BIGINT), '317db8529f9ce7be3a9cd7408a131440'),
  (CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(25000 AS BIGINT), '5239b73170f11b46744a4a8a1dc2f61d'),
  (CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(37500 AS BIGINT), '2ca153af638bbb55be472885b79381d9'),
  (CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'e3a0eef69b50a8ea2528e69ba66d700f'),
  (CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(12500 AS BIGINT), 'b79535be2f439d1fad583fdb09b3c36e'),
  (CAST(3 AS BIGINT), CAST(2 AS BIGINT), CAST(25000 AS BIGINT), '264eacc99bb22947f2aab20f939026d3'),
  (CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(37500 AS BIGINT), '7f8361a8284c80eecdfea73b2739abd2'),
  (CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT), '0feb841025580a7a88407642c921a818'),
  (CAST(4 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS BIGINT), 'a25b621f665ba2acabf25ff4f9e99721'),
  (CAST(4 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), '968788b110008dd4e3db9891c01f4431'),
  (CAST(4 AS BIGINT), CAST(3 AS BIGINT), CAST(NULL AS BIGINT), '31ddbeb947cc893442601741e7678558')
) AS t(media_id, frame_idx, ts_ms, frame_md5)
"""
ORACLES["multimodal_strip_roundtrip"] = """
SELECT CAST(i AS BIGINT) AS blob_id,
       CAST(length(p) AS BIGINT) AS payload_len,
       CAST(ceil(length(p) / 7.0) AS BIGINT) AS n_strips,
       md5(p) AS payload_md5,
       TRUE AS roundtrip_ok
FROM (
  SELECT i,
         repeat('x' || CAST(i AS VARCHAR) || '.', CAST(i + 1 AS INTEGER)) AS p
  FROM range(9) t(i)
)
"""

# ---------------------------------------------------------------------------
# Round-10 wave 4 — new crawl-pipeline operators: boilerplate removal,
# URL canonicalization (literal-row oracles), and politeness fetch
# scheduling, whose oracle REGENERATES the frontier and recomputes the
# schedule with its own window + join.
# ---------------------------------------------------------------------------

ORACLES["crawl_main_content"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'This is the real article body, a long paragraph with substantial prose that clears the minimum block length and has one inline link inside it, which is fine. Second paragraph of genuine content, long enough to be kept by the density heuristic & entity decoding works.', CAST(267 AS BIGINT), '93dce4c69c953e367cec4b410ff2d952'),
  (CAST(1 AS BIGINT), '', CAST(0 AS BIGINT), 'd41d8cd98f00b204e9800998ecf8427e'),
  (CAST(2 AS BIGINT), 'Just one honest paragraph of plain page content here.', CAST(53 AS BIGINT), '251bb5293d95722e02786a039078156a')
) AS t(page_id, main_text, main_len, main_md5)
"""

# Round 11 (round-10 verdict "prefer the SQL twin where expressible"):
# this oracle RECOMPUTES the whole canonicalization in SQL — absolute-URL
# guard, fragment strip, scheme/host-only lowercasing around the last '@',
# default-port strip on the host:port half, empty-path slash, tracking-param
# filter, byte-wise param sort — instead of pinning literal outputs.
ORACLES["crawl_url_canonical"] = """
WITH inputs(id, url) AS (VALUES
  (0, 'HTTP://Example.COM:80/Path/Page?b=2&utm_source=x&a=1#frag'),
  (1, 'https://example.com:443/'),
  (2, 'https://example.com'),
  (3, 'https://example.com/p?gclid=abc&ref=tw&fbclid=z'),
  (4, 'https://example.com:8443/p?z=1&a=2'),
  (5, 'http://h.io/UPPER/case?utm_campaign=spring#x'),
  (6, 'https://example.com/p?a=1&a=0'),
  (7, 'example.com/relative/path'),
  (8, '//cdn.example.com/lib.js'),
  (9, 'mailto:user@example.com'),
  (10, 'HTTP://User:Pw@Example.COM:80/a')
), s1 AS (
  SELECT id, url,
         regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://') AS is_abs,
         regexp_replace(url, '#.*$', '') AS c
  FROM inputs
), s2 AS (
  SELECT *, lower(regexp_extract(c, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_extract(c, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS auth,
         regexp_extract(c, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1) AS rest
  FROM s1
), s3 AS (
  SELECT *, regexp_extract(auth, '^(.*@)', 1) AS userinfo,
         CASE WHEN scheme = 'http'
                THEN regexp_replace(lower(regexp_extract(auth, '([^@]*)$', 1)), ':80$', '')
              WHEN scheme = 'https'
                THEN regexp_replace(lower(regexp_extract(auth, '([^@]*)$', 1)), ':443$', '')
              ELSE lower(regexp_extract(auth, '([^@]*)$', 1)) END AS hostport
  FROM s2
), s4 AS (
  SELECT *, scheme || '://' || userinfo || hostport || rest AS c2 FROM s3
), s5 AS (
  SELECT *,
         CASE WHEN regexp_matches(regexp_extract(c2, '^([^?]*)', 1),
                                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*$')
              THEN regexp_extract(c2, '^([^?]*)', 1) || '/'
              ELSE regexp_extract(c2, '^([^?]*)', 1) END AS prefix,
         list_sort(list_filter(
           string_split(regexp_extract(c2, '\\?(.*)$', 1), '&'),
           p -> p <> '' AND NOT regexp_matches(
             p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)=')
         )) AS params
  FROM s4
)
SELECT CAST(id AS BIGINT) AS id, url,
       CASE WHEN NOT is_abs THEN url
            WHEN len(params) > 0 THEN prefix || '?' || array_to_string(params, '&')
            ELSE prefix END AS canonical
FROM s5
"""
ORACLES["crawl_fetch_schedule"] = """
WITH frontier AS (
  SELECT i AS id,
         printf('https://%s/p%02d',
                (['a.com', 'b.com', 'c.com'])[CAST(i % 3 AS INTEGER) + 1],
                CAST(i AS INTEGER)) AS url,
         (['a.com', 'b.com', 'c.com'])[CAST(i % 3 AS INTEGER) + 1] AS host
  FROM range(12) t(i)
), d(host, delay_s) AS (
  VALUES ('a.com', 2.0), ('b.com', 0.5)
), s AS (
  SELECT id, url, host,
         row_number() OVER (PARTITION BY host ORDER BY url) - 1 AS slot
  FROM frontier
)
SELECT CAST(id AS BIGINT) AS id, url, s.host,
       CAST(slot AS BIGINT) AS slot,
       CAST(round(slot * coalesce(delay_s, 1.0) * 1000) AS BIGINT) AS fetch_at_ms
FROM s LEFT JOIN d ON s.host = d.host
"""

# ---------------------------------------------------------------------------
# Round-10 wave 5 — Gopher quality rules (literal-row oracle) and CCNet
# line-frequency dedup, whose oracle REGENERATES the corpus and recomputes
# the dedup in SQL (parallel unnest for (idx, line), count-distinct
# frequency, ordered string_agg reassembly).
# ---------------------------------------------------------------------------

# Round 11 (round-10 verdict "prefer the SQL twin where expressible"):
# the Gopher battery oracle now REGENERATES the five docs (repeat/
# string_agg) and recomputes every measure and rule in SQL — word/line
# splits, symbol and bullet ratios, word-token stopword hits — instead
# of pinning literal rows.
ORACLES["text_gopher_flags"] = r"""
WITH docs(doc_id, body) AS (
  SELECT 0, repeat('The quick brown fox jumps over the lazy dog and runs with great speed across the field. ', 4)
            || 'It would have been fine to be there with all of that in mind.'
  UNION ALL SELECT 1, 'Too few words here.'
  UNION ALL SELECT 2, (SELECT string_agg('- bullet item ' || i, chr(10) ORDER BY i) FROM range(10) t(i))
  UNION ALL SELECT 3, repeat('word#tag ', 30) || rtrim(repeat('the of and ', 10))
  UNION ALL SELECT 4, repeat('12345 67890 ', 30) || rtrim(repeat('the of ', 5))
), feats AS (
  SELECT doc_id, body,
         list_filter(string_split_regex(body, '\s+'), w -> w <> '') AS words,
         list_filter(string_split_regex(body, '\r?\n'), l -> trim(l) <> '') AS lines
  FROM docs
), meas AS (
  SELECT doc_id,
         len(words) AS n_words,
         greatest(len(words), 1) AS n_words1,
         greatest(len(lines), 1) AS n_lines,
         list_aggregate(list_transform(words, w -> len(w)), 'sum') AS word_chars,
         (len(body) - len(replace(body, '#', '')))
           + (len(body) - len(replace(body, '...', ''))) / 3.0 AS n_symbols,
         len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*' || chr(8226) || ']'))) AS n_bullets,
         len(list_filter(lines, l -> trim(l) LIKE '%...')) AS n_ellipsis,
         len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
         len(list_filter(['the','be','to','of','and','that','have','with'],
             sw -> list_contains(
               list_transform(words, w -> lower(regexp_replace(w, '[^A-Za-z]', '', 'g'))),
               sw))) AS stop_hits
  FROM feats
), ratios AS (
  SELECT doc_id, n_words, stop_hits,
         word_chars * 1.0 / n_words1 AS mean_wl,
         n_symbols * 1.0 / n_words1 AS sym_r,
         n_bullets * 1.0 / n_lines AS bull_r,
         n_ellipsis * 1.0 / n_lines AS ell_r,
         n_alpha * 1.0 / n_words1 AS alpha_r
  FROM meas
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS word_count,
       CAST(round(mean_wl * 1e6) AS BIGINT) AS mean_word_len_ppm,
       CAST(round(sym_r * 1e6) AS BIGINT) AS symbol_ratio_ppm,
       CAST(round(bull_r * 1e6) AS BIGINT) AS bullet_ratio_ppm,
       CAST(round(alpha_r * 1e6) AS BIGINT) AS alpha_word_ratio_ppm,
       CAST(stop_hits AS BIGINT) AS stopword_hits,
       (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
       (bull_r <= 0.9) AS ok_bullet_ratio,
       (sym_r <= 0.1) AS ok_symbol_ratio,
       (alpha_r >= 0.8) AS ok_alpha_words,
       ((n_words >= 50 AND n_words <= 100000) AND (mean_wl >= 3 AND mean_wl <= 10)
        AND sym_r <= 0.1 AND bull_r <= 0.9 AND ell_r <= 0.3
        AND alpha_r >= 0.8 AND stop_hits >= 2) AS passes
FROM ratios
"""
ORACLES["text_line_dedup"] = """
WITH docs(doc_id, text) AS (VALUES
  (0, 'Accept all cookies' || chr(10) || 'unique line zero' || chr(10) || 'Share on social'),
  (1, 'Accept all cookies' || chr(10) || 'unique line one' || chr(10) || '' || chr(10) || 'Share on social'),
  (2, 'Accept all cookies' || chr(10) || 'unique line two'),
  (3, 'repeated inside' || chr(10) || 'repeated inside' || chr(10) || 'own text'),
  (4, 'Accept all cookies' || chr(10) || 'Share on social')
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(len(string_split(text, chr(10))))) AS idx
  FROM docs
), freq AS (
  SELECT trim(line) AS key, count(DISTINCT doc_id) AS n_docs
  FROM lines WHERE length(trim(line)) >= 1
  GROUP BY 1
), kept AS (
  SELECT l.doc_id, l.idx, l.line
  FROM lines l LEFT JOIN freq f ON trim(l.line) = f.key
  WHERE length(trim(l.line)) < 1 OR f.n_docs <= 1
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       coalesce(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS text,
       CAST(count(k.line) AS BIGINT) AS n_lines_kept,
       CAST(t.n_total - count(k.line) AS BIGINT) AS n_lines_dropped
FROM (SELECT doc_id, count(*) AS n_total FROM lines GROUP BY 1) t
LEFT JOIN kept k ON k.doc_id = t.doc_id
GROUP BY t.doc_id, t.n_total
"""

# ---------------------------------------------------------------------------
# Round 11 — distributed robots.txt parsing. The oracle REGENERATES the five
# bodies and recomputes the ENTIRE parse in SQL: line split with positions
# (parallel unnest), comment strip + field/value regexp extraction, group
# assignment via lag/sum windows (a group = a maximal run of UA lines),
# blank-Disallow drop, agent⋈rule join, and RFC 9309 group selection (hosts
# declaring the token anywhere use its rules — even when empty — else '*').
# ---------------------------------------------------------------------------

ORACLES["crawl_robots_rules"] = """
WITH bodies(host, body) AS (VALUES
  ('site-a.example',
   '# crawl policy' || chr(10) || 'User-agent: trainbot' || chr(10) ||
   'User-agent: otherbot' || chr(10) || 'Disallow: /private' || chr(10) ||
   'Allow: /private/public' || chr(10) || 'Crawl-delay: 2' || chr(10) ||
   'Disallow: /tmp' || chr(10) || '' || chr(10) ||
   'User-agent: *' || chr(10) || 'Disallow: /' || chr(10)),
  ('site-b.example',
   'User-agent: *' || chr(10) || 'Disallow: /' || chr(10) ||
   'User-agent: trainbot' || chr(10)),
  ('site-c.example',
   'User-agent: megabot' || chr(10) || 'User-agent: trainbot' || chr(10) ||
   'Disallow: /no' || chr(10) || 'Allow:' || chr(10)),
  ('site-d.example',
   'Disallow: /early-orphan' || chr(10) || 'User-agent: *' || chr(10) ||
   'Disallow: /d' || chr(10) || 'Allow: /d/ok$' || chr(10) ||
   'Disallow:' || chr(10)),
  ('site-e.example',
   'USER-AGENT: TrainBot' || chr(10) || 'DisAllow: /x # inline comment' || chr(10))
), lines AS (
  SELECT host,
         unnest(string_split(body, chr(10))) AS raw,
         unnest(range(len(string_split(body, chr(10))))) AS ln
  FROM bodies
), cleaned AS (
  SELECT host, ln, trim(regexp_replace(raw, '#.*$', '')) AS clean FROM lines
), parsed AS (
  SELECT host, ln,
         lower(trim(regexp_extract(clean, '^([^:]*):', 1))) AS field,
         trim(regexp_extract(clean, '^[^:]*:(.*)$', 1)) AS value
  FROM cleaned
  WHERE contains(clean, ':')
), fr AS (
  SELECT * FROM parsed WHERE field IN ('user-agent', 'allow', 'disallow')
), marked AS (
  SELECT host, ln, field, value,
         (field = 'user-agent') AS is_ua,
         coalesce(
           lag(field = 'user-agent') OVER (PARTITION BY host ORDER BY ln),
           FALSE
         ) AS prev_ua
  FROM fr
), blocks AS (
  SELECT host, ln, field, value, is_ua,
         sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY ln) AS block
  FROM marked
), agents AS (
  SELECT DISTINCT host, block, lower(value) AS agent
  FROM blocks WHERE is_ua AND value <> ''
), rules AS (
  SELECT host, block, ln, value AS path_prefix, (field = 'allow') AS allowed
  FROM blocks
  WHERE NOT is_ua AND NOT (field = 'disallow' AND value = '')
), sel AS (
  SELECT host, max(CASE WHEN agent = 'trainbot' THEN 1 ELSE 0 END) AS has_token
  FROM agents GROUP BY host
)
SELECT r.host,
       CAST(r.ln AS BIGINT) AS line_no,
       r.path_prefix,
       r.allowed
FROM rules r
JOIN agents a ON r.host = a.host AND r.block = a.block
JOIN sel s ON r.host = s.host
WHERE a.agent = CASE WHEN s.has_token = 1 THEN 'trainbot' ELSE '*' END
"""

# The five previously unit-only parsers (id3/flac/ogg/gif/animation) in one
# routed gate: deterministic synthesized bytes, literal rows pinned with
# closed-form anchors — FLAC 480000 samples @ 96 kHz = exactly 5000 ms,
# Vorbis granule 16000 @ 8 kHz = 2000 ms, Opus (48312 - 312 pre-skip)
# @ 48 kHz = 1000 ms, GIF 7x5 with 3 descriptors, APNG acTL declares 12.

ORACLES["multimodal_tag_meta"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'id3', 'Né So', 'Ünicode Band', 'Plain Album', '2026', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), TRUE),
  (CAST(1 AS BIGINT), 'id3', 'Old School', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '1999', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), TRUE),
  (CAST(2 AS BIGINT), 'id3', 'Hi22', 'Band 22', CAST(NULL AS VARCHAR), '1987', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), TRUE),
  (CAST(3 AS BIGINT), 'flac', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'flac', CAST(96000 AS BIGINT), CAST(2 AS BIGINT), CAST(5000 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), TRUE),
  (CAST(4 AS BIGINT), 'ogg', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'vorbis', CAST(8000 AS BIGINT), CAST(1 AS BIGINT), CAST(2000 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), TRUE),
  (CAST(5 AS BIGINT), 'ogg', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'opus', CAST(48000 AS BIGINT), CAST(2 AS BIGINT), CAST(1000 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), TRUE),
  (CAST(6 AS BIGINT), 'gif', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(7 AS BIGINT), CAST(5 AS BIGINT), CAST(3 AS BIGINT), TRUE),
  (CAST(7 AS BIGINT), 'webp', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(2 AS BIGINT), TRUE),
  (CAST(8 AS BIGINT), 'apng', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(12 AS BIGINT), TRUE),
  (CAST(9 AS BIGINT), 'png', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), TRUE),
  (CAST(10 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE)
) AS t(media_id, kind, title, artist, album, date, codec, sample_rate, channels, duration_ms, width, height, n_frames, parsed)
"""

# The streaming crawl frontier: canonicalize → visited-set monoid →
# politeness schedule. Batch-split invariance means the oracle can
# REGENERATE the 96 raw URLs, derive canonicals by the same formula the
# synthesis used, group (count + min spelling), and recompute the per-host
# schedule with its own window + delay join — fully independent SQL.

ORACLES["s_stream_frontier"] = """
WITH raw AS (
  SELECT i,
         CAST(i % 24 AS INTEGER) AS b,
         CAST((i % 24) % 5 AS INTEGER) AS k,
         CAST(i // 24 AS INTEGER) AS v
  FROM range(96) t(i)
), urls AS (
  SELECT i, b, k,
         CASE v
           WHEN 0 THEN printf('https://h%d.example/p/%02d', k, b)
           WHEN 1 THEN printf('https://h%d.example/p/%02d?utm_source=x', k, b)
           WHEN 2 THEN printf('HTTPS://H%d.EXAMPLE:443/p/%02d#frag', k, b)
           ELSE printf('https://h%d.example/p/%02d?b=2&a=1', k, b)
         END AS url,
         CASE WHEN v <= 2 THEN printf('https://h%d.example/p/%02d', k, b)
              ELSE printf('https://h%d.example/p/%02d?a=1&b=2', k, b)
         END AS url_canon
  FROM raw
), state AS (
  SELECT url_canon,
         count(*) AS n_seen,
         min(url) AS first_url,
         printf('h%d.example', min(k)) AS host
  FROM urls GROUP BY url_canon
), d(host, delay_s) AS (VALUES ('h0.example', 2.0), ('h1.example', 0.5)),
s AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY url_canon) - 1 AS slot
  FROM state
)
SELECT url_canon,
       CAST(n_seen AS BIGINT) AS n_seen,
       first_url,
       s.host,
       CAST(slot AS BIGINT) AS slot,
       CAST(round(slot * coalesce(delay_s, 1.0) * 1000) AS BIGINT) AS fetch_at_ms
FROM s LEFT JOIN d ON s.host = d.host
"""

# The robots.txt extras (Sitemap lines + group-scoped Crawl-delay). Same
# regenerate-and-recompute machinery as crawl_robots_rules, plus arg_min
# first-delay-wins and the delays-specific fallback: the token falls back
# to '*' when the TOKEN HAS NO DELAY, even if its group exists.

ORACLES["crawl_robots_extras"] = """
WITH bodies(host, body) AS (VALUES
  ('r1.example',
   'Sitemap: https://r1.example/a.xml' || chr(10) ||
   'User-agent: megabot' || chr(10) || 'Crawl-delay: 2.5' || chr(10) ||
   'Disallow: /x' || chr(10) || 'User-agent: *' || chr(10) ||
   'Crawl-delay: 10' || chr(10) || 'Sitemap: https://r1.example/b.xml' || chr(10)),
  ('r2.example',
   'User-agent: megabot' || chr(10) || 'Disallow: /a' || chr(10) ||
   'User-agent: *' || chr(10) || 'Crawl-delay: 3' || chr(10)),
  ('r3.example',
   'User-agent: *' || chr(10) || 'Crawl-delay: nope' || chr(10) ||
   'Crawl-delay: NaN' || chr(10) ||
   'Crawl-delay: -1' || chr(10) || 'Crawl-delay: 4' || chr(10) ||
   'Crawl-delay: 9' || chr(10)),
  ('r4.example',
   'User-agent: *' || chr(10) || 'Disallow: /' || chr(10) ||
   'Sitemap: https://r4.example/s.xml' || chr(10))
), lines AS (
  SELECT host,
         unnest(string_split(body, chr(10))) AS raw,
         unnest(range(len(string_split(body, chr(10))))) AS ln
  FROM bodies
), cleaned AS (
  SELECT host, ln, trim(regexp_replace(raw, '#.*$', '')) AS clean FROM lines
), parsed AS (
  SELECT host, ln,
         lower(trim(regexp_extract(clean, '^([^:]*):', 1))) AS field,
         trim(regexp_extract(clean, '^[^:]*:(.*)$', 1)) AS value
  FROM cleaned
  WHERE contains(clean, ':')
), sitemaps AS (
  SELECT host, ln, value FROM parsed WHERE field = 'sitemap' AND value <> ''
), fr AS (
  SELECT * FROM parsed
  WHERE field IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
), marked AS (
  SELECT host, ln, field, value,
         (field = 'user-agent') AS is_ua,
         coalesce(
           lag(field = 'user-agent') OVER (PARTITION BY host ORDER BY ln),
           FALSE
         ) AS prev_ua
  FROM fr
), blocks AS (
  SELECT host, ln, field, value, is_ua,
         sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY ln) AS block
  FROM marked
), agents AS (
  SELECT DISTINCT host, block, lower(value) AS agent
  FROM blocks WHERE is_ua AND value <> ''
), cd AS (
  SELECT host, block, ln, TRY_CAST(value AS DOUBLE) AS d
  FROM blocks
  WHERE field = 'crawl-delay'
    AND TRY_CAST(value AS DOUBLE) IS NOT NULL
    AND NOT isnan(TRY_CAST(value AS DOUBLE))
    AND TRY_CAST(value AS DOUBLE) >= 0
), per_agent AS (
  SELECT c.host, a.agent, arg_min(c.d, c.ln) AS d
  FROM cd c JOIN agents a ON c.host = a.host AND c.block = a.block
  GROUP BY c.host, a.agent
), sel AS (
  SELECT host, max(CASE WHEN agent = 'megabot' THEN 1 ELSE 0 END) AS has_token
  FROM per_agent GROUP BY host
), delays AS (
  SELECT p.host, p.d
  FROM per_agent p JOIN sel s ON p.host = s.host
  WHERE p.agent = CASE WHEN s.has_token = 1 THEN 'megabot' ELSE '*' END
)
SELECT host, 'sitemap' AS kind, CAST(ln AS BIGINT) AS line_no,
       value AS sitemap_url, CAST(NULL AS DOUBLE) AS delay_s
FROM sitemaps
UNION ALL
SELECT host, 'delay', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), d
FROM delays
"""

# Round 11 — the FULL Gopher repetition battery. The oracle regenerates
# the six docs and recomputes everything in SQL: list ops for the line/
# paragraph half, positioned n-gram windows with tie-broken mode for the
# top fractions, and a coverage-union (DISTINCT covered word position,
# then char join) for the duplicate-n-gram half.
ORACLES["text_repetition_battery"] = r"""
WITH docs(doc_id, body) AS (VALUES
  (0, 'the quick brown fox jumps over a lazy dog near riverbank today' || chr(10) ||
      'second line carries fresh different words entirely without repeats' || chr(10) || chr(10) ||
      'third paragraph closes with more unique vocabulary items here' || chr(10) || chr(10) ||
      'a late part adds many new tiny bits so no one gram can own much of it' || chr(10) ||
      'end note has few more odd rare calm soft fair kind wise bold neat tidy'),
  (1, 'Accept cookies' || chr(10) || 'Accept cookies' || chr(10) ||
      'real content line' || chr(10) || chr(10) || 'Accept cookies'),
  (2, 'a b c d e f a b c d e g'),
  (3, 'buy now buy now buy now buy now'),
  (4, ''),
  (5, 'para one text' || chr(10) || chr(10) || 'para one text' || chr(10) || chr(10) || 'unique tail')
), base AS (
  SELECT doc_id,
    list_filter(list_transform(string_split_regex(body, '\r?\n'), s -> trim(s)), s -> s <> '') AS lns,
    list_filter(list_transform(string_split_regex(body, '(?:\r?\n){2,}'), s -> trim(s)), s -> s <> '') AS pgs,
    list_filter(string_split_regex(lower(body), '[^a-zA-Z0-9]+'), w -> w <> '') AS toks
  FROM docs
), stats AS (
  SELECT doc_id, toks,
    len(lns) AS n_ln, len(list_distinct(lns)) AS nd_ln,
    coalesce(list_aggregate(list_transform(lns, s -> len(s)), 'sum'), 0) AS c_ln,
    coalesce(list_aggregate(list_transform(list_distinct(lns), s -> len(s)), 'sum'), 0) AS cd_ln,
    len(pgs) AS n_pg, len(list_distinct(pgs)) AS nd_pg,
    coalesce(list_aggregate(list_transform(pgs, s -> len(s)), 'sum'), 0) AS c_pg,
    coalesce(list_aggregate(list_transform(list_distinct(pgs), s -> len(s)), 'sum'), 0) AS cd_pg,
    coalesce(list_aggregate(list_transform(toks, w -> len(w)), 'sum'), 0) AS tok_chars
  FROM base
), positions AS (
  SELECT doc_id, n, toks,
         unnest(range(greatest(len(toks) - n + 1, 0))) AS pos
  FROM base CROSS JOIN (VALUES (2), (3), (4), (5), (6), (7), (8), (9), (10)) ns(n)
), gramtext AS (
  SELECT doc_id, n, pos,
         array_to_string(toks[pos + 1 : pos + n], ' ') AS gram
  FROM positions
), gcnt AS (
  SELECT *, count(*) OVER (PARTITION BY doc_id, n, gram) AS cnt,
         len(gram) - (n - 1) AS glen
  FROM gramtext
), top AS (
  SELECT doc_id, n, cnt * glen AS top_chars
  FROM (
    SELECT doc_id, n, cnt, glen,
           row_number() OVER (PARTITION BY doc_id, n
                              ORDER BY cnt DESC, glen DESC, gram DESC) AS rk
    FROM (SELECT DISTINCT doc_id, n, gram, cnt, glen FROM gcnt WHERE n IN (2, 3, 4))
  ) WHERE rk = 1
), cov AS (
  SELECT DISTINCT doc_id, n, pos + unnest(range(n)) AS widx
  FROM gcnt WHERE n IN (5, 6, 7, 8, 9, 10) AND cnt > 1
), words AS (
  SELECT doc_id, unnest(range(len(toks))) AS widx, unnest(toks) AS w FROM base
), dupc AS (
  SELECT c.doc_id, c.n, sum(len(w.w)) AS dup_chars
  FROM cov c JOIN words w ON c.doc_id = w.doc_id AND c.widx = w.widx
  GROUP BY 1, 2
), piv AS (
  SELECT s.doc_id,
    max(CASE WHEN t.n = 2 THEN t.top_chars END) AS top2,
    max(CASE WHEN t.n = 3 THEN t.top_chars END) AS top3,
    max(CASE WHEN t.n = 4 THEN t.top_chars END) AS top4,
    max(CASE WHEN d.n = 5 THEN d.dup_chars END) AS dup5,
    max(CASE WHEN d.n = 6 THEN d.dup_chars END) AS dup6,
    max(CASE WHEN d.n = 7 THEN d.dup_chars END) AS dup7,
    max(CASE WHEN d.n = 8 THEN d.dup_chars END) AS dup8,
    max(CASE WHEN d.n = 9 THEN d.dup_chars END) AS dup9,
    max(CASE WHEN d.n = 10 THEN d.dup_chars END) AS dup10
  FROM stats s
  LEFT JOIN top t ON s.doc_id = t.doc_id
  LEFT JOIN dupc d ON s.doc_id = d.doc_id
  GROUP BY 1
), bp AS (
  SELECT s.doc_id,
    CASE WHEN n_ln = 0 THEN 0 ELSE (n_ln - nd_ln) * 10000 // n_ln END AS dup_line_frac_bp,
    CASE WHEN c_ln = 0 THEN 0 ELSE (c_ln - cd_ln) * 10000 // c_ln END AS dup_line_char_frac_bp,
    CASE WHEN n_pg = 0 THEN 0 ELSE (n_pg - nd_pg) * 10000 // n_pg END AS dup_para_frac_bp,
    CASE WHEN c_pg = 0 THEN 0 ELSE (c_pg - cd_pg) * 10000 // c_pg END AS dup_para_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(top2, 0) * 10000 // tok_chars END AS top2_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(top3, 0) * 10000 // tok_chars END AS top3_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(top4, 0) * 10000 // tok_chars END AS top4_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup5, 0) * 10000 // tok_chars END AS dup5_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup6, 0) * 10000 // tok_chars END AS dup6_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup7, 0) * 10000 // tok_chars END AS dup7_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup8, 0) * 10000 // tok_chars END AS dup8_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup9, 0) * 10000 // tok_chars END AS dup9_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup10, 0) * 10000 // tok_chars END AS dup10_char_frac_bp
  FROM stats s JOIN piv p ON s.doc_id = p.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(dup_line_frac_bp AS BIGINT) AS dup_line_frac_bp,
       CAST(dup_line_char_frac_bp AS BIGINT) AS dup_line_char_frac_bp,
       CAST(dup_para_frac_bp AS BIGINT) AS dup_para_frac_bp,
       CAST(dup_para_char_frac_bp AS BIGINT) AS dup_para_char_frac_bp,
       CAST(top2_char_frac_bp AS BIGINT) AS top2_char_frac_bp,
       CAST(top3_char_frac_bp AS BIGINT) AS top3_char_frac_bp,
       CAST(top4_char_frac_bp AS BIGINT) AS top4_char_frac_bp,
       CAST(dup5_char_frac_bp AS BIGINT) AS dup5_char_frac_bp,
       CAST(dup6_char_frac_bp AS BIGINT) AS dup6_char_frac_bp,
       CAST(dup7_char_frac_bp AS BIGINT) AS dup7_char_frac_bp,
       CAST(dup8_char_frac_bp AS BIGINT) AS dup8_char_frac_bp,
       CAST(dup9_char_frac_bp AS BIGINT) AS dup9_char_frac_bp,
       CAST(dup10_char_frac_bp AS BIGINT) AS dup10_char_frac_bp,
       (dup_line_frac_bp <= 3000 AND dup_para_frac_bp <= 3000
        AND dup_line_char_frac_bp <= 2000 AND dup_para_char_frac_bp <= 2000
        AND top2_char_frac_bp <= 2000 AND top3_char_frac_bp <= 1800
        AND top4_char_frac_bp <= 1600
        AND dup5_char_frac_bp <= 1500 AND dup6_char_frac_bp <= 1400
        AND dup7_char_frac_bp <= 1300 AND dup8_char_frac_bp <= 1200
        AND dup9_char_frac_bp <= 1100 AND dup10_char_frac_bp <= 1000) AS passes
FROM bp
"""

# Round 11 — the C4 cleaning battery (Raffel et al. 2020 SS2.2). The
# oracle regenerates the six docs and recomputes every line and page
# rule in SQL; the sentence count is the shared lookaround-free regex,
# so both engines count identically.
ORACLES["text_c4_filter"] = r"""
WITH docs(doc_id, body) AS (VALUES
  (0, 'A good first sentence sits here.' || chr(10) || 'short.' || chr(10) ||
      'And a braceless clean line too!' || chr(10) || 'no end punct' || chr(10) ||
      'Some javascript lives here today.' || chr(10) ||
      'Questions make fine endings, right?' || chr(10) ||
      'Quoted endings also count as terminal."' || chr(10) ||
      'Fifth proper sentence closes this.' || chr(10)),
  (1, 'Lorem ipsum dolor sit amet.' || chr(10) || 'Real text follows afterward here.'),
  (2, 'Code pages contain { braces }.' || chr(10) || 'Real text follows afterward here.'),
  (3, 'The subtitle mentions a title here.' || chr(10) ||
      'Plenty of proper sentences follow now.' || chr(10) ||
      'Another proper sentence lands here.' || chr(10) ||
      'Yet another proper sentence arrives.' || chr(10) ||
      'Fifth proper sentence closes this.'),
  (4, ''),
  (5, 'A tit perches on the branch quietly.' || chr(10) ||
      'Plenty of proper sentences follow now.' || chr(10) ||
      'Another proper sentence lands here.' || chr(10) ||
      'Yet another proper sentence arrives.' || chr(10) ||
      'Fifth proper sentence closes this.'),
  (6, 'An unmatched } hides in this sentence.' || chr(10) ||
      'Real text follows afterward here.')
), base AS (
  SELECT doc_id,
    list_filter(
      list_transform(string_split_regex(body, '\r?\n'), s -> trim(s)),
      s -> s <> '' AND regexp_matches(s, '[.!?"]$')
           AND len(list_filter(string_split_regex(s, '\s+'), w -> w <> '')) >= 3
           AND NOT contains(lower(s), 'javascript')
    ) AS kept,
    len(list_filter(
      list_transform(string_split_regex(body, '\r?\n'), s -> trim(s)),
      s -> s <> ''
    )) AS n_lines,
    contains(lower(body), 'lorem ipsum') AS has_lorem,
    (contains(body, '{') OR contains(body, '}')) AS has_brace,
    list_contains(
      list_transform(
        list_filter(string_split_regex(body, '\s+'), w -> w <> ''),
        w -> lower(regexp_replace(w, '[^A-Za-z]', '', 'g'))
      ),
      'tit'
    ) AS has_blocked
  FROM docs
), c AS (
  SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
         len(kept) AS n_kept, n_lines, has_lorem, has_brace, has_blocked
  FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       text_clean,
       CAST(n_kept AS BIGINT) AS n_lines_kept,
       CAST(n_lines - n_kept AS BIGINT) AS n_lines_dropped,
       CAST(len(regexp_extract_all(text_clean, '[.!?]+"?(?:\s|$)')) AS BIGINT) AS n_sentences,
       has_lorem AS has_lorem_ipsum,
       has_brace AS has_curly_brace,
       has_blocked AS has_blocked_word,
       (len(regexp_extract_all(text_clean, '[.!?]+"?(?:\s|$)')) >= 5
        AND NOT has_lorem AND NOT has_brace AND NOT has_blocked) AS keep
FROM c
"""

# Round 12 — PSL registrable domains (round-11 verdict #1). The oracle
# regenerates the hosts, embeds the matching-rule subset verbatim (the
# snapshot rules that match any test host — rules that match nothing
# cannot change the prevailing-rule selection), and recomputes the
# ENTIRE published PSL algorithm in SQL: right-aligned label match with
# '*' = exactly one label, exception-beats-all then longest-rule
# selection, public suffix + one label assembly, NULL for bare
# suffixes and IP literals. The heuristic twin is recomputed from its
# label rule, not copied.
ORACLES["crawl_registered_domain"] = r"""
WITH hosts(host) AS (VALUES
  ('alice.github.io'), ('deep.sub.alice.github.io'), ('github.io'),
  ('foo.bar.ck'), ('www.ck'), ('sub.www.ck'),
  ('com'), ('example.com'), ('a.b.example.com'), ('x.co.uk'),
  ('unknown.tld.zz'), ('zz'),
  ('city.kawasaki.jp'), ('x.some.kawasaki.jp'),
  ('s3.amazonaws.com'), ('bucket.s3.amazonaws.com'),
  ('192.168.0.1'), ('EXAMPLE.COM')
), rules(rule) AS (VALUES
  ('io'), ('github.io'),
  ('ck'), ('*.ck'), ('!www.ck'),
  ('com'), ('s3.amazonaws.com'),
  ('uk'), ('co.uk'),
  ('jp'), ('*.kawasaki.jp'), ('!city.kawasaki.jp')
), r AS (
  SELECT rule LIKE '!%' AS is_exc,
         list_reverse(string_split(
           CASE WHEN rule LIKE '!%' THEN substr(rule, 2) ELSE rule END, '.')) AS rl
  FROM rules
), h AS (
  SELECT host, lower(host) AS lh,
         list_reverse(string_split(lower(host), '.')) AS hl
  FROM hosts
), matched AS (
  SELECT h.host, r.is_exc, len(r.rl) AS n,
         row_number() OVER (PARTITION BY h.host
                            ORDER BY r.is_exc DESC, len(r.rl) DESC) AS rk
  FROM h JOIN r
    ON len(r.rl) <= len(h.hl)
   AND list_aggregate(
         list_transform(range(len(r.rl)),
                        i -> r.rl[i + 1] = '*' OR r.rl[i + 1] = h.hl[i + 1]),
         'bool_and')
), prevailing AS (
  SELECT h.host, h.lh, h.hl,
         CASE WHEN m.n IS NULL THEN 1
              WHEN m.is_exc THEN m.n - 1
              ELSE m.n END AS ps_n
  FROM h LEFT JOIN (SELECT * FROM matched WHERE rk = 1) m ON h.host = m.host
), psl AS (
  SELECT host, lh,
         CASE WHEN regexp_matches(lh, '^\d{1,3}(\.\d{1,3}){3}$')
                   OR contains(lh, ':')
                   OR len(hl) <= ps_n
              THEN NULL
              ELSE array_to_string(list_reverse(hl[1:ps_n + 1]), '.') END AS reg_psl
  FROM prevailing
), heur AS (
  SELECT lh,
         string_split(lh, '.') AS ls,
         len(string_split(lh, '.')) AS n
  FROM (SELECT DISTINCT lh FROM h)
), heur2 AS (
  SELECT lh,
         CASE WHEN n <= 1 THEN lh
              WHEN n >= 3 AND len(ls[n]) = 2
                   AND ls[n - 1] IN ('co', 'com', 'ac', 'gov', 'edu', 'org', 'net')
              THEN ls[n - 2] || '.' || ls[n - 1] || '.' || ls[n]
              ELSE ls[n - 1] || '.' || ls[n] END AS reg_heuristic
  FROM heur
)
SELECT p.host, p.reg_psl, x.reg_heuristic,
       coalesce(p.reg_psl = x.reg_heuristic, FALSE) AS agree
FROM psl p JOIN heur2 x ON p.lh = x.lh
"""

# Round 12 — the polite streaming frontier (round-11 verdict #2). The
# oracle regenerates the 96 raw URLs, recomputes canonicals by formula,
# attributes every canonical key to the batch that FIRST sees it (all
# raw spellings of one key share id-parity; _write_halves forces file
# order so batch 0 = even ids), reparses the robots corpus from the
# regenerated BODIES with the full crawl_robots_verdicts machinery
# (group selection for 'trainbot', wildcard/anchor regex compile,
# longest-match + Allow-ties verdicts), recomputes the group-scoped
# first-wins crawl delays, and re-derives the per-(batch, host) slot
# windows — nothing copied from the engine output.
ORACLES["s_stream_polite_frontier"] = r"""
WITH raw AS (
  SELECT i,
         CAST(i % 24 AS INTEGER) AS b,
         CAST((i % 24) % 5 AS INTEGER) AS k,
         CAST(i // 24 AS INTEGER) AS v,
         CAST(i % 2 AS INTEGER) AS half
  FROM range(96) t(i)
), urls AS (
  SELECT i, half,
         CASE WHEN v <= 2 THEN printf('https://h%d.example/p/%02d', k, b)
              ELSE printf('https://h%d.example/p/%02d?a=1&b=2', k, b)
         END AS url_canon
  FROM raw
), state AS (
  SELECT url_canon,
         count(*) AS n_seen,
         min(half) AS batch_id,
         lower(regexp_extract(url_canon, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS host,
         coalesce(nullif(regexp_extract(url_canon,
           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?#]*)', 1), ''), '/') AS path
  FROM urls GROUP BY url_canon
), bodies(rhost, body) AS (VALUES
  ('h0.example',
   'User-agent: trainbot' || chr(10) || 'Disallow: /p/0' || chr(10) ||
   'Crawl-delay: 2' || chr(10) ||
   'User-agent: *' || chr(10) || 'Disallow: /' || chr(10)),
  ('h1.example', 'User-agent: *' || chr(10) || 'Disallow: /' || chr(10)),
  ('h3.example',
   'User-agent: *' || chr(10) || 'Disallow: /p/*3$' || chr(10) ||
   'Crawl-delay: 0.5' || chr(10)),
  ('h4.example',
   'User-agent: megabot' || chr(10) || 'Disallow: /' || chr(10) ||
   'User-agent: *' || chr(10) || 'Allow: /' || chr(10) ||
   'Crawl-delay: 4' || chr(10))
), lines AS (
  SELECT rhost,
         unnest(string_split(body, chr(10))) AS rawline,
         unnest(range(len(string_split(body, chr(10))))) AS ln
  FROM bodies
), parsed AS (
  SELECT rhost, ln,
         lower(trim(regexp_extract(clean, '^([^:]*):', 1))) AS field,
         trim(regexp_extract(clean, '^[^:]*:(.*)$', 1)) AS value
  FROM (SELECT rhost, ln, trim(regexp_replace(rawline, '#.*$', '')) AS clean
        FROM lines)
  WHERE contains(clean, ':')
), rule_marked AS (
  SELECT rhost, ln, field, value,
         (field = 'user-agent') AS is_ua,
         coalesce(lag(field = 'user-agent')
                    OVER (PARTITION BY rhost ORDER BY ln), FALSE) AS prev_ua
  FROM parsed WHERE field IN ('user-agent', 'allow', 'disallow')
), rule_blocks AS (
  SELECT rhost, ln, field, value, is_ua,
         sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
           OVER (PARTITION BY rhost ORDER BY ln) AS block,
         max(CASE WHEN is_ua AND lower(value) = 'trainbot' THEN 1 ELSE 0 END)
           OVER (PARTITION BY rhost) AS has_token
  FROM rule_marked
), rule_agents AS (
  SELECT DISTINCT rhost, block, lower(value) AS agent
  FROM rule_blocks WHERE is_ua AND value <> ''
), rules AS (
  SELECT r.rhost, r.value AS pattern, (r.field = 'allow') AS allowed
  FROM (SELECT * FROM rule_blocks
        WHERE NOT is_ua AND NOT (field = 'disallow' AND value = '')) r
  JOIN rule_agents a ON r.rhost = a.rhost AND r.block = a.block
  WHERE a.agent = CASE WHEN r.has_token = 1 THEN 'trainbot' ELSE '*' END
), rule_re AS (
  SELECT rhost, pattern, allowed,
         '^' || replace(
           regexp_replace(
             CASE WHEN pattern LIKE '%$'
                  THEN substr(pattern, 1, len(pattern) - 1)
                  ELSE pattern END,
             '([\\\[\]{}()+?^$|.])', '\\\1', 'g'),
           '*', '.*')
         || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS re
  FROM rules
), del_marked AS (
  SELECT rhost, ln, field, value,
         (field = 'user-agent') AS is_ua,
         coalesce(lag(field = 'user-agent')
                    OVER (PARTITION BY rhost ORDER BY ln), FALSE) AS prev_ua
  FROM parsed
  WHERE field IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
), del_blocks AS (
  SELECT rhost, ln, field, value, is_ua,
         sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
           OVER (PARTITION BY rhost ORDER BY ln) AS block
  FROM del_marked
), del_agents AS (
  SELECT DISTINCT rhost, block, lower(value) AS agent
  FROM del_blocks WHERE is_ua AND value <> ''
), cd AS (
  SELECT rhost, block, ln, TRY_CAST(value AS DOUBLE) AS d
  FROM del_blocks
  WHERE field = 'crawl-delay'
    AND TRY_CAST(value AS DOUBLE) IS NOT NULL
    AND NOT isnan(TRY_CAST(value AS DOUBLE))
    AND TRY_CAST(value AS DOUBLE) >= 0
), per_agent AS (
  SELECT c.rhost, a.agent, arg_min(c.d, c.ln) AS d
  FROM cd c JOIN del_agents a ON c.rhost = a.rhost AND c.block = a.block
  GROUP BY c.rhost, a.agent
), sel AS (
  SELECT rhost, max(CASE WHEN agent = 'trainbot' THEN 1 ELSE 0 END) AS has_token
  FROM per_agent GROUP BY rhost
), delays AS (
  SELECT p.rhost, p.d
  FROM per_agent p JOIN sel s ON p.rhost = s.rhost
  WHERE p.agent = CASE WHEN s.has_token = 1 THEN 'trainbot' ELSE '*' END
), verdict AS (
  SELECT st.url_canon, st.n_seen, st.batch_id, st.host,
         coalesce(m.allowed, TRUE) AS allowed
  FROM state st
  LEFT JOIN (
    SELECT url_canon, allowed FROM (
      SELECT st2.url_canon, r.allowed,
             row_number() OVER (PARTITION BY st2.url_canon
                                ORDER BY len(r.pattern) DESC, r.allowed DESC) AS rk
      FROM state st2 JOIN rule_re r ON st2.host = r.rhost
      WHERE regexp_matches(st2.path, r.re)
    ) WHERE rk = 1
  ) m ON st.url_canon = m.url_canon
), sched AS (
  SELECT *, row_number() OVER (PARTITION BY batch_id, host
                               ORDER BY url_canon) - 1 AS slot
  FROM verdict WHERE allowed
)
SELECT CAST(s.batch_id AS BIGINT) AS batch_id,
       s.url_canon,
       CAST(s.n_seen AS BIGINT) AS n_seen,
       s.host,
       CAST(s.slot AS BIGINT) AS slot,
       CAST(round(s.slot * coalesce(d.d, 1.0) * 1000) AS BIGINT) AS fetch_at_ms
FROM sched s LEFT JOIN delays d ON s.host = d.rhost
"""

# Round 12 — the stacked curation pipeline (round-11 verdict #6). The
# oracle regenerates the synthetic pages FROM THE DOCUMENTS TABLE (8-word
# sentence lines + banner + doc_id-keyed injections) and recomputes all
# four stages in SQL: the 7-rule Gopher quality battery, the C4 line +
# page rules with the shared lookaround-free sentence count, the full
# repetition battery (positioned grams, tie-broken top grams,
# coverage-union duplicate grams) on the CLEANED text, and the corpus
# line-frequency dedup with its doc spine — chained CTEs, nothing read
# from the engine.
ORACLES["curation_pipeline_v2"] = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), pages AS (
  SELECT doc_id,
    'The banner text will be of use with all that respect.' || chr(10) ||
    CASE WHEN len(ws) > 0 THEN
      array_to_string(
        list_transform(range(CAST(ceil(len(ws) / 8.0) AS INT)),
                       i -> array_to_string(ws[i*8+1 : i*8+8], ' ') || '.'),
        chr(10))
    ELSE '' END ||
    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'no end punct line' ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'Short.' ELSE '' END ||
    CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'Some javascript inline here today.' ELSE '' END ||
    CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Code sample { x } here.' ELSE '' END ||
    CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'Mentions lorem ipsum once here.' ELSE '' END
    AS page
  FROM base
), gwords AS (
  SELECT doc_id, page,
    list_filter(string_split_regex(page, '\s+'), w -> w <> '') AS gws,
    list_filter(list_transform(string_split_regex(page, '\r?\n'), l -> trim(l)),
                l -> l <> '') AS glines
  FROM pages
), gopher AS (
  SELECT doc_id,
    len(gws) AS word_count,
    (len(gws) BETWEEN 50 AND 100000
     AND (coalesce(list_aggregate(list_transform(gws, w -> len(w)), 'sum'), 0)
          / greatest(len(gws), 1)) BETWEEN 3 AND 10
     AND (((len(page) - len(replace(page, '#', '')))
           + (len(page) - len(replace(page, '...', ''))) / 3.0)
          / greatest(len(gws), 1)) <= 0.1
     AND (len(list_filter(glines, l -> regexp_matches(l, '^[-*•]')))
          / greatest(len(glines), 1)) <= 0.9
     AND (len(list_filter(glines, l -> l LIKE '%...'))
          / greatest(len(glines), 1)) <= 0.3
     AND (len(list_filter(gws, w -> regexp_matches(w, '[A-Za-z]')))
          / greatest(len(gws), 1)) >= 0.8
     AND len(list_filter(['the','be','to','of','and','that','have','with'],
           s -> list_contains(
                  list_transform(gws,
                    w -> lower(regexp_replace(w, '[^A-Za-z]', '', 'g'))), s)))
         >= 2
    ) AS gopher_passes
  FROM gwords
), c4 AS (
  SELECT doc_id,
    list_filter(
      list_transform(string_split_regex(page, '\r?\n'), s -> trim(s)),
      s -> s <> '' AND regexp_matches(s, '[.!?"]$')
           AND len(list_filter(string_split_regex(s, '\s+'), w -> w <> '')) >= 3
           AND NOT contains(lower(s), 'javascript')
    ) AS kept,
    contains(lower(page), 'lorem ipsum') AS has_lorem,
    (contains(page, '{') OR contains(page, '}')) AS has_brace
  FROM pages
), c4c AS (
  SELECT doc_id, text_clean, n_sentences,
    (n_sentences >= 5 AND NOT has_lorem AND NOT has_brace) AS c4_keep
  FROM (
    SELECT doc_id,
      coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
      len(regexp_extract_all(coalesce(array_to_string(kept, chr(10)), ''),
                             '[.!?]+"?(?:\s|$)')) AS n_sentences,
      has_lorem, has_brace
    FROM c4
  )
), rbase AS (
  SELECT doc_id,
    list_filter(list_transform(string_split_regex(text_clean, '\r?\n'),
                               s -> trim(s)), s -> s <> '') AS lns,
    list_filter(list_transform(string_split_regex(text_clean, '(?:\r?\n){2,}'),
                               s -> trim(s)), s -> s <> '') AS pgs,
    list_filter(string_split_regex(lower(text_clean), '[^a-zA-Z0-9]+'),
                w -> w <> '') AS toks
  FROM c4c
), rstats AS (
  SELECT doc_id, toks,
    len(lns) AS n_ln, len(list_distinct(lns)) AS nd_ln,
    coalesce(list_aggregate(list_transform(lns, s -> len(s)), 'sum'), 0) AS c_ln,
    coalesce(list_aggregate(list_transform(list_distinct(lns), s -> len(s)), 'sum'), 0) AS cd_ln,
    len(pgs) AS n_pg, len(list_distinct(pgs)) AS nd_pg,
    coalesce(list_aggregate(list_transform(pgs, s -> len(s)), 'sum'), 0) AS c_pg,
    coalesce(list_aggregate(list_transform(list_distinct(pgs), s -> len(s)), 'sum'), 0) AS cd_pg,
    coalesce(list_aggregate(list_transform(toks, w -> len(w)), 'sum'), 0) AS tok_chars
  FROM rbase
), rpositions AS (
  SELECT doc_id, n, toks,
         unnest(range(greatest(len(toks) - n + 1, 0))) AS pos
  FROM rbase CROSS JOIN (VALUES (2), (3), (4), (5), (10)) ns(n)
), rgcnt AS (
  SELECT *, count(*) OVER (PARTITION BY doc_id, n, gram) AS cnt,
         len(gram) - (n - 1) AS glen
  FROM (
    SELECT doc_id, n, pos,
           array_to_string(toks[pos + 1 : pos + n], ' ') AS gram
    FROM rpositions
  )
), rtop AS (
  SELECT doc_id, n, cnt * glen AS top_chars
  FROM (
    SELECT doc_id, n, cnt, glen,
           row_number() OVER (PARTITION BY doc_id, n
                              ORDER BY cnt DESC, glen DESC, gram DESC) AS rk
    FROM (SELECT DISTINCT doc_id, n, gram, cnt, glen FROM rgcnt WHERE n IN (2, 3, 4))
  ) WHERE rk = 1
), rcov AS (
  SELECT DISTINCT doc_id, n, pos + unnest(range(n)) AS widx
  FROM rgcnt WHERE n IN (5, 10) AND cnt > 1
), rwords AS (
  SELECT doc_id, unnest(range(len(toks))) AS widx, unnest(toks) AS w FROM rbase
), rdupc AS (
  SELECT c.doc_id, c.n, sum(len(w.w)) AS dup_chars
  FROM rcov c JOIN rwords w ON c.doc_id = w.doc_id AND c.widx = w.widx
  GROUP BY 1, 2
), rpiv AS (
  SELECT s.doc_id,
    max(CASE WHEN t.n = 2 THEN t.top_chars END) AS top2,
    max(CASE WHEN t.n = 3 THEN t.top_chars END) AS top3,
    max(CASE WHEN t.n = 4 THEN t.top_chars END) AS top4,
    max(CASE WHEN d.n = 5 THEN d.dup_chars END) AS dup5,
    max(CASE WHEN d.n = 10 THEN d.dup_chars END) AS dup10
  FROM rstats s
  LEFT JOIN rtop t ON s.doc_id = t.doc_id
  LEFT JOIN rdupc d ON s.doc_id = d.doc_id
  GROUP BY 1
), rbp AS (
  SELECT s.doc_id,
    CASE WHEN n_ln = 0 THEN 0 ELSE (n_ln - nd_ln) * 10000 // n_ln END AS dup_line_frac_bp,
    CASE WHEN c_ln = 0 THEN 0 ELSE (c_ln - cd_ln) * 10000 // c_ln END AS dup_line_char_frac_bp,
    CASE WHEN n_pg = 0 THEN 0 ELSE (n_pg - nd_pg) * 10000 // n_pg END AS dup_para_frac_bp,
    CASE WHEN c_pg = 0 THEN 0 ELSE (c_pg - cd_pg) * 10000 // c_pg END AS dup_para_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(top2, 0) * 10000 // tok_chars END AS top2_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(top3, 0) * 10000 // tok_chars END AS top3_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(top4, 0) * 10000 // tok_chars END AS top4_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup5, 0) * 10000 // tok_chars END AS dup5_char_frac_bp,
    CASE WHEN tok_chars = 0 THEN 0 ELSE coalesce(dup10, 0) * 10000 // tok_chars END AS dup10_char_frac_bp
  FROM rstats s JOIN rpiv p ON s.doc_id = p.doc_id
), rep AS (
  SELECT doc_id, dup_line_frac_bp, top2_char_frac_bp, dup5_char_frac_bp,
    (dup_line_frac_bp <= 3000 AND dup_para_frac_bp <= 3000
     AND dup_line_char_frac_bp <= 2000 AND dup_para_char_frac_bp <= 2000
     AND top2_char_frac_bp <= 2000 AND top3_char_frac_bp <= 1800
     AND top4_char_frac_bp <= 1600
     AND dup5_char_frac_bp <= 1500 AND dup10_char_frac_bp <= 1000) AS rep_passes
  FROM rbp
), dlines AS (
  SELECT doc_id,
         unnest(string_split(text_clean, chr(10))) AS line,
         unnest(range(len(string_split(text_clean, chr(10))))) AS idx
  FROM c4c
), dfreq AS (
  SELECT trim(line) AS key, count(DISTINCT doc_id) AS n_docs
  FROM dlines WHERE length(trim(line)) >= 1
  GROUP BY 1
), dkept AS (
  SELECT l.doc_id, l.idx, l.line
  FROM dlines l LEFT JOIN dfreq f ON trim(l.line) = f.key
  WHERE length(trim(l.line)) < 1 OR f.n_docs <= 1
), dl AS (
  SELECT t.doc_id,
         coalesce(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS text_final,
         count(k.line) AS n_lines_kept,
         t.n_total - count(k.line) AS n_lines_dropped
  FROM (SELECT doc_id, count(*) AS n_total FROM dlines GROUP BY 1) t
  LEFT JOIN dkept k ON k.doc_id = t.doc_id
  GROUP BY t.doc_id, t.n_total
)
SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
       CAST(g.word_count AS BIGINT) AS word_count,
       g.gopher_passes,
       CAST(c.n_sentences AS BIGINT) AS n_sentences,
       c.c4_keep,
       CAST(r.dup_line_frac_bp AS BIGINT) AS dup_line_frac_bp,
       CAST(r.top2_char_frac_bp AS BIGINT) AS top2_char_frac_bp,
       CAST(r.dup5_char_frac_bp AS BIGINT) AS dup5_char_frac_bp,
       r.rep_passes,
       d.text_final,
       CAST(d.n_lines_kept AS BIGINT) AS n_lines_kept,
       CAST(d.n_lines_dropped AS BIGINT) AS n_lines_dropped,
       (g.gopher_passes AND c.c4_keep AND r.rep_passes) AS keep
FROM gopher g
JOIN c4c c ON g.doc_id = c.doc_id
JOIN rep r ON g.doc_id = r.doc_id
JOIN dl d ON g.doc_id = d.doc_id
"""

# Round 12 — the URL curation projection. The oracle recomputes every
# column from the raw URLs: regexp authority/path/query splits (the
# fixture has no userinfo/ports — crawl_url_canonical covers those),
# the generic-2LD label heuristic, and the full PSL matching algorithm
# (same machinery as crawl_registered_domain) over the embedded rules.
ORACLES["crawl_url_features"] = r"""
WITH urls(id, url) AS (VALUES
  (1, 'https://Sub.Example.COM/a/b/c?x=1&y=2'),
  (2, 'http://news.bbc.co.uk/politics'),
  (3, 'https://example.org'),
  (4, 'ftp://files.example.net/pub/'),
  (5, 'https://alice.github.io/p?x=1'),
  (6, 'http://foo.bar.ck/path/x'),
  (7, 'https://h.example/p/?a=1&b=2&c=3')
), u AS (
  SELECT id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) AS protocol,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM urls
), rules(rule) AS (VALUES
  ('com'), ('org'), ('net'), ('io'), ('github.io'),
  ('uk'), ('co.uk'), ('ck'), ('*.ck'), ('!www.ck')
), r AS (
  SELECT rule LIKE '!%' AS is_exc,
         list_reverse(string_split(
           CASE WHEN rule LIKE '!%' THEN substr(rule, 2) ELSE rule END, '.')) AS rl
  FROM rules
), h AS (
  SELECT id, host, list_reverse(string_split(host, '.')) AS hl FROM u
), matched AS (
  SELECT h.id, r.is_exc, len(r.rl) AS n,
         row_number() OVER (PARTITION BY h.id
                            ORDER BY r.is_exc DESC, len(r.rl) DESC) AS rk
  FROM h JOIN r
    ON len(r.rl) <= len(h.hl)
   AND list_aggregate(
         list_transform(range(len(r.rl)),
                        i -> r.rl[i + 1] = '*' OR r.rl[i + 1] = h.hl[i + 1]),
         'bool_and')
), psl AS (
  SELECT h.id,
         CASE WHEN regexp_matches(h.host, '^\d{1,3}(\.\d{1,3}){3}$')
                   OR contains(h.host, ':')
                   OR len(h.hl) <= ps_n
              THEN NULL
              ELSE array_to_string(list_reverse(h.hl[1:ps_n + 1]), '.') END AS reg_psl
  FROM h LEFT JOIN (SELECT * FROM matched WHERE rk = 1) m ON h.id = m.id,
       LATERAL (SELECT CASE WHEN m.n IS NULL THEN 1
                            WHEN m.is_exc THEN m.n - 1
                            ELSE m.n END AS ps_n) x
), heur AS (
  SELECT id,
         CASE WHEN n <= 1 THEN host
              WHEN n >= 3 AND len(ls[n]) = 2
                   AND ls[n - 1] IN ('co', 'com', 'ac', 'gov', 'edu', 'org', 'net')
              THEN ls[n - 2] || '.' || ls[n - 1] || '.' || ls[n]
              ELSE ls[n - 1] || '.' || ls[n] END AS reg_heuristic
  FROM (SELECT id, host, string_split(host, '.') AS ls,
               len(string_split(host, '.')) AS n FROM u)
)
SELECT CAST(u.id AS BIGINT) AS id, u.url, u.protocol, u.host,
       x.reg_heuristic, p.reg_psl,
       list_extract(string_split(u.host, '.'), len(string_split(u.host, '.'))) AS tld,
       CAST(len(list_filter(string_split(u.path, '/'), s -> s <> '')) AS BIGINT) AS path_depth,
       CAST(CASE WHEN u.query = '' THEN 0
                 ELSE len(string_split(u.query, '&')) END AS BIGINT) AS n_query_params,
       (u.protocol = 'https') AS is_secure
FROM u JOIN heur x ON u.id = x.id JOIN psl p ON u.id = p.id
"""

# Round 12 — DSIR importance resampling. The oracle recomputes the whole
# method: unigram+bigram explode, the md5 base-16 bucket fold (the
# hash_bucket twin), add-alpha smoothed target/raw distributions over
# the full 1024-bucket spine, per-occurrence (ln p - ln q) pinned 6 dp
# and folded as DECIMAL(28,6) (the token_entropy rule), doc spine for
# token-less docs, and the deterministic tie-broken top-100.
ORACLES["sample_dsir_weights"] = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS} AS tk FROM documents
), grams AS (
  SELECT doc_id, source, unnest(tk) AS gram FROM toks
  UNION ALL
  SELECT doc_id, source, tk[i + 1] || ' ' || tk[i + 2] AS gram
  FROM toks, unnest(range(greatest(len(tk) - 1, 0))) u(i)
), bucketed AS (
  SELECT doc_id, source,
         {_hex24_sql("'dsir:' || gram")} % 1024 AS bucket
  FROM grams
), t AS (
  SELECT bucket, count(*) AS tcnt FROM bucketed WHERE source = 'src18' GROUP BY 1
), r AS (
  SELECT bucket, count(*) AS rcnt FROM bucketed GROUP BY 1
), tot AS (
  SELECT (SELECT count(*) FROM bucketed WHERE source = 'src18') AS tt,
         (SELECT count(*) FROM bucketed) AS rt
), dim AS (
  SELECT s.range AS bucket,
         CAST(floor(ln((coalesce(t.tcnt, 0) + 1.0) / (tot.tt + 1024.0)) * 1e6 + 0.5) / 1e6
              AS DECIMAL(28,6))
       - CAST(floor(ln((coalesce(r.rcnt, 0) + 1.0) / (tot.rt + 1024.0)) * 1e6 + 0.5) / 1e6
              AS DECIMAL(28,6)) AS lr
  FROM range(1024) s
  LEFT JOIN t ON s.range = t.bucket
  LEFT JOIN r ON s.range = r.bucket
  CROSS JOIN tot
), scored AS (
  SELECT b.doc_id,
         CAST(count(*) AS BIGINT) AS n_features,
         CAST(sum(d.lr) AS DOUBLE) AS log_weight
  FROM bucketed b JOIN dim d ON b.bucket = d.bucket
  GROUP BY b.doc_id
), spined AS (
  SELECT x.doc_id,
         coalesce(s.n_features, 0) AS n_features,
         coalesce(s.log_weight, 0.0) AS log_weight
  FROM (SELECT doc_id FROM documents) x
  LEFT JOIN scored s ON x.doc_id = s.doc_id
)
SELECT doc_id,
       CAST(n_features AS BIGINT) AS n_features,
       log_weight,
       (row_number() OVER (ORDER BY log_weight DESC, doc_id ASC) <= 100) AS selected
FROM spined
"""

# Round 12 — distributed Bloom membership. The oracle recomputes the
# whole filter: the three salted md5 position hashes (the hash_bucket
# base-16 fold), the distinct set-bit relation over the even docs'
# text fingerprints, the all-k-positions probe, and the exact
# fingerprint-level ground truth.
_BLOOM_POS = [_hex24_sql(f"'bloom{i}:' || fp") + " % 2048" for i in range(3)]
ORACLES["dedup_bloom_probe"] = f"""
WITH keyed AS (
  SELECT doc_id, md5(text) AS fp FROM documents
), seenfp AS (
  SELECT DISTINCT fp FROM keyed WHERE doc_id % 2 = 0
), bits AS (
  SELECT DISTINCT bit FROM (
    SELECT unnest([{_BLOOM_POS[0]}, {_BLOOM_POS[1]}, {_BLOOM_POS[2]}]) AS bit
    FROM seenfp
  )
), pos AS (
  SELECT fp, unnest([{_BLOOM_POS[0]}, {_BLOOM_POS[1]}, {_BLOOM_POS[2]}]) AS bit
  FROM (SELECT DISTINCT fp FROM keyed)
), hit AS (
  SELECT p.fp, count(b.bit) = 3 AS maybe_seen
  FROM pos p LEFT JOIN bits b USING (bit)
  GROUP BY p.fp
)
SELECT k.doc_id,
       h.maybe_seen,
       (s.fp IS NOT NULL) AS seen_exact,
       (h.maybe_seen AND s.fp IS NULL) AS false_positive
FROM keyed k
JOIN hit h ON k.fp = h.fp
LEFT JOIN seenfp s ON k.fp = s.fp
"""

# Round 12 — CCNet perplexity buckets: the lm_quality machinery plus a
# per-language ntile over the fully-determinized (score, doc_id) order.
ORACLES["text_ccnet_buckets"] = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), v AS (
  SELECT token, count(*) AS c FROM t GROUP BY token
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS N FROM t
), scored AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(CAST(sum(CAST(log2(CAST(N AS DOUBLE)) - log2(CAST(c AS DOUBLE))
                             AS DECIMAL(38,18))) AS DOUBLE) / count(*), 9)
           AS bits_per_token
  FROM t JOIN v USING (token), n
  GROUP BY doc_id
), tiled AS (
  SELECT d.doc_id, d.lang, s.n_tokens, s.bits_per_token,
         CASE WHEN s.bits_per_token IS NULL THEN NULL
              ELSE ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY s.bits_per_token ASC, d.doc_id ASC)
         END AS tile
  FROM documents d JOIN scored s ON d.doc_id = s.doc_id
  UNION ALL
  SELECT d.doc_id, d.lang, NULL, NULL, NULL
  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
  WHERE s.doc_id IS NULL
)
SELECT doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       bits_per_token,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' WHEN 3 THEN 'tail' END AS bucket
FROM tiled
"""
