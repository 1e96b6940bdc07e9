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
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
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
WITH g AS (
  SELECT event_type,
         CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^[0-9]+$')
                   AND length(json_extract_string(props, '$.k')) <= 38
              THEN CAST(json_extract_string(props, '$.k') AS DECIMAL(38,0)) END AS amt
  FROM events
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

ORACLES["o3_pagination"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_custkey LIMIT 30 OFFSET 30
"""

ORACLES["o4_top_k"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 25
"""

# o5_seeded_sample: intentionally no oracle — rand(seed) is engine-specific.

ORACLES["setop_union_dedup"] = """
SELECT DISTINCT o_orderkey, o_custkey, o_totalprice
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 200000
)
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

ORACLES["c3_ts_convert"] = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       strftime(ts, '%d-%m-%Y') AS date_key,
       CAST(hour(ts) AS BIGINT) AS hour_of_day
FROM events
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
