"""DuckDB oracle SQL twins for plans/queries.py.

Each SQL string runs against DuckDB views named after the testdata
tables and must produce the same column names (and, after rounding,
the same values) as the matching Spark query. This systematizes the
reference repo's own validation design: every workload there exists as
both a SQL file and a PySpark file (SQL/*.txt ↔ pyspark/*.py).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["q01_pricing_summary"] = """
SELECT
    l_returnflag,
    l_linestatus,
    round(sum(l_quantity), 2)                                        AS sum_qty,
    round(sum(l_extendedprice), 2)                                   AS sum_base_price,
    round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 3)  AS sum_charge,
    round(avg(l_quantity), 4)                                        AS avg_qty,
    round(avg(l_extendedprice), 4)                                   AS avg_price,
    round(avg(l_discount), 4)                                        AS avg_disc,
    count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q02_engagement_rollup"] = """
WITH per_cust AS (
    SELECT
        c.c_custkey,
        c.c_mktsegment,
        count(o.o_orderkey) AS n_orders,
        coalesce(sum(o.o_totalprice), 0.0) AS spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
),
seg AS (
    SELECT *,
        CASE WHEN n_orders = 0 THEN 'Inactive'
             WHEN n_orders <= 5 THEN 'Light'
             WHEN n_orders <= 12 THEN 'Medium'
             ELSE 'Heavy' END AS order_segment
    FROM per_cust
)
SELECT
    c_mktsegment,
    order_segment,
    CAST(grouping(c_mktsegment) AS INTEGER)  AS g_mktsegment,
    CAST(grouping(order_segment) AS INTEGER) AS g_order_segment,
    count(*)                                 AS user_count,
    round(avg(n_orders), 4)                  AS avg_orders,
    round(avg(spend), 2)                     AS avg_spend,
    round(sum(spend), 2)                     AS total_spend
FROM seg
GROUP BY ROLLUP (c_mktsegment, order_segment)
HAVING count(*) > 10
ORDER BY g_mktsegment, g_order_segment, c_mktsegment, order_segment
"""

ORACLES["q03_sessionization"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT *,
        CASE WHEN prev_ts IS NULL
               OR (epoch_us(ts) / 1000000.0 - epoch_us(prev_ts) / 1000000.0) > 1800
             THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sess AS (
    SELECT *,
        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
),
per_session AS (
    SELECT user_id, session_seq,
        count(*) AS n_events,
        (max(epoch_us(ts) / 1000000.0) - min(epoch_us(ts) / 1000000.0)) / 60.0
            AS minutes,
        sum(value) AS sess_value
    FROM sess
    GROUP BY user_id, session_seq
)
SELECT
    user_id,
    count(*)                        AS n_sessions,
    round(avg(n_events), 4)         AS avg_session_events,
    round(avg(minutes), 4)          AS avg_session_minutes,
    max(n_events)                   AS max_session_events,
    round(sum(sess_value), 2)       AS total_value
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""

ORACLES["q04_churn_risk"] = """
WITH per_cust AS (
    SELECT
        c.c_custkey,
        c.c_mktsegment,
        CAST(sum(CASE WHEN o.o_orderdate >= TIMESTAMP '2000-08-01' THEN 1 ELSE 0 END) AS BIGINT)
            AS recent_orders,
        CAST(sum(CASE WHEN o.o_orderdate >= TIMESTAMP '1999-08-01'
                       AND o.o_orderdate < TIMESTAMP '2000-08-01' THEN 1 ELSE 0 END) AS BIGINT)
            AS hist_orders,
        round(coalesce(sum(CASE WHEN o.o_orderdate >= TIMESTAMP '2000-08-01'
                                THEN o.o_totalprice END), 0.0), 2) AS recent_spend,
        count(DISTINCT o.o_orderpriority) AS n_priorities
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
),
scored AS (
    SELECT *,
        (CASE WHEN recent_orders = 0 THEN 40 ELSE 0 END
         + CASE WHEN hist_orders > 0 AND (hist_orders - recent_orders) * 2 > hist_orders
                THEN 30 ELSE 0 END
         + CASE WHEN recent_spend < 50000 THEN 20 ELSE 0 END
         + CASE WHEN n_priorities <= 1 THEN 10 ELSE 0 END) AS risk_points,
        CASE WHEN recent_orders = 0 THEN 'Inactive'
             WHEN hist_orders > 0 AND (hist_orders - recent_orders) * 2 > hist_orders
                  THEN 'Declining'
             WHEN recent_orders < 3 THEN 'Light'
             ELSE 'Active' END AS churn_segment
    FROM per_cust
)
SELECT
    c_mktsegment,
    churn_segment,
    count(*)                                                        AS user_count,
    round(avg(risk_points), 4)                                      AS avg_risk_points,
    CAST(sum(CASE WHEN risk_points >= 60 THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_users,
    CAST(sum(CASE WHEN risk_points >= 30 AND risk_points < 60 THEN 1 ELSE 0 END) AS BIGINT)
        AS medium_risk_users,
    round(avg(recent_orders), 4)                                    AS avg_recent_orders,
    round(avg(hist_orders), 4)                                      AS avg_hist_orders
FROM scored
GROUP BY c_mktsegment, churn_segment
HAVING count(*) >= 5
ORDER BY c_mktsegment, churn_segment
"""

ORACLES["q05_cohort_retention"] = """
WITH activity AS (
    SELECT o_custkey AS entity,
           date_trunc('month', o_orderdate) AS month_ts,
           strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month
    FROM orders
),
first AS (
    SELECT entity, min(month_ts) AS cohort_ts, min(month) AS cohort_month
    FROM activity GROUP BY entity
),
matrix AS (
    SELECT f.cohort_month,
           datediff('month', f.cohort_ts, a.month_ts) AS month_offset,
           count(DISTINCT a.entity) AS active_entities
    FROM activity a JOIN first f ON a.entity = f.entity
    GROUP BY f.cohort_month, datediff('month', f.cohort_ts, a.month_ts)
)
SELECT cohort_month,
       CAST(month_offset AS INTEGER) AS month_offset,
       active_entities,
       round(active_entities * 100.0 /
             max(CASE WHEN month_offset = 0 THEN active_entities END)
                 OVER (PARTITION BY cohort_month), 4) AS retention_pct
FROM matrix
ORDER BY cohort_month, month_offset
"""

ORACLES["q06_market_basket"] = """
WITH items AS (
    SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
)
SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_count
FROM items a
JOIN items b ON a.basket = b.basket AND a.item < b.item
GROUP BY a.item, b.item
ORDER BY pair_count DESC, item_a, item_b
LIMIT 100
"""

ORACLES["q07_catalog_gap"] = """
WITH never AS (
    SELECT p.*
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
),
brand_totals AS (
    SELECT p_brand, count(*) AS n_parts FROM part GROUP BY p_brand
),
brand_missing AS (
    SELECT p_brand, count(*) AS n_never_ordered FROM never GROUP BY p_brand
)
SELECT t.p_brand,
       t.n_parts,
       coalesce(m.n_never_ordered, 0) AS n_never_ordered,
       round(coalesce(m.n_never_ordered, 0) * 100.0 / t.n_parts, 4)
           AS pct_never_ordered
FROM brand_totals t
LEFT JOIN brand_missing m ON t.p_brand = m.p_brand
ORDER BY t.p_brand
"""

ORACLES["q08_pivot_platform"] = """
WITH pivoted AS (
    SELECT user_id,
        count(*) FILTER (WHERE event_type = 'view')     AS n_view,
        count(*) FILTER (WHERE event_type = 'click')    AS n_click,
        count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        count(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events
    GROUP BY user_id
)
SELECT user_id, n_view, n_click, n_purchase, n_signup, n_error,
       (n_view + n_click + n_purchase + n_signup + n_error) AS n_total,
       round(CASE WHEN n_view > 0 THEN n_click * 1.0 / n_view END, 4)
           AS click_rate,
       round(CASE WHEN n_click > 0 THEN n_purchase * 1.0 / n_click END, 4)
           AS purchase_rate
FROM pivoted
ORDER BY user_id
"""

ORACLES["q09_geo_topk"] = """
WITH per_cust AS (
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           c.c_custkey AS custkey,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name, c.c_custkey
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY nation_name
                                 ORDER BY revenue DESC, custkey) AS rnk
    FROM per_cust
)
SELECT region_name, nation_name, CAST(rnk AS INTEGER) AS rnk, custkey, revenue
FROM ranked WHERE rnk <= 3
ORDER BY region_name, nation_name, rnk
"""

ORACLES["q10_seasonal"] = """
WITH monthly AS (
    SELECT CAST(month(o_orderdate) AS INTEGER) AS month,
           count(*) AS n_orders,
           sum(o_totalprice) AS revenue
    FROM orders
    GROUP BY month(o_orderdate)
)
SELECT month, n_orders,
       round(revenue, 2) AS revenue,
       round(revenue / avg(revenue) OVER (), 4) AS seasonal_index
FROM monthly
ORDER BY month
"""

ORACLES["q11_state_transitions"] = """
WITH pairs AS (
    SELECT lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS from_state,
           o_orderpriority AS to_state
    FROM orders
),
counts AS (
    SELECT from_state, to_state, count(*) AS n_transitions
    FROM pairs WHERE from_state IS NOT NULL
    GROUP BY from_state, to_state
)
SELECT from_state, to_state, n_transitions,
       round(n_transitions * 100.0 /
             sum(n_transitions) OVER (PARTITION BY from_state), 4) AS pct_of_from
FROM counts
ORDER BY from_state, to_state
"""

ORACLES["q12_ltv_deciles"] = """
WITH ltv AS (
    SELECT o_custkey,
           round(sum(o_totalprice), 2) AS ltv,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
),
tiled AS (
    SELECT *, ntile(10) OVER (ORDER BY ltv DESC, o_custkey) AS decile
    FROM ltv
)
SELECT CAST(decile AS INTEGER) AS decile,
       count(*) AS n_customers,
       round(avg(ltv), 2) AS avg_ltv,
       round(min(ltv), 2) AS min_ltv,
       round(max(ltv), 2) AS max_ltv,
       CAST(sum(n_orders) AS BIGINT) AS total_orders
FROM tiled
GROUP BY decile
ORDER BY decile
"""

ORACLES["q13_ab_test"] = """
SELECT
    CAST(user_id % 2 AS INTEGER) AS arm,
    count(*) AS n_events,
    count(DISTINCT user_id) AS n_users,
    round(avg(value), 4) AS mean_value,
    round(stddev_samp(value), 4) AS stddev_value,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_purchases,
    round(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1.0
          / count(*), 4) AS purchase_rate
FROM events
GROUP BY user_id % 2
ORDER BY arm
"""

ORACLES["q14_percentile_benchmark"] = """
WITH rev AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem GROUP BY l_suppkey
),
per_supp AS (
    SELECT s.s_suppkey AS suppkey, n.n_name AS nation_name, r.revenue
    FROM rev r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
),
ranked AS (
    SELECT *,
        round(percent_rank() OVER (PARTITION BY nation_name
                                   ORDER BY revenue), 6) AS pct_rank,
        CAST(ntile(4) OVER (PARTITION BY nation_name
                            ORDER BY revenue DESC, suppkey) AS INTEGER) AS quartile
    FROM per_supp
),
medians AS (
    SELECT nation_name,
        round(quantile_cont(revenue, 0.5), 2) AS nation_median_revenue,
        round(quantile_cont(revenue, 0.9), 2) AS nation_p90_revenue
    FROM per_supp GROUP BY nation_name
)
SELECT r.suppkey, r.nation_name, r.revenue, r.pct_rank, r.quartile,
       m.nation_median_revenue, m.nation_p90_revenue
FROM ranked r JOIN medians m ON r.nation_name = m.nation_name
ORDER BY r.suppkey
"""

ORACLES["q15_corr_features"] = """
SELECT
    p.p_type,
    count(*) AS n_lines,
    round(corr(l.l_discount, l.l_quantity), 4) + 0.0 AS corr_disc_qty,
    round(corr(l.l_extendedprice, l.l_quantity), 4) + 0.0 AS corr_price_qty,
    round(stddev_samp(l.l_quantity), 4) AS stddev_qty,
    round(avg(l.l_quantity), 4) AS avg_qty,
    round(avg(l.l_discount), 4) AS avg_disc
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_type
ORDER BY p.p_type
"""

ORACLES["q16_roi_deciles"] = """
WITH per_part AS (
    SELECT l.l_partkey,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           sum(l.l_quantity) AS qty
    FROM lineitem l
    GROUP BY l.l_partkey
),
with_roi AS (
    SELECT pp.l_partkey AS p_key,
           pp.revenue,
           round(pp.revenue / (p.p_retailprice * pp.qty), 6) AS roi
    FROM per_part pp
    JOIN part p ON pp.l_partkey = p.p_partkey
),
tiled AS (
    SELECT *, ntile(10) OVER (ORDER BY roi DESC, p_key) AS roi_decile
    FROM with_roi
)
SELECT CAST(roi_decile AS INTEGER) AS roi_decile,
       count(*) AS n_parts,
       round(avg(roi), 6) AS avg_roi,
       round(sum(revenue), 4) AS total_revenue,
       round(avg(revenue), 4) AS avg_revenue
FROM tiled
GROUP BY roi_decile
ORDER BY roi_decile
"""

ORACLES["q17_daily_growth"] = """
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d')
)
SELECT day, n_events, total_value,
       round((n_events - lag(n_events) OVER (ORDER BY day)) * 100.0
             / lag(n_events) OVER (ORDER BY day), 4) AS growth_pct,
       lead(n_events) OVER (ORDER BY day) AS next_events,
       round((lead(n_events) OVER (ORDER BY day) - n_events) * 100.0
             / n_events, 4) AS fwd_growth_pct,
       round(avg(n_events) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7_events
FROM daily
ORDER BY day
"""

ORACLES["q18_distribution_stats"] = """
WITH per_cust AS (
    SELECT c.c_custkey, c.c_nationkey, count(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_nationkey
)
SELECT n.n_name AS nation_name,
       count(*) AS n_customers,
       round(avg(n_orders), 4) AS avg_orders,
       round(stddev_samp(n_orders), 4) AS stddev_orders,
       round(quantile_cont(n_orders, 0.5), 4) AS median_orders,
       min(n_orders) AS min_orders,
       max(n_orders) AS max_orders
FROM per_cust pc
JOIN nation n ON pc.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""

ORACLES["q19_funnel_conversion"] = """
WITH per_user AS (
    SELECT user_id,
        CAST(user_id % 5 AS INTEGER) AS channel,
        max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
        max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
    FROM events
    GROUP BY user_id
),
agg AS (
    SELECT channel,
        count(*) AS n_users,
        CAST(sum(saw) AS BIGINT) AS viewers,
        CAST(sum(CASE WHEN saw = 1 AND clicked = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS clickers,
        CAST(sum(CASE WHEN saw = 1 AND clicked = 1 AND purchased = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS purchasers
    FROM per_user
    GROUP BY channel
)
SELECT channel, n_users, viewers, clickers, purchasers,
       round(CASE WHEN viewers > 0 THEN clickers * 1.0 / viewers END, 4)
           AS view_to_click,
       round(CASE WHEN clickers > 0 THEN purchasers * 1.0 / clickers END, 4)
           AS click_to_purchase
FROM agg
ORDER BY channel
"""

ORACLES["q20_reco_precision"] = """
WITH parsed AS (
    SELECT *,
        CAST(regexp_extract(props, '[0-9]+') AS INTEGER) % 3 AS algorithm_version,
        CAST(regexp_extract(props, '[0-9]+') AS INTEGER) AS k
    FROM events
)
SELECT CAST(algorithm_version AS INTEGER) AS algorithm_version,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(avg(value), 4) AS avg_value,
       round(avg(k), 4) AS avg_k,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchases,
       round(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS purchase_rate
FROM parsed
GROUP BY algorithm_version
ORDER BY algorithm_version
"""

ORACLES["q21_topk_per_group"] = """
WITH rev AS (
    SELECT n.n_name AS nation_name,
           l.l_partkey AS partkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name, l.l_partkey
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY nation_name
                                 ORDER BY revenue DESC, partkey) AS rnk
    FROM rev
)
SELECT nation_name, CAST(rnk AS INTEGER) AS rnk, partkey, revenue
FROM ranked WHERE rnk <= 5
ORDER BY nation_name, rnk
"""

ORACLES["q22_setops_except"] = """
WITH urgent AS (
    SELECT DISTINCT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
),
low AS (
    SELECT DISTINCT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '5-LOW'
)
SELECT 'urgent_only' AS cohort, custkey FROM (
    SELECT custkey FROM urgent EXCEPT SELECT custkey FROM low
)
UNION ALL
SELECT 'both' AS cohort, custkey FROM (
    SELECT custkey FROM urgent INTERSECT SELECT custkey FROM low
)
ORDER BY cohort, custkey
"""

ORACLES["q23_exists_semijoin"] = """
SELECT c.c_mktsegment,
       count(*) AS n_customers,
       round(avg(c.c_acctbal), 4) AS avg_acctbal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

ORACLES["q24_conditional_pivot_cube"] = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
"""

ORACLES["t01_text_quality"] = """
WITH feats AS (
    SELECT doc_id,
        length(text) AS n_chars,
        len(string_split(text, ' ')) AS n_tokens,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        len(list_filter(string_split(text, ' '),
                        t -> t IN ('a', 'the'))) AS n_stop
    FROM documents
),
ratios AS (
    SELECT doc_id,
        n_tokens,
        round(n_punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
        round(n_stop * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
        round((n_chars - (n_tokens - 1)) * 1.0 / greatest(n_tokens, 1), 6) AS avg_token_len
    FROM feats
)
SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, avg_token_len,
    (CASE WHEN n_tokens >= 50 THEN 40 WHEN n_tokens >= 20 THEN 25
          WHEN n_tokens >= 5 THEN 10 ELSE 0 END
     + CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.2 THEN 30 ELSE 10 END
     + CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10 THEN 30 ELSE 10 END)
        AS quality_score
FROM ratios
ORDER BY doc_id
"""

ORACLES["t02_lang_id"] = """
WITH scored AS (
    SELECT lang,
        len(list_filter(string_split(text,' '), t -> t IN ('the','a','of')))  AS score_en,
        len(list_filter(string_split(text,' '), t -> t IN ('le','la','et')))  AS score_fr,
        len(list_filter(string_split(text,' '), t -> t IN ('el','la','de')))  AS score_es,
        len(list_filter(string_split(text,' '), t -> t IN ('der','die','und'))) AS score_de,
        len(list_filter(string_split(text,' '), t -> t IN ('的','是','了')))   AS score_zh
    FROM documents
),
best AS (
    SELECT lang,
        greatest(score_en, score_fr, score_es, score_de, score_zh) AS best_score,
        CASE WHEN greatest(score_en, score_fr, score_es, score_de, score_zh) = 0 THEN 'und'
             WHEN score_en = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'en'
             WHEN score_fr = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'fr'
             WHEN score_es = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'es'
             WHEN score_de = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'de'
             ELSE 'zh' END AS predicted_lang
    FROM scored
)
SELECT lang, predicted_lang, count(*) AS n_docs
FROM best
GROUP BY lang, predicted_lang
ORDER BY lang, predicted_lang
"""

ORACLES["t03_token_count"] = """
WITH counted AS (
    SELECT source,
        len(string_split(text, ' ')) AS ws_tokens,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens
    FROM documents
)
SELECT source,
    count(*) AS n_docs,
    CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
    CAST(sum(bpe_ish_tokens) AS BIGINT) AS total_bpe_ish_tokens,
    round(avg(ws_tokens), 4) AS avg_ws_tokens,
    round(avg(bpe_ish_tokens), 4) AS avg_bpe_ish_tokens
FROM counted
GROUP BY source
ORDER BY source
"""

ORACLES["t04_fingerprint"] = """
SELECT doc_id,
    md5(lower(trim(text))) AS exact_fp,
    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        AS bag_fp
FROM documents
ORDER BY doc_id
"""

# Mirrors tfidf_top_terms exactly: same tokenization (single-space
# split, len >= 3), same rational idf with IDENTICAL operator order —
# tf * (N - df + 0.5) / (df + 0.5) associates left in both engines,
# so the doubles are bit-equal and the rank tiebreak sets match.
ORACLES["t05_tfidf_terms"] = """
WITH exploded AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
    FROM documents
),
toks AS (
    SELECT doc, term FROM exploded WHERE len(term) >= 3
),
tf AS (
    SELECT doc, term, count(*) AS tf
    FROM toks GROUP BY doc, term
),
doc_freq AS (
    SELECT term, count(*) AS doc_freq
    FROM tf GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc, tf.term, tf.tf, doc_freq.doc_freq,
        tf.tf * (n.n_docs - doc_freq.doc_freq + 0.5)
            / (doc_freq.doc_freq + 0.5) AS score
    FROM tf JOIN doc_freq USING (term) CROSS JOIN n
),
ranked AS (
    SELECT doc, term, tf, doc_freq, score,
        row_number() OVER (PARTITION BY doc ORDER BY score DESC, term)
            AS rnk
    FROM scored
)
SELECT doc AS doc_id, rnk, term, CAST(tf AS BIGINT) AS tf,
    CAST(doc_freq AS BIGINT) AS doc_freq, round(score, 6) AS score
FROM ranked
WHERE rnk <= 3
ORDER BY doc_id, rnk
"""

# q45's merged partials must be BIT-IDENTICAL to this full recompute —
# the decomposable-aggregate maintenance invariant. (Sums of exact-2dp
# money values are multiples of 0.01, so the 2dp round sits 0.005 from
# any boundary — summation-order ulps cannot flip it.)
ORACLES["q45_incremental_agg"] = """
SELECT o_orderpriority,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total_price,
    min(o_totalprice) AS min_price,
    max(o_totalprice) AS max_price,
    round(sum(o_totalprice) / count(*), 4) AS avg_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# Mirrors skew_profile: per-key counts, heaviest key picked by
# (count, key-string) max-struct order (ties -> lexicographically
# largest key), integer ppm/x1000 derived metrics.
ORACLES["q44_skew_profile"] = """
WITH profiles AS (
    SELECT 'event_type' AS key_col, CAST(event_type AS VARCHAR) AS k,
        count(*) AS n
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'user_id', CAST(user_id AS VARCHAR), count(*)
    FROM events GROUP BY 2
),
rolled AS (
    SELECT key_col,
        CAST(sum(n) AS BIGINT) AS n_rows,
        CAST(count(*) AS BIGINT) AS n_keys,
        max(struct_pack(n := n, k := k)) AS top
    FROM profiles GROUP BY key_col
)
SELECT key_col, n_rows, n_keys,
    top.n AS max_key_n,
    top.k AS top_key,
    (1000000 * top.n) // n_rows AS top_ppm,
    (1000 * n_rows) // n_keys AS avg_group_x1000,
    (1000000 * top.n * n_keys) // n_rows AS skew_ppm
FROM rolled
ORDER BY key_col
"""

# Mirrors repetition_stats exactly: same single-space tokenization,
# 1-based gram windows (DuckDB list slice is 1-based inclusive, Spark
# slice(arr, i, n) is 1-based + length), identical integer-ppm
# arithmetic ((1e6 * num) // den == Spark's `div`), identical top-1
# tiebreak (cnt DESC, gram lexicographic — both engines binary-collate).
ORACLES["t06_repetition"] = """
WITH base AS (
    SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS toks
    FROM documents
),
tok_stats AS (
    SELECT doc_id,
        len(toks) AS n_tokens,
        len(list_distinct(toks)) AS n_distinct_tokens
    FROM base
),
bigrams AS (
    SELECT doc_id, n_chars, array_to_string(toks[i : i + 1], ' ') AS gram
    FROM base, unnest(range(1, len(toks))) AS t(i)
),
trigrams AS (
    SELECT doc_id, n_chars, array_to_string(toks[i : i + 2], ' ') AS gram
    FROM base, unnest(range(1, len(toks) - 1)) AS t(i)
),
top_bg AS (
    SELECT doc_id, gram AS top_bigram,
        (1000000 * cnt * length(gram)) // n_chars AS top_bigram_ppm
    FROM (
        SELECT doc_id, n_chars, gram, count(*) AS cnt,
            row_number() OVER (
                PARTITION BY doc_id ORDER BY count(*) DESC, gram
            ) AS rn
        FROM bigrams GROUP BY doc_id, n_chars, gram
    ) WHERE rn = 1
),
dup_tri AS (
    SELECT doc_id,
        CAST((1000000 * sum(cnt * length(gram))) // n_chars AS BIGINT)
            AS dup_trigram_ppm
    FROM (
        SELECT doc_id, n_chars, gram, count(*) AS cnt
        FROM trigrams GROUP BY doc_id, n_chars, gram
    ) WHERE cnt > 1
    GROUP BY doc_id, n_chars
),
joined AS (
    SELECT s.doc_id, s.n_tokens,
        (1000000 * (s.n_tokens - s.n_distinct_tokens)) // s.n_tokens
            AS dup_token_ppm,
        b.top_bigram,
        coalesce(b.top_bigram_ppm, 0) AS top_bigram_ppm,
        coalesce(d.dup_trigram_ppm, 0) AS dup_trigram_ppm
    FROM tok_stats s
    LEFT JOIN top_bg b USING (doc_id)
    LEFT JOIN dup_tri d USING (doc_id)
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
    dup_token_ppm, top_bigram, top_bigram_ppm, dup_trigram_ppm,
    CAST(top_bigram_ppm > 200000 OR dup_trigram_ppm > 600000 AS INT)
        AS repetitive
FROM joined
ORDER BY doc_id
"""

# Mirrors vocab_stats: same tokenization, same top-10 tiebreak
# (cnt DESC, term lexicographic), same integer-ppm division.
ORACLES["t08_quality_classifier"] = """
WITH feats AS (
    SELECT doc_id,
        length(text) AS n_chars,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        len(list_filter(string_split(text, ' '),
                        t -> t IN ('a', 'the'))) AS n_stop
    FROM documents
),
scored AS (
    SELECT doc_id,
        least(n_tokens, 100) * 3000
        + greatest(0, 250000 - abs((n_stop * 1000000 // greatest(n_tokens, 1)) - 100000))
        + greatest(0, 150000 - 2 * (n_punct * 1000000 // greatest(n_chars, 1)))
        + ((n_distinct * 1000000 // greatest(n_tokens, 1)) * 3 // 10) AS score_ppm
    FROM feats
)
SELECT doc_id,
    CAST(score_ppm AS BIGINT) AS score_ppm,
    CAST(CASE WHEN score_ppm >= 700000 THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM scored
ORDER BY doc_id
"""

ORACLES["t07_vocab_stats"] = """
WITH term_counts AS (
    SELECT lang, term, count(*) AS cnt
    FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    GROUP BY lang, term
),
ranked AS (
    SELECT lang, cnt,
        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rnk
    FROM term_counts
),
agg AS (
    SELECT lang,
        CAST(count(*) AS BIGINT) AS vocab_size,
        CAST(sum(cnt) AS BIGINT) AS total_tokens,
        CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_terms,
        CAST(sum(CASE WHEN rnk <= 10 THEN cnt ELSE 0 END) AS BIGINT) AS topk_tokens
    FROM ranked GROUP BY lang
)
SELECT lang, vocab_size, total_tokens, hapax_terms, topk_tokens,
    (1000000 * topk_tokens) // total_tokens AS topk_coverage_ppm,
    (1000000 * hapax_terms) // vocab_size AS hapax_ppm
FROM agg
ORDER BY lang
"""

# Mirrors p06: t01's quality score feeds a per-source greedy prefix
# under a 500-token budget (quality DESC, doc_id tiebreak). Token
# counts are >= 1, so cum <= budget is a prefix in both engines.
ORACLES["p06_token_budget"] = """
WITH feats AS (
    SELECT doc_id, source,
        length(text) AS n_chars,
        len(string_split(text, ' ')) AS n_tokens,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        len(list_filter(string_split(text, ' '),
                        t -> t IN ('a', 'the'))) AS n_stop
    FROM documents
),
ratios AS (
    SELECT doc_id, source, n_tokens,
        round(n_stop * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
        round((n_chars - (n_tokens - 1)) * 1.0 / greatest(n_tokens, 1), 6) AS avg_token_len
    FROM feats
),
scored AS (
    SELECT doc_id, source, n_tokens AS ws_tokens,
        (CASE WHEN n_tokens >= 50 THEN 40 WHEN n_tokens >= 20 THEN 25
              WHEN n_tokens >= 5 THEN 10 ELSE 0 END
         + CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.2 THEN 30 ELSE 10 END
         + CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10 THEN 30 ELSE 10 END)
            AS quality_score
    FROM ratios
),
ranked AS (
    SELECT source, doc_id, quality_score, ws_tokens,
        row_number() OVER (
            PARTITION BY source ORDER BY quality_score DESC, doc_id
        ) AS sel_rank,
        CAST(sum(ws_tokens) OVER (
            PARTITION BY source ORDER BY quality_score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS cum_tokens
    FROM scored
)
SELECT source, sel_rank, doc_id, quality_score, ws_tokens, cum_tokens
FROM ranked
WHERE cum_tokens <= 500
ORDER BY source, sel_rank
"""

# Mirrors duplicated_spans: positional 4-grams, cross-doc equi-join
# (doc_a < doc_b), lag-gap span chaining per (pair, diagonal), spans
# >= 6 tokens rolled up per pair. The engine's single-doc-gram pruning
# is semantics-preserving, so the oracle skips it.
# Mirrors seeded_shuffle_rank: identical md5(seed:doc_id) hex in both
# engines, identical (key, id) total order.
ORACLES["p07_epoch_shuffle"] = """
WITH keyed AS (
    SELECT doc_id, source,
        md5('0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
)
SELECT row_number() OVER (ORDER BY shuffle_key, doc_id) AS epoch_rank,
    doc_id, shuffle_key, source
FROM keyed
ORDER BY epoch_rank
"""

ORACLES["d10_span_dedup"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
    SELECT doc_id, i AS pos, array_to_string(t[i : i + 3], ' ') AS gram
    FROM toks, unnest(range(1, len(t) - 2)) AS u(i)
),
m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        a.pos AS pos_a, b.pos AS pos_b
    FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
runs AS (
    SELECT doc_a, doc_b, pos_a, pos_b,
        CASE WHEN lag(pos_a) OVER w = pos_a - 1 THEN 0 ELSE 1 END AS brk
    FROM m
    WINDOW w AS (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a)
),
numbered AS (
    SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a,
        sum(brk) OVER (
            PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS span_id
    FROM runs
),
spans AS (
    SELECT doc_a, doc_b, diag, span_id, count(*) + 3 AS span_tokens
    FROM numbered GROUP BY doc_a, doc_b, diag, span_id
    HAVING count(*) + 3 >= 6
)
SELECT doc_a, doc_b,
    CAST(count(*) AS BIGINT) AS n_spans,
    CAST(max(span_tokens) AS BIGINT) AS max_span_tokens,
    CAST(sum(span_tokens) AS BIGINT) AS total_span_tokens
FROM spans
GROUP BY doc_a, doc_b
ORDER BY doc_a, doc_b
"""

ORACLES["d01_dedup_exact"] = """
WITH keyed AS (
    SELECT source,
        md5(lower(trim(text))) AS exact_fp,
        md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
            AS bag_fp
    FROM documents
)
SELECT source,
    count(*) AS n_docs,
    count(DISTINCT exact_fp) AS n_unique_exact,
    count(DISTINCT bag_fp) AS n_unique_bag,
    round((count(*) - count(DISTINCT exact_fp)) * 100.0 / count(*), 4)
        AS exact_dup_pct,
    round((count(*) - count(DISTINCT bag_fp)) * 100.0 / count(*), 4)
        AS bag_dup_pct
FROM keyed
GROUP BY source
ORDER BY source
"""

ORACLES["d02_dedup_ngram_jaccard"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
    SELECT doc_id,
        unnest(CASE WHEN len(t) >= 3 THEN
            list_distinct(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [array_to_string(t, ' ')] END) AS shingle
    FROM toks
),
sizes AS (
    SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.inter,
    sa.n_sh AS n_a, sb.n_sh AS n_b,
    round(i.inter * 1.0 / (sa.n_sh + sb.n_sh - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
"""

ORACLES["s01_cosine_topk"] = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
),
pairs AS (
    SELECT q.query_id, e.vec_id AS cand_id,
        round(
            list_dot_product(
                list_transform(q.q_vec, x -> CAST(x AS DOUBLE)),
                list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
            / (sqrt(list_dot_product(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)),
                                     list_transform(q.q_vec, x -> CAST(x AS DOUBLE))))
               * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                       list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
            6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM pairs
)
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, cand_id, cosine
FROM ranked WHERE rnk <= 5
ORDER BY query_id, rnk
"""

ORACLES["q25_asof_attribution"] = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
views AS (
    SELECT user_id, ts FROM events WHERE event_type = 'view'
),
attributed AS (
    SELECT p.user_id, p.ts, v.ts AS asof_view_ts
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
)
SELECT user_id,
    count(*) AS n_purchases,
    CAST(sum(CASE WHEN asof_view_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_attributed,
    round(avg((epoch_us(ts) / 1000000.0 - epoch_us(asof_view_ts) / 1000000.0) / 60.0), 4)
        AS avg_minutes_to_convert
FROM attributed
GROUP BY user_id
ORDER BY user_id
"""

ORACLES["q26_rolling_window"] = """
WITH rolled AS (
    SELECT o_custkey,
        round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey
            ORDER BY datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            RANGE BETWEEN 89 PRECEDING AND CURRENT ROW), 2) AS rolling90_revenue
    FROM orders
)
SELECT o_custkey AS custkey,
    count(*) AS n_orders,
    round(max(rolling90_revenue), 2) AS peak_rolling90,
    round(sum(rolling90_revenue), 2) AS sum_rolling90
FROM rolled
GROUP BY o_custkey
ORDER BY custkey
"""

ORACLES["q28_gap_fill"] = """
WITH bounds AS (
    SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events
),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
    SELECT t.event_type,
           CAST(unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY)) AS DATE) AS day
    FROM types t, bounds b
),
daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
    FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT s.event_type,
    strftime(s.day, '%Y-%m-%d') AS day,
    CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
    CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS was_filled
FROM spine s
LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
ORDER BY s.event_type, s.day
"""

ORACLES["q29_scd2_merge"] = """
WITH dim AS (
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           round(c_acctbal, 2) AS acctbal,
           '1995-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
    FROM customer
),
updates AS (
    SELECT c_custkey AS custkey, 'PROMOTED' AS segment,
           round(c_acctbal + 100, 2) AS acctbal
    FROM customer WHERE c_custkey % 10 = 0
),
joined AS (
    SELECT d.*, u.segment AS new_segment, u.acctbal AS new_acctbal
    FROM dim d LEFT JOIN updates u ON d.custkey = u.custkey
),
changed AS (
    SELECT * FROM joined
    WHERE new_segment IS NOT NULL
      AND (segment IS DISTINCT FROM new_segment
           OR acctbal IS DISTINCT FROM new_acctbal)
)
SELECT custkey, segment, acctbal, valid_from, '2000-01-01' AS valid_to
FROM changed
UNION ALL
SELECT custkey, new_segment, new_acctbal, '2000-01-01', NULL FROM changed
UNION ALL
SELECT custkey, segment, acctbal, valid_from, valid_to
FROM joined
WHERE new_segment IS NULL
   OR (segment IS NOT DISTINCT FROM new_segment
       AND acctbal IS NOT DISTINCT FROM new_acctbal)
ORDER BY custkey, valid_from, valid_to
"""

ORACLES["q30_sql_surface"] = """
SELECT n.n_name AS nation_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation_name
"""

ORACLES["q31_unpivot"] = """
WITH wide AS (
    SELECT c.c_mktsegment,
           round(sum(o.o_totalprice), 2) AS total_spend,
           round(avg(o.o_totalprice), 4) AS avg_spend,
           round(max(o.o_totalprice), 2) AS max_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
)
SELECT c_mktsegment, metric, value FROM (
    SELECT c_mktsegment, 'total_spend' AS metric, total_spend AS value FROM wide
    UNION ALL
    SELECT c_mktsegment, 'avg_spend', avg_spend FROM wide
    UNION ALL
    SELECT c_mktsegment, 'max_spend', max_spend FROM wide
)
ORDER BY c_mktsegment, metric
"""

ORACLES["q32_collect_agg"] = """
SELECT c.c_mktsegment,
       array_to_string(list_sort(list(DISTINCT o.o_orderpriority)), ',')
           AS priorities_seen,
       count(DISTINCT o.o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

# d05's oracle is defined below _minhash_pairs_sql (it reuses the
# mirrored LSH candidate CTEs for content blocking).

ORACLES["q33_data_quality"] = """
WITH agg AS (
    SELECT count(*) AS total,
        sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS l_orderkey_null,
        sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS l_shipdate_null,
        sum(CASE WHEN l_discount IS NOT NULL
                  AND (l_discount < 0.0 OR l_discount > 0.5) THEN 1 ELSE 0 END)
            AS l_discount_out_of_range,
        sum(CASE WHEN l_quantity IS NOT NULL
                  AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 ELSE 0 END)
            AS l_quantity_out_of_range,
        sum(CASE WHEN l_extendedprice IS NOT NULL
                  AND (l_extendedprice < 0.0 OR l_extendedprice > 200000.0)
                 THEN 1 ELSE 0 END) AS l_extendedprice_out_of_range,
        sum(CASE WHEN l_returnflag IS NOT NULL
                  AND NOT regexp_matches(l_returnflag, '^[ANR]$')
                 THEN 1 ELSE 0 END) AS l_returnflag_bad_format
    FROM lineitem
)
SELECT check_name,
       CAST(n_violations AS BIGINT) AS n_violations,
       round(n_violations * 100.0 / total, 6) AS violation_pct
FROM (
    SELECT total, 'l_orderkey_null' AS check_name, l_orderkey_null AS n_violations FROM agg
    UNION ALL SELECT total, 'l_shipdate_null', l_shipdate_null FROM agg
    UNION ALL SELECT total, 'l_discount_out_of_range', l_discount_out_of_range FROM agg
    UNION ALL SELECT total, 'l_quantity_out_of_range', l_quantity_out_of_range FROM agg
    UNION ALL SELECT total, 'l_extendedprice_out_of_range', l_extendedprice_out_of_range FROM agg
    UNION ALL SELECT total, 'l_returnflag_bad_format', l_returnflag_bad_format FROM agg
)
ORDER BY check_name
"""

ORACLES["q34_interval_attribution"] = """
-- deliberately written in the reference's correlated-subquery style
-- (DuckDB decorrelates); the Spark side uses the join re-expression.
WITH per_order AS (
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
        CASE WHEN EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate >= o.o_orderdate
              AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        ) THEN 1 ELSE 0 END AS shipped_30d,
        (SELECT min(datediff('day', o.o_orderdate, l.l_shipdate))
         FROM lineitem l
         WHERE l.l_orderkey = o.o_orderkey
           AND l.l_shipdate >= o.o_orderdate) AS days_to_first_ship
    FROM orders o
)
SELECT o_orderpriority,
    count(*) AS total_orders,
    CAST(sum(shipped_30d) AS BIGINT) AS shipped_within_30d,
    round(avg(shipped_30d) * 100, 4) AS acceptance_rate,
    round(avg(CASE WHEN shipped_30d = 1 THEN days_to_first_ship END), 4)
        AS avg_days_to_first_ship,
    round(corr(o_totalprice, shipped_30d), 4) + 0.0 AS corr_price_shipped
FROM per_order
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["q35_binge_pipeline"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT *,
        CASE WHEN prev_ts IS NULL
               OR (epoch_us(ts) / 1000000.0 - epoch_us(prev_ts) / 1000000.0) > 1800
             THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sess AS (
    SELECT *,
        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
),
per_session AS (
    SELECT user_id, session_seq,
        count(*) AS n_events,
        (max(epoch_us(ts) / 1000000.0) - min(epoch_us(ts) / 1000000.0)) / 60.0
            AS minutes,
        hour(min(ts)) AS start_hour
    FROM sess GROUP BY user_id, session_seq
),
binges AS (
    SELECT *,
        CASE WHEN n_events >= 8 THEN 'High Intensity Binge'
             WHEN n_events >= 6 THEN 'Moderate Binge'
             ELSE 'Casual Binge' END AS intensity
    FROM per_session WHERE n_events >= 4
),
user_behavior AS (
    SELECT user_id, count(*) AS n_binges
    FROM binges GROUP BY user_id
),
heavy AS (
    SELECT user_id, n_binges FROM user_behavior WHERE n_binges >= 2
)
SELECT b.intensity,
    count(*) AS n_binge_sessions,
    count(DISTINCT b.user_id) AS n_users,
    round(avg(b.n_events), 4) AS avg_events,
    round(avg(b.minutes), 4) AS avg_minutes,
    CAST(sum(CASE WHEN h.n_binges IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS heavy_binger_sessions,
    round(count(*) * 0.3 + avg(b.n_events) * 0.25 + avg(b.minutes) * 0.25
          + count(DISTINCT b.user_id) * 0.2, 4) AS bingeability_score
FROM binges b
LEFT JOIN heavy h ON b.user_id = h.user_id
GROUP BY b.intensity
ORDER BY b.intensity
"""

ORACLES["p01_per_group_cap"] = """
WITH ranked AS (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
    FROM documents
)
SELECT lang,
       count(*) AS n_kept,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM ranked WHERE rn <= 30
GROUP BY lang
ORDER BY lang
"""

ORACLES["q36_grouping_sets"] = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                        (o_orderpriority, o_orderstatus))
ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
"""

ORACLES["q37_full_outer"] = """
WITH spend AS (
    SELECT c.c_custkey AS entity_id, round(sum(o.o_totalprice), 2) AS spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
),
activity AS (
    SELECT user_id AS entity_id, count(*) AS n_events FROM events GROUP BY user_id
),
joined AS (
    SELECT coalesce(s.entity_id, a.entity_id) AS entity_id, s.spend, a.n_events,
        CASE WHEN s.spend IS NOT NULL AND a.n_events IS NOT NULL THEN 'both'
             WHEN s.spend IS NOT NULL THEN 'orders_only'
             ELSE 'events_only' END AS presence
    FROM spend s FULL OUTER JOIN activity a ON s.entity_id = a.entity_id
)
SELECT presence,
    count(*) AS n_entities,
    round(coalesce(sum(spend), 0.0), 2) AS total_spend,
    CAST(coalesce(sum(n_events), 0) AS BIGINT) AS total_events
FROM joined
GROUP BY presence
ORDER BY presence
"""

ORACLES["q38_window_gallery"] = """
WITH enriched AS (
    SELECT o_orderpriority, o_totalprice,
        first_value(o_totalprice) OVER w_full AS first_price,
        last_value(o_totalprice) OVER w_full AS last_price,
        nth_value(o_totalprice, 2) OVER w_full AS second_price,
        cume_dist() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS price_cume
    FROM orders
    WINDOW w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_orderpriority,
    count(*) AS n_orders,
    round(avg(last_price - first_price), 4) AS avg_first_to_last_delta,
    round(avg(CASE WHEN second_price IS NOT NULL THEN 1.0 ELSE 0.0 END), 4)
        AS pct_with_second_order,
    round(avg(price_cume), 6) AS avg_cume_dist
FROM enriched
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["q27_approx_sketches"] = """
SELECT l_returnflag,
    count(DISTINCT l_partkey) AS exact_distinct_parts,
    round(quantile_cont(l_extendedprice, 0.5), 3) AS exact_median_price,
    TRUE AS hll_within_10pct,
    TRUE AS quantile_sketch_within_5pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLES["m01_multimodal_meta"] = """
-- the decode stub is deterministic arithmetic over the payload bytes
-- (ASCII corpus): n_bytes = octet_length, width/height from the
-- first/last byte values — so even the Pandas-UDF path is
-- oracle-verified.
SELECT doc_id,
    CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
    CAST(CASE WHEN length(text) = 0 THEN 0
         ELSE 64 + (ord(substr(text, 1, 1)) % 64) END AS INTEGER) AS width,
    CAST(CASE WHEN length(text) = 0 THEN 0
         ELSE 64 + (ord(substr(text, length(text), 1)) % 64) END AS INTEGER)
        AS height,
    CASE WHEN length(text) = 0 THEN 'empty' ELSE 'ok' END AS status
FROM documents
ORDER BY doc_id
"""

ORACLES["d07_components_exact"] = """
WITH RECURSIVE toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
    SELECT doc_id,
        unnest(CASE WHEN len(t) >= 3 THEN
            list_distinct(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [array_to_string(t, ' ')] END) AS shingle
    FROM toks
),
sizes AS (
    SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
pairs AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.inter * 1.0 / (sa.n_sh + sb.n_sh - i.inter) >= 0.4
),
und AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(n, lab) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM und)
    UNION
    SELECT u.b, w.lab FROM walk w JOIN und u ON u.a = w.n WHERE w.lab < u.b
),
comp AS (
    SELECT n AS doc, min(lab) AS component FROM walk GROUP BY n
)
SELECT component,
    count(*) AS n_docs,
    min(doc) AS canonical_doc,
    max(doc) AS max_doc
FROM comp
GROUP BY component
ORDER BY component
"""

# Mirrors weighted_mix: same md5 bucket, dyadic rates (exact under
# both double and decimal arithmetic — no boundary drift).
ORACLES["d12_corpus_dup_profile"] = """
WITH base AS (
    SELECT source, doc_id, string_split(text, ' ') AS toks
    FROM documents
),
grams AS (
    SELECT source, doc_id, array_to_string(toks[i : i + 2], ' ') AS gram
    FROM base, unnest(range(1, len(toks) - 1)) AS t(i)
),
per_gram_doc AS (
    SELECT source, gram, doc_id, count(*) AS occ
    FROM grams GROUP BY source, gram, doc_id
),
per_gram AS (
    SELECT source, gram, sum(occ) AS cnt, count(*) AS n_docs_with
    FROM per_gram_doc GROUP BY source, gram
),
profile AS (
    SELECT source,
        CAST(sum(cnt) AS BIGINT) AS total_grams,
        count(*) AS distinct_grams,
        CAST(sum(CASE WHEN n_docs_with >= 2 THEN cnt ELSE 0 END) AS BIGINT)
            AS crossdoc_occ
    FROM per_gram GROUP BY source
),
docs_per AS (
    SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT p.source,
    d.n_docs,
    p.total_grams,
    p.distinct_grams,
    1000000 * (p.total_grams - p.distinct_grams) // p.total_grams AS dup_occ_ppm,
    1000000 * p.crossdoc_occ // p.total_grams AS cross_doc_ppm
FROM profile p JOIN docs_per d ON p.source = d.source
ORDER BY p.source
"""

ORACLES["t09_pii_scrub"] = r"""
WITH aug AS (
    SELECT doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@mail.example.org call 555-'
             || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
             || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
             || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
             || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR) AS t
    FROM documents
)
SELECT doc_id,
    CAST(len(regexp_extract_all(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
    CAST(len(regexp_extract_all(t,
        '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER) AS n_phone,
    CAST(len(regexp_extract_all(t,
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ipv4,
    md5(regexp_replace(regexp_replace(regexp_replace(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g')) AS scrub_fp
FROM aug
ORDER BY doc_id
"""

ORACLES["t10_surprisal"] = """
WITH toks AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
    FROM documents
),
freq AS (
    SELECT term, count(*) AS cnt FROM toks GROUP BY term
)
SELECT t.doc AS doc_id,
    count(*) AS n_tokens,
    CAST(sum(1000000 // cnt) // count(*) AS BIGINT) AS mean_rarity_ppm
FROM toks t JOIN freq f ON t.term = f.term
GROUP BY t.doc
ORDER BY doc_id
"""

ORACLES["p08_epoch_mix"] = """
WITH w AS (
    SELECT doc_id, lang,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000000 AS bucket,
        CASE lang WHEN 'en' THEN 2.5 WHEN 'zh' THEN 2.0 WHEN 'de' THEN 1.5
                  WHEN 'es' THEN 0.5 ELSE 1.0 END AS wt
    FROM documents
),
c AS (
    SELECT doc_id, lang,
        CAST(floor(wt) AS INTEGER)
        + CASE WHEN bucket < CAST(round((wt - floor(wt)) * 1000000) AS BIGINT)
               THEN 1 ELSE 0 END AS copies
    FROM w
)
SELECT doc_id, lang,
    CAST(unnest(generate_series(1, copies)) AS INTEGER) AS copy_idx
FROM c
WHERE copies > 0
ORDER BY doc_id, copy_idx
"""

ORACLES["p05_corpus_mix"] = """
WITH rated AS (
    SELECT lang, n_chars,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000000 AS bucket,
        CASE lang WHEN 'en' THEN 1.0 WHEN 'fr' THEN 0.75
                  WHEN 'de' THEN 0.5 WHEN 'zh' THEN 0.25
                  WHEN 'es' THEN 0.125 ELSE 1.0 END AS rate
    FROM documents
)
SELECT lang,
    count(*) AS n_docs,
    CAST(sum(CASE WHEN bucket < rate * 1000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_kept,
    CAST(sum(CASE WHEN bucket < rate * 1000000 THEN n_chars ELSE 0 END)
         AS BIGINT) AS kept_chars,
    round(CASE lang WHEN 'en' THEN 1.0 WHEN 'fr' THEN 0.75
                    WHEN 'de' THEN 0.5 WHEN 'zh' THEN 0.25
                    WHEN 'es' THEN 0.125 END, 4) AS target_rate,
    round(sum(CASE WHEN bucket < rate * 1000000 THEN 1 ELSE 0 END)
          * 1.0 / count(*), 4) AS kept_rate
FROM rated
GROUP BY lang
ORDER BY lang
"""

# Mirrors contamination_check + the p03 md5 split: same shingles as
# the d02 oracle, asymmetric containment, row_number tiebreak
# (shared DESC, train_doc ASC), exact flag via md5(lower(trim(text))).
ORACLES["d09_decontaminate"] = """
WITH keyed AS (
    SELECT doc_id, text,
        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 10
             THEN 'test' ELSE 'train' END AS split
    FROM documents
),
toks AS (
    SELECT doc_id, split, string_split(text, ' ') AS t FROM keyed
),
sh AS (
    SELECT doc_id, split,
        unnest(CASE WHEN len(t) >= 3 THEN
            list_distinct(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [array_to_string(t, ' ')] END) AS shingle
    FROM toks
),
sizes AS (
    SELECT doc_id, count(*) AS n_sh FROM sh WHERE split = 'test'
    GROUP BY doc_id
),
shared AS (
    SELECT a.doc_id AS doc_id, b.doc_id AS train_doc, count(*) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.split = 'test' AND b.split = 'train'
    GROUP BY a.doc_id, b.doc_id
),
best AS (
    SELECT doc_id, train_doc, shared,
        row_number() OVER (PARTITION BY doc_id
                           ORDER BY shared DESC, train_doc) AS rnk
    FROM shared
),
flags AS (
    SELECT t.doc_id,
        CASE WHEN EXISTS (
            SELECT 1 FROM keyed r WHERE r.split <> 'test'
              AND md5(lower(trim(r.text))) = md5(lower(trim(t.text)))
        ) THEN 1 ELSE 0 END AS exact_dup
    FROM keyed t WHERE t.split = 'test'
)
SELECT b.doc_id, s.n_sh, b.train_doc, CAST(b.shared AS BIGINT) AS shared,
    round(b.shared * 1.0 / s.n_sh, 6) AS containment, f.exact_dup
FROM best b
JOIN sizes s ON b.doc_id = s.doc_id
JOIN flags f ON b.doc_id = f.doc_id
WHERE b.rnk = 1
ORDER BY b.doc_id
"""

ORACLES["p03_hash_split"] = """
WITH b AS (
    SELECT lang, n_chars,
        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 10
             THEN 'test' ELSE 'train' END AS split
    FROM documents
)
SELECT lang, split,
    count(*) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM b
GROUP BY lang, split
ORDER BY lang, split
"""

ORACLES["q39_range_join"] = """
WITH inc AS (
    SELECT event_id AS incident_id, user_id,
        ts - INTERVAL 30 MINUTE AS lo,
        ts + INTERVAL 30 MINUTE AS hi
    FROM events WHERE event_type = 'error'
),
pts AS (
    SELECT user_id, ts, event_type, value
    FROM events WHERE event_type <> 'error'
)
SELECT i.incident_id,
    count(*) AS n_nearby,
    count(DISTINCT p.event_type) AS n_types,
    round(sum(p.value), 2) AS sum_value
FROM inc i
JOIN pts p ON p.user_id = i.user_id AND p.ts BETWEEN i.lo AND i.hi
GROUP BY i.incident_id
ORDER BY i.incident_id
"""

ORACLES["q40_json_extract"] = """
SELECT CAST(CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS INTEGER)
           AS k_bucket,
    event_type,
    count(*) AS n_events,
    round(sum(value), 2) AS sum_value
FROM events
GROUP BY k_bucket, event_type
ORDER BY k_bucket, event_type
"""

ORACLES["q41_higher_order"] = """
WITH v AS (
    SELECT label,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
    FROM embeddings
),
per AS (
    SELECT label,
        sqrt(list_sum(list_transform(vec, x -> x * x))) AS norm,
        len(list_filter(vec, x -> x > 0)) AS n_pos,
        list_max(list_transform(vec, x -> abs(x))) AS maxabs
    FROM v
)
SELECT label,
    count(*) AS n_vecs,
    round(avg(norm), 4) AS avg_norm,
    CAST(sum(n_pos) AS BIGINT) AS total_pos,
    round(max(maxabs), 6) AS max_abs_component
FROM per
GROUP BY label
ORDER BY label
"""

ORACLES["q42_salted_agg"] = """
SELECT event_type,
    count(*) AS n_events,
    round(sum(value), 2) AS sum_value,
    round(max(value), 2) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLES["p04_pipeline_e2e"] = """
WITH feats AS (
    SELECT doc_id, lang, n_chars, text,
        length(text) AS n_chars_calc,
        len(string_split(text, ' ')) AS n_tokens,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
            AS n_punct,
        len(list_filter(string_split(text, ' '),
                        t -> t IN ('a', 'the'))) AS n_stop
    FROM documents
),
scored AS (
    SELECT doc_id, lang, n_chars, text,
        (CASE WHEN n_tokens >= 50 THEN 40 WHEN n_tokens >= 20 THEN 25
              WHEN n_tokens >= 5 THEN 10 ELSE 0 END
         + CASE WHEN round(n_stop * 1.0 / n_tokens, 6) >= 0.01
                 AND round(n_stop * 1.0 / n_tokens, 6) <= 0.2
                THEN 30 ELSE 10 END
         + CASE WHEN round((n_chars_calc - (n_tokens - 1)) * 1.0 / n_tokens, 6) >= 3
                 AND round((n_chars_calc - (n_tokens - 1)) * 1.0 / n_tokens, 6) <= 10
                THEN 30 ELSE 10 END) AS quality_score
    FROM feats
),
kept AS (
    SELECT * FROM scored WHERE quality_score >= 60
),
uniq AS (
    SELECT doc_id, lang, n_chars, quality_score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
        FROM kept
    ) WHERE rn = 1
),
split AS (
    SELECT lang, n_chars, quality_score,
        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 10
             THEN 'test' ELSE 'train' END AS split
    FROM uniq
)
SELECT lang, split,
    count(*) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
    CAST(sum(quality_score) AS BIGINT) AS sum_quality
FROM split
GROUP BY lang, split
ORDER BY lang, split
"""

ORACLES["q43_time_rollup"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
    CAST(hour(ts) AS INTEGER) AS hour,
    count(*) AS n_events,
    round(sum(value), 2) AS sum_value,
    CAST(grouping(hour(ts)) AS INTEGER) AS g_hour
FROM events
GROUP BY GROUPING SETS ((strftime(ts, '%Y-%m-%d')),
                        (strftime(ts, '%Y-%m-%d'), hour(ts)))
ORDER BY day, g_hour, hour
"""

# d08's oracle mirrors the Spark LSH bucketing exactly: the 4
# hyperplanes are deterministic literals (similarity._planes), so the
# sign tests — and therefore the candidate pair set — are identical in
# both engines, making the APPROXIMATE path value-verifiable.
def _d08_oracle() -> str:
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        _planes,
    )

    planes = _planes(4, 64)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(vec0, {[float(v) for v in row]}) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, row in enumerate(planes)
    )
    return f"""
WITH v AS (
    SELECT vec_id, label,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec0
    FROM embeddings
),
sig AS (
    SELECT vec_id, label,
        list_transform(vec0, x -> x / sqrt(list_dot_product(vec0, vec0)))
            AS vec,
        ({bucket_terms}) AS bucket
    FROM v
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        a.label AS label_a, b.label AS label_b,
        list_dot_product(a.vec, b.vec) AS cos
    FROM sig a JOIN sig b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
    round(cos, 6) AS cosine,
    CAST(label_a = label_b AS INTEGER) AS same_label
FROM pairs
WHERE cos >= 0.45
ORDER BY id_a, id_b
"""


ORACLES["d08_embedding_neardup"] = _d08_oracle()


# s02's oracle mirrors the Spark multi-probe LSH exactly (deterministic
# hyperplane literals, same sign tests, same hamming-1 probe set) — the
# approximate ANN path is value-verified end-to-end, like d08.
def _s02_oracle() -> str:
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        _planes,
    )

    planes = _planes(4, 64)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(vec0, {[float(v) for v in row]}) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, row in enumerate(planes)
    )
    probe_list = "[bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]"
    return f"""
WITH v AS (
    SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec0
    FROM embeddings
),
sig AS (
    SELECT vec_id, vec0, ({bucket_terms}) AS bucket FROM v
),
q AS (
    SELECT vec_id AS query_id, vec0 AS qv,
        unnest({probe_list}) AS bucket
    FROM sig WHERE vec_id < 10
),
pairs AS (
    SELECT q.query_id, s.vec_id AS cand_id,
        round(list_dot_product(q.qv, s.vec0)
              / (sqrt(list_dot_product(q.qv, q.qv))
                 * sqrt(list_dot_product(s.vec0, s.vec0))), 6) AS cosine
    FROM sig s JOIN q ON s.bucket = q.bucket
    WHERE s.vec_id <> q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM pairs
)
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, cand_id, cosine
FROM ranked WHERE rnk <= 5
ORDER BY query_id, rnk
"""


ORACLES["s02_ann_lsh"] = _s02_oracle()


# s05's oracle mirrors the kNN-graph pipeline literal-for-literal:
# the same 8 ±1-hyperplane sign buckets, the hamming-1 probe set, the
# DISTINCT pair dedup (a pair can collide in several probe buckets),
# and the rounded-cosine / cand_id tiebreak ranking.
def _knn_graph_ctes(n_bits: int = 8, k: int = 5) -> str:
    """Shared CTE prefix mirroring similarity.knn_graph bit-for-bit
    (same literal hyperplanes, probe set, pair dedup, 6dp scoring) —
    the common backbone of the s05 and p12 oracles."""
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        _planes,
    )

    planes = _planes(n_bits, 64)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(vec0, {[float(v) for v in row]}) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, row in enumerate(planes)
    )
    probe_list = (
        "[bucket, "
        + ", ".join(f"xor(bucket, {1 << b})" for b in range(n_bits))
        + "]"
    )
    return f"""
WITH v AS (
    SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec0
    FROM embeddings
),
sig AS (
    SELECT vec_id, vec0, ({bucket_terms}) AS bucket FROM v
),
probes AS (
    SELECT vec_id AS query_id, unnest({probe_list}) AS bucket FROM sig
),
cand AS (
    SELECT DISTINCT p.query_id, s.vec_id AS cand_id
    FROM probes p JOIN sig s ON s.bucket = p.bucket
    WHERE s.vec_id <> p.query_id
),
pairs AS (
    SELECT c.query_id, c.cand_id,
        round(list_dot_product(q.vec0, s.vec0)
              / (sqrt(list_dot_product(q.vec0, q.vec0))
                 * sqrt(list_dot_product(s.vec0, s.vec0))), 6) AS cosine
    FROM cand c
    JOIN sig q ON q.vec_id = c.query_id
    JOIN sig s ON s.vec_id = c.cand_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM pairs
),
knn AS (
    SELECT query_id, cand_id, cosine FROM ranked WHERE rnk <= {k}
)"""


def _s05_oracle(n_bits: int = 8, k: int = 5) -> str:
    return f"""{_knn_graph_ctes(n_bits, k)}
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, cand_id, cosine
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rnk
"""


ORACLES["s05_knn_graph"] = _s05_oracle()


# p12 extends the mirrored kNN graph with integer-micro-unit density
# sums (reduction-order-independent), per-label ascending rank, and
# the integer keep-fraction test — all bit-exact.
def _p12_oracle(n_bits: int = 8, k: int = 5, keep_num: int = 1, keep_den: int = 2) -> str:
    return f"""{_knn_graph_ctes(n_bits, k)},
density AS (
    SELECT query_id,
        CAST(sum(CAST(round(cosine * 1000000) AS BIGINT)) AS BIGINT)
            AS density_ppm
    FROM knn GROUP BY query_id
),
base AS (
    SELECT e.vec_id, e.label,
        coalesce(d.density_ppm, 0) AS density_ppm
    FROM embeddings e LEFT JOIN density d ON d.query_id = e.vec_id
),
rankedv AS (
    SELECT *,
        row_number() OVER (PARTITION BY label
                           ORDER BY density_ppm, vec_id) AS dens_rank,
        count(*) OVER (PARTITION BY label) AS n
    FROM base
)
SELECT vec_id, label, density_ppm,
    CAST(dens_rank AS INTEGER) AS dens_rank,
    dens_rank * {keep_den} <= n * {keep_num} AS kept
FROM rankedv
ORDER BY label, dens_rank
"""


ORACLES["p12_density_prune"] = _p12_oracle()


# d04's oracle mirrors the md5-based simhash pipeline end-to-end:
# same per-token 32-bit halves, same 64 bit-sums, same chunk assembly,
# same pigeonhole candidate join, same bit_count hamming verify.
def _d04_oracle() -> str:
    bit_sums = ",\n        ".join(
        (
            f"sum(CASE WHEN (lo >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{b}"
            if b < 32
            else f"sum(CASE WHEN (hi >> {b - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{b}"
        )
        for b in range(64)
    )
    chunk_cols = ",\n        ".join(
        "("
        + " + ".join(
            f"(CASE WHEN s_{16 * c + b} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(16)
        )
        + f") AS c{c}"
        for c in range(4)
    )
    chunk_union = "\n    UNION ALL\n    ".join(
        f"SELECT doc, {c} AS chunk_id, c{c} AS v FROM sigs" for c in range(4)
    )
    return f"""
WITH toks AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS tok
    FROM documents
),
h AS (
    SELECT doc,
        CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
        CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS lo
    FROM toks
),
sums AS (
    SELECT doc,
        {bit_sums}
    FROM h GROUP BY doc
),
sigs AS (
    SELECT doc,
        {chunk_cols}
    FROM sums
),
chunks AS (
    {chunk_union}
),
cand AS (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM chunks a
    JOIN chunks b ON a.chunk_id = b.chunk_id AND a.v = b.v AND a.doc < b.doc
),
verified AS (
    SELECT c.doc_a, c.doc_b,
        CAST(bit_count(xor(sa.c0, sb.c0)) + bit_count(xor(sa.c1, sb.c1))
           + bit_count(xor(sa.c2, sb.c2)) + bit_count(xor(sa.c3, sb.c3))
             AS INTEGER) AS hamming
    FROM cand c
    JOIN sigs sa ON c.doc_a = sa.doc
    JOIN sigs sb ON c.doc_b = sb.doc
)
SELECT doc_a, doc_b, hamming
FROM verified
WHERE hamming <= 3
ORDER BY doc_a, doc_b
"""


ORACLES["d04_dedup_simhash"] = _d04_oracle()


# d03/d06 oracles mirror the md5-based MinHash-LSH pipeline exactly:
# same two 32-bit halves, same 128 (a1*hi + a2*lo + b) mod p mixes,
# same band-tuple keys, same Jaccard verification — so even the
# probabilistic LSH path is value-verified (pattern of d04/d08/s02).
def _minhash_pairs_sql(
    threshold: float, cand_cond: str = "a.doc < b.doc"
) -> str:
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        N_BANDS,
        N_MINHASH,
        _MERSENNE_P,
        _MIX_A1,
        _MIX_A2,
        _MIX_B,
    )

    rows_per_band = N_MINHASH // N_BANDS
    mh_aggs = ",\n        ".join(
        f"min(({_MIX_A1[j]} * hi + {_MIX_A2[j]} * lo + {_MIX_B[j]}) "
        f"% {_MERSENNE_P}) AS mh_{j}"
        for j in range(N_MINHASH)
    )
    band_union = "\n    UNION ALL\n    ".join(
        "SELECT doc, {b} AS band_id, ({key}) AS band_key FROM sigs".format(
            b=b,
            key=" + ".join(
                f"(mh_{b * rows_per_band + r} % {1 << 15}) * {1 << (15 * r)}"
                for r in range(rows_per_band)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
    SELECT doc_id AS doc,
        unnest(CASE WHEN len(t) >= 3 THEN
            list_distinct(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [array_to_string(t, ' ')] END) AS shingle
    FROM toks
),
based AS (
    SELECT doc, shingle,
        CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS hi,
        CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS lo
    FROM sh
),
sigs AS (
    SELECT doc,
        {mh_aggs}
    FROM based GROUP BY doc
),
banded AS (
    {band_union}
),
cand AS (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM banded a
    JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
                 AND ({cand_cond})
),
sizes AS (
    SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter
    FROM cand c
    JOIN sh a ON a.doc = c.doc_a
    JOIN sh b ON b.doc = c.doc_b AND b.shingle = a.shingle
    GROUP BY c.doc_a, c.doc_b
),
verified AS (
    SELECT i.doc_a, i.doc_b,
        round(i.inter * 1.0 / (sa.n_sh + sb.n_sh - i.inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc
    JOIN sizes sb ON i.doc_b = sb.doc
    WHERE i.inter * 1.0 / (sa.n_sh + sb.n_sh - i.inter) >= {threshold}
)"""


def _d03_oracle() -> str:
    return f"""
WITH {_minhash_pairs_sql(0.5)}
SELECT doc_a, doc_b, jaccard FROM verified
ORDER BY doc_a, doc_b
"""


def _d06_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_pairs_sql(0.5)},
und AS (
    SELECT doc_a AS a, doc_b AS b FROM verified
    UNION
    SELECT doc_b AS a, doc_a AS b FROM verified
),
walk(n, lab) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM und)
    UNION
    SELECT u.b, w.lab FROM walk w JOIN und u ON u.a = w.n WHERE w.lab < u.b
),
comp AS (
    SELECT n AS doc, min(lab) AS component FROM walk GROUP BY n
)
SELECT component,
    count(*) AS n_docs,
    min(doc) AS canonical_doc,
    max(doc) AS max_doc
FROM comp
GROUP BY component
ORDER BY component
"""


def _d05_oracle() -> str:
    """Content-blocked edit-distance screen: the SAME mirrored LSH
    candidate CTEs as d03 (the `cand` table), verified with DuckDB's
    levenshtein on the 64-char prefix at the same bound Spark's banded
    DP uses. Unreferenced downstream CTEs (sizes/inter/verified) are
    never evaluated by DuckDB."""
    return f"""
WITH {_minhash_pairs_sql(0.5)},
keyed AS (
    SELECT doc_id, substring(text, 1, 64) AS prefix FROM documents
)
SELECT c.doc_a, c.doc_b,
       levenshtein(ka.prefix, kb.prefix) AS prefix_dist
FROM cand c
JOIN keyed ka ON ka.doc_id = c.doc_a
JOIN keyed kb ON kb.doc_id = c.doc_b
WHERE levenshtein(ka.prefix, kb.prefix) <= 30
ORDER BY c.doc_a, c.doc_b
"""


ORACLES["d03_dedup_minhash_lsh"] = _d03_oracle()
ORACLES["d05_dedup_edit_distance"] = _d05_oracle()
ORACLES["d06_dedup_components"] = _d06_oracle()

# q46: windowed exact interpolated percentile — DuckDB window-izes
# quantile_cont directly; both engines interpolate lo + frac*(hi-lo)
# in float64, rounded to 2dp like q14's grouped form.
ORACLES["q46_windowed_percentile"] = """
WITH rev AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem GROUP BY l_suppkey
),
per_supp AS (
    SELECT s.s_suppkey AS suppkey, n.n_name AS nation_name, r.revenue
    FROM rev r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT suppkey, nation_name, revenue,
       round(quantile_cont(revenue, 0.5)
             OVER (PARTITION BY nation_name), 2) AS nation_median_revenue,
       round(quantile_cont(revenue, 0.9)
             OVER (PARTITION BY nation_name), 2) AS nation_p90_revenue,
       CAST(revenue > round(quantile_cont(revenue, 0.5)
             OVER (PARTITION BY nation_name), 2) AS INTEGER) AS above_median
FROM per_supp
ORDER BY suppkey
"""

ORACLES["q47_sql_rollup"] = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
HAVING count(*) > 0
ORDER BY g_priority DESC, priority, g_status DESC, status
"""

ORACLES["q48_sql_window"] = """
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       round(o_totalprice, 2) AS price,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       row_number() OVER w AS seq_no
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY custkey, seq_no
"""

# d11: mirrors the seeded SemDeDup literal-for-literal — same md5 seed
# ranking, same k = floor(sqrt(n)), same unit vectors and left-to-right
# double dot products (the s02/d08-proven arithmetic), same 6dp
# rounding and tie rules, same top-200 keeper cap.
ORACLES["d11_semantic_dedup"] = """
WITH v AS (
    SELECT vec_id AS id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
    FROM embeddings
),
pts AS (
    SELECT id,
           CASE WHEN sqrt(list_dot_product(v0, v0)) > 0
                THEN list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0)))
                ELSE v0 END AS u
    FROM v
),
seeds AS (
    SELECT id AS seed_id, u AS su
    FROM pts
    ORDER BY md5(CAST(id AS VARCHAR)), id
    LIMIT (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) FROM pts)
),
allpairs AS (
    SELECT p.id, s.seed_id,
           round(list_dot_product(p.u, s.su), 6) AS cent
    FROM pts p CROSS JOIN seeds s
),
assign AS (
    SELECT id, seed_id AS cluster, cent
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY id ORDER BY cent DESC, seed_id
        ) AS rn
        FROM allpairs
    )
    WHERE rn = 1
),
ranked AS (
    SELECT a.id, a.cluster, a.cent, p.u,
           row_number() OVER (
               PARTITION BY a.cluster ORDER BY a.cent DESC, a.id
           ) AS crank
    FROM assign a JOIN pts p ON p.id = a.id
),
dropped AS (
    SELECT DISTINCT b.id
    FROM ranked a
    JOIN ranked b ON a.cluster = b.cluster
                 AND a.crank <= 200
                 AND ((a.cent > b.cent)
                      OR (a.cent = b.cent AND a.id < b.id))
    WHERE round(list_dot_product(a.u, b.u), 6) > 0.95
)
SELECT a.cluster,
       count(*) AS n_items,
       CAST(sum(CASE WHEN d.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
       CAST(count(*) - sum(CASE WHEN d.id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM assign a LEFT JOIN dropped d ON d.id = a.id
GROUP BY a.cluster
ORDER BY a.cluster
"""

# m04: replays the overlapping-window byte arithmetic on
# hex(encode(text)) — same UTF-8 byte stream the Spark kernel sees.
# Window energy is an exact integer, /64 is a power-of-two division,
# sqrt is IEEE-identical, so rms matches bit-for-bit (module docstring
# of operators/multimodal.window_features states the zero-sample
# crossing semantics both sides implement).
ORACLES["m04_window_features"] = """
WITH b AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
),
wins AS (
    SELECT doc_id, unnest(range((nb - 64) // 16 + 1)) AS w, hx
    FROM b WHERE nb >= 64
),
samp AS (
    SELECT doc_id, w,
        list_transform(range(64),
            j -> CAST(('0x' || substr(hx, CAST(2 * (16 * w + j) + 1 AS INT), 2))
                      AS INT) - 128) AS s
    FROM wins
),
feat AS (
    SELECT doc_id,
        CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy,
        round(sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE)
                   / 64), 6) AS rms,
        len(list_filter(range(1, 64),
            j -> abs(sign(s[CAST(j + 1 AS INT)]) - sign(s[CAST(j AS INT)])) > 1))
            AS zc
    FROM samp
)
SELECT doc_id,
       count(*) AS n_windows,
       round(avg(rms), 4) AS avg_rms,
       round(avg(zc), 4) AS avg_zc,
       CAST(sum(energy) AS BIGINT) AS total_energy
FROM feat
GROUP BY doc_id
ORDER BY doc_id
"""

# m02: replays the frame chunk/stride arithmetic on hex(encode(text))
# like m04 — every-4th 32-byte frame, mean byte value per frame (one
# exact int/int division), exact integer byte totals.
ORACLES["m02_frame_sample"] = """
WITH b AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
),
fr AS (
    SELECT doc_id, unnest(range(0, (nb + 31) // 32, 4)) AS idx, hx, nb
    FROM b WHERE nb > 0
),
feat AS (
    SELECT doc_id, idx,
        CAST(least(nb - 32 * idx, 32) AS INT) AS flen,
        list_sum(list_transform(range(least(nb - 32 * idx, 32)),
            j -> CAST(('0x' || substr(hx, CAST(2 * (32 * idx + j) + 1 AS INT), 2))
                      AS INT))) AS fsum
    FROM fr
)
SELECT doc_id,
       count(*) AS n_sampled_frames,
       round(avg(fsum * 1.0 / flen), 4) AS avg_feature,
       CAST(sum(flen) AS BIGINT) AS total_frame_bytes
FROM feat
GROUP BY doc_id
ORDER BY doc_id
"""

# p02: mirrors stratified_sample_md5 — same md5(seed:id) ppm bucket,
# same per-stratum rates, so the exact kept set (and therefore the
# per-language counts) must match.
ORACLES["p02_stratified_sample"] = """
WITH keyed AS (
    SELECT lang,
        CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000000 AS bucket
    FROM documents
),
kept AS (
    SELECT lang FROM keyed
    WHERE bucket < CASE lang
        WHEN 'en' THEN 500000
        WHEN 'fr' THEN 1000000
        WHEN 'es' THEN 1000000
        WHEN 'de' THEN 1000000
        WHEN 'zh' THEN 1000000
        ELSE 0 END
)
SELECT lang, count(*) AS n_sampled FROM kept GROUP BY lang ORDER BY lang
"""

# p09: mirrors sequence_pack — same md5 order key (top 52 bits as the
# numeric rank), same exact running token totals, same div chunking.
ORACLES["p09_sequence_pack"] = """
WITH toks AS (
    SELECT doc_id,
        len(string_split(text, ' ')) AS ws_tokens,
        CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 13))
             AS BIGINT) AS pack_num
    FROM documents
),
ordered AS (
    SELECT *,
        sum(ws_tokens) OVER (
            ORDER BY pack_num, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum_tokens
    FROM toks
)
SELECT CAST((cum_tokens - ws_tokens) // 256 AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS seq_start_tokens,
       CAST(sum(CASE WHEN (cum_tokens - 1) // 256
                          > (cum_tokens - ws_tokens) // 256
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
FROM ordered
GROUP BY 1
ORDER BY seq_id
"""

# m03: replays the nearest-neighbor byte resample + Horner-mod
# checksum from hex(encode(text)). The gather index i*(nb/1024.0) is
# one IEEE double product (nb/2^10 is exact) floored identically in
# both engines; the checksum folds with (acc*31 + b) % p per byte
# (list_reduce with a prepended 0 accumulator == the kernel's
# vectorized power-series form).
ORACLES["m03_resize"] = """
WITH b AS (
    SELECT doc_id, source, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
),
resized AS (
    SELECT doc_id, source,
        list_transform(range(1024),
            i -> CAST(('0x' || substr(hx,
                CAST(2 * least(CAST(floor(i * (nb / 1024.0)) AS BIGINT), nb - 1)
                     + 1 AS INT), 2)) AS BIGINT)) AS vals
    FROM b WHERE nb > 0
),
ck AS (
    SELECT doc_id, source, CAST(1024 AS BIGINT) AS dst_bytes,
        list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
                    (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
    FROM resized
    UNION ALL
    SELECT doc_id, source, 0, 0 FROM b WHERE nb = 0
)
SELECT source, count(*) AS n_images,
       CAST(sum(dst_bytes) AS BIGINT) AS total_dst_bytes,
       count(DISTINCT checksum) AS n_unique_artifacts
FROM ck GROUP BY source ORDER BY source
"""


def _s04_oracle(k: int = 10, pool: int = 50, lambda_x1000: int = 700) -> str:
    """Mirrors mmr_select exactly by UNROLLING the greedy recurrence
    into k chained CTE stages (k is a small constant, so the 'not
    SQL-expressible sequential state' objection dissolves into k
    static stages). Float arithmetic is replicated literally: lam =
    700/1000.0 and (1.0 - lam) — NOT 0.3, which is a different double
    — one IEEE product per term, argmax ties to the smaller id, same
    left-to-right dot products as s01/s02."""
    lam = f"({lambda_x1000} / 1000.0)"
    one_minus = f"(1.0 - {lam})"
    stages = []
    sel_union = []
    for i in range(1, k + 1):
        if i == 1:
            stages.append(
                f"sel1 AS MATERIALIZED (\n"
                f"    SELECT id, u, rel, {lam} * rel - {one_minus} * 0.0 AS score\n"
                f"    FROM pool ORDER BY score DESC, id LIMIT 1\n)"
            )
        else:
            prev = " UNION ALL ".join(
                f"SELECT id, u FROM sel{j}" for j in range(1, i)
            )
            stages.append(
                f"selacc{i} AS ({prev}),\n"
                f"cand{i} AS (\n"
                f"    SELECT p.id, p.u, p.rel,\n"
                f"        (SELECT max(list_dot_product(p.u, s.u))\n"
                f"         FROM selacc{i} s) AS ms\n"
                f"    FROM pool p\n"
                f"    WHERE p.id NOT IN (SELECT id FROM selacc{i})\n"
                f"),\n"
                f"sel{i} AS MATERIALIZED (\n"
                f"    SELECT id, u, rel, {lam} * rel - {one_minus} * ms AS score\n"
                f"    FROM cand{i} ORDER BY score DESC, id LIMIT 1\n)"
            )
        sel_union.append(f"SELECT {i} AS rank, id, rel, score FROM sel{i}")
    body = ",\n".join(stages)
    union = "\nUNION ALL\n".join(sel_union)
    return f"""
WITH v AS (
    SELECT vec_id AS id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
    FROM embeddings
),
q0 AS (SELECT min(id) AS qid FROM v),
unitv AS (
    SELECT id,
           list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS u
    FROM v WHERE list_dot_product(v0, v0) > 0
),
qv AS (SELECT u.u FROM unitv u JOIN q0 ON u.id = q0.qid),
pool AS MATERIALIZED (
    SELECT c.id, c.u, list_dot_product(c.u, q.u) AS rel
    FROM unitv c CROSS JOIN qv q
    WHERE c.id <> (SELECT qid FROM q0)
    ORDER BY rel DESC, c.id
    LIMIT {pool}
),
{body}
SELECT CAST(rank AS INT) AS rank, id AS vec_id,
       round(rel, 6) AS relevance, round(score, 6) AS mmr_score
FROM ({union})
ORDER BY rank
"""


ORACLES["s04_mmr_diverse_topk"] = _s04_oracle()

# q51: sketch bytes are engine-specific; the oracle checks the
# portable contract — day count, exact totals, and TRUE accuracy
# booleans (the Spark side computes |est - exact| <= 5% against its
# own deterministic Datasketches HLL).
ORACLES["q51_sketch_merge"] = """
SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_total_users,
       TRUE AS merged_within_5pct,
       TRUE AS daily_all_within_5pct
FROM events
"""

# q50: DuckDB dayofweek() is 0-6 (Sunday=0); Spark's is 1-7
# (Sunday=1) — the +1 aligns them. string_agg(... ORDER BY rnk)
# mirrors the rank-ordered concat.
ORACLES["q50_ranked_concat"] = """
WITH per_type AS (
    SELECT dayofweek(ts) + 1 AS dow, event_type,
           count(*) AS n, round(sum(value), 2) AS tv
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY dow
                                 ORDER BY tv DESC, event_type) AS rnk
    FROM per_type
),
top3 AS (
    SELECT dow, string_agg(event_type, ',' ORDER BY rnk) AS top_types
    FROM ranked WHERE rnk <= 3 GROUP BY dow
),
totals AS (
    SELECT dayofweek(ts) + 1 AS dow,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
)
SELECT CAST(t.dow AS INTEGER) AS dow, t.n_events, t.total_value,
       top3.top_types
FROM totals t JOIN top3 USING (dow)
ORDER BY dow
"""

ORACLES["q49_sql_sessionize"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR (epoch_us(ts) / 1000000.0
                         - epoch_us(prev_ts) / 1000000.0) > 1800
                   THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sess AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
),
per_session AS (
    SELECT user_id, session_seq,
        strftime(min(ts), '%Y-%m-%d') AS start_day,
        count(*) AS n_events,
        (max(epoch_us(ts) / 1000000.0) - min(epoch_us(ts) / 1000000.0)) / 60.0
            AS minutes
    FROM sess GROUP BY user_id, session_seq
)
SELECT start_day,
       count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users,
       round(avg(n_events), 4) AS avg_session_events,
       round(avg(minutes), 4) AS avg_session_minutes
FROM per_session GROUP BY start_day ORDER BY start_day
"""

ORACLES["t11_bigram_surprisal"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bgx AS (
    SELECT doc_id AS doc,
        unnest(list_transform(range(1, len(t)),
            i -> {'w1': t[i], 'bg': t[i] || ' ' || t[i + 1]})) AS x
    FROM toks WHERE len(t) >= 2
),
flat AS (SELECT doc, x.w1 AS w1, x.bg AS bg FROM bgx),
f12 AS (SELECT bg, count(*) AS c12 FROM flat GROUP BY bg),
f1 AS (SELECT w1, count(*) AS c1 FROM flat GROUP BY w1)
SELECT doc AS doc_id,
       count(*) AS n_bigrams,
       CAST(sum((1000000 * c1) // c12) // count(*) AS BIGINT) AS mean_cond_ppm
FROM flat
JOIN f12 USING (bg)
JOIN f1 USING (w1)
GROUP BY doc
ORDER BY doc_id
"""

# s03: literal mirror of operators/similarity.ann_ivf_topk with
# train_iterations=1, k=16, n_probe=4 — seeds are the 16 lowest-id
# vectors (cluster = seed rank), one Lloyd step (nearest-seed
# assignment by squared L2, per-(cluster,pos) mean update, empty
# clusters keep their seed), final nearest-centroid assignment, each
# query probes its 4 nearest lists, cosine scored only inside probed
# lists. Float arithmetic mirrored literally (cast-to-double, same
# (x-w)*(x-w) form, round 6) — the same literal-mirror contract the
# s01/s02/d08/d11 oracles already rely on.
ORACLES["s03_ann_ivf"] = """
WITH corpus AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
seeds AS (
    SELECT CAST(rn - 1 AS INTEGER) AS cluster, v AS cent FROM (
        SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM corpus
    ) WHERE rn <= 16
),
d0 AS (
    SELECT c.vec_id, s.cluster,
        list_sum(list_transform(list_zip(c.v, s.cent),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
    FROM corpus c CROSS JOIN seeds s
),
a0 AS (
    SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
            row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM d0
    ) WHERE rn = 1
),
sums AS (
    SELECT a0.cluster, i.i AS pos, sum(c.v[i.i]) AS s, count(*) AS n
    FROM a0 JOIN corpus c USING (vec_id), range(1, 65) i(i)
    GROUP BY a0.cluster, i.i
),
newc AS (
    SELECT cluster, list(s / n ORDER BY pos) AS cent FROM sums GROUP BY cluster
),
cent1 AS (
    SELECT s.cluster, coalesce(n.cent, s.cent) AS cent
    FROM seeds s LEFT JOIN newc n USING (cluster)
),
d1 AS (
    SELECT c.vec_id, c.v, k.cluster,
        list_sum(list_transform(list_zip(c.v, k.cent),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
    FROM corpus c CROSS JOIN cent1 k
),
assign AS (
    SELECT vec_id, v, cluster FROM (
        SELECT vec_id, v, cluster,
            row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM d1
    ) WHERE rn = 1
),
qd AS (
    SELECT c.vec_id AS query_id, c.v AS q_vec, k.cluster,
        list_sum(list_transform(list_zip(c.v, k.cent),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
    FROM corpus c CROSS JOIN cent1 k
    WHERE c.vec_id < 10
),
probes AS (
    SELECT query_id, q_vec, cluster FROM (
        SELECT query_id, q_vec, cluster,
            row_number() OVER (PARTITION BY query_id ORDER BY dist, cluster) AS pr
        FROM qd
    ) WHERE pr <= 4
),
pairs AS (
    SELECT p.query_id, a.vec_id AS cand_id,
        round(list_dot_product(p.q_vec, a.v)
              / (sqrt(list_dot_product(p.q_vec, p.q_vec))
                 * sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
    FROM assign a JOIN probes p USING (cluster)
    WHERE a.vec_id <> p.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM pairs
)
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, cand_id, cosine
FROM ranked WHERE rnk <= 5
ORDER BY query_id, rnk
"""

# m05: byte replay of the phash kernel — thumbnail gather mirrored
# from the m03 oracle, aHash bit = thumb[j]*64 > sum(thumb) (integer),
# 16-bit chunks, OR-of-chunk-equality candidates (same pair set as the
# Spark chunk-explode equi-join), popcount-of-xor hamming, closest 20.
ORACLES["m05_image_phash"] = """
WITH b AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
),
vals AS (
    SELECT doc_id,
        list_transform(range(64),
            i -> CAST(('0x' || substr(hx,
                CAST(2 * least(CAST(floor(i * (nb / 64.0)) AS BIGINT), nb - 1)
                     + 1 AS INT), 2)) AS BIGINT)) AS v
    FROM b WHERE nb > 0
),
sigs AS (
    SELECT doc_id, v, list_sum(v) AS s FROM vals
),
chunks AS (
    SELECT doc_id,
        CAST(list_sum(list_transform(range(16),
            t -> CASE WHEN v[t + 1] * 64 > s THEN 1 << t ELSE 0 END)) AS INT) AS c0,
        CAST(list_sum(list_transform(range(16),
            t -> CASE WHEN v[16 + t + 1] * 64 > s THEN 1 << t ELSE 0 END)) AS INT) AS c1,
        CAST(list_sum(list_transform(range(16),
            t -> CASE WHEN v[32 + t + 1] * 64 > s THEN 1 << t ELSE 0 END)) AS INT) AS c2,
        CAST(list_sum(list_transform(range(16),
            t -> CASE WHEN v[48 + t + 1] * 64 > s THEN 1 << t ELSE 0 END)) AS INT) AS c3
    FROM sigs
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
       + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS INT)
        AS hamming
FROM chunks a JOIN chunks b
  ON a.doc_id < b.doc_id
 AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
ORDER BY hamming, doc_a, doc_b
LIMIT 20
"""

# p10: t08's scorer (bit-exact integer ppm) → NTILE(4) stages →
# within-stage md5 shuffle → concatenated global rank. The single
# ORDER BY (stage, md5, doc_id) row_number IS the concatenation of
# per-stage ranks offset by stage sizes.
# p11: mirrors temperature_mix — same integer milli-weights
# (floor(sqrt(n)*1000): sqrt and * are IEEE correctly-rounded, so both
# engines produce the identical double), same integer weight sum, same
# fixed-order rate expression, same md5-ppm keep decision.
ORACLES["p11_temperature_mix"] = """
WITH counts AS (
    SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
w AS (
    SELECT lang, n_docs,
        CAST(floor(sqrt(n_docs) * 1000) AS BIGINT) AS w_mil
    FROM counts
),
tot AS (
    SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs,
           CAST(sum(w_mil) AS BIGINT) AS sum_w
    FROM w
),
rates AS (
    SELECT lang, n_docs, w_mil,
        least(1000000,
              CAST(floor(1000000.0 * (total_docs // 2) / sum_w * w_mil
                         / n_docs) AS BIGINT)) AS rate_ppm
    FROM w, tot
),
kept AS (
    SELECT d.lang, d.n_chars, r.w_mil, r.rate_ppm
    FROM documents d JOIN rates r USING (lang)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000000 < r.rate_ppm
),
summary AS (
    SELECT lang, w_mil, rate_ppm,
        count(*) AS n_kept,
        CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM kept GROUP BY lang, w_mil, rate_ppm
)
SELECT c.lang, c.n_docs,
    COALESCE(s.w_mil, 0) AS w_mil,
    COALESCE(s.rate_ppm, 0) AS rate_ppm,
    COALESCE(s.n_kept, 0) AS n_kept,
    COALESCE(s.kept_chars, 0) AS kept_chars
FROM counts c LEFT JOIN summary s USING (lang)
ORDER BY lang
"""

ORACLES["p10_curriculum"] = """
WITH feats AS (
    SELECT doc_id,
        length(text) AS n_chars,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        len(list_filter(string_split(text, ' '),
                        t -> t IN ('a', 'the'))) AS n_stop
    FROM documents
),
scored AS (
    SELECT doc_id,
        least(n_tokens, 100) * 3000
        + greatest(0, 250000 - abs((n_stop * 1000000 // greatest(n_tokens, 1)) - 100000))
        + greatest(0, 150000 - 2 * (n_punct * 1000000 // greatest(n_chars, 1)))
        + ((n_distinct * 1000000 // greatest(n_tokens, 1)) * 3 // 10) AS score_ppm
    FROM feats
),
staged AS (
    SELECT doc_id, score_ppm,
        ntile(4) OVER (ORDER BY score_ppm DESC, doc_id) AS stage
    FROM scored
),
keyed AS (
    SELECT doc_id, stage, score_ppm,
        md5('0:' || CAST(doc_id AS VARCHAR)) AS sk
    FROM staged
)
SELECT doc_id,
    CAST(stage AS INTEGER) AS stage,
    CAST(score_ppm AS BIGINT) AS score_ppm,
    row_number() OVER (ORDER BY stage, sk, doc_id) AS curriculum_rank
FROM keyed
ORDER BY curriculum_rank
"""

ORACLES["d13_boilerplate_scrub"] = """
WITH aug AS (
    SELECT doc_id,
        concat_ws(' ',
            CASE WHEN doc_id % 2 = 0
                 THEN 'subscribe now to our premium newsletter for updates'
            END,
            'this content is provided under the standard corporate '
            || 'license agreement all rights reserved worldwide by provider',
            text) AS aug_text
    FROM documents
),
base AS (
    SELECT doc_id, string_split(aug_text, ' ') AS toks FROM aug
),
segs AS (
    SELECT doc_id, i AS pos,
        array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' ') AS seg
    FROM base, unnest(range(0, (len(toks) + 7) // 8)) AS t(i)
),
fps AS (
    SELECT doc_id, pos, seg, md5(seg) AS fp FROM segs
),
boiler AS (
    SELECT fp
    FROM (SELECT fp, count(DISTINCT doc_id) AS n_docs_with
          FROM fps GROUP BY fp)
    WHERE n_docs_with >= 10
),
kept AS (
    SELECT * FROM fps WHERE fp NOT IN (SELECT fp FROM boiler)
),
totals AS (
    SELECT doc_id, count(*) AS n_segs FROM fps GROUP BY doc_id
),
reassembled AS (
    SELECT doc_id, count(*) AS n_kept,
        md5(string_agg(seg, ' ' ORDER BY pos)) AS clean_fp
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
    t.n_segs,
    t.n_segs - coalesce(r.n_kept, 0) AS n_removed,
    1000000 * (t.n_segs - coalesce(r.n_kept, 0)) // t.n_segs AS removed_ppm,
    coalesce(r.clean_fp, md5('')) AS clean_fp
FROM totals t LEFT JOIN reassembled r USING (doc_id)
ORDER BY t.doc_id
"""

ORACLES["t12_heuristic_rules"] = """
WITH t AS (
    SELECT doc_id,
        string_split(text, ' ') AS toks,
        length(text) AS lc,
        contains(text, '{') AS has_brace,
        contains(text, 'lorem ipsum') AS has_lorem
    FROM documents
),
f AS (
    SELECT doc_id,
        len(toks) AS n_tokens,
        lc - (len(toks) - 1) AS total_chars,
        len(list_distinct(toks)) AS n_uniq,
        (CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
            AS n_stop,
        has_brace, has_lorem
    FROM t
),
flags AS (
    SELECT doc_id,
        n_tokens,
        n_tokens >= 30 AND n_tokens <= 100000 AS r_nwords,
        total_chars >= 4 * n_tokens AND total_chars <= 10 * n_tokens
            AS r_wordlen,
        n_stop >= 2 AS r_stop2,
        n_uniq * 2 >= n_tokens * 1 AS r_unique,
        NOT has_brace AND NOT has_lorem AS r_clean
    FROM f
)
SELECT doc_id, n_tokens, r_nwords, r_wordlen, r_stop2, r_unique, r_clean,
    CAST((CASE WHEN r_nwords THEN 0 ELSE 1 END)
       + (CASE WHEN r_wordlen THEN 0 ELSE 1 END)
       + (CASE WHEN r_stop2 THEN 0 ELSE 1 END)
       + (CASE WHEN r_unique THEN 0 ELSE 1 END)
       + (CASE WHEN r_clean THEN 0 ELSE 1 END) AS INTEGER) AS n_failed,
    r_nwords AND r_wordlen AND r_stop2 AND r_unique AND r_clean AS keep
FROM flags
ORDER BY doc_id
"""

# s06 mirrors the PQ pipeline end-to-end: lowest-id codebook seeds,
# per-subspace argmin codes (ties to lower code), fixed-order ADC sum
# ((d0+d1)+d2)+d3 rounded at 6dp BEFORE the shortlist rank, exact
# cosine re-rank of the top-20 — all float arithmetic mirrored
# literally (power(x,2) == x*x and left-fold sums, proven by s03/s05).
ORACLES["s06_pq_ann"] = """
WITH corpus AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
seeds AS (
    SELECT CAST(rn - 1 AS INTEGER) AS code, v FROM (
        SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM corpus
    ) WHERE rn <= 8
),
codebook AS (
    SELECT m.m, s.code, s.v[m.m * 16 + 1 : m.m * 16 + 16] AS sub
    FROM seeds s, range(0, 4) m(m)
),
subdists AS (
    SELECT c.vec_id, cb.m, cb.code,
        list_sum(list_transform(
            list_zip(c.v[cb.m * 16 + 1 : cb.m * 16 + 16], cb.sub),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
    FROM corpus c CROSS JOIN codebook cb
),
codes AS (
    SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
            row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
        FROM subdists
    ) WHERE rn = 1
),
codes_w AS (
    SELECT vec_id,
        max(CASE WHEN m = 0 THEN code END) AS code_0,
        max(CASE WHEN m = 1 THEN code END) AS code_1,
        max(CASE WHEN m = 2 THEN code END) AS code_2,
        max(CASE WHEN m = 3 THEN code END) AS code_3
    FROM codes GROUP BY vec_id
),
queries AS (
    SELECT vec_id AS query_id, v AS q FROM corpus WHERE vec_id < 10
),
adc AS (
    SELECT q.query_id, cw.vec_id AS cand_id,
        round(((
            list_sum(list_transform(list_zip(q.q[1:16], cb0.sub),
                p -> (p[1] - p[2]) * (p[1] - p[2])))
          + list_sum(list_transform(list_zip(q.q[17:32], cb1.sub),
                p -> (p[1] - p[2]) * (p[1] - p[2]))))
          + list_sum(list_transform(list_zip(q.q[33:48], cb2.sub),
                p -> (p[1] - p[2]) * (p[1] - p[2]))))
          + list_sum(list_transform(list_zip(q.q[49:64], cb3.sub),
                p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS adc_dist
    FROM queries q
    CROSS JOIN codes_w cw
    JOIN codebook cb0 ON cb0.m = 0 AND cb0.code = cw.code_0
    JOIN codebook cb1 ON cb1.m = 1 AND cb1.code = cw.code_1
    JOIN codebook cb2 ON cb2.m = 2 AND cb2.code = cw.code_2
    JOIN codebook cb3 ON cb3.m = 3 AND cb3.code = cw.code_3
    WHERE cw.vec_id <> q.query_id
),
shortlist AS (
    SELECT query_id, cand_id, adc_dist FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist, cand_id) AS pr
        FROM adc
    ) WHERE pr <= 20
),
refined AS (
    SELECT s.query_id, s.cand_id, s.adc_dist,
        round(list_dot_product(q.v, c.v)
              / (sqrt(list_dot_product(q.v, q.v))
                 * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
    FROM shortlist s
    JOIN corpus q ON q.vec_id = s.query_id
    JOIN corpus c ON c.vec_id = s.cand_id
)
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, cand_id, adc_dist, cosine
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM refined
)
WHERE rnk <= 5
ORDER BY query_id, rnk
"""

ORACLES["m06_modality_router"] = """
WITH payloads AS (
    SELECT doc_id,
        CASE
            WHEN doc_id % 4 = 0 THEN '89504E470D0A1A0A' || hex(encode(text))
            WHEN doc_id % 4 = 1 THEN 'FFD8FF' || hex(encode(text))
            WHEN doc_id % 4 = 2 THEN '52494646' || '00000000' || '57415645'
                                     || hex(encode(text))
            ELSE hex(encode(text))
        END AS hexp
    FROM documents
),
sniffed AS (
    SELECT doc_id, hexp,
        CAST(length(hexp) // 2 AS BIGINT) AS n_bytes,
        substr(hexp, 1, 16) = '89504E470D0A1A0A' AS is_png,
        substr(hexp, 1, 6) = 'FFD8FF' AS is_jpeg,
        substr(hexp, 1, 8) = '52494646'
            AND substr(hexp, 17, 8) = '57415645' AS is_wav
    FROM payloads
),
routed AS (
    SELECT doc_id, hexp, n_bytes, is_png, is_jpeg, is_wav,
        CASE WHEN is_png THEN 'image/png'
             WHEN is_jpeg THEN 'image/jpeg'
             WHEN is_wav THEN 'audio/wav'
             ELSE 'unknown' END AS modality,
        CASE WHEN is_png THEN 9 WHEN is_jpeg THEN 4
             WHEN is_wav THEN 13 ELSE 1 END AS body_off
    FROM sniffed
)
SELECT doc_id,
    modality,
    CAST(n_bytes AS BIGINT) AS n_bytes,
    CAST(n_bytes - (body_off - 1) AS BIGINT) AS body_bytes,
    CASE WHEN is_png OR is_jpeg THEN CAST(64 +
        CAST(('0x' || substr(hexp, (body_off - 1) * 2 + 1, 2)) AS INTEGER)
        % 64 AS INTEGER) END AS width,
    CASE WHEN is_png OR is_jpeg THEN CAST(64 +
        CAST(('0x' || substr(hexp, CAST(n_bytes * 2 - 1 AS INTEGER), 2))
             AS INTEGER) % 64 AS INTEGER) END AS height,
    CASE WHEN is_wav THEN
        CAST((n_bytes - (body_off - 1)) * 1000 // 8000 AS BIGINT)
    END AS dur_ms,
    CASE WHEN modality = 'unknown' THEN 'unknown_format'
         ELSE 'ok' END AS status
FROM routed
ORDER BY doc_id
"""

# p13 composes the (already individually-verified) t08 scorer, t12
# rule battery, and d01 fingerprint into one grouped audit; the oracle
# recomputes all three inline with the same integer arithmetic.
ORACLES["p13_dataset_card"] = """
WITH t AS (
    SELECT doc_id, source, lang, n_chars, text,
        string_split(text, ' ') AS toks,
        length(text) AS lc,
        md5(lower(trim(text))) AS fp
    FROM documents
),
f AS (
    SELECT *,
        len(toks) AS n_tokens,
        lc - (len(toks) - 1) AS total_wchars,
        len(list_distinct(toks)) AS n_uniq,
        len(list_filter(toks, x -> x IN ('a', 'the'))) AS n_stop,
        (CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
            AS n_stop_distinct,
        lc - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
    FROM t
),
rules AS (
    SELECT *,
        (n_tokens >= 30 AND n_tokens <= 100000)
        AND (total_wchars >= 4 * n_tokens AND total_wchars <= 10 * n_tokens)
        AND (n_stop_distinct >= 2)
        AND (n_uniq * 2 >= n_tokens * 1)
        AND (NOT contains(text, '{') AND NOT contains(text, 'lorem ipsum'))
            AS keep
    FROM f
),
scored AS (
    SELECT *,
        least(n_tokens, 100) * 3000
        + greatest(0, 250000 - abs((n_stop * 1000000 // greatest(n_tokens, 1)) - 100000))
        + greatest(0, 150000 - 2 * (n_punct * 1000000 // greatest(lc, 1)))
        + ((n_uniq * 1000000 // greatest(n_tokens, 1)) * 3 // 10) AS score_ppm
    FROM rules
)
SELECT source, lang,
    count(*) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
    CAST(sum(n_chars) AS BIGINT) AS total_chars,
    CAST(sum(score_ppm) AS BIGINT) // count(*) AS mean_quality_ppm,
    CAST(1000000 * sum(CASE WHEN keep THEN 1 ELSE 0 END) // count(*)
         AS BIGINT) AS rule_pass_ppm,
    1000000 * (count(*) - count(DISTINCT fp)) // count(*) AS exact_dup_ppm
FROM scored
GROUP BY source, lang
ORDER BY source, lang
"""

ORACLES["t13_bpe_merge_counts"] = """
WITH words AS (
    SELECT word, count(*) AS freq
    FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    )
    WHERE length(word) >= 2
    GROUP BY word
),
pairs AS (
    SELECT substr(word, i, 2) AS pair, freq
    FROM words, unnest(range(1, length(word))) AS t(i)
),
counted AS (
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
)
SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INTEGER)
        AS rnk,
    pair, pair_count
FROM counted
ORDER BY pair_count DESC, pair
LIMIT 20
"""

ORACLES["q52_rolling_distinct"] = """
WITH daily AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
bounds AS (
    SELECT max(CAST(ts AS DATE)) AS max_day FROM events
),
contrib AS (
    SELECT user_id, day + CAST(i.i AS INTEGER) AS wday
    FROM daily, range(0, 7) AS i(i)
)
SELECT strftime(c.wday, '%Y-%m-%d') AS day,
    count(DISTINCT c.user_id) AS active_users_7d
FROM contrib c, bounds b
WHERE c.wday <= b.max_day
GROUP BY c.wday
ORDER BY day
"""

ORACLES["q53_path_pattern"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts, event_type,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR (epoch_us(ts) / 1000000.0
                         - epoch_us(prev_ts) / 1000000.0) > 1800
                   THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sess AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
),
paths AS (
    SELECT user_id, session_seq,
        string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
        strftime(min(ts), '%Y-%m-%d') AS start_day
    FROM sess GROUP BY user_id, session_seq
),
conv AS (
    SELECT start_day,
        CASE WHEN regexp_matches(path, 'view.*click.*purchase')
             THEN 1 ELSE 0 END AS converted
    FROM paths
)
SELECT start_day,
       count(*) AS n_sessions,
       CAST(sum(converted) AS BIGINT) AS ordered_conversions,
       1000000 * CAST(sum(converted) AS BIGINT) // count(*) AS conversion_ppm
FROM conv GROUP BY start_day ORDER BY start_day
"""


def _t14_oracle() -> str:
    # Mirrors operators/textstats.char_stats expression-for-expression
    # (same alphabet constant) so the integer arithmetic is bit-exact.
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        CHAR_ALPHABET,
    )

    n = len(CHAR_ALPHABET)
    cnts = ",\n        ".join(
        f"(length(__t) - length(replace(__t, '{c}', ''))) AS __c{i}"
        for i, c in enumerate(CHAR_ALPHABET)
    )
    counted = " + ".join(f"__c{i}" for i in range(n))
    sumsq = " + ".join(f"__c{i} * __c{i}" for i in range(n))
    uniq = " + ".join(
        f"(CASE WHEN __c{i} > 0 THEN 1 ELSE 0 END)" for i in range(n)
    )
    return f"""
WITH lowered AS (
    SELECT doc_id, lower(text) AS __t FROM documents
),
counts AS (
    SELECT doc_id,
        {cnts}
    FROM lowered
)
SELECT doc_id,
    CAST({counted} AS BIGINT) AS counted_chars,
    CAST({uniq} AS INTEGER) AS uniq_chars,
    CAST(CASE WHEN ({counted}) > 0 THEN
        (1000000 * CAST({sumsq} AS BIGINT))
        // (CAST({counted} AS BIGINT) * CAST({counted} AS BIGINT))
        ELSE NULL END AS BIGINT) AS collision_ppm
FROM counts
ORDER BY doc_id
"""


ORACLES["t14_char_diversity"] = _t14_oracle()


def _d14_oracle() -> str:
    # Same planted-URL generator + canonicalizer templates as the Spark
    # side (operators/dedup.url_planted_sql / url_canonical_sql), built
    # for the duckdb dialect — structural mirroring by construction.
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        url_canonical_sql,
        url_planted_sql,
    )

    planted = url_planted_sql("duckdb")
    canon = url_canonical_sql("url", "duckdb")
    return f"""
WITH planted AS (
    SELECT doc_id, {planted} AS url FROM documents
),
canon AS (
    SELECT doc_id, {canon} AS canonical_url FROM planted
)
SELECT canonical_url,
       count(*) AS n_dups,
       min(doc_id) AS keeper_doc_id
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url
"""


ORACLES["d14_url_dedup"] = _d14_oracle()


ORACLES["q54_forward_fill"] = """
WITH purch AS (
    SELECT user_id, CAST(ts AS DATE) AS day, value
    FROM events
    WHERE event_type = 'purchase' AND user_id % 20 = 0
),
daily AS (
    SELECT user_id, day, round(max(value), 4) AS day_value
    FROM purch GROUP BY user_id, day
),
spans AS (
    SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY user_id
),
spine AS (
    SELECT user_id, CAST(unnest(generate_series(mn - 2, mx + 3, INTERVAL 1 DAY)) AS DATE) AS day
    FROM spans
),
grid AS (
    SELECT s.user_id, s.day, d.day_value
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
),
filled AS (
    SELECT user_id, day, day_value,
        last_value(day_value IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
        last_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
        first_value(day_value IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
        first_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
    FROM grid
)
SELECT user_id,
    strftime(day, '%Y-%m-%d') AS day,
    CASE WHEN day_value IS NOT NULL THEN day_value
         WHEN prev_val IS NULL THEN next_val
         WHEN next_val IS NULL THEN prev_val
         ELSE round(prev_val + (next_val - prev_val)
              * (date_diff('day', prev_day, day) * 1.0
                 / date_diff('day', prev_day, next_day)), 4)
         END AS filled_value,
    CASE WHEN day_value IS NOT NULL THEN 'observed'
         WHEN prev_val IS NULL THEN 'backfill'
         WHEN next_val IS NULL THEN 'locf'
         ELSE 'interp' END AS fill_kind
FROM filled
ORDER BY user_id, day
"""


def _d15_oracle() -> str:
    # d06's mirrored LSH pairs + recursive components, then the t08
    # score expression inline, then the same (score desc, doc) keeper
    # rank — every stage bit-exact.
    return f"""
WITH RECURSIVE {_minhash_pairs_sql(0.5)},
und AS (
    SELECT doc_a AS a, doc_b AS b FROM verified
    UNION
    SELECT doc_b AS a, doc_a AS b FROM verified
),
walk(n, lab) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM und)
    UNION
    SELECT u.b, w.lab FROM walk w JOIN und u ON u.a = w.n WHERE w.lab < u.b
),
comp AS (
    SELECT n AS doc, min(lab) AS component FROM walk GROUP BY n
),
feats AS (
    SELECT doc_id, n_chars,
        length(text) AS f_chars,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        len(list_filter(string_split(text, ' '),
                        t -> t IN ('a', 'the'))) AS n_stop
    FROM documents
),
scored AS (
    SELECT doc_id, n_chars,
        least(n_tokens, 100) * 3000
        + greatest(0, 250000 - abs((n_stop * 1000000 // greatest(n_tokens, 1)) - 100000))
        + greatest(0, 150000 - 2 * (n_punct * 1000000 // greatest(f_chars, 1)))
        + ((n_distinct * 1000000 // greatest(n_tokens, 1)) * 3 // 10) AS score_ppm
    FROM feats
),
cf AS (
    SELECT c.component, c.doc, s.score_ppm, s.n_chars
    FROM comp c JOIN scored s ON s.doc_id = c.doc
),
ranked AS (
    SELECT *,
        row_number() OVER (PARTITION BY component
                           ORDER BY score_ppm DESC, doc) AS rn,
        count(*) OVER (PARTITION BY component) AS n_docs,
        sum(n_chars) OVER (PARTITION BY component) AS chars_total
    FROM cf
)
SELECT component,
    CAST(n_docs AS BIGINT) AS n_docs,
    doc AS keeper_doc,
    CAST(score_ppm AS BIGINT) AS keeper_score_ppm,
    CAST(chars_total AS BIGINT) AS chars_total,
    CAST(chars_total - n_chars AS BIGINT) AS chars_dropped
FROM ranked WHERE rn = 1
ORDER BY component
"""


ORACLES["d15_quality_keeper"] = _d15_oracle()


ORACLES["q55_snapshot_diff"] = """
WITH old AS (
    SELECT c_custkey AS key,
        md5(concat_ws('|', c_name, c_mktsegment, round(c_acctbal, 2))) AS h_old
    FROM customer
),
new_base AS (
    SELECT c_custkey AS key, c_name,
        CASE WHEN c_custkey % 7 = 0 THEN 'RESEGMENTED'
             ELSE c_mktsegment END AS c_mktsegment,
        round(c_acctbal, 2) AS c_acctbal
    FROM customer WHERE c_custkey % 11 <> 0
),
added AS (
    SELECT 9000000 + i AS key,
        'Customer#new' || i AS c_name,
        'NEWSEG' AS c_mktsegment,
        0.0 AS c_acctbal
    FROM range(0, 3) t(i)
),
newt AS (
    SELECT key, md5(concat_ws('|', c_name, c_mktsegment, c_acctbal)) AS h_new
    FROM (SELECT * FROM new_base UNION ALL SELECT * FROM added)
),
diff AS (
    SELECT COALESCE(o.key, n.key) AS key,
        CASE WHEN o.h_old IS NULL THEN 'added'
             WHEN n.h_new IS NULL THEN 'removed'
             WHEN o.h_old <> n.h_new THEN 'changed'
             ELSE 'unchanged' END AS status
    FROM old o FULL OUTER JOIN newt n ON o.key = n.key
)
SELECT status,
    count(*) AS n_keys,
    min(key) AS min_key,
    max(key) AS max_key
FROM diff GROUP BY status ORDER BY status
"""


ORACLES["q56_trend_regression"] = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
        round(sum(value), 2) AS day_value
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
bounds AS (SELECT min(day) AS d0 FROM daily),
series AS (
    SELECT event_type,
        CAST(date_diff('day', b.d0, day) AS DOUBLE) AS x,
        day_value AS y
    FROM daily, bounds b
)
SELECT event_type,
    round(regr_slope(y, x), 4) AS slope,
    round(regr_intercept(y, x), 4) AS intercept,
    round(regr_r2(y, x), 4) AS r2,
    CAST(regr_count(y, x) AS BIGINT) AS n_days,
    CASE WHEN round(regr_slope(y, x), 4) > 1.0 THEN 'rising'
         WHEN round(regr_slope(y, x), 4) < -1.0 THEN 'falling'
         ELSE 'flat' END AS trend
FROM series GROUP BY event_type ORDER BY event_type
"""


ORACLES["q57_sql_cohort"] = """
WITH first_touch AS (
    SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, date_trunc('month', ts) AS act_month
    FROM events
),
joined AS (
    SELECT f.cohort_month,
        CAST(date_diff('month', f.cohort_month, a.act_month) AS INTEGER)
            AS month_offset,
        a.user_id
    FROM activity a JOIN first_touch f USING (user_id)
),
sizes AS (
    SELECT cohort_month, count(*) AS cohort_size
    FROM first_touch GROUP BY cohort_month
)
SELECT strftime(j.cohort_month, '%Y-%m') AS cohort_month,
    j.month_offset,
    count(DISTINCT j.user_id) AS n_active,
    CAST(s.cohort_size AS BIGINT) AS cohort_size,
    1000000 * count(DISTINCT j.user_id) // s.cohort_size AS retention_ppm
FROM joined j JOIN sizes s ON j.cohort_month = s.cohort_month
GROUP BY j.cohort_month, j.month_offset, s.cohort_size
ORDER BY cohort_month, month_offset
"""


ORACLES["t15_oov_rate"] = """
WITH toks AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
    FROM documents
),
counts AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
vocab AS (SELECT term FROM counts ORDER BY cnt DESC, term LIMIT 20),
flagged AS (
    SELECT t.doc, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
    FROM toks t LEFT JOIN vocab v USING (term)
)
SELECT doc AS doc_id,
    count(*) AS n_tokens,
    CAST(sum(oov) AS BIGINT) AS oov_tokens,
    1000000 * CAST(sum(oov) AS BIGINT) // count(*) AS oov_ppm
FROM flagged GROUP BY doc ORDER BY doc_id
"""


ORACLES["p14_label_vote"] = """
WITH h AS (
    SELECT doc_id,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#base'), 1, 8))
             AS BIGINT) % 3 AS b,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#a0'), 1, 8))
             AS BIGINT) AS h0,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#a1'), 1, 8))
             AS BIGINT) AS h1,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#a2'), 1, 8))
             AS BIGINT) AS h2
    FROM documents
),
idx AS (
    SELECT doc_id,
        CASE WHEN h0 % 5 = 0 THEN (b + 1 + (h0 // 5) % 2) % 3 ELSE b END AS i0,
        CASE WHEN h1 % 5 = 0 THEN (b + 1 + (h1 // 5) % 2) % 3 ELSE b END AS i1,
        CASE WHEN h2 % 5 = 0 THEN (b + 1 + (h2 // 5) % 2) % 3 ELSE b END AS i2
    FROM h
),
lab AS (
    SELECT doc_id,
        (['good', 'mid', 'spam'])[CAST(i0 + 1 AS INTEGER)] AS label_0,
        (['good', 'mid', 'spam'])[CAST(i1 + 1 AS INTEGER)] AS label_1,
        (['good', 'mid', 'spam'])[CAST(i2 + 1 AS INTEGER)] AS label_2
    FROM idx
),
votes AS (
    SELECT *,
        (CASE WHEN label_0 = 'good' THEN 1 ELSE 0 END
         + CASE WHEN label_1 = 'good' THEN 1 ELSE 0 END
         + CASE WHEN label_2 = 'good' THEN 1 ELSE 0 END) AS v_good,
        (CASE WHEN label_0 = 'mid' THEN 1 ELSE 0 END
         + CASE WHEN label_1 = 'mid' THEN 1 ELSE 0 END
         + CASE WHEN label_2 = 'mid' THEN 1 ELSE 0 END) AS v_mid,
        (CASE WHEN label_0 = 'spam' THEN 1 ELSE 0 END
         + CASE WHEN label_1 = 'spam' THEN 1 ELSE 0 END
         + CASE WHEN label_2 = 'spam' THEN 1 ELSE 0 END) AS v_spam
    FROM lab
)
SELECT doc_id, label_0, label_1, label_2,
    CASE WHEN v_good >= v_mid AND v_good >= v_spam THEN 'good'
         WHEN v_mid >= v_spam THEN 'mid' ELSE 'spam' END AS consensus,
    CAST(greatest(v_good, v_mid, v_spam) AS INTEGER) AS consensus_votes,
    1000000 * CAST(greatest(v_good, v_mid, v_spam) AS BIGINT) // 3
        AS agreement_ppm
FROM votes ORDER BY doc_id
"""


def _t16_oracle(dim: int = 16) -> str:
    # Mirrors operators/textstats.hash_embed: same md5 bucket/sign
    # derivation, same fixed-order norm expression, same 4dp round.
    sums = ",\n        ".join(
        f"CAST(sum(CASE WHEN b = {i} THEN s ELSE 0 END) AS DOUBLE) AS r{i}"
        for i in range(dim)
    )
    norm = "sqrt(" + " + ".join(f"r{i} * r{i}" for i in range(dim)) + ")"
    outs = ",\n    ".join(
        f"CASE WHEN {norm} > 0 THEN round(r{i} / {norm}, 4) "
        f"ELSE 0.0 END AS d{i:02d}"
        for i in range(dim)
    )
    return f"""
WITH toks AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
    FROM documents
),
hashed AS (
    SELECT doc,
        CAST(('0x' || substr(md5(term || '#b'), 1, 8)) AS BIGINT) % {dim} AS b,
        CASE WHEN CAST(('0x' || substr(md5(term || '#s'), 1, 8)) AS BIGINT)
                  % 2 = 0 THEN 1 ELSE -1 END AS s
    FROM toks
),
sums AS (
    SELECT doc,
        {sums}
    FROM hashed GROUP BY doc
)
SELECT doc AS doc_id,
    {outs}
FROM sums ORDER BY doc_id
"""


ORACLES["t16_hash_embed"] = _t16_oracle()


ORACLES["t17_sentiment"] = """
WITH toks AS (
    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
    FROM documents
),
scored AS (
    SELECT doc,
        CASE term WHEN 'fast' THEN 2 WHEN 'small' THEN 1
                  WHEN 'big' THEN -1 WHEN 'slow' THEN -2 ELSE 0 END AS v
    FROM toks
)
SELECT doc AS doc_id,
    count(*) AS n_tokens,
    CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(sum(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
    CAST(sum(v) AS BIGINT) AS net_valence,
    1000000 * CAST(sum(v) AS BIGINT) // count(*) AS sentiment_ppm,
    CASE WHEN sum(v) > 0 THEN 'positive'
         WHEN sum(v) < 0 THEN 'negative'
         ELSE 'neutral' END AS polarity
FROM scored GROUP BY doc ORDER BY doc_id
"""


ORACLES["q58_multitouch_attribution"] = """
WITH purch AS (
    SELECT user_id, event_id AS p_eid, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
),
views AS (
    SELECT user_id, event_id AS v_eid, ts AS v_ts
    FROM events WHERE event_type = 'view'
),
j AS (
    SELECT v.user_id, v.v_eid, v.v_ts, p.p_eid
    FROM views v JOIN purch p USING (user_id)
    WHERE v.v_ts <= p.p_ts AND v.v_ts >= p.p_ts - INTERVAL 7 DAY
),
touched AS (
    SELECT *,
        count(*) OVER (PARTITION BY user_id, p_eid) AS n_touches,
        row_number() OVER (PARTITION BY user_id, p_eid
                           ORDER BY v_ts, v_eid) AS rn
    FROM j
),
credited AS (
    SELECT *,
        1000000 // n_touches
        + CASE WHEN rn = n_touches THEN 1000000 % n_touches
               ELSE 0 END AS credit_ppm
    FROM touched
)
SELECT strftime(CAST(v_ts AS DATE), '%Y-%m-%d') AS view_day,
    count(*) AS n_touches,
    CAST(sum(credit_ppm) AS BIGINT) AS credited_ppm,
    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS first_touches,
    CAST(sum(CASE WHEN rn = n_touches THEN 1 ELSE 0 END) AS BIGINT)
        AS last_touches
FROM credited
GROUP BY CAST(v_ts AS DATE)
ORDER BY view_day
"""


ORACLES["q59_histogram"] = """
WITH bounds AS (
    SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
),
bucketed AS (
    -- DuckDB has no width_bucket; replay Spark's exact formula
    -- (bucket width computed FIRST, then one divide + floor) so the
    -- IEEE arithmetic — and any boundary-value bucketing — is
    -- bit-identical to Spark's WidthBucket expression
    SELECT CASE WHEN o_totalprice >= hi THEN 11
                WHEN o_totalprice < lo THEN 0
                ELSE CAST(floor((o_totalprice - lo) / ((hi - lo) / 10))
                          AS BIGINT) + 1 END AS bucket,
           o_totalprice
    FROM orders, bounds
)
SELECT bucket,
    count(*) AS n_orders,
    round(min(o_totalprice), 2) AS bucket_min,
    round(max(o_totalprice), 2) AS bucket_max
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


ORACLES["q60_pareto_abc"] = """
WITH rev AS (
    SELECT l_partkey,
        CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS BIGINT) AS rev_e4
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT l_partkey, rev_e4,
        row_number() OVER (ORDER BY rev_e4 DESC, l_partkey) AS rnk,
        sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS cum_rev
    FROM rev
),
total AS (SELECT sum(rev_e4) AS tot FROM rev),
classed AS (
    SELECT r.*,
        CAST((CAST(r.cum_rev AS HUGEINT) * 1000000) // t.tot AS BIGINT)
            AS cum_share_ppm
    FROM ranked r, total t
)
SELECT CASE WHEN cum_share_ppm <= 700000 THEN 'A'
            WHEN cum_share_ppm <= 900000 THEN 'B' ELSE 'C' END AS abc_class,
    count(*) AS n_parts,
    CAST(sum(rev_e4) AS BIGINT) AS class_rev_e4,
    CAST(min(rnk) AS BIGINT) AS min_rank,
    CAST(max(rnk) AS BIGINT) AS max_rank
FROM classed
GROUP BY 1 ORDER BY abc_class
"""


ORACLES["d16_entity_resolution"] = """
WITH variants AS (
    SELECT c_custkey + 10000000 AS d_key,
        upper(c_name) AS d_name,
        c_nationkey AS d_nation,
        round(c_acctbal + 0.01, 2) AS d_acctbal,
        lower(c_mktsegment) AS d_segment
    FROM customer WHERE c_custkey % 9 = 0
),
fresh AS (
    SELECT c_custkey + 20000000 AS d_key,
        'Customer#NEW' || CAST(c_custkey AS VARCHAR) AS d_name,
        c_nationkey AS d_nation,
        round(c_acctbal, 2) AS d_acctbal,
        lower(c_mktsegment) AS d_segment
    FROM customer WHERE c_custkey % 9 = 5
),
dirty AS (SELECT * FROM variants UNION ALL SELECT * FROM fresh),
master AS (
    SELECT c_custkey, c_name, c_nationkey,
        round(c_acctbal, 2) AS c_acctbal, c_mktsegment,
        regexp_replace(c_name, '[^0-9]', '', 'g') AS blk
    FROM customer
),
cand AS (
    SELECT d.*, m.c_name, m.c_acctbal, m.c_mktsegment
    FROM (SELECT *, regexp_replace(d_name, '[^0-9]', '', 'g') AS blk
          FROM dirty) d
    JOIN master m ON d.d_nation = m.c_nationkey AND d.blk = m.blk
),
scored AS (
    SELECT d_nation,
        CASE WHEN lower(d_name) = lower(c_name)
              AND abs(d_acctbal - c_acctbal) <= 0.02
              AND lower(d_segment) = lower(c_mktsegment)
             THEN 1 ELSE 0 END AS matched
    FROM cand
),
per_nation AS (
    SELECT d_nation AS nationkey,
        count(*) AS n_candidates,
        CAST(sum(matched) AS BIGINT) AS n_matched
    FROM scored GROUP BY d_nation
),
dirty_counts AS (
    SELECT d_nation AS nationkey, count(*) AS n_dirty
    FROM dirty GROUP BY d_nation
)
SELECT dc.nationkey, dc.n_dirty,
    COALESCE(pn.n_candidates, 0) AS n_candidates,
    COALESCE(pn.n_matched, 0) AS n_matched
FROM dirty_counts dc LEFT JOIN per_nation pn USING (nationkey)
ORDER BY nationkey
"""


ORACLES["t18_langid_eval"] = """
WITH scored AS (
    SELECT lang,
        len(list_filter(string_split(text,' '), t -> t IN ('the','a','of')))  AS score_en,
        len(list_filter(string_split(text,' '), t -> t IN ('le','la','et')))  AS score_fr,
        len(list_filter(string_split(text,' '), t -> t IN ('el','la','de')))  AS score_es,
        len(list_filter(string_split(text,' '), t -> t IN ('der','die','und'))) AS score_de,
        len(list_filter(string_split(text,' '), t -> t IN ('的','是','了')))   AS score_zh
    FROM documents
),
best AS (
    SELECT lang AS true_lang,
        CASE WHEN greatest(score_en, score_fr, score_es, score_de, score_zh) = 0 THEN 'und'
             WHEN score_en = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'en'
             WHEN score_fr = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'fr'
             WHEN score_es = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'es'
             WHEN score_de = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'de'
             ELSE 'zh' END AS predicted_lang
    FROM scored
),
per_true AS (
    SELECT true_lang AS cls, count(*) AS n_true,
        CAST(sum(CASE WHEN predicted_lang = true_lang THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct
    FROM best GROUP BY true_lang
),
per_pred AS (
    SELECT predicted_lang AS cls, count(*) AS n_pred
    FROM best GROUP BY predicted_lang
)
SELECT COALESCE(t.cls, p.cls) AS cls,
    COALESCE(t.n_true, 0) AS n_true,
    COALESCE(p.n_pred, 0) AS n_pred,
    COALESCE(t.n_correct, 0) AS n_correct,
    CASE WHEN COALESCE(t.n_true, 0) > 0
         THEN 1000000 * COALESCE(t.n_correct, 0) // t.n_true END AS recall_ppm,
    CASE WHEN COALESCE(p.n_pred, 0) > 0
         THEN 1000000 * COALESCE(t.n_correct, 0) // p.n_pred END
        AS precision_ppm
FROM per_true t FULL OUTER JOIN per_pred p ON t.cls = p.cls
ORDER BY cls
"""


ORACLES["q61_capped_running_total"] = """
WITH RECURSIVE p AS (
    SELECT user_id, value,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn
    FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
),
sizes AS (SELECT user_id, max(rn) AS n_purchases FROM p GROUP BY user_id),
walk(user_id, rn, bal, n_capped) AS (
    SELECT user_id, rn,
        CASE WHEN value > 500.0 THEN 500.0 ELSE value END,
        CASE WHEN value > 500.0 THEN 1 ELSE 0 END
    FROM p WHERE rn = 1
    UNION ALL
    SELECT p.user_id, p.rn,
        CASE WHEN w.bal + p.value > 500.0 THEN 500.0
             ELSE w.bal + p.value END,
        w.n_capped + CASE WHEN w.bal + p.value > 500.0 THEN 1 ELSE 0 END
    FROM walk w JOIN p ON p.user_id = w.user_id AND p.rn = w.rn + 1
)
SELECT s.user_id,
    CAST(s.n_purchases AS BIGINT) AS n_purchases,
    CAST(w.n_capped AS BIGINT) AS n_capped,
    round(w.bal, 2) AS final_balance
FROM sizes s JOIN walk w ON w.user_id = s.user_id AND w.rn = s.n_purchases
ORDER BY s.user_id
"""


ORACLES["q62_temporal_join"] = """
WITH dim AS (
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
        round(c_acctbal, 2) AS acctbal,
        '1990-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
    FROM customer
),
changed AS (SELECT custkey FROM dim WHERE custkey % 10 = 0),
versions AS (
    -- closed old version for changed keys
    SELECT d.custkey, d.segment, d.acctbal, d.valid_from,
           '1996-01-01' AS valid_to
    FROM dim d JOIN changed c USING (custkey)
    UNION ALL
    -- opened new version for changed keys
    SELECT d.custkey, 'PROMOTED', round(d.acctbal + 100, 2),
           '1996-01-01', CAST(NULL AS VARCHAR)
    FROM dim d JOIN changed c USING (custkey)
    UNION ALL
    -- unchanged keys pass through open
    SELECT d.custkey, d.segment, d.acctbal, d.valid_from, d.valid_to
    FROM dim d WHERE d.custkey % 10 <> 0
),
j AS (
    SELECT o.o_custkey, o.o_totalprice, v.segment, v.valid_from
    FROM orders o JOIN versions v
      ON o.o_custkey = v.custkey
     AND o.o_orderdate >= CAST(v.valid_from AS DATE)
     AND o.o_orderdate < COALESCE(CAST(v.valid_to AS DATE),
                                  DATE '9999-12-31')
)
SELECT segment, valid_from,
    count(*) AS n_orders,
    count(DISTINCT o_custkey) AS n_customers,
    round(sum(o_totalprice), 2) AS total_spend
FROM j GROUP BY segment, valid_from
ORDER BY segment, valid_from
"""


def _d17_oracle() -> str:
    # Identical polynomial-window arithmetic as the Spark SQL text
    # (same modulus, same unrolled power constants).
    M = 1_000_000_007
    pows = [pow(256, 7 - j, M) for j in range(8)]
    hash_expr = "(" + " + ".join(
        f"(CAST(ascii(substr(t, i + {j}, 1)) AS BIGINT) * {pows[j]}) % {M}"
        for j in range(8)
    ) + f") % {M}"
    return f"""
WITH base AS (
    SELECT doc_id, substr(text, 1, 512) AS t,
           length(substr(text, 1, 512)) AS L
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
),
pos AS (
    SELECT doc_id, t, L, CAST(u.i AS INTEGER) AS i
    FROM base, unnest(range(1, L - 6)) AS u(i)
    WHERE L >= 8
),
bounds AS (
    SELECT doc_id, t, L, i AS start
    FROM pos WHERE {hash_expr} % 64 = 0 AND i > 1
),
starts AS (
    SELECT doc_id, t, L, 1 AS start FROM base
    UNION ALL
    SELECT doc_id, t, L, start FROM bounds
),
chunks AS (
    SELECT doc_id,
        md5(substr(t, start,
            COALESCE(lead(start) OVER (PARTITION BY doc_id
                                       ORDER BY start) - start,
                     L - start + 1))) AS fp
    FROM starts
),
fp_docs AS (
    SELECT fp, count(DISTINCT doc_id) AS n_docs
    FROM chunks GROUP BY fp
)
SELECT c.doc_id,
    count(*) AS n_chunks,
    CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_dup_chunks,
    1000000 * CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END)
                   AS BIGINT) // count(*) AS dup_ppm
FROM chunks c JOIN fp_docs f USING (fp)
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


ORACLES["d17_cdc_chunk_dedup"] = _d17_oracle()


ORACLES["q63_anomaly_mad"] = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
med AS (
    SELECT *, quantile_cont(n_events, 0.5)
                  OVER (PARTITION BY event_type) AS med
    FROM daily
),
dev AS (
    SELECT *, abs(n_events - med) AS dv FROM med
),
mad AS (
    SELECT *, quantile_cont(dv, 0.5)
                  OVER (PARTITION BY event_type) AS mad
    FROM dev
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
       round(med, 1) AS type_median, round(mad, 1) AS type_mad
FROM mad
WHERE dv > 3 * mad
ORDER BY event_type, day
"""


ORACLES["q64_sequence_bigrams"] = """
WITH e AS (
    SELECT user_id, ts, event_id, event_type,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
s AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR epoch(ts) - epoch(prev_ts) > 1800
                   THEN 1 ELSE 0 END AS new_sess
    FROM e
),
sess AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS sess_id
    FROM s
),
grams AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id, sess_id
                                 ORDER BY ts, event_id) AS prev_type,
           event_type
    FROM sess
),
counted AS (
    SELECT prev_type || '>' || event_type AS bigram, count(*) AS support
    FROM grams WHERE prev_type IS NOT NULL
    GROUP BY 1
),
ranked AS (
    SELECT CAST(row_number() OVER (ORDER BY support DESC, bigram) AS INT)
               AS rnk,
           bigram, support
    FROM counted
)
SELECT rnk, bigram, support FROM ranked WHERE rnk <= 20 ORDER BY rnk
"""


ORACLES["d18_ngram_novelty"] = """
WITH toks AS (
    SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\\s+'),
                    t -> t <> '') AS ts
    FROM documents
),
grams AS (
    SELECT doc_id,
        CASE WHEN len(ts) >= 5 THEN
            list_transform(range(1, len(ts) - 3),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                     || ts[i+3] || ' ' || ts[i+4])
        ELSE [] END AS gs
    FROM toks
),
pairs AS (
    SELECT DISTINCT doc_id, md5(g) AS g
    FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
),
first AS (
    SELECT g, min(doc_id) AS first_doc FROM pairs GROUP BY g
),
per_doc AS (
    SELECT p.doc_id, count(*) AS n_shingles,
           sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
               AS n_novel
    FROM pairs p JOIN first f USING (g)
    GROUP BY p.doc_id
)
SELECT d.doc_id,
    CAST(coalesce(pd.n_shingles, 0) AS BIGINT) AS n_shingles,
    CAST(coalesce(pd.n_novel, 0) AS BIGINT) AS n_novel,
    CAST(CASE WHEN coalesce(pd.n_shingles, 0) > 0
         THEN 1000000 * coalesce(pd.n_novel, 0) // pd.n_shingles
         ELSE 1000000 END AS BIGINT) AS novelty_ppm
FROM documents d LEFT JOIN per_doc pd USING (doc_id)
ORDER BY d.doc_id
"""


ORACLES["t19_readability"] = """
WITH scored AS (
    SELECT doc_id,
        len(list_filter(string_split_regex(lower(text), '\\s+'),
                        t -> t <> '')) AS n_words,
        len(list_filter(string_split_regex(text, '[.!?]+'),
                        s -> trim(s) <> '')) AS n_sents,
        len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
    FROM documents
),
banded AS (
    SELECT *,
        round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
              - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 2) AS flesch
    FROM scored WHERE n_words > 0 AND n_sents > 0
),
cls AS (
    SELECT *, CASE WHEN flesch >= 60 THEN 'easy'
                   WHEN flesch >= 30 THEN 'medium'
                   ELSE 'hard' END AS band
    FROM banded
)
SELECT band, count(*) AS n_docs,
       round(avg(n_words), 4) AS avg_words,
       round(min(flesch), 2) AS min_flesch,
       round(max(flesch), 2) AS max_flesch
FROM cls GROUP BY band ORDER BY band
"""


ORACLES["t20_zipf_slope"] = """
WITH terms AS (
    SELECT source,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS term
    FROM documents
),
counts AS (
    SELECT source, term, count(*) AS cnt FROM terms GROUP BY source, term
),
ranked AS (
    SELECT source, cnt,
        row_number() OVER (PARTITION BY source
                           ORDER BY cnt DESC, term) AS rnk
    FROM counts QUALIFY rnk <= 100
),
per_src AS (
    SELECT source,
        list(ln(CAST(rnk AS DOUBLE)) ORDER BY rnk) AS xs,
        list(ln(CAST(cnt AS DOUBLE)) ORDER BY rnk) AS ys
    FROM ranked GROUP BY source
),
sums AS (
    SELECT source, len(xs) AS n_terms,
        list_reduce(list_prepend(0.0, xs), (a, x) -> a + x) AS sx,
        list_reduce(list_prepend(0.0, ys), (a, x) -> a + x) AS sy,
        list_reduce(list_prepend(0.0,
            list_transform(range(1, len(xs) + 1),
                           i -> xs[i] * ys[i])), (a, x) -> a + x) AS sxy,
        list_reduce(list_prepend(0.0,
            list_transform(xs, x -> x * x)), (a, x) -> a + x) AS sxx
    FROM per_src
)
SELECT source, CAST(n_terms AS INT) AS n_terms,
    round((n_terms * sxy - sx * sy)
          / (n_terms * sxx - sx * sx), 4) AS zipf_slope
FROM sums ORDER BY source
"""


ORACLES["p15_pps_sample"] = """
WITH w AS (
    SELECT source, doc_id, n_chars AS weight,
        sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum,
        sum(n_chars) OVER (PARTITION BY source) AS total
    FROM documents WHERE n_chars > 0
),
s AS (
    SELECT *, greatest(1, total // 20) AS stride FROM w
)
SELECT source, doc_id, weight,
    CAST((cum - 1 - (stride // 2) + stride * 1000000) // stride
       - (cum - weight - 1 - (stride // 2) + stride * 1000000) // stride
       AS BIGINT) AS n_hits
FROM s
WHERE (cum - 1 - (stride // 2) + stride * 1000000) // stride
    - (cum - weight - 1 - (stride // 2) + stride * 1000000) // stride > 0
ORDER BY source, doc_id
"""

# q65: lower weighted quantiles — the crossing row per quantile is
# unique because the cumulative weight is strictly increasing in the
# (price, tb) order (weights >= 1); all crossing tests are integer.
ORACLES["q65_weighted_median"] = """
WITH base AS (
    SELECT l_returnflag AS grp,
           l_extendedprice AS price,
           CAST(l_quantity AS BIGINT) AS w,
           l_orderkey * 8 + l_linenumber AS tb
    FROM lineitem
),
tot AS (
    SELECT grp, CAST(sum(w) AS BIGINT) AS wtot FROM base GROUP BY grp
),
cum AS (
    SELECT grp, price, w, tb,
           CAST(sum(w) OVER (PARTITION BY grp ORDER BY price, tb
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
    FROM base
)
SELECT c.grp AS l_returnflag,
       count(*) AS n_lines,
       CAST(max(t.wtot) AS BIGINT) AS total_units,
       round(min(CASE WHEN 4 * c.cw >= 1 * t.wtot
                       AND 4 * (c.cw - c.w) < 1 * t.wtot THEN c.price END), 2)
           AS w_p25,
       round(min(CASE WHEN 2 * c.cw >= 1 * t.wtot
                       AND 2 * (c.cw - c.w) < 1 * t.wtot THEN c.price END), 2)
           AS w_median,
       round(min(CASE WHEN 4 * c.cw >= 3 * t.wtot
                       AND 4 * (c.cw - c.w) < 3 * t.wtot THEN c.price END), 2)
           AS w_p75
FROM cum c JOIN tot t ON c.grp = t.grp
GROUP BY c.grp
ORDER BY l_returnflag
"""

# q66: a GENUINE recursive CTE — the capability the Spark side
# re-expresses with pointer doubling (operators/hierarchy.py).
ORACLES["q66_hierarchy_rollup"] = """
WITH RECURSIVE walk AS (
    SELECT c_custkey AS node, c_custkey AS root, CAST(0 AS BIGINT) AS depth
    FROM customer
    WHERE c_custkey // 7 = c_custkey
    UNION ALL
    SELECT c.c_custkey, w.root, w.depth + 1
    FROM customer c JOIN walk w ON c.c_custkey // 7 = w.node
    WHERE c.c_custkey // 7 <> c.c_custkey
)
SELECT w.depth,
       count(*) AS n_nodes,
       round(sum(c.c_acctbal), 2) AS total_acctbal,
       min(w.node) AS min_key,
       max(w.node) AS max_key
FROM walk w JOIN customer c ON c.c_custkey = w.node
GROUP BY w.depth
ORDER BY w.depth
"""

# q67: monetary rides as EXACT integer cents so the quintile sort key
# and the segment average are order-independent (see the Spark twin).
ORACLES["q67_rfm_segments"] = """
WITH per_cust AS (
    SELECT o_custkey,
           max(CAST(o_orderdate AS DATE)) AS last_day,
           count(*) AS frequency,
           CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT)
               AS monetary_cents
    FROM orders GROUP BY o_custkey
),
anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
base AS (
    SELECT o_custkey,
           date_diff('day', last_day, ref_day) AS recency_days,
           frequency, monetary_cents
    FROM per_cust CROSS JOIN anchor
),
scored AS (
    SELECT *,
        ntile(5) OVER (ORDER BY recency_days ASC, o_custkey)     AS r_q,
        ntile(5) OVER (ORDER BY frequency DESC, o_custkey)       AS f_q,
        ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey)  AS m_q
    FROM base
)
SELECT CAST(r_q AS VARCHAR) || '-' || CAST(f_q AS VARCHAR) || '-' ||
       CAST(m_q AS VARCHAR) AS segment,
       count(*) AS n_customers,
       round(avg(recency_days), 4) AS avg_recency,
       round(avg(frequency), 4) AS avg_frequency,
       CAST(sum(monetary_cents) // count(*) AS BIGINT)
           AS avg_monetary_cents
FROM scored
GROUP BY segment
ORDER BY segment
"""

# s07: only lane RANKS cross the fusion boundary — the cosine mirrors
# s01's float recipe (proven bit-exact), tf/idf and RRF are integer.
ORACLES["s07_rrf_fusion"] = """
WITH q AS (
    SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0
),
vpairs AS (
    SELECT e.vec_id AS id,
        round(
            list_dot_product(
                list_transform(q.q_vec, x -> CAST(x AS DOUBLE)),
                list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
            / (sqrt(list_dot_product(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)),
                                     list_transform(q.q_vec, x -> CAST(x AS DOUBLE))))
               * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                       list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
            6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
),
vranked AS (
    SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS v_rank
    FROM vpairs
),
vlane AS (SELECT id, v_rank FROM vranked WHERE v_rank <= 20),
toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM toks WHERE term IN ('window', 'hash', 'stream')
    GROUP BY doc_id, term
),
idf AS (
    SELECT term,
           (1000000 * ((SELECT count(*) FROM documents) - count(*)))
               // (count(*) + 1) AS idf6
    FROM tf GROUP BY term
),
lex_scored AS (
    SELECT t.doc_id, CAST(sum(t.tf * i.idf6) AS BIGINT) AS lex_score
    FROM tf t JOIN idf i ON t.term = i.term
    GROUP BY t.doc_id
),
lranked AS (
    SELECT doc_id AS id,
           row_number() OVER (ORDER BY lex_score DESC, doc_id) AS l_rank
    FROM lex_scored
),
llane AS (SELECT id, l_rank FROM lranked WHERE l_rank <= 20),
fused AS (
    SELECT COALESCE(v.id, l.id) AS id,
           CAST(v.v_rank AS INTEGER) AS v_rank,
           CAST(l.l_rank AS INTEGER) AS l_rank,
           COALESCE(1000000000 // (60 + v.v_rank), 0)
             + COALESCE(1000000000 // (60 + l.l_rank), 0) AS rrf_score
    FROM vlane v FULL OUTER JOIN llane l ON v.id = l.id
)
SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, id) AS INTEGER)
           AS fused_rank,
       id, v_rank, l_rank, CAST(rrf_score AS BIGINT) AS rrf_score
FROM fused
QUALIFY fused_rank <= 10
ORDER BY fused_rank
"""


# q68: PageRank in exact integer ppm over the mirrored kNN edges —
# the 5-iteration recurrence unrolled into CTE stages (the s03
# Lloyd-unroll discipline applied to an iterative graph algorithm).
def _q68_oracle(n_bits: int = 8, k: int = 5, iters: int = 5) -> str:
    stages = []
    prev = "r0"
    for i in range(1, iters + 1):
        stages.append(f"""r{i} AS (
    SELECT n.node,
           CAST(150000 + (850000 * COALESCE(s.s, 0)) // 1000000
                AS BIGINT) AS r
    FROM prnodes n LEFT JOIN (
        SELECT e.dst, CAST(sum(p.r // o.od) AS BIGINT) AS s
        FROM predges e
        JOIN {prev} p ON p.node = e.src
        JOIN proutdeg o ON o.src = e.src
        GROUP BY e.dst
    ) s ON s.dst = n.node
)""")
        prev = f"r{i}"
    stage_sql = ",\n".join(stages)
    return f"""{_knn_graph_ctes(n_bits, k)},
predges AS (SELECT query_id AS src, cand_id AS dst FROM knn),
proutdeg AS (SELECT src, count(*) AS od FROM predges GROUP BY src),
prnodes AS (SELECT src AS node FROM predges
            UNION SELECT dst FROM predges),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM prnodes),
{stage_sql}
SELECT CAST(row_number() OVER (ORDER BY r DESC, node) AS INTEGER) AS rnk,
       node AS vec_id, r AS rank_ppm
FROM {prev}
QUALIFY rnk <= 20
ORDER BY rnk
"""


ORACLES["q68_pagerank_centrality"] = _q68_oracle()


# p16: power-of-two bucket via integer CASE chain (no float log);
# in-bucket (length, doc_id) rank; 8-doc batches pad to batch max.
ORACLES["p16_length_batching"] = """
WITH sized AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tokens
    FROM documents
),
bucketed AS (
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens <= 1 THEN 1
                WHEN n_tokens <= 2 THEN 2
                WHEN n_tokens <= 4 THEN 4
                WHEN n_tokens <= 8 THEN 8
                WHEN n_tokens <= 16 THEN 16
                WHEN n_tokens <= 32 THEN 32
                WHEN n_tokens <= 64 THEN 64
                WHEN n_tokens <= 128 THEN 128
                WHEN n_tokens <= 256 THEN 256
                WHEN n_tokens <= 512 THEN 512
                WHEN n_tokens <= 1024 THEN 1024
                WHEN n_tokens <= 2048 THEN 2048
                ELSE 4096 END AS bucket
    FROM sized WHERE n_tokens > 0
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY bucket
                                 ORDER BY n_tokens, doc_id) AS rnk
    FROM bucketed
),
per_batch AS (
    SELECT bucket, (rnk - 1) // 8 AS batch,
           count(*) AS bn, sum(n_tokens) AS bt, max(n_tokens) AS bmax
    FROM ranked GROUP BY bucket, batch
),
per_bucket AS (
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(sum(bn) AS BIGINT) AS n_docs,
           count(*) AS n_batches,
           CAST(sum(bt) AS BIGINT) AS total_tokens,
           CAST(sum(bn * bmax) AS BIGINT) AS padded_tokens
    FROM per_batch GROUP BY bucket
)
SELECT *,
       CAST(1000000 * (padded_tokens - total_tokens) // padded_tokens
            AS BIGINT) AS waste_ppm
FROM per_bucket
ORDER BY bucket
"""


# q69: the VARIANT extraction replayed with DuckDB JSON operators —
# same constructed document, same paths, TRY_CAST mirrors
# try_variant_get's NULL-on-type-mismatch.
ORACLES["q69_variant_json"] = """
WITH built AS (
    SELECT event_type,
           '{"user":{"id":' || CAST(user_id AS VARCHAR) ||
           ',"seg":"' || event_type || '"},"vals":[' ||
           CAST(event_id % 100 AS VARCHAR) || ',' ||
           CAST((event_id % 7) * 3 AS VARCHAR) || ']}' AS doc
    FROM events
),
parsed AS (
    SELECT event_type,
           CAST(json_extract(doc, '$.user.id') AS BIGINT) AS uid,
           CAST(json_extract(doc, '$.vals[1]') AS BIGINT) AS val1,
           TRY_CAST(json_extract_string(doc, '$.user.seg') AS INTEGER)
               AS seg_as_int
    FROM built
)
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT uid) AS n_users,
       CAST(sum(val1) AS BIGINT) AS sum_val1,
       CAST(sum(CASE WHEN seg_as_int IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_failed_casts
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""


# q70: the Morton curve replayed in integer arithmetic — same cells,
# same interleave terms, same bin width as operators/zorder.py.
def _q70_oracle(bits: int = 10, n_bins: int = 64) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((xc // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((yc // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    zexpr = " + ".join(terms)
    bin_width = (1 << (2 * bits)) // n_bins
    grid = 1 << (2 * bits)
    return f"""
WITH b AS (
    SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
           min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
    FROM lineitem
),
cells AS (
    SELECT (CAST(l_partkey - xmin AS BIGINT) * {1 << bits})
               // (CAST(xmax AS BIGINT) - xmin + 1) AS xc,
           (CAST(l_suppkey - ymin AS BIGINT) * {1 << bits})
               // (CAST(ymax AS BIGINT) - ymin + 1) AS yc
    FROM lineitem, b
),
z AS (SELECT xc, yc, ({zexpr}) AS zval FROM cells),
per_bin AS (
    SELECT zval // {bin_width} AS bin,
           count(*) AS n_rows,
           min(xc) AS x_min, max(xc) AS x_max,
           min(yc) AS y_min, max(yc) AS y_max
    FROM z GROUP BY 1
)
SELECT bin, n_rows, x_min, x_max, y_min, y_max,
       (1000000 * (x_max - x_min + 1) * (y_max - y_min + 1)) // {grid}
           AS bbox_ppm
FROM per_bin
ORDER BY bin
"""


ORACLES["q70_zorder_layout"] = _q70_oracle()


# q71: degree-ordered triangle counting replayed over the mirrored
# kNN edges. UNION ALL everywhere Spark's union (= UNION ALL) is
# used; all-integer outputs.
def _q71_oracle(n_bits: int = 8, k: int = 5) -> str:
    return f"""{_knn_graph_ctes(n_bits, k)},
und AS (
    SELECT DISTINCT least(query_id, cand_id) AS a,
                    greatest(query_id, cand_id) AS b
    FROM knn WHERE query_id <> cand_id
),
degs AS (
    SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
    ) GROUP BY node
),
orient AS (
    SELECT CASE WHEN da.degree < db.degree
                  OR (da.degree = db.degree AND u.a < u.b)
                THEN u.a ELSE u.b END AS lo,
           CASE WHEN da.degree < db.degree
                  OR (da.degree = db.degree AND u.a < u.b)
                THEN u.b ELSE u.a END AS hi
    FROM und u
    JOIN degs da ON da.node = u.a
    JOIN degs db ON db.node = u.b
),
wedges AS (
    SELECT w1.apex, w1.u, w2.v
    FROM (SELECT lo AS apex, hi AS u FROM orient) w1
    JOIN (SELECT lo AS apex, hi AS v FROM orient) w2 ON w1.apex = w2.apex
    WHERE w1.u < w2.v
),
tris AS (
    SELECT apex, u, v FROM wedges
    JOIN und ON und.a = wedges.u AND und.b = wedges.v
),
corners AS (
    SELECT node, count(*) AS n_triangles FROM (
        SELECT apex AS node FROM tris
        UNION ALL SELECT u FROM tris
        UNION ALL SELECT v FROM tris
    ) GROUP BY node
)
SELECT d.node AS vec_id, d.degree,
       coalesce(c.n_triangles, 0) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN
           (2000000 * coalesce(c.n_triangles, 0))
               // (d.degree * (d.degree - 1))
       ELSE 0 END AS clustering_ppm
FROM degs d LEFT JOIN corners c ON c.node = d.node
ORDER BY vec_id
"""


ORACLES["q71_triangle_count"] = _q71_oracle()


# q72: the packed-BIGINT EWMA fold replayed with list_reduce — same
# init convention (element 1 is the seed state), same truncating
# integer arithmetic, so every lane is bit-exact. Struct accumulators
# are deliberately avoided: DuckDB 1.0's list_reduce folds struct
# FIELDS inconsistently (observed: one field linearly folded, a
# sibling lambda applied once) — the packed scalar is the portable
# encoding.
ORACLES["q72_ewma_smoothing"] = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
    FROM events GROUP BY 1, 2
),
ser AS (
    SELECT event_type,
        list(CAST(cnt AS BIGINT) * 1000 ORDER BY day) AS x,
        count(*) AS n_days
    FROM daily GROUP BY event_type
),
red AS (
    SELECT event_type, n_days,
        list_reduce(
            list_prepend(x[1] * 4294967296 + x[1], x[2:]),
            (acc, el) ->
                ((3 * el + 7 * (acc // 4294967296)) // 10) * 4294967296
                + greatest(acc % 4294967296,
                           (3 * el + 7 * (acc // 4294967296)) // 10)
        ) AS acc_a,
        list_reduce(
            list_prepend(x[1] * 4294967296, x[2:]),
            (acc, el) ->
                ((3 * el + 7 * (acc // 4294967296)) // 10) * 4294967296
                + (acc % 4294967296)
                + (CASE WHEN el > 2 * (acc // 4294967296)
                        THEN 1 ELSE 0 END)
        ) AS acc_b
    FROM ser
)
SELECT event_type, CAST(n_days AS INT) AS n_days,
    acc_a // 4294967296 AS ewma_final_milli,
    acc_a % 4294967296 AS ewma_peak_milli,
    acc_b % 4294967296 AS n_spikes
FROM red ORDER BY event_type
"""


# p17: LOO target encoding — exact integer cents into one fixed
# float expression, mirrored operation-for-operation.
ORACLES["p17_target_encoding"] = """
WITH per_cust AS (
    SELECT o_custkey,
        CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS spend_cents
    FROM orders GROUP BY o_custkey
),
base AS (
    SELECT c.c_custkey, c.c_mktsegment,
        coalesce(p.spend_cents, 0) AS spend_cents
    FROM customer c LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey
),
seg AS (
    SELECT c_mktsegment, sum(spend_cents) AS seg_sum,
        count(*) AS seg_n
    FROM base GROUP BY c_mktsegment
),
overall AS (
    SELECT sum(spend_cents) AS g_sum, count(*) AS g_n FROM base
)
SELECT b.c_custkey, b.c_mktsegment, b.spend_cents,
    round((((s.seg_sum - b.spend_cents)
            + 10.0e0 * (CAST(g.g_sum AS DOUBLE) / CAST(g.g_n AS DOUBLE)))
           / (s.seg_n - 1 + 10)) / 100.0e0, 4) AS loo_enc
FROM base b
JOIN seg s ON s.c_mktsegment = b.c_mktsegment
CROSS JOIN overall g
ORDER BY b.c_custkey
"""


# q73: PSI drift — identical binning floats, Laplace smoothing, and
# the bin-ordered fold for the sum (never a SUM over doubles).
ORACLES["q73_drift_psi"] = """
WITH b AS (
    SELECT min(value) AS vmin, max(value) AS vmax,
           min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
    FROM events
),
binned AS (
    SELECT event_type,
        CASE WHEN date_diff('day', d0, CAST(ts AS DATE)) * 2
                  < date_diff('day', d0, d1) + 1
             THEN 1 ELSE 2 END AS win,
        CASE WHEN vmax = vmin THEN 0
             ELSE least(9, CAST(floor((value - vmin) * 10.0e0
                                      / (vmax - vmin)) AS INT))
        END AS bin
    FROM events, b
),
counts AS (
    SELECT event_type, bin,
        sum(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN win = 2 THEN 1 ELSE 0 END) AS n2
    FROM binned GROUP BY event_type, bin
),
spine AS (
    SELECT event_type, s.bin
    FROM (SELECT DISTINCT event_type FROM events)
    CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) s
),
full_bins AS (
    SELECT sp.event_type, sp.bin,
        coalesce(c.n1, 0) AS n1, coalesce(c.n2, 0) AS n2
    FROM spine sp
    LEFT JOIN counts c ON c.event_type = sp.event_type AND c.bin = sp.bin
),
per_type AS (
    SELECT event_type,
        CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2,
        list(struct_pack(bin := bin, n1 := n1, n2 := n2)
             ORDER BY bin) AS arr
    FROM full_bins GROUP BY event_type
),
ct AS (
    SELECT event_type, t1, t2,
        list_transform(arr, e ->
            ((CAST(e.n1 + 1 AS DOUBLE) / (t1 + 10))
             - (CAST(e.n2 + 1 AS DOUBLE) / (t2 + 10)))
            * ln((CAST(e.n1 + 1 AS DOUBLE) / (t1 + 10))
                 / (CAST(e.n2 + 1 AS DOUBLE) / (t2 + 10)))) AS c
    FROM per_type
)
SELECT event_type, t1, t2,
    round(list_reduce(list_prepend(0.0e0, c), (a, x) -> a + x), 6) AS psi,
    CAST(list_indexof(c, list_max(c)) AS INT) AS top_bin_1idx
FROM ct ORDER BY event_type
"""


# q74: Wilson interval — exact integer counts into one fixed float
# expression (sqrt is correctly rounded IEEE in both engines).
ORACLES["q74_wilson_ci"] = """
WITH counts AS (
    SELECT CAST(user_id % 2 AS INT) AS arm,
        count(DISTINCT user_id) AS n_users,
        count(DISTINCT CASE WHEN event_type = 'purchase'
                            THEN user_id END) AS conv_users
    FROM events GROUP BY 1
)
SELECT arm, n_users, conv_users,
    round((CAST(conv_users AS DOUBLE) / n_users), 6) AS conv_rate,
    round((((CAST(conv_users AS DOUBLE) / n_users)
            + 3.8416e0 / (2.0e0 * n_users))
           / (1.0e0 + 3.8416e0 / n_users))
          - (1.96e0 * sqrt((CAST(conv_users AS DOUBLE) / n_users)
                 * (1.0e0 - (CAST(conv_users AS DOUBLE) / n_users))
                 / n_users
                 + 3.8416e0 / (4.0e0 * n_users * n_users))
             / (1.0e0 + 3.8416e0 / n_users)), 6) AS wilson_lo,
    round((((CAST(conv_users AS DOUBLE) / n_users)
            + 3.8416e0 / (2.0e0 * n_users))
           / (1.0e0 + 3.8416e0 / n_users))
          + (1.96e0 * sqrt((CAST(conv_users AS DOUBLE) / n_users)
                 * (1.0e0 - (CAST(conv_users AS DOUBLE) / n_users))
                 / n_users
                 + 3.8416e0 / (4.0e0 * n_users * n_users))
             / (1.0e0 + 3.8416e0 / n_users)), 6) AS wilson_hi
FROM counts ORDER BY arm
"""


# q75: chi-square independence — same sorted-cell array, same
# in-array marginal folds, same pinned-order chi2 sum.
ORACLES["q75_chi_square"] = """
WITH cells AS (
    SELECT CAST(user_id % 2 AS INT) AS arm, event_type,
        count(*) AS o
    FROM events GROUP BY 1, 2
),
observed AS (
    SELECT list(struct_pack(arm := arm, event_type := event_type,
                            o := o)
                ORDER BY arm, event_type) AS obs
    FROM cells
),
-- complete to the FULL arm x type cross product (absent cells get
-- o = 0): a chi-square over only observed cells drops each missing
-- cell's (0-e)^2/e term and understates the statistic
packed AS (
    SELECT flatten(list_transform(
        list_sort(list_distinct(list_transform(obs, c -> c.arm))),
        a -> list_transform(
            list_sort(list_distinct(list_transform(obs,
                c -> c.event_type))),
            t -> struct_pack(arm := a, event_type := t,
                o := list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(list_filter(obs,
                        x -> x.arm = a AND x.event_type = t),
                        x -> x.o)), (acc, x) -> acc + x))))) AS cs
    FROM observed
),
ec AS (
    SELECT list_transform(cs, c -> struct_pack(
        arm := c.arm, event_type := c.event_type, o := c.o,
        e := CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(list_filter(cs, x -> x.arm = c.arm),
                                x -> x.o)), (a, x) -> a + x) AS DOUBLE)
             * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(list_filter(cs,
                     x -> x.event_type = c.event_type),
                                x -> x.o)), (a, x) -> a + x) AS DOUBLE)
             / CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(cs, x -> x.o)),
                 (a, x) -> a + x) AS DOUBLE))) AS ecs,
        (len(list_distinct(list_transform(cs, c -> c.arm))) - 1)
        * (len(list_distinct(list_transform(cs, c -> c.event_type))) - 1)
            AS dof
    FROM packed
),
cc AS (
    SELECT list_transform(ecs, c -> struct_pack(
        arm := c.arm, event_type := c.event_type, o := c.o, e := c.e,
        contrib := (c.o - c.e) * (c.o - c.e) / c.e)) AS ccs,
        dof
    FROM ec
),
tot AS (
    SELECT ccs, dof,
        round(list_reduce(list_prepend(0.0e0,
            list_transform(ccs, x -> x.contrib)), (a, x) -> a + x), 6)
            AS chi2
    FROM cc
)
SELECT u.c.arm AS arm, u.c.event_type AS event_type,
    u.c.o AS observed,
    round(u.c.e, 4) AS expected,
    round(u.c.contrib, 6) AS contrib,
    chi2, CAST(dof AS INT) AS dof
FROM tot, unnest(tot.ccs) AS u(c)
ORDER BY arm, event_type
"""

# q76: the same recursive walk as q66's oracle — the Spark side now
# runs a NATIVE recursive CTE (Spark 4.x), so both engines execute
# the literal level-at-a-time recursion.
ORACLES["q76_sql_recursive"] = ORACLES["q66_hierarchy_rollup"]

# q77: identical rank decomposition (per-value counts -> prefix sum
# over distinct values -> doubled integer rank sums) and the identical
# z expression text; the tie term rides HUGEINT (Spark: DECIMAL(38)).
ORACLES["q77_mann_whitney"] = """
WITH per_val AS (
    SELECT value,
           count(*) AS cnt,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
           CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY value
),
ranked AS (
    SELECT *, sum(cnt) OVER (ORDER BY value) AS cum FROM per_val
),
stats AS (
    SELECT CAST(sum(na) AS BIGINT) AS n_a,
           CAST(sum(nb) AS BIGINT) AS n_b,
           CAST(sum(na * (2 * cum - cnt + 1)) AS BIGINT) AS rank_sum_a_x2,
           sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS __tie
    FROM ranked
)
SELECT n_a, n_b, rank_sum_a_x2,
       rank_sum_a_x2 - n_a * (n_a + 1) AS u_a_x2,
       CAST(__tie AS BIGINT) AS tie_term,
       round((CAST(rank_sum_a_x2 - n_a * (n_a + 1) AS DOUBLE)
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             / (2.0 * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                * (CAST(n_a + n_b + 1 AS DOUBLE)
                   - CAST(__tie AS DOUBLE)
                     / (CAST(n_a + n_b AS DOUBLE)
                        * CAST(n_a + n_b - 1 AS DOUBLE))))), 6) AS z_score
FROM stats
"""


# q78: the same peel unrolled as fixed CTE stages over the mirrored
# kNN edges — peeling is monotone, so extra stages after convergence
# are no-ops and the unroll equals Spark's converged fixpoint (Spark
# RAISES past max_rounds=16, so a too-short unroll can never pass
# silently). Stages are MATERIALIZED: each round references the
# previous one three times, so inlined CTEs would expand the knn
# backbone 3^rounds times (measured: "Too many open files").
def _q78_oracle(k: int = 3, thr: float = 0.15, rounds: int = 16,
                n_bits: int = 8) -> str:
    stages = [
        f"""
e0 AS MATERIALIZED (
    SELECT DISTINCT least(query_id, cand_id) AS a,
                    greatest(query_id, cand_id) AS b
    FROM knn WHERE query_id <> cand_id AND cosine >= {thr}
)"""
    ]
    for r in range(1, rounds + 1):
        stages.append(f"""
d{r} AS MATERIALIZED (
    SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM e{r - 1} UNION ALL SELECT b FROM e{r - 1}
    ) GROUP BY node
),
a{r} AS (SELECT node FROM d{r} WHERE deg >= {k}),
e{r} AS MATERIALIZED (
    SELECT e.a, e.b FROM e{r - 1} e
    JOIN a{r} x ON x.node = e.a
    JOIN a{r} y ON y.node = e.b
)""")
    final = f"""
dfin AS (
    SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
    ) GROUP BY node
)
SELECT node AS vec_id, CAST(deg AS BIGINT) AS core_degree
FROM dfin WHERE deg >= {k}
ORDER BY vec_id
"""
    return f"{_knn_graph_ctes(n_bits, 5)},{','.join(stages)},{final}"


ORACLES["q78_kcore"] = _q78_oracle()

# q79: identical exact-cents revenue, per-segment ascending rank,
# HUGEINT rank x cents products (Spark: DECIMAL(38)), identical Gini
# expression text.
ORACLES["q79_gini_concentration"] = """
WITH per_cust AS (
    SELECT o_custkey,
           CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
seg AS (
    SELECT p.o_custkey, p.cents, c.c_mktsegment
    FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY c_mktsegment ORDER BY cents, o_custkey) AS i
    FROM seg
),
agg AS (
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           sum(CAST(i AS HUGEINT) * cents) AS __s1
    FROM ranked GROUP BY c_mktsegment
)
SELECT c_mktsegment, n_customers, total_cents,
       round((2.0 * CAST(__s1 AS DOUBLE)
              - (CAST(n_customers AS DOUBLE) + 1.0)
                * CAST(total_cents AS DOUBLE))
             / (CAST(n_customers AS DOUBLE)
                * CAST(total_cents AS DOUBLE)), 6) AS gini
FROM agg
ORDER BY c_mktsegment
"""

# s08: both graphs mirrored — the exact side is the s01 brute-force
# shape restricted to the 5% sample, the approximate side is the knn
# backbone; identical semi-join overlap + integer ppm recall.
ORACLES["s08_ann_recall_eval"] = _knn_graph_ctes(8, 5) + """,
sample AS (SELECT vec_id AS query_id FROM embeddings
           WHERE vec_id % 20 = 0 AND vec_id < 10000),
exact_pairs AS (
    SELECT s.query_id, e.vec_id AS cand_id,
        round(
            list_dot_product(
                list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
            / (sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                                     list_transform(q.embedding, x -> CAST(x AS DOUBLE))))
               * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                       list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
            6) AS cosine
    FROM sample s
    JOIN embeddings q ON q.vec_id = s.query_id
    CROSS JOIN embeddings e
    WHERE e.vec_id <> s.query_id
),
exact_top AS (
    SELECT query_id, cand_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id) AS rnk
        FROM exact_pairs
    ) WHERE rnk <= 5
),
approx AS (
    SELECT query_id, cand_id FROM knn
    WHERE query_id % 20 = 0 AND query_id < 10000
),
hits AS (
    SELECT a.query_id, count(*) AS n_hits
    FROM approx a
    WHERE EXISTS (SELECT 1 FROM exact_top e
                  WHERE e.query_id = a.query_id AND e.cand_id = a.cand_id)
    GROUP BY a.query_id
),
per_query AS (
    SELECT CAST(coalesce(h.n_hits, 0) AS INTEGER) AS n_hits
    FROM sample s LEFT JOIN hits h ON h.query_id = s.query_id
),
total AS (
    SELECT CAST(1000000 * sum(n_hits) // (5 * count(*)) AS BIGINT)
        AS recall_ppm
    FROM per_query
)
SELECT n_hits, CAST(count(*) AS BIGINT) AS n_queries,
       (SELECT recall_ppm FROM total) AS recall_ppm
FROM per_query GROUP BY n_hits
ORDER BY n_hits
"""

# q80: identical milli-unit integer CUSUM via the same prefix-minimum
# window identity S_t = P_t - min(0, min_{j<=t} P_j).
ORACLES["q80_cusum_changepoint"] = """
WITH daily AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
    FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
),
mu AS (
    SELECT event_type, (1000 * sum(cnt)) // count(*) AS mu_milli
    FROM daily GROUP BY event_type
),
y AS (
    SELECT d.event_type, d.day, d.cnt, m.mu_milli,
           1000 * d.cnt - m.mu_milli - m.mu_milli // 10 AS y_milli
    FROM daily d JOIN mu m ON m.event_type = d.event_type
),
p AS (
    SELECT *, sum(y_milli) OVER (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __p
    FROM y
)
SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
       CAST(__p - least(0, min(__p) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT)
           AS cusum_milli,
       CAST(CASE WHEN __p - least(0, min(__p) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           > 4 * mu_milli THEN 1 ELSE 0 END AS INTEGER) AS alarm
FROM p
ORDER BY event_type, day
"""

# d19: identical shingling (distinct word 3-grams, short-doc fallback
# to the whole text), df>=2 prune, and integer ppm containment.
ORACLES["d19_containment_dedup"] = """
WITH toks AS (
    SELECT doc_id AS doc, string_split(text, ' ') AS t FROM documents
),
sh AS (
    SELECT DISTINCT doc, s FROM (
        SELECT doc, unnest(CASE WHEN len(t) >= 3
            THEN list_distinct(list_transform(
                generate_series(1, len(t) - 2),
                i -> array_to_string(t[i:i+2], ' ')))
            ELSE [array_to_string(t, ' ')] END) AS s
        FROM toks)
),
sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
shared AS (SELECT s FROM sh GROUP BY s
           HAVING count(*) BETWEEN 2 AND 100),
sh_shared AS (SELECT sh.doc, sh.s FROM sh JOIN shared USING (s)),
inter AS (
    SELECT a.doc AS doc_x, b.doc AS doc_y, count(*) AS inter
    FROM sh_shared a JOIN sh_shared b
      ON a.s = b.s AND a.doc < b.doc
    GROUP BY a.doc, b.doc
),
scored AS (
    SELECT CASE WHEN sx.n_sh < sy.n_sh
                  OR (sx.n_sh = sy.n_sh AND i.doc_x < i.doc_y)
                THEN i.doc_x ELSE i.doc_y END AS doc_small,
           CASE WHEN sx.n_sh < sy.n_sh
                  OR (sx.n_sh = sy.n_sh AND i.doc_x < i.doc_y)
                THEN i.doc_y ELSE i.doc_x END AS doc_big,
           i.inter,
           least(sx.n_sh, sy.n_sh) AS n_small,
           greatest(sx.n_sh, sy.n_sh) AS n_big,
           1000000 * i.inter // least(sx.n_sh, sy.n_sh)
               AS containment_ppm
    FROM inter i
    JOIN sizes sx ON sx.doc = i.doc_x
    JOIN sizes sy ON sy.doc = i.doc_y
)
SELECT * FROM scored
WHERE containment_ppm >= 800000
ORDER BY containment_ppm DESC, doc_small, doc_big
"""

# t21: identical counts and identical G2 expression text (ln is IEEE
# on both engines; the wt = o1 arm avoids ln(0) identically).
ORACLES["t21_keyness_loglik"] = """
WITH sw AS (
    SELECT source, word, count(*) AS o1 FROM (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL
    ) WHERE word <> ''
    GROUP BY source, word
),
word_tot AS (SELECT word, sum(o1) AS wt FROM sw GROUP BY word),
src_tot AS (SELECT source, sum(o1) AS st FROM sw GROUP BY source),
gtot AS (SELECT sum(st) AS gt FROM src_tot),
scored AS (
    SELECT sw.source, sw.word, sw.o1, w.wt,
           round(2.0 * (
             CAST(sw.o1 AS DOUBLE) * ln(CAST(sw.o1 AS DOUBLE)
               / (CAST(s.st AS DOUBLE) * CAST(w.wt AS DOUBLE)
                  / CAST(g.gt AS DOUBLE)))
             + CASE WHEN w.wt = sw.o1 THEN 0.0 ELSE
               CAST(w.wt - sw.o1 AS DOUBLE) * ln(CAST(w.wt - sw.o1 AS DOUBLE)
                 / (CAST(g.gt - s.st AS DOUBLE) * CAST(w.wt AS DOUBLE)
                    / CAST(g.gt AS DOUBLE))) END), 4) AS g2
    FROM sw
    JOIN word_tot w USING (word)
    JOIN src_tot s USING (source)
    CROSS JOIN gtot g
    WHERE CAST(sw.o1 AS DOUBLE) * CAST(g.gt AS DOUBLE)
          > CAST(s.st AS DOUBLE) * CAST(w.wt AS DOUBLE)
)
SELECT source, CAST(rnk AS INTEGER) AS rnk, word,
       CAST(o1 AS BIGINT) AS o1, CAST(wt AS BIGINT) AS wt, g2
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY g2 DESC, word) AS rnk
    FROM scored
) WHERE rnk <= 5
ORDER BY source, rnk
"""

# m07: m04's byte-replay windows + the identical above-mean integer
# gate and win_idx − row_number() run-length segmentation.
ORACLES["m07_audio_vad"] = """
WITH b AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
),
wins AS (
    SELECT doc_id, unnest(range((nb - 64) // 16 + 1)) AS w, hx
    FROM b WHERE nb >= 64
),
samp AS (
    SELECT doc_id, w,
        list_transform(range(64),
            j -> CAST(('0x' || substr(hx, CAST(2 * (16 * w + j) + 1 AS INT), 2))
                      AS INT) - 128) AS s
    FROM wins
),
feat AS (
    SELECT doc_id, w,
        CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy
    FROM samp
),
tot AS (
    SELECT doc_id, count(*) AS nw, sum(energy) AS te
    FROM feat GROUP BY doc_id
),
act AS (
    SELECT f.doc_id, f.w, f.energy
    FROM feat f JOIN tot t USING (doc_id)
    WHERE f.energy * t.nw > t.te
),
runs AS (
    SELECT *, w - row_number() OVER (
        PARTITION BY doc_id ORDER BY w) AS grp
    FROM act
),
segs AS (
    SELECT doc_id,
           CAST(min(w) AS BIGINT) AS start_win,
           CAST(max(w) AS BIGINT) AS end_win,
           CAST(count(*) AS BIGINT) AS n_active_wins,
           CAST(sum(energy) AS BIGINT) AS seg_energy
    FROM runs GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY start_win) AS INT) AS seg_idx,
       start_win, end_win, n_active_wins, seg_energy
FROM segs
ORDER BY doc_id, seg_idx
"""

# q81: identical md5 24-bit Poisson(1) weights, integer-cents replica
# means, rank-5/rank-196 CI ends. DuckDB's conv-from-hex is the
# ('0x' || ...)::INT cast; Spark's is conv(..., 16, 10).
ORACLES["q81_bootstrap_ci"] = """
WITH per_user AS (
    SELECT user_id,
           CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents,
           CAST(user_id % 2 AS INTEGER) AS arm
    FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
    GROUP BY user_id
),
reps AS (
    SELECT arm, user_id, cents, b,
           CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || ':' ||
                 CAST(user_id AS VARCHAR)), 1, 6)) AS BIGINT) AS __u
    FROM per_user, (SELECT unnest(generate_series(0, 199)) AS b)
),
weighted AS (
    SELECT arm, b, cents,
           CASE WHEN __u < 6171993 THEN 0
                WHEN __u < 12343986 THEN 1
                WHEN __u < 15429982 THEN 2
                WHEN __u < 16458648 THEN 3
                WHEN __u < 16715814 THEN 4
                WHEN __u < 16767247 THEN 5
                WHEN __u < 16775819 THEN 6
                ELSE 7 END AS w
    FROM reps
),
means AS (
    SELECT arm, b, (1000 * sum(w * cents)) // sum(w) AS mean_milli
    FROM weighted GROUP BY arm, b HAVING sum(w) > 0
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY arm ORDER BY mean_milli, b) AS rn
    FROM means
),
ci AS (
    SELECT arm,
           CAST(min(mean_milli) AS BIGINT) AS ci_lo_milli,
           CAST(max(mean_milli) AS BIGINT) AS ci_hi_milli
    FROM ranked WHERE rn IN (5, 196) GROUP BY arm
),
point AS (
    SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
           CAST((1000 * sum(cents)) // count(*) AS BIGINT) AS mean_milli
    FROM per_user GROUP BY arm
)
SELECT p.arm, p.n_users, p.mean_milli, c.ci_lo_milli, c.ci_hi_milli
FROM point p JOIN ci c ON c.arm = p.arm
ORDER BY p.arm
"""

# q82: identical integer milli decomposition; DuckDB dayofweek() is
# 0=Sunday..6 while Spark's dayofweek() is 1=Sunday..7 — join keys
# only need to AGREE as partitions, so the oracle mirrors Spark's
# 1-based convention explicitly.
ORACLES["q82_seasonal_decompose"] = """
WITH daily AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
    FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
),
trended AS (
    SELECT event_type, day, cnt,
           CASE WHEN count(*) OVER w = 7
                THEN (1000 * sum(cnt) OVER w) // 7 END AS trend_milli,
           dayofweek(CAST(day AS DATE)) + 1 AS dow
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
    SELECT *, 1000 * cnt - trend_milli AS detrended_milli FROM trended
),
seas AS (
    SELECT event_type, dow,
           sum(detrended_milli) // count(*) AS seasonal_milli
    FROM det WHERE detrended_milli IS NOT NULL
    GROUP BY event_type, dow
)
SELECT d.event_type, d.day, CAST(d.cnt AS BIGINT) AS cnt,
       CAST(d.trend_milli AS BIGINT) AS trend_milli,
       CAST(s.seasonal_milli AS BIGINT) AS seasonal_milli,
       CAST(d.detrended_milli - s.seasonal_milli AS BIGINT)
           AS residual_milli
FROM det d LEFT JOIN seas s
  ON s.event_type = d.event_type AND s.dow = d.dow
ORDER BY d.event_type, d.day
"""

# q83: DuckDB's native ASOF join + exact integer-second delays + the
# lower-quantile rank rule den·rn ≥ num·n on (delay, event_id) order
# (grouped_weighted_quantiles' crossing definition).
ORACLES["q83_time_to_convert"] = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
views AS (
    SELECT user_id, ts FROM events WHERE event_type = 'view'
),
attributed AS (
    SELECT p.event_id, p.user_id, p.ts, v.ts AS vts
    FROM purchases p
    ASOF JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts
),
delays AS (
    SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
           (epoch_us(a.ts) - epoch_us(a.vts)) // 1000000 AS delay_s,
           a.event_id
    FROM attributed a
    LEFT JOIN customer c ON c.c_custkey = a.user_id
),
ranked AS (
    SELECT *, row_number() OVER (
               PARTITION BY segment ORDER BY delay_s, event_id) AS rn,
           count(*) OVER (PARTITION BY segment) AS n
    FROM delays
)
SELECT segment,
       CAST(max(n) AS BIGINT) AS n_conversions,
       CAST(min(CASE WHEN 2 * rn >= n THEN delay_s END) AS BIGINT) AS p50_s,
       CAST(min(CASE WHEN 10 * rn >= 9 * n THEN delay_s END) AS BIGINT)
           AS p90_s
FROM ranked
GROUP BY segment
ORDER BY segment
"""

# q84: exact NTILE on (score DESC, user_id) + identical cross-
# multiplied integer ppm lift/capture.
ORACLES["q84_lift_gains"] = """
WITH per_user AS (
    SELECT user_id,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS score,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id
),
tiled AS (
    SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
    FROM per_user
),
per_dec AS (
    SELECT decile, count(*) AS n_users, sum(converted) AS n_converted
    FROM tiled GROUP BY decile
),
tot AS (
    SELECT *,
           sum(n_converted) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos,
           sum(n_converted) OVER () AS pos_all,
           sum(n_users) OVER () AS n_all
    FROM per_dec
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_converted AS BIGINT) AS n_converted,
       CAST((1000000 * n_converted * n_all) // (n_users * pos_all)
           AS BIGINT) AS lift_ppm,
       CAST((1000000 * cum_pos) // pos_all AS BIGINT) AS cum_capture_ppm
FROM tot
ORDER BY decile
"""

# q85: identical distinct (source, word) frame, ordered-pair self-join,
# integer ppm similarity.
ORACLES["q85_source_overlap"] = """
WITH sw AS (
    SELECT DISTINCT source, word FROM (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL
    ) WHERE word <> ''
),
sizes AS (SELECT source, count(*) AS n_words FROM sw GROUP BY source),
inter AS (
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
    FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT i.src_a, i.src_b,
       CAST(sa.n_words AS BIGINT) AS n_a,
       CAST(sb.n_words AS BIGINT) AS n_b,
       CAST(i.n_common AS BIGINT) AS n_common,
       CAST((1000000 * i.n_common)
            // (sa.n_words + sb.n_words - i.n_common) AS BIGINT)
           AS jaccard_ppm,
       CAST((1000000 * i.n_common) // least(sa.n_words, sb.n_words)
           AS BIGINT) AS overlap_ppm
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
ORDER BY i.src_a, i.src_b
"""

# q86: identical bias-packed Holt recurrence (K = 2^26, BIAS = 2^25);
# DuckDB's // truncates toward zero exactly like Spark's DIV on both
# signs, so the coupled (level, trend) fold replays bit-for-bit.
ORACLES["q86_holt_forecast"] = """
WITH daily AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
    FROM events GROUP BY 1, 2
),
ser AS (
    SELECT event_type,
        list(CAST(cnt AS BIGINT) * 1000 ORDER BY day) AS x,
        count(*) AS n_days
    FROM daily GROUP BY event_type
),
red AS (
    SELECT event_type, n_days,
        list_reduce(
            list_prepend(x[1] * 67108864 + 33554432, x[2:]),
            (acc, el) ->
                greatest(CAST(0 AS BIGINT),
                    (3 * el + 7 * ((acc // 67108864)
                     + (acc % 67108864 - 33554432))) // 10) * 67108864
                + ((greatest(CAST(0 AS BIGINT),
                      (3 * el + 7 * ((acc // 67108864)
                       + (acc % 67108864 - 33554432))) // 10)
                    - (acc // 67108864))
                   + 4 * (acc % 67108864 - 33554432)) // 5
                + 33554432
        ) AS acc
    FROM ser
)
SELECT event_type, CAST(n_days AS INT) AS n_days,
    acc // 67108864 AS level_milli,
    acc % 67108864 - 33554432 AS trend_milli,
    acc // 67108864 + 7 * (acc % 67108864 - 33554432) AS forecast7_milli
FROM red ORDER BY event_type
"""

# q87: identical exact-cents first digit, shared Benford literals,
# identical integer deviation arithmetic.
ORACLES["q87_benford_audit"] = """
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                AS VARCHAR), 1, 1) AS INTEGER) AS digit
    FROM orders
),
counts AS (
    SELECT digit, count(*) AS n_orders FROM digits GROUP BY digit
),
bens(digit, benford_ppm) AS (VALUES
    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
    (6, 66947), (7, 57992), (8, 51153), (9, 45757)
),
tot AS (SELECT sum(n_orders) AS t FROM counts)
SELECT c.digit,
       CAST(c.n_orders AS BIGINT) AS n_orders,
       CAST((1000000 * c.n_orders) // t.t AS BIGINT) AS obs_ppm,
       CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
       CAST((((1000000 * c.n_orders) // t.t - b.benford_ppm)
             * ((1000000 * c.n_orders) // t.t - b.benford_ppm)
             * 1000) // b.benford_ppm AS BIGINT) AS dev_ppb
FROM counts c JOIN bens b ON b.digit = c.digit CROSS JOIN tot t
ORDER BY c.digit
"""

# p18: identical md5 bucket, whitespace token count, byte mass, and
# cross-multiplied imbalance ppm.
ORACLES["p18_shard_manifest"] = """
WITH sharded AS (
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
               AS BIGINT) % 16 AS shard,
           CASE WHEN text IS NULL OR text = '' THEN 0
                ELSE len(string_split(text, ' ')) END AS ws_tokens,
           CASE WHEN text IS NULL THEN 0
                ELSE octet_length(encode(text)) END AS n_bytes
    FROM documents
),
per_shard AS (
    SELECT shard, count(*) AS n_docs,
           sum(ws_tokens) AS total_tokens,
           sum(n_bytes) AS total_bytes
    FROM sharded GROUP BY shard
),
tot AS (SELECT sum(total_tokens) AS tt FROM per_shard)
SELECT p.shard,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(p.total_tokens AS BIGINT) AS total_tokens,
       CAST(p.total_bytes AS BIGINT) AS total_bytes,
       CAST((1000000 * 16 * p.total_tokens) // t.tt - 1000000 AS BIGINT)
           AS imbalance_ppm
FROM per_shard p CROSS JOIN tot t
ORDER BY p.shard
"""

# ---------------------------------------------------------------------------
# Round 5 oracles
# ---------------------------------------------------------------------------

# q88: same KM decomposition — mean-gap data-derived censor horizon
# (exact integer sum/count, one IEEE double division), suffix-sum risk
# set, integer hazard, log-space ordered product. ln/exp run on
# identical doubles in identical window order on both engines; 6dp
# rounding on exp. The d = n terminal bucket is guarded on BOTH sides
# (DuckDB's ln(0) throws OutOfRange; Spark's log(0) is NULL and sum
# would silently skip it): the log term is only defined where d < n
# and a prefix-max dead flag pins survival to 0.0.
ORACLES["q88_survival_km"] = """
WITH users AS (
    SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
    FROM events GROUP BY user_id
),
horizon AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
gaps AS (
    SELECT date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE))
               AS t_days,
           date_diff('day', CAST(last_ts AS DATE), max_day) AS gap_days
    FROM users CROSS JOIN horizon
),
thresh AS (
    SELECT CAST(sum(gap_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS avg_gap
    FROM gaps
),
lives AS (
    SELECT t_days,
           CASE WHEN CAST(gap_days AS DOUBLE) > avg_gap THEN 1 ELSE 0 END
               AS churned
    FROM gaps CROSS JOIN thresh
),
per_t AS (
    SELECT t_days, count(*) AS n_ending, sum(churned) AS n_churn
    FROM lives GROUP BY t_days
),
risk AS (
    SELECT t_days, n_churn,
           sum(n_ending) OVER (ORDER BY t_days
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS n_at_risk
    FROM per_t
),
cum AS (
    SELECT t_days, n_churn, n_at_risk,
           sum(CASE WHEN n_churn < n_at_risk
                    THEN ln(1.0 - CAST(n_churn AS DOUBLE)
                            / CAST(n_at_risk AS DOUBLE)) END)
               OVER (ORDER BY t_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS log_surv,
           max(CASE WHEN n_churn = n_at_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS dead
    FROM risk
)
SELECT CAST(t_days AS BIGINT) AS t_days,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(n_churn AS BIGINT) AS n_churn,
       CAST((1000000 * n_churn) // n_at_risk AS BIGINT) AS hazard_ppm,
       CAST(CASE WHEN dead = 1 THEN 0.0
                 ELSE round(exp(log_surv), 6) END AS DOUBLE) AS survival
FROM cum
WHERE n_churn > 0
ORDER BY t_days
"""

# q89: identical integer ten-thousandths revenue, ppm shares, squared-
# share HHI. Cross-multiplied terms ride HUGEINT (Spark: DECIMAL(38,0))
# so neither engine overflows 2^63 at large scale factors.
ORACLES["q89_hhi_concentration"] = """
WITH per_sup AS (
    SELECT s.s_nationkey, l.l_suppkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                    * 10000, 0) AS BIGINT)) AS BIGINT) AS sup_rev
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey, l.l_suppkey
),
shared AS (
    SELECT s_nationkey,
           CAST((1000000 * CAST(sup_rev AS HUGEINT))
                // CAST(sum(sup_rev) OVER (PARTITION BY s_nationkey)
                        AS HUGEINT) AS BIGINT) AS share_ppm
    FROM per_sup
),
per_nation AS (
    SELECT s_nationkey,
           count(*) AS n_suppliers,
           max(share_ppm) AS top_share_ppm,
           CAST(sum(CAST(share_ppm AS HUGEINT) * share_ppm)
                // 1000000 AS BIGINT) AS hhi_ppm
    FROM shared GROUP BY s_nationkey
)
SELECT n.n_name AS nation,
       CAST(p.n_suppliers AS BIGINT) AS n_suppliers,
       CAST(p.top_share_ppm AS BIGINT) AS top_share_ppm,
       p.hhi_ppm
FROM per_nation p JOIN nation n ON p.s_nationkey = n.n_nationkey
ORDER BY nation
"""

# q90: the LATERAL text runs verbatim on DuckDB.
ORACLES["q90_lateral_topk"] = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
       t.o_totalprice, CAST(t.rnk AS BIGINT) AS rnk
FROM customer c JOIN LATERAL (
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rnk
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 3
) t ON TRUE
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY c.c_custkey, t.rnk
"""

# q91: identical sweep-line in SQL window form; epoch seconds floor
# identically (unix_timestamp vs date_part('epoch', ...)).
ORACLES["q91_interval_union"] = """
WITH iv AS (
    -- floor(): DuckDB epoch keeps microseconds; Spark
    -- unix_timestamp floors to whole seconds.
    SELECT user_id, event_id,
           CAST(floor(date_part('epoch', ts)) AS BIGINT) AS s,
           CAST(floor(date_part('epoch', ts)) AS BIGINT) + 300 AS e
    FROM events
),
flagged AS (
    SELECT user_id, event_id, s, e,
           CASE WHEN max(e) OVER (PARTITION BY user_id
                    ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                 OR s > max(e) OVER (PARTITION BY user_id
                    ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island
    FROM iv
),
islanded AS (
    SELECT user_id, s, e,
           sum(new_island) OVER (PARTITION BY user_id
               ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM flagged
),
islands AS (
    SELECT user_id, island, max(e) - min(s) AS covered,
           count(*) AS n_events
    FROM islanded GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(covered) AS BIGINT) AS covered_seconds,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM islands
GROUP BY user_id
ORDER BY user_id
"""

# q92: identical daily-count lags + sample Pearson corr, 4dp with the
# q15 -0.0 collapse.
ORACLES["q92_autocorr_daily"] = """
WITH daily AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           count(*) AS cnt
    FROM events GROUP BY event_type, day
),
lagged AS (
    SELECT event_type,
           CAST(cnt AS DOUBLE) AS c0,
           CAST(lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day)
                AS DOUBLE) AS c1,
           CAST(lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day)
                AS DOUBLE) AS c7
    FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(c0, c1), 4) + 0.0 AS ac_lag1,
       round(corr(c0, c7), 4) + 0.0 AS ac_lag7
FROM lagged
GROUP BY event_type
ORDER BY event_type
"""

# q93: identical integer ECDF cross-multiply; the argmax row is picked
# by the same (d_num DESC, cents ASC) order.
ORACLES["q93_ks_two_sample"] = """
WITH segged AS (
    SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
           c.c_mktsegment AS seg
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
),
per_cents AS (
    SELECT cents,
           sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS n1,
           sum(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS n2
    FROM segged GROUP BY cents
),
gaps AS (
    SELECT cents,
           CAST(sum(n1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum1,
           CAST(sum(n2) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum2,
           CAST(sum(n1) OVER () AS BIGINT) AS n1t,
           CAST(sum(n2) OVER () AS BIGINT) AS n2t
    FROM per_cents
)
SELECT n1t AS n_building,
       n2t AS n_automobile,
       -- HUGEINT cross-multiplies (Spark: DECIMAL(38,0)) — cum x n
       -- exceeds 2^63 once both samples pass ~3e9 rows.
       CAST((1000000 * abs(CAST(cum1 AS HUGEINT) * n2t
                           - CAST(cum2 AS HUGEINT) * n1t))
            // (CAST(n1t AS HUGEINT) * n2t) AS BIGINT) AS ks_ppm,
       cents AS at_cents
FROM gaps
ORDER BY abs(CAST(cum1 AS HUGEINT) * n2t
             - CAST(cum2 AS HUGEINT) * n1t) DESC, cents
LIMIT 1
"""

# d20: identical two-level md5 hash-group audit; DuckDB hashes the
# same coalesced text bytes.
ORACLES["d20_dup_inflation_audit"] = """
WITH per_text AS (
    SELECT source, md5(coalesce(text, '')) AS h,
           count(*) AS n_copies,
           max(CASE WHEN text IS NULL OR text = '' THEN 0
                    ELSE len(string_split(text, ' ')) END) AS toks
    FROM documents GROUP BY source, h
),
per_source AS (
    SELECT source,
           CAST(sum(n_copies) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(n_copies * toks) AS BIGINT) AS total_tokens,
           CAST(sum(toks) AS BIGINT) AS distinct_tokens
    FROM per_text GROUP BY source
)
SELECT source, n_docs, n_distinct,
       CAST((1000000 * n_docs) // n_distinct AS BIGINT)
           AS doc_inflation_ppm,
       CAST(CASE WHEN distinct_tokens = 0 THEN 1000000
                 ELSE (1000000 * total_tokens) // distinct_tokens END
            AS BIGINT) AS token_inflation_ppm
FROM per_source
ORDER BY source
"""

# t22: identical tokenization (split on ' ', len >= 3), identical
# HUGEINT cross-multiplied VMR ppm.
ORACLES["t22_term_burstiness"] = """
WITH n AS (SELECT count(*) AS n_docs FROM documents),
exploded AS (
    SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS term
    FROM documents
),
toks AS (SELECT doc_id, term FROM exploded WHERE len(term) >= 3),
per_doc AS (
    SELECT term, doc_id, count(*) AS cnt FROM toks GROUP BY term, doc_id
),
per_term AS (
    SELECT term, count(*) AS df,
           CAST(sum(cnt) AS BIGINT) AS total_cnt,
           CAST(sum(cnt * cnt) AS BIGINT) AS sumsq
    FROM per_doc GROUP BY term
),
top AS (
    SELECT * FROM per_term ORDER BY total_cnt DESC, term LIMIT 40
)
SELECT term, CAST(df AS BIGINT) AS df, total_cnt,
       CAST((1000000 * (CAST(n.n_docs AS HUGEINT) * sumsq
                        - CAST(total_cnt AS HUGEINT) * total_cnt))
            // (CAST(total_cnt AS HUGEINT) * (n.n_docs - 1))
            AS BIGINT) AS vmr_ppm
FROM top CROSS JOIN n
ORDER BY total_cnt DESC, term
"""

# p19: identical md5-seeded uniform noise on [-10, 10] and clamp.
ORACLES["p19_privacy_noise"] = """
WITH cells AS (
    SELECT source, lang, count(*) AS n_docs
    FROM documents GROUP BY source, lang
)
SELECT source, lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(CAST(('0x' || substr(md5('dp:' || source || ':' || lang),
                  1, 6)) AS BIGINT) % 21 - 10 AS BIGINT) AS noise,
       CAST(greatest(0, n_docs
            + CAST(('0x' || substr(md5('dp:' || source || ':' || lang),
                    1, 6)) AS BIGINT) % 21 - 10) AS BIGINT)
           AS released_count
FROM cells
ORDER BY source, lang
"""

# s09: the graph replay CTEs + identical vote/tie-break/eval SQL.
def _s09_oracle(n_bits: int = 8, k: int = 5) -> str:
    return f"""{_knn_graph_ctes(n_bits, k)},
tally AS (
    SELECT g.query_id, e.label AS cand_label, count(*) AS n_votes
    FROM knn g JOIN embeddings e ON e.vec_id = g.cand_id
    GROUP BY g.query_id, e.label
),
pred AS (
    SELECT query_id, cand_label AS pred_label
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY n_votes DESC, cand_label) AS rnk
        FROM tally
    ) WHERE rnk = 1
),
scored AS (
    SELECT e.label, p.pred_label
    FROM embeddings e LEFT JOIN pred p ON p.query_id = e.vec_id
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_class,
       CAST(sum(CASE WHEN pred_label IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_predicted,
       CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(CASE WHEN sum(CASE WHEN pred_label IS NOT NULL
                               THEN 1 ELSE 0 END) = 0 THEN 0
            ELSE (1000000 * sum(CASE WHEN pred_label = label
                                     THEN 1 ELSE 0 END))
                 // sum(CASE WHEN pred_label IS NOT NULL
                             THEN 1 ELSE 0 END) END AS BIGINT)
           AS accuracy_ppm
FROM scored
GROUP BY label
ORDER BY label
"""


ORACLES["s09_knn_label_vote"] = _s09_oracle()

# q94: the pipe chain lowered to classic SQL — value equality IS the
# no-added-semantics demonstration.
ORACLES["q94_sql_pipe"] = """
WITH agg AS (
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           min(o_orderdate) AS first_order
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
)
SELECT o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
       total_price,
       strftime(first_order, '%Y-%m-%d') AS first_day
FROM agg
WHERE n_orders > 1
ORDER BY o_orderpriority
"""

# q95: the SQL UDF bodies inlined — exactly what Spark's analyzer does.
ORACLES["q95_sql_udf"] = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
           AS charged
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# q96: the session variables' values as literals — the analyzed form.
ORACLES["q96_sql_variables"] = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 50000.0 AND c.c_mktsegment = 'MACHINERY'
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

# q97: same day-range rollup as a row filter over the flat table (the
# artifact only changes the PHYSICAL layout, never values).
ORACLES["q97_partition_pruned_rollup"] = """
SELECT strftime(ts, '%Y-%m-%d') AS event_day,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-08' AND '2024-01-14'
GROUP BY event_day, event_type
ORDER BY event_day, event_type
"""


# d21: the mirrored minhash/LSH CTEs retargeted at the same md5-ordered
# 2000-doc sample, plus the exhaustive shared-shingle ground truth —
# recall/precision in integer ppm.
def _d21_oracle() -> str:
    base = _minhash_pairs_sql(0.5).replace(
        "FROM documents", "FROM docs_sample"
    )
    return f"""WITH docs_sample AS (
    SELECT doc_id, text FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 2000
),
{base},
tinter AS (
    SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
),
truth AS (
    SELECT t.doc_a, t.doc_b
    FROM tinter t
    JOIN sizes sa ON t.doc_a = sa.doc
    JOIN sizes sb ON t.doc_b = sb.doc
    WHERE t.inter * 1.0 / (sa.n_sh + sb.n_sh - t.inter) >= 0.5
),
counts AS (
    SELECT (SELECT count(*) FROM truth) AS n_true,
           (SELECT count(*) FROM cand) AS n_cand,
           (SELECT count(*) FROM verified) AS n_hits
)
SELECT CAST(50 AS BIGINT) AS threshold_pct,
       CAST(n_true AS BIGINT) AS n_true_pairs,
       CAST(n_cand AS BIGINT) AS n_candidates,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(CASE WHEN n_true = 0 THEN 1000000
            ELSE (1000000 * n_hits) // n_true END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN n_cand = 0 THEN 1000000
            ELSE (1000000 * n_hits) // n_cand END AS BIGINT)
           AS precision_ppm
FROM counts
"""


ORACLES["d21_lsh_recall_eval"] = _d21_oracle()

# m08: identical frame chunking replayed on hex(encode(text)) — 32
# bytes = 64 hex chars, every 2nd frame, md5 over the hex string.
ORACLES["m08_frame_dedup"] = """
WITH hexed AS (
    SELECT doc_id, hex(encode(text)) AS h FROM documents
    WHERE text IS NOT NULL AND text <> ''
),
frames AS (
    SELECT doc_id,
           unnest(range(0, CAST(ceil(len(h) / 64.0) AS INT), 2))
               AS frame_idx,
           h
    FROM hexed
),
hashed AS (
    SELECT doc_id,
           md5(substr(h, frame_idx * 64 + 1, 64)) AS fh
    FROM frames
),
per_hash AS (
    SELECT doc_id, fh, count(*) AS n_copies FROM hashed GROUP BY doc_id, fh
)
SELECT doc_id,
       CAST(sum(n_copies) AS BIGINT) AS n_frames,
       CAST(count(*) AS BIGINT) AS n_distinct_frames,
       CAST(max(n_copies) AS BIGINT) AS max_frame_copies,
       CAST((1000000 * sum(n_copies)) // count(*) AS BIGINT)
           AS frame_dup_ppm
FROM per_hash
GROUP BY doc_id
ORDER BY doc_id
"""

# q98: identical word bucketing, bit_or merge, popcount, and the
# day-over-day AND intersection.
ORACLES["q98_bitmap_exact_distinct"] = """
WITH words AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           user_id // 63 AS bucket,
           bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS word
    FROM events
    GROUP BY day, bucket
),
prev AS (
    SELECT strftime(CAST(day AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d') AS day,
           bucket, word AS prev_word
    FROM words
),
joined AS (
    SELECT w.day, w.word, p.prev_word
    FROM words w LEFT JOIN prev p ON p.day = w.day AND p.bucket = w.bucket
)
SELECT day,
       CAST(sum(bit_count(word)) AS BIGINT) AS n_distinct_users,
       CAST(sum(bit_count(word & coalesce(prev_word, CAST(0 AS BIGINT))))
            AS BIGINT) AS n_retained_from_prev_day
FROM joined
GROUP BY day
ORDER BY day
"""

# p20: identical md5 fold bucketing, per-user rollup, leakage audit,
# cross-multiplied imbalance ppm.
ORACLES["p20_group_kfold"] = """
WITH folded AS (
    SELECT event_id, user_id,
           CAST(('0x' || substr(md5('fold:' || CAST(user_id AS VARCHAR)),
                 1, 6)) AS BIGINT) % 5 AS fold
    FROM events
),
per_user AS (
    SELECT user_id,
           count(DISTINCT fold) AS n_folds,
           min(fold) AS fold,
           count(*) AS n_events
    FROM folded GROUP BY user_id
),
spanning AS (
    SELECT sum(CASE WHEN n_folds > 1 THEN 1 ELSE 0 END)
        AS users_spanning_folds
    FROM per_user
),
per_fold AS (
    SELECT fold, count(*) AS n_users, sum(n_events) AS n_events
    FROM per_user GROUP BY fold
),
tot AS (SELECT sum(n_events) AS t FROM per_fold)
SELECT p.fold,
       CAST(p.n_users AS BIGINT) AS n_users,
       CAST(p.n_events AS BIGINT) AS n_events,
       CAST(s.users_spanning_folds AS BIGINT) AS users_spanning_folds,
       CAST((1000000 * 5 * p.n_events) // t.t - 1000000 AS BIGINT)
           AS imbalance_ppm
FROM per_fold p CROSS JOIN spanning s CROSS JOIN tot t
ORDER BY p.fold
"""

# q99: both as-of directions mirrored as tagged-union window passes —
# identical (ts, side, event_id) orderings, IGNORE NULLS carries,
# integer-second deltas, and the same nearest tie-break CASE.
ORACLES["q99_asof_directions"] = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events
    WHERE event_type = 'purchase'
),
views AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
),
back_u AS (
    SELECT user_id AS k, ts, 1 AS side, event_id AS tb,
           event_id, CAST(NULL AS TIMESTAMP) AS p_ts
    FROM purchases
    UNION ALL
    SELECT user_id, ts, 0, event_id, NULL, ts FROM views
),
back AS (
    SELECT event_id, k, ts,
           last_value(p_ts IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY ts, side, tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS back_ts
    FROM back_u
    QUALIFY side = 1
),
fwd_u AS (
    SELECT user_id AS k, ts, 0 AS side, event_id AS tb,
           event_id, CAST(NULL AS TIMESTAMP) AS p_ts
    FROM purchases
    UNION ALL
    SELECT user_id, ts, 1, event_id, NULL, ts FROM views
),
fwd AS (
    SELECT event_id, k, ts,
           first_value(p_ts IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY ts, side, tb
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS fwd_ts
    FROM fwd_u
    QUALIFY side = 0
),
deltas AS (
    SELECT b.event_id,
           CAST(floor(date_part('epoch', b.ts))
                - floor(date_part('epoch', b.back_ts)) AS BIGINT)
               AS back_delta_s,
           CAST(floor(date_part('epoch', f.fwd_ts))
                - floor(date_part('epoch', f.ts)) AS BIGINT)
               AS fwd_delta_s
    FROM back b JOIN fwd f ON f.event_id = b.event_id
)
SELECT event_id, back_delta_s, fwd_delta_s,
       CASE WHEN back_delta_s IS NULL AND fwd_delta_s IS NULL THEN NULL
            WHEN fwd_delta_s IS NULL THEN back_delta_s
            WHEN back_delta_s IS NULL THEN fwd_delta_s
            WHEN back_delta_s <= fwd_delta_s THEN back_delta_s
            ELSE fwd_delta_s END AS nearest_delta_s,
       CASE WHEN back_delta_s IS NULL AND fwd_delta_s IS NULL THEN 'none'
            WHEN fwd_delta_s IS NULL THEN 'back'
            WHEN back_delta_s IS NULL THEN 'fwd'
            WHEN back_delta_s <= fwd_delta_s THEN 'back'
            ELSE 'fwd' END AS nearest_side
FROM deltas
ORDER BY event_id
"""

# q100: the layout changes the plan, never the values — plain join.
ORACLES["q100_bucketed_colocated_join"] = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

# ---------------------------------------------------------------------------
# Round 6 oracles
# ---------------------------------------------------------------------------

# q101: runtime skew re-planning changes the PLAN, never the values —
# the oracle is the plain hot-keyed join rollup. NULL keys drop on
# both sides (inner join); max (not sum) keeps outputs bounded.
ORACLES["q101_aqe_skew_join"] = """
WITH left_side AS (
    SELECT CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS k,
           event_type
    FROM events
),
right_roll AS (
    SELECT CASE WHEN o_custkey % 10 < 9 THEN 0 ELSE o_custkey END AS k,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM orders GROUP BY 1
)
SELECT l.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(r.n_orders) AS BIGINT) AS max_key_orders,
       CAST(max(r.rev_cents) AS BIGINT) AS max_key_rev_cents
FROM left_side l JOIN right_roll r ON l.k = r.k
GROUP BY l.event_type
ORDER BY l.event_type
"""

# t23: the same 4 BPE training rounds unrolled as staged MATERIALIZED
# CTEs (q78's pattern). Count/pick/re-segment algebra is identical:
# BOTH-sides-delimited symbol strings ('|h|e|l|l|o|'), TWO passes of
# left-to-right non-overlapping replace('|l|r|' -> '|lr|') = greedy
# merge application (pass 2 picks up the alternating misses in
# consecutive runs; end delimiter prevents prefix-extension false
# merges — see operators/textstats._bpe_apply_expr),
# (count DESC, l, r) tie-break.
def _t23_bpe_oracle(n_merges: int = 4, with_final_dict: bool = False) -> str:
    stages = [
        """w0 AS MATERIALIZED (
    SELECT regexp_replace(word, '(.)', '|\\1', 'g') || '|' AS s,
           CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE regexp_full_match(word, '[a-z0-9]+') AND length(word) >= 2
    GROUP BY s
)"""
    ]
    resegment = (
        "replace(replace(s, '|' || m.l || '|' || m.r || '|',"
        " '|' || m.l || m.r || '|'), '|' || m.l || '|' || m.r || '|',"
        " '|' || m.l || m.r || '|')"
    )
    for k in range(1, n_merges + 1):
        stages.append(f"""p{k} AS MATERIALIZED (
    SELECT l, r, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM (
        SELECT a[i] AS l, a[i + 1] AS r, freq
        FROM (SELECT string_split(substr(s, 2, length(s) - 2), '|') AS a,
                     freq
              FROM w{k - 1}) t,
             unnest(range(1, len(a))) AS u(i)
    )
    GROUP BY l, r
)""")
        stages.append(f"""m{k} AS MATERIALIZED (
    SELECT l, r, pair_count FROM p{k}
    ORDER BY pair_count DESC, l, r LIMIT 1
)""")
        if k < n_merges or with_final_dict:
            stages.append(f"""w{k} AS MATERIALIZED (
    SELECT {resegment} AS s,
           freq
    FROM w{k - 1}, m{k} m
)""")
    if with_final_dict:
        # t24: aggregate the FULLY-APPLIED dictionary w{n} — chars vs
        # symbols, corpus-weighted; 1e6 x corpus chars rides HUGEINT
        # (Spark: DECIMAL(38,0)) per the t22 discipline.
        return (
            "WITH " + ",\n".join(stages)
            + f"""
SELECT CAST(count(*) AS BIGINT) AS n_vocab_words,
       CAST(sum(freq * length(replace(s, '|', ''))) AS BIGINT)
           AS corpus_chars,
       CAST(sum(freq * (length(s) - length(replace(s, '|', '')) - 1))
           AS BIGINT) AS corpus_syms,
       CAST((1000000 * CAST(sum(freq * (length(s)
                - length(replace(s, '|', '')) - 1)) AS HUGEINT))
            // sum(freq * length(replace(s, '|', ''))) AS BIGINT)
           AS compression_ppm
FROM w{n_merges}"""
        )
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS step, l AS lhs, r AS rhs,"
        f" l || r AS merged, pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(stages)
        + f"\nSELECT * FROM (\n{finals}\n) ORDER BY step"
    )


ORACLES["t23_bpe_train_iterations"] = _t23_bpe_oracle(4)
ORACLES["t24_bpe_compression"] = _t23_bpe_oracle(4, with_final_dict=True)

# q102: the observation is plan instrumentation — the RESULT is the
# plain rollup; counters are pytest-asserted against q33's validate().
ORACLES["q102_observed_quality"] = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# q103: identical word build (q98's 63-bit discipline), 7-way fanout,
# OR-merge per target day, popcount sums. Day strings both sides.
ORACLES["q103_rolling_bitmap_distinct"] = """
WITH words AS (
    SELECT CAST(ts AS DATE) AS d,
           user_id // 63 AS bucket,
           bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS word
    FROM events
    GROUP BY d, bucket
),
days AS (SELECT DISTINCT d FROM words),
fanout AS (
    SELECT CAST(w.d + u.off * INTERVAL 1 DAY AS DATE) AS d,
           w.bucket, w.word
    FROM words w, unnest(range(0, 7)) AS u(off)
),
rolled AS (
    SELECT d, CAST(sum(bit_count(word7)) AS BIGINT) AS n_distinct_7d
    FROM (
        SELECT d, bucket, bit_or(word) AS word7
        FROM fanout
        WHERE d IN (SELECT d FROM days)
        GROUP BY d, bucket
    )
    GROUP BY d
),
daily AS (
    SELECT d, CAST(sum(bit_count(word)) AS BIGINT) AS n_distinct_1d
    FROM words GROUP BY d
)
SELECT strftime(r.d, '%Y-%m-%d') AS day,
       dd.n_distinct_1d,
       r.n_distinct_7d
FROM rolled r JOIN daily dd ON r.d = dd.d
ORDER BY day
"""

# q104: pruning changes IO, never values — plain busy-days join rollup
# derived from flat events (the artifact IS events + a day column).
ORACLES["q104_dynamic_partition_pruning"] = """
WITH dim AS (
    SELECT strftime(ts, '%Y-%m-%d') AS event_day,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_day
),
mx AS (SELECT max(n_users) AS max_users FROM dim),
busy AS (
    SELECT event_day, n_users FROM dim, mx
    WHERE 10 * n_users >= 8 * max_users
),
fact AS (SELECT strftime(ts, '%Y-%m-%d') AS event_day FROM events)
SELECT f.event_day,
       CAST(count(*) AS BIGINT) AS n_events_on_day,
       CAST(max(b.n_users) AS BIGINT) AS n_users
FROM fact f JOIN busy b ON f.event_day = b.event_day
GROUP BY f.event_day
ORDER BY f.event_day
"""

# p21: identical md5-rational uniforms, identical -ln(u)/w doubles,
# identical (score, id) order; floor-ppb output (rounding-mode-free).
ORACLES["p21_weighted_reservoir"] = """
WITH scored AS (
    SELECT doc_id,
           n_chars AS weight,
           -ln((CAST(('0x' || substr(md5('res:7:'
                       || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
                % 1000000 + 1) / 1000001.0)
               / CAST(n_chars AS DOUBLE) AS score
    FROM documents
    WHERE n_chars > 0
)
SELECT doc_id,
       weight,
       CAST(floor(score * 1000000000) AS BIGINT) AS score_ppb
FROM scored
ORDER BY score, doc_id
LIMIT 50
"""

# q105: the Python data source generates md5('synth:<i>') arithmetic
# per row index — DuckDB replays the whole table from generate_series
# (langs via %5, tokens via hex[7..10], score via hex[11..16]).
ORACLES["q105_python_datasource"] = """
WITH ids AS (
    SELECT unnest(range(0, (SELECT count(*) * 2 FROM documents))) AS i
),
rows_src AS (
    SELECT i AS doc_id,
           ['en', 'de', 'fr', 'es', 'und'][
               CAST(CAST(('0x' || substr(md5('synth:' || i), 1, 6))
                    AS BIGINT) % 5 AS INTEGER) + 1] AS lang,
           20 + CAST(('0x' || substr(md5('synth:' || i), 7, 4))
                AS BIGINT) % 481 AS n_tokens,
           CAST(('0x' || substr(md5('synth:' || i), 11, 6))
                AS BIGINT) % 1000000 AS score_ppm
    FROM ids
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(score_ppm) AS BIGINT) AS max_score_ppm,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
FROM rows_src
GROUP BY lang
ORDER BY lang
"""


# d22: the same minhash machinery with the candidate join flipped to
# delta-vs-base (doc_a = the new batch, doc_b = the ingested corpus);
# best match per delta doc by (jaccard DESC, base id ASC).
def _d22_oracle() -> str:
    return f"""
WITH {_minhash_pairs_sql(0.5, cand_cond="a.doc % 10 = 7 AND b.doc % 10 != 7")},
best AS (
    SELECT doc_a AS delta_doc, doc_b AS base_doc, jaccard,
           row_number() OVER (PARTITION BY doc_a
               ORDER BY jaccard DESC, doc_b) AS rnk
    FROM verified
)
SELECT delta_doc, base_doc, jaccard
FROM best WHERE rnk = 1
ORDER BY delta_doc
"""


ORACLES["d22_incremental_dedup"] = _d22_oracle()

# q107: the PLAIN unsalted join — salting changes the plan, never the
# result (q100/q101's discipline). pmod == % here (o_custkey > 0).
ORACLES["q107_salted_join"] = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM (SELECT CASE WHEN o_custkey % 10 < 4 THEN 1
                  ELSE o_custkey END AS acct_key,
             o_totalprice
      FROM orders) f
JOIN customer ON f.acct_key = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# q109: LAG-based sessionization with the SAME boundary semantics as
# Spark's session_window — an event at EXACTLY prev + gap MERGES
# (touching windows coalesce; measured, pinned by
# test_q109_exact_gap_boundary_merges), i.e. break on diff > 1800 —
# identical to q03's oracle, then q03's per-user rollup shape.
ORACLES["q109_session_window"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
    FROM events
),
flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR (epoch_us(ts) / 1000000.0
                         - epoch_us(prev_ts) / 1000000.0) > 1800
                   THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sess AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
),
per_session AS (
    SELECT user_id, session_seq,
        count(*) AS n_events,
        (max(epoch_us(ts) / 1000000.0) - min(epoch_us(ts) / 1000000.0))
            / 60.0 AS minutes,
        sum(value) AS sess_value
    FROM sess GROUP BY user_id, session_seq
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       round(avg(n_events), 4) AS avg_session_events,
       round(avg(minutes), 4) AS avg_session_minutes,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       round(sum(sess_value), 2) AS total_value
FROM per_session GROUP BY user_id ORDER BY user_id
"""

# q106: the plain filtered join — statistics change the PLAN (when
# the planner can broadcast), never the result.
ORACLES["q106_cbo_stats_join"] = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                AS BIGINT)) AS BIGINT) AS rev_e4
FROM lineitem
JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size <= 3) p
  ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""

# q108: plain orders — the clustered layout changes IO, never values.
ORACLES["q108_rowgroup_skipping"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders
WHERE o_totalprice < 2000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# q110: the plain filtered join — the runtime bloom filter changes
# the PLAN (probe rows die at the scan), never the result.
ORACLES["q110_bloom_filter_join"] = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                AS BIGINT)) AS BIGINT) AS rev_e4
FROM lineitem
JOIN (SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT') o
  ON l_orderkey = o_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# q111: rank()-with-ties top-3 — WindowGroupLimit changes where rows
# are DISCARDED (map-side, before the shuffle), never which survive.
ORACLES["q111_window_group_limit"] = """
SELECT o_custkey, rnk, o_orderkey, cents
FROM (
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           rank() OVER (PARTITION BY o_custkey
                        ORDER BY CAST(round(o_totalprice * 100, 0)
                                      AS BIGINT) DESC) AS rnk
    FROM orders
) ranked
WHERE rnk <= 3
ORDER BY o_custkey, rnk, o_orderkey
"""

# q112: the same three-way self-join — exchange reuse executes the
# daily rollup once for the shifted branches, never changes values.
# Inner joins: emitted days are those with both a yesterday and a
# week-ago row.
ORACLES["q112_exchange_reuse"] = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events
    GROUP BY CAST(ts AS DATE)
)
SELECT strftime(cur.day, '%Y-%m-%d') AS day, cur.n AS n,
       cur.cents AS cents, prev.n AS prev_n, wk.n AS wow_n
FROM daily cur
JOIN daily prev ON prev.day = cur.day - 1
JOIN daily wk   ON wk.day   = cur.day - 7
ORDER BY day
"""

# t25: identical split / tokenizer / integer smoothing arithmetic —
# train counts from the md5-bucket >= 10 half, add-one smoothed
# reciprocal conditional probabilities over the test half.
ORACLES["t25_heldout_perplexity"] = """
WITH b AS (
    SELECT doc_id, text,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 100 AS bkt
    FROM documents
),
toks AS (SELECT doc_id, bkt, string_split(text, ' ') AS t FROM b),
flat AS (
    SELECT doc_id, bkt, x.w1 AS w1, x.bg AS bg FROM (
        SELECT doc_id, bkt,
            unnest(list_transform(range(1, len(t)),
                i -> {'w1': t[i], 'bg': t[i] || ' ' || t[i + 1]})) AS x
        FROM toks WHERE len(t) >= 2)
),
train AS (SELECT * FROM flat WHERE bkt >= 10),
test AS (SELECT * FROM flat WHERE bkt < 10),
f12 AS (SELECT bg, count(*) AS c12 FROM train GROUP BY bg),
f1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY w1),
v AS (SELECT count(DISTINCT w1) AS vsz FROM train)
SELECT t.doc_id AS doc_id,
    count(*) AS n_bigrams,
    CAST(sum(CASE WHEN f12.c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_unseen_bigrams,
    CAST(sum((1000000 * (COALESCE(f1.c1, 0) + v.vsz))
             // (COALESCE(f12.c12, 0) + 1)) // count(*) AS BIGINT)
        AS mean_heldout_ppm
FROM test t
LEFT JOIN f12 USING (bg)
LEFT JOIN f1 USING (w1)
CROSS JOIN v
GROUP BY t.doc_id
ORDER BY doc_id
"""

# q113: generate_series replay of the push-source kernel (q105's
# contract) under the SAME filters — pushdown changes where rows die
# (partition pruning + in-reader filtering), never which survive.
ORACLES["q113_python_ds_pushdown"] = """
WITH ids AS (SELECT unnest(range(0, 1000)) AS i),
rows_src AS (
    SELECT i AS doc_id,
           ['en', 'de', 'fr', 'es', 'und'][
               CAST(CAST(('0x' || substr(md5('synth:' || i), 1, 6))
                    AS BIGINT) % 5 AS INTEGER) + 1] AS lang,
           20 + CAST(('0x' || substr(md5('synth:' || i), 7, 4))
                AS BIGINT) % 481 AS n_tokens,
           CAST(('0x' || substr(md5('synth:' || i), 11, 6))
                AS BIGINT) % 1000000 AS score_ppm
    FROM ids
)
SELECT doc_id // 250 AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(score_ppm) AS BIGINT) AS max_score_ppm,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM rows_src
WHERE lang = 'de' AND doc_id >= 250 AND doc_id < 750
GROUP BY doc_id // 250
ORDER BY band
"""

# q114: the plain full-history rollup — the 7-day dynamic refresh
# replaces partition FILES with identical recomputed rows, so the
# maintained table always equals the direct aggregate.
ORACLES["q114_insert_overwrite_dynamic"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents,
       strftime(ts, '%Y-%m-%d') AS day
FROM events
GROUP BY strftime(ts, '%Y-%m-%d'), event_type
ORDER BY day, event_type
"""


def _d23_oracle(
    configs: tuple[tuple[int, int], ...] = ((2, 64), (4, 32), (8, 16)),
) -> str:
    """Mirror of operators/dedup.lsh_band_sweep: the d21 sample +
    exact prefix-filter truth, plus per-config md5-keyed re-banding
    of the identical 128-minhash signature frame."""
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        _MERSENNE_P,
        _MIX_A1,
        _MIX_A2,
        _MIX_B,
        N_MINHASH,
    )

    mh_aggs = ",\n        ".join(
        f"min(({_MIX_A1[j]} * hi + {_MIX_A2[j]} * lo + {_MIX_B[j]}) "
        f"% {_MERSENNE_P}) AS mh_{j}"
        for j in range(N_MINHASH)
    )
    config_ctes = []
    config_rows = []
    for r, b in configs:
        band_union = "\n    UNION ALL\n    ".join(
            "SELECT doc, {i} AS band_id, md5(concat_ws(',', {vals}))"
            " AS band_key FROM sigs".format(
                i=i,
                vals=", ".join(
                    f"CAST(mh_{i * r + j} AS VARCHAR)" for j in range(r)
                ),
            )
            for i in range(b)
        )
        config_ctes.append(
            f"""banded_{r}_{b} AS (
    {band_union}
),
cand_{r}_{b} AS (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM banded_{r}_{b} a
    JOIN banded_{r}_{b} b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc < b.doc
)"""
        )
        config_rows.append(
            f"""SELECT CAST({r} AS BIGINT) AS rows_per_band,
       CAST({b} AS BIGINT) AS n_bands,
       (SELECT count(*) FROM truth) AS n_true_pairs,
       (SELECT count(*) FROM cand_{r}_{b}) AS n_candidates,
       (SELECT count(*) FROM truth t
        WHERE EXISTS (SELECT 1 FROM cand_{r}_{b} c
                      WHERE c.doc_a = t.doc_a AND c.doc_b = t.doc_b))
           AS n_hits"""
        )
    ctes = ",\n".join(config_ctes)
    rows = "\n    UNION ALL\n    ".join(config_rows)
    return f"""WITH docs_sample AS (
    SELECT doc_id, text FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 2000
),
toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM docs_sample
),
sh AS (
    SELECT doc_id AS doc,
        unnest(CASE WHEN len(t) >= 3 THEN
            list_distinct(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [array_to_string(t, ' ')] END) AS shingle
    FROM toks
),
based AS (
    SELECT doc, shingle,
        CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS hi,
        CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS lo
    FROM sh
),
sigs AS (
    SELECT doc,
        {mh_aggs}
    FROM based GROUP BY doc
),
sizes AS (
    SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc
),
tinter AS (
    SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY a.doc, b.doc
),
truth AS (
    SELECT t.doc_a, t.doc_b
    FROM tinter t
    JOIN sizes sa ON t.doc_a = sa.doc
    JOIN sizes sb ON t.doc_b = sb.doc
    WHERE t.inter * 1.0 / (sa.n_sh + sb.n_sh - t.inter) >= 0.5
),
{ctes}
SELECT rows_per_band, n_bands,
       CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(CASE WHEN n_true_pairs = 0 THEN 1000000
            ELSE (1000000 * n_hits) // n_true_pairs END AS BIGINT)
           AS recall_ppm,
       CAST(CASE WHEN n_candidates = 0 THEN 1000000
            ELSE (1000000 * n_hits) // n_candidates END AS BIGINT)
           AS precision_ppm
FROM (
    {rows}
)
ORDER BY rows_per_band
"""


ORACLES["d23_lsh_band_sweep"] = _d23_oracle()

# q115: the corruption rule is event_id % 97 == 0 — replay membership
# from the events table; the quarantine count rides every clean row.
ORACLES["q115_quarantine_ingest"] = """
WITH marked AS (
    SELECT event_type, value, (event_id % 97 = 0) AS bad FROM events
),
qn AS (
    SELECT CAST(count(*) AS BIGINT) AS n_quarantined FROM marked WHERE bad
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents,
       qn.n_quarantined
FROM marked CROSS JOIN qn
WHERE NOT bad
GROUP BY event_type, qn.n_quarantined
ORDER BY event_type
"""

# q116: parquet truth for the ORC round-trip — format changes the
# bytes on disk, never the rows.
ORACLES["q116_orc_interop"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# s10: the s03 IVF mirror (seeds -> one Lloyd step -> assignment ->
# probes) chained with the s06 PQ mirror (codebooks -> codes -> ADC
# -> exact refine), ADC restricted to each query's probed clusters.
ORACLES["s10_ivf_pq_ann"] = """
WITH corpus AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
seeds AS (
    SELECT CAST(rn - 1 AS INTEGER) AS cluster, v AS cent FROM (
        SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM corpus
    ) WHERE rn <= 16
),
d0 AS (
    SELECT c.vec_id, s.cluster,
        list_sum(list_transform(list_zip(c.v, s.cent),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
    FROM corpus c CROSS JOIN seeds s
),
a0 AS (
    SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
            row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM d0
    ) WHERE rn = 1
),
sums AS (
    SELECT a0.cluster, i.i AS pos, sum(c.v[i.i]) AS s, count(*) AS n
    FROM a0 JOIN corpus c USING (vec_id), range(1, 65) i(i)
    GROUP BY a0.cluster, i.i
),
newc AS (
    SELECT cluster, list(s / n ORDER BY pos) AS cent FROM sums GROUP BY cluster
),
cent1 AS (
    SELECT s.cluster, coalesce(n.cent, s.cent) AS cent
    FROM seeds s LEFT JOIN newc n USING (cluster)
),
d1 AS (
    SELECT c.vec_id, k.cluster,
        list_sum(list_transform(list_zip(c.v, k.cent),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
    FROM corpus c CROSS JOIN cent1 k
),
assign AS (
    SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
            row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM d1
    ) WHERE rn = 1
),
qd AS (
    SELECT c.vec_id AS query_id, c.v AS q_vec, k.cluster,
        list_sum(list_transform(list_zip(c.v, k.cent),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
    FROM corpus c CROSS JOIN cent1 k
    WHERE c.vec_id < 10
),
probes AS (
    SELECT query_id, q_vec, cluster FROM (
        SELECT query_id, q_vec, cluster,
            row_number() OVER (PARTITION BY query_id ORDER BY dist, cluster) AS pr
        FROM qd
    ) WHERE pr <= 4
),
pseeds AS (
    SELECT CAST(rn - 1 AS INTEGER) AS code, v FROM (
        SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM corpus
    ) WHERE rn <= 8
),
codebook AS (
    SELECT m.m, s.code, s.v[m.m * 16 + 1 : m.m * 16 + 16] AS sub
    FROM pseeds s, range(0, 4) m(m)
),
subdists AS (
    SELECT c.vec_id, cb.m, cb.code,
        list_sum(list_transform(
            list_zip(c.v[cb.m * 16 + 1 : cb.m * 16 + 16], cb.sub),
            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
    FROM corpus c CROSS JOIN codebook cb
),
codes AS (
    SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
            row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
        FROM subdists
    ) WHERE rn = 1
),
codes_w AS (
    SELECT vec_id,
        max(CASE WHEN m = 0 THEN code END) AS code_0,
        max(CASE WHEN m = 1 THEN code END) AS code_1,
        max(CASE WHEN m = 2 THEN code END) AS code_2,
        max(CASE WHEN m = 3 THEN code END) AS code_3
    FROM codes GROUP BY vec_id
),
adc AS (
    SELECT p.query_id, a.vec_id AS cand_id,
        round(((
            list_sum(list_transform(list_zip(p.q_vec[1:16], cb0.sub),
                q -> (q[1] - q[2]) * (q[1] - q[2])))
          + list_sum(list_transform(list_zip(p.q_vec[17:32], cb1.sub),
                q -> (q[1] - q[2]) * (q[1] - q[2]))))
          + list_sum(list_transform(list_zip(p.q_vec[33:48], cb2.sub),
                q -> (q[1] - q[2]) * (q[1] - q[2]))))
          + list_sum(list_transform(list_zip(p.q_vec[49:64], cb3.sub),
                q -> (q[1] - q[2]) * (q[1] - q[2]))), 6) AS adc_dist
    FROM probes p
    JOIN assign a USING (cluster)
    JOIN codes_w cw ON cw.vec_id = a.vec_id
    JOIN codebook cb0 ON cb0.m = 0 AND cb0.code = cw.code_0
    JOIN codebook cb1 ON cb1.m = 1 AND cb1.code = cw.code_1
    JOIN codebook cb2 ON cb2.m = 2 AND cb2.code = cw.code_2
    JOIN codebook cb3 ON cb3.m = 3 AND cb3.code = cw.code_3
    WHERE a.vec_id <> p.query_id
),
shortlist AS (
    SELECT query_id, cand_id, adc_dist FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist, cand_id) AS pr
        FROM adc
    ) WHERE pr <= 20
),
refined AS (
    SELECT s.query_id, s.cand_id, s.adc_dist,
        round(list_dot_product(q.v, c.v)
              / (sqrt(list_dot_product(q.v, q.v))
                 * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
    FROM shortlist s
    JOIN corpus q ON q.vec_id = s.query_id
    JOIN corpus c ON c.vec_id = s.cand_id
)
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, cand_id, adc_dist, cosine
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM refined
)
WHERE rnk <= 5
ORDER BY query_id, rnk
"""


def _p22_oracle() -> str:
    """Mirror of p22: d06's recursive-CTE components over the verified
    pairs, singleton components = own doc id, md5 bucket on the
    component id (grouped) vs the doc id (naive), audits riding."""
    return f"""
WITH RECURSIVE {_minhash_pairs_sql(0.5)},
und AS (
    SELECT doc_a AS a, doc_b AS b FROM verified
    UNION
    SELECT doc_b AS a, doc_a AS b FROM verified
),
walk(n, lab) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM und)
    UNION
    SELECT u.b, w.lab FROM walk w JOIN und u ON u.a = w.n WHERE w.lab < u.b
),
comp AS (
    SELECT n AS doc, min(lab) AS component FROM walk GROUP BY n
),
labeled AS (
    SELECT d.doc_id, d.n_chars,
           COALESCE(c.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id
),
split_of AS (
    SELECT doc_id, n_chars, component,
        CASE WHEN CAST(('0x' || substr(md5(CAST(component AS VARCHAR)),
                        1, 8)) AS BIGINT) % 100 < 10
             THEN 'test' ELSE 'train' END AS split,
        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 100 < 10
             THEN 'test' ELSE 'train' END AS split_naive
    FROM labeled
),
audit AS (
    SELECT
        CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END)
             AS BIGINT) AS cross_pairs_grouped,
        CAST(sum(CASE WHEN sa.split_naive <> sb.split_naive
                 THEN 1 ELSE 0 END) AS BIGINT) AS cross_pairs_naive
    FROM verified v
    JOIN split_of sa ON sa.doc_id = v.doc_a
    JOIN split_of sb ON sb.doc_id = v.doc_b
)
SELECT s.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT s.component) AS BIGINT) AS n_components,
       CAST(sum(s.n_chars) AS BIGINT) AS sum_chars,
       a.cross_pairs_grouped,
       a.cross_pairs_naive
FROM split_of s CROSS JOIN audit a
GROUP BY s.split, a.cross_pairs_grouped, a.cross_pairs_naive
ORDER BY s.split
"""


ORACLES["p22_leakage_safe_split"] = _p22_oracle()

# q117: the original events are the truth — compaction changes file
# layout and scan cost, never rows.
ORACLES["q117_compaction_maintenance"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
FROM events
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts <  TIMESTAMP '2024-01-15 00:00:00'
GROUP BY event_type
ORDER BY event_type
"""

# q118: the UDTF's installment split is pure integer arithmetic on
# (o_orderkey, cents), replayed here via unnest(generate_series(1, n)).
ORACLES["q118_udtf_lateral"] = """
WITH o AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           o_orderkey % 3 + 1 AS n
    FROM orders
    WHERE o_orderdate >= DATE '2000-08-01'
),
inst AS (
    SELECT o_orderkey, cents, n,
           unnest(generate_series(1, n)) AS i
    FROM o
)
SELECT CAST(i AS INT) AS inst_no,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents // n + CASE WHEN i <= cents % n THEN 1 ELSE 0 END)
            AS BIGINT) AS total_cents,
       CAST(min(cents // n + CASE WHEN i <= cents % n THEN 1 ELSE 0 END)
            AS BIGINT) AS min_cents,
       CAST(max(cents // n + CASE WHEN i <= cents % n THEN 1 ELSE 0 END)
            AS BIGINT) AS max_cents
FROM inst
GROUP BY i
ORDER BY inst_no
"""

# q121: with maxItemsTracked >= the column's cardinality the sketch
# is exact (no evictions), so plain counts replay every column.
ORACLES["q121_approx_top_k"] = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS est_n,
       CAST(count(*) AS BIGINT) AS exact_n,
       CAST(0 AS BIGINT) AS est_gap
FROM customer
GROUP BY c_nationkey
ORDER BY nationkey
"""

# q120: the script's doubling WHILE search has the closed form
# thr = 100 * 2^(min k with count(o_totalprice > 100*2^k) < 1000);
# the final rollup filters on thr/2 (last threshold keeping >= 1000
# orders) so the output is guaranteed non-empty and the converged
# threshold/tier are genuinely value-compared.
ORACLES["q120_sql_scripting"] = """
WITH counts AS (
    SELECT k,
           (SELECT count(*) FROM orders
            WHERE o_totalprice > 100.0 * power(2, k)) AS n
    FROM generate_series(0, 60) gs(k)
),
pick AS (
    SELECT CAST(100.0 * power(2, min(k)) AS DOUBLE) AS thr
    FROM counts WHERE n < 1000
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS rev_cents,
       CAST(round(p.thr, 2) AS DOUBLE) AS threshold,
       CASE WHEN p.thr >= 102400.0 THEN 'high' ELSE 'low' END AS tier
FROM orders o CROSS JOIN pick p
WHERE o.o_totalprice > p.thr / 2
GROUP BY o.o_orderpriority, p.thr
ORDER BY o_orderpriority
"""

# q119: values are join-order-invariant; the oracle is the plain
# 3-table join on the raw parquet truth.
ORACLES["q119_cbo_join_reorder"] = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS price_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

# q122: values are format-invariant; the oracle reads the parquet
# truth of the same rows the XML fixture re-staged.
ORACLES["q122_xml_interop"] = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_open,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
GROUP BY strftime(o_orderdate, '%Y-%m')
ORDER BY month
"""

# s11: integer micro-unit moments — float32 -> float64 widening is
# lossless and integer sums commute, so list lambdas replay the
# mapInArrow kernel bit-for-bit.
ORACLES["s11_arrow_vector_features"] = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS n_dims,
       CAST(list_sum(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
           AS BIGINT) AS sum_micro,
       CAST(list_sum(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
              * CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
           AS BIGINT) AS sumsq_micro
FROM embeddings
WHERE embedding IS NOT NULL
  AND len(list_filter(embedding, x -> x IS NULL)) = 0
ORDER BY vec_id
"""

# q123: DuckDB mirrors every modern-SQL surface the lane uses
# (lateral aliases, DISTINCT ordered string_agg, try_cast).
ORACLES["q123_modern_sql"] = """
WITH base AS (
    SELECT source, lang,
           length(text) AS len_chars,
           length(text) // 100 AS hecto,
           try_cast(substr(text, 1, 1) AS INT) AS lead_digit
    FROM documents
    WHERE length(text) >= 10
)
SELECT source,
       string_agg(DISTINCT lang, '|' ORDER BY lang) AS langs,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(hecto) AS BIGINT) AS hecto_sum,
       CAST(count(lead_digit) AS BIGINT) AS n_digit_led,
       CAST(coalesce(sum(lead_digit), 0) AS BIGINT) AS digit_sum
FROM base
GROUP BY source
ORDER BY source
"""

# q124: footer statistics are exact for MIN/MAX/COUNT, so both rows
# equal the plain scan truth.
ORACLES["q124_agg_pushdown"] = """
WITH t AS (
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
)
SELECT 'footer' AS via, * FROM t
UNION ALL
SELECT 'scan' AS via, * FROM t
ORDER BY via
"""

# p23: suppression is a pure predicate on the cell count (k = 5);
# suppressed cells merge into one '__redacted__' bucket so totals
# stay auditable.
ORACLES["p23_k_anonymity"] = """
WITH cells AS (
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY lang, source
),
keyed AS (
    SELECT CASE WHEN n >= 5 THEN lang ELSE '__redacted__' END AS lang,
           CASE WHEN n >= 5 THEN source ELSE '__redacted__' END AS source,
           n, chars,
           CASE WHEN n < 5 THEN 1 ELSE 0 END AS supp
    FROM cells
),
tot AS (
    SELECT CAST(sum(supp) AS BIGINT) AS n_suppressed_cells FROM keyed
)
SELECT k.lang, k.source,
       CAST(sum(k.n) AS BIGINT) AS n_docs,
       CAST(sum(k.chars) AS BIGINT) AS n_chars,
       CAST(sum(k.supp) AS BIGINT) AS cells_merged,
       t.n_suppressed_cells
FROM keyed k CROSS JOIN tot t
GROUP BY k.lang, k.source, t.n_suppressed_cells
ORDER BY k.lang, k.source
"""

# q125: per-partition footer counts are exact; both rows equal the
# plain per-day counts of the flat events truth.
ORACLES["q125_groupby_pushdown"] = """
WITH t AS (
    SELECT strftime(ts, '%Y-%m-%d') AS event_day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d')
)
SELECT 'footer' AS via, * FROM t
UNION ALL
SELECT 'scan' AS via, * FROM t
ORDER BY via, event_day
"""

# q126: AQE coalescing changes the PLAN, never the result — the
# oracle is the plain two-level per-user rollup.
ORACLES["q126_aqe_coalesce"] = """
WITH per_user AS (
    SELECT event_type, user_id, count(*) AS n
    FROM events
    GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS max_per_user
FROM per_user
GROUP BY event_type
ORDER BY event_type
"""

# q127: the UDF and the expression twin compute the same integer
# score, so the oracle emits the one closed form for BOTH sum columns
# (the in-row equality is the lane's own subject matter).
ORACLES["q127_arrow_scalar_udf"] = """
WITH scored AS (
    SELECT lang,
           1000 * length(text)
           + 7 * (length(text) - length(replace(text, ' ', '')))
           + 3 * (length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g')))
               AS score
    FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(score) AS BIGINT) AS sum_score_udf,
       CAST(sum(score) AS BIGINT) AS sum_score_expr
FROM scored
GROUP BY lang
ORDER BY lang
"""

# q128: the sweep's cutoff is data-derived (max day - 13), so the
# oracle replays membership from the flat events truth — survivors
# only, boundary value-verified.
ORACLES["q128_retention_delete"] = """
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d'), event_type
),
cut AS (
    SELECT strftime(max(CAST(ts AS DATE)) - INTERVAL 13 DAY,
                    '%Y-%m-%d') AS cutoff
    FROM events
)
SELECT d.day,
       CAST(sum(d.n_events) AS BIGINT) AS n_events,
       CAST(sum(d.cents) AS BIGINT) AS cents,
       CAST(count(DISTINCT d.event_type) AS BIGINT) AS n_types,
       c.cutoff
FROM daily d CROSS JOIN cut c
WHERE d.day >= c.cutoff
GROUP BY d.day, c.cutoff
ORDER BY d.day
"""

# q129: one file per bucket BY CONSTRUCTION (bucket-colocated write),
# so per-file stats equal per-bucket truth and n_files is exactly 1.
ORACLES["q129_file_metadata_audit"] = """
SELECT CAST(o_orderkey % 4 AS INT) AS bucket,
       CAST(1 AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderkey % 4
ORDER BY bucket
"""

# q130: generation membership is doc_id parity; gen-1 rows NULL-fill
# source/n_chars under the merged schema. n_gen2 replays the query's
# count(source) EXACTLY — a gen-2 row with NULL source (none at any
# current sf, but legal) is skipped by both sides.
ORACLES["q130_schema_evolution_read"] = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN doc_id % 2 = 1 AND source IS NOT NULL
                       THEN 1 END) AS BIGINT)
           AS n_gen2,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
           AS gen2_chars,
       CAST(min(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END) AS INT)
           AS min_gen,
       CAST(max(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END) AS INT)
           AS max_gen
FROM documents
GROUP BY lang
ORDER BY lang
"""

# p24: boundaries derive from min(day); the embargo crossing count is
# zero by construction (2-day band > 48h horizon) — replayed, not
# assumed.
ORACLES["p24_temporal_embargo_split"] = """
WITH b AS (
    SELECT min(CAST(ts AS DATE)) AS d0 FROM events
),
base AS (
    SELECT event_id, user_id, ts, strftime(ts, '%Y-%m-%d') AS day,
           strftime((SELECT d0 FROM b) + INTERVAL 21 DAY,
                    '%Y-%m-%d') AS cut1,
           strftime((SELECT d0 FROM b) + INTERVAL 23 DAY,
                    '%Y-%m-%d') AS cut2
    FROM events
),
tagged AS (
    SELECT *,
           CASE WHEN day < cut1 THEN 'train'
                WHEN day < cut2 THEN 'embargo'
                ELSE 'test' END AS split
    FROM base
),
per_split AS (
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(day) AS first_day,
           max(day) AS last_day
    FROM tagged
    GROUP BY split
),
naive AS (
    SELECT CAST(count(*) AS BIGINT) AS naive_cross_pairs
    FROM tagged tr JOIN tagged te
      ON tr.user_id = te.user_id
     AND tr.day < tr.cut1
     AND te.day >= te.cut1
     AND te.ts < tr.ts + INTERVAL 48 HOUR
     AND tr.ts >= CAST(tr.cut1 AS TIMESTAMP) - INTERVAL 48 HOUR
     AND te.ts < CAST(te.cut1 AS TIMESTAMP) + INTERVAL 48 HOUR
),
emb AS (
    SELECT CAST(count(*) AS BIGINT) AS embargo_cross_pairs
    FROM tagged tr JOIN tagged te
      ON tr.user_id = te.user_id
     AND tr.day < tr.cut1
     AND te.day >= te.cut2
     AND te.ts < tr.ts + INTERVAL 48 HOUR
     AND tr.ts >= CAST(tr.cut2 AS TIMESTAMP) - INTERVAL 48 HOUR
     AND te.ts < CAST(te.cut1 AS TIMESTAMP) + INTERVAL 48 HOUR
)
SELECT p.*, n.naive_cross_pairs, e.embargo_cross_pairs
FROM per_split p CROSS JOIN naive n CROSS JOIN emb e
ORDER BY split
"""

# q131: join strategy never changes values — the oracle is the plain
# filtered join rollup.
ORACLES["q131_aqe_runtime_broadcast"] = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS price_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 3
GROUP BY p.p_brand
ORDER BY p_brand
"""

# q132: the external 'tr a-z A-Z' pipe is upper() — the oracle IS the
# expression rewrite the migration ends at.
ORACLES["q132_script_transform"] = """
SELECT upper(event_type) AS event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
FROM events
GROUP BY upper(event_type)
ORDER BY event_type
"""

# q133: the histogram twin's values are conf-invariant — the dominant
# language (max count, tie-break lang) filter + embedding coverage
# replayed from the flat truth; lang_code never changes membership.
ORACLES["q133_histogram_stats"] = """
WITH dom AS (
    SELECT lang FROM documents
    GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       CAST(count(e.vec_id) AS BIGINT) AS n_vecs
FROM documents d
JOIN dom ON d.lang = dom.lang
LEFT JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY d.source
ORDER BY d.source
"""

# q134: each fan-out output recomputed from the flat fact — per-group
# integer casts replayed exactly, then rolled to the consumer summary.
ORACLES["q134_multi_output_etl"] = """
SELECT 'by_flag' AS output,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(sum(m) AS BIGINT) AS measure
FROM (
  SELECT count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS m
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
UNION ALL
SELECT 'by_month',
       CAST(count(*) AS BIGINT),
       CAST(sum(n) AS BIGINT),
       CAST(sum(m) AS BIGINT)
FROM (
  SELECT count(*) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS m
  FROM lineitem GROUP BY strftime(l_shipdate, '%Y-%m')
)
UNION ALL
SELECT 'by_suppband',
       CAST(count(*) AS BIGINT),
       CAST(sum(n) AS BIGINT),
       CAST(sum(m) AS BIGINT)
FROM (
  SELECT count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS m
  FROM lineitem GROUP BY l_suppkey % 10
)
ORDER BY output
"""

# q135: legacy rows replay the exists-default ('unreviewed', 0); the
# two planted rows are fixed constants — one explicit, one riding the
# insert-side current-default.
ORACLES["q135_default_columns"] = """
WITH evolved AS (
  SELECT lang, 'unreviewed' AS quality_tier, 0 AS review_pass, n_chars
  FROM documents
  UNION ALL
  SELECT 'en', 'expedited', 2, 11
  UNION ALL
  SELECT 'en', 'unreviewed', 0, 12
)
SELECT lang, quality_tier,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(review_pass) AS BIGINT) AS passes,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM evolved
GROUP BY lang, quality_tier
ORDER BY lang, quality_tier
"""

# q136: values are cache- and layout-invariant — the plain filtered
# rollup (q108's oracle shape over the unmodified orders).
ORACLES["q136_cache_zone_pruning"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders
WHERE o_totalprice < 2000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# q137: the grouped-agg UDF's sum-of-squares replayed as the builtin
# expression (both columns — the in-row equality is the verified value).
ORACLES["q137_grouped_agg_udf"] = """
SELECT o_orderpriority,
       CAST(sum(c * c) AS BIGINT) AS udf_ss,
       CAST(sum(c * c) AS BIGINT) AS expr_ss,
       CAST(count(*) AS BIGINT) AS n_orders
FROM (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) % 100000 AS c
  FROM orders
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# t26: the fault fixture replayed in SQL (same residue classes, same
# injected suffixes); NFC via DuckDB's nfc_normalize (UAX #15, must
# agree with Python's unicodedata) — chr(8203)=U+200B zero width,
# chr(769)=combining acute, chr(65533)=U+FFFD.
ORACLES["t26_unicode_hygiene"] = """
WITH perturbed AS (
  SELECT source,
         CASE WHEN doc_id % 97 = 0 THEN text || chr(8203)
              WHEN doc_id % 89 = 0 THEN text || 'e' || chr(769)
              WHEN doc_id % 83 = 0 THEN text || chr(65533)
              ELSE text END AS t
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN regexp_matches(t,
            '[' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || ']')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_width,
       CAST(sum(CASE WHEN contains(t, chr(65533)) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_replacement,
       CAST(sum(CASE WHEN regexp_matches(t,
            '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_control,
       CAST(sum(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nonnfc,
       CAST(sum(length(t) - length(regexp_replace(t,
            '[' || chr(8203) || chr(8204) || chr(8205) || chr(65279)
                || chr(65533) || ']', '', 'g'))) AS BIGINT)
            AS scrub_delta
FROM perturbed
GROUP BY source
ORDER BY source
"""

# q138: the try_* NULL-on-overflow semantics replayed in HUGEINT
# (DuckDB's sum(BIGINT) is HUGEINT already — range-check then narrow);
# the DECIMAL twin compared as digit strings.
ORACLES["q138_try_arithmetic"] = """
WITH t AS (
  SELECT o_orderpriority AS g,
         CASE WHEN o_orderpriority = '1-URGENT'
              THEN 2305843009213693952
                   + CAST(round(o_totalprice * 100, 0) AS BIGINT)
              ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT)
         END AS b
  FROM orders
)
SELECT g,
       CAST(count(*) AS BIGINT) AS n_rows,
       CASE WHEN sum(CAST(b AS HUGEINT))
                 BETWEEN -9223372036854775808 AND 9223372036854775807
            THEN CAST(sum(b) AS BIGINT) ELSE NULL END AS try_sum_b,
       CAST(sum(CAST(b AS DECIMAL(38,0))) AS VARCHAR) AS exact_sum,
       CAST(sum(CASE WHEN CAST(b AS HUGEINT) * 16
                          > 9223372036854775807
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mul_overflow
FROM t
GROUP BY g
ORDER BY g
"""
