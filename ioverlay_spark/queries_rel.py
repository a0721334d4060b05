"""Relational-surface queries over the TPC-H-ish tables and the events stream table
(SURVEY.md §2.6 checklist made explicit): broadcast dim joins, shuffle join +
window top-k, event-time tumbling windows, sessionization (gaps-and-islands), and
JSON scalar functions. Every aggregate is integer-exact (money as rounded cents,
time as epoch microseconds) so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import QuerySpec, _register, _tbl


def _cents(expr: str) -> str:
    # deterministic per-row rounding then integer sums (double sums are
    # order-dependent; integer sums are not)
    return f"CAST(ROUND({expr} * 100) AS BIGINT)"


@_register("dim_join_rollup")
def _q_dim_join_rollup():
    """supplier ⋈ nation ⋈ region rollup — the broadcast-dim-join shape (tiny dims
    broadcast; no shuffle of the fact side until the final agg)."""

    def shared_sql(dialect: str, sup: str, nat: str, reg: str) -> str:
        return f"""
SELECT r.r_name AS region, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM({_cents("s.s_acctbal")}) AS BIGINT) AS acctbal_cents
FROM {sup} s
JOIN {nat} n ON s.s_nationkey = n.n_nationkey
JOIN {reg} r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

    def spark_fn(spark, sf_dir):
        return spark.sql(
            shared_sql(
                "spark",
                _tbl("spark", sf_dir, "supplier"),
                _tbl("spark", sf_dir, "nation"),
                _tbl("spark", sf_dir, "region"),
            )
        )

    return QuerySpec(
        spark=spark_fn, oracle=shared_sql("duckdb", "supplier", "nation", "region")
    )


@_register("cust_orders_topk")
def _q_cust_orders_topk():
    """customer ⋈ orders shuffle join + per-segment top-3 customers by order count
    (window top-k with deterministic tie-break)."""

    def shared_sql(dialect: str, cust: str, orders: str) -> str:
        return f"""
WITH co AS (
  SELECT c.c_mktsegment AS seg, c.c_custkey AS ck,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM({_cents("o.o_totalprice")}) AS BIGINT) AS spend_cents
  FROM {cust} c JOIN {orders} o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
)
SELECT seg, ck, n_orders, spend_cents, rnk FROM (
  SELECT seg, ck, n_orders, spend_cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY seg ORDER BY n_orders DESC, ck) AS BIGINT) AS rnk
  FROM co
) t WHERE rnk <= 3
"""

    def spark_fn(spark, sf_dir):
        return spark.sql(
            shared_sql(
                "spark", _tbl("spark", sf_dir, "customer"), _tbl("spark", sf_dir, "orders")
            )
        )

    return QuerySpec(spark=spark_fn, oracle=shared_sql("duckdb", "customer", "orders"))


def _epoch_us(dialect: str, col: str) -> str:
    # ts is TIMESTAMP_NTZ: diff against an NTZ epoch literal is timezone-free and
    # matches DuckDB's naive epoch_us exactly
    if dialect == "spark":
        return f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
    return f"epoch_us({col})"


@_register("events_windowed")
def _q_events_windowed():
    """Event-time tumbling 1-hour windows over the events table: counts + exact
    cent-sums per (window, event_type) — the batch shape of the streaming
    windowed-agg (streaming/pages_stream.windowed_page_rates)."""

    def shared_sql(dialect: str, events: str) -> str:
        us = _epoch_us(dialect, "ts")
        hour = f"(({us}) // 3600000000)" if dialect == "duckdb" else f"(({us}) DIV 3600000000)"
        return f"""
SELECT CAST({hour} AS BIGINT) AS hour_bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM({_cents("value")}) AS BIGINT) AS value_cents
FROM {events}
GROUP BY {hour}, event_type
"""

    def spark_fn(spark, sf_dir):
        return spark.sql(shared_sql("spark", _tbl("spark", sf_dir, "events")))

    return QuerySpec(spark=spark_fn, oracle=shared_sql("duckdb", "events"))


@_register("events_sessionize")
def _q_events_sessionize():
    """Sessionization: per-user sessions split at >30-minute gaps
    (gaps-and-islands: LAG + running sum of breaks), exact microsecond math.
    The batch form of a stateful streaming session operator."""

    GAP_US = 30 * 60 * 1_000_000

    def shared_sql(dialect: str, events: str) -> str:
        us = _epoch_us(dialect, "ts")
        return f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST({us} AS BIGINT) AS t,
         CAST(event_id AS BIGINT) AS eid
  FROM {events}
),
m AS (
  SELECT user_id, t, eid,
         CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t, eid) IS NULL THEN 1
              WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, eid) > {GAP_US} THEN 1
              ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, t, eid,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t, eid
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m
)
SELECT user_id, CAST(sid AS BIGINT) AS session_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(t) AS BIGINT) AS start_us,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, sid
"""

    def spark_fn(spark, sf_dir):
        return spark.sql(shared_sql("spark", _tbl("spark", sf_dir, "events")))

    return QuerySpec(spark=spark_fn, oracle=shared_sql("duckdb", "events"))


@_register("events_json")
def _q_events_json():
    """JSON scalar functions: extract props.k, roll up per event_type (exact ints)."""

    def spark_fn(spark, sf_dir):
        ev = _tbl("spark", sf_dir, "events")
        return spark.sql(
            f"""
SELECT event_type,
       CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM {ev} GROUP BY event_type
"""
        )

    oracle = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""
    return QuerySpec(spark=spark_fn, oracle=oracle)
