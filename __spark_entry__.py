"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (user_profile macro) on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalent per query.

Float determinism contract: every sum over a 2-decimal business value is
computed as an exact DECIMAL sum cast to DOUBLE on BOTH sides, so values
are bit-identical regardless of partition/aggregation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.session import tune_session
from bigdata_etl_customer360_spark.sources.testdata import load_table
from bigdata_etl_customer360_spark.operators.relational import (
    bucketize,
    map_dimension,
    pivot_agg,
    top_k_per_group,
    union_by_name,
)
from bigdata_etl_customer360_spark.plans.pipelines import behavior_trend, user_profile

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, name, sf_dir)


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-user engagement profile (profile_agg macro,
    ETL_customer_interaction.py:43-59 re-expressed) on sf0.001 events."""
    return q_profile_agg(spark, SF_SMOKE)


# --------------------------------------------------------------------------
# queries (SURVEY §2 inventory) — each with an oracle below
# --------------------------------------------------------------------------

def q_profile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_profile(_t(spark, sf_dir, "events"))


_PRIORITY_MAP = {
    "1-URGENT": "Critical",
    "2-HIGH": "Critical",
    "3-MEDIUM": "Standard",
    "4-NOT SPECIFIED": "Standard",
    # '5-LOW' deliberately unmapped -> dropped (reference drops Type=='Error',
    # ETL_customer_interaction.py:20)
}


def q_dimension_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return map_dimension(
        orders, "o_orderpriority", _PRIORITY_MAP, out_col="priority_class", drop_unmapped=True
    ).select("o_orderkey", "o_orderpriority", "priority_class")


def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return pivot_agg(
        li,
        keys=["l_orderkey"],
        pivot_col="l_returnflag",
        pivot_values=["A", "N", "R"],
        value_col="l_quantity",
        agg="sum",
        fill=0,
        prefix="qty_",
    )


def q_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return top_k_per_group(
        counted, ["user_id"], [F.col("cnt").desc(), F.col("event_type").asc()], k=1
    )


def q_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return bucketize(
        cust, "c_acctbal", [2500.0, 7500.0], ["Low", "Medium", "High"], "balance_tier"
    ).select("c_custkey", "c_acctbal", "balance_tier")


def q_trend_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    return behavior_trend(_t(spark, sf_dir, "events"))


def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    return joined.groupBy("n_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer["c_custkey"] == urgent["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("user_id", "event_type")
    b = ev.filter(F.col("event_id") % 2 == 1).select("event_type", "user_id")  # shuffled order
    return union_by_name([a, b]).groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_agg": q_profile_agg,
        "dimension_map": q_dimension_map,
        "pivot_agg": q_pivot_agg,
        "top_k_per_group": q_top_k_per_group,
        "bucketize": q_bucketize,
        "trend_compare": q_trend_compare,
        "join_agg": q_join_agg,
        "join_left": q_join_left,
        "join_semi": q_join_semi,
        "join_anti": q_join_anti,
        "union_by_name": q_union_by_name,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB ANSI SQL over pre-registered views)
# --------------------------------------------------------------------------

_GREATEST = "GREATEST(total_purchase, total_view, total_click, total_signup)"

_ORACLES: dict[str, str] = {
    "profile_agg": f"""
        WITH agg AS (
          SELECT user_id,
            COALESCE(CAST(SUM(CASE WHEN event_type = 'click'
                THEN CAST(value AS DECIMAL(27,2)) END) AS DOUBLE), 0.0) AS total_click,
            COALESCE(CAST(SUM(CASE WHEN event_type = 'view'
                THEN CAST(value AS DECIMAL(27,2)) END) AS DOUBLE), 0.0) AS total_view,
            COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(27,2)) END) AS DOUBLE), 0.0) AS total_purchase,
            COALESCE(CAST(SUM(CASE WHEN event_type = 'signup'
                THEN CAST(value AS DECIMAL(27,2)) END) AS DOUBLE), 0.0) AS total_signup,
            COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
          FROM events
          WHERE event_type IN ('click', 'view', 'purchase', 'signup')
          GROUP BY user_id
        )
        SELECT user_id, total_click, total_view, total_purchase, total_signup, active_days,
          CASE WHEN total_purchase = {_GREATEST} THEN 'purchase'
               WHEN total_view = {_GREATEST} THEN 'view'
               WHEN total_click = {_GREATEST} THEN 'click'
               WHEN total_signup = {_GREATEST} THEN 'signup' END AS most_engaged,
          concat_ws('-',
            CASE WHEN total_click <> 0 THEN 'click' END,
            CASE WHEN total_view <> 0 THEN 'view' END,
            CASE WHEN total_purchase <> 0 THEN 'purchase' END,
            CASE WHEN total_signup <> 0 THEN 'signup' END) AS engagement_mix,
          CASE WHEN active_days < 10 THEN 'Low'
               WHEN active_days < 21 THEN 'Medium'
               ELSE 'High' END AS activeness
        FROM agg
    """,
    "dimension_map": """
        SELECT o_orderkey, o_orderpriority,
          CASE o_orderpriority
            WHEN '1-URGENT' THEN 'Critical'
            WHEN '2-HIGH' THEN 'Critical'
            WHEN '3-MEDIUM' THEN 'Standard'
            WHEN '4-NOT SPECIFIED' THEN 'Standard'
          END AS priority_class
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED')
    """,
    "pivot_agg": """
        SELECT l_orderkey,
          COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0) AS qty_A,
          COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0) AS qty_N,
          COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0) AS qty_R
        FROM lineitem
        GROUP BY l_orderkey
    """,
    "top_k_per_group": """
        SELECT user_id, event_type, cnt FROM (
          SELECT user_id, event_type, cnt,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY cnt DESC, event_type ASC) AS rn
          FROM (SELECT user_id, event_type, COUNT(*) AS cnt
                FROM events GROUP BY user_id, event_type)
        ) WHERE rn = 1
    """,
    "bucketize": """
        SELECT c_custkey, c_acctbal,
          CASE WHEN c_acctbal <= 2500.0 THEN 'Low'
               WHEN c_acctbal <= 7500.0 THEN 'Medium'
               ELSE 'High' END AS balance_tier
        FROM customer
    """,
    "trend_compare": """
        WITH bounds AS (
          -- exact epoch-microsecond midpoint: timezone-free on both engines
          SELECT CAST(floor((epoch_us(MIN(ts)) + epoch_us(MAX(ts))) / 2) AS BIGINT) AS split_us
          FROM events
        ),
        early AS (
          SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events, bounds WHERE epoch_us(ts) < split_us GROUP BY user_id, event_type
        ),
        late AS (
          SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events, bounds WHERE epoch_us(ts) >= split_us GROUP BY user_id, event_type
        ),
        tope AS (
          SELECT user_id, event_type AS dominant_early FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY cnt DESC, event_type ASC) AS rn
            FROM early) WHERE rn = 1
        ),
        topl AS (
          SELECT user_id, event_type AS dominant_late FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY cnt DESC, event_type ASC) AS rn
            FROM late) WHERE rn = 1
        )
        SELECT user_id, dominant_early, dominant_late,
          CASE WHEN dominant_early = dominant_late
               THEN 'Unchanged' ELSE 'Changed' END AS trending_type,
          CASE WHEN dominant_early = dominant_late
               THEN 'Unchanged'
               ELSE concat_ws('-', dominant_early, dominant_late) END AS value_change
        FROM tope JOIN topl USING (user_id)
    """,
    "join_agg": """
        SELECT n_name,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "join_left": """
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "union_by_name": """
        SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
