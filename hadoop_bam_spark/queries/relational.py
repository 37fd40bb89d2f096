"""Relational operator corpus: scans, filters, projections, joins, aggregates,
windows, sorts/top-k, set ops, rollup/pivot — expressed with the DataFrame API
so Catalyst handles pushdown, pruning, join selection, and AQE.

The reference delegates ALL relational processing to user MapReduce jobs
(SURVEY.md §2.4-2.7); this module is the Spark-native query surface layered on
top of the I/O capabilities. Shapes are TPC-H-flavored to match the synthetic
tables in /root/testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hadoop_bam_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet and expose ``ts_us`` (epoch microseconds).

    The synthetic table has shipped with two ``ts`` physical types across
    driver revisions: TIMESTAMP(NANOS) (read as int64 nanos via the legacy
    conf) and TIMESTAMP(MICROS) (read natively as timestamp_ntz). Branch on
    the loaded type so both work; integer paths keep full precision."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = ev.schema["ts"].dataType.typeName()
    if ts_type in ("long", "integer"):
        ts_us = F.expr("CAST(ts DIV 1000 AS LONG)")
    else:  # timestamp / timestamp_ntz
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.withColumn("ts_us", ts_us)


# --------------------------------------------------------------------------
# Scans / filters / projections
# --------------------------------------------------------------------------

@query(
    "scan_filter_project",
    oracle="""
        SELECT l_orderkey, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
    """,
    doc="Projection + filter pushed to the parquet scan (PushedFilters).",
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Cast the literal to the COLUMN's timestamp flavor (ntz vs ltz varies
    # by testdata revision): a mismatched literal makes Catalyst cast the
    # column instead, and a cast-wrapped attribute cannot push to parquet.
    ship_t = li.schema["l_shipdate"].dataType
    return li.filter(
        (F.col("l_shipdate") < F.lit("1997-01-01").cast(ship_t))
        & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_extendedprice")


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                       AS sum_qty,
               round(sum(l_extendedprice), 2)                                  AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4)                                       AS avg_qty,
               round(avg(l_extendedprice), 4)                                  AS avg_price,
               round(avg(l_discount), 4)                                       AS avg_disc,
               count(*)                                                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: wide multi-aggregate groupBy (map-side partial agg).",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct_counts",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey)  AS n_orders,
               count(DISTINCT l_partkey)   AS n_parts,
               count(DISTINCT l_suppkey)   AS n_supps
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Multi countDistinct (expand + two-phase agg in Spark).",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "rollup_revenue",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy aggregate.",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "pivot_status_qty",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Pivot = conditional aggregation; fixed pivot values avoid an extra pass.",
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(o_orderdate AS DATE)::VARCHAR AS orderdate,
               o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1997-06-15'
          AND l_shipdate  > TIMESTAMP '1997-06-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3: 3-way join, dim side broadcast, agg, global top-k.",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-15").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name
    """,
    doc="TPC-H Q5: 6-way star join; all dims broadcast, one shuffle for the agg.",
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "semi_join_customers_with_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
    doc="Left-semi join (EXISTS).",
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_parts_never_ordered",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def anti_join_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "outer_join_nation_customer_counts",
    oracle="""
        SELECT n_name, count(c_custkey) AS n_customers,
               round(coalesce(sum(c_acctbal), 0), 2) AS total_acctbal
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc="Left outer join preserving empty groups.",
)
def outer_join_nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_acctbal"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4: correlated EXISTS as semi-join with non-equi residual.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Windows / sorts / top-k
# --------------------------------------------------------------------------

@query(
    "topk_orders_global",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    doc="Global top-k: TakeOrderedAndProject, no full sort.",
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "window_topn_per_group",
    oracle="""
        SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
        FROM (
            SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    doc="Top-N per group via ranked window (WindowGroupLimit pushdown in Spark).",
    bench=True,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@query(
    "window_running_revenue",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
               lag(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order
        FROM orders
    """,
    doc="Running total + lag over per-customer ordered windows.",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
    )


@query(
    "coordinate_range_sort",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
        LIMIT 1000
    """,
    doc="Range-partitioned global sort (repartitionByRange + sortWithinPartitions), "
    "the Spark analog of the reference's shuffle coordinate sort "
    "(BAMRecordReader.java:80-120).",
)
def coordinate_range_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.repartitionByRange(8, "l_orderkey", "l_linenumber")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "set_ops_customer_segments",
    oracle="""
        WITH build AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             rich  AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM build UNION SELECT * FROM rich)
        UNION ALL
        SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM build INTERSECT SELECT * FROM rich)
        UNION ALL
        SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM build EXCEPT SELECT * FROM rich)
    """,
    doc="UNION / INTERSECT / EXCEPT distinct-set semantics.",
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    rows = [
        build.union(rich).distinct().agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("union").alias("op"), "n"
        ),
        build.intersect(rich).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("intersect").alias("op"), "n"
        ),
        build.subtract(rich).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("except").alias("op"), "n"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# --------------------------------------------------------------------------
# Events: time-series aggregation + sessionization
# --------------------------------------------------------------------------

@query(
    "events_hourly_rollup",
    oracle="""
        SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling-window (hourly) rollup on the event stream table "
    "(microsecond epoch keys — the source stores nanosecond timestamps).",
    bench=True,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hour_us = F.col("ts_us") - F.col("ts_us") % 3600000000
    return (
        ev.groupBy(hour_us.alias("hour_us"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "events_sessionization",
    oracle="""
        WITH gaps AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sessions AS (
            SELECT user_id, ts_us,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                          ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
            FROM gaps
        )
        SELECT user_id, session_id, count(*) AS n_events,
               max(ts_us) - min(ts_us) AS duration_us
        FROM sessions
        GROUP BY user_id, session_id
    """,
    doc="Sessionization: lag-gap > 30min starts a session; window cumsum assigns ids. "
    "Microsecond arithmetic on both sides (events.ts has sub-second precision).",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    us = F.col("ts_us")
    gap = us - F.lag(us).over(w)
    sess = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


# ---------------------------------------------------------------------------
# As-of (temporal) join
# ---------------------------------------------------------------------------

@query(
    "events_asof_join",
    oracle="""
        WITH ev AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
            FROM events
        ),
        c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        v AS (SELECT user_id, ts_us AS view_ts FROM ev WHERE event_type = 'view')
        SELECT c.event_id, c.user_id, c.ts_us, v.view_ts,
               c.ts_us - v.view_ts AS lag_us
        FROM c ASOF LEFT JOIN v
          ON c.user_id = v.user_id AND c.ts_us >= v.view_ts
    """,
    doc="As-of join: each click matched to the user's most recent prior "
    "view. Spark lacks a native ASOF; this is the union-trick plan — tag "
    "sides, one keyed window ordered by (time, side), last(ignorenulls) "
    "carry-forward — ONE shuffle, zero row multiplication, no range-join "
    "explosion (operators/asof.py). Oracle is DuckDB's native ASOF LEFT "
    "JOIN.",
    bench=True,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts_us").alias("view_ts")
    )
    j = asof_join(
        clicks,
        views,
        on="user_id",
        left_time="ts_us",
        right_time="view_ts",
        right_cols=[],
    )
    return j.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("view_ts_right").alias("view_ts"),
        (F.col("ts_us") - F.col("view_ts_right")).alias("lag_us"),
    )


@query(
    "events_asof_join_hotkey",
    oracle="""
        WITH ev AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
            FROM events
        ),
        c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        v AS (SELECT user_id, ts_us AS view_ts FROM ev WHERE event_type = 'view')
        SELECT c.event_id, c.user_id, c.ts_us, v.view_ts,
               c.ts_us - v.view_ts AS lag_us
        FROM c ASOF LEFT JOIN v
          ON c.user_id = v.user_id AND c.ts_us >= v.view_ts
    """,
    doc="The SAME as-of join through the chunked hot-key path "
    "(operators/asof.py time_chunk: the last-carry-forward becomes a "
    "running struct max per (key, time chunk) on the fused prefix scan, "
    "so one dominating key spreads over #chunks partitions instead of "
    "one) — oracle-gated against DuckDB's native ASOF, same answer as "
    "the default windowed form. The event timestamps span days, so a "
    "1-hour time_chunk forces real multi-chunk recombination at gate "
    "scale.",
)
def events_asof_join_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts_us").alias("view_ts")
    )
    j = asof_join(
        clicks,
        views,
        on="user_id",
        left_time="ts_us",
        right_time="view_ts",
        right_cols=[],
        time_chunk=3_600_000_000,  # 1 h in µs
    )
    return j.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("view_ts_right").alias("view_ts"),
        (F.col("ts_us") - F.col("view_ts_right")).alias("lag_us"),
    )


@query(
    "events_value_percentiles",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95,
               round(quantile_cont(value, 0.99), 6) AS p99,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    doc="Exact linear-interpolation percentiles per event type (Spark "
    "percentile() == DuckDB quantile_cont, both the textbook definition). "
    "At 100 TB swap in percentile_approx for a mergeable sketch; the exact "
    "form stays oracle-verifiable.",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_funnel",
    oracle="""
        WITH ev AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
        ),
        v AS (SELECT user_id, min(ts_us) AS v FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts_us) AS c FROM ev e
              JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts_us >= v.v
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts_us) AS p FROM ev e
              JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts_us >= c.c
              GROUP BY e.user_id)
        SELECT (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
               (SELECT count(*) FROM v) AS n_viewed,
               (SELECT count(*) FROM c) AS n_clicked,
               (SELECT count(*) FROM p) AS n_purchased
    """,
    doc="Ordered conversion funnel (first view -> first click at-or-after "
    "it -> first purchase at-or-after that), computed in ONE shuffle: "
    "collect each user's (ts, type) events sorted, then pure array "
    "expressions walk the stages — no self-joins, no per-stage passes. "
    "The oracle states the same semantics relationally.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts_us", "event_type"))
        ).alias("seq")
    )

    def first_at_or_after(seq, etype, lower):
        hit = F.element_at(
            F.filter(
                seq,
                lambda s: (s["event_type"] == etype)
                & (s["ts_us"] >= F.coalesce(lower, F.lit(None).cast("long"))),
            ),
            1,
        )
        return hit["ts_us"]

    staged = per_user.select(
        F.element_at(
            F.filter(F.col("seq"), lambda s: s["event_type"] == "view"), 1
        )["ts_us"].alias("v"),
        F.col("seq"),
    )
    staged = staged.withColumn(
        "c", first_at_or_after(F.col("seq"), "click", F.col("v"))
    ).withColumn("p", first_at_or_after(F.col("seq"), "purchase", F.col("c")))
    return staged.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("v").alias("n_viewed"),
        F.count("c").alias("n_clicked"),
        F.count("p").alias("n_purchased"),
    )


@query(
    "events_salted_skew_join",
    oracle="""
        WITH probe AS (
            SELECT event_id,
                   CASE WHEN user_id % 10 < 6 THEN 0
                        ELSE user_id % 100 END AS skew_key,
                   value
            FROM events
        ),
        build AS (
            SELECT c_custkey % 100 AS skew_key,
                   min(c_name) AS rep_name,
                   count(*)    AS n_members
            FROM customer GROUP BY 1
        )
        SELECT b.rep_name AS rep_name,
               count(*) AS n_events,
               round(sum(p.value), 2) AS total_value
        FROM probe p JOIN build b USING (skew_key)
        GROUP BY rep_name
    """,
    doc="Salted skew join (operators/skew.py): ~60% of probe rows share "
    "ONE hot key; salted_join spreads that key over `salt` shuffle "
    "partitions by replicating the small build side, row-identical to the "
    "plain join. The explicit-salting tool for when a single key exceeds "
    "an executor (AQE splits partitions, never within a key) or AQE is "
    "off (streaming joins).",
)
def events_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 10 < 6, F.lit(0))
        .otherwise(F.col("user_id") % 100)
        .cast("long")
        .alias("skew_key"),
        "value",
    )
    build = (
        _t(spark, sf_dir, "customer")
        .groupBy((F.col("c_custkey") % 100).cast("long").alias("skew_key"))
        .agg(
            F.min("c_name").alias("rep_name"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
    joined = salted_join(ev, build, on="skew_key", salt=8)
    return joined.groupBy("rep_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
