"""Round-3 join-topology queries: the remaining TPC-H shapes adapted to
the driver schema (no partsupp/shipmode/commitdate columns, so Q7/Q8/Q9/
Q12/Q13/Q15/Q16/Q20 are re-expressed over the columns that exist).

Beyond the reference's operator set (it has no joins or aggregations,
SURVEY.md §2.5); these exercise the join strategies the 100 TB design
depends on: big-big shuffle joins co-partitioned on the fact key, dim
broadcasts, aggregate-then-semi-join reductions, left-outer count
distributions, and two-level distinct counting.

Float discipline matches queries/relational.py: money math is per-row
DECIMAL casts (exact, associative) summed as DECIMAL, converted to
DOUBLE only at the projection edge; ratios are truncated to 6 decimals
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.rounding import trunc6
from kafka_streams_dexcom_spark.sources.files import load_table

TRADE_YEARS = ("1996-01-01", "1998-01-01")  # [start, end)
MKT_REGION = "ASIA"
MKT_TYPE = "PROMO"
MKT_NATION = "NATION_2"
PROFIT_NAME_TOKEN = "widget"
COST_FACTOR = "0.10"  # unit cost proxy = 10% of p_retailprice
DELAY_FAST_DAYS = 30
DISTRIB_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"
PART_SUPP_SIZES = (1, 10, 25, 40)
AT_RISK_BALANCE = 1000.0
TOP_SUPP_QUARTER = ("1997-01-01", "1997-04-01")
DOMINANT_SHARE = 0.2


def _rev_dec():
    """Exact per-row revenue: DECIMAL product of ≤2-digit inputs."""
    return (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (
            F.lit(1).cast("decimal(3,2)")
            - F.col("l_discount").cast("decimal(3,2)")
        )
    ).cast("decimal(38,4)")


REV_DEC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
    " AS DECIMAL(38,4))"
)


def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (fact-fact equi-join + two dim lineages): revenue
    shipped between every (supplier nation -> customer nation) pair per
    ship year, cross-border only.

    Scale: ONE big-big shuffle join (lineitem⋈orders on orderkey, both
    sides hash-partitioned by the join key); customer, supplier and both
    nation lineages broadcast. The year filter pushes into the lineitem
    scan, and the group-by is bounded (25×24 pairs × 2 years), so the
    post-join aggregate is map-side-combined to almost nothing."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supp_n = F.broadcast(
        s.join(
            n, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = F.broadcast(
        c.join(
            n, F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    shipped = l.filter(
        (F.col("l_shipdate") >= F.lit(TRADE_YEARS[0]).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(TRADE_YEARS[1]).cast("timestamp_ntz"))
    )
    return (
        shipped.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (share-of-total inside a group): MKT_NATION's
    share of MKT_TYPE-part revenue sold INTO region MKT_REGION, per
    order year.

    Scale: the part filter broadcasts (type predicate prunes the dim
    first), restricting the fact scan join-side; the only shuffle is
    lineitem⋈orders on orderkey. The numerator is a conditional sum in
    the SAME aggregate as the denominator — one pass, no second scan,
    no self-join; per-year groups are bounded."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    parts = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == MKT_TYPE)
        .select("p_partkey")
    )
    cust_region = F.broadcast(
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == MKT_REGION)
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    rev = _rev_dec()
    return (
        l.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("total_rev"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(F.col("supp_nation") == MKT_NATION, rev)
                    ),
                    F.lit(0).cast("decimal(38,4)"),
                ),
                2,
            ).cast("double").alias("nation_rev"),
            trunc6(
                F.coalesce(
                    F.sum(
                        F.when(F.col("supp_nation") == MKT_NATION, rev)
                    ),
                    F.lit(0).cast("decimal(38,4)"),
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share"),
        )
    )


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit rollup by nation × year): for parts whose
    name contains PROFIT_NAME_TOKEN, profit = revenue − unit-cost proxy
    (COST_FACTOR × p_retailprice × quantity; the driver schema has no
    partsupp.ps_supplycost), rolled up by supplier nation and ship year.

    Scale: the name-filtered part dim broadcasts with its retailprice so
    cost math happens fact-side in one pass; the single shuffle is the
    bounded nation×year aggregate — lineitem never joins orders here
    (ship year comes from l_shipdate), one fewer fact shuffle than Q7."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    parts = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(PROFIT_NAME_TOKEN))
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = F.broadcast(
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    cost = (
        F.lit(COST_FACTOR).cast("decimal(4,2)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    ).cast("decimal(38,4)")
    return (
        l.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "nation", F.year("l_shipdate").cast("int").alias("ship_year")
        )
        .agg(
            F.round(F.sum(_rev_dec() - cost), 2).cast("double").alias(
                "profit"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (CASE-bucketed counts after a fact join): classify
    lineitems as FAST (shipped within DELAY_FAST_DAYS of the order) or
    SLOW, counting critical-priority (1-URGENT/2-HIGH) vs other orders
    per bucket — the driver schema has no l_shipmode, so the bucket IS
    the ship-latency class.

    Scale: one shuffle (lineitem⋈orders on orderkey); both CASE counts
    come from the same two-group aggregate with map-side combine. The
    orders probe side carries only (orderkey, orderdate, priority)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "ship_class",
            F.when(
                F.col("l_shipdate")
                <= F.col("o_orderdate")
                + F.expr(f"INTERVAL {DELAY_FAST_DAYS} DAYS"),
                F.lit("FAST"),
            ).otherwise(F.lit("SLOW")),
        )
        .groupBy("ship_class")
        .agg(
            F.count(F.when(crit, 1)).alias("critical_lines"),
            F.count(F.when(~crit, 1)).alias("other_lines"),
        )
    )


def q_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape (left-outer join + double aggregation): the
    distribution of orders-per-customer — how many customers placed k
    qualifying orders, INCLUDING k=0 (the left join keeps orderless
    customers; DISTRIB_EXCLUDED_PRIORITY orders don't qualify, standing
    in for Q13's comment-pattern exclusion).

    Scale: first aggregate is per-customer counts (shuffle on custkey —
    the left join and the groupBy share that partitioning, so Catalyst
    plans ONE exchange for both); second is the bounded k-distribution.
    count(o_orderkey) (not count(*)) makes the null-extension row count
    as zero — the Q13 correctness trap."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    qualifying = o.filter(
        F.col("o_orderpriority") != DISTRIB_EXCLUDED_PRIORITY
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.select("c_custkey")
        .join(qualifying, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (anti-join exclusion + two-level COUNT DISTINCT):
    per (p_brand, p_type, p_size) over PART_SUPP_SIZES, how many
    distinct suppliers shipped the part — excluding at-risk suppliers
    (s_acctbal < AT_RISK_BALANCE; the schema has no comment field). The
    part↔supplier association is derived from lineitem (no partsupp).

    Scale: distinct (partkey, suppkey) pairs reduce the fact first
    (map-side partial distinct); the at-risk exclusion is a broadcast
    ANTI join (never NOT IN — null-safe and distributable); the size
    filter prunes the broadcast part dim before the join. COUNT DISTINCT
    over the pre-distinct pairs is then exact with no expansion."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    at_risk = F.broadcast(
        s.filter(F.col("s_acctbal") < AT_RISK_BALANCE).select("s_suppkey")
    )
    sized = F.broadcast(
        p.filter(F.col("p_size").isin(*PART_SUPP_SIZES)).select(
            "p_partkey", "p_brand", "p_type", "p_size"
        )
    )
    pairs = (
        l.select("l_partkey", "l_suppkey")
        .distinct()
        .join(at_risk, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        pairs.join(sized, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (aggregate + join to its own scalar max): each
    supplier's TOP_SUPP_QUARTER revenue, keeping only the supplier(s)
    tied at the maximum.

    Scale: per-supplier revenue is one map-side-combined aggregate over
    the date-pruned fact; the max is a second aggregation over THAT
    (never a fact re-scan), broadcast as one row. Exact DECIMAL compare
    means ties are bit-deterministic cross-engine — the Q15 trap is a
    double-rounded max missing a tie."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        l.filter(
            (
                F.col("l_shipdate")
                >= F.lit(TOP_SUPP_QUARTER[0]).cast("timestamp_ntz")
            )
            & (
                F.col("l_shipdate")
                < F.lit(TOP_SUPP_QUARTER[1]).cast("timestamp_ntz")
            )
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_dec()).alias("total_rev"))
    )
    best = per_supp.agg(F.max("total_rev").alias("max_rev"))
    return (
        per_supp.join(F.broadcast(best), how="cross")
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias(
                "total_rev"
            ),
        )
    )


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested aggregate threshold + semi join): count
    per nation the suppliers that are DOMINANT on some part — shipped
    more than DOMINANT_SHARE of that part's total quantity (the Q20
    'holds most of the stock' predicate re-expressed from lineitem,
    since the schema has no partsupp.ps_availqty).

    Scale: ONE fact aggregation to (part, supp) sums; the part total is
    a window sum over the same rows (round-12 rework — previously a
    second aggregation joined back to its own input through a lineage
    cut, paying an extra exchange + sort-merge join + checkpoint write
    for numbers one window pass produces from the identical exact
    DECIMAL sums). The share filter shrinks pairs to near-nothing
    before the distinct-supplier semi reduction; nation dim broadcasts.
    All sums are exact DECIMAL so the > share comparison is
    deterministic."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias(
            "supp_qty"
        )
    )
    part_qty = (
        F.sum("supp_qty")
        .over(Window.partitionBy("l_partkey"))
        .cast("decimal(38,4)")
    )
    dominant = (
        ps.withColumn("part_qty", part_qty)
        .filter(
            F.col("supp_qty").cast("decimal(38,4)")
            > F.col("part_qty") * F.lit(DOMINANT_SHARE).cast("decimal(3,2)")
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_dominant"))
    )


FORECAST_YEAR = ("1997-01-01", "1998-01-01")
FORECAST_DISC = (0.05, 0.07)
FORECAST_QTY = 24
RETURNED_TOP = 20


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (pure scan aggregation): the revenue increase if
    discounts in FORECAST_DISC were eliminated on small-quantity 1997
    lineitems — one filtered scan, one row out.

    Scale: every predicate (date range, discount band, quantity cap)
    pushes into the parquet scan; the aggregate is a single DECIMAL sum
    with map-side combine. The simplest possible 100 TB query — its
    entire cost is I/O."""
    l = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * F.col("l_discount").cast("decimal(3,2)")
    ).cast("decimal(38,4)")
    return (
        l.filter(
            (F.col("l_shipdate")
             >= F.lit(FORECAST_YEAR[0]).cast("timestamp_ntz"))
            & (F.col("l_shipdate")
               < F.lit(FORECAST_YEAR[1]).cast("timestamp_ntz"))
            & (F.col("l_discount") >= FORECAST_DISC[0])
            & (F.col("l_discount") <= FORECAST_DISC[1])
            & (F.col("l_quantity") < FORECAST_QTY)
        )
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_returned_customer_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q10 shape (top-k customers by lost revenue): revenue of
    RETURNED lineitems per customer, top RETURNED_TOP with nation —
    the who-is-returning-the-most churn view.

    Scale: the returnflag filter pushes into the fact scan; one
    fact-fact shuffle (lineitem⋈orders on orderkey), customer/nation
    broadcast, bounded top-k via TakeOrdered. Deterministic tie-break
    on custkey."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    returned = l.filter(F.col("l_returnflag") == "R")
    return (
        returned.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(RETURNED_TOP)
    )


QUERIES = {
    "nation_trade_flows": q_nation_trade_flows,
    "market_share": q_market_share,
    "product_type_profit": q_product_type_profit,
    "delay_buckets": q_delay_buckets,
    "customer_order_distribution": q_customer_order_distribution,
    "supplier_part_counts": q_supplier_part_counts,
    "top_supplier_revenue": q_top_supplier_revenue,
    "dominant_suppliers": q_dominant_suppliers,
    "forecast_revenue": q_forecast_revenue,
    "returned_customer_revenue": q_returned_customer_revenue,
}

ORACLES = {
    "forecast_revenue": """
        SELECT CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(38,4))),
                   2) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "returned_customer_revenue": """
        SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
               n.n_name AS n_name,
               CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2))
                      - CAST(l_discount AS DECIMAL(3,2)))
                   AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "nation_trade_flows": f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
                   AS ship_year,
               CAST(round(sum({REV_DEC_SQL}), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '{TRADE_YEARS[0]}'
          AND l.l_shipdate <  TIMESTAMP '{TRADE_YEARS[1]}'
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
    """,
    "market_share": f"""
        WITH m AS (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
                       AS o_year,
                   {REV_DEC_SQL} AS rev,
                   sn.n_name AS supp_nation
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            WHERE p.p_type = '{MKT_TYPE}' AND r.r_name = '{MKT_REGION}'
        )
        SELECT o_year,
               CAST(round(sum(rev), 2) AS DOUBLE) AS total_rev,
               CAST(round(COALESCE(sum(rev) FILTER (
                   WHERE supp_nation = '{MKT_NATION}'),
                   CAST(0 AS DECIMAL(38,4))), 2) AS DOUBLE)
                   AS nation_rev,
               floor(COALESCE(CAST(sum(rev) FILTER (
                       WHERE supp_nation = '{MKT_NATION}') AS DOUBLE), 0.0)
                     / CAST(sum(rev) AS DOUBLE) * 1000000) / 1000000.0
                   AS mkt_share
        FROM m GROUP BY o_year
    """,
    "product_type_profit": f"""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
                   AS ship_year,
               CAST(round(sum({REV_DEC_SQL}
                   - CAST(CAST({COST_FACTOR} AS DECIMAL(4,2))
                          * CAST(p.p_retailprice AS DECIMAL(12,2))
                          * CAST(l.l_quantity AS DECIMAL(12,2))
                          AS DECIMAL(38,4))), 2) AS DOUBLE) AS profit,
               count(*) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%{PROFIT_NAME_TOKEN}%'
        GROUP BY 1, 2
    """,
    "delay_buckets": f"""
        SELECT CASE WHEN l.l_shipdate
                        <= o.o_orderdate + INTERVAL {DELAY_FAST_DAYS} DAY
                    THEN 'FAST' ELSE 'SLOW' END AS ship_class,
               count(*) FILTER (WHERE o.o_orderpriority
                                IN ('1-URGENT', '2-HIGH'))
                   AS critical_lines,
               count(*) FILTER (WHERE o.o_orderpriority
                                NOT IN ('1-URGENT', '2-HIGH'))
                   AS other_lines
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
    "customer_order_distribution": f"""
        WITH per_cust AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '{DISTRIB_EXCLUDED_PRIORITY}'
            GROUP BY c.c_custkey
        )
        SELECT n_orders, count(*) AS n_customers
        FROM per_cust GROUP BY n_orders
    """,
    "supplier_part_counts": f"""
        WITH pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p.p_brand AS p_brand, p.p_type AS p_type,
               p.p_size AS p_size,
               count(DISTINCT pr.l_suppkey) AS supplier_cnt
        FROM pairs pr
        JOIN part p ON pr.l_partkey = p.p_partkey
        WHERE p.p_size IN {PART_SUPP_SIZES}
          AND pr.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier
              WHERE s_acctbal < {AT_RISK_BALANCE})
        GROUP BY 1, 2, 3
    """,
    "top_supplier_revenue": f"""
        WITH per_supp AS (
            SELECT l_suppkey, sum({REV_DEC_SQL}) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{TOP_SUPP_QUARTER[0]}'
              AND l_shipdate <  TIMESTAMP '{TOP_SUPP_QUARTER[1]}'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
               CAST(round(p.total_rev, 2) AS DOUBLE) AS total_rev
        FROM per_supp p JOIN supplier s ON p.l_suppkey = s.s_suppkey
        WHERE p.total_rev = (SELECT max(total_rev) FROM per_supp)
    """,
    "dominant_suppliers": f"""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
            FROM lineitem GROUP BY 1, 2
        ),
        totals AS (
            SELECT l_partkey,
                   CAST(sum(supp_qty) AS DECIMAL(38,4)) AS part_qty
            FROM ps GROUP BY 1
        ),
        dominant AS (
            SELECT DISTINCT ps.l_suppkey
            FROM ps JOIN totals t ON ps.l_partkey = t.l_partkey
            WHERE CAST(ps.supp_qty AS DECIMAL(38,4))
                  > t.part_qty * CAST({DOMINANT_SHARE} AS DECIMAL(3,2))
        )
        SELECT n.n_name AS n_name, count(*) AS n_dominant
        FROM dominant d
        JOIN supplier s ON d.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
}
