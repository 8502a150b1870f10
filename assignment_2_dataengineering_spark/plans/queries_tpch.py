"""TPC-H-adapted relational queries over the synthetic star schema
(TESTDATA.md tables carry a TPC-H-ish subset of columns). These go
beyond the reference's operator list (SURVEY.md §2 is fully covered
elsewhere) to exercise the engine on the classic warehouse shapes a
general analytics user expects: wide aggregate scans, selective
fact-dim join trees, and multi-hop snowflake joins — the plans Catalyst
and AQE exist to optimize.

Float discipline: every SUM/AVG over double columns is rounded (2dp
sums, 4dp averages) in BOTH engines — partial-aggregation order differs
between Spark and DuckDB, so unrounded floating sums are not
bit-comparable (SCALE.md §"oracle methodology").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
    bench=True,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: one full fact scan, one hash aggregate
    on a 4-ish-cardinality key — the canonical map-side-combine query.
    The date predicate and the 7-column projection both push to the
    parquet scan; at 100 TB this is I/O-bound and embarrassingly
    parallel, the query AQE coalescing exists for."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("relational", "join"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority: selective dim filter (1/5 of
    customers) → fact join tree → top-10 by revenue. Deterministic cut:
    ORDER BY (rounded revenue, orderdate, orderkey). Both join keys are
    fact-sized, so these are shuffle joins by design — AQE picks
    broadcast for the filtered customer side when stats allow; the
    date filters push to both parquet scans. TakeOrdered(10) means the
    full result never sorts globally."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    tags=("relational", "join"),
    bench=True,  # the snowflake join-tree path in the headline set
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: snowflake join across all six
    tables with the classic s_nationkey = c_nationkey locality
    condition. region/nation/supplier are explicitly BROADCAST (true
    dims at any scale); customer-orders-lineitem shuffle on their keys.
    The year predicate pushes to the orders scan and AQE prunes the
    join tree's post-shuffle partitions."""
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])),
               F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(stddev_samp(l_discount), 6) AS sd_disc,
           round(var_samp(l_tax), 6) AS var_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates per return flag: Pearson correlation,
    sample covariance/stddev/variance — the statistical-profile family
    (CORR/COVAR/STDDEV) beyond q_profile's min/max/mean scan. All are
    single-pass co-moment aggregations (map-side partials, one
    shuffle); rounding absorbs the engines' different accumulation
    orders."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("relational", "join"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking, adapted to this schema's
    columns (no l_commitdate/l_receiptdate; the EXISTS probe is
    "shipped after the order date" instead of "received after
    commit"). The correlated EXISTS lowers to a LEFT SEMI join on
    l_orderkey with the non-equi ship>order condition attached — one
    shuffle on orderkey, the quarter filter pushed to the orders scan,
    and the lineitem side projects only (l_orderkey, l_shipdate)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    probed = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return (
        probed.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "agg"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue-change: pure scan-filter-aggregate,
    zero joins, one row out. All three predicates push to the parquet
    scan (year range as min/max ts, discount band, quantity cap) and
    the projection is two columns — the canonical I/O-bound probe that
    measures scan + pushdown quality and nothing else. The discount
    values are exact parquet doubles in both engines, so the BETWEEN
    boundary is bit-identical."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
    )


@register(
    "q_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("relational", "join"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: which customers returned the
    most revenue in a quarter. Fact-fact shuffle join orders⋈lineitem
    (returnflag filter pushed to the lineitem scan, quarter filter to
    orders), then a broadcast of nation onto the grouped customer
    rollup. Top-20 via TakeOrdered — no global sort materializes.
    Deterministic cut: ties broken by c_custkey.

    Revenue is summed as per-row floor-to-integer-cents, not
    round(sum(...), 2): at sf0.01 this sum lands on an exact half-cent
    where Spark's and DuckDB's different partial-sum orders round
    opposite ways (found by the sf0.01 verify sweep — the aggregate
    2dp round that is safe elsewhere is NOT safe here)."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("revenue_cents")
        )
        .select("c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("relational", "join"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority split, adapted (this schema has
    no l_shipmode; l_linestatus is the grouping axis). The signature
    shape survives: fact-fact equi-join, then conditional aggregation —
    two CASE-WHEN counters evaluated in one pass, no second scan and no
    pivot shuffle. Year filter pushes to the lineitem scan and only
    (orderkey, priority) survives the orders projection."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q_tpch_q14",
    oracle="""
    SELECT round(
             100.0 * round(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END), 2)
                   / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2),
             4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tags=("relational", "join"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: share of one month's revenue from
    PROMO-type parts. part is a true dimension → explicit broadcast;
    the month filter pushes to the lineitem scan; numerator and
    denominator come out of ONE aggregate (conditional sum), not two
    scans. Both sums are rounded to cents before the division so the
    ratio is computed from identical quantities in both engines."""
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2).alias(
                "__promo"
            ),
            F.round(F.sum(rev), 2).alias("__total"),
        )
        .select(
            F.round(100.0 * F.col("__promo") / F.col("__total"), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
          AND l_suppkey IS NOT NULL
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("relational", "join", "agg"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: aggregate-of-aggregate — quarterly
    revenue per supplier, then the supplier(s) hitting the global max.
    The revenue rollup is one shuffle; the global max is a 1-row scalar
    aggregate broadcast back onto the rollup (NOT a `Window.
    partitionBy()` empty-spec max, which would funnel the
    |suppliers|-cardinality rollup through a single task — round-4
    plan-audit fix). The rollup subtree appears twice in the logical
    plan, but the two exchanges are identical so ReuseExchange runs the
    fact scan + partial aggregation once. Revenue is rounded to cents
    BEFORE the max-equality test, making the float comparison exact in
    both engines."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        # explicit on BOTH branches (and in the oracle): the supplier
        # join infers it on one branch anyway; stating it at the base
        # keeps the two rollup subtrees canonically identical so
        # ReuseExchange runs the fact scan + partial agg once
        & F.col("l_suppkey").isNotNull()
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    best = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("__mx")
    )
    s = T(spark, sf_dir, "supplier")
    return (
        s.join(best, s["s_suppkey"] == best["supplier_no"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q17",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("relational", "join", "agg"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated scalar
    subquery (per-part average quantity) decorrelated by hand into a
    groupBy + equi-join — the same rewrite Catalyst/DuckDB planners do.
    Per-part averages are computed over ALL lineitems of the part (as
    in the spec), brand-filtered parts are a broadcast, and the final
    comparison l_quantity < 0.2·avg happens before the single global
    sum. Quantities are small integers stored as doubles, so 0.2·avg
    is bit-identical across engines."""
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = T(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__qty_cut")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(per_part, li["l_partkey"] == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q_tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    tags=("relational", "join", "agg"),
    bench=True,  # pre-aggregated HAVING semi-join path
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds 300. The HAVING subquery is a pre-aggregation of lineitem
    on orderkey; qualifying orderkeys are rare (~0.3% of orders), and
    — the round-6 fold — the pre-aggregate ALREADY IS the per-order
    quantity sum the textbook plan re-joins lineitem to recompute:
    sum(l_quantity) over a qualifying order's joined lineitems equals
    the __q that qualified it. Carrying __q through deletes the second
    600M-row lineitem join AND the final re-aggregation; the fact
    table is scanned once, the tiny qualifying set rides AQE broadcast
    into the orders and customer joins. Measured honestly at sf100:
    ~70 → ~57 s — the wall is dominated by the HAVING aggregate itself
    (~40 s for the 600M-row scan + near-unique-key exchange), which no
    rewrite removes; the fold's value is the deleted second fact scan,
    which on cluster storage (no page cache hiding re-reads) is the
    larger term. Ties
    on o_totalprice cut deterministically by orderkey. Value-identical
    to the re-join form the DuckDB oracle runs: quantities sum over
    the same row set either way."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
    )
    o_big = o.join(big, o["o_orderkey"] == big["l_orderkey"])
    return (
        c.join(o_big, c["c_custkey"] == o_big["o_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("__q"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q_tpch_q19",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("relational", "join"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted-revenue (disjunctive predicates), adapted
    to this schema's part columns (no shipmode/shipinstruct legs). The
    planner-relevant shape survives: an OR of three conjunctive
    brand/size/quantity envelopes straddling the join. Both engines
    keep the join an equi-join on partkey and evaluate the disjunction
    as a post-join filter; the derivable part-side envelope
    (brand ∈ {1,2,3}) is pushed into the broadcast dimension here so
    the hash table holds only candidate parts."""
    leg = lambda b, smax, qlo, qhi: (
        (F.col("p_brand") == b)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    p = T(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(leg("Brand#1", 15, 1, 21) | leg("Brand#2", 25, 10, 30) | leg("Brand#3", 35, 20, 40))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_tpch_q22",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("relational", "join", "agg"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity, adapted (no phone prefixes;
    nations play the country-code role, and "never placed an urgent
    order" replaces "never ordered" — every above-average customer here
    has some order). Shape preserved exactly: scalar aggregate subquery
    (broadcast one-row cross join), LEFT ANTI join against the filtered
    orders side, broadcast dim rollup. The anti-join's orders side
    prunes to urgent-only rows before the shuffle."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    urgent = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .drop("__avg_bal")
    )
    return (
        rich.join(urgent, rich["c_custkey"] == urgent["o_custkey"], "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Full-suite completion: the nine TPC-H queries whose canonical text needs
# the partsupp table or columns this synthetic schema lacks. The adaptation
# contract (documented per query) is: derive the part–supplier relation from
# lineitem itself — every (l_partkey, l_suppkey) pair that ever traded is a
# partsupp row, its supply cost is the cheapest observed unit price
# round(min(l_extendedprice / l_quantity), 2), and its "availability" is the
# total quantity ever shipped. min() is order-independent and the division
# is computed identically in both engines, so the derived columns are
# bit-comparable without any sum-order caveat; quantities are integer-valued
# doubles, so their sums are exact in FP regardless of aggregation order.
# ---------------------------------------------------------------------------

_PARTSUPP_CTE = """
    partsupp AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               sum(l_quantity) AS ps_availqty
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem-derived partsupp relation (see block comment above).
    One hash aggregate on (partkey, suppkey): at 100 TB this is a single
    shuffle of two int keys + two doubles, and any query that consumes it
    more than once should persist it as a bucketed table
    (sources/io.py write_bucketed) rather than re-deriving."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_availqty"),
    )


@register(
    "q_tpch_q2",
    oracle="""
    WITH """ + _PARTSUPP_CTE + """
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           ps.ps_supplycost
    FROM part p
    JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
            SELECT min(ps2.ps_supplycost)
            FROM partsupp ps2
            JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("relational", "join"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier, on the lineitem-derived partsupp
    (p_mfgr/address/phone/comment columns don't exist here, so the
    output is the columns the schema has; the '%BRASS' type filter
    becomes p_type = 'LARGE'). The correlated min-subquery decorrelates
    into a window min over each part's EUROPE offers — no second scan
    of partsupp, no self-join: filter part first (6-ish rows after
    size+type), semi-reduce the derived partsupp against it, then one
    window over a tiny partition. Supplier/nation/region are broadcast.
    The sort key chain (acctbal DESC, nation, supplier, part) is a
    total order, so LIMIT 100 is deterministic."""
    from pyspark.sql import Window

    p = (
        T(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        derived_partsupp(spark, sf_dir)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        offers.withColumn("__min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("__min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("relational", "join"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations (nation names
    adapted to the synthetic NATION_k domain). The disjunctive
    two-nation predicate is applied AFTER both nation joins — but both
    nation joins are broadcasts, so the filter is evaluated inside the
    fact-scan stage and the only shuffles are the two fact-fact joins
    (lineitem⋈orders on orderkey, ⋈customer on custkey). The shipdate
    window pushes to the lineitem scan. The supplier side filters to
    2/25 of suppliers before its broadcast join."""
    s = T(spark, sf_dir, "supplier")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n_pair = n.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        s.join(F.broadcast(n_pair), s["s_nationkey"] == n_pair["n_nationkey"])
        .select(F.col("s_suppkey"), F.col("n_name").alias("supp_nation"))
    )
    cust = (
        c.join(F.broadcast(n_pair), c["c_nationkey"] == n_pair["n_nationkey"])
        .select(F.col("c_custkey"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           round(round(sum(CASE WHEN nation = 'NATION_3' THEN volume
                           ELSE 0 END), 2)
                 / round(sum(volume), 2), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("relational", "join"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_3's slice of AMERICA's
    PROMO-part import volume by order year. Seven-table join tree where
    every dimension (part 1/6, supplier+nation, customer-nation-region
    1/5) is broadcast — the only shuffle is lineitem⋈orders. Numerator
    and denominator come from one conditional aggregate, both rounded
    to cents before the division (Q14 discipline) so the 6dp share is
    identical in both engines."""
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    am_cust = (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(am_cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)), 2
            ).alias("__nat"),
            F.round(F.sum(vol), 2).alias("__tot"),
        )
        .select(
            "o_year",
            F.round(F.col("__nat") / F.col("__tot"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q_tpch_q9",
    oracle="""
    WITH """ + _PARTSUPP_CTE + """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - ps.ps_supplycost * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                        AND ps.ps_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE 'red %'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("relational", "join"),
    bench=True,  # widest join tree in the suite: derive + 5-way join + agg
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit, with supply cost from the derived
    partsupp (cheapest observed unit price per part–supplier pair) and
    the '%green%' name probe adapted to this generator's 'red %'
    adjective. Two plan rewrites vs the naive derive-and-join-back:
    (1) the part filter (1/12 of parts) COMMUTES with the (l_partkey,
    l_suppkey) grouping — a part's lineitems are exactly the rows that
    derive its partsupp entries — so only the filtered fact feeds the
    cost derivation; (2) the derivation itself is a window min over
    (l_partkey, l_suppkey) instead of a groupBy + equi-join back at
    the same grain, which deletes the second lineitem scan AND the
    join: one fact scan, one shuffle for the window, one for the final
    (nation, year) rollup. orders supplies only the year column;
    nation rides the supplier broadcast."""
    from pyspark.sql import Window

    p = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(p.select(F.col("p_partkey").alias("__pk"))),
            F.col("l_partkey") == F.col("__pk"),
            "left_semi",
        )
        .withColumn(
            "ps_supplycost",
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).over(
                Window.partitionBy("l_partkey", "l_suppkey")
            ),
        )
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                T(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH """ + _PARTSUPP_CTE + """,
    natps AS (
        SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS v
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_0'
    )
    SELECT ps_partkey, round(sum(v), 2) AS value
    FROM natps
    GROUP BY ps_partkey
    HAVING round(sum(v), 2) > (SELECT round(sum(v) * 0.001, 2) FROM natps)
    ORDER BY value DESC, ps_partkey
    """,
    tags=("relational", "join", "agg"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: parts whose NATION_0 inventory value
    (derived supplycost × availability) exceeds 0.1% of the nation's
    total. The scalar threshold subquery decorrelates into a one-row
    broadcast cross join — computed from the PER-PART aggregate, not
    from natps directly: Σ_parts sum(v) ≡ Σ v, and routing the total
    through the (tiny) per-part table gives the expensive
    lineitem-derived partsupp exchange a single consumer chain.
    (Round 6: the previous both-aggregates-over-natps form relied on
    AQE exchange reuse that never fired — the two branches prune
    different columns below the exchange, so the plans differ and the
    600M-row derivation + scan ran TWICE at sf100.) Both comparison
    sides are rounded to cents first (Q14 discipline) so the HAVING
    cut is identical in both engines. At 100 TB the per-part aggregate
    and the grand total are the same single shuffle width: two doubles
    per part–supplier pair."""
    ps = derived_partsupp(spark, sf_dir)
    nat_supp = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    natps = ps.join(
        F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"))
    vals = natps.groupBy("ps_partkey").agg(F.sum("v").alias("__raw"))
    total = vals.agg(F.round(F.sum("__raw") * 0.001, 2).alias("__threshold"))
    return (
        vals.select("ps_partkey", F.round(F.col("__raw"), 2).alias("value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__threshold"))
        .drop("__threshold")
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("relational", "join", "agg"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution ("not like
    '%special%requests%'" adapted to the priority column: non-urgent
    orders only). The left outer join keeps order-less customers at
    c_count = 0 — count(o_orderkey) counts non-null keys only, the
    classic outer-join-then-count pattern. Two aggregates: the first
    shuffles on custkey (same key as the join, so AQE coalesces into
    the join exchange), the second is a tiny distribution rollup."""
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_tpch_q16",
    oracle="""
    WITH """ + _PARTSUPP_CTE + """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.ps_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("relational", "join", "agg"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship, on the derived partsupp.
    The "customer complaints" comment probe (no comment column here)
    becomes a low-account-balance exclusion; brand/type/size filters
    keep the canonical shape. The NOT IN lowers to a LEFT ANTI join —
    safe because s_suppkey is never null — against a broadcast
    excluded-supplier list; count(DISTINCT suppkey) is a two-phase
    partial-distinct aggregate, no extra exchange beyond the
    (brand, type, size) shuffle."""
    ps = derived_partsupp(spark, sf_dir)
    p = (
        T(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 500)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q_tpch_q20",
    oracle="""
    WITH """ + _PARTSUPP_CTE + """,
    shipped AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty98
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_0'
      AND s.s_suppkey IN (
            SELECT ps.ps_suppkey
            FROM partsupp ps
            JOIN part p ON p.p_partkey = ps.ps_partkey
                       AND p.p_name LIKE 'small %'
            JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                           AND sh.l_suppkey = ps.ps_suppkey
            WHERE ps.ps_availqty > 0.5 * sh.qty98)
    ORDER BY s.s_name
    """,
    tags=("relational", "join"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion, adapted: "availability"
    is the derived all-time shipped quantity, and the promotion window
    is calendar 1998 — suppliers of 'small %' parts in NATION_0 whose
    total stock exceeds half of what they moved in 1998. The
    correlated quantity subquery decorrelates into CONDITIONAL
    aggregation over ONE (partkey, suppkey) grouping — both sums (the
    all-time availability and the 1998 window) come out of the same
    pass, so lineitem is scanned and exchanged ONCE where the
    two-aggregates-joined form scanned it twice (round-6 fold; the
    small-parts filter also commutes with the partkey grouping, so the
    broadcast semi-join prunes 11/12 of the fact BEFORE the
    aggregate). Quantities are integer-valued doubles: both sums
    are exact in FP, so the > comparison needs no rounding guard.
    Suppliers with no 1998 shipments are excluded by the null
    conditional sum, matching SQL's NULL-comparison semantics for an
    empty correlated sum (and the inner join of the unfused form)."""
    small_parts = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").join(
        F.broadcast(small_parts),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    in98 = (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp")
    )
    qualifying = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("ps_availqty"),
            F.sum(F.when(in98, F.col("l_quantity"))).alias("qty98"),
        )
        .filter(
            F.col("qty98").isNotNull()
            & (F.col("ps_availqty") > 0.5 * F.col("qty98"))
        )
        .select(F.col("l_suppkey").alias("ps_suppkey"))
    )
    nat = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    return (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_0'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("relational", "join"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting, adapted to this
    schema's clock: "late" is shipping more than 60 days after the
    order date (no commit/receipt dates exist). The EXISTS / NOT
    EXISTS pair does NOT become two extra joins of lineitem to itself:
    both collapse into one per-order profile — countDistinct(supplier)
    and countDistinct(supplier WHERE late) over the F-status orders —
    computed in a single aggregate on the orderkey partitioning the
    main join already needs. A late l1 row qualifies iff the order has
    >1 supplier and exactly 1 late one (necessarily l1's). That turns
    O(|lineitem|²) correlated probes into one extra shuffle-free pass."""
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    supp = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    o_f = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    li_f = li.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
    profile = li_f.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("__n_late"),
    )
    return (
        li_f.filter(late)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            profile.filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1)),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
