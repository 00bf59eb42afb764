"""Classic analytics, part 2 — the remaining TPC-H query shapes the
synthetic star schema can express (SURVEY §2.H).  Together with
tpch_queries.py this covers every TPC-H pattern that does not need the
``partsupp`` table or the lineitem ship-mode/commit-date columns the
testdata lacks: Q6 (selective scan-sum), Q7 (nation-pair volume), Q8
(market share ratio), Q10 (returned-item top-k), Q13 (distribution of
counts incl. zero via left join), Q14 (conditional-percentage), Q17
(per-part avg threshold), Q18 (having-subquery top-k), Q22 (dormant
rich customers: anti-join + global-threshold comparison).

Determinism conventions (same as tpch_queries.py): money sums run in
DECIMAL(18,4) on both engines and surface as DOUBLE; ratios divide two
exact decimal sums only after casting each to DOUBLE (IEEE division of
identical operands); threshold comparisons against an average are
rewritten multiplicatively (``x * cnt > total``) so no engine-specific
decimal-division scale rule enters the predicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.registry import register
from graphraft_spark.sources.pq_cache import load_pq


def _dec(c):
    return F.col(c).cast("decimal(18,4)")


def _disc_price():
    return _dec("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")


@register(
    "q_forecast_revenue",  # promoted r12 (seventh wave)
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: no join at all — three pushable predicates and a
    two-column projection; the whole query is one parquet scan plus a
    partial+final agg (map-side combine, single-row shuffle)."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_nation_pair_volume", extra=True,
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       strftime(l.l_shipdate, '%Y') AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, strftime(l.l_shipdate, '%Y')
""")
def q_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between distinct nation pairs by
    year.  Both nation dims and the supplier dim broadcast; the only
    shuffles are the two fact-side equijoins and the final agg."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    s = load_pq(spark, f"{sf_dir}/supplier.parquet")
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    c = load_pq(spark, f"{sf_dir}/customer.parquet")
    n = load_pq(spark, f"{sf_dir}/nation.parquet")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_name").alias("cust_nation"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast(
                "timestamp_ntz")))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.date_format("l_shipdate", "yyyy").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("volume"))
    )


@register(
    "q_market_share", extra=True,
    oracle="""
SELECT l_year,
       CAST(nation_volume AS DOUBLE) / CAST(total_volume AS DOUBLE)
           AS mkt_share
FROM (
    SELECT strftime(o.o_orderdate, '%Y') AS l_year,
           SUM(CASE WHEN n1.n_name = 'NATION_5'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * CAST(1 - l.l_discount AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS nation_volume,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS total_volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY strftime(o.o_orderdate, '%Y')
)
""")
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of yearly revenue
    shipped into one region.  The share is a ratio of two exact decimal
    sums computed in the SAME aggregate (conditional numerator), cast to
    double only for the final IEEE division — bitwise identical on both
    engines."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    s = load_pq(spark, f"{sf_dir}/supplier.parquet")
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    c = load_pq(spark, f"{sf_dir}/customer.parquet")
    n = load_pq(spark, f"{sf_dir}/nation.parquet")
    r = load_pq(spark, f"{sf_dir}/region.parquet")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_regionkey").alias("n2_region"))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("l_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5",
                         _disc_price()).otherwise(zero))
            .alias("nation_volume"),
            F.sum(_disc_price()).alias("total_volume"),
        )
        .select(
            "l_year",
            (F.col("nation_volume").cast("double")
             / F.col("total_volume").cast("double")).alias("mkt_share"))
    )


@register(
    "q_returned_items", extra=True,
    oracle="""
SELECT c.c_custkey, ANY_VALUE(c.c_name) AS c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       CAST(ANY_VALUE(c.c_acctbal) AS DOUBLE) AS c_acctbal,
       ANY_VALUE(n.n_name) AS n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey
ORDER BY revenue DESC, c.c_custkey LIMIT 20
""")
def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: customers who returned the most revenue in one
    quarter — selective order-date window, returnflag filter pushed to
    the lineitem scan, top-20 via TakeOrderedAndProject."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    c = load_pq(spark, f"{sf_dir}/customer.parquet")
    n = load_pq(spark, f"{sf_dir}/nation.parquet")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o.filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast(
                "timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast(
                "timestamp_ntz"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_name").alias("c_name"),
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.any_value("c_acctbal").cast("double").alias("c_acctbal"),
            F.any_value("n_name").alias("n_name"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_customer_distribution", extra=True,
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY c_count
""")
def q_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts
    INCLUDING zero-order customers — the left join keeps them and
    COUNT(o_orderkey) ignores the null rows, exactly the classic
    trap this query exists to test."""
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    c = load_pq(spark, f"{sf_dir}/customer.parquet")
    return (
        c.join(o.filter(F.col("o_orderpriority") != "1-URGENT"),
               F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q_promo_revenue", extra=True,
    oracle="""
SELECT CAST(promo AS DOUBLE) * 100.0 / CAST(total AS DOUBLE)
           AS promo_revenue_pct
FROM (
    SELECT SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * CAST(1 - l.l_discount AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS total
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
)
""")
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: share of one month's revenue from promo parts —
    conditional numerator and unconditional denominator in one
    aggregate over a broadcast part join."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    p = load_pq(spark, f"{sf_dir}/part.parquet")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast(
                "timestamp_ntz")))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _disc_price())
                  .otherwise(zero)).alias("promo"),
            F.sum(_disc_price()).alias("total"),
        )
        .select(
            (F.col("promo").cast("double") * F.lit(100.0)
             / F.col("total").cast("double")).alias("promo_revenue_pct"))
    )


@register(
    "q_small_qty_revenue", extra=True,
    oracle="""
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
    SELECT l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_partkey
) a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND CAST(l.l_quantity AS DECIMAL(18,4)) * 5 * a.cnt < a.sum_qty
""")
def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity.  The avg threshold is rewritten multiplicatively
    (``qty * 5 * cnt < sum_qty`` over exact decimals) so neither
    engine's decimal-division scale rule touches the predicate; the
    per-part aggregate joins back to the fact on the same key (one
    shuffle, reused partitioning under AQE)."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    p = load_pq(spark, f"{sf_dir}/part.parquet")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"),
             F.count("*").alias("cnt")))
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#13")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double").alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_large_volume_customers", extra=True,
    oracle="""
SELECT c.c_custkey, ANY_VALUE(c.c_name) AS c_name, o.o_orderkey,
       strftime(ANY_VALUE(o.o_orderdate), '%Y-%m-%d') AS o_orderdate_s,
       CAST(ANY_VALUE(o.o_totalprice) AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 210
)
GROUP BY c.c_custkey, o.o_orderkey
ORDER BY CAST(ANY_VALUE(o.o_totalprice) AS DOUBLE) DESC, o.o_orderkey
LIMIT 25
""")
def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity clears a threshold
    (HAVING subquery → semi join), re-joined to customer detail, top-25
    by order price.  The qty threshold compares exact decimals."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    c = load_pq(spark, f"{sf_dir}/customer.parquet")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_okey"))
        .agg(F.sum(_dec("l_quantity")).alias("big_qty"))
        .filter(F.col("big_qty") > F.lit(210).cast("decimal(18,4)"))
        .select("big_okey"))
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_okey"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            F.any_value("c_name").alias("c_name"),
            F.date_format(F.any_value("o_orderdate"), "yyyy-MM-dd")
            .alias("o_orderdate_s"),
            F.any_value("o_totalprice").cast("double").alias("o_totalprice"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "q_dormant_rich_customers",  # promoted r12 (seventh wave)
    oracle="""
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer c
CROSS JOIN (
    SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS total, COUNT(*) AS cnt
    FROM customer WHERE c_acctbal > 0
) t
WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) * t.cnt > t.total
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c.c_nationkey
""")
def q_dormant_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers richer than the positive-balance
    average with no RECENT order (none since 1999 — the synthetic data
    has near-zero never-ordered customers, so the classic "no orders at
    all" predicate would green-pass on an empty result, which proves
    nothing).  A single-row broadcast of the global (sum, count), a
    multiplicative above-average predicate on exact decimals, and a
    left-anti join against the filtered orders; grouped by nation in
    lieu of the reference's phone country code (column absent)."""
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    c = load_pq(spark, f"{sf_dir}/customer.parquet")
    stats = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(_dec("c_acctbal")).alias("total"),
             F.count("*").alias("cnt")))
    return (
        c.join(F.broadcast(stats))
        .filter(_dec("c_acctbal") * F.col("cnt") > F.col("total"))
        .join(o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast(
                  "timestamp_ntz")),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"))
    )


@register(
    "q_setops_customers", extra=True,
    oracle="""
SELECT 'both_years' AS cohort, COUNT(*) AS n FROM (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
)
UNION ALL
SELECT 'churned' AS cohort, COUNT(*) AS n FROM (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
)
""")
def q_setops_customers(spark, sf_dir):
    """Set-operation coverage (§2.H): INTERSECT (retained customers)
    and EXCEPT (churned customers) between two order-year cohorts —
    the native DataFrame set ops, which Catalyst plans as
    distinct+semi/anti joins (AQE picks broadcast when a cohort is
    small)."""
    o = load_pq(spark, f"{sf_dir}/orders.parquet")

    def cohort(y0, y1):
        return (o.filter(
            (F.col("o_orderdate") >= F.lit(y0).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(y1).cast("timestamp_ntz")))
            .select("o_custkey").distinct())

    c96 = cohort("1996-01-01", "1997-01-01")
    c97 = cohort("1997-01-01", "1998-01-01")
    both = c96.intersect(c97).agg(F.count("*").alias("n")) \
        .select(F.lit("both_years").alias("cohort"), "n")
    churn = c96.exceptAll(c97).agg(F.count("*").alias("n")) \
        .select(F.lit("churned").alias("cohort"), "n")
    return both.unionByName(churn)


@register(
    "q_order_gaps", extra=True,
    oracle="""
SELECT quartile,
       COUNT(*) AS n_gaps,
       MIN(gap_days) AS min_gap,
       MAX(gap_days) AS max_gap
FROM (
    SELECT gap_days, NTILE(4) OVER (ORDER BY gap_days, o_orderkey)
               AS quartile
    FROM (
        SELECT o_orderkey,
               epoch_us(o_orderdate) // 86400000000
                 - LAG(epoch_us(o_orderdate) // 86400000000)
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS gap_days
        FROM orders
    )
    WHERE gap_days IS NOT NULL
)
GROUP BY quartile
""")
def q_order_gaps(spark, sf_dir):
    """LAG + NTILE coverage (§2.H windows): per-customer days between
    consecutive orders, bucketed into global quartiles.  The gap uses
    exact integer day arithmetic; NTILE's order has the orderkey
    tiebreak so bucket boundaries are deterministic.  The per-customer
    LAG partitions by custkey (state stays in-partition); only the
    NTILE needs a global sort — at fleet scale swap it for
    percent_rank-over-ranges or the GK sketch (ops/sketches.py)."""
    from pyspark.sql import Window

    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    day = (F.unix_micros(F.col("o_orderdate").cast("timestamp_ltz"))
           - F.pmod(F.unix_micros(F.col("o_orderdate").cast(
               "timestamp_ltz")), F.lit(86400000000))) / F.lit(86400000000)
    day = day.cast("bigint")
    per_cust = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey")
    gaps = (o.select("o_orderkey", "o_custkey", "o_orderdate",
                     day.alias("day"))
            .withColumn("gap_days",
                        F.col("day") - F.lag("day").over(per_cust))
            .filter(F.col("gap_days").isNotNull()))
    quart = Window.orderBy("gap_days", "o_orderkey")
    return (gaps.withColumn("quartile", F.ntile(4).over(quart))
            .groupBy("quartile")
            .agg(F.count("*").alias("n_gaps"),
                 F.min("gap_days").alias("min_gap"),
                 F.max("gap_days").alias("max_gap")))


@register(
    "q_copurchase_pairs", extra=True,
    oracle="""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n_orders DESC, part_a, part_b
LIMIT 15
""")
def q_copurchase_pairs(spark, sf_dir):
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top-15.  The self-join is keyed by order id, so pair blowup
    is bounded by the per-order basket size squared (single digits),
    never corpus²  — the co-occurrence-projection shape that stays
    linear at fleet scale; dedup-first keeps multiplicity out of the
    counts."""
    li = (load_pq(spark, f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct())
    a = li.select(F.col("l_orderkey").alias("okey"),
                  F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("okey"),
                  F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, ["okey"])
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(15)
    )


@register(
    "q_zorder_key", extra=True,
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, zkey
FROM (
    SELECT o_orderkey, __ZK__ AS zkey FROM orders
)
ORDER BY zkey, o_orderkey LIMIT 500
""".replace("__ZK__", __import__(
        "graphraft_spark.ops.layout", fromlist=["zorder_key_sql"]
    ).zorder_key_sql(["(o_custkey % 65536)", "(o_orderkey % 65536)"])))
def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over (custkey, orderkey) — the
    multi-dimension file-skipping layout (Delta OPTIMIZE ZORDER BY
    shape; ops/layout.py).  Pure shift/mask arithmetic, replayed
    bit-for-bit by the oracle; write path covered by
    tests/test_layout.py's min/max-tightness property."""
    from graphraft_spark.ops.layout import with_zorder_key

    o = load_pq(spark, f"{sf_dir}/orders.parquet").select(
        (F.col("o_custkey") % 65536).alias("a"),
        (F.col("o_orderkey") % 65536).alias("b"),
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"))
    return (with_zorder_key(o, ["a", "b"])
            .orderBy("zkey", "o_orderkey")
            .select("o_orderkey", "zkey").limit(500))


@register(
    "q_disjunctive_revenue", extra=True,
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4)
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
""")
def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, OR-of-AND predicate
    blocks): the disjunction mixes part-side and lineitem-side
    conditions, so Catalyst must split it — the part-only disjunct
    (brand IN ...) pushes into the dimension scan, the mixed residual
    evaluates post-join.  Decimal-exact aggregate; the join stays a
    broadcast hash join on partkey."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    p = load_pq(spark, f"{sf_dir}/part.parquet")
    j = li.join(p, li.l_partkey == p.p_partkey)
    blk = lambda brand, s0, s1, q0, q1: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1))
    disc = F.col("l_extendedprice").cast("decimal(18,4)") \
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    return (j.filter(blk("Brand#1", 1, 15, 1, 20)
                     | blk("Brand#2", 10, 30, 10, 35)
                     | blk("Brand#3", 20, 50, 20, 50))
            .agg(F.round(F.sum(disc), 4).cast("double").alias("revenue"),
                 F.count("*").alias("n_lines")))


@register(
    "q_min_price_supplier", extra=True,  # promoted r11; demoted r13
    oracle="""
SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
       CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(18,4)), 4)
            AS DOUBLE) AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_type = 'PROMO'
  AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                           FROM lineitem l2
                           WHERE l2.l_partkey = p.p_partkey)
""")
def q_min_price_supplier(spark, sf_dir):
    """TPC-H Q2 shape (correlated scalar-MIN subquery): for every PROMO
    part, the supplier(s) shipping it at the part's minimum observed
    price.  The oracle keeps the textbook correlated subquery; the
    engine DE-CORRELATES it the scalable way — one per-part MIN
    aggregate (map-side combined) joined back on the part key, so the
    'subquery' is a broadcastable aggregate instead of a per-row probe.
    MIN over doubles is order-independent ⇒ equality survives the
    engine swap; price output is decimal-rounded.

    The de-correlated aggregate is a WINDOW MIN over the part key, not
    a groupBy-then-join-back: the join-back formulation plans the
    lineitem scan TWICE (once raw, once under the aggregate — Catalyst
    does not share the subtree), while the window computes the min
    inside the single partkey shuffle every 100 TB plan pays anyway.
    The PROMO restriction joins lineitem to the (broadcast) dimension
    BEFORE the window (r11): partkey determines the part, so dropping
    whole non-PROMO partitions under a partkey-partitioned MIN cannot
    change any surviving partition's min — and the window shuffle now
    carries only PROMO-part rows instead of the full fact table.  One
    inner join (not semi-then-rejoin) so PART is scanned once."""
    from pyspark.sql import Window

    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    p = load_pq(spark, f"{sf_dir}/part.parquet") \
        .filter(F.col("p_type") == "PROMO")
    s = load_pq(spark, f"{sf_dir}/supplier.parquet")
    li = (li.select("l_partkey", "l_suppkey", "l_extendedprice")
          .join(F.broadcast(p.select("p_partkey", "p_name")),
                F.col("l_partkey") == F.col("p_partkey")))
    li = li.withColumn(
        "_minp",
        F.min("l_extendedprice").over(Window.partitionBy("l_partkey")))
    return (li.filter(F.col("l_extendedprice") == F.col("_minp"))
            .join(s, li.l_suppkey == s.s_suppkey)
            .select("p_partkey", "p_name", "s_suppkey", "s_name",
                    F.round(F.col("l_extendedprice").cast("decimal(18,4)"),
                            4).cast("double").alias("min_price"))
            .distinct())


@register(
    "q_nation_profit", extra=True,  # demoted r13 (eighth wave)
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                 - CAST(l.l_quantity AS DECIMAL(18,4))), 4)
            AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
""")
def q_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-profit snowflake: lineitem at the center
    of a 4-dimension join, LIKE filter on the part name, group by
    nation x order-year).  The p_name LIKE pushes into the part scan;
    part/supplier/nation broadcast; the orders join is the only big-big
    edge and AQE picks its side.  Profit uses quantity as the unit cost
    stand-in (no partsupp table in this corpus) — decimal-exact."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    p = load_pq(spark, f"{sf_dir}/part.parquet") \
        .filter(F.col("p_name").like("%red%"))
    s = load_pq(spark, f"{sf_dir}/supplier.parquet")
    n = load_pq(spark, f"{sf_dir}/nation.parquet")
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    profit = (F.col("l_extendedprice").cast("decimal(18,4)")
              * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
              - F.col("l_quantity").cast("decimal(18,4)"))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(n, s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(F.sum(profit), 4).cast("double")
                 .alias("profit")))


@register(
    "q_top_supplier", extra=True,  # demoted r12 (green r10-r11)
    oracle="""
WITH rev AS (
    SELECT l_suppkey,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4)
               AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_rev AS DOUBLE) AS total_rev
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
""")
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier via a revenue 'view' + scalar-MAX
    subquery, ties kept).  The revenue aggregate is LAZILY
    localCheckpoint'd: Catalyst plans the max branch and the filter
    branch over the same RDD, so lineitem is scanned ONCE (verified in
    the executed plan — the naive two-branch formulation duplicates
    the whole pushed-down scan+aggregate; AQE does NOT collapse it
    because the max side carries an extra aggregate above the
    exchange).  The max is a 1-row broadcast.  Decimal-exact revenue
    makes the equality comparison engine-portable — the textbook
    formulation's float revenue would be a hash-stability bug.  The
    OUTPUT column is cast to double (r10 verdict: decimal pandas
    objects stringify with trailing zeros and hash-diverge from the
    oracle's float64 even when numerically identical)."""
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    s = load_pq(spark, f"{sf_dir}/supplier.parquet")
    rev = (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz")))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))), 4)
            .alias("total_rev"))
        .localCheckpoint(eager=False))
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("_mx"))
            .join(s, rev.l_suppkey == s.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_rev")))


@register(
    "q_lonely_late_supplier", extra=True,  # promoted r11; demoted r13
    oracle="""
WITH li AS (
    SELECT l.l_orderkey, l.l_suppkey,
           MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_orderkey, l.l_suppkey
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM li l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.late = 1
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late = 1)
GROUP BY s.s_name
""")
def q_lonely_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape (the sole-blame supplier: late in a
    multi-supplier order where EVERY other supplier shipped on time —
    EXISTS + NOT EXISTS double correlation; 'late' adapted to
    l_shipdate > o_orderdate + 60 days, this corpus has no
    commit/receipt dates).  The engine replaces both correlated
    existentials with ONE per-order aggregate — n_suppliers >= 2 and
    n_late == 1 are exactly EXISTS(other) and NOT EXISTS(other late) —
    turning two per-row probes into a single keyed shuffle, the
    standard decorrelation a 100 TB plan needs.

    The per-order totals are WINDOW aggregates over the per-supplier
    frame, not a groupBy-then-join-back: the join-back formulation
    plans the whole lineitem⋈orders+aggregate subtree TWICE (Catalyst
    does not share it), while the window computes both counts inside
    one orderkey shuffle of the already-aggregated rows.

    That shuffle is established ONCE, before the groupBy: repartition
    by l_orderkey satisfies BOTH the (l_orderkey, l_suppkey) aggregate
    (hash on a subset of the grouping keys still co-locates every
    group) and the per-order window, collapsing the old
    groupBy-exchange + window-exchange pair into one (guide §2.4).
    Nothing is lost map-side: (l_orderkey, l_suppkey) is nearly unique
    per lineitem row, so the partial aggregate never compressed the
    exchange anyway — measured 0.69× on the line (interleaved
    in-process pairs, rows identical)."""
    from pyspark.sql import Window

    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    s = load_pq(spark, f"{sf_dir}/supplier.parquet")
    per_supp = (li.join(o, li.l_orderkey == o.o_orderkey)
                .repartition(F.col("l_orderkey"))
                .groupBy("l_orderkey", "l_suppkey")
                .agg(F.max(
                    (F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                    .cast("int")).alias("late")))
    w = Window.partitionBy("l_orderkey")
    return (per_supp
            .withColumn("n_supp", F.count("*").over(w))
            .withColumn("n_late", F.sum("late").over(w))
            .filter((F.col("late") == 1) & (F.col("n_supp") >= 2)
                    & (F.col("n_late") == 1))
            .join(s, F.col("l_suppkey") == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait")))


@register(
    "q_order_gaps_scalable",  # promoted r13 (eighth wave)
    oracle="""
SELECT quartile,
       COUNT(*) AS n_gaps,
       MIN(gap_days) AS min_gap,
       MAX(gap_days) AS max_gap
FROM (
    SELECT gap_days, NTILE(4) OVER (ORDER BY gap_days, o_orderkey)
               AS quartile
    FROM (
        SELECT o_orderkey,
               epoch_us(o_orderdate) // 86400000000
                 - LAG(epoch_us(o_orderdate) // 86400000000)
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS gap_days
        FROM orders
    )
    WHERE gap_days IS NOT NULL
)
GROUP BY quartile
""")
def q_order_gaps_scalable(spark, sf_dir):
    """The fleet-scale form q_order_gaps' docstring names: the SAME
    global quartiles (the oracle IS the NTILE form) with no global
    sort — ops/quantile.py exact_ntile derives each gap's exact global
    rank from the gap-value histogram (the only global window runs
    over that bounded frame; gap_days at any corpus size has at most
    ~2,500 distinct values — order dates span years, not eons) plus a
    per-VALUE partitioned row_number, then applies NTILE's own split
    arithmetic.  The per-customer LAG stays partitioned by custkey as
    before."""
    from pyspark.sql import Window

    from graphraft_spark.ops.quantile import exact_ntile

    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    day = (F.unix_micros(F.col("o_orderdate").cast("timestamp_ltz"))
           - F.pmod(F.unix_micros(F.col("o_orderdate").cast(
               "timestamp_ltz")), F.lit(86400000000))) / F.lit(86400000000)
    day = day.cast("bigint")
    per_cust = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey")
    gaps = (o.select("o_orderkey", "o_custkey", "o_orderdate",
                     day.alias("day"))
            .withColumn("gap_days",
                        F.col("day") - F.lag("day").over(per_cust))
            .filter(F.col("gap_days").isNotNull()))
    tiled = exact_ntile(gaps, "gap_days", "o_orderkey", 4,
                        out_col="quartile")
    return (tiled.groupBy("quartile")
            .agg(F.count("*").alias("n_gaps"),
                 F.min("gap_days").alias("min_gap"),
                 F.max("gap_days").alias("max_gap")))
