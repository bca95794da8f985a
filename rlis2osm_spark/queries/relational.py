"""Core relational queries (scan/filter/agg/join/union/explode breadth —
SURVEY §2.1 S1, §2.5, §2.6). Aggregates use decimal casts so results are
bit-deterministic across Spark and DuckDB (double-sum order would not be).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rlis2osm_spark.queries.util import load

# exact-arithmetic conventions: prices/qty -> DECIMAL(10,2), rates (disc,
# tax) -> DECIMAL(4,2); (1±rate) -> (5,2); price*(5,2) -> (16,4) exact;
# charge (16,4)*(5,2) -> (22,6) exact. NO intermediate down-casts — Spark's
# HALF_UP vs DuckDB's binary rounding would disagree on .xx5 ties.
D = "decimal(18,2)"
P = "decimal(10,2)"
R = "decimal(4,2)"


def _revenue():
    price = F.col("l_extendedprice").cast(P)
    disc = F.col("l_discount").cast(R)
    return price * (F.lit(1).cast(R) - disc)  # (16,4), exact


_REV_SQL = f"CAST(l_extendedprice AS {P}) * (CAST(1 AS {R}) - CAST(l_discount AS {R}))"


def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 flavor with ROLLUP output (absorbs the former ``g1_rollup``
    — hierarchical grouping sets; the reference has none, SURVEY §2.5).

    NOT expressed as ``.rollup()`` over the FACT table: Catalyst's Expand
    would scan-multiply lineitem x3 (one replica per grouping set) before
    the partial aggregate — 3x the shuffle input at any scale. Over a
    low-cardinality key space the scalable plan is leaf-aggregate once
    (ONE pass + ONE shuffle over lineitem) and roll the handful of leaf
    rows up for the subtotal levels. r7: the subtotal re-aggregation is
    now ``leaf.rollup(...)`` instead of a 3-branch union — the union
    referenced ``leaf`` three times and Catalyst duplicates shared
    subtrees, so the plan scanned + aggregated lineitem three times
    (plans/r07/q01_pricing_summary_before.txt, scans (1)/(7)/(16));
    rollup's Expand runs over the ~8 LEAF rows, where x3 is free, and the
    single reference plans one scan. All decimal sums stay exact (scales
    2/4/6, no intermediate rounding; subtotals are sums of sums either
    way), so the result is bit-identical to the GROUP BY ROLLUP oracle."""
    li = load(spark, sf_dir, "lineitem")
    # r7 (guide §2.3 narrower types): the four decimal sums dominated the
    # leaf pass (measured sf1.0: one decimal sum 0.92s vs the same plan
    # with double sums 0.29s — Decimal aggregation buffers, not the scan).
    # Every input has exactly 2 decimals, so each term is an exact integer
    # in fixed-point units: qty/base in 1e-2 (cents), revenue in 1e-4,
    # revenue*tax in 1e-6 — summed as plain longs (exact, and overflow-
    # safe past 1e9 rows: per-row bounds 1e9/8e9 against the 9.2e18 long
    # range), then converted to the original decimal scales once per
    # OUTPUT row via precision-safe exact decimal literal multiplies
    # (operand precisions chosen so no Spark precision-loss/rounding path
    # can engage). charge = rev*(1+tax) is decomposed as
    # 100*sum(rev_e4) + sum(rev_e4*tax_c), recombined in decimal.
    qty_c = (F.col("l_quantity").cast(P) * 100).cast("long")
    price_c = (F.col("l_extendedprice").cast(P) * 100).cast("long")
    disc_c = (F.col("l_discount").cast(R) * 100).cast("long")
    tax_c = (F.col("l_tax").cast(R) * 100).cast("long")
    rev_e4 = price_c * (F.lit(100) - disc_c)
    leaf = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("_qty_c"),
            F.sum(price_c).alias("_base_c"),
            F.sum(rev_e4).alias("_disc_e4"),
            F.sum(rev_e4 * tax_c).alias("_revtax_e6"),
            F.count("*").alias("_n"),
        )
    )
    all_levels = (
        leaf.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("_qty_c").alias("_qty_c"),
             F.sum("_base_c").alias("_base_c"),
             F.sum("_disc_e4").alias("_disc_e4"),
             F.sum("_revtax_e6").alias("_revtax_e6"),
             F.sum("_n").alias("_n"))
    )

    def cents(c):  # exact: (20,0) * (3,2) -> (24,2), no precision loss
        return (F.col(c).cast("decimal(20,0)")
                * F.lit("0.01").cast("decimal(3,2)"))

    charge_e6 = (F.col("_disc_e4").cast("decimal(20,0)") * 100
                 + F.col("_revtax_e6").cast("decimal(20,0)"))
    return all_levels.select(
        "l_returnflag", "l_linestatus",
        cents("_qty_c").cast("decimal(38,2)").cast("string").alias("sum_qty"),
        cents("_base_c").cast("decimal(38,2)").cast("string")
        .alias("sum_base_price"),
        (F.col("_disc_e4").cast("decimal(24,0)")
         * F.lit("0.0001").cast("decimal(5,4)"))
        .cast("decimal(38,4)").cast("string").alias("sum_disc_price"),
        (charge_e6 * F.lit("0.000001").cast("decimal(7,6)"))
        .cast("decimal(38,6)").cast("string").alias("sum_charge"),
        F.col("_n").alias("count_order"),
    )


# Final decimals are emitted as canonical fixed-scale strings on BOTH sides:
# the value is exact either way, but pandas materialization differs (Spark ->
# decimal.Decimal objects, DuckDB .df() -> float64), which breaks byte-level
# hashes on any value with a trailing zero.  decimal->string keeps every
# scale digit in both engines.
_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS {P})) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS {P})) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
       CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
       CAST(CAST(SUM(({_REV_SQL}) * (CAST(1 AS {R}) + CAST(l_tax AS {R}))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q03_top_orders(spark, sf_dir):
    """Join + agg + deterministic top-10 (broadcast the filtered dimension)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(_revenue()).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.col("revenue").cast("string").alias("revenue"))
    )


_Q03_SQL = f"""
SELECT l_orderkey, CAST(revenue AS VARCHAR) AS revenue FROM (
SELECT l_orderkey,
       CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
)
"""


def q05_nation_revenue(spark, sf_dir):
    """Multi-way star join: dims broadcast, fact shuffles once on groupBy.

    r7 (guide §2.3 narrower types, same rewrite as q01): revenue is summed
    as exact 1e-4 fixed-point longs (price and discount carry exactly 2
    decimals, so price_c * (100 - disc_c) is an exact integer, <= 1e9 per
    row — overflow-safe past 1e9 rows) and converted to the decimal(38,4)
    string once per output nation; Decimal aggregation buffers measured
    ~3x the cost of primitive sums on this fact size."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    price_c = (F.col("l_extendedprice").cast(P) * 100).cast("long")
    disc_c = (F.col("l_discount").cast(R) * 100).cast("long")
    rev_e4 = price_c * (F.lit(100) - disc_c)
    # SHUFFLE_HASH for fact x orders (guide §3.1): orders scales with the
    # fact (x1.5M rows per sf) so it stops fitting a broadcast at scale
    # anyway, and locally the single-threaded 1.5M-row broadcast build
    # measured 1.51s vs 0.93s for the parallel per-partition hash build
    return (
        li.join(orders.hint("shuffle_hash"),
                li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg((F.sum(rev_e4).cast("decimal(24,0)")
              * F.lit("0.0001").cast("decimal(5,4)"))
             .cast("decimal(38,4)").cast("string").alias("revenue"))
    )


_Q05_SQL = f"""
SELECT n_name,
       CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS VARCHAR) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def a5_group_collect(spark, sf_dir):
    """A5/A6: groupBy + deterministic ordered collect (reference: bike
    collect-list build side, translate.py:439,492), broadcast-enriched with
    the nation dim and emitted through the O1 schema-level column sort
    (main.py:58) — r3: absorbs the former ``o1_sorted_projection``."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    agg = (
        cust.filter(F.col("c_custkey") < 200)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), "|").alias("names"),
            F.count("*").alias("n"),
        )
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return agg.select(*sorted(agg.columns))  # O1: sorted projection


_A5_SQL = """
SELECT c_nationkey, n, n_name, n_nationkey, n_regionkey, names FROM (
  SELECT c_nationkey,
         STRING_AGG(c_name, '|' ORDER BY c_name) AS names,
         COUNT(*) AS n
  FROM customer WHERE c_custkey < 200
  GROUP BY c_nationkey
) JOIN nation ON c_nationkey = n_nationkey
"""


def u1_union_by_name(spark, sf_dir):
    """U1/T24: schema union with null fillers (main.py:56-61)."""
    part = load(spark, sf_dir, "part").select(
        F.col("p_name").alias("name"),
        F.col("p_retailprice").cast(D).cast("string").alias("price"),
        F.lit(None).cast("int").alias("nation"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nation"),
    ).withColumn("price", F.lit(None).cast("string"))
    return part.unionByName(supp.select("name", "price", "nation"))


_U1_SQL = f"""
SELECT p_name AS name, CAST(CAST(p_retailprice AS {D}) AS VARCHAR) AS price, CAST(NULL AS INT) AS nation FROM part
UNION ALL
SELECT s_name AS name, CAST(NULL AS VARCHAR) AS price, s_nationkey AS nation FROM supplier
"""


def e2_posexplode_words(spark, sf_dir):
    """E2: split-to-rows with ordinality (word_table.sql:7-40)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    )


_E2_SQL = """
SELECT doc_id, i - 1 AS pos, words[i] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 50),
     LATERAL (SELECT unnest(generate_series(1, len(words))) AS i)
"""


def s1_scan_pushdown(spark, sf_dir):
    """S1: projected, filtered scan — predicate + column pushdown reach the
    parquet reader (verified in tests via PushedFilters)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") >= 49.0) & (F.col("l_linenumber") == 1)).select(
        "l_orderkey", "l_partkey",
        F.col("l_quantity").cast(D).cast("string").alias("qty")
    )


_S1_SQL = f"""
SELECT l_orderkey, l_partkey, CAST(CAST(l_quantity AS {D}) AS VARCHAR) AS qty
FROM lineitem WHERE l_quantity >= 49.0 AND l_linenumber = 1
"""


def q06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 flavor: pure filter + global agg — the whole query is one
    codegen stage over a pushdown scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-09-01"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(P)
                  * F.col("l_discount").cast(R))
            .cast("decimal(38,4)").cast("string").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


_Q06_SQL = f"""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS {P}) * CAST(l_discount AS {R})) AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-09-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def w3_rank_orders_per_customer(spark, sf_dir):
    """Window ranking: top-2 orders per customer by value (dense ranking
    with deterministic tie-break)."""
    orders = load(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.col("o_totalprice").cast(P)), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("o_custkey", "o_orderkey",
                F.col("o_totalprice").cast(P).cast("string").alias("price"),
                F.col("rnk").cast("long").alias("rnk"))
    )


_W3_SQL = f"""
SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS {P}) AS VARCHAR) AS price, rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey
    ORDER BY CAST(o_totalprice AS {P}) DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 2
"""


def r1_interval_join(spark, sf_dir):
    """Interval-overlap join via bucketed candidates
    (operators/rangejoin.py); oracle is DuckDB's native inequality join.

    r7 (guide §2.3 "aggregate before you shuffle" / §8 "decide with small
    rows"): every output statistic is additive over pairs, and the interval
    endpoints live in a bounded domain ([0, 10000) starts, <100-wide
    spans), so both sides collapse losslessly to weighted interval groups
    BEFORE candidate generation — left to (ls, le, lid % 100) with
    (count, sum lid), right to (rs, re) with (count, sum rid). Each
    overlapping group pair then contributes nl*nr pairs and
    lid_sum*nr + nl*rid_sum to the id sum: exactly the numbers the
    pair-level plan aggregated one row at a time. The candidate join drops
    from O(rows_l x rows_r / buckets) probe work (~1.3e9 combos at sf1.0)
    to the domain-bounded group product (~5e5), and stays flat in sf."""
    from rlis2osm_spark.operators.rangejoin import interval_overlap_join

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 5 == 0)
    left = orders.select(
        F.col("o_orderkey").alias("lid"),
        ((F.col("o_orderkey") * 7) % 10000).alias("ls"),
        ((F.col("o_orderkey") * 7) % 10000 + F.col("o_orderkey") % 50)
        .alias("le"),
    )
    part = load(spark, sf_dir, "part")
    right = part.select(
        F.col("p_partkey").alias("rid"),
        ((F.col("p_partkey") * 13) % 10000).alias("rs"),
        ((F.col("p_partkey") * 13) % 10000 + F.col("p_partkey") % 80)
        .alias("re"),
    )
    lagg = left.groupBy(
        "ls", "le", (F.col("lid") % 100).alias("lid_bucket")).agg(
        F.count("*").alias("nl"), F.sum("lid").alias("lid_sum"))
    ragg = right.groupBy("rs", "re").agg(
        F.count("*").alias("nr"), F.sum("rid").alias("rid_sum"))
    pairs = interval_overlap_join(
        lagg, ragg, on=None, left_range=("ls", "le"),
        right_range=("rs", "re"), bucket_width=64)
    return (
        pairs.groupBy("lid_bucket")
        .agg(F.sum(F.col("nl") * F.col("nr")).alias("n_pairs"),
             F.sum(F.col("lid_sum") * F.col("nr")
                   + F.col("nl") * F.col("rid_sum")).alias("id_sum"))
    )


_R1_SQL = """
WITH l AS (
  SELECT o_orderkey AS lid, (o_orderkey * 7) % 10000 AS ls,
         (o_orderkey * 7) % 10000 + o_orderkey % 50 AS le
  FROM orders WHERE o_orderkey % 5 = 0
),
r AS (
  SELECT p_partkey AS rid, (p_partkey * 13) % 10000 AS rs,
         (p_partkey * 13) % 10000 + p_partkey % 80 AS re
  FROM part
)
SELECT lid % 100 AS lid_bucket, COUNT(*) AS n_pairs,
       CAST(SUM(lid + rid) AS BIGINT) AS id_sum
FROM l JOIN r ON l.ls <= r.re AND r.rs <= l.le
GROUP BY lid % 100
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "r1_interval_join": r1_interval_join,
    "q06_forecast_revenue": q06_forecast_revenue,
    "w3_rank_orders_per_customer": w3_rank_orders_per_customer,
    "q03_top_orders": q03_top_orders,
    "q05_nation_revenue": q05_nation_revenue,
    "a5_group_collect": a5_group_collect,
    "u1_union_by_name": u1_union_by_name,
    "e2_posexplode_words": e2_posexplode_words,
    "s1_scan_pushdown": s1_scan_pushdown,
}

ORACLES = {
    "q01_pricing_summary": _Q01_SQL,
    "q06_forecast_revenue": _Q06_SQL,
    "w3_rank_orders_per_customer": _W3_SQL,
    "r1_interval_join": _R1_SQL,
    "q03_top_orders": _Q03_SQL,
    "q05_nation_revenue": _Q05_SQL,
    "a5_group_collect": _A5_SQL,
    "u1_union_by_name": _U1_SQL,
    "e2_posexplode_words": _E2_SQL,
    "s1_scan_pushdown": _S1_SQL,
}


def q04_semi_anti_join(spark, sf_dir):
    """Existence joins, both polarities in one tagged output (r3 merge of
    ``q04_semi_join`` + ``q16_anti_join``):

    - ``semi``: EXISTS (TPC-H Q4 flavor) — orders with at least one
      late-shipping lineitem, counted per priority (Catalyst plans a
      LeftSemi broadcast/SMJ — no fan-out, no distinct needed);
    - ``anti``: NOT EXISTS (Q16 flavor) — customers with no orders above a
      price threshold, counted per nation."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    late = li.filter(F.col("l_shipdate") > F.lit("2000-01-01"))
    semi = (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(F.lit("semi").alias("join_kind"),
                F.col("o_orderpriority").alias("grp_key"), "n")
    )
    big = orders.filter(F.col("o_totalprice") > 300000)
    anti = (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("anti").alias("join_kind"),
                F.col("c_nationkey").cast("string").alias("grp_key"), "n")
    )
    return semi.unionByName(anti)


_Q04_SQL = """
SELECT 'semi' AS join_kind, o_orderpriority AS grp_key, COUNT(*) AS n
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '2000-01-01 00:00:00')
GROUP BY o_orderpriority
UNION ALL
SELECT 'anti' AS join_kind, CAST(c_nationkey AS VARCHAR) AS grp_key,
       COUNT(*) AS n
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY c_nationkey
"""


def q13_outer_count(spark, sf_dir):
    """Left outer + count distribution (TPC-H Q13 flavor): how many
    customers placed k orders, including k=0 — the outer-join null-count
    semantics Catalyst must preserve through the double aggregate."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips nulls
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q18_having(spark, sf_dir):
    """Aggregate + HAVING (TPC-H Q18 flavor): orders whose total quantity
    exceeds a threshold, with exact decimal sums as strings."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(P)).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select("l_orderkey",
                F.col("total_qty").cast("decimal(38,2)").cast("string")
                .alias("total_qty"))
    )


_Q18_SQL = f"""
SELECT l_orderkey,
       CAST(CAST(SUM(CAST(l_quantity AS {P})) AS DECIMAL(38,2)) AS VARCHAR) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING SUM(CAST(l_quantity AS {P})) > 150
"""


QUERIES.update({
    "q04_semi_anti_join": q04_semi_anti_join,
    "q13_outer_count": q13_outer_count,
    "q18_having": q18_having,
})
ORACLES.update({
    "q04_semi_anti_join": _Q04_SQL,
    "q13_outer_count": _Q13_SQL,
    "q18_having": _Q18_SQL,
})
