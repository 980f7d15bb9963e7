"""Q01–Q21: the declared relational query inventory (SURVEY.md §2.10).

Each query is written with the DataFrame API so Catalyst plans it
(pushdown, pruning, join selection); the paired oracle string is
portable SQL DuckDB runs on the same parquet. Conventions (SURVEY.md
§2.10): every computed column aliased identically on both sides,
floats ROUND(x, 2) (Q21: 4), timestamps projected via CAST(.. AS DATE).

Scale notes are inline: each query states why its plan survives a
100 TB input (broadcast direction, shuffle keys, partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..sources import load_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q01 scan + project ---------------------------------------------------
@query(
    "q01_scan_project",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
)
def q01(spark, sf_dir):
    # Column pruning: ReadSchema carries only the two columns.
    return _t(spark, sf_dir, "region").select("r_regionkey", "r_name")


# --- Q02 filter / predicate pushdown --------------------------------------
@query(
    "q02_filter",
    oracle="""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderstatus = 'F' AND o_totalprice > 1000
              ORDER BY o_orderkey""",
)
def q02(spark, sf_dir):
    # Both predicates reach the parquet scan (PushedFilters).
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000))
        .select("o_orderkey", "o_totalprice")
    )


# --- Q03 inner equi-join (broadcast dim) -----------------------------------
@query(
    "q03_inner_join",
    oracle="""SELECT n_name, r_name FROM nation JOIN region
              ON n_regionkey = r_regionkey ORDER BY n_name, r_name""",
)
def q03(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # region is tiny at any SF -> broadcast, no shuffle of nation.
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner"
    ).select("n_name", "r_name")


# --- Q04 full outer join ----------------------------------------------------
@query(
    "q04_full_outer",
    oracle="""SELECT c_custkey, c_name, o_orderkey
              FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
              ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""",
)
def q04(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    # Full outer can't broadcast -> sort-merge on the join key; both
    # sides shuffle once on c_custkey/o_custkey, which is also the
    # natural co-partitioning for downstream per-customer work.
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "o_orderkey"
    )


# --- Q05 anti join ----------------------------------------------------------
@query(
    "q05_anti_join",
    oracle="""SELECT c_custkey FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""",
)
def q05(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey"
    )


# --- Q06 semi join ----------------------------------------------------------
@query(
    "q06_semi_join",
    oracle="""SELECT s_suppkey, s_name FROM supplier
              WHERE EXISTS (SELECT 1 FROM lineitem
                            WHERE l_suppkey = s_suppkey AND l_quantity > 45)
              ORDER BY s_suppkey""",
)
def q06(spark, sf_dir):
    supplier = _t(spark, sf_dir, "supplier")
    # Filter pushes to the lineitem scan BEFORE the semi join, so the
    # big side shrinks before any shuffle.
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select("l_suppkey")
    return supplier.join(li, supplier.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


# --- Q07 theta-keyed join ---------------------------------------------------
@query(
    "q07_theta_join",
    oracle="""SELECT p_partkey, s_suppkey FROM part JOIN supplier
              ON p_partkey % 100 = s_suppkey % 100
              WHERE p_size = 15 AND s_acctbal > 5000
              ORDER BY p_partkey, s_suppkey""",
)
def q07(spark, sf_dir):
    # Rewrite the theta condition as an equi-join on a derived key so
    # Spark uses a hash join instead of nested-loop — the same trick
    # the reference's rename-detection join J7 needs (SURVEY.md §2.3).
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", (F.col("p_partkey") % 100).alias("k"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select("s_suppkey", (F.col("s_suppkey") % 100).alias("k"))
    )
    return part.join(supp, "k", "inner").select("p_partkey", "s_suppkey")


# --- Q08 multi-way join + agg ----------------------------------------------
@query(
    "q08_multijoin_agg",
    oracle="""SELECT n_name, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS rev
              FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""",
)
def q08(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # orders⋈customer shuffles on custkey; nation broadcasts; the final
    # groupBy does partial (map-side) aggregation before its shuffle.
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner"
    )
    return joined.groupBy("n_name").agg(
        F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("rev")
    )


# --- Q09 hash aggregate, multiple functions ---------------------------------
@query(
    "q09_hash_agg",
    oracle="""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                     ROUND(SUM(l_quantity), 2) AS sq,
                     ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS disc_rev
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""",
)
def q09(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # TPC-H Q1 shape: few groups -> partial agg collapses ~everything
    # map-side; the shuffle moves only (flag,status) pairs per task.
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sq"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("disc_rev"),
    )


# --- Q10 top-k ---------------------------------------------------------------
@query(
    "q10_topk",
    oracle="""SELECT o_orderkey, ROUND(o_totalprice, 2) AS tp FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def q10(spark, sf_dir):
    # orderBy+limit compiles to TakeOrderedAndProject: each partition
    # keeps its local top-10, only 10 rows/partition reach the driver.
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("tp"))
    )


# --- Q11 distinct ------------------------------------------------------------
@query(
    "q11_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def q11(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# --- Q12 EXCEPT --------------------------------------------------------------
@query(
    "q12_except",
    oracle="""SELECT c_nationkey AS k FROM customer EXCEPT
              SELECT s_nationkey AS k FROM supplier ORDER BY k""",
)
def q12(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.subtract(supp)  # EXCEPT (set semantics), same as SQL EXCEPT


# --- Q13 INTERSECT -----------------------------------------------------------
@query(
    "q13_intersect",
    oracle="""SELECT o_custkey AS k FROM orders INTERSECT
              SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0 ORDER BY k""",
)
def q13(spark, sf_dir):
    ords = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"))
    )
    return ords.intersect(cust)


# --- Q14 window ranking -------------------------------------------------------
@query(
    "q14_window_rank",
    oracle="""SELECT c_custkey, rnk FROM (
                SELECT c_custkey,
                       ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
                FROM customer) t
              WHERE rnk <= 3 ORDER BY c_custkey""",
)
def q14(spark, sf_dir):
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    # One shuffle on c_nationkey; rank filter applies before projecting
    # away the partition key. AQE handles nation-key skew if present.
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_custkey", "rnk")
    )


# --- Q15 window lead ----------------------------------------------------------
@query(
    "q15_window_lead",
    oracle="""SELECT o_orderkey, o_custkey,
                     LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey) AS next_ok
              FROM orders WHERE o_custkey < 100 ORDER BY o_orderkey""",
)
def q15(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)  # pushed to scan before the window shuffle
        .withColumn("next_ok", F.lead("o_orderkey").over(w))
        .select("o_orderkey", "o_custkey", "next_ok")
    )


# --- Q16 string functions + regexp ---------------------------------------------
@query(
    "q16_string_fns",
    oracle="""SELECT p_partkey, LOWER(TRIM(p_name)) AS nm,
                     REGEXP_EXTRACT(p_type, '([a-z]+)$', 1) AS last_word
              FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",
)
def q16(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.lower(F.trim(F.col("p_name"))).alias("nm"),
            F.regexp_extract(F.col("p_type"), "([a-z]+)$", 1).alias("last_word"),
        )
    )


# --- Q17 CASE classifier --------------------------------------------------------
@query(
    "q17_case_when",
    oracle="""SELECT p_partkey,
                     CASE WHEN p_size <= 10 THEN 'small'
                          WHEN p_size <= 30 THEN 'medium'
                          ELSE 'large' END AS size_class
              FROM part ORDER BY p_partkey""",
)
def q17(spark, sf_dir):
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_size") <= 10, "small")
        .when(F.col("p_size") <= 30, "medium")
        .otherwise("large")
        .alias("size_class"),
    )


# --- Q18 date bucketing (tumbling-window analog) ---------------------------------
@query(
    "q18_date_bucket",
    oracle="""SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d, event_type,
                     COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
              FROM events GROUP BY 1, 2 ORDER BY d, event_type""",
)
def q18(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # Batch analog of a tumbling 1-day window; the streaming façade in
    # easy_alterator_spark.streaming reuses the same aggregation.
    return ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))


# --- Q19 dedup (X1) ----------------------------------------------------------------
@query(
    "q19_dedup_distinct",
    oracle="""SELECT event_type, COUNT(*) AS n FROM (
                SELECT DISTINCT user_id, event_type FROM events) t
              GROUP BY event_type ORDER BY event_type""",
)
def q19(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    # dropDuplicates = shuffle on (user_id, event_type) with partial
    # dedup map-side; the follow-up count reuses the same partitioning.
    return ev.dropDuplicates(["user_id", "event_type"]).groupBy("event_type").agg(
        F.count("*").alias("n")
    )


# --- Q20 text analysis (X3) ----------------------------------------------------------
@query(
    "q20_text_stats",
    oracle="""SELECT lang, COUNT(*) AS docs, ROUND(AVG(n_chars), 2) AS avg_chars
              FROM documents WHERE LENGTH(text) > 100
              GROUP BY lang ORDER BY lang""",
)
def q20(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.length("text") > 100)
        .groupBy("lang")
        .agg(F.count("*").alias("docs"), F.round(F.avg("n_chars"), 2).alias("avg_chars"))
    )


# --- Q21 similarity search (X2, adapted) -----------------------------------------------
@query(
    "q21_similarity_topk",
    oracle="""SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                     ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS dot
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE a.vec_id <= 50 AND b.vec_id <= 50
              ORDER BY dot DESC, vec_id_a, vec_id_b LIMIT 10""",
)
def q21(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 50)
    a = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("eb"))
    # Brute-force pair scoring on a pre-filtered (small) candidate set;
    # broadcast-NL join is the right plan at 50 rows. The scale path
    # (LSH bucketing) lives in operators/similarity.py.
    pairs = a.join(F.broadcast(b), F.col("vec_id_a") < F.col("vec_id_b"))
    return (
        pairs.select(
            "vec_id_a", "vec_id_b", F.round(V.dot(F.col("ea"), F.col("eb")), 4).alias("dot")
        )
        .orderBy(F.col("dot").desc(), "vec_id_a", "vec_id_b")
        .limit(10)
    )


# --- Q23-Q26: TPC-H-shaped suite (adapted to the testdata schema) ----------
# The four canonical TPC-H plan shapes the inventory above does not
# already exercise end-to-end at full-table scale: pricing-summary wide
# aggregate (Q1), mid-size join + top-k (Q3), 6-table snowflake with a
# cycle-closing condition (Q5), group-HAVING semi-reduction (Q18).
# Scale notes inline per query.


@query(
    "q23_tpch_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q23(spark, sf_dir):
    """TPC-H Q1 pricing summary. One shuffle on a 6-value group key;
    every aggregate is algebraic, so the map side pre-combines 60k rows
    per partition down to <=6 partials — at 100 TB the reduce stage
    moves KBs. The shipdate predicate reaches the parquet scan
    (PushedFilters), and ReadSchema carries only the 7 needed columns.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q24_tpch_shipping",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q24(spark, sf_dir):
    """TPC-H Q3 shipping priority. The segment-filtered customer side
    is ~1/5 of a dimension table -> broadcast; orders joins lineitem on
    the orderkey shuffle. Top-10 is TakeOrderedAndProject: each
    partition keeps 10 rows, the driver merges — no global sort at any
    scale. Deterministic tiebreak (l_orderkey) keeps the LIMIT stable
    across engines.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q25_tpch_local_supplier",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name ORDER BY revenue DESC, n_name
    """,
)
def q25(spark, sf_dir):
    """TPC-H Q5 local-supplier volume. The snowflake closes a cycle
    (customer and supplier must share a nation), which no join
    reordering can avoid — but every dimension (region, nation,
    customer-slice, supplier) broadcasts, so the only shuffle is
    lineitem |><| orders on orderkey; the s_nationkey = c_nationkey
    equality rides along as a broadcast-join condition, never a
    shuffle key. At 100 TB the fact-side join is the sole exchange.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q26_tpch_large_orders",
    oracle="""
    WITH big AS (SELECT l_orderkey FROM lineitem
                 GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q26(spark, sf_dir):
    """TPC-H Q18 large-volume customer. The HAVING subquery reduces
    lineitem to a tiny orderkey set FIRST (map-side partial sums, one
    shuffle on orderkey); that set broadcasts back as a semi-join
    filter, so the re-scan of lineitem and the orders join only touch
    qualifying orders. Same aggregation-then-semi-join shape Spark
    plans for the SQL form; no row explosion at any scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 250)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "bk")),
                li["l_orderkey"] == F.col("bk"), "left_semi")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@query(
    "q27_tpch_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q27(spark, sf_dir):
    """TPC-H Q13 customer order-count distribution. The ON-clause
    predicate (priority <> URGENT) must stay in the join, not the
    WHERE — a left join filtered after the fact would drop zero-order
    customers. One shuffle on custkey for the outer join + count;
    the second groupBy keys on c_count (cardinality ~ max orders per
    customer, tiny), so its exchange moves only partial counts. At
    100 TB both sides hash-partition on custkey; no broadcast needed
    because customer is also fact-sized in this shape.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q28_tpch_promo",
    oracle="""
    SELECT ROUND(
        100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0 END)
        / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q28(spark, sf_dir):
    """TPC-H Q14 promotion revenue share. The one-month shipdate
    predicate reaches the parquet scan; part broadcasts (dimension),
    so the month slice of lineitem never shuffles. The conditional
    aggregate is algebraic — map-side partials collapse each
    partition to two doubles; the global agg is a single-row reduce.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q29_tpch_quiet_customers",
    oracle="""
    WITH ab AS (SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
    SELECT c.c_mktsegment AS segment, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM ab)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
)
def q29(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no
    urgent orders, rolled up per segment. The scalar average is a
    single-row aggregate joined back as a cross-broadcast (one row —
    never a shuffle); the NOT EXISTS is a left_anti join against the
    URGENT slice of orders. At 100 TB the anti-join shuffles on
    custkey once; the urgent slice is filter-pruned at the scan.
    """
    c = _t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(urgent, c["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("segment")
    )


@query(
    "q30_tpch_disjunctive",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q30(spark, sf_dir):
    """TPC-H Q19 disjunctive-predicate join. The OR-of-ANDs mixes
    columns from both sides, so it can only be applied after the
    join — but Catalyst derives the single-side residuals (quantity
    <= 30, brand IN (...), size <= 15) and pushes THOSE to each scan,
    shrinking both inputs before the broadcast-hash join. The full
    disjunction runs as the join's residual filter inside codegen.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & q.between(1, 11) & s.between(1, 5))
        | ((b == "Brand#23") & q.between(10, 20) & s.between(1, 10))
        | ((b == "Brand#34") & q.between(20, 30) & s.between(1, 15))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q31_tpch_late_orders",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def q31(spark, sf_dir):
    """TPC-H Q4 shape: orders with at least one line shipped > 60 days
    after the order date, counted per priority. The correlated EXISTS
    with an inequality on both tables' columns becomes a left_semi
    join on orderkey with the date comparison as a join residual —
    one shuffle on orderkey, then a tiny 5-key aggregate. Semi-join
    semantics (not inner+distinct) keep multi-line orders from
    double-counting at any scale.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > F.date_add(o["o_orderdate"], 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q32_tpch_returned",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q32(spark, sf_dir):
    """TPC-H Q10 shape: lost revenue from returned items per customer,
    top 20. The returnflag filter pushes to the lineitem scan (cuts
    ~3/4 of the fact table before any join); customer broadcasts;
    lineitem |><| orders shuffles once on orderkey. Top-20 by revenue
    is TakeOrderedAndProject with a custkey tiebreak.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q33_tpch_forecast",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q33(spark, sf_dir):
    """TPC-H Q6 revenue-change forecast: pure scan + conditional sum,
    zero joins. All four predicates reach the parquet scan as
    PushedFilters (year range prunes row groups via min/max stats);
    the aggregate is a single map-side partial + 1-row reduce — the
    canonical 'the scan IS the query' plan at any scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@query(
    "q34_tpch_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q34(spark, sf_dir):
    """TPC-H Q7 volume shipping between two nations. The two-nation
    disjunction can't be split per side (it pairs supplier nation with
    customer nation), but each side IS prunable to the 2-nation union
    — supplier and customer broadcast pre-filtered through their
    nation joins, so the only shuffle is lineitem |><| orders on
    orderkey; the cross-nation disjunction evaluates as a residual on
    two broadcast-joined dimension columns.
    """
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sk")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("ck")
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q35_tpch_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    ) GROUP BY o_year ORDER BY o_year
    """,
)
def q35(spark, sf_dir):
    """TPC-H Q8 national market share inside one region+part-type
    slice. Every dimension broadcasts (part pre-filtered to the type,
    customer pre-joined to its ASIA-region nation, supplier carrying
    its nation name); lineitem |><| orders on orderkey is the only
    exchange, and the share is a conditional-sum ratio per year —
    algebraic, map-side combined.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.join(
        F.broadcast(r), nat["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_nationkey").alias("ck"))
    n2 = nat.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("ck"), "left_semi"
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("sk")
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_semi")
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# round-3: the remaining canonical TPC-H shapes (Q2, Q9, Q11, Q15, Q16,
# Q17, Q20, Q21 — on this star schema's columns: no partsupp table, so
# supply cost/stock proxies come from lineitem; the SHAPES are the
# point). Q12's conditional-aggregation-after-join shape is already
# exercised by q28/q31.
# ---------------------------------------------------------------------------


@query(
    "q36_tpch_min_cost_supplier",
    # Q2 shape: correlated min subquery selecting the cheapest supplier
    # per part. Cost = MIN(unit price) — min of identical IEEE doubles,
    # so the equality selection is engine-exact (AVG would not be).
    oracle="""
    WITH cost AS (
        SELECT l.l_partkey, l.l_suppkey,
               MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT p.p_partkey, s.s_name, n.n_name,
           FLOOR(c.unit_cost * 10000) / 10000 AS min_cost
    FROM cost c
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'LARGE' AND p.p_size < 10
      AND c.unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                         WHERE c2.l_partkey = c.l_partkey)
    ORDER BY p_partkey, s_name
    """,
)
def q36(spark, sf_dir):
    """TPC-H Q2 min-cost supplier. The correlated scalar subquery is a
    window MIN over the part key — one extra exchange on l_partkey for
    the per-(part, supplier) cost table, which is partsupp-sized (tiny
    vs the fact); every dimension broadcasts. At 100 TB the only big
    exchange is lineitem's partial agg to (part, supp) grain."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 10)
    )
    cost = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best")
    )
    # fresh loads for the re-join: `s`/`n` already appear inside
    # `cost`'s lineage and would be ambiguous self-references
    s2 = _t(spark, sf_dir, "supplier")
    n2 = _t(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s2), best["l_suppkey"] == s2["s_suppkey"])
        .join(F.broadcast(n2), s2["s_nationkey"] == n2["n_nationkey"])
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            # floor-grid, not round: Spark's BigDecimal HALF_UP and
            # DuckDB's C round disagree on IEEE halfway values
            # (1257.85775 -> .8578 vs .8577 at sf0.1); floor(x*1e4)/1e4
            # is pure IEEE arithmetic, identical in every engine
            (F.floor(F.col("unit_cost") * 10000) / 10000).alias("min_cost")
        )
        .orderBy("p_partkey", "s_name")
    )


@query(
    "q37_tpch_profit",
    # Q9 shape: profit per (supplier nation, order year) over a
    # part-name slice; cost proxy = 10% of retail price per unit
    oracle="""
    SELECT n.n_name, YEAR(o.o_orderdate)::INT AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity), 4) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q37(spark, sf_dir):
    """TPC-H Q9 product-type profit. part/supplier/nation broadcast;
    the lineitem |><| orders join on orderkey is the single exchange,
    then a tiny (nation × year) aggregate — partial agg collapses
    virtually everything map-side."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    # prices/discounts are exact 2-decimal data, so the TRUE per-line
    # profit lives on a 1e-4 grid and group sums land EXACTLY on
    # half-cent boundaries (…845) — ROUND(…, 2) then ties, and the two
    # engines' float noise resolves the tie differently. Rounding at
    # the grid's own 4 decimals has no ties to resolve: the sum is
    # ~1e-9 from a grid point, 0.5e-4 from any boundary.
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("profit"))
        .orderBy("n_name", F.col("o_year").desc())
    )


@query(
    "q38_tpch_important_stock",
    # Q11 shape: per-part inventory value from one nation-slice's
    # suppliers, kept only above a fraction of the slice total
    oracle="""
    WITH v AS (
        SELECT l.l_partkey,
               SUM(l.l_quantity * p.p_retailprice) AS value
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(value, 2) AS value
    FROM v CROSS JOIN (SELECT SUM(value) AS total, COUNT(*) AS n FROM v) t
    WHERE value > t.total * 2.0 / t.n
    ORDER BY value DESC, p_partkey
    """,
)
def q38(spark, sf_dir):
    """TPC-H Q11 important stock. The HAVING-vs-global-total shape:
    the per-part aggregate is computed once, its one-row grand total
    is broadcast-crossed back — no second scan, no driver round-trip."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    v = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("value"))
    )
    total = v.agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
    # scale-free cut (2x the mean per-part value): a fixed fraction of
    # the grand total empties as the part count grows with SF
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("total") * 2.0 / F.col("n"))
        .select(
            F.col("l_partkey").alias("p_partkey"), F.round("value", 2).alias("value")
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@query(
    "q39_tpch_top_supplier",
    # Q15 shape: derived revenue view + scalar max selection (keeps
    # ties, so no LIMIT nondeterminism)
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 2) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q39(spark, sf_dir):
    """TPC-H Q15 top supplier. The revenue view is computed ONCE; its
    one-row max is broadcast-crossed back for the equality selection
    (ties kept) — the classic view-reuse shape without a re-scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q40_tpch_parts_supplier_cnt",
    # Q16 shape: supplier-count distribution per part attribute cell,
    # with a NOT-IN supplier exclusion (negative-balance proxy for the
    # reference's complaints filter)
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#9' AND p.p_size <= 15
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q40(spark, sf_dir):
    """TPC-H Q16 parts/supplier relationship. The NOT IN is a
    broadcast LEFT ANTI join (null-safe here: keys are non-null), the
    distinct count collapses map-side to (cell, suppkey) grain first."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9") & (F.col("p_size") <= 15)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q41_tpch_small_qty",
    # Q17 shape: correlated per-part average threshold. AVG of
    # integer-valued doubles is exact (sums < 2^53), so the inequality
    # is engine-stable.
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    WHERE l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q41(spark, sf_dir):
    """TPC-H Q17 small-quantity-order revenue. The correlated AVG is a
    window mean over l_partkey on the brand-pruned slice — Spark
    evaluates it without a self-join (the canonical plan re-scans
    lineitem); one exchange on l_partkey."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q42_tpch_promotion_parts",
    # Q20 shape: chained IN subqueries (name-slice parts -> suppliers
    # who moved > threshold of them in a window -> nation slice)
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'AFRICA'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 100)
    ORDER BY s_name
    """,
)
def q42(spark, sf_dir):
    """TPC-H Q20 potential part promotion. Both IN subqueries become
    broadcast semi-joins; the grouped HAVING runs at supplier grain
    (100-row output) before the semi-join, so the supplier table never
    sees fact-sized data."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    movers = (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"], "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(movers), s["s_suppkey"] == movers["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q43_tpch_waiting_supplier",
    # Q21 shape: EXISTS (another supplier in the order) + NOT EXISTS
    # (another supplier shipped later) on finished orders — the
    # last-to-ship supplier is the one everyone waited for
    oracle="""
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    ms AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS ms
           FROM l1 GROUP BY l_orderkey, l_suppkey)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM ms m
    JOIN supplier s ON s.s_suppkey = m.l_suppkey
    WHERE EXISTS (SELECT 1 FROM ms m2
                  WHERE m2.l_orderkey = m.l_orderkey
                    AND m2.l_suppkey <> m.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM ms m3
                      WHERE m3.l_orderkey = m.l_orderkey
                        AND m3.l_suppkey <> m.l_suppkey
                        AND m3.ms >= m.ms)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q43(spark, sf_dir):
    """TPC-H Q21 waiting supplier. Both correlated EXISTS collapse to
    per-order aggregates computed in ONE pass (max other-supplier
    shipdate + distinct supplier count), joined back on orderkey —
    two window functions over one exchange instead of two self-joins
    of the fact table."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    l1 = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_semi").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # collapse to (order, supplier) last-ship grain first — both
    # EXISTS conditions then read off ONE per-order aggregate: the
    # supplier set at the max shipdate and the distinct-supplier count
    ms = l1.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("ms")
    )
    per_order = ms.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.max("ms").alias("max_ms"),
        F.collect_set(F.struct("ms", "l_suppkey")).alias("pairs"),
    )
    last_suppliers = F.transform(
        F.filter(F.col("pairs"), lambda p: p["ms"] == F.col("max_ms")),
        lambda p: p["l_suppkey"],
    )
    waiting = (
        per_order.withColumn("last_suppliers", last_suppliers)
        .filter((F.col("n_supp") >= 2) & (F.size("last_suppliers") == 1))
        .select("l_orderkey", F.element_at("last_suppliers", 1).alias("l_suppkey"))
    )
    return (
        waiting.join(F.broadcast(s), waiting["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
