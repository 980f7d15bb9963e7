"""Scale-first warehouse operators, round 4: salted skew joins, CDC
changelog merge, one-pass column profiling, inverted-index build,
windowed distinct cardinality, streaming exact dedup, recursive-CTE
hierarchy rollup, prefix-filter exact similarity join, PageRank,
terasort-decomposed global rank / equi-depth histogram, first-touch
attribution, and classification-report metrics.

Each query pairs a Spark operator whose PLAN is the point (the shape
that survives a 100x scale-up) with a DuckDB oracle that restates the
same contract in portable SQL. Several oracles are deliberately the
NAIVE form — plain join for the salted join, brute-force O(n²) for
the prefix filter, global NTILE for the histogram, batch DISTINCT
for the streaming dedup: identical output against the naive contract
is exactly the property that makes the scale variant safe to deploy.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import cdc as C
from ..operators import dedup as D
from ..operators import search as SR
from ..operators import skew as K
from ..operators import timeseries as TS
from ..operators.profile import column_profile
from ..sources import load_table
from . import query

# mirrors functions/text.py::tokens for the inverted-index oracle
_DTOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


@query(
    "join_skew_salted",
    oracle="""
    SELECT s_name, COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def join_skew_salted(spark, sf_dir):
    """Per-supplier revenue through an EXPLICITLY SALTED join
    (operators/skew.py::salted_join, salt=8): the supplier side is
    replicated 8x, lineitem scattered by a deterministic row hash, and
    the join key becomes (l_suppkey, __salt) — one hot supplier's rows
    spread over 8 tasks instead of melting one. The oracle is the
    PLAIN join: salting must be invisible in the result, visible only
    in the plan (shuffle-hash hint keeps the salted exchange in the
    plan so the contract under test is the skew-resilient shape, not a
    broadcast that would bypass it)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = K.salted_join(li, sup.hint("shuffle_hash"), on="l_suppkey", salt=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        # round at the price grid's own 4 decimals, not 2: group sums
        # of 2-decimal × 2-decimal terms land exactly on half-cent
        # boundaries, where the two engines' float noise breaks the
        # ROUND(…, 2) tie differently (same pinning as q37's profit)
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


@query(
    "cdc_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'),
    chg AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderkey
                   ORDER BY o_orderdate DESC, o_orderkey) AS rn
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01'),
    last AS (SELECT * FROM chg WHERE rn = 1)
    SELECT b.o_orderkey, b.o_custkey,
           ROUND(b.o_totalprice, 2) AS o_totalprice, 'base' AS src
    FROM base b ANTI JOIN last l ON b.o_orderkey = l.o_orderkey
    UNION ALL
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2), 'upsert'
    FROM last WHERE op <> 'D'
    """,
)
def cdc_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics as a batch dataflow
    (operators/cdc.py::apply_changelog): orders before 1997-07-01 are
    the base snapshot; later orders replay as a changelog (status 'F'
    = delete, else upsert, order date as the sequence). Latest change
    wins per key; the base side joins against a BROADCAST key set, so
    the 100 TB side is scanned once and never shuffled."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-07-01").cast("timestamp")
    payload = ["o_orderkey", "o_custkey", "o_totalprice"]
    base = orders.filter(F.col("o_orderdate") < cut).select(*payload)
    chg = orders.filter(F.col("o_orderdate") >= cut).select(
        *payload,
        F.col("o_orderdate").alias("seq"),
        F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
    )
    merged = C.apply_changelog(
        base, chg, key_cols=["o_orderkey"], seq_col="seq", op_col="op"
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "src",
    )


@query(
    "profile_columns",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           COUNT(*) FILTER (l_quantity IS NULL) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           ROUND(MIN(l_quantity::DOUBLE), 4) AS min_val,
           ROUND(MAX(l_quantity::DOUBLE), 4) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*) FILTER (l_extendedprice IS NULL),
           COUNT(DISTINCT l_extendedprice),
           ROUND(MIN(l_extendedprice::DOUBLE), 4),
           ROUND(MAX(l_extendedprice::DOUBLE), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*) FILTER (l_discount IS NULL),
           COUNT(DISTINCT l_discount),
           ROUND(MIN(l_discount::DOUBLE), 4),
           ROUND(MAX(l_discount::DOUBLE), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', COUNT(*) FILTER (l_suppkey IS NULL),
           COUNT(DISTINCT l_suppkey),
           ROUND(MIN(l_suppkey::DOUBLE), 4),
           ROUND(MAX(l_suppkey::DOUBLE), 4)
    FROM lineitem
    """,
)
def profile_columns(spark, sf_dir):
    """One-scan data profiler (operators/profile.py::column_profile):
    nulls / exact distinct / min / max for four lineitem columns in a
    single aggregate (the multi-distinct Expand is the documented
    single-pass trade; ``exact_distinct=False`` swaps in HLL for
    full-corpus sweeps)."""
    return column_profile(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_suppkey"],
    )


@query(
    "index_postings",
    oracle=f"""
    WITH t AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_DTOKS})) AS term
        FROM documents),
    g AS (SELECT term, COUNT(*) AS df,
                 (list(doc_id ORDER BY doc_id))[1:10] AS postings
          FROM t GROUP BY term)
    SELECT term, df, array_to_string(postings, ',') AS postings
    FROM g WHERE df >= 2
    """,
)
def index_postings(spark, sf_dir):
    """Inverted-index build (operators/search.py::build_inverted_index):
    per term, document frequency and the first 10 postings in doc-id
    order. The cap is enforced BEFORE collection via a row_number
    window sharing the groupBy's (term) exchange — no executor ever
    holds a hot term's full posting array. The registered query
    stringifies the posting array (``concat_ws``) because the
    correctness driver's pandas canonicalizer cannot hash list-valued
    cells; the operator itself keeps the typed array."""
    return SR.build_inverted_index(
        load_table(spark, sf_dir, "documents"), max_postings=10, min_df=2
    ).select(
        "term",
        "df",
        F.concat_ws(",", F.col("postings").cast("array<string>")).alias(
            "postings"
        ),
    )


@query(
    "events_rolling_distinct",
    oracle="""
    SELECT user_id, ts, event_type,
           COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS n_distinct_7d
    FROM events
    """,
)
def events_rolling_distinct(spark, sf_dir):
    """Trailing-7-day distinct event types per user
    (operators/timeseries.py::rolling_distinct): windowed cardinality
    via collect_set over an exact-microsecond range frame — the
    engagement-breadth feature; one (user) shuffle, per-frame state
    bounded by the categorical cardinality."""
    return TS.rolling_distinct(load_table(spark, sf_dir, "events"))


@query(
    "stream_dedup_exact",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_exact(spark, sf_dir):
    """Streaming exact dedup: the events stream deduplicated on
    (user_id, event_type) with ``dropDuplicates`` under an
    availableNow trigger, then rolled up to distinct users per type —
    the result the batch DISTINCT computes, produced by the streaming
    state store. ``dropDuplicates`` keeps unbounded key state (exact
    at any arrival order); the production unbounded-stream variant is
    ``dropDuplicatesWithinWatermark`` (state pruned to the watermark
    horizon), value-pinned against this exact form in
    tests/test_streaming.py. Sink names are sequenced so bench re-runs
    get fresh memory tables."""
    from ..streaming.events import read_events_stream, run_to_memory
    from .extensions import _STREAM_SINK_SEQ

    _STREAM_SINK_SEQ[0] += 1
    name = f"stream_dedup_sink_{_STREAM_SINK_SEQ[0]}"
    dedup = read_events_stream(spark, sf_dir).dropDuplicates(
        ["user_id", "event_type"]
    )
    run_to_memory(dedup, name, output_mode="append", state_partitions=8)
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "hierarchy_bom_rollup",
    oracle="""
    WITH RECURSIVE bom(anc, node, price) AS (
        SELECT p_partkey, p_partkey, p_retailprice FROM part
        UNION ALL
        SELECT b.anc, c.p_partkey, c.p_retailprice
        FROM bom b JOIN part c
          ON CAST(FLOOR(c.p_partkey / 2.0) AS BIGINT) = b.node
         AND c.p_partkey >= 1)
    SELECT anc AS p_partkey, COUNT(*) AS subtree_parts,
           ROUND(SUM(price), 2) AS subtree_price
    FROM bom GROUP BY anc HAVING COUNT(*) >= 16
    """,
)
def hierarchy_bom_rollup(spark, sf_dir):
    """Bill-of-materials explosion via Spark 4's WITH RECURSIVE: parts
    form a synthetic binary assembly tree (parent = floor(key/2) —
    the schema has no real hierarchy, the derivation is the documented
    fixture), and the recursion enumerates every (ancestor,
    descendant) pair to roll up subtree size and cost for assemblies
    of >= 16 parts. Each recursion level executes as one join stage
    over the PREVIOUS level's frontier, so work is O(edges × depth)
    and depth is log2(n) here — the shape recursive SQL is right for
    (bounded-depth hierarchies: BOM, org charts, folder trees).
    Unbounded/cyclic closures are NOT this tool: Spark recursion is
    UNION ALL-only (no fixpoint dedup), which is why connected
    components ship as iterative min-label / star-contraction
    DataFrame ops (operators/dedup.py) instead. Exact same-SQL oracle;
    integer parent math via FLOOR(x / 2.0) is bit-identical in both
    engines (exact in double far below 2^52).
    """
    part = load_table(spark, sf_dir, "part")
    return spark.sql(
        """
        WITH RECURSIVE bom(anc, node, price) AS (
            SELECT p_partkey, p_partkey, p_retailprice FROM {part}
            UNION ALL
            SELECT b.anc, c.p_partkey, c.p_retailprice
            FROM bom b JOIN {part} c
              ON CAST(FLOOR(c.p_partkey / 2.0) AS BIGINT) = b.node
             AND c.p_partkey >= 1)
        SELECT anc AS p_partkey, COUNT(*) AS subtree_parts,
               ROUND(SUM(price), 2) AS subtree_price
        FROM bom GROUP BY anc HAVING COUNT(*) >= 16
        """,
        part=part,
    )


@query(
    "dedup_prefix_filter",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DTOKS} AS raw FROM documents
               WHERE doc_id < 1000),
    ds AS (SELECT doc_id, list_distinct(raw) AS toks FROM d)
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE
                 / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jac
    FROM ds a JOIN ds b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
          / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
    """,
)
def dedup_prefix_filter(spark, sf_dir):
    """EXACT-recall set-similarity self-join via prefix filtering
    (operators/dedup.py::prefix_filter_pairs, AllPairs/PPJoin):
    rare-first global token order, per-set prefix of length
    s - ceil(0.9·s) + 1, candidates from an equi-join on shared
    prefix tokens with the size bound pruning in-join, exact Jaccard
    verify. The oracle is the brute-force O(n²) join — identical
    output is the exactness claim (MinHash-LSH trades recall for the
    s-curve; this trades nothing and prunes via rarity instead).

    The doc_id bound exists because of OUTPUT MASS, not the
    algorithm: the bench corpus is the collision-floor regime
    (SCALE.md §4/§11 — a ~30-word vocabulary, so EVERY token is hot
    and most pairs are genuinely >= 0.9), where any exact-recall
    method is Θ(true pairs) = Θ(n²) by definition; unbounded, the
    verify stage alone emits millions of true pairs (measured 44 s at
    sf0.1 vs MinHash's 7.5 s — MinHash pays its s-curve recall loss
    precisely to stay cheaper there). On rarity-bearing corpora the
    prefix join, not n², is the pair space — the regime argument is
    SCALE.md §12; the unbounded operator is what ships."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return D.prefix_filter_pairs(docs, threshold=0.9)


def _pagerank_oracle(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled power-iteration SQL (DuckDB forbids neither, but
    recursive-CTE aggregation rules vary; unrolling is portable and
    keeps the oracle a single static string per registration)."""
    # CTEs are MATERIALIZED (r12): e/deg/nn are referenced by all ten
    # unrolled rounds, so DuckDB's CTE inlining re-evaluates the
    # quadratic Jaccard pair join per round (measured 6.2 s at
    # sf0.001; sub-second materialized, results identical — the hint
    # changes evaluation strategy only).
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f"r{i} AS MATERIALIZED (SELECT e.dd AS node, "
            f"(1 - {damping}) / ANY_VALUE(nn.n) + {damping} * "
            f"SUM(r.rank / deg.dg) AS rank "
            f"FROM e JOIN {prev} r ON e.s = r.node "
            f"JOIN deg ON deg.s = e.s CROSS JOIN nn GROUP BY e.dd)"
        )
        prev = f"r{i}"
    return f"""
    WITH d AS MATERIALIZED (SELECT doc_id, {_DTOKS} AS raw FROM documents
               WHERE doc_id <= 200),
    ds AS MATERIALIZED (SELECT doc_id, list_distinct(raw) AS toks FROM d),
    p AS MATERIALIZED (SELECT a.doc_id AS a, b.doc_id AS b
          FROM ds a JOIN ds b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8),
    e AS MATERIALIZED (SELECT a AS s, b AS dd FROM p UNION ALL SELECT b, a FROM p),
    deg AS MATERIALIZED (SELECT s, COUNT(*) AS dg FROM e GROUP BY s),
    nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM deg),
    r0 AS MATERIALIZED (SELECT s AS node, 1.0 / nn.n AS rank FROM deg CROSS JOIN nn),
    {",".join(steps)}
    SELECT node AS doc_id, ROUND(rank, 6) AS pr FROM {prev}
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """PageRank centrality over the near-dup pair graph (bounded doc
    subset; operators/graph.py::pagerank, 10 power-iteration rounds,
    d=0.85): ranks documents by duplication-neighborhood embeddedness
    — a canonical-selection signal beside quality scores. The driver
    loop builds ONE lazy plan (two key-partitioned shuffles per
    round, zero driver data movement); the oracle is the SAME power
    iteration unrolled to ten SQL aggregates — exact to 6 decimals,
    pinning iteration count, damping, degree normalization, and the
    no-dangling-mass contract."""
    from ..operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    pr = pagerank(D.jaccard_pairs(docs, threshold=0.8))
    return pr.select(F.col("node").alias("doc_id"), "pr")


@query(
    "stats_histogram_equidepth",
    oracle="""
    WITH t AS (
        SELECT l_extendedprice,
               NTILE(16) OVER (
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ) AS bucket
        FROM lineitem)
    SELECT bucket, COUNT(*) AS n_rows,
           ROUND(MIN(l_extendedprice), 2) AS lo,
           ROUND(MAX(l_extendedprice), 2) AS hi
    FROM t GROUP BY bucket
    """,
)
def stats_histogram_equidepth(spark, sf_dir):
    """Exact 16-bucket equi-depth histogram of lineitem prices
    (operators/rank.py::equi_depth_histogram) — the boundary table
    behind optimizer stats and data skipping. The oracle is a global
    NTILE; the Spark side refuses the single-reducer global window
    and computes the SAME buckets via range-partitioned local
    row_numbers + a broadcast partition-offset table (terasort
    decomposition), with NTILE's remainder distribution reproduced in
    Column math. Identical output, scalable plan."""
    from ..operators.rank import equi_depth_histogram

    return equi_depth_histogram(
        load_table(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        k=16,
    )


@query(
    "events_attribution_first_touch",
    oracle="""
    WITH m AS (SELECT user_id, ts, event_id, event_type, value,
                      CASE WHEN lag(ts) OVER w IS NULL
                                OR date_diff('second', lag(ts) OVER w, ts) > 1800
                           THEN 1 ELSE 0 END AS new_sess
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM m),
    f AS (SELECT *, FIRST_VALUE(event_type) OVER (
              PARTITION BY user_id, sess_id ORDER BY ts, event_id) AS first_touch
          FROM s)
    SELECT first_touch, COUNT(*) AS n_purchases,
           ROUND(SUM(value), 2) AS attributed_value
    FROM f WHERE event_type = 'purchase' GROUP BY first_touch
    """,
)
def events_attribution_first_touch(spark, sf_dir):
    """First-touch attribution: every purchase's value credited to
    the event type that OPENED its session (30-min gap sessions, the
    events_sessionize convention). Three windows — gap flag, session
    id, session-first — all share the ONE (user_id) exchange: the
    (user_id, sess_id) window's required clustering is satisfied by
    the user_id hash partitioning (co-location, not key equality), so
    Catalyst plans sorts, not re-shuffles. The purchase filter then
    cuts the stream before the tiny per-channel aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = ev.withColumn("sess_id", sess)
    sw = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    attributed = tagged.withColumn(
        "first_touch", F.first("event_type").over(sw)
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "eval_lang_id_report",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_DTOKS} AS toks FROM documents),
    pr AS (SELECT lang AS gold,
                  CASE WHEN en_cnt >= es_cnt AND en_cnt >= de_cnt AND en_cnt > 0 THEN 'en'
                       WHEN es_cnt >= de_cnt AND es_cnt > 0 THEN 'es'
                       WHEN de_cnt > 0 THEN 'de'
                       ELSE 'und' END AS pred
           FROM (SELECT lang,
                        len(list_filter(toks, x -> list_contains(['the','is','and'], x))) AS en_cnt,
                        len(list_filter(toks, x -> list_contains(['el','la','de'], x))) AS es_cnt,
                        len(list_filter(toks, x -> list_contains(['der','und','das'], x))) AS de_cnt
                 FROM t)),
    cm AS (SELECT gold, pred, COUNT(*) AS n FROM pr GROUP BY gold, pred),
    -- SUM(BIGINT) widens to HUGEINT in DuckDB, which pandas maps to
    -- float64 (70 -> 70.0) while Spark emits int64: the driver's
    -- dtype-strict canon then hash-mismatches every integer column.
    -- ::BIGINT pins the dtype (same pattern as eval_kappa's s.n).
    g AS (SELECT gold AS cls, SUM(n)::BIGINT AS support FROM cm GROUP BY 1),
    p AS (SELECT pred AS cls, SUM(n)::BIGINT AS pred_total FROM cm GROUP BY 1),
    tp AS (SELECT gold AS cls, SUM(n)::BIGINT AS tp FROM cm WHERE gold = pred GROUP BY 1),
    r AS (SELECT cls, COALESCE(support, 0)::BIGINT AS support,
                 COALESCE(pred_total, 0)::BIGINT AS pred_total,
                 COALESCE(tp.tp, 0)::BIGINT AS tp
          FROM g FULL OUTER JOIN p USING (cls) LEFT JOIN tp USING (cls))
    SELECT cls, support, pred_total, tp,
           floor((CASE WHEN pred_total > 0 THEN tp / pred_total ELSE 0.0 END) * 10000) / 10000 AS precision,
           floor((CASE WHEN support > 0 THEN tp / support ELSE 0.0 END) * 10000) / 10000 AS recall,
           floor((CASE WHEN (CASE WHEN pred_total > 0 THEN tp / pred_total ELSE 0.0 END)
                         + (CASE WHEN support > 0 THEN tp / support ELSE 0.0 END) > 0
                      THEN 2.0 * (CASE WHEN pred_total > 0 THEN tp / pred_total ELSE 0.0 END)
                               * (CASE WHEN support > 0 THEN tp / support ELSE 0.0 END)
                           / ((CASE WHEN pred_total > 0 THEN tp / pred_total ELSE 0.0 END)
                              + (CASE WHEN support > 0 THEN tp / support ELSE 0.0 END))
                      ELSE 0.0 END) * 10000) / 10000 AS f1
    FROM r
    """,
)
def eval_lang_id_report(spark, sf_dir):
    """Per-class classification report (support / precision / recall /
    F1) of the heuristic language-ID against the corpus's gold lang
    labels (operators/evalmetrics.py::classification_report over
    textstats.lang_id). One corpus-sized aggregate builds the
    confusion matrix; everything after is classes²-sized algebra —
    the model-quality rollup runs WHERE the predictions live instead
    of exporting per-doc predictions. Classes are the union of gold
    and predicted labels (never-predicted and hallucinated classes
    both appear)."""
    from ..operators import textstats as X
    from ..operators.evalmetrics import classification_report

    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select("doc_id", "lang").join(X.lang_id(docs), "doc_id")
    return classification_report(pred, "lang", "pred_lang")


@query(
    "eval_kappa",
    # same lang-id prediction CTE as eval_lang_id_report; kappa from
    # UNGRIDDED po/pe, display floor-grid 4 dp, pe=1 degenerate -> 0
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_DTOKS} AS toks FROM documents),
    pr AS (SELECT lang AS gold,
                  CASE WHEN en_cnt >= es_cnt AND en_cnt >= de_cnt AND en_cnt > 0 THEN 'en'
                       WHEN es_cnt >= de_cnt AND es_cnt > 0 THEN 'es'
                       WHEN de_cnt > 0 THEN 'de'
                       ELSE 'und' END AS pred
           FROM (SELECT lang,
                        len(list_filter(toks, x -> list_contains(['the','is','and'], x))) AS en_cnt,
                        len(list_filter(toks, x -> list_contains(['el','la','de'], x))) AS es_cnt,
                        len(list_filter(toks, x -> list_contains(['der','und','das'], x))) AS de_cnt
                 FROM t)),
    cm AS (SELECT gold, pred, COUNT(*) AS n FROM pr GROUP BY gold, pred),
    s AS (SELECT SUM(n)::DOUBLE AS n,
                 SUM(CASE WHEN gold = pred THEN n ELSE 0 END)::DOUBLE AS agree
          FROM cm),
    m AS (SELECT COALESCE(g.sup, 0)::DOUBLE AS sup,
                 COALESCE(p.pt, 0)::DOUBLE AS pt
          FROM (SELECT gold AS cls, SUM(n) AS sup FROM cm GROUP BY 1) g
          FULL OUTER JOIN
               (SELECT pred AS cls, SUM(n) AS pt FROM cm GROUP BY 1) p
          USING (cls)),
    pe AS (SELECT SUM(sup * pt) AS pep FROM m)
    SELECT s.n::BIGINT AS n,
           floor((agree / s.n) * 10000) / 10000 AS po,
           floor((pep / (s.n * s.n)) * 10000) / 10000 AS pe,
           floor((CASE WHEN 1.0 - pep / (s.n * s.n) > 0
                 THEN (agree / s.n - pep / (s.n * s.n))
                      / (1.0 - pep / (s.n * s.n))
                 ELSE 0.0 END) * 10000) / 10000 AS kappa
    FROM s CROSS JOIN pe
    """,
)
def eval_kappa(spark, sf_dir):
    """Chance-corrected agreement of the heuristic lang-ID vs gold
    labels (operators/evalmetrics.py::cohens_kappa) — the companion
    number to the per-class report: accuracy a constant predictor can
    inflate, kappa it cannot."""
    from ..operators import textstats as X
    from ..operators.evalmetrics import cohens_kappa

    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select("doc_id", "lang").join(X.lang_id(docs), "doc_id")
    return cohens_kappa(pred, "lang", "pred_lang")


@query(
    "events_window_dedup",
    oracle="""
    WITH t AS (SELECT user_id, event_type, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS prev_ts
               FROM events)
    SELECT event_type, COUNT(*) AS n_kept
    FROM t
    WHERE prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 300
    GROUP BY event_type
    """,
)
def events_window_dedup(spark, sf_dir):
    """Ingestion-time debounce: drop an event when the SAME
    (user, type) fired within the preceding 5 minutes — the batch
    twin of `dropDuplicatesWithinWatermark`'s bounded-window dedup
    semantics (double-click suppression, retry collapse). One lag
    window on the (user, type) key, second-granularity gap (the
    events_sessionize convention: cast-long diff == date_diff
    'second'), then a tiny per-type rollup. Note the chained-debounce
    subtlety this contract pins: the lag is against the previous RAW
    event, not the previous KEPT one — a burst every 4 minutes keeps
    only its first event under kept-anchored semantics but only
    suppresses pairwise here; raw-anchored is the form that needs no
    iteration and matches the streaming state-store behavior."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts").cast("long")).over(w)
    kept = ev.withColumn("__gap", F.col("ts").cast("long") - prev).filter(
        F.col("__gap").isNull() | (F.col("__gap") > 300)
    )
    return kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "events_conversion_latency",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
          GROUP BY e.user_id),
    lat AS (SELECT s.user_id,
                   date_diff('second', s.signup_ts, p.first_purchase_ts) AS sec
            FROM s JOIN p ON s.user_id = p.user_id)
    SELECT COUNT(*) AS n_converted,
           ROUND(quantile_cont(sec, 0.5), 2) AS p50_sec,
           ROUND(quantile_cont(sec, 0.9), 2) AS p90_sec,
           ROUND(AVG(sec), 2) AS avg_sec
    FROM lat
    """,
)
def events_conversion_latency(spark, sf_dir):
    """Signup→purchase conversion latency: per user, first signup to
    first subsequent purchase; exact p50/p90/mean over converted
    users. Two keyed aggregates + one join — the funnel-latency
    rollup growth dashboards run. Exact interpolated percentiles via
    `percentile` (the exact form; `approx_percentile` is the 100 TB
    swap, same call shape) — DuckDB's quantile_cont twin pins the
    interpolation convention."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    lat = s.join(p, "user_id").select(
        (
            F.unix_timestamp("first_purchase_ts")
            - F.unix_timestamp("signup_ts")
        ).alias("sec")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("sec", F.lit(0.5)), 2).alias("p50_sec"),
        F.round(F.percentile("sec", F.lit(0.9)), 2).alias("p90_sec"),
        F.round(F.avg("sec"), 2).alias("avg_sec"),
    )


@query(
    "privacy_erasure_audit",
    oracle="""
    WITH subj AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
    SELECT 'events' AS table_name,
           (SELECT COUNT(*) FROM events) AS rows_before,
           (SELECT COUNT(*) FROM events WHERE user_id IN (SELECT user_id FROM subj)) AS rows_erased,
           (SELECT COUNT(*) FROM events
            WHERE user_id NOT IN (SELECT user_id FROM subj)
              AND user_id IN (SELECT user_id FROM subj)) AS remaining_subject_rows
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders WHERE o_custkey IN (SELECT user_id FROM subj)),
           0
    UNION ALL
    SELECT 'customer',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer WHERE c_custkey IN (SELECT user_id FROM subj)),
           0
    """,
)
def privacy_erasure_audit(spark, sf_dir):
    """Right-to-be-forgotten propagation audit: a deterministic
    synthetic request list (subjects = user_id % 97 == 0, standing in
    for the erasure queue) swept across every table keyed by that
    subject (events.user_id, orders.o_custkey, customer.c_custkey).
    Per table: rows before, rows the erasure removes (broadcast
    semi-join — the subject list is always broadcast-small), and the
    post-erasure subject-row count recomputed FROM the erased frame
    (anti-join then semi-join) — structurally zero, but the audit
    EXECUTES the check rather than asserting it, which is the point
    of an audit. At scale each table is one scan; the erased frames
    are what a MERGE DELETE would commit per table."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    subj = ev.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    bsubj = F.broadcast(subj)

    def audit(df, key, name):
        erased = df.join(bsubj, df[key] == subj["user_id"], "left_anti")
        return (
            df.agg(F.count(F.lit(1)).alias("rows_before"))
            .crossJoin(
                df.join(bsubj, df[key] == subj["user_id"], "left_semi").agg(
                    F.count(F.lit(1)).alias("rows_erased")
                )
            )
            .crossJoin(
                erased.join(
                    bsubj, erased[key] == subj["user_id"], "left_semi"
                ).agg(F.count(F.lit(1)).alias("remaining_subject_rows"))
            )
            .select(
                F.lit(name).alias("table_name"),
                "rows_before",
                "rows_erased",
                F.col("remaining_subject_rows").cast("int").alias(
                    "remaining_subject_rows"
                ),
            )
        )

    return (
        audit(ev, "user_id", "events")
        .unionByName(audit(orders, "o_custkey", "orders"))
        .unionByName(audit(customer, "c_custkey", "customer"))
    )


@query(
    "dq_rule_violations",
    # SUM(CASE) is INT128 in DuckDB -> cast BIGINT; rate = double/double
    # rounded 6 on both engines.
    oracle="""
    WITH j AS (SELECT l.*, o.o_orderdate
               FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey),
    a AS (SELECT COUNT(*) AS n,
                 SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS v1,
                 SUM(CASE WHEN l_tax < 0 OR l_tax > 0.06 THEN 1 ELSE 0 END) AS v2,
                 SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS v3,
                 SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v4,
                 SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS v5
          FROM j)
    SELECT rule, n::BIGINT AS n_checked, v::BIGINT AS n_violations,
           ROUND(v::DOUBLE / n, 6) AS violation_rate
    FROM (SELECT 'bulk_quantity' AS rule, n, v3 AS v FROM a
          UNION ALL SELECT 'discount_above_cap', n, v1 FROM a
          UNION ALL SELECT 'nonpositive_price', n, v4 FROM a
          UNION ALL SELECT 'ship_before_order', n, v5 FROM a
          UNION ALL SELECT 'tax_out_of_band', n, v2 FROM a)
    """,
)
def dq_rule_violations(spark, sf_dir):
    """Rule-driven data-quality conformance audit — the pre-training
    gate that answers "which invariants does this drop violate, and
    how often" BEFORE the data reaches a pipeline. N declarative rules
    (range checks, sign checks, one cross-table referential check)
    compile into ONE aggregate over one scan: each rule is a
    conditional SUM, so partial aggregation collapses map-side and the
    shuffle carries exactly one partial row per map partition whatever
    the corpus size; the only join is the referential rule's
    equi-join, which rides the same shuffle every downstream consumer
    of (order, lineitem) pays anyway. The per-rule unpivot happens on
    the ONE aggregated row (stack), never on data rows. Adding a rule
    at 100 TB costs one more counter in the same pass — not one more
    pass; per-rule sampled EXAMPLES (not counted here) would ride the
    same scan as a conditional collect_list(... LIMIT k) sketch.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    j = li.join(orders, "l_orderkey")

    def v(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    a = j.agg(
        F.count(F.lit(1)).alias("n"),
        v(F.col("l_discount") > 0.08).alias("v1"),
        v((F.col("l_tax") < 0) | (F.col("l_tax") > 0.06)).alias("v2"),
        v(F.col("l_quantity") > 40).alias("v3"),
        v(F.col("l_extendedprice") <= 0).alias("v4"),
        v(F.col("l_shipdate") < F.col("o_orderdate")).alias("v5"),
    )
    return a.select(
        F.expr(
            "stack(5, 'bulk_quantity', v3, 'discount_above_cap', v1,"
            " 'nonpositive_price', v4, 'ship_before_order', v5,"
            " 'tax_out_of_band', v2) AS (rule, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    ).select(
        "rule",
        "n_checked",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_checked"), 6).alias(
            "violation_rate"
        ),
    )


@query(
    "join_cardinality_estimate",
    oracle="""
    WITH e AS (SELECT user_id AS k, COUNT(*) AS c1 FROM events GROUP BY 1),
    o AS (SELECT o_custkey AS k, COUNT(*) AS c2 FROM orders GROUP BY 1)
    SELECT COALESCE(SUM(CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL
                        THEN c1 * c2 END), 0)::BIGINT AS join_rows,
           COUNT(CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL THEN 1 END)
               AS matched_keys,
           COUNT(CASE WHEN c2 IS NULL THEN 1 END) AS left_only_keys,
           COUNT(CASE WHEN c1 IS NULL THEN 1 END) AS right_only_keys,
           MAX(c1 * c2)::BIGINT AS max_key_rows
    FROM e FULL OUTER JOIN o USING (k)
    """,
)
def join_cardinality_estimate(spark, sf_dir):
    """Join pre-flight: the EXACT output cardinality of
    events JOIN orders ON user_id = o_custkey — plus key-overlap and
    worst-key contribution — computed WITHOUT materializing the join.
    Per-side per-key counts reduce each input to its key histogram
    (map-side partial count, shuffle carries one row per key, not per
    data row), then a key-histogram full-outer join does the
    sum-of-products. At 100 TB this is the cheap question you ask
    BEFORE launching a join that might explode: max_key_rows is the
    skew verdict (feeds the salt/AQE decision the same way
    profile_key_skew does), join_rows the output-size verdict. The
    exact form is already sketch-shaped — swapping COUNT(*) for a
    sampled count or CMS estimate changes the numbers' error bar, not
    the plan. Products stay in BIGINT here for oracle parity; the
    100 TB deployment widens to double the way profile_key_skew does
    (ADVICE r3) since c1*c2 can cross 2^63 under hot keys.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    e = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    o = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c2")
    )
    both = F.col("c1").isNotNull() & F.col("c2").isNotNull()
    return (
        e.join(o, "k", "full_outer")
        .agg(
            F.coalesce(F.sum(F.when(both, F.col("c1") * F.col("c2"))), F.lit(0))
            .cast("long")
            .alias("join_rows"),
            F.count(F.when(both, 1)).alias("matched_keys"),
            F.count(F.when(F.col("c2").isNull(), 1)).alias("left_only_keys"),
            F.count(F.when(F.col("c1").isNull(), 1)).alias("right_only_keys"),
            F.max(F.col("c1") * F.col("c2")).cast("long").alias("max_key_rows"),
        )
    )


@query(
    "stream_window_counts",
    # batch GROUP BY day twin of the streaming tumbling-window agg;
    # engine session is UTC and ts is normalized by load_table, so
    # day boundaries agree with DuckDB's naive date_trunc
    oracle="""
    SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
    FROM events GROUP BY 1, 2
    """,
)
def stream_window_counts(spark, sf_dir):
    """Watermarked tumbling-window aggregation executed on the
    STREAMING engine (streaming/events.py::tumbling_counts): 1-day
    windows per event_type over the events file stream, availableNow
    trigger, memory sink — the third streaming registry entry, and the
    one that exercises the windowed-aggregation state store (the other
    two cover dedup state and session_window state). Complete output
    mode makes the drain exact for the bounded test stream; the
    unbounded production form is append mode, where a window emits
    once the watermark passes its end and its state is dropped —
    state is bounded by (windows in the watermark horizon ×
    event_types), not stream length. Sink names are sequenced so
    bench re-runs get fresh memory tables."""
    from ..streaming.events import read_events_stream, run_to_memory, tumbling_counts
    from .extensions import _STREAM_SINK_SEQ

    _STREAM_SINK_SEQ[0] += 1
    name = f"stream_window_sink_{_STREAM_SINK_SEQ[0]}"
    run_to_memory(
        tumbling_counts(read_events_stream(spark, sf_dir)),
        name,
        output_mode="complete",
        state_partitions=8,
    )
    return spark.table(name).select(
        F.col("window_start").cast("date").alias("day"), "event_type", "n", "sv"
    )


@query(
    "join_range_bucketed",
    # independent oracle: DuckDB plans the raw BETWEEN predicate with
    # its IEJoin; the Spark path never sees a nested-loop — same rows
    # either way is exactly what the bucketization must preserve
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_cust,
           ROUND(AVG(c.c_acctbal), 2) AS avg_bal
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 500 AND s.s_acctbal + 500
    GROUP BY s.s_suppkey
    """,
)
def join_range_bucketed(spark, sf_dir):
    """Non-equi range join at scale (`operators/joins.py::
    range_join_bucketed`): customers whose balance falls inside each
    supplier's ±500 band, WITHOUT the BroadcastNestedLoopJoin Spark
    would otherwise plan for a BETWEEN predicate. Intervals explode
    into covering width-500 buckets (≤3 rows each), points own one
    bucket, and the match is a plain hash equi-join on a dense integer
    key + exact predicate recheck — candidate volume tracks local
    interval density, not |A|·|B|, so the same plan stands when both
    sides are fact-sized and neither broadcasts."""
    from ..operators.joins import range_join_bucketed

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 500).alias("lo"),
        (F.col("s_acctbal") + 500).alias("hi"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_acctbal")
    return (
        range_join_bucketed(cust, sup, "c_acctbal", "lo", "hi", bucket_width=500.0)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
    )


def _lpa_oracle(iters: int = 4) -> str:
    """Unrolled synchronous label propagation: each round is a vote
    count + per-node ROW_NUMBER argmax (count DESC, label ASC) — the
    exact tie rule of operators/graph.py::label_propagation."""
    steps = []
    prev = "l0"
    for i in range(1, iters + 1):
        steps.append(
            f"l{i} AS (SELECT node, label FROM ("
            f"SELECT e.dd AS node, l.label, "
            f"ROW_NUMBER() OVER (PARTITION BY e.dd "
            f"ORDER BY COUNT(*) DESC, l.label) AS rn "
            f"FROM e JOIN {prev} l ON e.s = l.node "
            f"GROUP BY e.dd, l.label) WHERE rn = 1)"
        )
        prev = f"l{i}"
    return f"""
    WITH d AS (SELECT doc_id, {_DTOKS} AS raw FROM documents
               WHERE doc_id <= 200),
    ds AS (SELECT doc_id, list_distinct(raw) AS toks FROM d),
    p AS (SELECT a.doc_id AS a, b.doc_id AS b
          FROM ds a JOIN ds b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8),
    e AS (SELECT a AS s, b AS dd FROM p UNION ALL SELECT b, a FROM p),
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM e),
    {",".join(steps)}
    SELECT label, COUNT(*) AS size FROM {prev} GROUP BY label
    """


@query("graph_lpa_communities", oracle=_lpa_oracle())
def graph_lpa_communities(spark, sf_dir):
    """Community detection on the near-dup graph via synchronous
    label propagation (operators/graph.py::label_propagation, 4 fixed
    rounds, min-label ties): communities stop at low-conductance
    cuts, so boilerplate/quote bridges between dense duplicate
    clusters do NOT merge them — the complementary signal to the
    connected-components queries, which merge through every bridge.
    Output is the community size profile. The oracle unrolls the same
    four vote-argmax rounds in SQL — exact integer/label arithmetic,
    no float tolerance anywhere."""
    from ..operators.graph import label_propagation

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    labels = label_propagation(D.jaccard_pairs(docs, threshold=0.8), iters=4)
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


@query(
    "sync_partition_checksums",
    # the oracle restates the checksum algebra in portable SQL — md5
    # slice to BIGINT via the 0x-cast; cross-engine bit-parity of the
    # row hash is the contract under test (sync checks compare
    # DIFFERENT engines more often than not)
    oracle="""
    WITH r AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS part,
               o_orderkey,
               CAST(concat('0x', substr(md5(concat_ws('|',
                   COALESCE(CAST(o_orderkey AS VARCHAR), '(null)'),
                   COALESCE(CAST(o_custkey AS VARCHAR), '(null)'),
                   COALESCE(o_orderstatus, '(null)'),
                   COALESCE(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '(null)'))), 1, 8))
                   AS BIGINT) AS h
        FROM orders),
    src AS (SELECT part, COUNT(*) AS n_src, CAST(SUM(h) AS BIGINT) AS ck_src
            FROM r GROUP BY part),
    dst AS (SELECT part, COUNT(*) AS n_dst, CAST(SUM(h) AS BIGINT) AS ck_dst
            FROM r WHERE o_orderkey % 1000 <> 7 GROUP BY part)
    SELECT part, n_src, n_dst, n_src - n_dst AS missing_rows
    FROM src JOIN dst USING (part)
    WHERE ck_src <> ck_dst OR n_src <> n_dst
    """,
)
def sync_partition_checksums(spark, sf_dir):
    """Anti-entropy replica comparison
    (operators/corpus_diff.py::partition_checksum): both replicas fold
    to one (month, n_rows, checksum) row per partition — a commutative
    32-bit-md5-slice SUM that any engine reproduces bit-for-bit — and
    only MISMATCHED partitions surface for row-level repair. The
    'replica' here is the same orders table with every
    o_orderkey % 1000 == 7 row dropped (a simulated partial-load
    fault); the query returns exactly the damaged months with their
    row deltas. Cost: two aggregations (map-side combined) + a
    months-sized join — the 100 TB sides never meet row-to-row."""
    from ..operators.corpus_diff import partition_checksum

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_date"]
    canon = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("o_date"),
    )
    part = F.trunc("o_date", "month")
    src = partition_checksum(canon, part, cols)
    dst = partition_checksum(
        canon.filter(F.col("o_orderkey") % 1000 != 7), part, cols
    )
    j = src.alias("s").join(dst.alias("d"), "part")
    return (
        j.filter(
            (F.col("s.checksum") != F.col("d.checksum"))
            | (F.col("s.n_rows") != F.col("d.n_rows"))
        )
        .select(
            "part",
            F.col("s.n_rows").alias("n_src"),
            F.col("d.n_rows").alias("n_dst"),
            (F.col("s.n_rows") - F.col("d.n_rows")).alias("missing_rows"),
        )
    )


@query(
    "dq_freshness",
    oracle="""
    WITH mx AS (SELECT event_type, COUNT(*) AS n, MAX(ts) AS last_ts
                FROM events GROUP BY event_type),
    g AS (SELECT MAX(ts) AS global_ts FROM events)
    SELECT event_type, n,
           date_diff('second', last_ts, global_ts) AS lag_s,
           date_diff('second', last_ts, global_ts) > 3600 AS is_stale
    FROM mx CROSS JOIN g
    """,
)
def dq_freshness(spark, sf_dir):
    """Per-stream freshness audit — the first page of every pipeline
    runbook: how far does each event stream lag the most recent
    arrival, and which streams breach the SLO (1 h here). Two
    aggregations (map-side combined, each output is stream-count
    sized) and a broadcast cross join of the ONE-ROW global watermark;
    the 100 TB table is scanned once and never shuffled beyond the
    per-type partials. Second-boundary lag (floor semantics) matches
    DuckDB's date_diff exactly."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
    )
    global_max = ev.agg(F.max("ts").alias("global_ts"))
    lag = F.col("global_ts").cast("long") - F.col("last_ts").cast("long")
    return per_type.crossJoin(F.broadcast(global_max)).select(
        "event_type",
        "n",
        lag.alias("lag_s"),
        (lag > 3600).alias("is_stale"),
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk, COUNT(*) AS n_orphans
    FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders.o_custkey->customer', COUNT(*)
    FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'customer.c_nationkey->nation', COUNT(*)
    FROM customer c ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Foreign-key orphan audit across the star schema — the DQ check
    that gates every warehouse load: rows whose FK has no parent,
    counted per constraint. Each constraint is ONE left-anti join
    projected to the key columns before the join (the scan reads just
    the FK), and the parent sides are broadcast (orders' parent keys
    are customer-sized, nation is tiny; at 100 TB the fact-side
    anti-join stays a broadcast probe — zero fact shuffle). Orphan
    counts are change-sized: 0 rows on a healthy load, and the audit
    emits the count either way so the report is schema-stable."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")

    def orphans(child, parent_keys, on, label):
        return (
            child.join(F.broadcast(parent_keys), on, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    a = orphans(
        li,
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "lineitem.l_orderkey->orders",
    )
    b = orphans(
        orders.select("o_custkey"),
        cust.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "orders.o_custkey->customer",
    )
    c = orphans(
        cust.select("c_nationkey"),
        nation.select(F.col("n_nationkey").alias("c_nationkey")),
        "c_nationkey",
        "customer.c_nationkey->nation",
    )
    return a.unionByName(b).unionByName(c)


@query(
    "events_path_trigrams",
    oracle="""
    WITH s AS (SELECT user_id, event_type AS e1,
                      lead(event_type, 1) OVER w AS e2,
                      lead(event_type, 2) OVER w AS e3
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    t AS (SELECT e1, e2, e3, COUNT(*) AS n FROM s
          WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY e1, e2, e3),
    r AS (SELECT e1, e2, e3, n,
                 ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS rnk
          FROM t)
    SELECT e1, e2, e3, n, rnk FROM r WHERE rnk <= 20
    """,
)
def events_path_trigrams(spark, sf_dir):
    """Sequential pattern mining lite: the top-20 3-step behavior
    paths (event-type trigrams along each user's timeline) — the
    path-analysis staple behind funnels ("what do users actually do
    between view and purchase"). One shuffle on user_id serves both
    lead() windows; the trigram rollup partially aggregates map-side
    (alphabet³ is tiny whatever the event volume); the final top-20
    is a TakeOrdered over the |alphabet|³-sized aggregate, never the
    events. Deterministic (n DESC, path ASC) tie order keeps the
    cut-line stable across engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), "e1", "e2", "e3")
    return (
        paths.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 20)
    )


@query(
    "mine_basket_pairs",
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lp),
    cnt AS (SELECT l_partkey, COUNT(*) AS c1 FROM lp GROUP BY l_partkey),
    pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
           FROM lp a JOIN lp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY pa, pb HAVING COUNT(*) >= 2),
    sc AS (SELECT pa, pb, support,
                  floor(support * n.n_orders
                        / (ca.c1::DOUBLE * cb.c1) * 10000) / 10000 AS lift
           FROM pr JOIN cnt ca ON ca.l_partkey = pr.pa
                   JOIN cnt cb ON cb.l_partkey = pr.pb
                   CROSS JOIN n),
    r AS (SELECT pa, pb, support, lift,
                 ROW_NUMBER() OVER (ORDER BY lift DESC, pa, pb) AS rnk
          FROM sc)
    SELECT pa, pb, support, lift, rnk FROM r WHERE rnk <= 20
    """,
)
def mine_basket_pairs(spark, sf_dir):
    """Market-basket association mining: top-20 part pairs by LIFT
    (co-ordered support x N / item-count product) at min-support 2 —
    the classic recommendations/assortment query. The pair space is
    generated by a SELF-JOIN ON THE BASKET KEY (co-located shuffle:
    candidate volume is sum of per-order line-count squares, never
    |parts|²), item counts join back as a BROADCAST (parts-sized),
    and the top-20 is a TakeOrdered over the surviving min-support
    pairs. The deterministic (lift DESC, pa, pb) order keeps the
    cut-line stable: support-2 pairs tie on lift in bulk."""
    # baskets: ONE shuffle on the basket key (collect_set folds the
    # per-order distinct inline); the same aggregate subtree feeds the
    # pair explosion, the item counts, and the basket count, so AQE
    # plans it once and reuses the exchange — vs the naive
    # self-join-on-orderkey form's four exchanges (distinct + two join
    # sides + pair agg). Pair generation is an array combination
    # per basket: candidate volume is sum(lines_per_order²), never
    # |parts|².
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    cnt = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    combos = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size("ps")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(combos).alias("p"))
        .select(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    scored = (
        pairs.join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("pa"), F.col("c1").alias("ca"))),
            "pa",
        )
        .join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("pb"), F.col("c1").alias("cb"))),
            "pb",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "support",
            # floor-grid, not ROUND: lift is an off-grid double
            # quotient and the top-20 cut line ranks on it — a
            # cross-engine HALF_UP/C-round halfway flip would reorder
            # the cut (same class as q36's min_cost)
            (
                F.floor(
                    F.col("support") * F.col("n_orders")
                    / (F.col("ca").cast("double") * F.col("cb"))
                    * 10000
                )
                / 10000
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.col("lift").desc(), "pa", "pb")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
    )


@query(
    "shard_rendezvous_resize",
    # the oracle restates the argmax with a per-(doc, shard) score
    # table and ROW_NUMBER — hex md5 compares identically as strings
    # in both engines, so the winners agree bit-for-bit
    oracle="""
    WITH s8 AS (SELECT unnest(range(8)) AS s),
    s9 AS (SELECT unnest(range(9)) AS s),
    a8 AS (SELECT doc_id, s AS shard8 FROM (
             SELECT d.doc_id, s8.s,
                    ROW_NUMBER() OVER (PARTITION BY d.doc_id
                        ORDER BY md5(d.doc_id::VARCHAR || '#' || s8.s::VARCHAR) DESC) AS rn
             FROM documents d CROSS JOIN s8) WHERE rn = 1),
    a9 AS (SELECT doc_id, s AS shard9 FROM (
             SELECT d.doc_id, s9.s,
                    ROW_NUMBER() OVER (PARTITION BY d.doc_id
                        ORDER BY md5(d.doc_id::VARCHAR || '#' || s9.s::VARCHAR) DESC) AS rn
             FROM documents d CROSS JOIN s9) WHERE rn = 1)
    SELECT a9.shard9 AS shard,
           COUNT(*) FILTER (a8.shard8 = a9.shard9) AS stayed,
           COUNT(*) FILTER (a8.shard8 <> a9.shard9) AS arrived,
           COUNT(*) AS n_at_9
    FROM a8 JOIN a9 USING (doc_id)
    GROUP BY shard
    """,
)
def shard_rendezvous_resize(spark, sf_dir):
    """Consistent-sharding resize audit
    (operators/sampling.py::rendezvous_shard): assign every document
    to 8 shards and to 9 by rendezvous hashing, then account per final
    shard how many rows stayed vs arrived. The rendezvous guarantee —
    resizing N->N+1 moves ~1/(N+1) of rows and every mover lands ON
    the new shard — shows up directly: 'arrived' is zero for shards
    0-7 and ~n/9 for shard 8. Both assignments are row-local md5
    argmaxes fused into ONE scan (no join, no shuffle before the
    final 9-row rollup) — the modulo-sharding alternative would move
    ~8/9 of 100 TB on the same resize."""
    from ..operators.sampling import rendezvous_shard

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    both = rendezvous_shard(
        rendezvous_shard(d, 8, out_col="shard8"), 9, out_col="shard9"
    )
    return both.groupBy(F.col("shard9").alias("shard")).agg(
        F.count(F.when(F.col("shard8") == F.col("shard9"), 1)).alias("stayed"),
        F.count(F.when(F.col("shard8") != F.col("shard9"), 1)).alias("arrived"),
        F.count(F.lit(1)).alias("n_at_9"),
    )
