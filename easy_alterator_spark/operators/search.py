"""Corpus search: exact phrase lookup and ranked keyword retrieval.

A training-data engine is also the tool you *inspect* the corpus with:
"which documents contain this exact phrase" (contamination forensics,
memorization probes, takedown requests) and "rank documents for these
query terms" (curriculum mining, topical subset extraction). Both are
expressed so the corpus-side work is a scan + row-local projection:

- Phrase lookup needs no index: a w-token phrase occurs at position i
  iff the doc's w-gram at i equals it, so the occurrence count is a
  row-local fold over the gram sequence — ZERO shuffle (the phrase is
  a literal; nothing is even broadcast).
- Repeated search at scale uses a persisted phrase-gram posting table
  bucketed by gram hash (same pattern as the dedup band index,
  operators/dedup.py build_band_index): probing M phrases is a
  broadcast join against bucketed postings — no corpus re-scan, no
  corpus-side exchange.
- Ranked retrieval scores sum(tf · ln(N/df)) over the query terms
  (the TF-IDF weighting of operators/tfidf.py, restricted to the
  query vocabulary): the explode stream is filtered to query terms
  map-side, so the aggregation shuffles only matching (doc, term)
  rows; df comes from the same filtered table; top-k is a
  TakeOrdered, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def _norm_phrase(phrase: str) -> list[str]:
    toks = [t for t in phrase.lower().strip().split() if t]
    if not toks:
        raise ValueError("empty phrase")
    return toks


def phrase_occurrences(
    docs: DataFrame, phrase: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_hits): documents containing the exact token phrase,
    with occurrence counts (overlapping occurrences each count).

    The phrase is normalized with the engine's tokenization rule
    (lowercase whitespace tokens), so matching is token-exact, not
    substring-sloppy: searching "low cost" will not hit "slow cost".
    Row-local — the only post-scan work is the final hit filter.
    """
    import re

    ptoks = _norm_phrase(phrase)
    lit = " ".join(ptoks)
    # Token-exact matching WITHOUT a per-position array fold: collapse
    # whitespace runs to single spaces (the token stream re-joined),
    # pad with sentinel spaces so token boundaries are explicit, and
    # count zero-width-lookahead regex matches — overlapping
    # occurrences each count, same as the gram-fold formulation.
    # One regex pass per doc in codegen vs an INTERPRETED higher-order
    # lambda per token position (HOF lambdas never enter whole-stage
    # codegen): 3.4 s -> 0.13 s on 5k docs at sf0.1.
    # re.escape only backslash-escapes punctuation, which Java regex
    # accepts identically.
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
        F.lit(" "),
    )
    pat = "(?=" + re.escape(" " + lit + " ") + ")"
    n_hits = F.regexp_count(norm, F.lit(pat))
    return (
        docs.select(F.col(id_col).alias("doc_id"), n_hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


def build_phrase_postings(
    docs: DataFrame, w: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(g, doc_id, n_hits): posting rows for every w-token gram of
    every document, keyed by the gram's xxhash64 — the build side of
    the persisted search index.

    Write with sources/bucketing.py ``write_bucketed`` on ``g``; probe
    joins then run bucket-local with no corpus-side exchange
    (tests/test_bucketing.py pins the equivalent band-index shape).
    """
    toks = T.tokens(F.col(text_col))
    # same short-doc guard as phrase_occurrences
    idx = F.sequence(F.lit(0), F.size(toks) - w)
    grams = F.when(
        F.size(toks) >= w,
        F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, w), " "))),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
        .groupBy("g", "doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def probe_phrase_postings(
    postings: DataFrame, phrases: list[str]
) -> DataFrame:
    """(phrase, doc_id, n_hits) for every query phrase: M phrases
    resolved in one broadcast join against the posting table — the
    corpus is never touched. All phrases must share one token width
    (one index per w; mixed widths probe separate indexes)."""
    widths = {len(_norm_phrase(p)) for p in phrases}
    if len(widths) != 1:
        raise ValueError(f"phrases must share one token width, got {sorted(widths)}")
    spark = postings.sparkSession
    q = spark.createDataFrame(
        [(p, " ".join(_norm_phrase(p))) for p in phrases], "phrase string, norm string"
    ).select("phrase", F.xxhash64("norm").alias("g"))
    return postings.join(F.broadcast(q), "g").select("phrase", "doc_id", "n_hits")


def positional_postings(
    docs: DataFrame,
    terms: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, doc_id, pos): one posting row per token occurrence,
    1-based position — the positional inverted index of a classic IR
    engine (vs build_phrase_postings' gram-hash index, which bakes the
    phrase width into the build).

    ``terms`` prunes the explode stream map-side: when probing for a
    known phrase the filter sits directly above the scan, so only the
    phrase's vocabulary ever reaches a shuffle. A persisted full index
    is written bucketed by term (sources/bucketing.py), same as the
    dedup band index.
    """
    toks = T.tokens(F.col(text_col))
    out = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos0", "term")
    ).select("term", "doc_id", (F.col("pos0") + 1).alias("pos"))
    if terms is not None:
        out = out.filter(F.col("term").isin(list(terms)))
    return out


def phrase_search_positional(
    docs: DataFrame, phrase: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_hits) for an exact token phrase via positional-
    posting adjacency joins — the third phrase formulation beside the
    regex fold (phrase_occurrences) and the gram-hash index
    (build_phrase_postings), and the one that generalizes to NEAR/k
    and wildcard slots.

    A phrase t0..t(m-1) matches at anchor a iff term ti occurs at
    a+i for every i, so each term's postings are shifted to their
    anchor (pos - i) and intersected with m-1 inner joins keyed on
    (doc_id, anchor). Scale shape: the postings stream is filtered to
    the phrase vocabulary MAP-SIDE (only matching tokens shuffle);
    every join key includes doc_id, so keys are near-unique and
    skew-free; with a persisted term-bucketed index the joins are
    bucket-local. Overlapping occurrences each count — same
    semantics as phrase_occurrences.
    """
    ptoks = _norm_phrase(phrase)
    post = positional_postings(docs, terms=sorted(set(ptoks)), id_col=id_col, text_col=text_col)
    anchors = None
    for i, t in enumerate(ptoks):
        pi = post.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("anchor")
        )
        anchors = pi if anchors is None else anchors.join(pi, ["doc_id", "anchor"])
    return anchors.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_hits"))


def keyword_search_ranked(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag of query terms, scored by
    sum over matched terms of tf · ln(N / df) (ties -> lowest doc_id).

    Output: (doc_id, n_terms, score) — n_terms is how many distinct
    query terms the doc matched (AND-ish filtering is a post-filter on
    it). The token stream is cut to the query vocabulary BEFORE any
    shuffle; df is per-term document frequency within the corpus.
    """
    qterms = sorted({t for p in terms for t in _norm_phrase(p)})
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(T.tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term").isin(qterms))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.sum(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))), 4).alias(
                "score"
            ),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int,
    k: int = 10,
    m: int = 50,
    c: float = 60.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion: fuse the keyword
    top-m (summed TF-IDF, :func:`keyword_search_ranked`) with the
    vector top-m (cosine to the ``query_vec_id`` embedding) as
    sum of 1/(c + rank) over the lists each doc appears in — the
    fusion Elasticsearch/Vespa ship for BM25+ANN, rank-based so the
    two scores need no scale calibration.

    Output: (doc_id, kw_rank, vec_rank, rrf) top-k by rrf (ties ->
    lowest id); absent-from-list ranks are NULL and contribute 0.

    Scale shape: both arms end in TakeOrderedAndProject(m), so the
    fusion join touches 2m rows regardless of corpus size; the
    keyword arm cuts the token stream to the query vocabulary
    map-side, the vector arm is one row-local cosine pass (swap in
    ivf_topk for an indexed corpus). The query embedding is a one-row
    broadcast, never a shuffle key.
    """
    from pyspark.sql import Window

    from ..functions import vectors as V

    kw = (
        keyword_search_ranked(docs, terms, k=m, id_col=id_col, text_col=text_col)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
            .alias("kw_rank"),
        )
    )
    qv = embeddings.filter(F.col(emb_id_col) == query_vec_id).select(
        V.unit(F.col(vec_col)).alias("qv")
    )
    vec = (
        embeddings.crossJoin(F.broadcast(qv))
        .select(
            F.col(emb_id_col).alias("doc_id"),
            # rank on the 4-decimal cosine: raw doubles differ in the
            # last ulp across engines, which would flip near-tie ranks
            F.round(V.dot(V.unit(F.col(vec_col)), F.col("qv")), 4).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("doc_id"))
        .limit(m)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cos").desc(), F.col("doc_id")))
            .alias("vec_rank"),
        )
    )
    fused = (
        kw.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "kw_rank",
            "vec_rank",
            F.round(
                F.coalesce(1.0 / (c + F.col("kw_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (c + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id")).limit(k)


def keyword_search_bm25(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_rank: bool = False,
) -> DataFrame:
    """Top-k documents under Okapi BM25 — the retrieval scorer the
    plain tf·idf form approximates: tf saturates (k1) and long
    documents are penalized toward the corpus mean length (b).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·|d|/avgdl)),
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the standard
    non-negative form). Same plan discipline as
    :func:`keyword_search_ranked`: the token stream is cut to the
    query vocabulary map-side; doc lengths and the corpus aggregate
    (N, avgdl) are a per-doc projection and a broadcast 1-row
    aggregate respectively — the only shuffle is the (doc, term) tf
    aggregation. Output: (doc_id, n_terms, score).
    """
    qterms = sorted({t for p in terms for t in _norm_phrase(p)})
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        T.tokens(F.col(text_col)).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(idf * sat).alias("raw_score"),
        )
    )
    # order by the UNROUNDED sum (mirrors the oracle's ROW_NUMBER
    # ordering); round only in the projected output — rounding-created
    # ties near the top-k boundary would otherwise resolve differently
    # than the oracle's raw-score ranking.
    if with_rank:
        from pyspark.sql import Window

        # top-k FIRST via orderBy+limit (distributed TakeOrdered), so
        # the rank window — a 1-task global sort by construction —
        # only ever sees k rows, never the corpus-sized score table
        topk = scored.orderBy(F.col("raw_score").desc(), F.col("doc_id")).limit(k)
        w = Window.orderBy(F.col("raw_score").desc(), F.col("doc_id"))
        return topk.withColumn("rank", F.row_number().over(w)).select(
            "doc_id",
            "n_terms",
            F.round("raw_score", 4).alias("score"),
            "rank",
        )
    return (
        scored.orderBy(F.col("raw_score").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "n_terms", F.round("raw_score", 4).alias("score"))
    )


def keyword_search_bm25_runs(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(q_term, doc_id, rank): per-term BM25 top-k run lists for
    SEVERAL single-term queries in ONE corpus pass — the eval-harness
    shape (r11). Looping :func:`keyword_search_bm25` per term re-scans
    and re-tokenizes the corpus once per query term (measured: 3x the
    whole BM25 pipeline for search_eval_metrics' three terms); here
    tokenize/tf/df/stats are computed once and the per-term top-k is a
    row_number window PARTITIONED by term — partition-sized in df(t),
    the standard per-key top-k, never an empty-partition global sort.

    Score and ordering are expression-identical to the single-term
    ``keyword_search_bm25(..., with_rank=True)`` runs: one term's
    score is its single idf·sat summand, and ranks order by
    (raw_score DESC, doc_id), so the fused output is bit-equal to the
    unioned per-term loop (pinned in tests/test_round11_optim.py).
    """
    qterms = sorted({t for p in terms for t in _norm_phrase(p)})
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        T.tokens(F.col(text_col)).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", (idf * sat).alias("raw_score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy(
        F.col("raw_score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("term").alias("q_term"), "doc_id", "rank")
    )


def build_inverted_index(
    docs: DataFrame,
    max_postings: int = 10,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted index over the corpus: per term, document frequency
    and a CAPPED ordered posting list (the first ``max_postings`` doc
    ids) — the build step behind phrase/keyword probing at scale.

    The posting cap is enforced BEFORE collection: a row_number window
    per term ranks postings by doc id, and ``collect_list`` gathers
    only ranks <= cap (collect_list drops the null branch of the
    ``when``), so no executor ever materializes a hot term's full
    posting array — with a million-document stopword term, an uncapped
    ``collect_set`` is an OOM. The window and the groupBy share the
    (term) partitioning, so Catalyst plans ONE exchange for both.
    Full (uncapped) posting storage at scale is a bucketed table
    keyed by term hash instead — see build_phrase_postings.
    """
    from pyspark.sql import Window

    postings = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(T.tokens(F.col(text_col)))).alias("term"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = postings.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("__rn") <= max_postings, F.col("doc_id"))
                )
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def ranking_metrics(
    runs: DataFrame,
    truth: DataFrame,
    k: int = 20,
    query_col: str = "q_term",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval quality of a ranked run against graded
    relevance judgments: MRR, nDCG@k (linear gain), recall@k — the
    offline eval loop every retrieval stack (and every RAG data
    pipeline) runs before swapping rankers.

    ``runs``: (query, doc, rank) with rank 1-based within each query;
    ``truth``: (query, doc, rel) with rel > 0 for relevant docs.
    Linear-gain DCG (gain = rel, discount = log2(rank+1)) rather than
    the 2^rel form — graded tf-style judgments make exponential gain
    overflow-prone and both conventions are standard (TREC uses
    either; the convention is pinned here and in the oracle).

    Shape: one (query, doc)-keyed join of the k·|queries|-row run
    against the judgments, one window over the judgments for the
    ideal ordering, two (query)-keyed aggregates — every stage is
    keyed by query, nothing is corpus-sized after the judgment join.
    Queries with no relevant docs report ndcg/recall 0 (idcg = 0
    guard), mrr 0.
    """
    from pyspark.sql import Window

    r = runs.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rank_col).alias("rk"),
    ).filter(F.col("rk") <= k)
    t = truth.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rel_col).alias("rel"),
    ).filter(F.col("rel") > 0)
    joined = r.join(t, ["q", "d"], "left").withColumn(
        "rel", F.coalesce(F.col("rel"), F.lit(0.0))
    )
    got = joined.groupBy("q").agg(
        F.sum(F.col("rel") / F.log2(F.col("rk") + 1)).alias("dcg"),
        F.max(
            F.when(F.col("rel") > 0, 1.0 / F.col("rk")).otherwise(0.0)
        ).alias("mrr"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("hits"),
    )
    iw = Window.partitionBy("q").orderBy(F.col("rel").desc(), F.col("d"))
    ideal = (
        t.withColumn("irk", F.row_number().over(iw))
        .groupBy("q")
        .agg(
            F.sum(
                F.when(
                    F.col("irk") <= k,
                    F.col("rel") / F.log2(F.col("irk") + 1),
                ).otherwise(0.0)
            ).alias("idcg"),
            F.count(F.lit(1)).alias("n_rel"),
        )
    )
    return (
        got.join(ideal, "q", "left")
        .select(
            F.col("q").alias(query_col),
            F.round("mrr", 4).alias("mrr"),
            F.round(
                F.when(
                    F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                    F.col("dcg") / F.col("idcg"),
                ).otherwise(0.0),
                4,
            ).alias("ndcg"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                    F.col("hits") / F.col("n_rel"),
                ).otherwise(0.0),
                4,
            ).alias("recall"),
        )
        .orderBy(query_col)
    )
