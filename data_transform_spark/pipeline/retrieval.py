"""Retrieval surface — lexical BM25 ranking and hybrid lexical+vector
fusion (Reciprocal Rank Fusion), the RAG-era query path over a curated
corpus: BM25 for exact-term recall, embedding cosine for semantic recall,
RRF to merge the two rankings without score calibration (Cormack et al.,
SIGIR'09 — the fusion every production hybrid search ships first).

Determinism discipline: every ranking orders by (round(score, 6) DESC,
id) so sub-ulp float divergence between engines can never flip a rank;
RRF terms are 1/(K+rank) of INTEGER ranks — IEEE division of integers is
correctly rounded identically on both engines — summed in a fixed order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
BM25_QUERY = ("hash", "order", "window", "table", "big")  # fixed query terms
_BM25_Q_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)

RRF_K = 60  # the standard RRF constant
RRF_N_QUERIES = 20  # query docs: id < 20 (the N_QUERIES convention)
RRF_SYS_TOPK = 50  # depth of each system's ranking fed into the fusion
RRF_TOPK = 10  # fused results returned per query


def _bm25_scored_sql() -> str:
    """Per-doc BM25 vs the fixed query — shared CTE chain (documents)."""
    return f"""
    d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM d),
    stats AS (
        SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
        WHERE tok IN ({_BM25_Q_SQL})
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({BM25_K1} + 1)
                   / (tf.tf + {BM25_K1}
                      * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
               ), 6) AS score
        FROM tf
        JOIN df USING (tok)
        JOIN dl USING (doc_id), stats s
        GROUP BY tf.doc_id
    )"""


@register(
    "text_bm25",
    oracle=f"""
    WITH {_bm25_scored_sql()}
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank,
           doc_id, score
    FROM scored
    QUALIFY rank <= {BM25_TOPK}
    """,
)
def text_bm25(spark, sf_dir):
    """BM25 ranking (Robertson/Sparck-Jones, the lexical-retrieval
    standard) of the corpus against a fixed {len(BM25_QUERY)}-term query:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the Lucene non-negative
    form), tf saturation k1={BM25_K1}, length normalization b={BM25_B}
    against the corpus mean doc length, top-{BM25_TOPK} by
    (rounded score, doc_id).

    Plan: one token explode FILTERED to the query terms before the
    (doc, term) count (Catalyst pushes the IN filter below the
    aggregation, so the shuffle carries only query-term hits — at 100 TB
    that is |terms| postings, not the corpus token stream); df and the
    N/avgdl stats are broadcast 1-row/|terms|-row frames; one doc-keyed
    sum; one top-k window. The same shape serves ad-hoc queries by
    swapping the literal list for a broadcast term frame."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    dl = d.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term = idf * F.col("tf") * (BM25_K1 + 1) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term), 6).alias("score"))
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("rank", "doc_id", "score")
    )


def _rrf_oracle() -> str:
    from data_transform_spark.pipeline.similarity import _sql_cos

    cos = _sql_cos("q.emb", "c.emb")
    return f"""
    WITH corpus AS (
        SELECT d.doc_id AS id, string_split(d.text, ' ') AS toks,
               CAST(e.embedding AS DOUBLE[]) AS emb
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    dl AS (SELECT id, len(toks) AS dl FROM corpus),
    stats AS (
        SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl
    ),
    queries AS (SELECT * FROM corpus WHERE id < {RRF_N_QUERIES}),
    qterms AS (
        SELECT DISTINCT id AS qid, unnest(toks) AS tok FROM queries
    ),
    ctok AS (
        SELECT id, tok, count(*) AS tf
        FROM (SELECT id, unnest(toks) AS tok FROM corpus)
        GROUP BY id, tok
    ),
    df AS (
        SELECT tok, count(*) AS df FROM ctok
        WHERE tok IN (SELECT tok FROM qterms)
        GROUP BY tok
    ),
    lex_scored AS (
        SELECT q.qid, c.id,
               round(sum(
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * c.tf * ({BM25_K1} + 1)
                   / (c.tf + {BM25_K1}
                      * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
               ), 6) AS score
        FROM qterms q
        JOIN ctok c USING (tok)
        JOIN df USING (tok)
        JOIN dl ON dl.id = c.id, stats s
        WHERE c.id <> q.qid
        GROUP BY q.qid, c.id
    ),
    lex_rank AS (
        SELECT qid, id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, id) AS r
        FROM lex_scored QUALIFY r <= {RRF_SYS_TOPK}
    ),
    vec_scored AS (
        SELECT q.id AS qid, c.id, round({cos}, 6) AS score
        FROM queries q JOIN corpus c ON c.id <> q.id
    ),
    vec_rank AS (
        SELECT qid, id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, id) AS r
        FROM vec_scored QUALIFY r <= {RRF_SYS_TOPK}
    ),
    fused AS (
        SELECT COALESCE(l.qid, v.qid) AS query_id,
               COALESCE(l.id, v.id) AS id,
               round(COALESCE(1.0 / ({RRF_K} + l.r), 0)
                     + COALESCE(1.0 / ({RRF_K} + v.r), 0), 9) AS rrf_score,
               CAST(COALESCE(l.r, 0) AS BIGINT) AS lex_rank,
               CAST(COALESCE(v.r, 0) AS BIGINT) AS vec_rank
        FROM lex_rank l FULL OUTER JOIN vec_rank v
          ON l.qid = v.qid AND l.id = v.id
    )
    SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, id) AS BIGINT)
               AS rank,
           id, rrf_score, lex_rank, vec_rank
    FROM fused
    QUALIFY rank <= {RRF_TOPK}
    """


def _rrf_corpus(spark, sf_dir):
    """The retrieval corpus — documents that carry an embedding, with
    token array and double-cast embedding (shared by _rrf_rankings and
    the graded-qrel construction so the two can never drift)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    return d.join(e, "doc_id").select(
        F.col("doc_id").alias("id"), "toks", "emb"
    )


def _vec_scored_pairs(corpus):
    """All (query, candidate) cosine pairs — queries broadcast against the
    corpus, self excluded, scores rounded to 6dp (the cross-engine rank
    discipline). Feeds both the vector ranking and the graded-qrel
    cosine band."""
    from data_transform_spark.pipeline.similarity import _cos

    q_emb = corpus.filter(F.col("id") < RRF_N_QUERIES).select(
        F.col("id").alias("qid"), F.col("emb").alias("q_emb")
    )
    return (
        F.broadcast(q_emb)
        .join(corpus.select("id", "emb"), F.col("id") != F.col("qid"))
        .select(
            "qid",
            "id",
            F.round(_cos(F.col("q_emb"), F.col("emb")), 6).alias("score"),
        )
    )


def _rrf_rankings(spark, sf_dir):
    """Hybrid retrieval with Reciprocal Rank Fusion: for each query doc
    (id < {RRF_N_QUERIES}, over the documents ⋈ embeddings corpus — docs
    that carry an embedding), rank the corpus TWICE — lexically (BM25 of
    the query doc's distinct terms, self excluded) and semantically
    (embedding cosine) — keep each system's top {RRF_SYS_TOPK}, and fuse
    with RRF: score(d) = Σ_sys 1/({RRF_K} + rank_sys(d)), absent docs
    contributing 0. Output: top {RRF_TOPK} fused per query with both
    source ranks (0 = not retrieved by that system) — the
    rank-not-score fusion that needs no calibration between BM25's
    unbounded scores and cosine's [-1, 1].

    Scale shape: the lexical side joins the corpus postings to a
    broadcast (query, term) frame — |queries|·|terms| is the RAG-query
    working set, corpus-sized work is the one posting aggregate; the
    vector side is the broadcast-query cosine scan (sim_topk_bruteforce's
    plan; at 100 TB swap in the staged IVF-PQ serve path — same
    (qid, id, rank) contract, which is the point of fusing on RANKS).
    Rankings use (round(score, 6) DESC, id) so cross-engine sub-ulp float
    noise cannot reorder; RRF terms divide integers (IEEE-identical both
    engines) and sum in fixed order."""
    # r14 note: persisting the corpus join + postings frame here was
    # A/B-measured (profile_bench, 4 reps each way) at NO win — unlike
    # the broadcast-separated ANN summaries, the rrf subtrees meet at
    # shuffle joins where Spark's exchange reuse already deduplicates —
    # so the frames stay unpersisted.
    corpus = _rrf_corpus(spark, sf_dir)
    dl = corpus.select("id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    queries = corpus.filter(F.col("id") < RRF_N_QUERIES)
    qterms = (
        queries.select(F.col("id").alias("qid"), F.explode("toks").alias("tok"))
        .distinct()
    )
    ctok = (
        corpus.select("id", F.explode("toks").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = ctok.join(F.broadcast(qterms.select("tok").distinct()), "tok").groupBy(
        "tok"
    ).agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term = idf * F.col("tf") * (BM25_K1 + 1) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    lex_scored = (
        F.broadcast(qterms)
        .join(ctok, "tok")
        .filter(F.col("id") != F.col("qid"))
        .join(F.broadcast(df), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "id")
        .agg(F.round(F.sum(term), 6).alias("score"))
    )
    w_sys = Window.partitionBy("qid").orderBy(F.col("score").desc(), "id")
    lex_rank = (
        lex_scored.withColumn("r", F.row_number().over(w_sys))
        .filter(F.col("r") <= RRF_SYS_TOPK)
        .select("qid", "id", "r")
    )
    vec_scored = _vec_scored_pairs(corpus)
    vec_rank = (
        vec_scored.withColumn("r", F.row_number().over(w_sys))
        .filter(F.col("r") <= RRF_SYS_TOPK)
        .select("qid", "id", "r")
    )
    l = lex_rank.alias("l")
    v = vec_rank.alias("v")
    fused = (
        l.join(
            v,
            (F.col("l.qid") == F.col("v.qid")) & (F.col("l.id") == F.col("v.id")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("l.qid"), F.col("v.qid")).alias("query_id"),
            F.coalesce(F.col("l.id"), F.col("v.id")).alias("id"),
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("l.r")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("v.r")), F.lit(0.0)),
                9,
            ).alias("rrf_score"),
            F.coalesce(F.col("l.r"), F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce(F.col("v.r"), F.lit(0)).cast("long").alias("vec_rank"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), "id")
    fused_ranked = (
        fused.withColumn("rank", F.row_number().over(w_f).cast("long"))
        .filter(F.col("rank") <= RRF_TOPK)
        .select("query_id", "rank", "id", "rrf_score", "lex_rank", "vec_rank")
    )
    return lex_rank, vec_rank, fused_ranked


@register("search_hybrid_rrf", oracle=_rrf_oracle())
def search_hybrid_rrf(spark, sf_dir):
    """The registered RRF key — the fused top-{RRF_TOPK} per query (full
    contract + plan story in _rrf_rankings, which also exposes the two
    member rankings so search_eval_labels can score all three systems
    without rebuilding the pipeline)."""
    _lex, _vec, fused_ranked = _rrf_rankings(spark, sf_dir)
    return fused_ranked


# --- MMR diversity re-ranking (Carbonell & Goldstein, SIGIR'98) -----------

MMR_K = 10  # diversified results per query
MMR_CAND = 20  # relevance shortlist fed into the greedy selection
MMR_N_QUERIES = 20  # query vectors: vec_id < 20 (the N_QUERIES convention)
# lambda = 0.7 carried as the EXACT integer split 7/3 (x10 scale): the
# greedy argmax compares 7*rel_u - 3*max_sim_u — pure integer arithmetic
# over the 6dp-quantized cosines, so the selection cascade can never
# diverge across engines on a rounding mode


def _mmr_oracle() -> str:
    from data_transform_spark.pipeline.similarity import _sql_cos

    relc = _sql_cos("q.q_emb", "c.emb")
    simc = _sql_cos("ea.emb", "eb.emb")
    return f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, emb AS q_emb FROM e
          WHERE vec_id < {MMR_N_QUERIES}),
    rel0 AS (
        SELECT q.qid, c.vec_id AS id, round({relc}, 6) AS rel
        FROM q JOIN e c ON c.vec_id <> q.qid
    ),
    cand AS (
        SELECT qid, id, rel,
               CAST(round(rel * 1000000) AS BIGINT) AS rel_u
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                           ORDER BY rel DESC, id) AS rn
              FROM rel0)
        WHERE rn <= {MMR_CAND}
    ),
    sims AS (
        SELECT a.qid, a.id AS ia, b.id AS ib,
               CAST(round(round({simc}, 6) * 1000000) AS BIGINT) AS sim_u
        FROM cand a JOIN cand b ON a.qid = b.qid AND a.id <> b.id
        JOIN e ea ON ea.vec_id = a.id
        JOIN e eb ON eb.vec_id = b.id
    ),
    seed AS (
        SELECT qid, [arg_max(id, rel_u * 1000000000 - id)] AS sel
        FROM cand GROUP BY qid
    ),
    mmr(it, qid, sel) AS (
        SELECT 1, qid, sel FROM seed
        UNION ALL
        SELECT m.it + 1, m.qid,
               list_append(m.sel, arg_max(c.id,
                   (7 * c.rel_u - 3 * (
                       SELECT max(s.sim_u) FROM sims s
                       WHERE s.qid = m.qid AND s.ia = c.id
                         AND list_contains(m.sel, s.ib)
                   )) * 1000000000 - c.id))
        FROM mmr m JOIN cand c
          ON c.qid = m.qid AND NOT list_contains(m.sel, c.id)
        WHERE m.it < {MMR_K}
        GROUP BY m.it, m.qid, m.sel
    ),
    final AS (
        SELECT qid, sel FROM mmr
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY it DESC) = 1
    )
    SELECT f.qid AS query_id, CAST(u.i AS BIGINT) AS rank,
           f.sel[u.i] AS id
    FROM final f,
         unnest(generate_series(1, len(f.sel))) AS u(i)
    """


@register("sim_mmr_diversify", oracle=_mmr_oracle())
def sim_mmr_diversify(spark, sf_dir):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98) — the diversity stage after retrieval: from each query's
    cosine top-{MMR_CAND} shortlist, greedily select {MMR_K} results, each
    maximizing lambda*relevance - (1-lambda)*max-similarity-to-already-
    selected (lambda = 0.7) — so near-duplicate hits can't crowd the
    result page, the de-redundancy knob every RAG retriever ships.

    Determinism across engines: cosines quantize to 6 dp ONCE, then the
    entire greedy cascade runs in INTEGER arithmetic — the argmax key is
    (7*rel_u - 3*max_sim_u)*1e9 - id, exact in BIGINT — because a greedy
    selection amplifies any divergence (one flipped pick reorders the
    rest), float comparisons anywhere in the loop would be a cross-engine
    hash hazard. The DuckDB twin replays the same cascade as a recursive
    CTE carrying the selected list.

    Scale shape: the corpus-sized work is the relevance scan (broadcast
    queries — or the staged ANN serve path at 100 TB, same shortlist
    contract); the pairwise-sims join and the greedy loop run on
    shortlist-sized frames (|Q| x {MMR_CAND}²), computed per query INSIDE
    a cogrouped applyInPandas — the sequential selection never touches
    the driver and parallelizes across queries."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return _mmr_rerank(e, _mmr_exact_shortlist(e))


def _mmr_exact_shortlist(e):
    """The exact relevance shortlist: broadcast query panel (vec_id <
    MMR_N_QUERIES), 6dp-rounded cosine, top-MMR_CAND per query —
    (qid, id, rel, rel_u). Split from sim_mmr_diversify so the ANN serve
    path can supply its own shortlist to the same greedy (r11 VERDICT
    #7; see api.mmr_over_ann + the composition test)."""
    from data_transform_spark.pipeline.similarity import _cos

    q = e.filter(F.col("vec_id") < MMR_N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("q_emb")
    )
    rel0 = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("id"),
            F.round(_cos(F.col("q_emb"), F.col("emb")), 6).alias("rel"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "id")
    return (
        rel0.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_CAND)
        .select(
            "qid", "id", "rel",
            F.round(F.col("rel") * 1000000).cast("long").alias("rel_u"),
        )
    )


def _mmr_rerank(e, cand):
    """The MMR pairwise-sims + integer greedy over ANY (qid, id, rel_u)
    shortlist frame — a PURE FUNCTION of the shortlist: identical
    shortlists (same id sets, same rel_u) produce identical diversified
    rankings whatever generator (exact scan or staged ANN serve)
    produced them. That purity is what makes the exact→ANN candidate
    swap a drop-in at 100 TB, and it is pinned by the composition test
    (tests/test_pipeline.py::TestMmrOverAnn)."""
    from data_transform_spark.pipeline.similarity import _cos

    # r14 (guide §5): the shortlist feeds three subtrees (both sides of
    # the pairwise-sims self-join + the cogroup's relevance side) —
    # persist the |Q|·MMR_CAND-row frame so whatever produced it (the
    # exact broadcast scan here, the ANN serve path at 100 TB) runs once
    # per action instead of three times.
    from data_transform_spark.pipeline.e2e import _persist_share

    cand = _persist_share(cand, eager=True)

    # fresh column objects for the self-join (failAmbiguousSelfJoin trap)
    a = cand.select(F.col("qid").alias("qa"), F.col("id").alias("ia")).select(
        F.col("qa").alias("qid"), "ia"
    )
    b = cand.select(F.col("qid").alias("qb"), F.col("id").alias("ib"))
    sims = (
        a.join(b, (F.col("qid") == F.col("qb")) & (F.col("ia") != F.col("ib")))
        .join(e.select(F.col("vec_id").alias("ia"), F.col("emb").alias("ea")), "ia")
        .join(e.select(F.col("vec_id").alias("ib"), F.col("emb").alias("eb")), "ib")
        .select(
            "qid", "ia", "ib",
            F.round(F.round(_cos(F.col("ea"), F.col("eb")), 6) * 1000000)
            .cast("long")
            .alias("sim_u"),
        )
    )

    def greedy(key, crel, csim):
        import pandas as _pd

        qid = int(key[0])
        rel_u = dict(zip(crel["id"].astype(int), crel["rel_u"].astype(int)))
        sim = {
            (int(x), int(y)): int(s)
            for x, y, s in zip(csim["ia"], csim["ib"], csim["sim_u"])
        }
        remaining = set(rel_u)
        first = max(remaining, key=lambda i: (rel_u[i], -i))
        sel = [first]
        remaining.discard(first)
        while len(sel) < MMR_K and remaining:
            nxt = max(
                remaining,
                key=lambda i: (
                    7 * rel_u[i] - 3 * max(sim[(i, j)] for j in sel),
                    -i,
                ),
            )
            sel.append(nxt)
            remaining.discard(nxt)
        return _pd.DataFrame(
            [(qid, r + 1, i) for r, i in enumerate(sel)],
            columns=["query_id", "rank", "id"],
        )

    return (
        cand.groupBy("qid")
        .cogroup(sims.groupBy("qid"))
        .applyInPandas(greedy, "query_id long, rank long, id long")
    )


# --- retrieval evaluation against label relevance --------------------------

EVAL_K = 10  # precision/recall cutoff (== RRF_TOPK, each system's page 1)


def _search_eval_oracle() -> str:
    """Rewrap _rrf_oracle's final SELECT as a CTE (the v4 string-surgery
    precedent), then score all three systems' top-EVAL_K against the
    label-relevance truth."""
    rrf_sql = _rrf_oracle()
    ctes, final = rrf_sql.split("\n    SELECT query_id,", 1)
    return f"""{ctes},
    rrf_ranked AS (
        SELECT query_id,{final}
    ),
    labels AS (
        SELECT e.vec_id AS id, e.label
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ),
    qlab AS (SELECT id AS qid, label AS qlabel FROM labels
             WHERE id < {RRF_N_QUERIES}),
    nrel AS (
        SELECT q.qid, CAST(count(*) AS BIGINT) AS n_rel
        FROM qlab q JOIN labels l ON l.label = q.qlabel AND l.id <> q.qid
        GROUP BY q.qid
    ),
    sys AS (
        SELECT 'bm25' AS system, qid, id FROM lex_rank WHERE r <= {EVAL_K}
        UNION ALL
        SELECT 'cosine', qid, id FROM vec_rank WHERE r <= {EVAL_K}
        UNION ALL
        SELECT 'rrf', query_id AS qid, id FROM rrf_ranked
        WHERE rank <= {EVAL_K}
    ),
    hits AS (
        SELECT s.system, s.qid,
               CAST(count(CASE WHEN l.label = q.qlabel THEN 1 END)
                    AS BIGINT) AS h
        FROM sys s JOIN labels l USING (id) JOIN qlab q USING (qid)
        GROUP BY s.system, s.qid
    ),
    perq AS (
        SELECT h.system, h.qid, h.h, n.n_rel,
               CAST(floor((2 * h.h * 1000000 + n.n_rel) / (2.0 * n.n_rel))
                    AS BIGINT) AS r_u
        FROM hits h JOIN nrel n USING (qid)
    ),
    rnd AS (
        SELECT 'random' AS system, n.qid,
               CAST(floor((2 * n.n_rel * 1000000 + (t.N - 1))
                          / (2.0 * (t.N - 1))) AS BIGINT) AS p_u,
               CAST(floor((2 * {EVAL_K} * 1000000 + (t.N - 1))
                          / (2.0 * (t.N - 1))) AS BIGINT) AS r_u
        FROM nrel n, (SELECT count(*) AS N FROM labels) t
    )
    SELECT system, CAST(count(*) AS BIGINT) AS n_queries,
           CAST({EVAL_K} AS BIGINT) AS k,
           CAST(floor((2 * sum(h) * 1000000 + count(*) * {EVAL_K})
                      / (2.0 * count(*) * {EVAL_K})) AS BIGINT)
               AS macro_p_at_k_u,
           CAST(floor((2 * sum(r_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT) AS macro_r_at_k_u
    FROM perq GROUP BY system
    UNION ALL
    SELECT system, CAST(count(*) AS BIGINT), CAST({EVAL_K} AS BIGINT),
           CAST(floor((2 * sum(p_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT),
           CAST(floor((2 * sum(r_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT)
    FROM rnd GROUP BY system
    """


@register("search_eval_labels", oracle=_search_eval_oracle())
def search_eval_labels(spark, sf_dir):
    """Retrieval EVALUATION — the measure-before-you-trust rung for the
    search family (what dedup_bakeoff is for dedup and tokenize_bakeoff
    for tokenizers): score BM25, embedding cosine, and the RRF fusion on
    the SAME query panel against label relevance — a result is relevant
    to query doc q iff its embedding shares q's label (vec_id == doc_id,
    the fixture convention; every label has enough members that
    recall@{EVAL_K} is meaningful). Per system: macro precision@{EVAL_K}
    (exact single ratio: Σhits / (|Q|·k)) and macro recall@{EVAL_K}
    (integer mean of per-query half-up recall units — denominators
    differ per query, so the mean-of-ratios is taken over already-
    quantized integers, deterministic in any order).

    The three rankings come from _rrf_rankings VERBATIM (one pipeline
    run scores all systems — the fused key and this eval can never
    drift apart). Honesty note: label relevance is a PROXY qrel (the
    fixture ships no graded judgments); what the table certifies is the
    RELATIVE ordering of the systems under a consistent truth, which is
    what an operator compares retriever variants with."""
    lex, vec, rrf = _rrf_rankings(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "label"
    )
    d_ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    labels = e.join(d_ids, "id")
    qlab = labels.filter(F.col("id") < RRF_N_QUERIES).select(
        F.col("id").alias("qid"), F.col("label").alias("qlabel")
    )
    la = labels.select(F.col("id").alias("rel_id"), F.col("label").alias("rl"))
    nrel = (
        qlab.join(
            la,
            (F.col("rl") == F.col("qlabel")) & (F.col("rel_id") != F.col("qid")),
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    )
    sys = (
        lex.filter(F.col("r") <= EVAL_K)
        .select(F.lit("bm25").alias("system"), "qid", "id")
        .unionByName(
            vec.filter(F.col("r") <= EVAL_K).select(
                F.lit("cosine").alias("system"), "qid", "id"
            )
        )
        .unionByName(
            rrf.filter(F.col("rank") <= EVAL_K).select(
                F.lit("rrf").alias("system"),
                F.col("query_id").alias("qid"),
                "id",
            )
        )
    )
    hits = (
        sys.join(labels, "id")
        .join(F.broadcast(qlab), "qid")
        .groupBy("system", "qid")
        .agg(
            F.sum(F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0))
            .cast("long")
            .alias("h")
        )
    )
    perq = hits.join(F.broadcast(nrel), "qid").select(
        "system",
        "h",
        F.floor(
            (2 * F.col("h") * F.lit(1_000_000) + F.col("n_rel"))
            / (2.0 * F.col("n_rel"))
        )
        .cast("long")
        .alias("r_u"),
    )
    nq = F.count(F.lit(1))
    systems = perq.groupBy("system").agg(
        nq.cast("long").alias("n_queries"),
        F.lit(EVAL_K).cast("long").alias("k"),
        F.floor(
            (2 * F.sum("h") * F.lit(1_000_000) + nq * EVAL_K)
            / (2.0 * nq * EVAL_K)
        )
        .cast("long")
        .alias("macro_p_at_k_u"),
        F.floor((2 * F.sum("r_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_r_at_k_u"),
    )
    # analytic 'random' baseline row: K draws without replacement give
    # expected hits K*n_rel/(N-1), so expected P@K = n_rel/(N-1) and
    # expected R@K = K/(N-1) per query — quantized per query, then the
    # same integer means as the recall path (the row that makes the
    # table self-interpreting: a system below it is worse than chance)
    n_corpus = labels.agg(F.count(F.lit(1)).alias("N"))
    rnd = nrel.crossJoin(F.broadcast(n_corpus)).select(
        F.floor(
            (2 * F.col("n_rel") * F.lit(1_000_000) + (F.col("N") - 1))
            / (2.0 * (F.col("N") - 1))
        )
        .cast("long")
        .alias("p_u"),
        F.floor(
            (2 * EVAL_K * F.lit(1_000_000) + (F.col("N") - 1))
            / (2.0 * (F.col("N") - 1))
        )
        .cast("long")
        .alias("r_u"),
    )
    rnd_row = rnd.agg(
        nq.cast("long").alias("n_queries"),
        F.lit(EVAL_K).cast("long").alias("k"),
        F.floor((2 * F.sum("p_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_p_at_k_u"),
        F.floor((2 * F.sum("r_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_r_at_k_u"),
    ).select(F.lit("random").alias("system"), "*")
    return systems.unionByName(rnd_row)


# --- Graded retrieval evaluation (r12 VERDICT #4) -------------------------
# search_eval_labels' qrels are binary (label match). Real retrieval evals
# grade: a result can be partially relevant. The fixture ships no human
# judgments, so the graded qrels are DERIVED deterministically from fixture
# structure: grade 2 = shares the query's embedding label (the strong
# signal), grade 1 = same language AND embedding cosine >= GRADE1_COS
# without a label match (a topical near-neighbor: GRADE1_COS=0.15 is the
# measured p90 of the query-corpus cosine distribution at every SF, giving
# ~12 grade-1 docs per query vs ~50 grade-2 — non-degenerate, and stated
# as the proxy it is). nDCG@K uses the standard 2^rel - 1 gains (3, 1)
# with integer-exact arithmetic: per-position terms quantize to micro-
# units via floor((g*1e6)*ln(2)/ln(i+1) + 0.5) — ln on integer-valued
# doubles is the same libm bit pattern in Spark, DuckDB and python (the
# established micronat idiom), products/divisions of identical doubles
# are IEEE-identical, so the quantized terms agree bitwise and all
# downstream sums/ratios are integer.
GRADE1_COS = 0.15


def _dcg_term_sql(gain: str, pos: str) -> str:
    """floor((g·1e6)·ln2/ln(i+1) + 0.5) — the shared micro-unit DCG term."""
    return f"floor(({gain} * 1000000) * ln(2) / ln({pos} + 1) + 0.5)"


def _search_eval_graded_oracle() -> str:
    rrf_sql = _rrf_oracle()
    ctes, final = rrf_sql.split("\n    SELECT query_id,", 1)
    idcg_body = f"""CAST(list_sum(list_transform(
                   generate_series(1, {EVAL_K}),
                   i -> CASE WHEN i <= least(n2, {EVAL_K})
                             THEN {_dcg_term_sql('3', 'i')}
                             WHEN i <= least(n2 + n1, {EVAL_K})
                             THEN {_dcg_term_sql('1', 'i')}
                             ELSE 0 END)) AS BIGINT)"""
    w_unit = f"""CAST(list_sum(list_transform(
                   generate_series(1, {EVAL_K}),
                   i -> {_dcg_term_sql('1', 'i')})) AS BIGINT)"""
    return f"""{ctes},
    rrf_ranked AS (
        SELECT query_id,{final}
    ),
    labs AS (
        SELECT e.vec_id AS id, e.label, d.lang
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ),
    qinfo AS (SELECT id AS qid, label AS qlabel, lang AS qlang
              FROM labs WHERE id < {RRF_N_QUERIES}),
    qrels AS (
        SELECT v.qid, v.id,
               CASE WHEN c.label = q.qlabel THEN 2 ELSE 1 END AS grade
        FROM vec_scored v
        JOIN qinfo q ON q.qid = v.qid
        JOIN labs c ON c.id = v.id
        WHERE c.label = q.qlabel
           OR (c.lang = q.qlang AND v.score >= {GRADE1_COS})
    ),
    counts AS (
        SELECT qid,
               CAST(sum(CASE WHEN grade = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
               CAST(sum(CASE WHEN grade = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
        FROM qrels GROUP BY qid
    ),
    ideal AS (
        SELECT qid, n2, n1, n2 + n1 AS n_rel,
               {idcg_body} AS idcg_u
        FROM counts
    ),
    sys AS (
        SELECT 'bm25' AS system, qid, id, r FROM lex_rank
        WHERE r <= {EVAL_K}
        UNION ALL
        SELECT 'cosine', qid, id, r FROM vec_rank WHERE r <= {EVAL_K}
        UNION ALL
        SELECT 'rrf', query_id AS qid, id, rank AS r FROM rrf_ranked
        WHERE rank <= {EVAL_K}
    ),
    gains AS (
        SELECT s.system, s.qid, s.r,
               COALESCE(CASE WHEN qr.grade = 2 THEN 3
                             WHEN qr.grade = 1 THEN 1 END, 0) AS g
        FROM sys s
        LEFT JOIN qrels qr ON qr.qid = s.qid AND qr.id = s.id
    ),
    hits AS (
        SELECT system, qid, r, g,
               CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY system, qid ORDER BY r
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS h_at
        FROM gains
    ),
    dcg AS (
        SELECT system, qid,
               CAST(sum({_dcg_term_sql('g', 'r')}) AS BIGINT) AS dcg_u,
               CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT) AS h,
               CAST(min(CASE WHEN g > 0 THEN r END) AS BIGINT) AS r_first,
               CAST(sum(CASE WHEN g > 0 THEN
                        CAST(floor((2 * h_at * 1000000 + r) / (2.0 * r))
                             AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_p_u
        FROM hits GROUP BY system, qid
    ),
    perq AS (
        SELECT d.system, d.qid, d.h, i.n_rel,
               CAST(floor((2 * d.h * 1000000 + i.n_rel)
                          / (2.0 * i.n_rel)) AS BIGINT) AS r_u,
               CAST(floor((2 * d.dcg_u * 1000000 + i.idcg_u)
                          / (2.0 * i.idcg_u)) AS BIGINT) AS ndcg_u,
               CASE WHEN d.r_first IS NULL THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor((2 * 1000000 + d.r_first)
                                    / (2.0 * d.r_first)) AS BIGINT)
               END AS rr_u,
               CASE WHEN d.sum_p_u = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor((2 * d.sum_p_u
                                     + least(i.n_rel, {EVAL_K}))
                                    / (2.0 * least(i.n_rel, {EVAL_K})))
                              AS BIGINT)
               END AS ap_u
        FROM dcg d JOIN ideal i USING (qid)
        WHERE i.idcg_u > 0
    ),
    rnd AS (
        SELECT i.qid,
               CAST(floor((2 * i.n_rel * 1000000 + (t.N - 1))
                          / (2.0 * (t.N - 1))) AS BIGINT) AS p_u,
               CAST(floor((2 * {EVAL_K} * 1000000 + (t.N - 1))
                          / (2.0 * (t.N - 1))) AS BIGINT) AS r_u,
               CAST(floor((2 * CAST(floor(
                        (2 * (3 * i.n2 + i.n1) * w.w_u + (t.N - 1))
                        / (2.0 * (t.N - 1))) AS BIGINT) * 1000000
                        + i.idcg_u)
                     / (2.0 * i.idcg_u)) AS BIGINT) AS ndcg_u,
               CAST(list_sum(list_transform(
                   generate_series(1, {EVAL_K}), i2 ->
                   CAST(floor((list_reduce(
                           list_prepend(CAST(1 AS DOUBLE),
                               list_transform(generate_series(1, i2 - 1),
                                   j -> CAST(t.N - 1 - i.n_rel - j + 1
                                             AS DOUBLE)
                                        / (t.N - 1 - j + 1))),
                           (a, x) -> a * x)
                        * (CAST(i.n_rel AS DOUBLE) / (t.N - 1 - i2 + 1))
                        / i2) * 1000000 + 0.5) AS BIGINT)))
                    AS BIGINT) AS rr_u,
               CAST(floor((2 * CAST(list_sum(list_transform(
                        generate_series(1, {EVAL_K}), i2 ->
                        CAST(floor(((CAST(i.n_rel AS DOUBLE) / (t.N - 1)
                             + CAST(i.n_rel * (i.n_rel - 1) AS DOUBLE)
                               / ((t.N - 1) * (t.N - 2))
                               * (i2 - 1)) / i2) * 1000000 + 0.5)
                             AS BIGINT))) AS BIGINT)
                        + least(i.n_rel, {EVAL_K}))
                     / (2.0 * least(i.n_rel, {EVAL_K}))) AS BIGINT) AS ap_u
        FROM ideal i, (SELECT count(*) AS N FROM labs) t,
             (SELECT {w_unit} AS w_u) w
        WHERE i.idcg_u > 0
    )
    SELECT system, CAST(count(*) AS BIGINT) AS n_queries,
           CAST({EVAL_K} AS BIGINT) AS k,
           CAST(floor((2 * sum(h) * 1000000 + count(*) * {EVAL_K})
                      / (2.0 * count(*) * {EVAL_K})) AS BIGINT)
               AS macro_p_at_k_u,
           CAST(floor((2 * sum(r_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT) AS macro_r_at_k_u,
           CAST(floor((2 * sum(ndcg_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT) AS macro_ndcg_at_k_u,
           CAST(floor((2 * sum(rr_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT) AS macro_mrr_at_k_u,
           CAST(floor((2 * sum(ap_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT) AS macro_map_at_k_u
    FROM perq GROUP BY system
    UNION ALL
    SELECT 'random', CAST(count(*) AS BIGINT), CAST({EVAL_K} AS BIGINT),
           CAST(floor((2 * sum(p_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT),
           CAST(floor((2 * sum(r_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT),
           CAST(floor((2 * sum(ndcg_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT),
           CAST(floor((2 * sum(rr_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT),
           CAST(floor((2 * sum(ap_u) + count(*)) / (2.0 * count(*)))
                AS BIGINT)
    FROM rnd
    """


def _dcg_term(gain, pos):
    """Spark twin of _dcg_term_sql — identical expression shape so the
    doubles agree bitwise: (g·1e6)·ln2/ln(i+1), one rounding per op."""
    return F.floor(
        (gain * F.lit(1_000_000))
        * F.log(F.lit(2.0))
        / F.log(pos + F.lit(1))
        + F.lit(0.5)
    )


@register("search_eval_graded", oracle=_search_eval_graded_oracle())
def search_eval_graded(spark, sf_dir):
    """GRADED retrieval evaluation — search_eval_labels upgraded from the
    binary label proxy to a two-level graded qrel set derived from fixture
    structure (grade 2 = label match; grade 1 = same-language cosine-band
    neighbor, round(cos,6) >= {GRADE1_COS} without a label match), scored
    with nDCG@{EVAL_K} (gains 2^rel−1 = 3/1, the standard formulation)
    alongside binary P/R@{EVAL_K} (relevant = grade >= 1), MRR@{EVAL_K}
    and MAP@{EVAL_K} (r13 VERDICT #7 — the full five-metric retrieval
    report), and the analytic random baseline: expected per-position
    gain (3·n2+n1)/(N−1) times the unit-gain DCG weight sum for nDCG,
    the exact hypergeometric first-hit chain
    Σᵢ (1/i)·P(first hit at i) for MRR (Monte-Carlo-validated), and the
    exchangeability linearity E[1{relᵢ}·hᵢ] = p1 + p2·(i−1) with
    p1 = R/(N−1), p2 = R(R−1)/((N−1)(N−2)) for MAP.

    Exactness: every DCG term quantizes to integer micro-units via
    floor((g·1e6)·ln2/ln(rank+1) + 0.5) — the libm-on-integers idiom, so
    Spark/DuckDB terms agree bitwise and DCG/IDCG/nDCG are pure-integer
    sums and half-up ratios in any aggregation order. MRR/MAP are pure
    integer pipelines too: reciprocal ranks and per-position precision
    terms are half-up micro-unit ratios of integers (floor((2a+b)/(2b))),
    and the random row's float surfaces (the hypergeometric product
    chain, the linearity terms) are left-fold products/divisions of
    integer-valued doubles with IDENTICAL expression shape in
    Spark/DuckDB/python — bitwise-equal before their single per-term
    quantization. Rankings come from
    _rrf_rankings VERBATIM and the qrel cosine band reuses
    _vec_scored_pairs — eval, fused key, and truth share one pipeline.

    Honesty note (inherited from search_eval_labels and stated in the
    table's contract): the qrels are structural proxies, not human
    judgments — and the grade-1 band derives from the embedding geometry
    itself, so the vector system is favored by construction on grade-1
    rows (its near-misses are graded partially relevant; BM25's lexical
    near-misses are not). The fixture numbers read accordingly: at sf0.1
    cosine nDCG@10 = 0.209 while bm25 = 0.109 ≈ random's 0.109 — the
    grade-2 (label) rows are the system-neutral signal, grade-1 rows
    reward semantic closeness by definition. What the table certifies is
    the nDCG machinery and the relative ordering under a STATED graded
    truth; swap in real judgments and nothing else changes. Scale: qrel
    construction is |Q|·N cosine pairs — at 100 TB the judgment set is
    an offline artifact and this key's eval joins are query-panel-
    sized."""
    lex, vec, rrf = _rrf_rankings(spark, sf_dir)
    corpus = _rrf_corpus(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "lang"
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "label"
    )
    labs = e.join(langs, "id").join(corpus.select("id"), "id")
    qinfo = labs.filter(F.col("id") < RRF_N_QUERIES).select(
        F.col("id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("lang").alias("qlang"),
    )
    vs = _vec_scored_pairs(corpus)
    qrels = (
        vs.join(F.broadcast(qinfo), "qid")
        .join(
            labs.select(
                "id", F.col("label").alias("clabel"), F.col("lang").alias("clang")
            ),
            "id",
        )
        .filter(
            (F.col("clabel") == F.col("qlabel"))
            | (
                (F.col("clang") == F.col("qlang"))
                & (F.col("score") >= GRADE1_COS)
            )
        )
        .select(
            "qid",
            "id",
            F.when(F.col("clabel") == F.col("qlabel"), 2)
            .otherwise(1)
            .alias("grade"),
        )
    )
    counts = qrels.groupBy("qid").agg(
        F.sum(F.when(F.col("grade") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("grade") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    n2, n1 = F.col("n2"), F.col("n1")
    idcg_terms = F.transform(
        F.sequence(F.lit(1), F.lit(EVAL_K)),
        lambda i: F.when(
            i.cast("long") <= F.least(n2, F.lit(EVAL_K).cast("long")),
            _dcg_term(F.lit(3), i),
        )
        .when(
            i.cast("long") <= F.least(n2 + n1, F.lit(EVAL_K).cast("long")),
            _dcg_term(F.lit(1), i),
        )
        .otherwise(F.lit(0.0)),
    )
    ideal = counts.select(
        "qid",
        "n2",
        "n1",
        (n2 + n1).alias("n_rel"),
        F.aggregate(
            idcg_terms, F.lit(0.0), lambda a, x: a + x
        )
        .cast("long")
        .alias("idcg_u"),
    ).filter(F.col("idcg_u") > 0)
    sys = (
        lex.filter(F.col("r") <= EVAL_K)
        .select(F.lit("bm25").alias("system"), "qid", "id", "r")
        .unionByName(
            vec.filter(F.col("r") <= EVAL_K).select(
                F.lit("cosine").alias("system"), "qid", "id", "r"
            )
        )
        .unionByName(
            rrf.filter(F.col("rank") <= EVAL_K).select(
                F.lit("rrf").alias("system"),
                F.col("query_id").alias("qid"),
                "id",
                F.col("rank").alias("r"),
            )
        )
    )
    gains = sys.join(qrels, ["qid", "id"], "left").select(
        "system",
        "qid",
        "r",
        F.coalesce(
            F.when(F.col("grade") == 2, 3).when(F.col("grade") == 1, 1),
            F.lit(0),
        ).alias("g"),
    )
    w_h = (
        Window.partitionBy("system", "qid")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hits = gains.withColumn(
        "h_at",
        F.sum(F.when(F.col("g") > 0, 1).otherwise(0)).over(w_h).cast("long"),
    )
    dcg = hits.groupBy("system", "qid").agg(
        F.sum(_dcg_term(F.col("g"), F.col("r"))).cast("long").alias("dcg_u"),
        F.sum(F.when(F.col("g") > 0, 1).otherwise(0)).cast("long").alias("h"),
        F.min(F.when(F.col("g") > 0, F.col("r")))
        .cast("long")
        .alias("r_first"),
        F.sum(
            F.when(
                F.col("g") > 0,
                F.floor(
                    (2 * F.col("h_at") * F.lit(1_000_000) + F.col("r"))
                    / (2.0 * F.col("r"))
                ).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("sum_p_u"),
    )
    d_ap = F.least(F.col("n_rel"), F.lit(EVAL_K).cast("long"))
    perq = dcg.join(F.broadcast(ideal), "qid").select(
        "system",
        "h",
        F.floor(
            (2 * F.col("h") * F.lit(1_000_000) + F.col("n_rel"))
            / (2.0 * F.col("n_rel"))
        )
        .cast("long")
        .alias("r_u"),
        F.floor(
            (2 * F.col("dcg_u") * F.lit(1_000_000) + F.col("idcg_u"))
            / (2.0 * F.col("idcg_u"))
        )
        .cast("long")
        .alias("ndcg_u"),
        F.when(F.col("r_first").isNull(), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (2 * F.lit(1_000_000) + F.col("r_first"))
                / (2.0 * F.col("r_first"))
            ).cast("long")
        )
        .alias("rr_u"),
        F.when(F.col("sum_p_u") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (2 * F.col("sum_p_u") + d_ap) / (2.0 * d_ap)
            ).cast("long")
        )
        .alias("ap_u"),
    )
    nq = F.count(F.lit(1))
    systems = perq.groupBy("system").agg(
        nq.cast("long").alias("n_queries"),
        F.lit(EVAL_K).cast("long").alias("k"),
        F.floor(
            (2 * F.sum("h") * F.lit(1_000_000) + nq * EVAL_K)
            / (2.0 * nq * EVAL_K)
        )
        .cast("long")
        .alias("macro_p_at_k_u"),
        F.floor((2 * F.sum("r_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_r_at_k_u"),
        F.floor((2 * F.sum("ndcg_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_ndcg_at_k_u"),
        F.floor((2 * F.sum("rr_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_mrr_at_k_u"),
        F.floor((2 * F.sum("ap_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_map_at_k_u"),
    )
    w_u = (
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(EVAL_K)),
                lambda i: _dcg_term(F.lit(1), i),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        .cast("long")
        .alias("w_u")
    )
    n_corpus = labs.agg(F.count(F.lit(1)).alias("N"))
    rnd_dcg_u = F.floor(
        (
            2 * (3 * F.col("n2") + F.col("n1")) * F.col("w_u")
            + (F.col("N") - 1)
        )
        / (2.0 * (F.col("N") - 1))
    ).cast("long")
    # analytic E[RR@k] under a uniformly random ranking of the N-1
    # candidates, R = n_rel relevant: P(first hit at rank i2) =
    # [Π_{j<i2} (M-R-j+1)/(M-j+1)] · R/(M-i2+1) with M = N-1 — each
    # per-position term quantizes to micro-units (floor(x·1e6+0.5), the
    # DCG-term discipline) so the sum is a pure integer; the expression
    # shape (left-fold product of integer-valued-double ratios, then two
    # divisions) is IDENTICAL in Spark/DuckDB/python, so the doubles
    # agree bitwise before the single quantization.
    rnd_m = F.col("N") - 1
    rr_terms = F.transform(
        F.sequence(F.lit(1), F.lit(EVAL_K)),
        lambda i2: F.floor(
            (
                F.aggregate(
                    F.when(i2 > 1, F.sequence(F.lit(1), i2 - 1)).otherwise(
                        F.array().cast("array<int>")
                    ),
                    F.lit(1.0),
                    lambda a, j: a
                    * (
                        (rnd_m - F.col("n_rel") - j + 1).cast("double")
                        / (rnd_m - j + 1)
                    ),
                )
                * (F.col("n_rel").cast("double") / (rnd_m - i2 + 1))
                / i2
            )
            * F.lit(1_000_000)
            + F.lit(0.5)
        ).cast("long"),
    )
    rnd_rr_u = F.aggregate(
        rr_terms, F.lit(0).cast("long"), lambda a, x: a + x
    )
    # analytic E[AP@k] by linearity: E[1{rel_i}·h_i] = p1 + p2·(i−1)
    # with p1 = R/M (marginal) and p2 = R(R−1)/(M(M−1)) (pairwise,
    # exchangeable without-replacement draws) — Monte-Carlo-validated
    p1 = F.col("n_rel").cast("double") / rnd_m
    p2 = (F.col("n_rel") * (F.col("n_rel") - 1)).cast("double") / (
        rnd_m * (F.col("N") - 2)
    )
    ap_terms = F.transform(
        F.sequence(F.lit(1), F.lit(EVAL_K)),
        lambda i2: F.floor(
            ((p1 + p2 * (i2 - 1)) / i2) * F.lit(1_000_000) + F.lit(0.5)
        ).cast("long"),
    )
    rnd_s_u = F.aggregate(
        ap_terms, F.lit(0).cast("long"), lambda a, x: a + x
    )
    d_rnd = F.least(F.col("n_rel"), F.lit(EVAL_K).cast("long"))
    rnd = (
        ideal.crossJoin(F.broadcast(n_corpus))
        .crossJoin(F.broadcast(spark.range(1).select(w_u)))
        .select(
            F.floor(
                (2 * F.col("n_rel") * F.lit(1_000_000) + (F.col("N") - 1))
                / (2.0 * (F.col("N") - 1))
            )
            .cast("long")
            .alias("p_u"),
            F.floor(
                (2 * EVAL_K * F.lit(1_000_000) + (F.col("N") - 1))
                / (2.0 * (F.col("N") - 1))
            )
            .cast("long")
            .alias("r_u"),
            F.floor(
                (2 * rnd_dcg_u * F.lit(1_000_000) + F.col("idcg_u"))
                / (2.0 * F.col("idcg_u"))
            )
            .cast("long")
            .alias("ndcg_u"),
            rnd_rr_u.alias("rr_u"),
            F.floor((2 * rnd_s_u + d_rnd) / (2.0 * d_rnd))
            .cast("long")
            .alias("ap_u"),
        )
    )
    rnd_row = rnd.agg(
        nq.cast("long").alias("n_queries"),
        F.lit(EVAL_K).cast("long").alias("k"),
        F.floor((2 * F.sum("p_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_p_at_k_u"),
        F.floor((2 * F.sum("r_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_r_at_k_u"),
        F.floor((2 * F.sum("ndcg_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_ndcg_at_k_u"),
        F.floor((2 * F.sum("rr_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_mrr_at_k_u"),
        F.floor((2 * F.sum("ap_u") + nq) / (2.0 * nq))
        .cast("long")
        .alias("macro_map_at_k_u"),
    ).select(F.lit("random").alias("system"), "*")
    return systems.unionByName(rnd_row)
