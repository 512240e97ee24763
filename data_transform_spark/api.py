"""Public convenience API — the reusable transformations behind the
registered queries, importable directly by library users:

    from data_transform_spark import api
    pairs = api.minhash_near_dups(docs_df)          # near-dup candidate pairs
    topk  = api.cosine_topk(emb_df, query_df, k=10) # exact top-k neighbors

Each function takes/returns plain DataFrames so they compose with arbitrary
user pipelines; none of them collect to the driver (see SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_transform_spark.operators.joins import salted_join  # noqa: F401  (re-export)
from data_transform_spark.pipeline.dedup import (  # noqa: F401  (re-export)
    minhash_signatures,
    simhash_fingerprints,
)
from data_transform_spark.pipeline.similarity import _cos, _dot


def dedup_exact_by(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the canonical (min id) row per exact content hash."""
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def minhash_near_dups(docs: DataFrame, tau: float | None = None) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, exact shingle-jaccard >= tau).

    ``docs`` needs (doc_id, text). Thin wrapper over the registered
    pipeline: banded-LSH candidate generation followed by EXACT shingle
    jaccard verification — the production MinHash-LSH shape. Defaults to
    pipeline.dedup.MINHASH_EXACT_TAU.
    """
    from data_transform_spark.pipeline import dedup as _d

    tau = _d.MINHASH_EXACT_TAU if tau is None else tau
    cand = _d._minhash_candidates(docs)
    return (
        _d._exact_jaccard_of_pairs(docs, cand)
        .filter(F.col("jaccard") >= tau)
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``corpus``: (vec_id, embedding array); ``queries``: (query_id, embedding).
    Queries are broadcast — keep them small; for large query sets use the
    LSH/blocked variants (pipeline.similarity).
    """
    c = corpus.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    q = queries.select(
        "query_id", F.col("embedding").cast("array<double>").alias("q_emb")
    )
    scored = F.broadcast(q).join(c, F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cos(F.col("q_emb"), F.col("emb")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "neighbor_id")
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def l2_normalize(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Replace an array<float/double> column with its unit-norm version."""
    emb = F.col(col).cast("array<double>")
    norm = F.sqrt(_dot(emb, emb))
    return df.withColumn(col, F.transform(emb, lambda x: x / norm))


def tfidf(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token, tfidf) with smoothed idf = ln((N+1)/(df+1)) + 1.

    N rides in-plan as a broadcast 1-row aggregate (same pattern as the
    registered text_tfidf / pipeline_e2e): building this plan launches NO
    job — an eager ``docs.count()`` here would cost one extra full corpus
    pass at 100 TB just to fetch a scalar (r5 VERDICT "What's wrong" #2).
    """
    n = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    tok = docs.select(id_col, F.explode(F.split(text_col, " ")).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("cnt"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("doc_len"))
    df_ = tok.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    expr = (F.col("cnt") / F.col("doc_len")) * (
        F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    return (
        tf.join(dl, id_col)
        .join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n))
        .select(id_col, "token", expr.alias("tfidf"))
    )


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_minutes: int = 10) -> DataFrame:
    """Assign a session_id per key using the gaps-and-islands pattern
    (batch twin of session_window — works on any bounded frame)."""
    w = Window.partitionBy(key).orderBy(ts)
    # NTZ won't cast straight to long in Spark 4; hop through timestamp
    # (identity under the engine-wide UTC session timezone)
    sec = F.col(ts).cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    new_s = F.when(gap.isNull() | (gap >= gap_minutes * 60), 1).otherwise(0)
    run = Window.partitionBy(key).orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_id", F.sum(new_s).over(run))


def substring_dedup(docs: DataFrame) -> DataFrame:
    """Exact substring-level dedup (Lee et al. 2022): remove every repeated
    run of >= SUBSTR_W consecutive tokens corpus-wide (first occurrence
    wins). ``docs`` needs (doc_id, text); returns (doc_id, n_tokens,
    n_removed, clean_text). The span tier above doc/chunk-level dedup —
    see pipeline.dedup.text_substring_dedup for the registered query."""
    from data_transform_spark.pipeline.dedup import substring_clean

    return substring_clean(docs)


def train_bpe(spark, sf_dir: str, rounds: int | None = None):
    """Learn BPE merges over a fixture directory's documents table.

    Returns [(merge_round, pair_a, pair_b, merged, pair_count), ...] as
    plain literals (canonical Sennrich semantics, deterministic; see
    pipeline.training.vocab_bpe). Pass the merges to ``bpe_token_counts``
    to encode."""
    from data_transform_spark.pipeline import training as _t

    return _t._bpe_train(
        spark, sf_dir, _t.BPE_ROUNDS if rounds is None else rounds
    )


def bpe_token_counts(words: DataFrame, merges, word_col: str = "word") -> DataFrame:
    """Apply learned BPE merges (in learned order) to a distinct-word frame;
    returns the input plus n_bpe (token count per word). Broadcast-join the
    result back to your corpus — the tokenize_bpe shape."""
    from data_transform_spark.pipeline import training as _t

    seq = _t._bpe_seq0(F.col(word_col))
    for _r, a, b, m, _c in merges:
        seq = F.replace(seq, F.lit(f" {a}  {b} "), F.lit(f" {m} "))
    return words.withColumn("n_bpe", F.size(F.split(F.trim(seq), "  ")))


def ann_ivfpq_topk(embeddings: DataFrame, spark=None) -> DataFrame:
    """Composed IVF-PQ ANN (IVFADC): coarse-list pruning + residual PQ
    codes + exact re-rank. ``embeddings`` needs (vec_id, emb array<double>);
    queries are vec_id < N_QUERIES (see pipeline.similarity for the
    constants and the registered bound-checked key). Training fits on the
    bounded md5-prefix sample; encoding covers the full frame.

    ``spark`` is DEPRECATED and ignored (it was never used): kept for one
    release so r9-era callers passing it positionally or by keyword don't
    break (r10 ADVICE). It will be removed; pass only the frame."""
    from data_transform_spark.pipeline import similarity as _s

    cent, _assign, books, codes_l = _s._ivfpq_index(embeddings)
    return _s._ivfpq_topk(embeddings, cent, books, codes_l)


def pii_scrub_text(docs: DataFrame) -> DataFrame:
    """Redact email/phone/IP spans from a (doc_id, text) frame and report
    per-type counts + an all_clean post-condition (pipeline.text.pii_scrub
    — the registered text_pii_scrub minus the fixture PII planting). Pure
    row-local regexp projections: map-only at any scale."""
    from data_transform_spark.pipeline.text import pii_scrub

    return pii_scrub(docs.select("doc_id", "text"))


def fit_quality_nb(spark, sf_dir: str) -> DataFrame:
    """In-plan-trained Naive Bayes quality scores for every doc: (doc_id,
    is_train, label, logit_u micronats, pred, correct). The fit runs on
    the md5-split train half against the keyword weak label; see
    pipeline.curation.quality_nb (and quality_pr_curve for the
    threshold-calibration table)."""
    from data_transform_spark.pipeline.curation import quality_nb

    return quality_nb(spark, sf_dir)


def corpus_digest(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Content-addressed manifest of any (text, <group>) frame: per group,
    doc/token counts plus an order/reshard-invariant md5-of-sorted-doc-md5s
    digest. Compare two runs' manifests to prove corpus identity without
    rescanning text (operators.etl.corpus_manifest's core, reusable)."""
    d = docs.select(
        F.col(group_col).alias("grp"),
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    return d.groupBy(F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list("h")))).alias(
            "corpus_md5"
        ),
    )


def ann_ivfpq_serve(spark, sf_dir: str) -> DataFrame:
    """Warm-path ANN: serve IVF-PQ top-k from the staged parquet index
    (building + staging it on first call) — zero training stages in the
    warm plan. See pipeline.similarity.sim_ann_ivfpq_serve_topk."""
    from data_transform_spark.pipeline.similarity import sim_ann_ivfpq_serve_topk

    return sim_ann_ivfpq_serve_topk(spark, sf_dir)


def gopher_quality_flags(docs: DataFrame) -> DataFrame:
    """Gopher rule-based quality gate over any (doc_id, text) frame —
    the 4-rule MAP-ONLY form: word-count, mean-word-length, stopword-hit
    and duplicate-unigram rules plus their conjunction as `kept`. It
    deliberately omits the top-bigram rule (that one needs the doc's
    bigram mode, i.e. an explode+groupBy, not a projection), so this
    gate is strictly LOOSER than the registered key: every row
    quality_gopher keeps is kept here, plus possibly more
    (kept >= quality_gopher.kept; tests pin the subset). For the full
    5-rule verdict table use pipeline.curation.quality_gopher
    (thresholds documented there)."""
    from data_transform_spark.pipeline import curation as _c

    toks = F.split("text", " ")
    n_words = F.size(toks)
    mwl = F.round((F.length("text") - n_words + 1) * 1.0 / n_words, 6)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_c.GOPHER_STOPWORDS)))
    dup_frac = F.round(
        (n_words - F.size(F.array_distinct(toks))) * 1.0 / n_words, 6
    )
    r_wc = n_words.between(_c.GOPHER_MIN_WORDS, _c.GOPHER_MAX_WORDS)
    r_mwl = mwl.between(_c.GOPHER_MIN_MWL, _c.GOPHER_MAX_MWL)
    r_stop = stop_hits >= _c.GOPHER_MIN_STOP_HITS
    r_dup = dup_frac <= _c.GOPHER_MAX_DUP_UNIGRAM
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        stop_hits.cast("long").alias("stop_hits"),
        dup_frac.alias("dup_unigram_frac"),
        (r_wc & r_mwl & r_stop & r_dup).alias("kept"),
    )


def mine_triplets(spark, sf_dir: str) -> DataFrame:
    """Hard-negative triplet mining over the embeddings table: per anchor,
    hardest same-label positive + hardest different-label negative with
    margin and hard/semi-hard verdicts (blocked BLAS gemm, partial
    argmax per Arrow batch). See pipeline.similarity.train_triplet_mine."""
    from data_transform_spark.pipeline.similarity import train_triplet_mine

    return train_triplet_mine(spark, sf_dir)


def semantic_dedup(spark, sf_dir: str) -> DataFrame:
    """SemDeDup cluster-scoped semantic dedup over the embeddings table:
    deterministic k-means, within-cluster keep-first removal at τ.
    See pipeline.similarity.dedup_semdedup."""
    from data_transform_spark.pipeline.similarity import dedup_semdedup

    return dedup_semdedup(spark, sf_dir)


def ann_tuning_curves(spark, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The two ANN operating-point tables: (recall vs probes, recall vs
    prefix dims). Read these BEFORE committing a large similarity job."""
    from data_transform_spark.pipeline.similarity import (
        sim_ann_recall_curve,
        sim_dim_truncation_curve,
    )

    return (
        sim_ann_recall_curve(spark, sf_dir),
        sim_dim_truncation_curve(spark, sf_dir),
    )


def mmr_over_ann(spark, sf_dir: str) -> DataFrame:
    """MMR diversification over the shortlist from the STAGED ANN index
    (r11 VERDICT #7): sim_ann_persist's artifact serves a top-MMR_CAND
    candidate list per query (ADC scan + exact re-rank inside the
    PQ shortlist, scores 6dp-rounded exactly like the exact path), and
    the SAME integer greedy (_mmr_rerank) re-ranks it. The greedy is a
    pure function of the shortlist, so wherever the ANN shortlist equals
    the exact one, the diversified ranking is identical row-for-row —
    pinned by tests/test_pipeline.py::TestMmrOverAnn. This is the 100 TB
    serve shape: candidate generation from the staged index, diversity
    logic unchanged."""
    from pyspark.sql import functions as F

    from data_transform_spark.io import load_table
    from data_transform_spark.pipeline.retrieval import MMR_CAND, _mmr_rerank
    from data_transform_spark.pipeline.similarity import (
        _ivfpq_topk,
        ivfpq_read_index,
        ivfpq_stage_index,
    )

    staged = ivfpq_stage_index(spark, sf_dir)
    cent, books, codes_l = ivfpq_read_index(spark, staged)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cand = _ivfpq_topk(e, cent, books, codes_l, k=MMR_CAND).select(
        F.col("query_id").alias("qid"),
        F.col("neighbor_id").alias("id"),
        F.col("score").alias("rel"),
        F.round(F.col("score") * 1000000).cast("long").alias("rel_u"),
    )
    return _mmr_rerank(e, cand)


def holt_forecast(series: DataFrame, key: str = "event_type",
                  ts: str = "day_ts", value: str = "n") -> DataFrame:
    """Holt linear-trend smoothing + one-step forecast over any
    (key, ts, integer value) frame — integer micro-unit recursion, one
    applyInPandas per series. See operators.timeseries.ts_holt_linear."""
    import pandas as pd

    from data_transform_spark.operators.timeseries import (
        HOLT_ALPHA_NUM,
        HOLT_BETA_NUM,
    )

    src = series.select(
        F.col(key).alias("k"), F.col(ts).alias("t"), F.col(value).alias("x")
    )
    # Derive the key/ts field types from the input frame so a numeric or
    # date-typed key/ts column works instead of failing against a
    # hardcoded `k string, t timestamp` schema (r11 ADVICE).
    k_type = series.schema[key].dataType.simpleString()
    t_type = series.schema[ts].dataType.simpleString()

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        l = b = 0
        ls, bs = [], []
        for i, x in enumerate(int(v) for v in pdf["x"]):
            if i == 0:
                l, b = x * 1_000_000, 0
            else:
                l2 = (
                    HOLT_ALPHA_NUM * x * 1_000_000
                    + (10 - HOLT_ALPHA_NUM) * (l + b)
                    + 5
                ) // 10
                b = (HOLT_BETA_NUM * (l2 - l) + (10 - HOLT_BETA_NUM) * b + 5) // 10
                l = l2
            ls.append(l)
            bs.append(b)
        pdf["level_u"] = ls
        pdf["trend_u"] = bs
        pdf["forecast_next_u"] = [a + c for a, c in zip(ls, bs)]
        return pdf

    return src.groupBy("k").applyInPandas(
        holt,
        f"k {k_type}, t {t_type}, x long, level_u long, trend_u long, "
        "forecast_next_u long",
    )
