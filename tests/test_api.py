"""Public API facade tests — the composable library surface."""

import pyspark.sql.functions as F

from data_transform_spark import api
from data_transform_spark.io import load_table


def test_dedup_exact_by_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other")], "doc_id long, text string"
    )
    out = api.dedup_exact_by(df, "text", "doc_id").collect()
    assert sorted((r["doc_id"], r["text"]) for r in out) == [(1, "same"), (2, "other")]


def test_minhash_near_dups_finds_planted_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words here now ok fine yes")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in api.minhash_near_dups(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_cosine_topk_ranks_identical_vector_first(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    # plant a query equal to vec 7's embedding: its top neighbor must be 7
    q = e.filter("vec_id = 7").select(
        F.lit(9999).alias("query_id"), F.col("embedding")
    )
    top = api.cosine_topk(e, q, k=1).collect()
    assert top[0]["neighbor_id"] == 7
    assert abs(top[0]["score"] - 1.0) < 1e-9


def test_l2_normalize_unit_norm(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(10)
    out = api.l2_normalize(e)
    norms = out.select(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda s, x: s + x * x).alias("n2")
    ).collect()
    for r in norms:
        assert abs(r["n2"] - 1.0) < 1e-9


def test_sessionize_splits_on_gap(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:05:00"),
        (1, "2024-01-01 01:00:00"),  # > 10 min gap -> new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts")
    )
    out = {(r["user_id"], str(r["ts"])): r["session_id"] for r in api.sessionize(df).collect()}
    assert out[(1, "2024-01-01 00:00:00")] == 1
    assert out[(1, "2024-01-01 00:05:00")] == 1
    assert out[(1, "2024-01-01 01:00:00")] == 2
    assert out[(2, "2024-01-01 00:00:00")] == 1


def test_api_minhash_matches_registered_query(spark, sf_dir):
    """The api facade and the registered key share banding logic — any
    divergence between the two implementations is a bug."""
    import __spark_entry__  # noqa: F401
    from data_transform_spark.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(map(tuple, api.minhash_near_dups(docs).collect()))
    want = sorted(map(tuple, QUERIES["dedup_near_minhash"](spark, sf_dir).collect()))
    assert got == want


def test_tfidf_matches_registered_query(spark, sf_dir):
    import __spark_entry__  # noqa: F401
    from data_transform_spark.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    got = api.tfidf(docs).withColumn("tfidf", F.round("tfidf", 6))
    want = QUERIES["text_tfidf"](spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_api_bpe_roundtrip(spark, sf_dir):
    """train_bpe + bpe_token_counts must agree with the registered
    tokenize_bpe rollup (same merges, same counts)."""
    import pyspark.sql.functions as F

    from data_transform_spark import api
    from data_transform_spark.pipeline.training import _bpe_words
    from data_transform_spark.registry import QUERIES

    merges = api.train_bpe(spark, sf_dir)
    assert merges and merges[0][0] == 1
    words = _bpe_words(spark, sf_dir)
    enc = api.bpe_token_counts(words, merges)
    total_bpe = enc.select(F.sum(F.col("n_bpe") * F.col("cnt"))).collect()[0][0]
    reg = QUERIES["tokenize_bpe"](spark, sf_dir)
    reg_total = reg.select(F.sum("n_bpe_tokens")).collect()[0][0]
    assert total_bpe == reg_total


def test_api_substring_dedup_matches_registered(spark, sf_dir):
    from data_transform_spark import api
    from data_transform_spark.io import load_table
    from data_transform_spark.registry import QUERIES

    d = load_table(spark, sf_dir, "documents")
    got = {r.doc_id: r.n_removed for r in api.substring_dedup(d).collect()}
    want = {
        r.doc_id: r.n_removed
        for r in QUERIES["text_substring_dedup"](spark, sf_dir).collect()
    }
    assert got == want


def test_api_pii_scrub_clean_doc_roundtrip(spark):
    """pii_scrub_text on clean text is identity (all_clean, zero counts);
    on planted text it redacts and counts."""
    from data_transform_spark import api

    docs = spark.createDataFrame(
        [(1, "hello plain world"), (2, "mail me at a.b@c.org now")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in api.pii_scrub_text(docs).collect()}
    assert rows[1].all_clean and rows[1].n_emails == 0
    assert rows[1].clean_len == len("hello plain world")
    assert rows[2].n_emails == 1 and rows[2].all_clean


def test_api_quality_and_serve_match_registered(spark, sf_dir):
    from data_transform_spark import api
    from data_transform_spark.registry import QUERIES

    got = {r.doc_id: r.logit_u for r in api.fit_quality_nb(spark, sf_dir).collect()}
    want = {
        r.doc_id: r.logit_u for r in QUERIES["quality_nb"](spark, sf_dir).collect()
    }
    assert got == want

    from data_transform_spark.pipeline.similarity import sim_ann_ivfpq_topk

    served = {tuple(r) for r in api.ann_ivfpq_serve(spark, sf_dir).collect()}
    fresh = {tuple(r) for r in sim_ann_ivfpq_topk(spark, sf_dir).collect()}
    assert served == fresh


def test_api_corpus_digest_invariances(spark):
    """corpus_digest: reorder-invariant, edit-sensitive, group-scoped."""
    from data_transform_spark import api

    rows = [(1, "a b", "s1"), (2, "c d", "s1"), (3, "e f", "s2")]
    d1 = spark.createDataFrame(rows, "doc_id long, text string, source string")
    d2 = spark.createDataFrame(
        list(reversed(rows)), "doc_id long, text string, source string"
    )
    m1 = {r.source: r.corpus_md5 for r in api.corpus_digest(d1).collect()}
    m2 = {r.source: r.corpus_md5 for r in api.corpus_digest(d2).collect()}
    assert m1 == m2
    d3 = spark.createDataFrame(
        [(1, "a b EDIT", "s1")] + rows[1:], "doc_id long, text string, source string"
    )
    m3 = {r.source: r.corpus_md5 for r in api.corpus_digest(d3).collect()}
    assert m3["s1"] != m1["s1"] and m3["s2"] == m1["s2"]


def test_api_round11_surfaces_match_registered_keys(spark, sf_dir):
    """The new API wrappers must agree with their registered keys:
    gopher flags subset-match quality_gopher (API omits the bigram rule
    by design — map-only without the fold — so its kept is >= the
    registered gate), triplets/semdedup/curves are exact re-exports, and
    holt_forecast on the daily-count frame equals ts_holt_linear."""
    import pyspark.sql.functions as F

    from data_transform_spark import api
    from data_transform_spark.io import load_table
    from data_transform_spark.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    api_flags = {r["doc_id"]: r for r in api.gopher_quality_flags(docs).collect()}
    reg = {r["doc_id"]: r for r in QUERIES["quality_gopher"](spark, sf_dir).collect()}
    assert set(api_flags) == set(reg)
    for did, r in reg.items():
        a = api_flags[did]
        assert (a["n_words"], a["mean_word_len"], a["stop_hits"],
                a["dup_unigram_frac"]) == (
            r["n_words"], r["mean_word_len"], r["stop_hits"],
            r["dup_unigram_frac"],
        )
        # API gate = registered gate minus the bigram rule
        assert a["kept"] == (
            r["r_word_count"] and r["r_mean_word_len"]
            and r["r_stopwords"] and r["r_dup_unigram"]
        )

    assert {tuple(r) for r in api.mine_triplets(spark, sf_dir).collect()} == {
        tuple(r) for r in QUERIES["train_triplet_mine"](spark, sf_dir).collect()
    }
    assert {tuple(r) for r in api.semantic_dedup(spark, sf_dir).collect()} == {
        tuple(r) for r in QUERIES["dedup_semdedup"](spark, sf_dir).collect()
    }
    probes, dims = api.ann_tuning_curves(spark, sf_dir)
    assert {tuple(r) for r in probes.collect()} == {
        tuple(r) for r in QUERIES["sim_ann_recall_curve"](spark, sf_dir).collect()
    }
    assert {tuple(r) for r in dims.collect()} == {
        tuple(r) for r in QUERIES["sim_dim_truncation_curve"](spark, sf_dir).collect()
    }

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day_ts"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {
        (r["k"], r["t"]): (r["level_u"], r["trend_u"], r["forecast_next_u"])
        for r in api.holt_forecast(daily).collect()
    }
    want = {
        (r["event_type"], r["day_ts"]): (
            r["level_u"], r["trend_u"], r["forecast_next_u"]
        )
        for r in QUERIES["ts_holt_linear"](spark, sf_dir).collect()
    }
    assert got == want


def test_api_holt_forecast_derives_key_ts_types(spark):
    """holt_forecast works over any (key, ts, integer value) frame: the
    output k/t field types come from the INPUT schema (r11 ADVICE — they
    were hardcoded `string`/`timestamp`, so an integer key or DATE ts
    failed at runtime). An int-key/date-ts frame must run, keep those
    types, and produce the same recursion values as a string/timestamp
    twin of the same series."""
    import datetime

    xs = [10, 14, 9, 20]
    days = [datetime.date(2024, 1, d + 1) for d in range(len(xs))]
    num = spark.createDataFrame(
        [(7, d, x) for d, x in zip(days, xs)], "grp int, d date, n long"
    )
    out = api.holt_forecast(num, key="grp", ts="d", value="n")
    assert out.schema["k"].dataType.simpleString() == "int"
    assert out.schema["t"].dataType.simpleString() == "date"
    got = {r["t"]: (r["level_u"], r["trend_u"]) for r in out.collect()}

    twin = spark.createDataFrame(
        [
            ("7", datetime.datetime(2024, 1, d + 1), x)
            for d, x in zip(range(len(xs)), xs)
        ],
        "grp string, d timestamp, n long",
    )
    want = {
        r["t"].date(): (r["level_u"], r["trend_u"])
        for r in api.holt_forecast(twin, key="grp", ts="d", value="n").collect()
    }
    assert got == want
