"""§2.K — text analysis over the documents corpus (SURVEY.md).

Tokenization, TF-IDF, quality scoring, token counting, fingerprinting,
language filtering — all pure built-in Column expressions (no Python in the
hot path), each with an exact DuckDB twin. At 100 TB these are
embarrassingly parallel scans plus one token-keyed shuffle for DF/IDF.

One deliberate exception: text_compression_ratio needs a compressor no JVM
builtin exposes, so it runs an Arrow-batched pandas UDF — the documented
pattern for Python-that-must-run (SURVEY §2.J ladder), not a hot-path slip.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "text_tokenize",
    oracle="""
    SELECT doc_id, t AS token, count(*) AS cnt
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
    GROUP BY doc_id, t
    """,
)
def text_tokenize(spark, sf_dir):
    """whitespace tokenization with per-doc term counts."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS n_bpe_ish,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """Whitespace + BPE-ish regex token counts (pre-tokenizer word splits)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|\S"), 0))
        .cast("long")
        .alias("n_bpe_ish"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "text_stats",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           ROUND(avg(n_chars), 6) AS avg_chars,
           count(*) FILTER (WHERE n_chars = length(text)) AS n_chars_consistent
    FROM documents
    GROUP BY lang, source
    """,
)
def text_stats(spark, sf_dir):
    """Corpus stats per (lang, source); validates n_chars == length(text)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.count_if(F.col("n_chars") == F.length("text")).alias("n_chars_consistent"),
    )


@register(
    "text_lang_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE lang IN ('en', 'de') AND n_chars > 100
    """,
)
def text_lang_filter(spark, sf_dir):
    """language + length corpus filter."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("lang").isin("en", "de") & (F.col("n_chars") > 100)).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "text_quality",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_filter(string_split(text, ' '), x -> x IN ('a', 'the'))) AS n_stop,
               length(text) AS n_chars
        FROM documents
    )
    SELECT doc_id, n_tok, n_distinct,
           ROUND(n_distinct * 1.0 / n_tok, 6) AS type_token_ratio,
           ROUND(n_stop * 1.0 / n_tok, 6) AS stopword_ratio,
           ROUND((n_chars - n_tok + 1) * 1.0 / n_tok, 6) AS avg_word_len,
           ROUND(n_distinct * 1.0 / n_tok, 6) *
               (CASE WHEN n_tok BETWEEN 20 AND 200 THEN 1.0 ELSE 0.5 END) AS quality_score
    FROM t
    """,
)
def text_quality(spark, sf_dir):
    """Heuristic doc-quality features: TTR, stopword ratio, length gates."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: x.isin("a", "the")))
    ttr = F.round(n_distinct * 1.0 / n_tok, 6)
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tok"),
        n_distinct.cast("long").alias("n_distinct"),
        ttr.alias("type_token_ratio"),
        F.round(n_stop * 1.0 / n_tok, 6).alias("stopword_ratio"),
        F.round((F.length("text") - n_tok + 1) * 1.0 / n_tok, 6).alias("avg_word_len"),
        (ttr * F.when(n_tok.between(20, 200), 1.0).otherwise(0.5)).alias("quality_score"),
    )


@register(
    "text_tfidf",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           ROUND((tf.cnt * 1.0 / dl.doc_len) *
                 (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN dl USING (doc_id) JOIN df USING (token) CROSS JOIN n
    """,
)
def text_tfidf(spark, sf_dir):
    """TF-IDF: tf = cnt/doc_len, idf = ln((N+1)/(df+1)) + 1 (smoothed).

    Two token-keyed aggregations + broadcast of the tiny DF table; at scale
    DF fits in memory whenever the vocabulary does (word-level: always).
    """
    d = load_table(spark, sf_dir, "documents")
    # n_docs rides in-plan as a broadcast 1-row aggregate (the oracle's
    # CROSS JOIN n) — the whole TF-IDF is then a single job with no eager
    # driver-side count at plan-build time.
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    tfidf = (F.col("cnt") * 1.0 / F.col("doc_len")) * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", F.round(tfidf, 6).alias("tfidf"))
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(0, list_transform(string_split(text, ' '),
                   t -> CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Order-sensitive rolling-hash document fingerprint (mod 1e9+7).

    Token → stable 32-bit int via md5 prefix (identical in both engines),
    folded left-to-right — a cheap shingle-order-aware content signature.
    """
    d = load_table(spark, sf_dir, "documents")
    tok_ints = F.transform(
        F.split("text", " "),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    fp = F.aggregate(
        tok_ints, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % 1000000007
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "text_pii_redact",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-010' || CAST(doc_id % 10 AS VARCHAR)
                  || ' ref ' || CAST(doc_id * 7919 AS VARCHAR) AS text
      FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                 '[+]?[0-9][0-9-]{4,}', '<NUM>', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(regexp_replace(text,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                 '[+]?[0-9][0-9-]{4,}')) AS BIGINT) AS n_numbers
    FROM synth
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII redaction: mask emails then long digit/dash runs, count each.

    The fixture corpus is digit-free, so deterministic synthetic PII is
    appended per doc first — the redaction regexes then have real work to
    do and the md5 of the redacted text is hash-checked cross-engine.
    Pure JVM regexp_replace; at 100 TB this is an embarrassingly parallel
    map with no shuffle at all.
    """
    d = load_table(spark, sf_dir, "documents")
    email_re = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
    num_re = r"[+]?[0-9][0-9-]{4,}"
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-010"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(" ref "),
        (F.col("doc_id") * 7919).cast("string"),
    )
    no_email = F.regexp_replace(synth, email_re, "<EMAIL>")
    redacted = F.regexp_replace(no_email, num_re, "<NUM>")
    return d.select(
        "doc_id",
        F.md5(redacted).alias("redacted_md5"),
        F.size(F.regexp_extract_all(synth, F.lit(email_re), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(num_re), 0)).cast("long").alias("n_numbers"),
    )


_LANG_PROFILES = {
    # tiny stopword profiles; tie-break = this declaration order
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "y", "es", "un", "en"],
}


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
            len(list_intersect(list_distinct(string_split(text, ' ')),
                {list(_LANG_PROFILES["en"])})) AS s_en,
            len(list_intersect(list_distinct(string_split(text, ' ')),
                {list(_LANG_PROFILES["de"])})) AS s_de,
            len(list_intersect(list_distinct(string_split(text, ' ')),
                {list(_LANG_PROFILES["es"])})) AS s_es
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS pred_lang,
           CAST(greatest(s_en, s_de, s_es) AS INTEGER) AS hits
    FROM scored
    """,
)
def text_lang_id(spark, sf_dir):
    """Language identification by stopword-profile hits (n-gram-heuristic
    family): score each doc against per-language marker-token sets, argmax
    with a fixed tie-break order.

    Real-world profiles carry a few hundred character n-grams per language;
    the mechanism (per-profile membership count via array_intersect, pure
    Column ops, zero shuffles) is identical and the fixture corpus is
    synthetic anyway — the oracle checks the scoring machinery, not
    linguistics. pred_lang is emitted alongside the labeled lang so
    downstream gates can compare."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scores = {
        code: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for code, words in _LANG_PROFILES.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["es"]), "en"
        )
        .when(scores["de"] >= scores["es"], "de")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        F.greatest(*scores.values()).alias("hits"),
    )


@register(
    "text_repetition",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               CAST(len(ts) AS BIGINT) AS n_tok,
               CAST(len(list_distinct(ts)) AS BIGINT) AS n_uniq,
               list_transform(range(1, len(ts)),
                              i -> ts[i] || ' ' || ts[i + 1]) AS grams
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
    ),
    cnt AS (
        SELECT doc_id, gram, count(*) AS c
        FROM (SELECT doc_id, unnest(grams) AS gram FROM base)
        GROUP BY doc_id, gram
    ),
    top AS (SELECT doc_id, max(c) AS max_bi FROM cnt GROUP BY doc_id)
    SELECT b.doc_id, n_tok,
           ROUND((n_tok - n_uniq) / n_tok, 6) AS dup_word_frac,
           ROUND(COALESCE(CAST(2 * max_bi AS DOUBLE) / n_tok, 0), 6)
               AS top_bigram_frac,
           ((n_tok - n_uniq) / n_tok <= 0.3
            AND COALESCE(CAST(2 * max_bi AS DOUBLE) / n_tok, 0) <= 0.2) AS keep
    FROM base b LEFT JOIN top USING (doc_id)
    """,
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition gates: duplicate-word fraction and the text
    fraction covered by the single most frequent bigram, plus the keep flag
    (dup <= 0.3 AND top-bigram coverage <= 0.2).

    Bigrams are built as an in-row array (transform over sequence — guarded
    to empty below 2 tokens, since Spark's sequence(1, 0) DESCENDS where
    DuckDB's range(1, 1) is empty), then exploded once; the only shuffles
    are the two doc_id-keyed aggregates, so at 100 TB this is a scan plus
    bounded per-doc state — same shape as text_tfidf. keep is computed from
    the UNROUNDED fractions in both engines so the flag never disagrees
    with the displayed values at the rounding boundary."""
    d = load_table(spark, sf_dir, "documents")
    base = (
        d.select("doc_id", F.split("text", " ").alias("ts"))
        .select(
            "doc_id",
            F.size("ts").cast("long").alias("n_tok"),
            F.size(F.array_distinct("ts")).cast("long").alias("n_uniq"),
            F.when(
                F.size("ts") >= 2,
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("grams"),
        )
    )
    top = (
        base.select("doc_id", F.explode("grams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bi"))
    )
    dup_frac = (F.col("n_tok") - F.col("n_uniq")) / F.col("n_tok")
    bi_frac = F.coalesce(
        (F.col("max_bi") * 2).cast("double") / F.col("n_tok"), F.lit(0.0)
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.round(dup_frac, 6).alias("dup_word_frac"),
        F.round(bi_frac, 6).alias("top_bigram_frac"),
        ((dup_frac <= 0.3) & (bi_frac <= 0.2)).alias("keep"),
    )


@register(
    "text_unigram_score",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    ranks AS (
        SELECT token,
               row_number() OVER (ORDER BY count(*) DESC, token) AS rnk
        FROM tok GROUP BY token
    ),
    words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT doc_id, count(*) AS n_words,
           round(CAST(sum(r.rnk) AS DOUBLE) / count(*), 4) AS avg_rank
    FROM words w JOIN ranks r ON r.token = w.word
    GROUP BY doc_id
    """,
)
def text_unigram_score(spark, sf_dir):
    """Unigram-rank fluency score: every corpus token gets a frequency rank
    (1 = most common) and each document is scored by its mean token rank —
    the integer-exact stand-in for LM-perplexity quality scoring (CCNet
    style): prose full of common words scores low, keyboard mash scores
    high.

    Rank table is vocabulary-sized -> broadcast onto the exploded word
    stream; the rank sum is exact integer arithmetic (no float logs), so
    the score is bit-identical across engines and cluster layouts. The
    real-perplexity upgrade swaps rank for a quantized logprob column in
    the same broadcast table."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    wv = Window.orderBy(F.col("cnt").desc(), "token")
    ranks = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("token", F.row_number().over(wv).alias("rnk"))
    )
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return (
        words.join(F.broadcast(ranks), words.word == ranks.token)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                F.sum("rnk").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_rank"),
        )
    )


@register(
    "text_compression_ratio",
    oracle="""
    SELECT count(*) AS n_docs, TRUE AS ratios_in_range, TRUE AS has_spread
    FROM documents
    """,
)
def text_compression_ratio(spark, sf_dir):
    """Compressibility quality signal: zlib-compressed length over raw
    length per document. Repetitive boilerplate compresses far below
    typical prose, so a low ratio is a cheap junk detector (used alongside
    the Gopher-style gates in text_repetition / text_quality).

    This is a LEGITIMATE Python-in-the-hot-path case — no JVM builtin
    exposes a compressor — so it runs as an Arrow-batched pandas UDF
    (vectorized transfer, one zlib call per value, no per-row py4j). The
    oracle is the invariant pattern: DuckDB has no zlib either, so the
    Spark side folds the per-row checks into booleans the twin states as
    constants: every ratio lands in (0.2, 1.5) (measured 0.39-1.13 across
    fixture SFs), and the distribution actually discriminates — both
    sides of the 0.45 mark are populated, so thresholding on the ratio
    splits the corpus rather than passing everything."""
    @F.pandas_udf("double")
    def comp_ratio(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: round(len(zlib.compress(t.encode("utf-8"))) / len(t), 6)
            if t
            else 1.0
        )

    d = load_table(spark, sf_dir, "documents").withColumn(
        "ratio", comp_ratio(F.col("text"))
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.bool_and((F.col("ratio") > 0.2) & (F.col("ratio") < 1.5)).alias(
            "ratios_in_range"
        ),
        (
            (F.sum(F.when(F.col("ratio") < 0.45, 1).otherwise(0)) > 0)
            & (F.sum(F.when(F.col("ratio") > 0.45, 1).otherwise(0)) > 0)
        ).alias("has_spread"),
    )


@register(
    "text_bigram_surprisal",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pairs AS (
        SELECT doc_id, t[i] AS tok, t[i+1] AS nxt
        FROM toks, unnest(generate_series(1, len(t) - 1)) u(i)
        WHERE len(t) >= 2
    ),
    ranks AS (
        SELECT tok, nxt,
               row_number() OVER (PARTITION BY tok
                                  ORDER BY count(*) DESC, nxt) AS rnk
        FROM pairs GROUP BY tok, nxt
    )
    SELECT p.doc_id, count(*) AS n_bigrams,
           round(CAST(sum(r.rnk) AS DOUBLE) / count(*), 4) AS avg_cont_rank
    FROM pairs p JOIN ranks r ON r.tok = p.tok AND r.nxt = p.nxt
    GROUP BY p.doc_id
    """,
)
def text_bigram_surprisal(spark, sf_dir):
    """Bigram continuation-rank scoring — the CONTEXTUAL upgrade of
    text_unigram_score: each (token → next) transition is ranked against
    all corpus continuations of that token (1 = the most common next
    word), and a document scores the mean rank of its transitions —
    predictable prose scores low, scrambled or machine-generated text
    scores high even when its unigrams look fluent. Same integer-exact
    discipline as the unigram key (ranks, not float log-probs, so the
    score is bit-identical across engines and partition layouts); bigrams
    come from one JVM-side transform over the token array (no self-join
    on position), and the rank table is corpus-bigram-sized — broadcast
    here; at 100 TB it stays a shuffle join or is truncated to top-K
    continuations per token, the documented fallback."""
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)-1),"
                    " i -> struct(t[i-1] AS tok, t[i] AS nxt))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.tok").alias("tok"), F.col("p.nxt").alias("nxt"))
    )
    wr = Window.partitionBy("tok").orderBy(F.col("cnt").desc(), "nxt")
    ranks = (
        pairs.groupBy("tok", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("tok", "nxt", F.row_number().over(wr).alias("rnk"))
    )
    return (
        pairs.join(F.broadcast(ranks), ["tok", "nxt"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("rnk").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_cont_rank"
            ),
        )
    )


NOVELTY_N = 8  # n-gram width for novelty attribution (decontamination width)


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(t[s : s + {NOVELTY_N - 1}], ' ')) AS g
        FROM toks,
             unnest(generate_series(1, greatest(len(t) - {NOVELTY_N - 1}, 0))) AS u(s)
    ),
    first_owner AS (SELECT g, min(doc_id) AS owner FROM grams GROUP BY g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.owner = grams.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(sum(CASE WHEN f.owner = grams.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS novelty
    FROM grams JOIN first_owner f USING (g)
    GROUP BY doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY — the data-valuation signal behind
    contribution-aware sampling: what fraction of a doc's distinct
    {8}-grams first appear (by min doc_id — the same first-occurrence
    total order as substring dedup) in THIS doc? A fully-copied doc
    scores 0, a fully-original one scores 1; dataset freshness curves
    and crawl-dedup ROI estimates are rollups of exactly this number.
    Complements the dedup family: dedup DECIDES, novelty MEASURES, so
    you can rank marginal sources before paying to ingest them.

    Integer-exact end to end (counts and one division, rounded): no
    floats cross engines un-rounded. Shape (r14 optimization — guide
    §2.3/§2.4 "aggregate before you shuffle / remove shuffles outright"):
    n_grams per doc is the SIZE of the distinct-gram array, computed
    map-side with no explode and no shuffle; n_novel per doc falls out of
    the ownership table alone — every gram has exactly one first owner
    (min doc_id), so counting owners per doc IS the novel-gram count.
    That retires the old gram-keyed join-back (which re-shuffled every
    gram row a second time) and the doc-keyed rollup of the joined rows:
    one corpus-sized shuffle (the gram-keyed min aggregate every dedup
    key already pays) instead of three. The final doc-level join of two
    narrow doc-sized frames auto-broadcasts at fixture scale and is a
    plain doc-keyed shuffle join at 100 TB. Grams still shuffle as md5
    DIGESTS, not raw ~50-char strings (the text_substring_dedup trick):
    narrower shuffle key, and because BOTH engines hash the same bytes,
    even a collision (~2^-128) would be attributed identically. Docs
    shorter than the gram width emit no row — they contribute no
    attributable text."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    garr = F.array_distinct(
        F.when(
            F.size(t) >= NOVELTY_N,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (NOVELTY_N - 1)),
                lambda s: F.md5(F.array_join(F.slice(t, s, NOVELTY_N), " ")),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    # branch 1 — map-side per-doc gram counts: one row per doc, no shuffle
    per_doc = d.select(
        "doc_id", F.size(garr).cast("long").alias("n_grams")
    ).filter(F.col("n_grams") > 0)
    # branch 2 — ownership: distinct grams -> min(doc_id) owner -> count
    # per owner. Both aggregates do map-side partial aggregation; nothing
    # corpus-sized is ever joined back.
    grams = d.select("doc_id", F.explode(garr).alias("g"))
    novel = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    # no broadcast hint: at fixture scale the planner auto-broadcasts the
    # doc-sized ownership counts; at 100 TB both sides are corpus-sized
    # narrow frames and a doc-keyed shuffle join is the right plan.
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0)).cast("long")
    return per_doc.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_novel.alias("n_novel"),
        F.round(n_novel / F.col("n_grams"), 6).alias("novelty"),
    )


# --- PII redaction (r9 VERDICT #2) ---------------------------------------
#
# The C4/CCNet curation stage: regex-redact emails, phone-shaped and
# IP-shaped spans, and report per-type counts (the audit the funnel wants).
# Patterns are deliberately RE2-compatible (character classes, bounded
# repetition, \b) so the SAME source strings compile identically under
# Java's regex engine (Spark) and RE2 (DuckDB) — no lookbehind, no
# backreferences. Scrub order is fixed (email -> phone -> IP) and identical
# on both sides; DuckDB's regexp_replace needs the explicit 'g' flag
# (SURVEY §5.3 trap) where Spark replaces globally by default.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_plant(frame):
    """Deterministic fixture augmentation: append doc_id-derived PII spans
    (email on every 3rd doc, phone every 5th, IP every 2nd) to a
    (doc_id, text) frame — the digit-free corpus gets real matches.
    Shared verbatim by the batch key, the streaming twin and the oracle
    replay (same expressions, same order)."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
        ),
    ).otherwise("")
    phone = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" call (555) "),
            F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise("")
    ip = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit("."),
            ((did * 7) % 256).cast("string"),
            F.lit("."),
            (did % 100 + 1).cast("string"),
        ),
    ).otherwise("")
    return frame.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("text")
    )


def pii_scrub(planted):
    """Row-local scrub + audit projection over a planted (doc_id, text)
    frame: typed placeholder replacement in fixed order (email -> phone ->
    IP), per-type counts, cleaned length/md5, all_clean post-condition.
    Works identically on batch and STREAMING frames (pure projections, no
    state) — the property the streaming twin leans on.

    Counting is PROGRESSIVE, mirroring the sequential replacement order:
    emails are counted on the raw text, phones on the email-scrubbed text,
    IPs on the phone-scrubbed text. A span matched by an earlier pattern
    can therefore never be double-counted by a later one — the audit counts
    equal the number of replacements actually performed, for arbitrary
    (overlap-prone) inputs via api.pii_scrub_text, not just the fixture's
    disjoint planted spans (r10 ADVICE)."""
    after_email = F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, F.lit(PII_PHONE_RE), F.lit("<PHONE>"))
    clean = F.regexp_replace(after_phone, F.lit(PII_IP_RE), F.lit("<IP>"))
    scrubbed = planted.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(after_phone, F.lit(PII_IP_RE)).cast("long").alias("n_ips"),
        F.length("text").cast("long").alias("planted_len"),
        clean.alias("clean"),
    )
    leftovers = (
        F.regexp_count("clean", F.lit(PII_EMAIL_RE))
        + F.regexp_count("clean", F.lit(PII_PHONE_RE))
        + F.regexp_count("clean", F.lit(PII_IP_RE))
    )
    return scrubbed.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        "planted_len",
        F.length("clean").cast("long").alias("clean_len"),
        F.md5("clean").alias("clean_md5"),
        (leftovers == 0).alias("all_clean"),
    )


PII_SCRUB_ORACLE = f"""
    WITH planted AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' call (555) ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                            || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 2 = 0
                       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                            || '.' || CAST(doc_id % 100 + 1 AS VARCHAR)
                       ELSE '' END AS text
        FROM documents
    ),
    staged AS (
        -- progressive counting (matches the Spark path): each type is
        -- counted on the text AFTER earlier types were replaced, so an
        -- overlapping span is only ever attributed to the pattern that
        -- actually consumed it (r10 ADVICE)
        SELECT doc_id, text,
               regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g')
                   AS after_email
        FROM planted
    ),
    staged2 AS (
        SELECT *, regexp_replace(after_email, '{PII_PHONE_RE}', '<PHONE>', 'g')
                   AS after_phone
        FROM staged
    ),
    scrubbed AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(after_email, '{PII_PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               CAST(len(regexp_extract_all(after_phone, '{PII_IP_RE}')) AS BIGINT)
                   AS n_ips,
               CAST(length(text) AS BIGINT) AS planted_len,
               regexp_replace(after_phone, '{PII_IP_RE}', '<IP>', 'g') AS clean
        FROM staged2
    )
    SELECT doc_id, n_emails, n_phones, n_ips, planted_len,
           CAST(length(clean) AS BIGINT) AS clean_len,
           md5(clean) AS clean_md5,
           (len(regexp_extract_all(clean, '{PII_EMAIL_RE}'))
            + len(regexp_extract_all(clean, '{PII_PHONE_RE}'))
            + len(regexp_extract_all(clean, '{PII_IP_RE}'))) = 0 AS all_clean
    FROM scrubbed
    """


@register("text_pii_scrub", oracle=PII_SCRUB_ORACLE)
def text_pii_scrub(spark, sf_dir):
    """PII redaction with a per-type audit — the standard C4/CCNet scrub
    stage: replace email / phone-shaped / IP-shaped spans with typed
    placeholder tokens and count what was removed, per document.

    The fixture corpus is digit-free by construction, so the key first
    PLANTS deterministic PII spans derived from doc_id (emails on every
    3rd doc, phones every 5th, IPs every 2nd — replayed identically in
    the oracle SQL): the scrub is exercised on real matches at every SF
    and the hash pins counts, cleaned lengths AND the cleaned bytes
    (md5). `all_clean` re-applies all three patterns to the output — the
    post-condition a production run gates publication on.

    Scale shape: entirely row-local projections (regexp_count +
    regexp_replace, JVM-side, whole-stage codegen) — zero shuffles, zero
    Python. At 100 TB this is a map-only pass that pipelines with the
    scan; counts aggregate into the funnel with one extra rollup. The
    plant + scrub stages are shared helpers (pii_plant / pii_scrub) also
    driven by the streaming twin stream_pii_scrub."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pii_scrub(pii_plant(d))


HASHTF_BUCKETS = 64  # feature-hashing dimensionality


@register(
    "text_hashing_tf",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    bucketed AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)
                   % {HASHTF_BUCKETS} AS b
        FROM tok
    ),
    cnt AS (SELECT doc_id, b, count(*) AS c FROM bucketed GROUP BY 1, 2),
    grid AS (
        SELECT d.doc_id, g.b, COALESCE(cnt.c, 0) AS c
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(0, {HASHTF_BUCKETS - 1}))
                    AS b) g
        LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.b = g.b
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
           array_to_string(list(CAST(c AS BIGINT) ORDER BY b), ',')
               AS features_csv
    FROM grid GROUP BY doc_id
    """,
)
def text_hashing_tf(spark, sf_dir):
    """Feature hashing (the hashing trick / HashingTF): every token maps
    to one of {HASHTF_BUCKETS} buckets by md5, and each doc becomes a
    dense integer count vector — the VOCABULARY-FREE featurizer that
    pairs with quality_linear/quality_nb: no fitted vocab to broadcast,
    version or drift, so the featurization of doc N is independent of
    every other doc (map-ready at any corpus size; collisions are the
    accepted price, as in Vowpal Wabbit / MLlib's HashingTF). Emits the
    dense vector (projected as a CSV string — container-typed columns are
    driver-canon unsafe, the harness's standing rule) plus n_tokens and
    nnz for downstream filters.

    Plan: one token explode → one (doc, bucket)-keyed count (the only
    corpus shuffle), densified against a {HASHTF_BUCKETS}-row broadcast
    grid and assembled with the sort_array(collect_list(struct)) idiom.
    Exactness: all integers; bucket = 32-bit md5 prefix % B identically
    in both engines."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
        % HASHTF_BUCKETS
    )
    cnt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .select("doc_id", bucket.alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = d.select("doc_id").crossJoin(
        F.broadcast(
            spark.range(HASHTF_BUCKETS).select(F.col("id").alias("b"))
        )
    )
    full = grid.join(cnt, ["doc_id", "b"], "left").select(
        "doc_id", "b", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    return full.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("c") > 0, 1).otherwise(0)).cast("long").alias("nnz"),
        F.array_join(
            F.sort_array(F.collect_list(F.struct("b", "c")))["c"], ","
        ).alias("features_csv"),
    )


def _langid_eval_oracle() -> str:
    from data_transform_spark.registry import ORACLES

    return f"""
    WITH pred AS (SELECT lang, pred_lang FROM ({ORACLES["text_lang_id"]}) _p),
    cells AS (
        SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY lang, pred_lang
    ),
    rows_ AS (
        SELECT lang, CAST(sum(n) AS BIGINT) AS n_truth FROM cells GROUP BY lang
    )
    SELECT c.lang, c.pred_lang, c.n, r.n_truth,
           CAST(round(c.n * 1e6 / r.n_truth, 0) AS BIGINT) AS cell_rate_u,
           c.lang = c.pred_lang AS is_correct
    FROM cells c JOIN rows_ r USING (lang)
    """


@register("quality_langid_eval", oracle=_langid_eval_oracle())
def quality_langid_eval(spark, sf_dir):
    """Confusion matrix for the lang-ID heuristic: one row per (true lang,
    predicted lang) cell with its count, the truth-class total, and the
    integer cell rate (diagonal cells = per-class recall) — the eval rung
    of the lang-ID family, in the same measure-before-you-trust spirit as
    sim_ann_recall_curve (ANN), events_forecast_backtest (forecasting)
    and quality_pr_curve (the NB gate). Deliberately honest on this
    fixture: the shipped profiles only separate en/de/es, so fr/zh rows
    show exactly HOW the classifier fails (everything needs a confusion
    matrix before it gates a corpus). Pure reuse of the registered
    predictor + one (lang, pred)-keyed count — at 100 TB this is a
    25-cell aggregate over one scan."""
    pred = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    cells = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rows = cells.groupBy("lang").agg(F.sum("n").cast("long").alias("n_truth"))
    return cells.join(F.broadcast(rows), "lang").select(
        "lang",
        "pred_lang",
        "n",
        "n_truth",
        F.round(F.col("n") * 1e6 / F.col("n_truth"), 0)
        .cast("long")
        .alias("cell_rate_u"),
        (F.col("lang") == F.col("pred_lang")).alias("is_correct"),
    )


# --- Vocabulary-growth (Heaps' law) curve (round 13) ----------------------
HEAPS_POINTS = 10  # checkpoints along the doc_id axis


@register(
    "text_heaps_curve",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    bounds AS (
        SELECT CAST(min(doc_id) AS BIGINT) AS lo,
               CAST(max(doc_id) AS BIGINT) AS hi
        FROM d
    ),
    cps AS (
        SELECT CAST(k AS BIGINT) AS k,
               b.lo + CAST(floor(k * (b.hi - b.lo) / {HEAPS_POINTS}.0)
                           AS BIGINT) AS cutoff_id
        FROM unnest(generate_series(1, {HEAPS_POINTS})) AS u(k), bounds b
    ),
    doctok AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok FROM d),
    tokside AS (
        SELECT c.k, c.cutoff_id,
               CAST(sum(CASE WHEN dt.doc_id <= c.cutoff_id THEN 1
                        ELSE 0 END) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN dt.doc_id <= c.cutoff_id THEN dt.n_tok
                        ELSE 0 END) AS BIGINT) AS cum_tokens
        FROM doctok dt, cps c GROUP BY c.k, c.cutoff_id
    ),
    firsts AS (
        SELECT w, CAST(min(doc_id) AS BIGINT) AS first_doc
        FROM (SELECT doc_id, unnest(t) AS w FROM d)
        GROUP BY w
    ),
    vocside AS (
        SELECT c.k,
               CAST(sum(CASE WHEN f.first_doc <= c.cutoff_id THEN 1
                        ELSE 0 END) AS BIGINT) AS cum_vocab
        FROM firsts f, cps c GROUP BY c.k
    ),
    curve AS (
        SELECT t.k, t.cutoff_id, t.n_docs, t.cum_tokens, v.cum_vocab
        FROM tokside t JOIN vocside v USING (k)
    )
    SELECT k, cutoff_id, n_docs, cum_tokens, cum_vocab,
           CASE WHEN cum_tokens = 0 THEN 0
                ELSE CAST(floor((2 * cum_vocab * 1000000 + cum_tokens)
                                / (2.0 * cum_tokens)) AS BIGINT)
           END AS ttr_u,
           CASE WHEN lag(cum_tokens) OVER w IS NULL
                  OR cum_tokens <= lag(cum_tokens) OVER w
                  OR lag(cum_tokens) OVER w = 0
                THEN 0
                ELSE CAST(floor((ln(cum_vocab)
                                 - ln(lag(cum_vocab) OVER w))
                                / (ln(cum_tokens)
                                   - ln(lag(cum_tokens) OVER w))
                                * 1000000 + 0.5) AS BIGINT)
           END AS beta_u
    FROM curve
    WINDOW w AS (ORDER BY k)
    """,
)
def text_heaps_curve(spark, sf_dir):
    """Vocabulary-growth curve (Heaps/Herdan law, V ≈ K·T^β) — the table
    a pipeline owner reads before sizing a tokenizer vocabulary or
    estimating dedup headroom: at {HEAPS_POINTS} checkpoints along the
    doc_id axis (value-based cutoffs lo + ⌊k·span/{HEAPS_POINTS}⌋ — pure
    aggregates, deliberately NOT rank-based, so no global sort exists
    anywhere in the plan), report docs seen, cumulative tokens,
    cumulative vocabulary (words whose FIRST occurrence is ≤ the cutoff
    — a min-aggregate per word), half-up type-token ratio in micro-units,
    and the local log-log slope β between consecutive checkpoints
    (ln on integer-valued cumulative counts — the libm-on-integers
    idiom — quantized half-up to micro-units; degenerate steps report 0).

    Scale: two corpus scans (token counts; word→min(doc_id)) + a
    10-row broadcast cross join for the conditional cumulative sums + a
    10-row window for the slopes. The first-occurrence table is
    vocabulary-sized; nothing shuffles more than once. A real 100 TB run
    reads the curve to decide where vocabulary growth flattens (β→0 ⇒
    more data stops buying new types ⇒ vocab size / dedup posture).

    Fixture honesty: the synthetic corpus draws from a ~31-word pool, so
    cum_vocab saturates before the FIRST checkpoint and every beta_u is
    0 — which is the correct reading of that corpus, and the TTR column
    still falls 1127→115 micro-units across checkpoints (pinned). The
    positive-β regime is pinned by a test on a synthetic corpus with a
    decaying fresh-word rate (β ≈ 0.5, strictly inside (0,1))."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("t")
    )
    bounds = d.agg(
        F.min("doc_id").cast("long").alias("lo"),
        F.max("doc_id").cast("long").alias("hi"),
    )
    cps = (
        spark.range(1, HEAPS_POINTS + 1)
        .select(F.col("id").cast("long").alias("k"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "k",
            (
                F.col("lo")
                + F.floor(
                    F.col("k") * (F.col("hi") - F.col("lo")) / float(HEAPS_POINTS)
                ).cast("long")
            ).alias("cutoff_id"),
        )
    )
    doctok = d.select("doc_id", F.size("t").cast("long").alias("n_tok"))
    tokside = (
        doctok.crossJoin(F.broadcast(cps))
        .groupBy("k", "cutoff_id")
        .agg(
            F.sum(F.when(F.col("doc_id") <= F.col("cutoff_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs"),
            F.sum(
                F.when(
                    F.col("doc_id") <= F.col("cutoff_id"), F.col("n_tok")
                ).otherwise(0)
            )
            .cast("long")
            .alias("cum_tokens"),
        )
    )
    firsts = (
        d.select("doc_id", F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").cast("long").alias("first_doc"))
    )
    vocside = (
        firsts.crossJoin(F.broadcast(cps.select("k", "cutoff_id")))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("first_doc") <= F.col("cutoff_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("cum_vocab")
        )
    )
    curve = tokside.join(vocside, "k")
    from pyspark.sql import Window as W

    w = W.orderBy("k")
    lag_t = F.lag("cum_tokens").over(w)
    lag_v = F.lag("cum_vocab").over(w)
    return curve.select(
        "k",
        "cutoff_id",
        "n_docs",
        "cum_tokens",
        "cum_vocab",
        F.when(F.col("cum_tokens") == 0, F.lit(0))
        .otherwise(
            F.floor(
                (2 * F.col("cum_vocab") * F.lit(1_000_000) + F.col("cum_tokens"))
                / (2.0 * F.col("cum_tokens"))
            )
        )
        .cast("long")
        .alias("ttr_u"),
        F.when(
            lag_t.isNull() | (F.col("cum_tokens") <= lag_t) | (lag_t == 0),
            F.lit(0),
        )
        .otherwise(
            F.floor(
                (F.log(F.col("cum_vocab")) - F.log(lag_v))
                / (F.log(F.col("cum_tokens")) - F.log(lag_t))
                * 1_000_000
                + 0.5
            )
        )
        .cast("long")
        .alias("beta_u"),
    )
