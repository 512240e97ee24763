"""Corpus-curation operators a training-data pipeline runs before packing:
benchmark decontamination, importance-weighted sampling, domain mixing, and
RAG chunking.

All four are pure Column/JVM plans (no Python in the hot path) with exact
DuckDB twins. Sampling keys are content-stable md5 buckets (the sample_hash
idiom) so every decision is reproducible across engines, runs, partitions
and cluster sizes — the property training-data curation actually needs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register

NGRAM_N = 8  # decontamination n-gram width (tokens)
CHUNK_SIZE = 50  # rag chunk width (tokens)
CHUNK_STRIDE = 40  # rag chunk stride (tokens) -> 10-token overlap


def _u01(key_col, salt: str):
    """Deterministic uniform(0,1) from a content hash — identical in both
    engines: 32-bit md5 prefix / 2^32."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )


_U01_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 8)) "
    "AS BIGINT) / 4294967296.0"
)


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, array_to_string(t[s : s + {NGRAM_N - 1}], ' ') AS g
        FROM tok, unnest(generate_series(1, greatest(len(t) - {NGRAM_N - 1}, 0))) AS u(s)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
    SELECT doc_id, count(DISTINCT g) AS n_contaminated_grams
    FROM grams JOIN bench USING (g)
    WHERE doc_id % 97 <> 0
    GROUP BY doc_id
    """,
)
def decontaminate_ngram(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing any 8-token
    n-gram with the eval/benchmark set (here: doc_id % 97 == 0 stands in
    for the benchmark corpus).

    The THE training-data hygiene op: eval contamination silently inflates
    benchmark scores. Shape: both sides stream n-grams straight out of the
    scan (sliding window via sequence+slice, pure Column ops), the
    benchmark gram set — tiny relative to the corpus — is deduped and
    broadcast, and contaminated docs aggregate matched-gram counts. At
    100 TB the corpus side stays a single scan + one aggregate shuffle;
    only benchmark grams are ever collected into a broadcast."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    grams = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(t) >= NGRAM_N,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (NGRAM_N - 1)),
                    lambda s: F.array_join(F.slice(t, s, NGRAM_N), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_contaminated_grams"))
    )


@register(
    "sample_weighted",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_U01_SQL.format(salt=':w')} < LEAST(n_chars / 1000.0, 1.0)
    """,
)
def sample_weighted(spark, sf_dir):
    """Importance-weighted Bernoulli sampling: keep probability proportional
    to a per-row weight (here length-based, least(n_chars/1000, 1)).

    The curation primitive behind quality-weighted corpus construction:
    up-weight long/high-quality docs without a global sort or a second
    pass. Decision = content-stable u(0,1) < weight — shuffle-free, scan
    plus filter, reproducible at any cluster size."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.least(F.col("n_chars") / 1000.0, F.lit(1.0))
    return d.filter(_u01(F.col("doc_id"), ":w") < rate).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "mix_domains",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_U01_SQL.format(salt=':mix')}
          < CASE WHEN CAST(substring(source, 4) AS INTEGER) < 10
                 THEN 0.8 ELSE 0.2 END
    """,
)
def mix_domains(spark, sf_dir):
    """Domain mixing: re-weight the corpus toward a target source
    distribution by per-domain Bernoulli rates (src0-src9 at 0.8,
    src10-src19 at 0.2).

    The pipeline op behind 'X% web, Y% code, Z% books' training mixes.
    Same content-stable u(0,1) decision as sample_weighted with a distinct
    salt, so mixing composes independently with other sampling stages.
    Zero shuffles — rates fold into the scan filter."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(
        F.substring("source", 4, 10).cast("int") < 10, F.lit(0.8)
    ).otherwise(F.lit(0.2))
    return d.filter(_u01(F.col("doc_id"), ":mix") < rate).select("doc_id", "source")


TEMP_ALPHA = 0.7  # sampling temperature (mT5/XLM-R use 0.3-0.7)


@register(
    "sample_temperature",
    oracle=f"""
    WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT sum(n) AS t FROM cnt),
    w AS (SELECT lang, ROUND(pow(n * 1.0 / t, {TEMP_ALPHA} - 1), 6) AS wr
          FROM cnt, tot),
    rates AS (SELECT lang,
                     ROUND(wr / (SELECT max(wr) FROM w), 6) AS rate
              FROM w)
    SELECT d.doc_id, d.lang, r.rate
    FROM documents d JOIN rates r USING (lang)
    WHERE {_U01_SQL.format(salt=':temp')} < r.rate
    """,
)
def sample_temperature(spark, sf_dir):
    """Temperature-scaled domain sampling (mT5/XLM-R multilingual
    balancing): target share q_d ∝ p_d^α flattens the domain
    distribution toward uniform as α→0, so low-resource domains aren't
    drowned by head domains. Realized as per-domain Bernoulli rates
    r_d ∝ p_d^(α-1), normalized so the rarest domain keeps rate 1.0
    (downsample-only — upsampling needs replication, a different op);
    unlike mix_domains' HAND-SPECIFIED rates, the rates here are
    DERIVED from the observed distribution, so the op adapts as the
    corpus shifts. Domain = LANG since round 11: the fixture's source
    column is perfectly uniform (25 docs/src at every SF), which made
    every rate 1.0 and the op a no-op on its own fixture; lang is skewed
    (en ≈ 40%) so the head language is genuinely downsampled
    (rate ≈ 0.73 at sf0.01) while the rarest keeps 1.0.

    Plan: one tiny shuffle for the per-domain counts, total and max as
    broadcast 1-row aggregates riding in-plan, a broadcast rate join
    (domains-sized), and the same content-stable u(0,1) keep decision
    as sample_weighted (distinct salt, so stages compose). Cross-engine
    float discipline (r8 ADVICE): the pow() output itself rounds to 6 dp
    in BOTH engines BEFORE the max-normalization, and the ratio rounds
    again after — a last-ulp Java-vs-DuckDB pow divergence must now land
    within ~1e-10 of a rounding boundary TWICE (independent boundaries)
    to flip a rate, vs once when only the final ratio rounded. Residual
    risk is therefore second-order, not eliminated: pow with a fractional
    exponent has no DECIMAL-exact path, so a fixture whose domain share
    puts pow() exactly on a 0.5e-6 boundary could still diverge."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("t"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.round(
            F.pow(F.col("n") / F.col("t"), F.lit(TEMP_ALPHA - 1)), 6
        ).alias("wr"),
    )
    mx = w.agg(F.max("wr").alias("mx"))
    rates = w.crossJoin(F.broadcast(mx)).select(
        "lang", F.round(F.col("wr") / F.col("mx"), 6).alias("rate")
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(_u01(F.col("doc_id"), ":temp") < F.col("rate"))
        .select("doc_id", "lang", "rate")
    )


@register(
    "rag_chunk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           array_to_string(t[s : s + {CHUNK_SIZE - 1}], ' ') AS chunk_text,
           CAST(len(t[s : s + {CHUNK_SIZE - 1}]) AS INTEGER) AS n_tokens
    FROM tok, unnest(generate_series(1, len(t), {CHUNK_STRIDE})) AS u(s)
    """,
)
def rag_chunk(spark, sf_dir):
    """Overlapping-window chunking (50-token chunks, stride 40) for
    retrieval/embedding pipelines.

    One row per (doc, chunk) with a stable chunk_id; trailing partial
    chunks kept (their n_tokens says so). Pure sequence+slice Column ops —
    the explode multiplies rows ~len/stride but never leaves the JVM, and
    chunking composes with shard_assign for deterministic chunk-level
    output layout."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(t), F.lit(CHUNK_STRIDE))
    chunks = d.select(
        "doc_id",
        t.alias("t"),
        F.explode(starts).alias("s"),
    )
    piece = F.slice(F.col("t"), F.col("s"), CHUNK_SIZE)
    return chunks.select(
        "doc_id",
        ((F.col("s") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


@register(
    "pipeline_funnel",
    oracle="""
    WITH surv AS (
        SELECT doc_id, n_chars, len(string_split(text, ' ')) AS n_words
        FROM documents
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    gated AS (
        SELECT * FROM surv WHERE n_chars >= 100 AND n_words BETWEEN 20 AND 2000
    )
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT count(*) FROM surv) AS n_unique,
           (SELECT count(*) FROM gated) AS n_gated,
           (SELECT CAST(COALESCE(sum(n_words), 0) AS BIGINT) FROM gated)
               AS tokens_out
    """,
)
def pipeline_funnel(spark, sf_dir):
    """Curation funnel report: docs in -> exact-dedup survivors -> quality
    gate -> training tokens out, as ONE row computed entirely in-plan.

    The yield report every corpus run ships with. Each stage count is a
    1-row aggregate cross-joined onto the next (the same in-plan-scalar
    discipline as pipeline_e2e after round 4) — NO driver-side .count()
    anywhere, so the funnel is one job and the lineage stays lazy. At
    100 TB the stage frames share the single md5-partitioned dedup shuffle;
    everything after it is metadata-narrow."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    surv = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("n_words", F.size(F.split("text", " ")))
    )
    gated = surv.filter(
        (F.col("n_chars") >= 100) & F.col("n_words").between(20, 2000)
    )
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    uniq = surv.agg(F.count(F.lit(1)).alias("n_unique"))
    g = gated.agg(
        F.count(F.lit(1)).alias("n_gated"),
        F.coalesce(F.sum("n_words"), F.lit(0)).cast("long").alias("tokens_out"),
    )
    return total.crossJoin(uniq).crossJoin(g)


FUZZY_NGRAM = 13  # GPT-3-style decontamination gram width (13 tokens)


@register(
    "decontaminate_fuzzy",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - {FUZZY_NGRAM - 1}, 0)),
                   s -> array_to_string(t[s : s + {FUZZY_NGRAM - 1}], ' '))) AS gs
        FROM norm
    ),
    bench AS (
        SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0
    ),
    hits AS (
        SELECT doc_id, count(*) AS n_shared
        FROM (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 97 <> 0)
        JOIN bench USING (g) GROUP BY doc_id
    )
    SELECT g.doc_id, CAST(len(g.gs) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
           ROUND(COALESCE(h.n_shared, 0) * 1.0 / greatest(len(g.gs), 1), 6)
               AS contamination_ratio,
           COALESCE(h.n_shared, 0) >= 1 AS is_contaminated
    FROM grams g LEFT JOIN hits h USING (doc_id)
    WHERE g.doc_id % 97 <> 0
    """,
)
def decontaminate_fuzzy(spark, sf_dir):
    """FUZZY benchmark decontamination — the GPT-3/Llama recipe one rung
    above decontaminate_ngram's exact-8-gram flags: text NORMALIZES first
    (lowercase, punctuation → space, whitespace collapse — so cosmetic
    edits can't hide contamination), grams widen to {13} tokens (the
    GPT-3 width; a 13-token collision is essentially never coincidence),
    each doc's gram set dedupes, and the output grades EVERY candidate
    doc with a contamination RATIO rather than only flagging hits —
    supporting both the drop-on-any-hit policy (is_contaminated) and
    graded quarantine thresholds. Docs shorter than the gram width have
    zero grams and ratio 0 by definition.

    Scale shape is decontaminate_ngram's: grams stream out of the scan
    (sequence+slice Column ops on the normalized token array), ONLY the
    benchmark gram set (tiny by contract) is deduped and broadcast, and
    the per-doc rollup is one keyed aggregate. The normalization is a
    no-op on this all-lowercase fixture — deliberately verified real by
    the unit test, which plants cased/punctuated variants."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.split(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        ),
        " ",
    )
    gs = F.array_distinct(
        F.when(
            F.size(norm) >= FUZZY_NGRAM,
            F.transform(
                F.sequence(F.lit(1), F.size(norm) - (FUZZY_NGRAM - 1)),
                lambda s: F.array_join(F.slice(norm, s, FUZZY_NGRAM), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    grams = d.select("doc_id", gs.alias("gs"))
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.explode("gs").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.size("gs").cast("long").alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.round(
                F.coalesce("n_shared", F.lit(0))
                / F.greatest(F.size("gs"), F.lit(1)),
                6,
            ).alias("contamination_ratio"),
            (F.coalesce("n_shared", F.lit(0)) >= 1).alias("is_contaminated"),
        )
    )


MIX_TOKEN_BUDGET = 2000  # per-source token budget for the budgeted mix


@register(
    "mix_token_budget",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tok,
               COALESCE(sum(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM d
    )
    SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(cum_before AS BIGINT) AS cum_before
    FROM c WHERE cum_before < {MIX_TOKEN_BUDGET}
    """,
)
def mix_token_budget(spark, sf_dir):
    """Token-budgeted domain mixing — the other half of the mixing story:
    mix_domains/sample_temperature set per-domain RATES, but a real
    training-mix spec says "at most N tokens from domain X". Greedy
    whole-doc take in deterministic (doc_id) order per source: a doc is
    kept while its domain's running token total is still under the
    budget (the doc that CROSSES the budget is kept — whole-doc
    semantics, so every domain lands in [budget, budget + max_doc));
    rerunning on a grown corpus keeps exactly the same docs (prefix
    stability), unlike rate-based sampling which re-draws everything.

    One keyed window per source (scales like any keyed cumsum — no
    global window), then a row-local budget test. At 100 TB the window's
    sort is per-source and the budget cut makes the output size
    independent of corpus size — this op gets CHEAPER as the corpus
    grows past its budgets."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum_before"),
    )
    return c.filter(F.col("cum_before") < MIX_TOKEN_BUDGET).select(
        "doc_id",
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("cum_before").cast("long").alias("cum_before"),
    )


# Hand-specified linear quality model (the fastText-classifier pattern:
# extract cheap features, score with a linear model, gate on the sign).
# Weights tuned on the fixture's feature distribution to a ~63% keep rate
# (measured; a real pipeline would fit them on labeled data — the OP is
# the feature extraction + scoring shape, the weights are config).
QL_W_NTOK = 0.01
QL_W_TTR = 3.0
QL_W_STOP = -4.0
QL_W_AWL = 0.3
QL_BIAS = -3.0


@register(
    "quality_linear",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS ttr,
               len(list_filter(string_split(text, ' '),
                               x -> x IN ('a', 'the'))) * 1.0
                   / len(string_split(text, ' ')) AS stop,
               (length(text) - len(string_split(text, ' ')) + 1) * 1.0
                   / len(string_split(text, ' ')) AS awl
        FROM documents
    ),
    z AS (
        SELECT doc_id, n_tok, ttr, stop, awl,
               {QL_W_NTOK} * n_tok + {QL_W_TTR} * ttr + {QL_W_STOP} * stop
                   + {QL_W_AWL} * awl + ({QL_BIAS}) AS z
        FROM f
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           ROUND(ttr, 6) AS ttr, ROUND(stop, 6) AS stopword_ratio,
           ROUND(awl, 6) AS avg_word_len,
           ROUND(1.0 / (1.0 + exp(-z)), 6) AS score,
           z >= 0 AS keep
    FROM z
    """,
)
def quality_linear(spark, sf_dir):
    """Model-based quality filtering (the fastText/FineWeb-Edu-classifier
    pattern, with a hand-specified linear model standing in for learned
    weights): extract cheap per-doc features — token count, type-token
    ratio, stopword ratio, average word length — score them with a
    linear model, keep docs with non-negative logits. One rung above
    text_quality's raw features: this is the SHAPE every classifier-based
    filter runs at scale (features in one row-local pass, broadcast-free
    scoring, gate on the sign).

    Cross-engine float discipline: the KEEP decision is z >= 0 where z is
    built from +,-,×,÷ over integer-derived doubles and literal weights —
    IEEE-deterministic in both engines, no pow/exp anywhere in the
    decision (sigmoid(z) >= 0.5 ⟺ z >= 0). The displayed sigmoid score
    rounds to 6 dp; exp() ulp divergence can at most flip that display's
    last digit on an exact boundary, never the decision."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tok
    stop = (
        F.size(F.filter(toks, lambda x: x.isin("a", "the")))
        * F.lit(1.0)
        / n_tok
    )
    awl = (F.length("text") - n_tok + 1) * F.lit(1.0) / n_tok
    z = (
        F.lit(QL_W_NTOK) * n_tok
        + F.lit(QL_W_TTR) * ttr
        + F.lit(QL_W_STOP) * stop
        + F.lit(QL_W_AWL) * awl
        + F.lit(QL_BIAS)
    )
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tok"),
        F.round(ttr, 6).alias("ttr"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round(awl, 6).alias("avg_word_len"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        (z >= 0).alias("keep"),
    )


# --- in-plan TRAINED quality classifier (r9 VERDICT #3) -------------------
#
# quality_linear APPLIES fixed weights; the real fastText recipe FITS them.
# quality_nb distills a deterministic keyword weak label (the standard
# weak-supervision shape: an editor's rule names a handful of marker words,
# the classifier generalizes it to full word-count evidence) into a
# multinomial Naive Bayes model, trained ENTIRELY in-plan on the md5-split
# train half and scored over every doc. Measured held-out accuracy
# 0.84-0.90 vs a 0.59-0.62 majority base rate at sf0.001/0.01/0.1
# (property-tested).
QNB_POS = ("hash", "order", "window", "table", "big")  # quality markers
QNB_NEG = ("customer", "scan", "slow", "small")  # junk markers

_QNB_POS_SQL = ", ".join(f"'{w}'" for w in QNB_POS)
_QNB_NEG_SQL = ", ".join(f"'{w}'" for w in QNB_NEG)


# Shared CTE chain: the full NB fit + per-doc scoring, reused verbatim by
# the quality_nb oracle and the quality_pr_curve oracle (one source of
# truth — the two replays can never drift).
_QNB_CTE_SQL = f"""d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    lab AS (
        SELECT doc_id, toks,
               len(list_filter(toks, x -> x IN ({_QNB_POS_SQL})))
             > len(list_filter(toks, x -> x IN ({_QNB_NEG_SQL}))) AS label,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_train
        FROM d
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
    ttr AS (
        SELECT t.doc_id, t.tok, l.label
        FROM tok t JOIN lab l USING (doc_id) WHERE l.is_train
    ),
    cls AS (
        SELECT tok,
               CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS cp,
               CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS cn
        FROM ttr GROUP BY tok
    ),
    tot AS (
        SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS v
        FROM cls
    ),
    doctot AS (
        SELECT CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS ndpos,
               CAST(count(*) AS BIGINT) AS ndtr
        FROM lab WHERE is_train
    ),
    w AS (
        SELECT tok,
               CAST(round((ln(CAST(cp + 1 AS DOUBLE))
                           - ln(CAST(np + v AS DOUBLE))
                           - ln(CAST(cn + 1 AS DOUBLE))
                           + ln(CAST(nn + v AS DOUBLE))) * 1000000, 0)
                    AS BIGINT) AS wu
        FROM cls, tot
    ),
    prior AS (
        SELECT CAST(round((ln(CAST(ndpos + 1 AS DOUBLE))
                           - ln(CAST(ndtr - ndpos + 1 AS DOUBLE))) * 1000000, 0)
                    AS BIGINT) AS pu
        FROM doctot
    ),
    score AS (
        SELECT t.doc_id, CAST(sum(coalesce(w.wu, 0)) AS BIGINT) AS su
        FROM tok t LEFT JOIN w USING (tok) GROUP BY t.doc_id
    ),
    scored AS (
        SELECT l.doc_id, l.is_train, l.label,
               CAST(s.su + p.pu AS BIGINT) AS logit_u,
               (s.su + p.pu) >= 0 AS pred,
               ((s.su + p.pu) >= 0) = l.label AS correct
        FROM lab l JOIN score s USING (doc_id), prior p
    )"""


@register(
    "quality_nb",
    oracle=f"""
    WITH {_QNB_CTE_SQL}
    SELECT doc_id, is_train, label, logit_u, pred, correct FROM scored
    """,
)
def quality_nb(spark, sf_dir):
    """In-plan TRAINED quality classifier (multinomial Naive Bayes): fit
    on the md5-split train half against a deterministic keyword weak
    label (docs where quality-marker words outnumber junk-marker words),
    then score EVERY doc — the fastText-distillation recipe with the fit
    itself inside the plan, not applied constants (contrast
    quality_linear).

    Float discipline (the quality_linear/vocab_bpe lesson, hardened):
    per-token Laplace log-odds and the class prior are quantized to
    INTEGER MICRONATS — CAST(round(ln(·)·1e6) AS BIGINT) — the moment
    they are derived, so every downstream sum and the keep decision
    (logit_u >= 0) is exact integer arithmetic in any aggregation order.
    The only cross-engine float surface is ln() of a shared integer,
    whose ≤1-ulp divergence (~1e-15 abs) sits eight orders of magnitude
    below the micronat rounding step. The md5 doc split and the ln
    expression tree are written identically on both engines.

    Scale shape: one token explode + one vocabulary-keyed count (the
    shuffle every vocab_build pays), three 1-row/vocab-row broadcast
    frames (totals, prior, weights), one doc-keyed scoring aggregate.
    Training reads the corpus once; nothing collects to the driver.
    Measured held-out accuracy 0.84-0.90 vs 0.59-0.62 majority base
    (property-tested: the fitted decision must beat the base rate on
    held-out md5-split docs)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    return _nb_scored(d)


def _nb_fit(d):
    """Fit the integer-micronat NB on a (doc_id, toks) frame: returns
    (lab, tok, w, prior) — weak labels + split flags, the token explode,
    the per-token micronat weight frame (vocab-sized) and the 1-row prior.
    Split from quality_nb so pipeline_e2e_llm_v3 can reuse the trained
    scorer as a funnel stage without refitting code drifting."""
    pos_cnt = F.size(F.filter("toks", lambda x: x.isin(*QNB_POS)))
    neg_cnt = F.size(F.filter("toks", lambda x: x.isin(*QNB_NEG)))
    lab = d.select(
        "doc_id",
        (pos_cnt > neg_cnt).alias("label"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
        ).alias("is_train"),
    )
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    # NOTE (r15 A/B): computing the label inline in the training explode
    # (skipping this join) measured a 2x REGRESSION — the label exprs land
    # in the projection ABOVE the Generate, so size(filter(toks)) re-runs
    # per exploded token (quality_nb 1.9 -> 4.0 CPU-s, v3 34 -> 47).
    # The doc-keyed join attaches the two booleans once per doc; keep it.
    ttr = tok.join(lab, "doc_id").filter("is_train")
    # r14 (guide §5): the vocab-sized class-count table feeds the 1-row
    # totals aggregate AND the weight projection, which meet at a
    # broadcast crossJoin (no runtime exchange reuse) — unshared, the
    # token explode + train join + vocab count ran twice per fit.
    # Vocab-sized, so the cache is broadcast-scale at any corpus size.
    from data_transform_spark.pipeline.e2e import _persist_share

    cls = _persist_share(
        ttr.groupBy("tok").agg(
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("cp"),
            F.sum(F.when(F.col("label"), 0).otherwise(1)).cast("long").alias("cn"),
        ),
        eager=True,
    )
    tot = cls.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cn").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    doctot = lab.filter("is_train").agg(
        F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("ndpos"),
        F.count(F.lit(1)).cast("long").alias("ndtr"),
    )
    # identical expression tree to the oracle: ln(cp+1) - ln(np+v)
    # - ln(cn+1) + ln(nn+v), quantized to integer micronats immediately
    wu = F.round(
        (
            F.log((F.col("cp") + 1).cast("double"))
            - F.log((F.col("np") + F.col("v")).cast("double"))
            - F.log((F.col("cn") + 1).cast("double"))
            + F.log((F.col("nn") + F.col("v")).cast("double"))
        )
        * 1000000,
        0,
    ).cast("long")
    w = cls.crossJoin(F.broadcast(tot)).select("tok", wu.alias("wu"))
    pu = F.round(
        (
            F.log((F.col("ndpos") + 1).cast("double"))
            - F.log((F.col("ndtr") - F.col("ndpos") + 1).cast("double"))
        )
        * 1000000,
        0,
    ).cast("long")
    prior = doctot.select(pu.alias("pu"))
    return lab, tok, w, prior


NB_GATE_PRECISION = 0.8  # PR-curve operating point for the model gate
NB_RANK_BUCKETS = 256  # equal-width logit bands for the two-phase rank


def _held_ranked(held):
    """EXACT global row_number over (logit_u DESC, doc_id ASC) with NO
    eval-set-sized single-partition window (r13 VERDICT #3 — the held-out
    md5 split is ~half the corpus here, so 'eval-set-bounded' did not
    actually bound the old global rank). Two-phase, the
    train_shuffle_epoch discipline adapted to a value ordering:

    1. band rows into NB_RANK_BUCKETS equal-width logit_u ranges (bounds
       from a 1-row broadcast aggregate; ties in logit_u can never
       straddle a band because the band is a function of logit_u alone);
    2. per-band counts -> cumulative offsets via a window over the
       ≤NB_RANK_BUCKETS-row count table (the only single-partition
       window left — bucket-table-sized by construction, never rows);
    3. rank = band offset + row_number within the band
       (Window.partitionBy(band)) — bit-identical to the global
       row_number, so every downstream decile/threshold hash is
       unchanged.

    Equal-width bands can skew, but skew only costs balance, never
    correctness — and the oracle replays the GLOBAL row_number, so the
    3-SF hash gate is itself the equivalence proof.

    r14 (guide §5): ``held`` — the full NB fit+score chain — feeds the
    min/max aggregate AND the banding select, which meet at a broadcast
    crossJoin where runtime exchange reuse does not fire (the e2e
    ReusedExchange=0 measurement): unshared, the classifier trained and
    scored TWICE per curve/threshold. Lazily persisted (_persist_share,
    released at the next top-level key build)."""
    from data_transform_spark.pipeline.e2e import _persist_share

    held = _persist_share(held, eager=True)
    mm = held.agg(F.max("logit_u").alias("hi"), F.min("logit_u").alias("lo"))
    keyed = held.crossJoin(F.broadcast(mm)).withColumn(
        "bkt",
        F.floor(
            ((F.col("hi") - F.col("logit_u")) * NB_RANK_BUCKETS)
            / (F.col("hi") - F.col("lo") + 1)
        ).cast("long"),
    )
    counts = keyed.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bkt", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    w_in = Window.partitionBy("bkt").orderBy(F.col("logit_u").desc(), "doc_id")
    return keyed.join(F.broadcast(offsets), "bkt").withColumn(
        "rn", (F.col("off") + F.row_number().over(w_in)).cast("long")
    )


def _nb_threshold(scored):
    """The fastText-recipe step after calibration: pick the logit CUTOFF
    from the held-out PR curve — the deepest decile bucket whose
    cumulative precision (rounded to 6 dp, both engines) still clears
    NB_GATE_PRECISION; the threshold is the minimum logit inside that
    prefix, so gating at it reproduces exactly that keep set. Falls back
    to the top decile if no bucket qualifies. Returns a 1-row (thr_u)
    frame in integer micronats — exact to compare, broadcast-sized.

    Ranks come from the two-phase _held_ranked (r13 VERDICT #3): same
    values as the old global row_number — the held-out md5 split is
    ~half the corpus, so the retired 'eval-set-bounded' single-partition
    window did not actually bound anything."""
    from data_transform_spark.pipeline.e2e import _persist_share

    # same sharing note as quality_pr_curve: ranked meets its own 1-row
    # count at a broadcast crossJoin, so unshared it would run the band
    # window (and everything under it) twice.
    ranked = _persist_share(
        _held_ranked(scored.filter(~F.col("is_train"))).select(
            "label", "logit_u", "rn"
        ),
        eager=True,
    )
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    b = ranked.crossJoin(F.broadcast(n)).select(
        (F.floor((F.col("rn") - 1) * 10 / F.col("n")) + 1).alias("bucket"),
        "label",
        "logit_u",
    )
    pb = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).alias("n_pos"),
        F.min("logit_u").alias("min_logit"),
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = pb.select(
        "bucket",
        F.round(
            F.sum("n_pos").over(wc) * F.lit(1.0) / F.sum("n_docs").over(wc), 6
        ).alias("prec"),
        F.min("min_logit").over(wc).alias("cum_min"),
    )
    # deepest qualifying prefix: cum_min is non-increasing in bucket, so
    # min over qualifying rows IS the largest qualifying bucket's cutoff
    return cum.agg(
        F.coalesce(
            F.min(F.when(F.col("prec") >= NB_GATE_PRECISION, F.col("cum_min"))),
            F.min(F.when(F.col("bucket") == 1, F.col("cum_min"))),
        ).alias("thr_u")
    )


def _nb_scored(d):
    """Score EVERY doc of a (doc_id, toks) frame with the NB fit on its
    own md5-train split (quality_nb's body)."""
    lab, tok, w, prior = _nb_fit(d)
    score = (
        tok.join(F.broadcast(w), "tok", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("wu", F.lit(0))).cast("long").alias("su"))
    )
    logit = F.col("su") + F.col("pu")
    return (
        lab.join(score, "doc_id")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "is_train",
            "label",
            logit.cast("long").alias("logit_u"),
            (logit >= 0).alias("pred"),
            ((logit >= 0) == F.col("label")).alias("correct"),
        )
    )


@register(
    "quality_pr_curve",
    oracle=f"""
    WITH {_QNB_CTE_SQL},
    held AS (
        SELECT doc_id, label, logit_u,
               row_number() OVER (ORDER BY logit_u DESC, doc_id) AS rn
        FROM scored WHERE NOT is_train
    ),
    n AS (
        SELECT count(*) AS n,
               sum(CASE WHEN label THEN 1 ELSE 0 END) AS npos
        FROM held
    ),
    b AS (SELECT ((rn - 1) * 10) // n + 1 AS bucket, label FROM held, n),
    pb AS (
        SELECT bucket, count(*) AS n_docs,
               sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos
        FROM b GROUP BY bucket
    ),
    cum AS (
        SELECT bucket, n_docs,
               sum(n_docs) OVER (ORDER BY bucket) AS cum_docs,
               sum(n_pos) OVER (ORDER BY bucket) AS cum_pos
        FROM pb
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(cum_docs AS BIGINT) AS cum_docs,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           ROUND(cum_pos * 1.0 / cum_docs, 6) AS precision_at,
           ROUND(cum_pos * 1.0 / n.npos, 6) AS recall_at
    FROM cum, n
    """,
)
def quality_pr_curve(spark, sf_dir):
    """Classifier calibration table (the step after quality_nb in the
    fastText recipe: you don't ship a classifier, you ship a THRESHOLD):
    rank the held-out docs by fitted logit, cut at each decile, and report
    cumulative precision/recall against the weak label — the table a
    pipeline owner reads to pick the keep-rate/quality trade-off.

    Integer-exact: ranks, bucket ids ((rn-1)*10/n floor — no ntile
    edge-semantics dependence), cumulative counts; the only floats are
    the two final rounded divisions. Evaluation runs on the HELD-OUT
    md5-split (never the training half — the split quality_nb already
    enforces). Scale note: the exact rank is computed TWO-PHASE
    (_held_ranked — logit bands + per-band offsets + partitioned
    row_number; no single-partition window over rows), so the curve
    scales to a corpus-sized eval set; with an approximate curve
    acceptable you could swap it for approx_percentile thresholds
    (agg_approx_percentile's machinery), but nothing forces that
    trade any more."""
    scored = quality_nb(spark, sf_dir).filter(~F.col("is_train"))
    # Two-phase exact rank (r13 VERDICT #3, replacing the old INTENTIONAL
    # single-partition window): the held-out md5 split is ~half the
    # corpus, so the rank must scale like any corpus window — logit bands
    # from a broadcast min/max, per-band offsets from a ≤256-row count
    # table, row_number per band. Values are bit-identical to the global
    # rank (the DuckDB oracle still computes row_number() OVER the full
    # ordering — a hash PASS is the equivalence proof). Plan-pinned:
    # tests assert the only SinglePartition window input is the band
    # count table, and the held-out filter is still pushed to the scan.
    from data_transform_spark.pipeline.e2e import _persist_share

    # ranked feeds the 1-row count aggregate and the bucket select
    # across a broadcast crossJoin (no runtime exchange reuse there —
    # the _held_ranked rationale); persisting it keeps the band
    # window single-run per action.
    ranked = _persist_share(_held_ranked(scored).select("label", "rn"), eager=True)
    n = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).alias("npos"),
    )
    b = ranked.crossJoin(F.broadcast(n)).select(
        (F.floor((F.col("rn") - 1) * 10 / F.col("n")) + 1).alias("bucket"),
        "label",
        "npos",
    )
    pb = b.groupBy("bucket", "npos").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).alias("n_pos"),
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return pb.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.sum("n_docs").over(wc).cast("long").alias("cum_docs"),
        F.sum("n_pos").over(wc).cast("long").alias("cum_pos"),
        F.round(
            F.sum("n_pos").over(wc) * F.lit(1.0) / F.sum("n_docs").over(wc), 6
        ).alias("precision_at"),
        F.round(
            F.sum("n_pos").over(wc) * F.lit(1.0) / F.col("npos"), 6
        ).alias("recall_at"),
    )


# --- DSIR: hashed-ngram importance weighting (Xie et al., NeurIPS'23) ----

DSIR_BUCKETS = 1024  # hashed unigram feature space


@register(
    "quality_dsir",
    oracle=f"""
    WITH lab AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(list_filter(string_split(text, ' '),
                               x -> x IN ({_QNB_POS_SQL})))
             > len(list_filter(string_split(text, ' '),
                               x -> x IN ({_QNB_NEG_SQL}))) AS is_target
        FROM documents
    ),
    tok AS (
        SELECT doc_id, is_target,
               CAST(('0x' || substring(md5(tok), 1, 3)) AS BIGINT)
                   % {DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, is_target, unnest(toks) AS tok FROM lab)
    ),
    raw AS (
        SELECT b, CAST(count(*) AS BIGINT) AS cr FROM tok GROUP BY b
    ),
    tgt AS (
        SELECT b, CAST(count(*) AS BIGINT) AS ct FROM tok
        WHERE is_target GROUP BY b
    ),
    tot AS (
        SELECT CAST(sum(cr) AS BIGINT) AS nr,
               CAST((SELECT sum(ct) FROM tgt) AS BIGINT) AS nt
        FROM raw
    ),
    w AS (
        SELECT raw.b,
               CAST(round((ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE))
                           - ln(CAST(nt + {DSIR_BUCKETS} AS DOUBLE))
                           - ln(CAST(raw.cr + 1 AS DOUBLE))
                           + ln(CAST(nr + {DSIR_BUCKETS} AS DOUBLE)))
                          * 1000000, 0) AS BIGINT) AS wu
        FROM raw LEFT JOIN tgt USING (b), tot
    ),
    scored AS (
        SELECT t.doc_id, any_value(t.is_target) AS is_target,
               CAST(sum(w.wu) AS BIGINT) AS score_u
        FROM tok t JOIN w USING (b)
        GROUP BY t.doc_id
    )
    SELECT doc_id, is_target, score_u, score_u >= 0 AS kept
    FROM scored
    """,
)
def quality_dsir(spark, sf_dir):
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    NeurIPS'23) — the hashed-feature importance weighting used to select
    pretraining data that looks like a target domain, fit IN-PLAN: tokens
    hash into {DSIR_BUCKETS} buckets (first 3 hex chars of md5, both
    engines); bucket log-probabilities are fit with Laplace smoothing on
    the TARGET exemplar set and the RAW corpus; each doc's importance is
    its tokens' summed log-likelihood ratio. Weights are quantized to
    INTEGER MICRONATS at derivation (the quality_nb discipline), so
    scores and the keep decision (score_u >= 0: more target-like than
    raw) are exact integer arithmetic in any aggregation order.

    Target domain: the keyword weak-label exemplars (quality-marker words
    outnumber junk markers — the quality_nb label), which is a REAL
    distributional difference in this fixture; a source-keyed target
    (e.g. one src as the "wiki" exemplar) degenerates here because every
    source draws from the same multinomial, so smoothing tilt would
    reject everything — found while validating the keep rate.

    Scale shape: one token explode -> bucket-keyed count (the only
    corpus shuffle, {DSIR_BUCKETS} groups); the weight table is
    BUCKETS-sized and broadcasts; scoring is one doc-keyed sum. The keep
    rule is row-local — no global rank, so after the fit the selection
    is a map-only streaming pass, exactly how DSIR covers 100 TB."""
    lab = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        (
            F.size(F.filter(F.split("text", " "), lambda x: x.isin(*QNB_POS)))
            > F.size(F.filter(F.split("text", " "), lambda x: x.isin(*QNB_NEG)))
        ).alias("is_target"),
    )
    tok, w = _dsir_fit(lab)
    scored = (
        tok.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("is_target").alias("is_target"),
            F.sum("wu").cast("long").alias("score_u"),
        )
    )
    return scored.select(
        "doc_id", "is_target", "score_u", (F.col("score_u") >= 0).alias("kept")
    )


def _dsir_bucket(col):
    """The DSIR hashed-unigram bucket: first 3 md5 hex chars % buckets —
    identical expression on both engines."""
    return (
        F.conv(F.substring(F.md5(col), 1, 3), 16, 10).cast("long")
        % DSIR_BUCKETS
    )


def _dsir_fit(lab):
    """Fit DSIR on a (doc_id, toks, is_target) frame: returns (tok, w) —
    the bucketed token explode and the BUCKETS-sized integer-micronat
    weight frame (b, wu). Split from quality_dsir so pipeline_e2e_llm_v4
    can reuse the fitted weights as a committee member without the fit
    code drifting (the _nb_fit precedent)."""
    tok = lab.select(
        "doc_id", "is_target", F.explode("toks").alias("tok")
    ).select("doc_id", "is_target", _dsir_bucket("tok").alias("b"))
    # ONE pass over the exploded/bucketed tokens (r15, guide §2.4): the
    # raw and target counts come out of a single bucket-keyed aggregate.
    # The old two-aggregate shape (raw, tgt) plus their two 1-row totals
    # re-ran the explode + per-token md5 subtree once per consumer —
    # aggregates meeting at broadcast crossJoins get no exchange reuse
    # (the e2e ReusedExchange=0 measurement) — so the fit cost the corpus
    # scan ~4x. ``ct`` is 0 where the old LEFT-joined tgt row was NULL;
    # the weight expression already coalesced NULL to 0, so wu is
    # numerically identical bucket by bucket, and nt = SUM(ct) is
    # unchanged because the missing-bucket rows contribute zero.
    cnt = tok.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("cr"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("long")
        .alias("ct"),
    )
    # share point: cnt feeds the totals aggregate AND the weight
    # projection, which meet at a broadcast crossJoin — BUCKETS-sized
    # (<= 1024 rows), lineage = the whole corpus explode, so the eager
    # checkpoint rule applies (the _nb_fit cls precedent).
    from data_transform_spark.pipeline.e2e import _persist_share

    cnt = _persist_share(cnt, eager=True)
    tot = cnt.agg(F.sum("cr").cast("long").alias("nr")).crossJoin(
        F.broadcast(cnt.agg(F.sum("ct").cast("long").alias("nt")))
    )
    wu = F.round(
        (
            F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double"))
            - F.log((F.col("nt") + DSIR_BUCKETS).cast("double"))
            - F.log((F.col("cr") + 1).cast("double"))
            + F.log((F.col("nr") + DSIR_BUCKETS).cast("double"))
        )
        * 1000000,
        0,
    ).cast("long")
    w = cnt.crossJoin(F.broadcast(tot)).select("b", wu.alias("wu"))
    return tok, w


# Gopher quality-filter thresholds (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", table A1).
# The dup-unigram bound is ADAPTED to this fixture's tiny vocabulary (the
# paper bounds duplicate n-gram CHARACTER fractions; word-salad text from a
# ~40-word vocab has structurally high unigram repetition, so the faithful
# 0.3-ish bounds would reject everything — threshold chosen at the observed
# median so the rule splits the corpus).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_DUP_UNIGRAM = 0.55  # adapted (see above)
GOPHER_MAX_TOP_BIGRAM = 0.18  # paper's top-2-gram fraction bound

_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)


@register(
    "quality_gopher",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    ),
    bg AS (
        SELECT doc_id, toks[s] || ' ' || toks[s + 1] AS g
        FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(s)
    ),
    topbg AS (
        SELECT doc_id, max(c) AS top_cnt
        FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g)
        GROUP BY doc_id
    ),
    m AS (
        SELECT t.doc_id,
               len(toks) AS n_words,
               ROUND((length(text) - len(toks) + 1) * 1.0 / len(toks), 6)
                   AS mean_word_len,
               len(list_filter(toks, x -> x IN ({_GOPHER_STOP_SQL})))
                   AS stop_hits,
               ROUND((len(toks) - len(list_distinct(toks))) * 1.0
                     / len(toks), 6) AS dup_unigram_frac,
               CASE WHEN len(toks) >= 2
                    THEN ROUND(COALESCE(topbg.top_cnt, 0) * 1.0
                               / (len(toks) - 1), 6)
                    ELSE 1.0 END AS top_bigram_frac
        FROM t LEFT JOIN topbg USING (doc_id)
    )
    SELECT doc_id, n_words, mean_word_len, stop_hits, dup_unigram_frac,
           top_bigram_frac,
           n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
               AS r_word_count,
           mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
               AS r_mean_word_len,
           stop_hits >= {GOPHER_MIN_STOP_HITS} AS r_stopwords,
           dup_unigram_frac <= {GOPHER_MAX_DUP_UNIGRAM} AS r_dup_unigram,
           top_bigram_frac <= {GOPHER_MAX_TOP_BIGRAM} AS r_top_bigram,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
           AND (mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
           AND stop_hits >= {GOPHER_MIN_STOP_HITS}
           AND dup_unigram_frac <= {GOPHER_MAX_DUP_UNIGRAM}
           AND top_bigram_frac <= {GOPHER_MAX_TOP_BIGRAM} AS kept
    FROM m
    """,
)
def quality_gopher(spark, sf_dir):
    """Gopher rule-based quality filter (Rae et al. 2021, appendix A1):
    the industry-standard heuristic gate a pretraining pipeline runs
    BEFORE any learned scorer — word-count bounds, mean-word-length
    bounds, minimum stopword hits, duplicate-unigram bound (threshold
    adapted to this fixture, see GOPHER_MAX_DUP_UNIGRAM), and the paper's
    top-bigram-fraction bound (0.18). Emits every metric, every per-rule
    verdict, and the conjunction — the audit trail a curation run keeps
    so rejected docs are attributable to a rule, not a black box.

    Scale shape: MAP-ONLY — zero shuffles. Every metric is doc-local
    Column arithmetic; even the top-bigram count avoids an explode +
    two keyed aggregations by sorting the doc's bigram array and taking
    the max run length with one F.aggregate fold (equal bigrams are
    adjacent after the sort), so the whole filter streams through a
    single scan at any corpus size. Per-doc cost is O(L log L) in doc
    length from the array_sort. The oracle computes the same count via
    unnest+GROUP BY — engine-idiomatic plans, identical results.

    Float discipline: all three fractional metrics are single divisions
    of exactly-representable integers, rounded to 6 dp identically in
    both engines before any threshold comparison."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks)
    mwl = F.round((F.length("text") - n_words + 1) * 1.0 / n_words, 6)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*GOPHER_STOPWORDS)))
    dup_frac = F.round(
        (n_words - F.size(F.array_distinct(toks))) * 1.0 / n_words, 6
    )
    # max run length over the SORTED bigram array: one doc-local fold.
    bigrams = F.array_sort(
        F.when(
            n_words >= 2,
            F.transform(
                F.sequence(F.lit(1), n_words - 1),
                lambda s: F.concat(
                    F.element_at(toks, s), F.lit(" "), F.element_at(toks, s + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    fold = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_frac = F.when(
        n_words >= 2, F.round(fold.best * 1.0 / (n_words - 1), 6)
    ).otherwise(F.lit(1.0))
    m = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        stop_hits.cast("long").alias("stop_hits"),
        dup_frac.alias("dup_unigram_frac"),
        top_frac.alias("top_bigram_frac"),
    )
    r_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_mwl = F.col("mean_word_len").between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
    r_stop = F.col("stop_hits") >= GOPHER_MIN_STOP_HITS
    r_dup = F.col("dup_unigram_frac") <= GOPHER_MAX_DUP_UNIGRAM
    r_bg = F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM
    return m.select(
        "*",
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_stop.alias("r_stopwords"),
        r_dup.alias("r_dup_unigram"),
        r_bg.alias("r_top_bigram"),
        (r_wc & r_mwl & r_stop & r_dup & r_bg).alias("kept"),
    )


# Gopher repetition battery (Rae et al. 2021, table A1): character
# fractions covered by the MOST-FREQUENT word n-gram (n = 2, 3, 4; paper
# bounds 0.20 / 0.18 / 0.16 — used verbatim) and by ALL DUPLICATED word
# n-grams. The paper runs the dup battery at n = 5..10; on this fixture
# (10-99-word docs drawn from a ~40-word vocabulary) repeated n-grams of
# order >= 4 are structurally absent (measured at sf0.01: 2/500 docs have
# any dup-4-gram, 0/500 any dup-5-gram), so the INFORMATIVE scales shift
# down: the dup battery here is n = 2 (349/500 docs non-zero) and n = 3
# (reported, un-gated), with the n=2 bound set just above the observed
# median (0.1137) — the same adapt-and-document posture as
# GOPHER_MAX_DUP_UNIGRAM above. "Characters covered" is the published
# non-overlap-corrected convention: occurrences x n-gram character
# length (separators excluded), over total token characters.
REP_TOP_MAX_MICRO = {2: 200_000, 3: 180_000, 4: 160_000}
REP_DUP2_MAX_MICRO = 180_000


def _rep_cov(toks, n_words, n: int):
    """(top, dup) char-coverage struct for word n-grams of order ``n`` —
    doc-local: sort the doc's n-gram array, then one F.aggregate fold
    over it (equal grams are adjacent after the sort, so a single pass
    closes each run: top = max over runs of run_len x gram_chars, dup =
    the same summed over runs with run_len >= 2). gram_chars excludes
    the n-1 separators the gram string carries for identity."""
    grams = F.array_sort(
        F.when(
            n_words >= n,
            F.transform(
                F.sequence(F.lit(1), n_words - n + 1),
                lambda s: F.concat_ws(" ", F.slice(toks, s, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    zero = F.lit(0).cast("long")

    def close(acc):  # chars covered by the run that just ended
        return acc.run * (F.length(acc.prev) - (n - 1)).cast("long")

    return F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            zero.alias("run"),
            zero.alias("top"),
            zero.alias("dup"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(x == acc.prev, acc.top)
            .otherwise(F.greatest(acc.top, close(acc)))
            .alias("top"),
            F.when(x == acc.prev, acc.dup)
            .otherwise(acc.dup + F.when(acc.run >= 2, close(acc)).otherwise(zero))
            .alias("dup"),
        ),
        lambda acc: F.struct(
            F.greatest(acc.top, close(acc)).alias("top"),
            (acc.dup + F.when(acc.run >= 2, close(acc)).otherwise(zero)).alias("dup"),
        ),
    )


@register(
    "quality_repetition",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS tl
        FROM documents
    ),
    g AS (
        SELECT doc_id, n.n AS n,
               array_to_string(list_slice(toks, i.i, i.i + n.n - 1), ' ')
                   AS gram
        FROM t,
             unnest(generate_series(2, 4)) AS n(n),
             unnest(generate_series(1, len(toks) - n.n + 1)) AS i(i)
    ),
    c AS (
        SELECT doc_id, n, gram, count(*) AS c,
               length(gram) - (n - 1) AS gchars
        FROM g GROUP BY ALL
    ),
    p AS (
        SELECT doc_id, n,
               max(c * gchars) AS top_cov,
               sum(CASE WHEN c >= 2 THEN c * gchars ELSE 0 END) AS dup_cov
        FROM c GROUP BY doc_id, n
    ),
    piv AS (
        SELECT doc_id,
               max(CASE WHEN n = 2 THEN top_cov END) AS top2,
               max(CASE WHEN n = 3 THEN top_cov END) AS top3,
               max(CASE WHEN n = 4 THEN top_cov END) AS top4,
               max(CASE WHEN n = 2 THEN dup_cov END) AS dup2,
               max(CASE WHEN n = 3 THEN dup_cov END) AS dup3
        FROM p GROUP BY doc_id
    ),
    m AS (
        SELECT t.doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(tl - (len(toks) - 1) AS BIGINT) AS doc_chars,
               CAST(COALESCE(top2, 0) AS BIGINT) AS top2,
               CAST(COALESCE(top3, 0) AS BIGINT) AS top3,
               CAST(COALESCE(top4, 0) AS BIGINT) AS top4,
               CAST(COALESCE(dup2, 0) AS BIGINT) AS dup2,
               CAST(COALESCE(dup3, 0) AS BIGINT) AS dup3
        FROM t LEFT JOIN piv USING (doc_id)
    )
    SELECT doc_id, n_words, doc_chars,
           top2 * 1000000 // doc_chars AS top2_micro,
           top3 * 1000000 // doc_chars AS top3_micro,
           top4 * 1000000 // doc_chars AS top4_micro,
           dup2 * 1000000 // doc_chars AS dup2_micro,
           dup3 * 1000000 // doc_chars AS dup3_micro,
           top2 * 1000000 // doc_chars <= {REP_TOP_MAX_MICRO[2]} AS r_top2,
           top3 * 1000000 // doc_chars <= {REP_TOP_MAX_MICRO[3]} AS r_top3,
           top4 * 1000000 // doc_chars <= {REP_TOP_MAX_MICRO[4]} AS r_top4,
           dup2 * 1000000 // doc_chars <= {REP_DUP2_MAX_MICRO} AS r_dup2,
           (top2 * 1000000 // doc_chars <= {REP_TOP_MAX_MICRO[2]})
           AND (top3 * 1000000 // doc_chars <= {REP_TOP_MAX_MICRO[3]})
           AND (top4 * 1000000 // doc_chars <= {REP_TOP_MAX_MICRO[4]})
           AND (dup2 * 1000000 // doc_chars <= {REP_DUP2_MAX_MICRO}) AS kept
    FROM m
    """,
)
def quality_repetition(spark, sf_dir):
    """Gopher repetition filter (Rae et al. 2021, appendix table A1) —
    the n-gram half of the rule battery quality_gopher starts: the
    fraction of characters covered by the single most frequent word
    n-gram (n = 2, 3, 4; paper thresholds 0.20 / 0.18 / 0.16 verbatim)
    and by all duplicated n-grams (paper scale n = 5..10, shifted to
    n = 2..3 on this fixture — see REP_TOP_MAX_MICRO's comment for the
    measured justification). Emits every metric in integer micro-units,
    each rule verdict, and the conjunction — the per-rule audit trail.

    Scale shape: MAP-ONLY, zero shuffles, like quality_gopher. Each
    order's statistic folds over the doc's SORTED n-gram array in one
    pass (equal grams are adjacent, so run boundaries close maximal
    coverage and duplicate coverage simultaneously); per-doc cost is
    O(3 L log L). The oracle computes identical integers via
    unnest + GROUP BY — engine-idiomatic plans, identical results. At
    100 TB this streams through a single scan; nothing leaves the doc.

    Float discipline: none — coverage is count x characters (exact
    integers), fractions are integer micro-units via BIGINT floor
    division (Spark DIV == DuckDB // on non-negatives), thresholds
    compare in integer space."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks)
    covs = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        (F.length("text") - (n_words - 1)).cast("long").alias("doc_chars"),
        *[_rep_cov(toks, n_words, n).alias(f"c{n}") for n in (2, 3, 4)],
    )
    m = covs.select(
        "doc_id",
        "n_words",
        "doc_chars",
        F.expr("c2.top * 1000000 DIV doc_chars").alias("top2_micro"),
        F.expr("c3.top * 1000000 DIV doc_chars").alias("top3_micro"),
        F.expr("c4.top * 1000000 DIV doc_chars").alias("top4_micro"),
        F.expr("c2.dup * 1000000 DIV doc_chars").alias("dup2_micro"),
        F.expr("c3.dup * 1000000 DIV doc_chars").alias("dup3_micro"),
    )
    r2 = F.col("top2_micro") <= REP_TOP_MAX_MICRO[2]
    r3 = F.col("top3_micro") <= REP_TOP_MAX_MICRO[3]
    r4 = F.col("top4_micro") <= REP_TOP_MAX_MICRO[4]
    rd = F.col("dup2_micro") <= REP_DUP2_MAX_MICRO
    return m.select(
        "*",
        r2.alias("r_top2"),
        r3.alias("r_top3"),
        r4.alias("r_top4"),
        rd.alias("r_dup2"),
        (r2 & r3 & r4 & rd).alias("kept"),
    )


@register(
    "mix_epochs_upsample",
    oracle=f"""
    WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mx AS (SELECT max(n) AS nmax FROM cnt),
    rates AS (
        SELECT lang,
               ROUND(pow(n * 1.0 / nmax, {TEMP_ALPHA} - 1), 6) AS epochs
        FROM cnt, mx
    ),
    planned AS (
        SELECT d.doc_id, d.lang, r.epochs,
               CAST(floor(r.epochs) AS BIGINT)
               + CASE WHEN {_U01_SQL.format(salt=':ep')}
                           < r.epochs - floor(r.epochs)
                      THEN 1 ELSE 0 END AS n_copies
        FROM documents d JOIN rates r USING (lang)
    )
    SELECT doc_id, lang, epochs, CAST(u.copy AS BIGINT) AS copy
    FROM planned, unnest(generate_series(1, n_copies)) AS u(copy)
    """,
)
def mix_epochs_upsample(spark, sf_dir):
    """Fractional-epoch domain UPSAMPLING — the replication complement of
    sample_temperature's downsample-only rates (its docstring defers
    exactly this op): target epochs e_d ∝ p_d^(α-1) are normalized so the
    HEAD domain trains one epoch and every rarer domain trains
    e_d = (n_d/n_max)^(α-1) ≥ 1 epochs; each doc emits floor(e_d) full
    copies plus one more with probability frac(e_d), decided by the same
    content-stable u(0,1) as every sampling stage (distinct salt ':ep',
    so stages compose). The output's (doc_id, copy) rows are what a
    training-data packer consumes for multi-epoch mixes ('books ×2.3,
    web ×1' recipes). Domain = LANG (the mT5/XLM-R low-resource-language
    use case): this fixture's source column is perfectly uniform (25
    docs/src at every SF — rates would all be 1.0 and the op would
    degenerate to a copy), while lang is skewed (en ≈ 40%), so en trains
    1 epoch and the tail languages ~1.3-1.4 — real fractional
    replication, property-tested.

    Plan: one tiny domain-count shuffle, the max as a broadcast 1-row
    aggregate riding in-plan, a broadcast rate join, then MAP-ONLY
    replication via explode(sequence(1, n_copies)) — no shuffle touches
    the replicated volume, so at 100 TB the blow-up streams straight to
    the sink. Same pow()-rounding discipline (and residual boundary risk)
    as sample_temperature: epochs round to 6 dp in both engines before
    floor/frac decisions."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mx = cnt.agg(F.max("n").alias("nmax"))
    rates = cnt.crossJoin(F.broadcast(mx)).select(
        "lang",
        F.round(
            F.pow(F.col("n") / F.col("nmax"), F.lit(TEMP_ALPHA - 1)), 6
        ).alias("epochs"),
    )
    n_copies = (
        F.floor("epochs")
        + F.when(
            _u01(F.col("doc_id"), ":ep") < F.col("epochs") - F.floor("epochs"),
            1,
        ).otherwise(0)
    ).cast("long")
    return (
        d.join(F.broadcast(rates), "lang")
        .select("doc_id", "lang", "epochs", n_copies.alias("n_copies"))
        .select(
            "doc_id",
            "lang",
            "epochs",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
                "copy"
            ),
        )
    )


def _ensemble_oracle() -> str:
    """Composed at call-time from the three member oracles (each wrapped
    as a parenthesized WITH-subquery, which DuckDB scopes cleanly)."""
    from data_transform_spark.registry import ORACLES

    return f"""
    WITH g AS (SELECT doc_id, kept AS gopher_keep
               FROM ({ORACLES["quality_gopher"]}) _g),
    nb AS (SELECT doc_id, pred AS nb_keep
           FROM ({ORACLES["quality_nb"]}) _nb),
    ds AS (SELECT doc_id, kept AS dsir_keep
           FROM ({ORACLES["quality_dsir"]}) _ds)
    SELECT g.doc_id, g.gopher_keep, nb.nb_keep, ds.dsir_keep,
           CAST((CASE WHEN g.gopher_keep THEN 1 ELSE 0 END
                 + CASE WHEN nb.nb_keep THEN 1 ELSE 0 END
                 + CASE WHEN ds.dsir_keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_votes,
           (CASE WHEN g.gopher_keep THEN 1 ELSE 0 END
            + CASE WHEN nb.nb_keep THEN 1 ELSE 0 END
            + CASE WHEN ds.dsir_keep THEN 1 ELSE 0 END) >= 2
               AS keep_majority,
           g.gopher_keep AND nb.nb_keep AND ds.dsir_keep AS keep_strict
    FROM g JOIN nb USING (doc_id) JOIN ds USING (doc_id)
    """


@register("quality_ensemble", oracle=_ensemble_oracle())
def quality_ensemble(spark, sf_dir):
    """The curation committee: three INDEPENDENT quality signals — the
    Gopher rule gate (hand-built heuristics), the trained NB classifier
    (supervised weak labels) and DSIR importance weighting (target-
    distribution match) — joined per doc with the vote count, the
    majority verdict, and the strict conjunction. Production pipelines
    gate on agreement precisely because the three signal FAMILIES fail
    differently: rules miss fluent junk, classifiers inherit label
    noise, importance weights chase surface statistics; requiring 2-of-3
    suppresses each family's false positives. Each member key stays
    independently auditable (this op adds no new scoring logic — reuse,
    not re-derivation; the joins are three doc_id-keyed hash joins over
    the member outputs)."""
    from data_transform_spark.pipeline.e2e import _fill_concurrently

    g = quality_gopher(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("gopher_keep")
    )
    # the NB and DSIR members each run an eager fit fill at construction
    # (cls / bucket counts) — independent, so build them on concurrent
    # driver threads (r15, guide §2.6); gopher is map-only and stays lazy
    nb, ds = _fill_concurrently(
        lambda: quality_nb(spark, sf_dir).select(
            "doc_id", F.col("pred").alias("nb_keep")
        ),
        lambda: quality_dsir(spark, sf_dir).select(
            "doc_id", F.col("kept").alias("dsir_keep")
        ),
    )
    votes = (
        F.when(F.col("gopher_keep"), 1).otherwise(0)
        + F.when(F.col("nb_keep"), 1).otherwise(0)
        + F.when(F.col("dsir_keep"), 1).otherwise(0)
    )
    return (
        g.join(nb, "doc_id")
        .join(ds, "doc_id")
        .select(
            "doc_id",
            "gopher_keep",
            "nb_keep",
            "dsir_keep",
            votes.cast("long").alias("n_votes"),
            (votes >= 2).alias("keep_majority"),
            (F.col("gopher_keep") & F.col("nb_keep") & F.col("dsir_keep")).alias(
                "keep_strict"
            ),
        )
    )



# --- CCNet-style LM-perplexity quality filter (round 13) ------------------
#
# The quality family's missing staple: CCNet (Wenzek et al. 2020,
# arXiv:1911.00359) scores every document with a language model trained
# on a clean reference corpus and filters on perplexity — the recipe
# behind most public CC-derived pretraining sets. Deterministic repo
# form: the reference is the corpus' en subset (the head language), the
# model is a word-bigram LM with add-one smoothing over the reference
# vocabulary (+1 unseen bucket), and every transition cost quantizes to
# INTEGER MICRONATS the moment it is derived —
# floor((ln(ctx + V) − ln(big + 1))·1e6 + 0.5), the bit-verified
# libm-on-integers idiom — so per-doc sums and the half-up per-transition
# mean are exact integer arithmetic in any aggregation order.
LM_REF_LANG = "en"


@register(
    "quality_lm_ppl",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    ref AS (SELECT t FROM d WHERE lang = '{LM_REF_LANG}'),
    refpairs AS (
        SELECT t[i] AS a, t[i + 1] AS b
        FROM ref, unnest(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
    ),
    big AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
            FROM refpairs GROUP BY 1, 2),
    ctx AS (SELECT a, CAST(count(*) AS BIGINT) AS ca
            FROM refpairs GROUP BY 1),
    voc AS (SELECT DISTINCT unnest(t) AS w FROM ref),
    vs AS (SELECT CAST(count(*) + 1 AS BIGINT) AS V FROM voc),
    pairs AS (
        SELECT doc_id, t[i] AS a, t[i + 1] AS b
        FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
    ),
    costs AS (
        SELECT p.doc_id,
               CAST(floor((ln(COALESCE(c.ca, 0) + s.V)
                           - ln(COALESCE(g.cab, 0) + 1)) * 1000000 + 0.5)
                    AS BIGINT) AS cost_u
        FROM pairs p
        LEFT JOIN big g ON g.a = p.a AND g.b = p.b
        LEFT JOIN ctx c ON c.a = p.a, vs s
    ),
    perdoc AS (
        SELECT doc_id, CAST(sum(cost_u) AS BIGINT) AS sum_u,
               CAST(count(*) AS BIGINT) AS n_trans
        FROM costs GROUP BY doc_id
    ),
    oov AS (
        SELECT tk.doc_id,
               CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov
        FROM (SELECT doc_id, unnest(t) AS w FROM d) tk
        LEFT JOIN voc v ON v.w = tk.w
        GROUP BY tk.doc_id
    )
    SELECT d.doc_id, d.lang, CAST(len(d.t) AS BIGINT) AS n_tokens,
           COALESCE(o.n_oov, 0) AS n_oov,
           COALESCE(p.n_trans, 0) AS n_trans,
           CASE WHEN COALESCE(p.n_trans, 0) = 0 THEN 0
                ELSE CAST(floor((2 * p.sum_u + p.n_trans)
                                / (2.0 * p.n_trans)) AS BIGINT)
           END AS xent_u
    FROM d
    LEFT JOIN perdoc p USING (doc_id)
    LEFT JOIN oov o USING (doc_id)
    """,
)
def quality_lm_ppl(spark, sf_dir):
    """CCNet-style LM-perplexity filter (Wenzek et al. 2020): a word-
    bigram LM with add-one smoothing is trained in-plan on the reference
    subset (lang = LM_REF_LANG, the corpus head language) and every
    document — all languages — is scored with its mean per-transition
    cross-entropy in integer micronats (xent_u; low = reference-like, the
    CCNet keep signal). Per doc: token count, OOV-vs-reference count,
    transition count, xent_u. Transition cost = micronat-quantized
    −ln((c(a,b)+1)/(c(a)+V)) with c(a) the reference CONTEXT count and
    V = |reference vocab|+1; unseen context ⇒ ln(V) — the smoothing
    maximum. Docs with <2 tokens score 0 by convention (no transitions;
    n_tokens exposes them).

    Exactness: counts are integers; the only float surface is ln() of
    integer-valued doubles (libm-identical in Spark/DuckDB/python — the
    quality_nb discipline), quantized half-up to micronats at derivation,
    so per-doc sums and the half-up mean are order-free integers.

    Fixture honesty: the synthetic corpus draws every language's words
    from ONE shared pool, so n_oov is 0 for all docs and the en/other
    separation comes only from per-lang bigram frequency differences —
    mean xent_u 3.363M (en) vs 3.444-3.448M (others) at sf0.001, en
    strictly lowest at every SF (pinned). On a real multilingual corpus
    the OOV and bigram signals are both large; the operator's arithmetic
    is what this key certifies.

    Scale: the LM artifacts are vocabulary-sized and cheap to build —
    ONE reference pair explode feeds the bigram table, the context table
    rolls up from the bigram table itself (c(a) = Σ_b c(a,b) — no second
    explode, r13 ADVICE), and the vocab is a second reference-subset
    pass (token distinct); scoring is the corpus pair explode
    joined to those tables — deliberately NO broadcast hints on the
    bigram table (at 100 TB an n-gram table can be many GB; the shuffle
    hash join on the bigram key is the scale-safe plan, and AQE will
    broadcast it when it happens to be small). This is the missing rung
    between the keyword/stat gates (quality_linear/gopher) and the
    trained classifiers (quality_nb/dsir): the standard perplexity
    gate every CC-derived pretraining set ships."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    )
    def _pairs(frame):
        syms = F.col("t")
        idx = F.when(
            F.size(syms) > 1, F.sequence(F.lit(1), F.size(syms) - 1)
        ).otherwise(F.array().cast("array<int>"))
        return frame.select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("a"),
                        F.element_at(syms, i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))

    ref = d.filter(F.col("lang") == LM_REF_LANG)
    refpairs = _pairs(ref)
    big = refpairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cab")
    )
    # c(a) = Σ_b c(a,b) exactly — roll the CONTEXT table up from the
    # bigram table instead of re-exploding the reference pairs (r13
    # ADVICE: the second corpus-sized pair explode was pure waste; this
    # aggregate reads the vocabulary²-bounded bigram frame instead).
    ctx = big.groupBy("a").agg(F.sum("cab").cast("long").alias("ca"))
    voc = ref.select(F.explode("t").alias("w")).distinct()
    vs = voc.agg((F.count(F.lit(1)) + 1).cast("long").alias("V"))

    pairs = _pairs(d)
    costs = (
        pairs.join(big, ["a", "b"], "left")
        .join(ctx, "a", "left")
        .crossJoin(F.broadcast(vs))
        .select(
            "doc_id",
            F.floor(
                (
                    F.log(F.coalesce(F.col("ca"), F.lit(0)) + F.col("V"))
                    - F.log(F.coalesce(F.col("cab"), F.lit(0)) + F.lit(1))
                )
                * 1_000_000
                + 0.5
            )
            .cast("long")
            .alias("cost_u"),
        )
    )
    perdoc = costs.groupBy("doc_id").agg(
        F.sum("cost_u").cast("long").alias("sum_u"),
        F.count(F.lit(1)).cast("long").alias("n_trans"),
    )
    oov = (
        d.select("doc_id", F.explode("t").alias("w"))
        .join(voc.withColumn("in_voc", F.lit(1)), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("in_voc").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov")
        )
    )
    return (
        d.select("doc_id", "lang", F.size("t").cast("long").alias("n_tokens"))
        .join(perdoc, "doc_id", "left")
        .join(oov, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            F.coalesce(F.col("n_trans"), F.lit(0)).alias("n_trans"),
            F.when(F.coalesce(F.col("n_trans"), F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.floor(
                    (2 * F.col("sum_u") + F.col("n_trans"))
                    / (2.0 * F.col("n_trans"))
                )
            )
            .cast("long")
            .alias("xent_u"),
        )
    )
