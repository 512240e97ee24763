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
    WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT sum(n) AS t FROM cnt),
    w AS (SELECT source, ROUND(pow(n * 1.0 / t, {TEMP_ALPHA} - 1), 6) AS wr
          FROM cnt, tot),
    rates AS (SELECT source,
                     ROUND(wr / (SELECT max(wr) FROM w), 6) AS rate
              FROM w)
    SELECT d.doc_id, d.source, r.rate
    FROM documents d JOIN rates r USING (source)
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
    corpus shifts.

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
    cnt = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("t"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(
            F.pow(F.col("n") / F.col("t"), F.lit(TEMP_ALPHA - 1)), 6
        ).alias("wr"),
    )
    mx = w.agg(F.max("wr").alias("mx"))
    rates = w.crossJoin(F.broadcast(mx)).select(
        "source", F.round(F.col("wr") / F.col("mx"), 6).alias("rate")
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(_u01(F.col("doc_id"), ":temp") < F.col("rate"))
        .select("doc_id", "source", "rate")
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
