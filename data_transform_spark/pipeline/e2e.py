"""End-to-end training-data pipeline composition (§2.K capstone).

One DataFrame chaining the library's stages the way a real corpus-prep job
does: exact dedup → language gate → quality gate → TF-IDF → top term per
doc → deterministic shard assignment. Every stage is the same code the
individual keys use; the composition itself is what's verified here.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "pipeline_e2e",
    oracle="""
    WITH deduped AS (
        SELECT doc_id, text, lang
        FROM documents
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    gated AS (
        SELECT doc_id, text, lang
        FROM deduped
        WHERE lang IN ('en', 'de', 'es')
          AND len(string_split(text, ' ')) BETWEEN 20 AND 200
          AND len(list_distinct(string_split(text, ' '))) * 1.0
              / len(string_split(text, ' ')) >= 0.2
    ),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM gated),
    tf AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY doc_id, token),
    dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM gated),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND((tf.cnt * 1.0 / dl.doc_len)
                     * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN dl USING (doc_id) JOIN df USING (token) CROSS JOIN n
    ),
    top_term AS (
        SELECT doc_id, token AS top_token, tfidf
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) = 1
    )
    SELECT g.doc_id, g.lang, t.top_token, t.tfidf,
           CAST(('0x' || substring(md5(CAST(g.doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
    FROM gated g JOIN top_term t USING (doc_id)
    """,
)
def pipeline_e2e(spark, sf_dir):
    """Capstone: dedup → lang/quality gates → TF-IDF top term → shard."""
    d = load_table(spark, sf_dir, "documents")

    # 1. exact dedup, canonical survivor
    w_dedup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        d.withColumn("_rn", F.row_number().over(w_dedup))
        .filter("_rn = 1")
        .select("doc_id", "text", "lang")
    )

    # 2. language + quality gates
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) * 1.0 / n_tok
    gated = deduped.filter(
        F.col("lang").isin("en", "de", "es") & n_tok.between(20, 200) & (ttr >= 0.2)
    )

    # 3. TF-IDF over the gated corpus. n_docs stays IN-PLAN as a broadcast
    # 1-row aggregate (exactly the oracle's CROSS JOIN n): a driver-side
    # .count() here would run the dedup window + gates twice — at 100 TB
    # that is one extra full pass over the corpus for a single scalar.
    n = gated.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = gated.select("doc_id", F.explode(toks).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    tfidf = F.round(
        (F.col("cnt") * 1.0 / F.col("doc_len"))
        * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        6,
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", tfidf.alias("tfidf"))
    )

    # 4. top term per doc (deterministic tie-break on token)
    w_top = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    top = (
        scored.withColumn("_rn", F.row_number().over(w_top))
        .filter("_rn = 1")
        .select("doc_id", F.col("token").alias("top_token"), "tfidf")
    )

    # 5. deterministic shard assignment
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 8
    )
    return gated.join(top, "doc_id").select(
        "doc_id", "lang", "top_token", "tfidf", shard.alias("shard")
    )
