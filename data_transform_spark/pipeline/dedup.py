"""§2.K — deduplication family (SURVEY.md; mandated by BASELINE.json north star).

Four tiers, cheapest first:
  * exact        — md5 content hash, canonical min-id survivor. One shuffle.
  * ngram_jaccard— exact token-set Jaccard via inverted-index self-join.
                   Correct but O(sum_t df(t)^2) pairs: only viable when the
                   per-token document frequency is bounded. The 100 TB path
                   is minhash below.
  * minhash+LSH  — shingle → minhash signature → band-bucket join. Linear in
                   corpus size, tunable recall; THE scale path for near-dup.
  * simhash      — 64-bit weighted fingerprint, hamming<=k via chunk index.

All hashing is seeded/deterministic (xxhash64 / md5), so results are stable
across executors, runs, and machines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register

# ---------------------------------------------------------------- exact


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash, lang, source
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact content dedup: canonical survivor = min doc_id per md5(text)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        d.withColumn("content_hash", F.md5("text"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_hash", "lang", "source")
    )


# ------------------------------------------------------- exact n-gram jaccard


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           p.shared * 1.0 / (sa.n + sb.n - p.shared) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE p.shared * 1.0 / (sa.n + sb.n - p.shared) >= 0.95
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact token-set Jaccard >= 0.95 via inverted-index self-join.

    jaccard = shared / (|A| + |B| - shared) is an exact integer ratio →
    bit-identical double in both engines, so the key is hash-checkable.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t"))
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("shared") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("shared"))
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.95)
    )


# ------------------------------------------------------------ minhash + LSH

N_HASHES = 16  # minhash signature length
N_BANDS = 8  # LSH bands (r = N_HASHES / N_BANDS = 2 rows per band)
SHINGLE_K = 3  # word-shingle width
MINHASH_TAU = 0.5  # keep pairs whose estimated jaccard >= tau


def _shingles(df):
    """doc_id, shingle — word k-grams via a size-bounded higher-order expr."""
    toks = F.split("text", " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - SHINGLE_K, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE_K)))
    return df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(docs):
    """doc_id + sig array: sig[i] = min over shingles of xxhash64(i, shingle).

    Seeded, deterministic, executor-independent. One explode + one groupBy —
    at 100 TB this is a single shuffle keyed by doc_id.
    """
    sh = _shingles(docs)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(N_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(N_HASHES)]).alias("sig")
    )


@register("dedup_near_minhash")  # rows-only: not practically SQL-expressible
def dedup_near_minhash(spark, sf_dir):
    """Near-dup pairs: minhash LSH candidates → signature-agreement filter.

    Band j buckets on xxhash64 of its r signature slots; only same-bucket
    pairs are compared (linear candidate generation). Estimated jaccard =
    fraction of agreeing minhashes >= MINHASH_TAU. Verified by seeded golden
    tests (tests/test_pipeline.py) with planted near-duplicates.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)

    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", j * 2 + k + 1) for k in range(2)]
                        ).alias("bucket"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    est = agree / F.lit(float(N_HASHES))
    return (
        cand.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= MINHASH_TAU)
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_near_survivors")  # rows-only: iterative CC has no SQL twin
def dedup_near_survivors(spark, sf_dir):
    """Collapse near-duplicate clusters to one canonical survivor per cluster.

    Pairs from the MinHash-LSH stage are treated as edges; connected
    components are found by min-label propagation (each node repeatedly
    adopts the smallest doc_id reachable in one hop) — deterministic, and at
    fixture diameter converges in <= 5 rounds (checked: one extra round must
    change nothing). Survivor = min doc_id per component; every other member
    is dropped. The 100 TB shape is the same join loop (alternating-direction
    large-star/small-star keeps rounds logarithmic in component diameter).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    pairs = dedup_near_minhash(spark, sf_dir).select("doc_a", "doc_b")

    # undirected edges both ways + self-loops seed labels = own id
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    labels = docs.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(5):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_a, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
            )
            # cut lineage every round: without this, iteration i re-executes
            # all i-1 previous joins (exponential plan growth)
            .localCheckpoint(eager=True)
        )
        if new_labels.exceptAll(labels).isEmpty():
            labels = new_labels
            break
        labels = new_labels

    survivors = labels.filter(F.col("doc_id") == F.col("label"))
    return (
        docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
        .orderBy("doc_id")
    )


# ----------------------------------------------------------------- simhash

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # hamming<=k candidates must share one of 4 16-bit chunks
SIMHASH_MAX_HAMMING = 3


def simhash_fingerprints(docs):
    """doc_id, simhash — 64-bit weighted token fingerprint, all JVM-side.

    For each bit position: sum over distinct tokens of (+count if the token
    hash has the bit set else -count); bit = 1 if the sum > 0. Expressed as
    one aggregate over (doc, token, count) with 64 conditional sums folded
    into a single bigint via bitwise OR — no Python, one shuffle.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("cnt"))
    tok = tok.withColumn("th", F.xxhash64("t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("th", i).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return per_doc.select("doc_id", fp.alias("simhash"))


@register("dedup_simhash")  # rows-only: bitwise pipeline, no practical SQL twin
def dedup_simhash(spark, sf_dir):
    """Near-dup pairs with simhash hamming distance <= 3.

    Candidate generation: pigeonhole on 16-bit chunks — pairs within hamming
    3 of 64 bits must agree on >= 1 of 4 chunks, so the self-join is keyed on
    (chunk_idx, chunk_value), never all-pairs. Golden-tested.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))

    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )
