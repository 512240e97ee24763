"""§2.A — scans, sources, sinks (SURVEY.md).

Parquet is the native format: footer schemas, columnar scan, predicate
pushdown and column pruning all arrive for free via Catalyst. Sinks write to
the repo-local scratch dir and read back, so round-trip fidelity is itself
hash-checked against the original table's oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_transform_spark.io import load_table, normalize_event_ts, path_of
from data_transform_spark.registry import register

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


@register("scan_parquet", oracle="SELECT * FROM customer")
def scan_parquet(spark, sf_dir):
    """Plain parquet scan; schema from the footer."""
    return load_table(spark, sf_dir, "customer")


@register("scan_events_ns", oracle="SELECT * FROM events")
def scan_events_ns(spark, sf_dir):
    """ns-timestamp scan via the nanosAsLong + timestamp_micros recipe."""
    return load_table(spark, sf_dir, "events")


@register(
    "scan_pruned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem WHERE l_quantity > 45
    """,
)
def scan_pruned(spark, sf_dir):
    """Projection + predicate reach the parquet scan (verified in test_plans)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register("sink_parquet", oracle="SELECT * FROM customer")
def sink_parquet(spark, sf_dir):
    """Parquet write + read-back round trip (hash-checked vs the original)."""
    out = f"{SCRATCH}/sink_parquet"
    load_table(spark, sf_dir, "customer").write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@register("sink_partitioned", oracle="SELECT * FROM lineitem")
def sink_partitioned(spark, sf_dir):
    """Hive-partitioned write; partition values come back from dir names.

    At scale this layout is what enables static + dynamic partition pruning.
    """
    out = f"{SCRATCH}/sink_partitioned"
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    df = spark.read.parquet(out)
    # partitionBy moves the column last and infers type; restore name/type/order
    return df.select(*[F.col(c.name).cast(c.dataType) for c in li.schema])


@register("sink_csv_json", oracle="SELECT * FROM nation")
def sink_csv_json(spark, sf_dir):
    """CSV then JSON round trip with explicit schemas (no inference)."""
    nation = load_table(spark, sf_dir, "nation")
    csv_out = f"{SCRATCH}/sink_csv"
    json_out = f"{SCRATCH}/sink_json"
    nation.write.mode("overwrite").option("header", True).csv(csv_out)
    back = spark.read.schema(nation.schema).option("header", True).csv(csv_out)
    back.write.mode("overwrite").json(json_out)
    return spark.read.schema(nation.schema).json(json_out)


@register("source_stream_file", oracle="SELECT * FROM events")
def source_stream_file(spark, sf_dir):
    """Structured Streaming file source over events, drained with AvailableNow.

    The batch read of the same file is the oracle — stream == batch is the
    core Structured Streaming guarantee we rely on for every §2.I op.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path_of(sf_dir, "events")).schema
    # the file source requires a directory: stage the fixture into scratch.
    # The staged copy is invalidated when the source mtime/size changes so a
    # regenerated fixture is never served stale (round-1 ADVICE.md).
    src = path_of(sf_dir, "events")
    src_dir = f"{SCRATCH}/stream_src_events_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(src_dir, exist_ok=True)
    staged = f"{src_dir}/events.parquet"
    stamp_file = f"{src_dir}/_stamp"
    st = os.stat(src)
    stamp = f"{st.st_mtime_ns}:{st.st_size}"
    prev = open(stamp_file).read() if os.path.exists(stamp_file) else None
    if prev != stamp or not os.path.exists(staged):
        import shutil

        shutil.copyfile(src, staged)
        with open(stamp_file, "w") as f:
            f.write(stamp)
    stream = normalize_event_ts(spark.readStream.schema(raw_schema).parquet(src_dir))
    name = "source_stream_file_mem"
    q = stream.writeStream.format("memory").queryName(name).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(name)


@register("scan_jsonl", oracle="SELECT * FROM documents")
def scan_jsonl(spark, sf_dir):
    """JSONL (newline-delimited JSON) source over the documents corpus.

    The landed-corpus format LLM pipelines actually ingest: the fixture is
    staged to scratch as JSONL once (stamp-invalidated on fixture change),
    then read back with an explicit schema — no inference pass, which at
    100 TB would double the scan. Hash-checked against the parquet original,
    so escaping (newlines, quotes, unicode) must round-trip exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    src = path_of(sf_dir, "documents")
    out_dir = f"{SCRATCH}/scan_jsonl_{os.path.basename(sf_dir.rstrip('/'))}"
    stamp_file = f"{out_dir}_stamp"
    st = os.stat(src)
    stamp = f"{st.st_mtime_ns}:{st.st_size}"
    prev = open(stamp_file).read() if os.path.exists(stamp_file) else None
    if prev != stamp or not os.path.isdir(out_dir):
        docs.write.mode("overwrite").json(out_dir)
        with open(stamp_file, "w") as f:
            f.write(stamp)
    return spark.read.schema(docs.schema).json(out_dir)


PYDS_N = 4096
PYDS_PARTS = 8
PYDS_MOD = 9973


class _DetNumbersReader:
    """Reader for the deterministic Python data source (split lazily to
    avoid importing pyspark.sql.datasource at module import)."""

    def __init__(self, options):
        self.n = int(options.get("n", PYDS_N))

    def partitions(self):
        from pyspark.sql.datasource import InputPartition

        return [InputPartition(i) for i in range(PYDS_PARTS)]

    def read(self, partition):
        i = partition.value
        for k in range(i, self.n, PYDS_PARTS):
            yield (k, (k * k) % PYDS_MOD)


def _det_numbers_source():
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class DetNumbersSource(DataSource):
        """Custom PYTHON DATA SOURCE (Spark 4 pyspark.sql.datasource API):
        a deterministic numbers table produced by 8 independent reader
        partitions — the connector surface for systems with no built-in
        reader (internal services, custom formats)."""

        @classmethod
        def name(cls):
            return "det_numbers"

        def schema(self):
            return "id long, v long"

        def reader(self, schema):
            r = _DetNumbersReader(self.options)

            class _R(DataSourceReader):
                partitions = staticmethod(r.partitions)
                read = staticmethod(r.read)

            return _R()

    return DetNumbersSource


@register(
    "scan_python_datasource",
    oracle=f"""
    SELECT k AS id, (k * k) % {PYDS_MOD} AS v
    FROM generate_series(0, {PYDS_N - 1}) t(k)
    """,
)
def scan_python_datasource(spark, sf_dir):
    """Read through a registered Spark 4 Python Data Source: each of the 8
    InputPartitions yields its residue class of [0, 4096) with a derived
    column, Arrow-batched into the scan like any file source.

    Demonstrates the extension point for sources Spark lacks natively; at
    scale partitions() returns one split per shard/chunk of the external
    system and reads stream per-partition with no driver involvement."""
    spark.dataSource.register(_det_numbers_source())
    return spark.read.format("det_numbers").option("n", str(PYDS_N)).load()


@register("scan_csv", oracle="SELECT * FROM documents")
def scan_csv(spark, sf_dir):
    """CSV source over the documents corpus, RFC-4180 quoting (quote-doubled
    escapes) on both the staged write and the read-back, with an explicit
    schema — inference would double the scan at 100 TB exactly like the
    JSONL case. Hash-checked against the parquet original, so header,
    quoting, and type round-trips must be exact."""
    docs = load_table(spark, sf_dir, "documents")
    src = path_of(sf_dir, "documents")
    out_dir = f"{SCRATCH}/scan_csv_{os.path.basename(sf_dir.rstrip('/'))}"
    stamp_file = f"{out_dir}_stamp"
    st = os.stat(src)
    stamp = f"{st.st_mtime_ns}:{st.st_size}"
    prev = open(stamp_file).read() if os.path.exists(stamp_file) else None
    if prev != stamp or not os.path.isdir(out_dir):
        docs.write.mode("overwrite").options(
            header=True, quote='"', escape='"'
        ).csv(out_dir)
        with open(stamp_file, "w") as f:
            f.write(stamp)
    return spark.read.schema(docs.schema).options(
        header=True, quote='"', escape='"'
    ).csv(out_dir)


@register(
    "scan_schema_evolution",
    oracle="""
    SELECT doc_id, n_chars,
           CASE WHEN doc_id % 2 <> 0 THEN lang ELSE NULL END AS lang
    FROM documents
    """,
)
def scan_schema_evolution(spark, sf_dir):
    """Schema-evolution scan: two parquet batches written with DIFFERENT
    schemas (the later batch added a `lang` column) read back as ONE table
    via ``mergeSchema`` — older files null-pad the missing column.

    This is the long-lived-dataset reality at 100 TB: columns get added over
    months of ingest and a re-write of history is off the table. Footer
    merging is a metadata-only operation (one schema per FILE, not per row),
    and column pruning/pushdown still work on the merged scan. mergeSchema
    is opt-in per read because merging thousands of footers has driver-side
    cost — at scale you pin the merged schema in a catalog instead."""
    docs = load_table(spark, sf_dir, "documents")
    out = f"{SCRATCH}/schema_evolution"
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars").write.mode(
        "overwrite"
    ).parquet(f"{out}/batch=1")
    docs.filter(F.col("doc_id") % 2 != 0).select(
        "doc_id", "n_chars", "lang"
    ).write.mode("overwrite").parquet(f"{out}/batch=2")
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", out)
        .parquet(f"{out}/batch=1", f"{out}/batch=2")
        .select("doc_id", "n_chars", "lang")
    )
