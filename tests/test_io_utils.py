"""spread() split estimation + zero-norm embedding guard (round-3 ADVICE)."""

import math
import os

import pytest

from data_transform_spark.io import _bytes_conf, load_table, spread


class TestBytesConf:
    def test_plain_and_suffixed_forms(self, spark):
        spark.conf.set("spark.test.bytesconf", "134217728b")
        assert _bytes_conf(spark, "spark.test.bytesconf", 0) == 134217728
        spark.conf.set("spark.test.bytesconf", "128MB")
        assert _bytes_conf(spark, "spark.test.bytesconf", 0) == 128 << 20
        spark.conf.set("spark.test.bytesconf", "4mb")
        assert _bytes_conf(spark, "spark.test.bytesconf", 0) == 4 << 20
        spark.conf.set("spark.test.bytesconf", "1024")
        assert _bytes_conf(spark, "spark.test.bytesconf", 0) == 1024
        # Spark's single-letter JavaUtils forms must parse too — '512m'
        # silently falling back to 128MB would skew the spread() estimate 4x
        spark.conf.set("spark.test.bytesconf", "512m")
        assert _bytes_conf(spark, "spark.test.bytesconf", 0) == 512 << 20
        spark.conf.set("spark.test.bytesconf", "1g")
        assert _bytes_conf(spark, "spark.test.bytesconf", 0) == 1 << 30
        spark.conf.set("spark.test.bytesconf", "2tb")
        assert _bytes_conf(spark, "spark.test.bytesconf", 0) == 2 << 40

    def test_missing_key_falls_back(self, spark):
        assert _bytes_conf(spark, "spark.test.definitely.absent", 77) == 77


class TestSpread:
    def test_single_small_file_is_spread(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        assert len(docs.inputFiles()) < spark.sparkContext.defaultParallelism
        out = spread(docs)
        # repartition node present: partition count hits the target
        assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    def test_few_huge_files_estimate_uses_bytes(self, spark, tmp_path):
        # One file whose BYTE size implies >= target splits must not be
        # re-shuffled even though the file COUNT is 1. Simulate "huge" by
        # shrinking maxPartitionBytes instead of writing gigabytes.
        df = spark.range(0, 200_000).selectExpr("id", "repeat('x', 64) AS pad")
        path = str(tmp_path / "wide.parquet")
        df.coalesce(1).write.parquet(path)
        scan = spark.read.parquet(path)
        fsize = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        target = spark.sparkContext.defaultParallelism
        old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_oc = spark.conf.get("spark.sql.files.openCostInBytes")
        try:
            mpb = max(1, math.ceil(fsize / (target + 1)))
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            out = spread(scan)
            assert out is scan  # no repartition inserted
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
            spark.conf.set("spark.sql.files.openCostInBytes", old_oc)


class TestZeroNormGuard:
    @pytest.fixture(scope="class")
    def zero_norm_dir(self, spark, tmp_path_factory):
        """Fixture dir whose embeddings table plants one zero-norm vector."""
        d = tmp_path_factory.mktemp("zn")
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0], "a"),
            (1, [0.9, 0.1, 0.0, 0.0], "a"),
            (2, [0.0, 0.0, 0.0, 0.0], "z"),  # zero norm: cosine undefined
            (3, [0.0, 1.0, 0.0, 0.0], "b"),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string"
        ).write.parquet(str(d / "embeddings.parquet"))
        return str(d)

    def test_zero_norm_vector_never_pairs(self, spark, zero_norm_dir):
        from data_transform_spark.pipeline.similarity import tiled_cosine_pairs

        got = tiled_cosine_pairs(spark, zero_norm_dir, 0.4).collect()
        ids = {r["id_a"] for r in got} | {r["id_b"] for r in got}
        assert 2 not in ids
        assert all(not math.isnan(r["score"]) for r in got)
        # the well-defined near-parallel pair is still found
        assert {(r["id_a"], r["id_b"]) for r in got} >= {(0, 1)}

    def test_oracle_twin_agrees_on_zero_norm(self, spark, zero_norm_dir):
        """The DuckDB twin with the norm>0 guard must match Spark exactly."""
        import duckdb

        from data_transform_spark.registry import ORACLES

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"parquet_scan('{zero_norm_dir}/embeddings.parquet/*.parquet')"
        )
        want = sorted(map(tuple, con.execute(ORACLES["sim_pairs_threshold"]).fetchall()))
        from data_transform_spark.pipeline.similarity import PAIR_TAU, tiled_cosine_pairs

        got = sorted(
            (r["id_a"], r["id_b"], r["score"])
            for r in tiled_cosine_pairs(spark, zero_norm_dir, PAIR_TAU).collect()
        )
        assert got == want


class TestStageAtomic:
    def test_publishes_complete_dir_and_discards_race_loser(self, tmp_path):
        """r7 ADVICE: staged cache dirs are published via temp-dir +
        os.rename, so a reader can only ever see a COMPLETE directory; a
        process that loses the rename race discards its temp copy and the
        winner's contents survive untouched."""
        from data_transform_spark.operators.scans import _stage_atomic

        target = str(tmp_path / "staged")

        def build_v1(d):
            os.makedirs(d)
            with open(f"{d}/part-0", "w") as f:
                f.write("v1")
            with open(f"{d}/_SUCCESS", "w") as f:
                f.write("")

        _stage_atomic(target, build_v1)
        with open(f"{target}/part-0") as f:
            assert f.read() == "v1"

        def build_v2(d):
            os.makedirs(d)
            with open(f"{d}/part-0", "w") as f:
                f.write("v2")
            with open(f"{d}/_SUCCESS", "w") as f:
                f.write("")

        _stage_atomic(target, build_v2)  # target already exists: lost race
        with open(f"{target}/part-0") as f:
            assert f.read() == "v1"
        # no stray .tmp-* siblings left behind
        assert sorted(os.listdir(tmp_path)) == ["staged"]

    def test_heals_corrupt_markerless_leftover(self, tmp_path):
        """r8 ADVICE: a pre-existing target WITHOUT its completeness marker
        (a delete-then-write crash leftover) must not win the rename race —
        the fresh complete build replaces it instead of being discarded
        while callers read the partial dir forever."""
        from data_transform_spark.operators.scans import _stage_atomic

        target = str(tmp_path / "staged")
        os.makedirs(target)  # corrupt leftover: no _SUCCESS inside
        with open(f"{target}/part-0", "w") as f:
            f.write("partial")

        def build(d):
            os.makedirs(d)
            with open(f"{d}/part-0", "w") as f:
                f.write("fresh")
            with open(f"{d}/_SUCCESS", "w") as f:
                f.write("")

        _stage_atomic(target, build)
        with open(f"{target}/part-0") as f:
            assert f.read() == "fresh"
        assert os.path.exists(f"{target}/_SUCCESS")
        assert sorted(os.listdir(tmp_path)) == ["staged"]

    def test_failed_build_leaks_no_temp_sibling(self, tmp_path):
        """r8 ADVICE: if build() raises, the .tmp-* sibling is cleaned up
        (not leaked in SCRATCH) and the error propagates."""
        import pytest

        from data_transform_spark.operators.scans import _stage_atomic

        target = str(tmp_path / "staged")

        def bad_build(d):
            os.makedirs(d)
            with open(f"{d}/part-0", "w") as f:
                f.write("half")
            raise RuntimeError("build blew up")

        with pytest.raises(RuntimeError, match="build blew up"):
            _stage_atomic(target, bad_build)
        assert os.listdir(tmp_path) == []  # no target, no .tmp-* leftovers

    def test_custom_marker_respected(self, tmp_path):
        """A complete winner carrying a CUSTOM marker (e.g. _planted) is
        left untouched by a losing builder using the same marker name."""
        from data_transform_spark.operators.scans import _stage_atomic

        target = str(tmp_path / "staged")

        def build(tag):
            def _b(d):
                os.makedirs(d)
                with open(f"{d}/part-0", "w") as f:
                    f.write(tag)
                with open(f"{d}/_planted", "w") as f:
                    f.write("ok")

            return _b

        _stage_atomic(target, build("first"), marker="_planted")
        _stage_atomic(target, build("second"), marker="_planted")
        with open(f"{target}/part-0") as f:
            assert f.read() == "first"

    def test_build_must_write_its_marker(self, tmp_path):
        """r9 ADVICE: a build that writes a DIFFERENT marker than the one
        passed to _stage_atomic would publish a dir every later process
        treats as a corrupt leftover (and rmtree's while readers hold it).
        The mismatch is now caught at build time, before the rename."""
        import pytest

        from data_transform_spark.operators.scans import _stage_atomic

        target = str(tmp_path / "staged")

        def build(d):
            os.makedirs(d)
            with open(f"{d}/part-0", "w") as f:
                f.write("data")
            with open(f"{d}/_STAGED", "w") as f:  # wrong name for _SUCCESS
                f.write("ok")

        with pytest.raises(OSError, match="completeness marker"):
            _stage_atomic(target, build)  # default marker=_SUCCESS
        assert os.listdir(tmp_path) == []  # nothing published, nothing leaked

        _stage_atomic(target, build, marker="_STAGED")  # correct kwarg: ok
        with open(f"{target}/part-0") as f:
            assert f.read() == "data"
