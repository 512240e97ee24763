"""Property-based tests (hypothesis, SURVEY.md §5.2.3) over generated frames.

Algebraic invariants that must hold for ANY input — they catch semantic
slips the fixture-pinned oracles can't (e.g. a dedup that isn't idempotent).
Small example counts: each property round-trips through the JVM.
"""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.integers(min_value=-100, max_value=100),  # val
        st.sampled_from(["a", "b", "c"]),  # tag
    ),
    min_size=0,
    max_size=25,
)

PROP_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    # the driver's verify must be reproducible: same examples every run
    derandomize=True,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "val", "tag"])
        if rows
        else pd.DataFrame({"key": pd.Series(dtype="int64"),
                           "val": pd.Series(dtype="int64"),
                           "tag": pd.Series(dtype="object")}),
        schema="key long, val long, tag string",
    )


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_union_all_counts_add(spark, rows):
    df = _df(spark, rows)
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_filter_partitions_rows(spark, rows):
    df = _df(spark, rows)
    cond = F.col("val") > 0
    assert df.filter(cond).count() + df.filter(~cond).count() == df.count()


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_canonical_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    w = Window.partitionBy("key").orderBy("val", "tag")
    dedup1 = df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    dedup2 = dedup1.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    assert sorted(map(tuple, dedup1.collect())) == sorted(map(tuple, dedup2.collect()))


@given(rows=ROWS, rows2=ROWS)
@settings(**PROP_SETTINGS)
def test_semi_join_is_subset_of_left(spark, rows, rows2):
    left = _df(spark, rows)
    right = _df(spark, rows2)
    semi = left.join(right, "key", "left_semi")
    anti = left.join(right, "key", "left_anti")
    assert semi.count() + anti.count() == left.count()
    left_keys = {r["key"] for r in left.collect()}
    assert {r["key"] for r in semi.collect()} <= left_keys


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_groupby_sum_matches_duckdb(spark, rows):
    """Engine-vs-engine equivalence on generated data, not just fixtures."""
    df = _df(spark, rows)
    got = {
        (r["key"],): (r["n"], r["s"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    pdf = pd.DataFrame(rows, columns=["key", "val", "tag"])
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        (k,): (n, s)
        for k, n, s in con.sql("SELECT key, count(*), sum(val) FROM t GROUP BY key").fetchall()
    }
    con.close()
    assert got == want


def test_transition_probabilities_row_normalize(spark, sf_dir):
    """Each prev-state's outgoing transition probabilities must sum to 1
    and every count must be positive."""
    import __spark_entry__  # noqa: F401
    from data_transform_spark.registry import QUERIES

    rows = QUERIES["events_transitions"](spark, sf_dir).collect()
    assert rows
    by_prev = {}
    for r in rows:
        assert r.n > 0
        assert 0 < r.p <= 1
        by_prev.setdefault(r.prev, 0.0)
        by_prev[r.prev] += r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-9, f"{prev}: probabilities sum to {total}"


def test_containment_bounds_and_includes_exact_dups(spark, sf_dir):
    """Containment values live in [tau, 1]; every EXACT duplicate pair
    (identical text, distinct ids) must appear with containment 1.0 —
    exact dups are the easiest containment case and losing one would mean
    the prefix filter dropped a qualifying pair."""
    import __spark_entry__  # noqa: F401
    from data_transform_spark.io import load_table
    from data_transform_spark.pipeline.dedup import CONTAIN_TAU
    from data_transform_spark.registry import QUERIES

    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in QUERIES["dedup_containment"](spark, sf_dir).collect()
    }
    for v in got.values():
        assert CONTAIN_TAU <= v <= 1.0
    # brute-force python containment over the whole (small) fixture: the
    # lossless-prefix claim means the operator must find EVERY pair
    from data_transform_spark.pipeline.dedup import CONTAIN_K

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sets = {}
    for r in d:
        toks = r.text.split(" ")
        ks = {
            " ".join(toks[i : i + CONTAIN_K])
            for i in range(max(len(toks) - CONTAIN_K + 1, 1))
        }
        sets[r.doc_id] = ks
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            m = min(len(sets[a]), len(sets[b]))
            if m and inter / m >= CONTAIN_TAU:
                want[(a, b)] = inter / m
    assert want, "fixture has no qualifying containment pairs?"
    assert set(got) == set(want), (
        f"pair sets differ: missing={set(want) - set(got)} "
        f"extra={set(got) - set(want)}"
    )


@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=1, max_size=50))
@settings(max_examples=30, deadline=None)
def test_morton_interleave_is_injective_and_monotone_in_blocks(pairs):
    """The z-interleave must be a bijection on (bx, by) in [0,256)² and
    share the high-bit block structure (same top bits of both dims → same
    z block) — the property file-range clustering relies on."""
    from data_transform_spark.operators.scans import _z_interleave_sql

    expr = _z_interleave_sql("bx", "by")

    def z_py(bx, by):
        z = 0
        for i in range(8):
            z |= ((bx >> i) & 1) << (2 * i + 1)
            z |= ((by >> i) & 1) << (2 * i)
        return z

    seen = {}
    for bx, by in pairs:
        z = z_py(bx, by)
        assert 0 <= z < 1 << 16
        if (bx, by) in seen:
            assert seen[(bx, by)] == z
        else:
            assert z not in seen.values() or (bx, by) in seen
            seen[(bx, by)] = z
        # block structure: top 2 bits of each dim = top 4 bits of z
        assert z >> 12 == (
            ((bx >> 7) & 1) << 3
            | ((by >> 7) & 1) << 2
            | ((bx >> 6) & 1) << 1
            | ((by >> 6) & 1)
        )
    # the SQL string matches the python model on a sample row (spot check
    # via literal substitution happens in the oracle parity suite; here we
    # just pin that the expression mentions every bit lane once)
    for i in range(8):
        assert f"<< {2 * i + 1})" in expr and f"<< {2 * i})" in expr


def test_containment_guard_is_lossless_under_boilerplate(spark, tmp_path, monkeypatch):
    """r6 VERDICT #3: a corpus where one universal boilerplate line pushes
    shingles over the df cap must return the EXACT same pair set as the
    unguarded run — banning is a performance knob, never a recall knob.
    The corpus forces BOTH guard tiers: content docs (unbanned prefix) and
    pure-boilerplate docs (entire set banned -> fallback probe)."""
    import pandas as pd

    import data_transform_spark.pipeline.dedup as dd

    boiler = "terms of service apply to all content on this site"
    texts = {}
    # 12 content docs with disjoint vocab + the universal boilerplate suffix
    for i in range(12):
        words = [f"w{i}x{j}" for j in range(12)]
        texts[i] = " ".join(words) + " " + boiler
    # contained pair: doc 100 is the first 10 words of doc 0 (containment 1.0,
    # found via the NORMAL tier — its shingles are rare)
    texts[100] = " ".join(f"w0x{j}" for j in range(10))
    # two identical pure-boilerplate docs: every shingle banned under the
    # guarded cap -> FALLBACK tier must still surface their pairs
    texts[200] = boiler
    texts[201] = boiler
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "synth",
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )

    def shingles(text, k=dd.CONTAIN_K):
        words = text.split(" ")
        return {
            " ".join(words[i : i + k])
            for i in range(0, max(len(words) - k, 0) + 1)
        }

    expected = {}
    ids = sorted(texts)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            sa, sb = shingles(texts[a]), shingles(texts[b])
            cont = len(sa & sb) / min(len(sa), len(sb))
            if cont >= dd.CONTAIN_TAU:
                expected[(a, b)] = round(cont, 9)

    def run(cap):
        monkeypatch.setattr(dd, "CONTAIN_DF_CAP", cap)
        rows = dd.dedup_containment(spark, str(tmp_path)).collect()
        return {(r.doc_a, r.doc_b): round(r.containment, 9) for r in rows}

    guarded = run(4)  # boilerplate shingles have df=14 > 4 -> banned
    unguarded = run(10**9)  # nothing banned: the original single-tier path
    assert guarded == unguarded, "guard changed the result set"
    assert guarded == expected, "containment pairs differ from brute force"
    # sanity: the scenario actually exercised both tiers
    assert (200, 201) in expected  # fallback-tier pair
    assert (0, 100) in expected  # normal-tier contained pair


# Small random corpora with heavy shingle collisions: 3-word shingles over a
# 5-word vocab force shared/high-df shingles, doc lengths straddle the
# shingle width, and a tiny cap forces bans — the adversarial surface of the
# r7 containment guard (prefix-length ties, n_ub == p boundaries, sub-k
# docs, all-banned docs).
CORPUS = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=2, max_size=9
    ),
    min_size=2,
    max_size=8,
)


@given(docs=CORPUS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_containment_guard_matches_bruteforce_on_random_corpora(
    spark, tmp_path_factory, docs
):
    """Guarded (tiny cap -> many bans) and unguarded containment must both
    equal the brute-force pair set on ANY corpus."""
    import pandas as pd

    import data_transform_spark.pipeline.dedup as dd

    k = 3
    texts = {i: " ".join(words) for i, words in enumerate(docs)}
    base = tmp_path_factory.mktemp("contain_prop")
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "synth",
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{base}/documents.parquet"
    )

    def shingles(text):
        words = text.split(" ")
        return {
            " ".join(words[i : i + k])
            for i in range(0, max(len(words) - k, 0) + 1)
        }

    expected = set()
    ids = sorted(texts)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            sa, sb = shingles(texts[a]), shingles(texts[b])
            if len(sa & sb) / min(len(sa), len(sb)) >= dd.CONTAIN_TAU:
                expected.add((a, b))

    orig_k, orig_cap = dd.CONTAIN_K, dd.CONTAIN_DF_CAP
    try:
        dd.CONTAIN_K = k
        for cap in (2, 10**9):
            dd.CONTAIN_DF_CAP = cap
            got = {
                (r.doc_a, r.doc_b)
                for r in dd.dedup_containment(spark, str(base)).collect()
            }
            assert got == expected, (
                f"cap={cap}: {sorted(got)} != {sorted(expected)} on {texts}"
            )
    finally:
        dd.CONTAIN_K, dd.CONTAIN_DF_CAP = orig_k, orig_cap


def test_motif_whale_cap_bounds_journeys(spark, tmp_path):
    """r7 VERDICT #2: the whale-entity cap in events_sequence_motif is
    enforced code, not documentation — a synthetic whale user's journey is
    truncated to its first MOTIF_CAP events by (ts, event_id), and adding
    the whale changes NO other user's row (the cap is per-entity, so one
    skewed entity can never perturb, or unboundedly grow, the rest)."""
    import datetime
    import hashlib

    from data_transform_spark.operators.events import (
        MOTIF_CAP,
        events_sequence_motif,
    )

    types = ["view", "click", "purchase", "error", "share"]
    base = datetime.datetime(2024, 1, 1)

    def mk_rows(user, n, start_eid):
        return [
            (
                start_eid + i,
                base + datetime.timedelta(minutes=i),
                user,
                types[i % len(types)],
                1.0,
                "{}",
            )
            for i in range(n)
        ]

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    normal = mk_rows(1, 40, 0) + mk_rows(2, 7, 1000) + mk_rows(3, 99, 2000)

    def stage(rows, d):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{d}/events.parquet"
        )

    d0, d1 = tmp_path / "no_whale", tmp_path / "whale"
    stage(normal, d0)
    stage(normal + mk_rows(999, MOTIF_CAP + 57, 10_000), d1)

    rows0 = {r.user_id: r for r in events_sequence_motif(spark, str(d0)).collect()}
    rows1 = {r.user_id: r for r in events_sequence_motif(spark, str(d1)).collect()}

    assert set(rows1) == set(rows0) | {999}
    for uid, r in rows0.items():
        assert rows1[uid] == r, f"whale changed user {uid}'s row"

    whale = rows1[999]
    assert whale.journey_len == MOTIF_CAP  # bounded, not MOTIF_CAP + 57
    # the cutoff keeps the FIRST cap events by (ts, event_id): the journey
    # is exactly the first MOTIF_CAP initials of the round-robin type cycle
    expected = "".join(types[i % len(types)][0] for i in range(MOTIF_CAP))
    assert whale.journey_md5 == hashlib.md5(expected.encode()).hexdigest()


def test_substring_dedup_matches_bruteforce(spark, tmp_path):
    """text_substring_dedup (r7 VERDICT #3) against a quadratic Python
    model on an adversarial corpus: a passage copied at a different
    offset, an exact-duplicate doc, a within-doc repeat, and a sub-window
    doc. First-occurrence-wins by (doc_id, pos); later occurrences mark
    their W token positions; survivors reassemble in order."""
    import pandas as pd

    import data_transform_spark.pipeline.dedup as dd

    W = dd.SUBSTR_W
    base_words = [f"a{i}" for i in range(30)]
    passage = base_words[5 : 5 + W + 3]  # a W+3-token run shared across docs
    texts = {
        0: " ".join(base_words),
        1: " ".join([f"b{i}" for i in range(7)] + passage + ["t1", "t2"]),
        2: " ".join(base_words),  # exact dup of doc 0 -> fully removed
        3: " ".join(passage + ["mid"] + passage),  # cross-doc + in-doc repeat
        4: "tiny doc below window",  # < W tokens: never touched
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "synth",
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )

    occ = []
    for d in sorted(texts):
        t = texts[d].split(" ")
        for p in range(len(t) - W + 1):
            occ.append((" ".join(t[p : p + W]), d, p))
    first = {}
    for g, d, p in sorted(occ, key=lambda x: (x[1], x[2])):
        first.setdefault(g, (d, p))
    covered = set()
    for g, d, p in occ:
        if first[g] != (d, p):
            covered.update((d, q) for q in range(p, p + W))
    expected = {}
    for d, text in texts.items():
        t = text.split(" ")
        kept = [w for q, w in enumerate(t) if (d, q) not in covered]
        expected[d] = (len(t), len(t) - len(kept), " ".join(kept))

    rows = dd.text_substring_dedup(spark, str(tmp_path)).collect()
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text) for r in rows}
    assert got == expected
    assert got[2] == (30, 30, "")  # exact dup: everything removed
    assert got[4][1] == 0  # sub-window doc untouched
    assert 0 < got[1][1] < got[1][0]  # copied passage removed, rest kept


# Tiny vocab + short docs around the window width: repeated 3-grams are
# common, docs straddle the sub-window boundary, and within-doc repeats
# occur — the adversarial surface of first-occurrence-wins span removal.
SUB_CORPUS = st.lists(
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=8),
    min_size=2,
    max_size=6,
)


@given(docs=SUB_CORPUS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_substring_dedup_matches_bruteforce_on_random_corpora(
    spark, tmp_path_factory, docs
):
    """text_substring_dedup must equal the quadratic Python model on ANY
    corpus (window width shrunk to 3 so collisions are dense)."""
    import pandas as pd

    import data_transform_spark.pipeline.dedup as dd

    W = 3
    texts = {i: " ".join(words) for i, words in enumerate(docs)}
    base = tmp_path_factory.mktemp("substr_prop")
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "synth",
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{base}/documents.parquet"
    )

    occ = []
    for d in sorted(texts):
        t = texts[d].split(" ")
        for p in range(len(t) - W + 1):
            occ.append((" ".join(t[p : p + W]), d, p))
    first = {}
    for g, d, p in sorted(occ, key=lambda o: (o[1], o[2])):
        first.setdefault(g, (d, p))
    covered = set()
    for g, d, p in occ:
        if first[g] != (d, p):
            covered.update((d, q) for q in range(p, p + W))
    expected = {}
    for d, text in texts.items():
        t = text.split(" ")
        kept = [w for q, w in enumerate(t) if (d, q) not in covered]
        expected[d] = (len(t), len(t) - len(kept), " ".join(kept))

    orig_w = dd.SUBSTR_W
    try:
        dd.SUBSTR_W = W
        rows = dd.text_substring_dedup(spark, str(base)).collect()
    finally:
        dd.SUBSTR_W = orig_w
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text) for r in rows}
    assert got == expected, f"{got} != {expected} on {texts}"


class TestBpe:
    def test_merge_table_matches_canonical_python_bpe(self, spark, sf_dir):
        """The whole trainer — word counts, pair counts, tie-breaks, greedy
        leftmost merging including a==b runs — must equal a from-the-paper
        python BPE (Sennrich 2016) on the live fixture."""
        from collections import Counter

        import duckdb

        from data_transform_spark.pipeline.training import BPE_ROUNDS
        from data_transform_spark.registry import QUERIES

        rows = duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet'"
        ).fetchall()
        wc = Counter(
            w for (t,) in rows for w in t.split(" ") if w
        )
        words = {w: list(w) for w in wc}
        want = []
        for r in range(1, BPE_ROUNDS + 1):
            pc = Counter()
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += wc[w]
            if not pc:
                break
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            want.append((r, a, b, a + b, cnt))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out

        got = [
            (r.merge_round, r.pair_a, r.pair_b, r.merged, r.pair_count)
            for r in QUERIES["vocab_bpe"](spark, sf_dir).collect()
        ]
        assert got == want

    def test_encoding_round_trips_and_counts_match_gold(self, spark, sf_dir):
        """Applying the learned merges must (a) never lose characters —
        concatenating a word's BPE tokens reproduces the word — and (b)
        yield exactly the canonical per-word token counts."""
        from pyspark.sql import functions as F

        from data_transform_spark.pipeline.training import (
            _bpe_seq0,
            _bpe_train,
            _bpe_words,
        )

        merges = _bpe_train(spark, sf_dir)
        assert len(merges) > 0
        seq = _bpe_seq0(F.col("word"))
        for _r, a, b, m, _c in merges:
            seq = F.replace(seq, F.lit(f" {a}  {b} "), F.lit(f" {m} "))
        enc = (
            _bpe_words(spark, sf_dir)
            .select(
                "word",
                F.split(F.trim(seq), "  ").alias("toks"),
            )
            .select(
                "word",
                F.size("toks").alias("n_bpe"),
                F.array_join("toks", "").alias("rejoined"),
            )
            .collect()
        )
        for r in enc:
            assert r.rejoined == r.word, f"round-trip lost chars: {r}"
        # independent canonical check of token counts on a sample of words
        from collections import Counter

        import duckdb

        rows = duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet'"
        ).fetchall()
        wc = Counter(w for (t,) in rows for w in t.split(" ") if w)
        words = {w: list(w) for w in wc}
        for _r, a, b, m, _c in merges:
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(m)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        got = {r.word: r.n_bpe for r in enc}
        assert got == {w: len(s) for w, s in words.items()}

    def test_trainer_deterministic_across_runs(self, spark, sf_dir):
        from data_transform_spark.pipeline.training import _bpe_train

        assert _bpe_train(spark, sf_dir) == _bpe_train(spark, sf_dir)


class TestPackBestfitBisect:
    """The r13 bisect-on-sorted-caps best-fit pick must be bit-identical
    to the reference O(bins) linear scan — same (cap, idx) argmin, same
    tie-break — on adversarial length streams (the Spark key's gold test
    pins the live fixture; this pins random streams incl. oversize docs
    and equal-cap ties)."""

    @given(
        lengths=st.lists(
            st.integers(min_value=1, max_value=700), min_size=1, max_size=60
        )
    )
    @settings(deadline=None, max_examples=200)
    def test_bisect_equals_linear_scan(self, lengths):
        from bisect import bisect_left, insort

        from data_transform_spark.pipeline.training import PACK_BUDGET

        lengths = sorted(lengths, reverse=True)  # BFD order
        # reference: the pre-r13 linear scan
        caps_l, assign_l = [], []
        for length in lengths:
            best = None
            for j, c in enumerate(caps_l):
                if c >= length and (best is None or (c, j) < (caps_l[best], best)):
                    best = j
            if best is None:
                assign_l.append(len(caps_l))
                caps_l.append(PACK_BUDGET - length)
            else:
                assign_l.append(best)
                caps_l[best] -= length
        # bisect variant (mirrors training.bfd)
        caps_b, assign_b = [], []
        by_cap = []
        for length in lengths:
            pos = bisect_left(by_cap, (length, -1))
            if pos == len(by_cap):
                insort(by_cap, (PACK_BUDGET - length, len(caps_b)))
                assign_b.append(len(caps_b))
                caps_b.append(PACK_BUDGET - length)
            else:
                cap, best = by_cap.pop(pos)
                insort(by_cap, (cap - length, best))
                assign_b.append(best)
                caps_b[best] -= length
        assert assign_b == assign_l and caps_b == caps_l


class TestBpeBatched:
    """Batched-merge BPE (vocab_bpe_batched): top-B non-overlapping pairs
    per round, greedy in rank order over the top 8·B candidates."""

    def test_batch_of_one_equals_sequential_trainer(self, spark, sf_dir):
        """B=1 must reproduce the sequential trainer EXACTLY — the knob's
        semantics contract: rank-1 is always accepted (no symbol taken
        yet) and the round stops at quota, so selection and replace are
        identical, and every accepted merge sits at cand_rank 1."""
        from data_transform_spark.pipeline.training import (
            BPE_ROUNDS,
            _bpe_train,
            _bpe_train_batched,
        )

        batched = _bpe_train_batched(spark, sf_dir, BPE_ROUNDS, 1)
        assert all(rk == 1 for (_r, rk, *_rest) in batched)
        assert [
            (r, a, b, m, c) for (r, _rk, a, b, m, c) in batched
        ] == _bpe_train(spark, sf_dir)

    def test_merge_table_matches_canonical_python_batched_bpe(
        self, spark, sf_dir
    ):
        """From-scratch python replay of the whole batched trainer on the
        live fixture: word counts, per-round pair counts, (count DESC,
        pair) ranking over the top 8·B candidates, the greedy-disjoint
        scan, and greedy-leftmost merge application in rank order."""
        from collections import Counter

        import duckdb

        from data_transform_spark.pipeline.training import (
            BPE_BATCH,
            BPE_BATCH_CAND_FACTOR,
            BPE_BATCH_ROUNDS,
        )
        from data_transform_spark.registry import QUERIES

        rows = duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet'"
        ).fetchall()
        wc = Counter(w for (t,) in rows for w in t.split(" ") if w)
        words = {w: list(w) for w in wc}
        cand = BPE_BATCH_CAND_FACTOR * BPE_BATCH
        want = []
        for r in range(1, BPE_BATCH_ROUNDS + 1):
            pc = Counter()
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += wc[w]
            if not pc:
                break
            ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            taken: set = set()
            n_acc = 0
            for rk, ((a, b), cnt) in enumerate(ranked[:cand], start=1):
                if n_acc >= BPE_BATCH:
                    break
                if a in taken or b in taken:
                    continue
                # outputs join taken too (r13 ADVICE string-collision edge)
                taken.update((a, b, a + b))
                n_acc += 1
                want.append((r, rk, a, b, a + b, cnt))
                for w, syms in words.items():
                    out, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == a
                            and syms[i + 1] == b
                        ):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    words[w] = out

        got = [
            (
                r.merge_round,
                r.cand_rank,
                r.pair_a,
                r.pair_b,
                r.merged,
                r.pair_count,
            )
            for r in QUERIES["vocab_bpe_batched"](spark, sf_dir).collect()
        ]
        assert got == want

    def test_batched_encoding_round_trips_and_counts_match_gold(
        self, spark, sf_dir
    ):
        """The batched encoder must (a) never lose characters — a word's
        BPE tokens concatenate back to the word — and (b) match a python
        greedy-leftmost application of the batched merge table."""
        from collections import Counter

        import duckdb
        from pyspark.sql import functions as F

        from data_transform_spark.pipeline.training import (
            BPE_BATCH,
            BPE_BATCH_ROUNDS,
            _bpe_seq0,
            _bpe_train_batched,
            _bpe_words,
        )

        merges = _bpe_train_batched(
            spark, sf_dir, BPE_BATCH_ROUNDS, BPE_BATCH
        )
        assert len(merges) > 0
        seq = _bpe_seq0(F.col("word"))
        for _r, _rk, a, b, m, _c in merges:
            seq = F.replace(seq, F.lit(f" {a}  {b} "), F.lit(f" {m} "))
        enc = (
            _bpe_words(spark, sf_dir)
            .select("word", F.split(F.trim(seq), "  ").alias("toks"))
            .select(
                "word",
                F.size("toks").alias("n_bpe"),
                F.array_join("toks", "").alias("rejoined"),
            )
            .collect()
        )
        for r in enc:
            assert r.rejoined == r.word, f"round-trip lost chars: {r}"
        rows = duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet'"
        ).fetchall()
        wc = Counter(w for (t,) in rows for w in t.split(" ") if w)
        words = {w: list(w) for w in wc}
        for _r, _rk, a, b, m, _c in merges:
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(m)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        got = {r.word: r.n_bpe for r in enc}
        assert got == {w: len(s) for w, s in words.items()}

    def test_batching_is_nontrivial_on_fixture(self, spark, sf_dir):
        """Non-degeneracy: on the live fixture some round must accept more
        than one merge (the batch actually batches) AND some accepted
        merge must sit at a cand_rank beyond its acceptance position (the
        disjointness filter actually skipped an overlapping candidate) —
        otherwise the key is exercising neither of its two mechanisms."""
        from collections import Counter

        from data_transform_spark.registry import QUERIES

        rows = QUERIES["vocab_bpe_batched"](spark, sf_dir).collect()
        per_round = Counter(r.merge_round for r in rows)
        assert max(per_round.values()) > 1
        assert any(
            r.cand_rank > per_round[r.merge_round] for r in rows
        ), "no candidate was ever skipped — disjointness untested"


class TestBpeBytes:
    """Byte-level BPE (vocab_bpe_bytes / tokenize_bpe_bytes): GPT-2-style
    256-symbol base alphabet over UTF-8 bytes, rendered as 2-char hex."""

    def test_merge_table_matches_canonical_python_byte_bpe(self, spark, sf_dir):
        """Trainer parity with a from-the-paper python BPE run over hex
        byte symbols on the live fixture (the byte twin of the char
        canonical test)."""
        from collections import Counter

        import duckdb

        from data_transform_spark.pipeline.training import BPE_ROUNDS
        from data_transform_spark.registry import QUERIES

        rows = duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet'"
        ).fetchall()
        wc = Counter(w for (t,) in rows for w in t.split(" ") if w)
        words = {
            w: [f"{b:02x}" for b in w.encode("utf-8")] for w in wc
        }
        want = []
        for r in range(1, BPE_ROUNDS + 1):
            pc = Counter()
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += wc[w]
            if not pc:
                break
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            want.append((r, a, b, a + b, cnt))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        got = [
            (r.merge_round, r.pair_a, r.pair_b, r.merged, r.pair_count)
            for r in QUERIES["vocab_bpe_bytes"](spark, sf_dir).collect()
        ]
        assert got == want

    def test_multibyte_round_trip_lossless(self, spark, tmp_path):
        """THE byte-level property (r11 VERDICT #4): on multi-byte (zh)
        text — which char-BPE can't cover with a closed alphabet —
        encoding must be lossless: unhex(concat(final symbols)) decodes
        back to the exact original word. The fixture corpus is all-ASCII,
        so this runs on a synthetic zh corpus; it also pins that at least
        one learned merge is a byte span that is NOT a complete UTF-8
        sequence (tokens are byte spans, not characters — the defining
        difference from vocab_bpe)."""
        from pyspark.sql import functions as F

        from data_transform_spark.pipeline.training import (
            _bpe_seq0_bytes,
            _bpe_train,
            _bpe_words,
        )

        zh = [
            "中文 分词 模型 中文 训练",
            "数据 管道 中文 数据 分词",
            "模型 训练 数据 中文 管道",
            "mixed ascii 中文 tokens here",
        ]
        spark.createDataFrame(
            [(i, t, "zh", "syn", len(t)) for i, t in enumerate(zh)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

        merges = _bpe_train(spark, str(tmp_path), seq0=_bpe_seq0_bytes)
        assert merges, "trainer learned nothing on the zh corpus"
        seq = _bpe_seq0_bytes(F.col("word"))
        for _r, a, b, m, _c in merges:
            seq = F.replace(seq, F.lit(f" {a}  {b} "), F.lit(f" {m} "))
        enc = (
            _bpe_words(spark, str(tmp_path))
            .select("word", F.split(F.trim(seq), "  ").alias("toks"))
            .collect()
        )
        assert len(enc) > 0
        for r in enc:
            assert bytes.fromhex("".join(r.toks)).decode("utf-8") == r.word, (
                f"byte round-trip lost data: {r}"
            )

        def complete_utf8(hexs: str) -> bool:
            try:
                bytes.fromhex(hexs).decode("utf-8")
                return True
            except UnicodeDecodeError:
                return False

        assert any(not complete_utf8(m) for _r, _a, _b, m, _c in merges), (
            "every merge decoded as complete UTF-8 — merges never fused "
            "bytes inside a multi-byte char, which zh frequencies make "
            "all but impossible"
        )

    def test_byte_token_counts_bounded_by_bytes(self, spark, sf_dir):
        """Per doc: 0 < n_bpe_tokens <= n_byte_tokens (merges only ever
        shrink the byte sequence), and n_byte_tokens >= n_words (every
        word is at least one byte)."""
        from data_transform_spark.registry import QUERIES

        rows = QUERIES["tokenize_bpe_bytes"](spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows:
            assert 0 < r.n_bpe_tokens <= r.n_byte_tokens
            assert r.n_byte_tokens >= r.n_words
        # non-degeneracy: the merges actually compressed something
        assert any(r.n_bpe_tokens < r.n_byte_tokens for r in rows)


class TestCurationRound9:
    def test_fuzzy_decontamination_sees_through_cosmetics(self, spark, tmp_path):
        """The fixture is all-lowercase, so the fuzzy key's normalization is
        a no-op there — prove it is REAL by planting a benchmark doc and a
        training doc that share a 13-gram only after lowercasing,
        punctuation-stripping, and whitespace collapse (the exact
        decontaminate_ngram key would miss this pair)."""
        import pandas as pd

        from data_transform_spark.pipeline.curation import decontaminate_fuzzy

        gram = " ".join(f"tok{i}" for i in range(13))
        texts = {
            0: gram + " tail0 tail1",  # doc_id 0: benchmark (0 % 97 == 0)
            1: gram.upper().replace(" ", ",  ") + "  trailing!!",  # cosmetic
            2: " ".join(f"other{i}" for i in range(20)),  # clean doc
        }
        pdf = pd.DataFrame(
            {
                "doc_id": list(texts),
                "text": list(texts.values()),
                "lang": "en",
                "source": "synth",
                "n_chars": [len(t) for t in texts.values()],
            }
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        rows = {r.doc_id: r for r in decontaminate_fuzzy(spark, str(tmp_path)).collect()}
        assert set(rows) == {1, 2}  # benchmark doc excluded from output
        assert rows[1].is_contaminated and rows[1].n_shared >= 1
        assert not rows[2].is_contaminated and rows[2].n_shared == 0
        assert rows[2].contamination_ratio == 0.0

    def test_token_budget_is_prefix_stable(self, spark, sf_dir):
        """Growing the corpus must never change which of the EXISTING docs a
        budget keeps (greedy take in doc_id order): the kept set at sf0.01
        must be exactly the budget-prefix a driver-side replay predicts."""
        import duckdb

        from data_transform_spark.pipeline.curation import (
            MIX_TOKEN_BUDGET,
            mix_token_budget,
        )

        got = {
            (r.doc_id, r.cum_before)
            for r in mix_token_budget(spark, sf_dir).collect()
        }
        rows = duckdb.sql(
            f"select doc_id, source, len(string_split(text,' ')) as n "
            f"from '{sf_dir}/documents.parquet' order by source, doc_id"
        ).fetchall()
        want, cum = set(), {}
        for doc_id, source, n in rows:
            before = cum.get(source, 0)
            if before < MIX_TOKEN_BUDGET:
                want.add((doc_id, before))
            cum[source] = before + n
        assert got == want

    def test_quality_linear_decision_matches_score(self, spark, sf_dir):
        """keep must agree with the sigmoid score for every doc whose score
        is clear of the 0.5 boundary (the decision actually computed is
        z >= 0; score is sigmoid(z) ROUNDED to 6 dp, so a z marginally
        below 0 can round to exactly 0.500000 — r9 ADVICE — and such rows
        are decided by the z sign, not the rounded score). Keep rate must
        be a real split, not all-pass/all-fail."""
        from data_transform_spark.pipeline.curation import quality_linear

        rows = quality_linear(spark, sf_dir).collect()
        assert rows
        for r in rows:
            if abs(r.score - 0.5) > 5e-7:  # clear of the 6-dp rounding band
                assert r.keep == (r.score > 0.5), r
        kept = sum(r.keep for r in rows)
        assert 0 < kept < len(rows)


class TestPiiScrub:
    def test_known_pii_shapes_redacted_and_counted(self, spark, tmp_path):
        """r9 VERDICT #2 done-criterion: plant known PII shapes in
        synthetic rows and check redaction + per-type counts. Doc ids are
        chosen so the operator's own fixture-augmentation plants NOTHING
        (doc_id % 2, % 3, % 5 all nonzero) — every match below comes from
        the planted text."""
        import pandas as pd

        from data_transform_spark.pipeline.text import text_pii_scrub

        texts = {
            1: "reach alice.smith+test@mail-server.co.uk or (123) 456-7890 now",
            7: "hosts 192.168.1.100 and 8.8.8.8 rebooted cleanly",
            11: "no pii here just plain text",
            13: "not-an-email @ missing.domain and 1.2.3 partial version",
        }
        pdf = pd.DataFrame(
            {
                "doc_id": list(texts),
                "text": list(texts.values()),
                "lang": "en",
                "source": "synth",
                "n_chars": [len(t) for t in texts.values()],
            }
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        rows = {r.doc_id: r for r in text_pii_scrub(spark, str(tmp_path)).collect()}
        assert set(rows) == {1, 7, 11, 13}
        assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (1, 1, 0)
        assert (rows[7].n_emails, rows[7].n_phones, rows[7].n_ips) == (0, 0, 2)
        assert (rows[11].n_emails, rows[11].n_phones, rows[11].n_ips) == (0, 0, 0)
        # decoys: space-separated @, 3-octet fragment, version-ish dots
        assert (rows[13].n_emails, rows[13].n_phones, rows[13].n_ips) == (0, 0, 0)
        for r in rows.values():
            assert r.all_clean, r
        # untouched doc round-trips byte-identical (md5 of original text)
        import hashlib

        assert rows[11].clean_md5 == hashlib.md5(texts[11].encode()).hexdigest()
        assert rows[11].clean_len == len(texts[11])
        # redacted doc shrinks: spans were longer than their placeholders
        assert rows[1].clean_len < rows[1].planted_len


class TestQualityNb:
    def test_fitted_decision_beats_base_rate_on_heldout(self, spark, sf_dir):
        """r9 VERDICT #3 done-criterion: the in-plan-trained NB decision
        must beat the weak label's MAJORITY base rate on the held-out
        md5-split docs — i.e. the fit learned real word-count evidence,
        not a constant. (Measured 0.84-0.90 vs 0.59-0.62 across SFs.)"""
        import __spark_entry__  # noqa: F401
        from data_transform_spark.registry import QUERIES

        rows = QUERIES["quality_nb"](spark, sf_dir).collect()
        held = [r for r in rows if not r.is_train]
        assert held, "md5 split produced no held-out docs?"
        pos = sum(r.label for r in held) / len(held)
        base = max(pos, 1.0 - pos)
        acc = sum(r.correct for r in held) / len(held)
        assert acc > base + 0.05, f"acc {acc:.3f} vs base {base:.3f}"
        # decision consistency: pred == (logit_u >= 0), correct == (pred == label)
        for r in rows:
            assert r.pred == (r.logit_u >= 0)
            assert r.correct == (r.pred == r.label)

    def test_nb_weights_rank_marker_words_correctly(self, spark, sf_dir):
        """The fitted per-token log-odds must rank every positive marker
        word above every junk marker word — the weak label's keywords are
        exactly what the fit should rediscover from counts alone."""
        from pyspark.sql import functions as F

        from data_transform_spark.io import load_table
        from data_transform_spark.pipeline.curation import QNB_NEG, QNB_POS

        # replay the fit driver-side from the raw corpus (tiny vocab)
        import hashlib
        import math
        from collections import Counter

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        cp, cn = Counter(), Counter()
        np_ = nn_ = 0
        for r in docs:
            if hashlib.md5(str(r.doc_id).encode()).hexdigest()[0] >= "8":
                continue
            toks = r.text.split(" ")
            c = Counter(toks)
            pos = sum(c[w] for w in QNB_POS) > sum(c[w] for w in QNB_NEG)
            if pos:
                cp.update(toks)
                np_ += len(toks)
            else:
                cn.update(toks)
                nn_ += len(toks)
        v = len(set(cp) | set(cn))

        def wu(t):
            return round(
                (
                    math.log(cp[t] + 1)
                    - math.log(np_ + v)
                    - math.log(cn[t] + 1)
                    + math.log(nn_ + v)
                )
                * 1e6
            )

        assert min(wu(t) for t in QNB_POS) > max(wu(t) for t in QNB_NEG)


class TestSubstringIncremental:
    def test_incremental_equals_full_under_arrival_order(self, spark, sf_dir):
        """r9 VERDICT #6 done-criterion: incremental(batch | staged store)
        must equal the FULL substring-dedup pass over old+new under
        arrival order (history precedes the batch), restricted to the
        batch docs. Emulated by remapping batch doc_ids above every
        history id and running substring_clean on the remapped corpus."""
        import __spark_entry__  # noqa: F401
        from pyspark.sql import functions as F

        from data_transform_spark.io import load_table
        from data_transform_spark.pipeline.dedup import substring_clean
        from data_transform_spark.registry import QUERIES

        OFFSET = 10**12
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        remapped = d.withColumn(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 >= 8, F.col("doc_id") + OFFSET
            ).otherwise(F.col("doc_id")),
        )
        full = (
            substring_clean(remapped)
            .filter(F.col("doc_id") >= OFFSET)
            .select(
                (F.col("doc_id") - OFFSET).alias("doc_id"),
                "n_tokens",
                "n_removed",
                "clean_text",
            )
        )
        incr = QUERIES["text_substring_dedup_incr"](spark, sf_dir)
        got = sorted(map(tuple, incr.collect()))
        want = sorted(map(tuple, full.collect()))
        assert got == want

    def test_store_is_digest_only_and_serve_reads_it(self, spark, sf_dir):
        """The staged store holds ONLY 32-char md5 digests (never text),
        and the serve plan scans the staged parquet."""
        import contextlib
        import io

        import __spark_entry__  # noqa: F401
        from data_transform_spark.pipeline.dedup import (
            substring_stage_store,
        )
        from data_transform_spark.registry import QUERIES

        staged = substring_stage_store(spark, sf_dir)
        store = spark.read.parquet(staged)
        assert store.columns == ["g"]
        assert store.filter("length(g) != 32").count() == 0

        df = QUERIES["text_substring_dedup_incr"](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "substr_store_" in buf.getvalue()


class TestPrCurveAndManifest:
    def test_pr_curve_shape_and_calibration(self, spark, sf_dir):
        """Decile PR table invariants: buckets 1..10 cover the whole
        held-out set, recall is non-decreasing and hits 1.0 at bucket 10,
        bucket-10 precision equals the held-out base rate, and the top
        decile's precision strictly beats the base rate (the ranking
        carries real signal)."""
        import __spark_entry__  # noqa: F401
        from data_transform_spark.registry import QUERIES

        rows = sorted(
            QUERIES["quality_pr_curve"](spark, sf_dir).collect(),
            key=lambda r: r.bucket,
        )
        assert [r.bucket for r in rows] == list(range(1, 11))
        held = QUERIES["quality_nb"](spark, sf_dir).filter("not is_train")
        n_held = held.count()
        n_pos = held.filter("label").count()
        assert rows[-1].cum_docs == n_held == sum(r.n_docs for r in rows)
        assert rows[-1].cum_pos == n_pos
        assert rows[-1].recall_at == 1.0
        assert abs(rows[-1].precision_at - n_pos / n_held) < 1e-6
        recalls = [r.recall_at for r in rows]
        assert recalls == sorted(recalls)
        assert rows[0].precision_at > n_pos / n_held + 0.05

    def test_manifest_detects_any_edit_and_counts_duplicates(
        self, spark, tmp_path
    ):
        """corpus_manifest: editing ONE doc flips exactly its source's
        digest and the '*' digest (other sources untouched); an exact
        duplicate changes the digest too (duplicate-aware), while
        reordering rows never does (content-addressed)."""
        import pandas as pd

        from data_transform_spark.operators.etl import corpus_manifest

        def write(rows, sub):
            pdf = pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "lang": "en",
                    "source": [r[2] for r in rows],
                    "n_chars": [len(r[1]) for r in rows],
                }
            )
            p = tmp_path / sub
            spark.createDataFrame(pdf).write.mode("overwrite").parquet(
                f"{p}/documents.parquet"
            )
            return str(p)

        base = [(1, "alpha beta", "s1"), (2, "gamma delta", "s1"),
                (3, "epsilon zeta", "s2")]
        m0 = {r.source: r for r in corpus_manifest(spark, write(base, "a")).collect()}
        # reorder rows: identical manifest
        m1 = {r.source: r for r in corpus_manifest(
            spark, write(list(reversed(base)), "b")).collect()}
        assert {s: m.corpus_md5 for s, m in m0.items()} == {
            s: m.corpus_md5 for s, m in m1.items()
        }
        # edit one s1 doc: s1 and '*' flip, s2 unchanged
        edited = [(1, "alpha beta EDITED", "s1"), base[1], base[2]]
        m2 = {r.source: r for r in corpus_manifest(
            spark, write(edited, "c")).collect()}
        assert m2["s1"].corpus_md5 != m0["s1"].corpus_md5
        assert m2["*"].corpus_md5 != m0["*"].corpus_md5
        assert m2["s2"].corpus_md5 == m0["s2"].corpus_md5
        # exact duplicate: digest changes (duplicate-aware)
        duped = base + [(4, "alpha beta", "s1")]
        m3 = {r.source: r for r in corpus_manifest(
            spark, write(duped, "d")).collect()}
        assert m3["s1"].corpus_md5 != m0["s1"].corpus_md5
        assert m3["s1"].n_docs == 3


class TestStoreUpdateAndStreamScrub:
    def test_updated_store_equals_full_corpus_store(self, spark, sf_dir):
        """The post-increment store (v1 ∪ batch-novel) must hold EXACTLY
        the distinct window digests of the full corpus — the invariant
        that keeps every later increment correct."""
        import __spark_entry__  # noqa: F401
        from data_transform_spark.io import load_table
        from data_transform_spark.pipeline.dedup import (
            _substring_grams,
            substring_store_v2_dir,
        )
        from data_transform_spark.registry import QUERIES

        row = QUERIES["text_substring_store_update"](spark, sf_dir).collect()[0]
        assert row.n_total == row.n_hist + row.n_batch_novel
        upd = spark.read.parquet(substring_store_v2_dir(sf_dir))
        got = {r.g for r in upd.collect()}
        full = {
            r.g
            for r in _substring_grams(load_table(spark, sf_dir, "documents"))
            .select("g")
            .distinct()
            .collect()
        }
        assert got == full
        assert len(got) == row.n_total  # staged store is exactly distinct

    def test_stream_scrub_matches_batch_scrub(self, spark, sf_dir):
        """The streaming scrub must emit exactly the batch twin's rows
        (stateless map-only stage: append mode, no watermark, no state)."""
        import __spark_entry__  # noqa: F401
        from data_transform_spark.registry import QUERIES

        batch = {tuple(r) for r in QUERIES["text_pii_scrub"](spark, sf_dir).collect()}
        stream = {tuple(r) for r in QUERIES["stream_pii_scrub"](spark, sf_dir).collect()}
        assert stream == batch


class TestMinhashIncremental:
    def test_incremental_equals_full_restricted(self, spark, sf_dir):
        """dedup_minhash_incr must emit exactly the self-contained
        dedup_near_minhash pairs that involve at least one batch doc —
        same pair identities AND same exact-jaccard values (digest-set
        intersections equal shingle-set intersections)."""
        import __spark_entry__  # noqa: F401
        from data_transform_spark.registry import QUERIES

        full = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in QUERIES["dedup_near_minhash"](spark, sf_dir).collect()
            if not (r.doc_a % 10 < 8 and r.doc_b % 10 < 8)
        }
        incr = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in QUERIES["dedup_minhash_incr"](spark, sf_dir).collect()
        }
        assert incr == full

    def test_store_holds_bands_and_digests_only(self, spark, sf_dir):
        """The staged store is join keys + 32-char digests — no text."""
        import __spark_entry__  # noqa: F401
        from data_transform_spark.pipeline.dedup import minhash_stage_store

        staged = minhash_stage_store(spark, sf_dir)
        bands = spark.read.parquet(f"{staged}/bands")
        sh = spark.read.parquet(f"{staged}/shingles")
        assert sorted(bands.columns) == ["band", "bucket", "doc_id"]
        assert sorted(sh.columns) == ["doc_id", "sh"]
        assert sh.filter("length(sh) != 32").count() == 0


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64
    )
)
@settings(**PROP_SETTINGS)
def test_wav_codec_roundtrip_any_samples(samples):
    """encode_wav → decode_wav must be the identity for ANY mono int16
    clip (including extremes ±32767/-32768 and length-1 clips), and the
    byte length must be exactly 44 + 2n — the property the fixture-pinned
    audio oracle can't cover for arbitrary signals."""
    import numpy as np

    from data_transform_spark.pipeline.multimodal import (
        WAV_HEADER_BYTES,
        WAV_RATE,
        decode_wav,
        encode_wav,
    )

    clip = np.array(samples, dtype=np.int16)
    blob = encode_wav(clip)
    assert len(blob) == WAV_HEADER_BYTES + 2 * len(clip)
    out, rate = decode_wav(blob)
    assert rate == WAV_RATE
    assert np.array_equal(out, clip)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # daily count
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**PROP_SETTINGS)
def test_holt_integer_recursion_is_translation_equivariant(xs):
    """Adding a constant C to every observation must shift Holt's level
    by exactly C·1e6 and leave the trend unchanged — in EXACT integer
    arithmetic, because the update is affine with integer coefficients
    and round-half-up commutes with the +C·1e6 translation (the property
    a float implementation would violate in the last ulp)."""
    from data_transform_spark.operators.timeseries import (
        HOLT_ALPHA_NUM,
        HOLT_BETA_NUM,
    )

    def run(series):
        l = b = 0
        out = []
        for i, x in enumerate(series):
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
            out.append((l, b))
        return out

    base = [x for (x,) in xs]
    shifted = [x + 37 for x in base]
    for (l0, b0), (l1, b1) in zip(run(base), run(shifted)):
        assert l1 == l0 + 37_000_000
        assert b1 == b0


class TestWordPiece:
    def test_merge_table_matches_canonical_python_wordpiece(
        self, spark, sf_dir
    ):
        """The whole trainer — word counts, symbol counts, the integer
        micro-unit likelihood score, quantized-tie lexicographic breaks,
        '##'-mark merge semantics, greedy-leftmost fusing — must equal a
        from-the-paper python WordPiece on the live fixture; and the
        selection must genuinely differ from BPE's raw-frequency picks
        (measured: ZERO overlapping merges at any SF — if the two tables
        ever coincide the likelihood scoring is not doing anything)."""
        from collections import Counter

        import duckdb

        from data_transform_spark.pipeline.training import (
            WP_ROUNDS,
            WP_SCORE_SCALE,
        )
        from data_transform_spark.registry import QUERIES

        rows = duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet'"
        ).fetchall()
        wc = Counter(w for (t,) in rows for w in t.split(" ") if w)

        seqs = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wc}
        want = []
        for r in range(1, WP_ROUNDS + 1):
            pc, sc = Counter(), Counter()
            for w, cnt in wc.items():
                s = seqs[w]
                for sym in s:
                    sc[sym] += cnt
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += cnt
            if not pc:
                break
            best = None
            for (a, b), c in pc.items():
                score = c * WP_SCORE_SCALE // (sc[a] * sc[b])
                key = (-score, a, b)
                if best is None or key < best[0]:
                    best = (key, a, b, c, sc[a], sc[b], score)
            _, a, b, c, ca, cb, score = best
            merged = a + (b[2:] if b.startswith("##") else b)
            want.append((r, a, b, merged, c, ca, cb, score))
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out

        got = [
            (
                r.merge_round,
                r.pair_a,
                r.pair_b,
                r.merged,
                r.pair_count,
                r.count_a,
                r.count_b,
                r.score_u,
            )
            for r in QUERIES["vocab_wordpiece"](spark, sf_dir).collect()
        ]
        assert got == want

        # BPE divergence: replay raw-frequency BPE in python (cheap) and
        # require zero common (a, b) pairs modulo the '##' marks.
        bseqs = {w: list(w) for w in wc}
        bpe_pairs = set()
        for _r in range(WP_ROUNDS):
            pc = Counter()
            for w, s in bseqs.items():
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += wc[w]
            if not pc:
                break
            (a, b), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            bpe_pairs.add((a, b))
            for w, s in bseqs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                bseqs[w] = out
        wp_pairs = {(a, b.lstrip("#")) for _r, a, b, *_x in want}
        assert not (wp_pairs & bpe_pairs)

    def test_segmentation_round_trips_and_counts_match_gold(
        self, spark, sf_dir
    ):
        """Replaying the learned merges must never lose characters —
        stripping the '##' marks and concatenating a word's pieces
        reproduces the word — and per-doc token counts must equal the
        python replay's."""
        from pyspark.sql import functions as F

        from data_transform_spark.pipeline.training import (
            _bpe_words,
            _wp_seq0,
            _wp_train,
        )

        merges = _wp_train(spark, sf_dir)
        assert len(merges) > 0
        seq = _wp_seq0(F.col("word"))
        for _r, a, b, m, *_rest in merges:
            seq = F.replace(seq, F.lit(f" {a}  {b} "), F.lit(f" {m} "))
        enc = (
            _bpe_words(spark, sf_dir)
            .select("word", F.split(F.trim(seq), "  ").alias("pieces"))
            .collect()
        )
        for r in enc:
            assert r.pieces[0][:2] != "##"
            assert all(p.startswith("##") for p in r.pieces[1:])
            rebuilt = r.pieces[0] + "".join(p[2:] for p in r.pieces[1:])
            assert rebuilt == r.word


class TestWordPieceInference:
    def test_inference_diverges_from_replay_on_priority_override(
        self, spark, tmp_path_factory
    ):
        """The genuine replay-vs-inference divergence regime (zero on the
        driver fixture — pinned by the oracle's n_diverged_words column):
        a corpus engineered so merge priority forms ##bc BEFORE ab makes
        the trained state of 'abc' = [a ##bc], while longest-match-first
        inference takes the word-initial piece 'ab' first = [ab ##c].
        Token COUNTS tie (2 vs 2) — exactly why divergence must be
        detected on the segmentation STRING, not the counts."""
        import pandas as pd

        from pyspark.sql import functions as F

        from data_transform_spark.pipeline.training import (
            _bpe_words,
            _wp_infer_seq,
            _wp_seq0,
            _wp_train,
        )

        words = ["ab"] * 50 + ["xbc"] * 40 + ["abc"] * 5
        base = tmp_path_factory.mktemp("wp_infer_prop")
        pdf = pd.DataFrame(
            {
                "doc_id": [1],
                "text": [" ".join(words)],
                "lang": "en",
                "source": "synth",
                "n_chars": [len(" ".join(words))],
            }
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{base}/documents.parquet"
        )

        merges = _wp_train(spark, str(base), rounds=3)
        assert [(m[1], m[2]) for m in merges] == [
            ("##b", "##c"),
            ("x", "##bc"),
            ("a", "##b"),
        ]
        alpha = {"a", "x", "##b", "##c"}
        vocab = alpha | {m[3] for m in merges}
        unmarked = [p for p in vocab if not p.startswith("##")]
        bodies = [p[2:] for p in vocab if p.startswith("##")]
        replay = _wp_seq0(F.col("word"))
        for _r, a, b, m, *_rest in merges:
            replay = F.replace(replay, F.lit(f" {a}  {b} "), F.lit(f" {m} "))
        got = {
            r["word"]: (r["rseq"], r["iseq"])
            for r in _bpe_words(spark, str(base))
            .select(
                "word",
                replay.alias("rseq"),
                _wp_infer_seq(F.col("word"), unmarked, bodies).alias("iseq"),
            )
            .collect()
        }
        assert got["ab"] == (" ab ", " ab ")
        assert got["xbc"] == (" xbc ", " xbc ")
        assert got["abc"][0] == " a  ##bc "
        assert got["abc"][1] == " ab  ##c "
        assert got["abc"][0] != got["abc"][1]
