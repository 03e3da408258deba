"""Unit tests for the curation operators (repetition gate, PII redaction,
decontamination, splits/mixture, intervals/SCD2, z-score gate) — edge
cases the DuckDB oracle suite doesn't reach (degenerate groups, hand-built
frames, determinism under repartitioning)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pandas_etl_spark.functions.dedup import ngram_decontaminate
from pandas_etl_spark.functions.text import (
    pii_match_count,
    redact_pii,
    repetition_stats,
)
from pandas_etl_spark.operators.intervals import merge_intervals, scd2_history
from pandas_etl_spark.operators.quality import zscore_outliers
from pandas_etl_spark.operators.sampling import dataset_split, mixture_sample


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


class TestRepetitionStats:
    def test_repetitive_vs_clean(self, spark):
        df = spark.createDataFrame(
            [
                (1, "spam spam spam spam spam"),
                (2, "one two three four five six seven"),
                (3, "solo"),
            ],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert rows[1]["top_word_frac"] == 1.0
        assert rows[1]["dup_2gram_frac"] == 0.75  # 4 bigrams, 1 distinct
        assert rows[1]["repetitive"]
        assert not rows[2]["repetitive"]
        assert rows[2]["dup_2gram_frac"] == 0.0
        # single-token doc: no n-grams, fractions 0, no div-by-zero
        assert rows[3]["n_tokens"] == 1
        assert rows[3]["dup_2gram_frac"] == 0.0
        assert rows[3]["top_word_frac"] == 1.0


class TestPiiRedact:
    def test_email_and_numbers(self, spark):
        df = spark.createDataFrame(
            [(1, "contact jane.doe+x@example.co.uk or call 555 1234")],
            ["id", "text"],
        )
        r = df.select(
            redact_pii("text").alias("red"),
            pii_match_count("text").alias("n"),
        ).first()
        assert "@" not in r["red"]
        assert "555" not in r["red"]
        assert r["red"].count("[REDACTED]") == 3
        assert r["n"] == 3

    def test_no_pii_passthrough(self, spark):
        df = spark.createDataFrame([(1, "nothing here")], ["id", "text"])
        r = df.select(redact_pii("text").alias("red"), pii_match_count("text").alias("n")).first()
        assert r["red"] == "nothing here"
        assert r["n"] == 0


class TestDecontaminate:
    def test_overlap_flags(self, spark):
        train = spark.createDataFrame(
            [
                (1, "a b c d e f g"),        # shares 5-grams with eval doc
                (2, "p q r s t u v"),        # disjoint
            ],
            ["doc_id", "text"],
        )
        ev = spark.createDataFrame([(10, "a b c d e f")], ["doc_id", "text"])
        rows = {r["doc_id"]: r for r in ngram_decontaminate(train, ev).collect()}
        # eval doc has 5-grams {a..e, b..f}; train doc 1 contains both
        assert rows[1]["contaminated"] and rows[1]["n_shared_ngrams"] == 2
        assert not rows[2]["contaminated"] and rows[2]["n_shared_ngrams"] == 0

    def test_short_docs_no_grams(self, spark):
        train = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        ev = spark.createDataFrame([(10, "a b")], ["doc_id", "text"])
        r = ngram_decontaminate(train, ev).first()
        assert not r["contaminated"]


class TestSplits:
    def test_split_stable_under_repartition(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = dataset_split(docs, "doc_id").select("doc_id", "split")
        b = dataset_split(docs.repartition(13), "doc_id").select("doc_id", "split")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        counts = dict(a.groupBy("split").count().collect())
        n = sum(counts.values())
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] / n > 0.7  # ~0.8 with hash noise

    def test_mixture_respects_targets(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        targets = {"en": 0.25, "de": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.15}
        kept = mixture_sample(docs, "doc_id", "lang", targets)
        orig = dict(docs.groupBy("lang").count().collect())
        new = dict(kept.groupBy("lang").count().collect())
        # never up-samples, never exceeds the stratum
        for lang, n in new.items():
            assert n <= orig[lang]
        # over-represented stratum (en ≈ 39% observed) is cut hard
        assert new["en"] < orig["en"]
        # under-represented strata keep everything (w·N/n ≥ 1)
        assert new["de"] == orig["de"]

    def test_shuffle_shards_stable_and_complete(self, spark, sf_dir):
        """shuffle_shards: (shard, shard_pos) is a function of
        (seed, key) only — invariant under repartitioning; positions
        are exactly 1..n per shard; a seed change permutes."""
        from pandas_etl_spark.operators.sampling import shuffle_shards

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = shuffle_shards(docs, "doc_id", n_shards=4, seed=7).select(
            "doc_id", "shard", "shard_pos"
        )
        b = shuffle_shards(docs.repartition(13), "doc_id", n_shards=4, seed=7).select(
            "doc_id", "shard", "shard_pos"
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # dense 1..n positions within every shard
        per = a.groupBy("shard").agg(
            F.count("*").alias("n"),
            F.min("shard_pos").alias("lo"),
            F.max("shard_pos").alias("hi"),
            F.countDistinct("shard_pos").alias("d"),
        )
        for r in per.collect():
            assert (r.lo, r.hi, r.d) == (1, r.n, r.n), r
        # different seed ⇒ different permutation (overwhelmingly)
        c = shuffle_shards(docs, "doc_id", n_shards=4, seed=8).select(
            "doc_id", "shard", "shard_pos"
        )
        assert a.exceptAll(c).count() > 0

    def test_mixture_drops_unlisted_strata(self, spark):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "b") for i in range(100)], ["id", "s"]
        )
        kept = mixture_sample(df, "id", "s", {"a": 1.0})
        assert kept.filter(F.col("s") == "b").count() == 0
        assert kept.count() == 50


class TestIntervals:
    def test_merge_touching_and_gap(self, spark):
        df = spark.createDataFrame(
            [
                (1, 1, _ts(0), _ts(10)),
                (1, 2, _ts(10), _ts(20)),   # touches -> merges
                (1, 3, _ts(5), _ts(8)),     # contained
                (1, 4, _ts(30), _ts(40)),   # gap -> new island
                (2, 5, _ts(0), _ts(1)),
            ],
            ["k", "i", "s", "e"],
        )
        out = {
            (r["k"], r["island"]): r
            for r in merge_intervals(df, "k", "s", "e", "i").collect()
        }
        assert len(out) == 3
        one = out[(1, 1)]
        assert one["island_start"] == _ts(0) and one["island_end"] == _ts(20)
        assert one["n_intervals"] == 3
        assert out[(1, 2)]["island_start"] == _ts(30)
        assert out[(2, 1)]["n_intervals"] == 1

    def test_scd2_runs_and_validity(self, spark):
        df = spark.createDataFrame(
            [
                (1, 1, _ts(0), "A"),
                (1, 2, _ts(1), "A"),
                (1, 3, _ts(2), "B"),
                (1, 4, _ts(3), "A"),
            ],
            ["k", "i", "ts", "attr"],
        )
        hist = scd2_history(df, "k", "attr", "ts", "i").orderBy("version").collect()
        assert [r["attr"] for r in hist] == ["A", "B", "A"]
        assert [r["n_events"] for r in hist] == [2, 1, 1]
        assert hist[0]["valid_from"] == _ts(0)
        assert hist[0]["valid_to"] == _ts(2) == hist[1]["valid_from"]
        assert hist[2]["valid_to"] is None and hist[2]["is_current"]
        assert not hist[0]["is_current"]


class TestZscore:
    def test_degenerate_groups_null_z(self, spark):
        df = spark.createDataFrame(
            [
                ("g1", 1, 1.0), ("g1", 2, 1.0), ("g1", 3, 1.0),  # zero variance
                ("g2", 4, 5.0),                                   # n = 1
                ("g3", 5, 0.0), ("g3", 6, 10.0),
            ],
            ["g", "id", "v"],
        )
        rows = {r["id"]: r for r in zscore_outliers(df, "v", ["g"], ["id"]).collect()}
        for i in (1, 2, 3, 4):
            assert rows[i]["z"] is None and not rows[i]["is_outlier"]
        assert rows[5]["z"] is not None and abs(rows[5]["z"] + 0.707107) < 1e-6

    def test_flags_outlier(self, spark):
        data = [("g", i, 0.0) for i in range(1, 40)] + [("g", 99, 100.0)]
        df = spark.createDataFrame(data, ["g", "id", "v"])
        rows = {r["id"]: r for r in zscore_outliers(df, "v", ["g"], ["id"]).collect()}
        assert rows[99]["is_outlier"]
        assert not rows[1]["is_outlier"]


class TestWinsorize:
    def test_clip_bounds(self, spark):
        from pandas_etl_spark.operators.quality import winsorize

        data = [("g", i, float(i)) for i in range(1, 101)]
        df = spark.createDataFrame(data, ["g", "id", "v"])
        rows = {
            r["id"]: r
            for r in winsorize(df, "v", ["g"], ["id"], 0.05, 0.95).collect()
        }
        # p05 of 1..100 (interpolated) = 5.95, p95 = 95.05
        assert rows[1]["clipped"] == 5.95 and rows[1]["was_clipped"]
        assert rows[100]["clipped"] == 95.05 and rows[100]["was_clipped"]
        assert rows[50]["clipped"] == 50.0 and not rows[50]["was_clipped"]


class TestGlobalRunningSum:
    def test_matches_single_partition_window(self, spark):
        from pyspark.sql import Window as W

        from pandas_etl_spark.operators.prefix import global_running_sum

        df = spark.createDataFrame(
            [(i, float((i * 37) % 100), (i % 7) + 1) for i in range(500)],
            ["id", "score", "tokens"],
        ).repartition(11)
        order = [F.desc("score"), F.asc("id")]
        got = global_running_sum(df, order, "tokens", "cum", num_partitions=8)
        w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        want = df.withColumn("cum", F.sum("tokens").over(w))
        assert got.select("id", "cum").exceptAll(want.select("id", "cum")).count() == 0
        assert want.select("id", "cum").exceptAll(got.select("id", "cum")).count() == 0

    def test_empty_input(self, spark):
        from pandas_etl_spark.operators.prefix import global_running_sum

        df = spark.createDataFrame([], "id INT, v INT")
        out = global_running_sum(df, [F.asc("id")], "v", "cum")
        assert out.count() == 0 and "cum" in out.columns


class TestGroupedExtensions:
    def test_transform_preserves_rows(self, spark):
        from pandas_etl_spark.pandas_ops import Table

        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 30.0), ("b", 3, 5.0)], ["g", "id", "v"]
        )
        out = Table(df).groupby("g").transform("mean", "v").df
        rows = {r["id"]: r["v_mean"] for r in out.collect()}
        assert rows == {1: 20.0, 2: 20.0, 3: 5.0}

    def test_idxmax_ties_pick_smallest_id(self, spark):
        from pandas_etl_spark.pandas_ops import Table

        df = spark.createDataFrame(
            [("a", 2, 9.0), ("a", 1, 9.0), ("a", 3, 1.0), ("b", 7, 0.0)],
            ["g", "id", "v"],
        )
        got = {
            r["g"]: r["v_idxmax"]
            for r in Table(df).groupby("g").idxmax("v", "id").df.collect()
        }
        assert got == {"a": 1, "b": 7}
        low = {
            r["g"]: r["v_idxmin"]
            for r in Table(df).groupby("g").idxmin("v", "id").df.collect()
        }
        assert low == {"a": 3, "b": 7}

    def test_clip_bounds_and_nulls(self, spark):
        from pandas_etl_spark.pandas_ops import Table

        df = spark.createDataFrame(
            [(1, -5.0, "x"), (2, 50.0, "y"), (3, None, "z")], ["id", "v", "s"]
        )
        out = {r["id"]: r["v"] for r in Table(df).clip(0.0, 10.0, subset=["v"]).df.collect()}
        assert out == {1: 0.0, 2: 10.0, 3: None}
        # string column untouched even without subset
        out2 = Table(df).clip(lower=0.0).df
        assert dict(out2.dtypes)["s"] == "string"


def test_bpe_checked_twin_matches_production(spark, sf_dir):
    """The relational bpe_merges_checked twin must reproduce the
    heap-based production learn_bpe_merges EXACTLY at the same
    parameters (top-200 words, 8 merges, min pair freq 2) — same
    overlapping pair counts, same (pf desc, lexicographic) tie-break,
    same greedy leftmost rewrite — proving the fixed-round relational
    formulation is the production algorithm, not an approximation."""
    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.functions.text import learn_bpe_merges
    from pandas_etl_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    prod = learn_bpe_merges(d, "text", num_merges=8, max_words=200)
    twin = [
        (r["lhs"], r["rhs"], r["pair_freq"])
        for r in QUERIES["bpe_merges_checked"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]
    assert twin == [(l, r, pf) for l, r, pf in prod]


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """learn_bpe_merges ≡ a direct dict-based Sennrich-style reference
    (same cap, same freq-desc/lexicographic tie rules, same greedy
    left-to-right merge application)."""
    import collections
    import re

    from pandas_etl_spark.functions.text import learn_bpe_merges

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = learn_bpe_merges(d, "text", num_merges=8, max_words=2000)

    freq = collections.Counter()
    for (text,) in d.select("text").collect():
        for w in re.split(r"\s+", text.strip().lower()):
            if w:
                freq[w] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:2000]
    words = [(list(w), f) for w, f in top if w]

    exp = []
    for _ in range(8):
        pairs = collections.Counter()
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), pf = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if pf < 2:
            break
        exp.append((l, r, pf))
        new_words = []
        for syms, f in words:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_words.append((out, f))
        words = new_words
    assert got == exp


def test_bpe_encode_roundtrip_and_merges_applied(spark, sf_dir):
    """bpe_encode: tokens concatenate back to the normalized words
    (lossless segmentation), and the top learned merge actually appears
    fused in the output wherever its pair occurred."""
    from pandas_etl_spark.functions.text import bpe_encode, learn_bpe_merges

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = learn_bpe_merges(d, "text", num_merges=8, max_words=2000)
    assert merges, "corpus should yield at least one merge"
    enc = bpe_encode(d, merges, "text").select("text", "bpe_tokens").collect()

    import re

    top = merges[0][0] + merges[0][1]
    saw_fused = False
    for row in enc:
        words = [w for w in re.split(r"\s+", row.text.strip().lower()) if w]
        assert "".join(row.bpe_tokens) == "".join(words)
        saw_fused = saw_fused or top in row.bpe_tokens
    assert saw_fused, f"top merge {top!r} never appeared fused"


def test_bpe_200_merges_match_reference_and_run_constant_jobs(spark, sf_dir):
    """VERDICT r4 #7: the merge loop is driver-side over the bounded
    word table — (a) the lazy-heap incremental trainer produces the
    EXACT merge sequence of the naive recount reference at
    num_merges=200, and (b) the whole learn launches a constant number
    of Spark jobs (the corpus pass), not 2 jobs per merge."""
    import collections
    import re

    from pandas_etl_spark.functions.text import learn_bpe_merges

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    group = "bpe-jobcount"
    sc = spark.sparkContext
    sc.setJobGroup(group, "bpe learn", False)
    try:
        got = learn_bpe_merges(d, "text", num_merges=200, max_words=2000)
    finally:
        sc.setJobGroup("", "", False)
    job_ids = sc.statusTracker().getJobIdsForGroup(group)
    assert len(job_ids) <= 5, f"per-merge jobs leaked: {len(job_ids)} jobs"
    assert len(got) > 50, "fixture corpus should sustain >50 merges"

    freq = collections.Counter()
    for (text,) in d.select("text").collect():
        for w in re.split(r"\s+", text.strip().lower()):
            if w:
                freq[w] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:2000]
    words = [(list(w), f) for w, f in top if w]
    exp = []
    for _ in range(200):
        pairs = collections.Counter()
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), pf = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if pf < 2:
            break
        exp.append((l, r, pf))
        new_words = []
        for syms, f in words:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_words.append((out, f))
        words = new_words
    assert got == exp


def test_temperature_sample_flattens_mixture(spark):
    """alpha=0 gives uniform target weights (tail stratum kept fully,
    head stratum cut hardest); alpha=1 reproduces the input mixture
    (keep_frac=1 everywhere, nothing dropped); in between the
    head/tail keep ratio is monotone in alpha."""
    from pandas_etl_spark.operators.sampling import temperature_sample

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    # alpha=1: w_s = p_s, keep_frac = 1 for every stratum
    full = temperature_sample(df, "doc_id", "source", alpha=1.0)
    assert full.count() == 1000

    # alpha=0: uniform weights 1/2; head keep_frac = 0.5*1000/900,
    # tail keep_frac = min(1, 0.5*1000/100) = 1 -> all of the tail stays
    flat = temperature_sample(df, "doc_id", "source", alpha=0.0)
    by = {r["source"]: r["n"] for r in
          flat.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by["tail"] == 100
    assert 450 <= by["head"] <= 650  # md5-bucket sample of keep_frac≈0.556

    # determinism: same call -> identical membership
    a = {r["doc_id"] for r in flat.collect()}
    b = {r["doc_id"] for r in
         temperature_sample(df, "doc_id", "source", alpha=0.0).collect()}
    assert a == b


def test_decontaminate_spans_cuts_only_eval_text(spark):
    """Span decontamination cuts verbatim eval 8-token runs from train
    docs but must NOT fire on train-train shared text (no in-batch
    ownership — that's span dedup's job, not decontamination's)."""
    from pandas_etl_spark.functions.text import (
        _span_rewrite,
        _span_windows,
        corpus_span_grams,
    )

    leak = "e1 e2 e3 e4 e5 e6 e7 e8"
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    ev = spark.createDataFrame([(0, f"intro {leak} outro")], "doc_id long, text string")
    train = spark.createDataFrame(
        [
            (10, f"t1 {leak} t2"),       # contaminated -> leak cut
            (11, f"{shared} a1"),        # train-train shared: BOTH keep it
            (12, f"b1 {shared}"),
        ],
        "doc_id long, text string",
    )
    d, w = _span_windows(train, "text", "doc_id", 8)
    hit = w.join(corpus_span_grams(ev, "text", 8), "gh", "left_semi").select("id", "pos")
    got = {r["id"]: r["text_dedup"] for r in _span_rewrite(d, hit, 8).collect()}
    assert got[10] == "t1 t2"
    assert got[11] == f"{shared} a1"
    assert got[12] == f"b1 {shared}"


def test_minhash_source_signature_tracks_exact_jaccard(spark, sf_dir):
    """The 64-perm MinHash source signatures must estimate the exact
    gram Jaccard within the standard MinHash error (s.e. =
    sqrt(J(1-J)/64) <= 1/16; we allow 4 s.e. = 0.25 absolute and also
    check the aggregate bias is small). Mergeability: the min is per
    permutation, so shard-wise signatures fold — spot-checked by
    splitting one source and element-wise-min'ing the halves."""
    from pandas_etl_spark.catalog import QUERIES

    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in QUERIES["minhash_source_signature"](spark, sf_dir).collect()
    }
    exact = {
        (r["source_a"], r["source_b"]): r["gram_jaccard"]
        for r in QUERIES["source_overlap_jaccard"](spark, sf_dir).collect()
    }
    assert est, "no source pairs"
    errs = []
    for pair, e in est.items():
        x = exact.get(pair, 0.0)  # exact emits only shared>0 pairs
        assert abs(e - x) <= 0.25, (pair, e, x)
        errs.append(e - x)
    assert abs(sum(errs) / len(errs)) <= 0.05  # unbiased on average

    # mergeability: signature(all) == elementwise-min(sig(half1), sig(half2))
    from pyspark.sql import functions as F

    from pandas_etl_spark.functions.text import tokens, word_ngrams
    from pandas_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")  # whole corpus: both
    # halves are guaranteed non-empty (a tiny filtered source at the
    # smallest SF can have an empty half, where min() is NULL)
    def sig_of(df):
        g = (
            df.select(tokens("text").alias("t"))
            .select(F.explode(F.array_distinct(word_ngrams("t", 5))).alias("gram"))
            .distinct()
        )
        row = g.agg(
            F.array(*[F.min(F.xxhash64("gram", F.lit(i))) for i in range(64)]).alias("s")
        ).collect()[0]
        return row["s"]

    full = sig_of(docs)
    h1 = sig_of(docs.filter(F.col("doc_id") % 2 == 0))
    h2 = sig_of(docs.filter(F.col("doc_id") % 2 == 1))
    merged = [min(a, b) for a, b in zip(h1, h2)]
    assert merged == list(full)


def test_compression_ratio_flags_repetition(spark):
    """Repetitive text must compress well below varied prose, empties
    get ratio 1.0, and the UDF is deterministic across runs."""
    from pandas_etl_spark.functions.text import compression_ratio

    rows = [
        (1, "spam " * 200),
        (2, "the quick brown fox jumps over one lazy dog while seventeen "
            "violet zeppelins quietly argued about rhubarb economics and "
            "jagged xylophone brackets near the frozen quay"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["compression_ratio"] < 0.1  # pure repetition
    assert got[2]["compression_ratio"] > 0.5  # varied prose
    assert got[1]["repetitive"] and not got[2]["repetitive"]
    assert got[3]["compression_ratio"] == 1.0
    again = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in again.items()
    }
