"""Decontamination tests (operators/decontam.py). Corpus-level value
parity vs DuckDB runs via test_oracle_parity (e9_decontamination)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.decontam import (
    decontaminate,
    ngram_contamination,
    token_ngrams,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_token_ngrams_values(spark):
    out = token_ngrams(_df(spark, [(1, "a b c d")]), "doc_id", "text", 3)
    assert {r.gram for r in out.collect()} == {"a b c", "b c d"}


def test_short_docs_have_no_grams(spark):
    out = token_ngrams(_df(spark, [(1, "a b"), (2, "")]), "doc_id", "text", 3)
    assert out.count() == 0


def test_containment_is_asymmetric(spark):
    # benchmark doc fully embedded in a much longer training doc:
    # containment = 1.0 even though Jaccard is small
    bench = _df(spark, [(100, "x y z w")])
    train = _df(spark, [(1, "a b c d e f g h x y z w p q r s t u v")])
    out = ngram_contamination(train, bench, n=3, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.train_id, r.bench_id, r.containment) == (1, 100, 1.0)
    assert r.matched == r.bench_n == 2


def test_threshold_filters(spark):
    bench = _df(spark, [(100, "x y z w v")])  # 3 distinct 3-grams
    train = _df(spark, [(1, "x y z only")])   # shares exactly 1
    assert (
        ngram_contamination(train, bench, n=3, threshold=0.5).count() == 0
    )
    got = ngram_contamination(train, bench, n=3, threshold=0.3).collect()
    assert [(r.matched, r.bench_n) for r in got] == [(1, 3)]


def test_decontaminate_drops_only_contaminated(spark):
    bench = _df(spark, [(100, "x y z w")])
    train = _df(spark, [(1, "x y z w tail"), (2, "totally unrelated words here")])
    kept = decontaminate(train, bench, n=3, threshold=0.9)
    assert [r.doc_id for r in kept.collect()] == [2]
    assert kept.columns == train.columns


def test_bloom_no_false_negatives(spark):
    # a Bloom filter NEVER misses a true member: a bench doc replayed as
    # training text must score hit_frac exactly 1.0 at any (m, k)
    from decision_tree_stuff_spark.operators.decontam import bloom_contamination

    bench = _df(spark, [(100, "x y z w v u t")])
    train = _df(spark, [(1, "x y z w v u t"), (2, "p q r s completely other")])
    out = bloom_contamination(train, bench, n=3, threshold=0.99, m=1 << 14, k=3)
    got = {r.doc_id: (r.n_grams, r.n_hit, r.hit_frac) for r in out.collect()}
    assert got[1] == (5, 5, 1.0)


def test_bloom_bitset_matches_python_reference(spark):
    # the collected words array == a pure-Python bloom over the same
    # md5/KM positions (independent reimplementation of the hashing)
    import hashlib

    from decision_tree_stuff_spark.operators.decontam import bloom_bitset

    m, k = 1 << 12, 3
    bench = _df(spark, [(1, "alpha beta gamma delta"), (2, "one two three")])
    got = bloom_bitset(bench, "doc_id", "text", 3, m=m, k=k)
    grams = {"alpha beta gamma", "beta gamma delta", "one two three"}
    ref = bytearray(m // 8)
    for g in grams:
        d = hashlib.md5(g.encode()).hexdigest()
        h1, h2 = int(d[:15], 16), int(d[16:31], 16)
        for i in range(k):
            p = (h1 + i * h2) % m
            ref[p >> 3] |= 1 << (p & 7)
    assert got == bytes(ref)


def test_bloom_decontaminate_keeps_short_and_clean_docs(spark):
    from decision_tree_stuff_spark.operators.decontam import bloom_decontaminate

    bench = _df(spark, [(100, "x y z w")])
    train = _df(
        spark,
        [(1, "x y z w"), (2, "unrelated totally other words"), (3, "a b")],
    )
    kept = bloom_decontaminate(train, bench, n=3, threshold=0.9)
    # doc 3 has no 3-grams -> can never flag; doc 1 fully leaks
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]
    assert kept.columns == train.columns


def test_max_df_drops_boilerplate_grams(spark):
    # the shared gram appears in > max_df training docs -> excluded
    bench = _df(spark, [(100, "x y z")])
    train = _df(spark, [(i, f"x y z doc{i}") for i in range(1, 6)])
    assert ngram_contamination(train, bench, n=3, threshold=0.5).count() == 5
    assert (
        ngram_contamination(train, bench, n=3, threshold=0.5, max_df=3).count()
        == 0
    )


def test_max_df_caps_bench_denominator_too(spark):
    # bench doc = 1 hot gram + 2 rare grams; a train doc leaks both
    # rare grams. With the hot gram excluded from bench_n as well,
    # containment = 2/2 = 1.0; a train-side-only cap would have
    # computed 2/3 and under-flagged the leak.
    bench = _df(spark, [(100, "x y z a b c d")])  # grams: xyz yza zab abc bcd
    hot_rows = [(i, f"x y z filler{i} pad{i}") for i in range(1, 6)]
    leak = [(50, "prefix words a b c d suffix")]  # carries abc bcd (+zab? no)
    train = _df(spark, hot_rows + leak)
    out = ngram_contamination(train, bench, n=3, threshold=0.9, max_df=3)
    got = {(r.train_id, r.bench_id): (r.matched, r.bench_n, r.containment)
           for r in out.collect()}
    # hot gram 'x y z' df=5 > 3 → dropped from both sides; bench
    # grams left: {y z a, z a b, a b c, b c d}; doc 50 matches
    # {a b c, b c d} → 2/4 = 0.5 < 0.9 → absent. Lower threshold:
    out2 = ngram_contamination(train, bench, n=3, threshold=0.5, max_df=3)
    got2 = {(r.train_id, r.bench_id): (r.matched, r.bench_n)
            for r in out2.collect()}
    assert got == {}
    assert got2 == {(50, 100): (2, 4)}


def test_embedding_decontam_flags_planted_leak(spark):
    from decision_tree_stuff_spark.operators.decontam import (
        embedding_decontamination,
    )

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (7, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0]),    # ~bench 0: leak
            (2, [0.0, 0.0, 1.0]),      # orthogonal to both
            (3, [0.0, -1.0, 0.0]),     # anti-parallel: cos = -1
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in embedding_decontamination(
            corpus, bench, threshold=0.95
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["bench_id"] == 0
    assert not out[2]["contaminated"] and out[2]["max_bench_cos"] == 0.0
    assert not out[3]["contaminated"] and out[3]["max_bench_cos"] == 0.0
    # ties break to the LOWEST bench id: equidistant from both
    tied = spark.createDataFrame(
        [(9, [1.0, 1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    r = embedding_decontamination(tied, bench, threshold=0.99).first()
    assert r["bench_id"] == 0 and not r["contaminated"]


def test_embedding_decontam_scores_every_corpus_row(spark):
    from decision_tree_stuff_spark.operators.decontam import (
        embedding_decontamination,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.where("vec_id % 7 <> 0")
    out = embedding_decontamination(
        corpus, emb.where("vec_id % 7 = 0"), threshold=0.8
    )
    assert out.count() == corpus.count()
    assert out.where(F.col("max_bench_cos").isNull()).count() == 0


def test_embedding_decontam_degenerate_inputs_keep_rows(spark):
    """r9 advice: an empty benchmark set or a zero-norm corpus vector
    must KEEP the corpus row with contaminated = false (null score),
    matching the IVF variant's contract — not drop it / flag null."""
    from decision_tree_stuff_spark.operators.decontam import (
        embedding_decontamination,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    empty_bench = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in embedding_decontamination(
            corpus, empty_bench, threshold=0.5, exact=True
        ).collect()
    }
    assert set(out) == {1, 2}
    assert all(
        r["contaminated"] is False and r["max_bench_cos"] is None
        for r in out.values()
    )
    # zero-norm corpus row against a real bench: kept, flag false
    bench = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    out2 = {
        r["vec_id"]: r
        for r in embedding_decontamination(
            corpus, bench, threshold=0.5, exact=True
        ).collect()
    }
    assert out2[1]["contaminated"] is True
    assert out2[2]["contaminated"] is False
    assert out2[2]["max_bench_cos"] is None


def test_embedding_decontam_auto_routes_to_ivf(spark):
    """r9 verdict task 3: the naive caller gets the scale path —
    exact=None with |bench| above the bound must produce exactly the
    IVF operator's frame; exact=True stays brute-force."""
    from decision_tree_stuff_spark.operators.decontam import (
        embedding_decontamination,
        embedding_decontamination_ivf,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus, bench = emb.where("vec_id % 7 <> 0"), emb.where("vec_id % 7 = 0")
    kw = dict(threshold=0.8, n_centroids=16, nprobe=2)
    auto = embedding_decontamination(
        corpus, bench, ivf_bench_bound=0, **kw
    )
    want = embedding_decontamination_ivf(corpus, bench, **kw)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(auto) == rows(want)
    # below the bound: auto == exact path
    exact = embedding_decontamination(corpus, bench, threshold=0.8, exact=True)
    auto_small = embedding_decontamination(
        corpus, bench, threshold=0.8, ivf_bench_bound=10_000
    )
    assert rows(auto_small) == rows(exact)


def test_contamination_spans_locates_the_leak(spark):
    from decision_tree_stuff_spark.operators.decontam import (
        contamination_spans,
    )

    bench = _df(spark, [(70, "the quick brown fox jumps")])
    # train doc 1: the benchmark sentence verbatim at tokens 4..8,
    # surrounded by noise; doc 2: unrelated
    train = _df(
        spark,
        [
            (1, "alpha beta gamma the quick brown fox jumps delta"),
            (2, "nothing to see here at all folks"),
        ],
    )
    out = contamination_spans(train, bench, n=3, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["train_id"], r["bench_id"]) == (1, 70)
    # grams (3-grams of the 5-token leak) start at tokens 4,5,6 and
    # merge into ONE span covering tokens 4..8
    assert (r["start_tok"], r["end_tok"], r["span_tokens"]) == (4, 8, 5)


def test_contamination_spans_merges_adjacent_but_not_gapped(spark):
    from decision_tree_stuff_spark.operators.decontam import (
        contamination_spans,
    )

    bench = _df(spark, [(70, "aa bb cc dd ee ff")])
    # two disjoint leaks separated by a 2-token gap -> two spans
    train = _df(spark, [(1, "aa bb cc xx yy dd ee ff zz")])
    out = sorted(
        (r["start_tok"], r["end_tok"])
        for r in contamination_spans(
            train, bench, n=3, threshold=0.3
        ).collect()
    )
    assert out == [(1, 3), (6, 8)]


def test_contamination_spans_empty_below_threshold(spark):
    from decision_tree_stuff_spark.operators.decontam import (
        contamination_spans,
    )

    bench = _df(spark, [(70, "one two three four five six seven eight")])
    train = _df(spark, [(1, "one two three unrelated words here")])
    # 1 of 6 bench grams matched = 0.1667 < 0.5 threshold
    assert (
        contamination_spans(train, bench, n=3, threshold=0.5).count() == 0
    )


def test_token_ngram_positions_keeps_repeats(spark):
    from decision_tree_stuff_spark.operators.decontam import (
        token_ngram_positions,
    )

    df = _df(spark, [(1, "x y x y x")])
    got = sorted(
        (r["pos"], r["gram"])
        for r in token_ngram_positions(df, "doc_id", "text", 2).collect()
    )
    assert got == [(1, "x y"), (2, "y x"), (3, "x y"), (4, "y x")]


def test_ivf_decontam_catches_identical_and_bounds_recall(spark):
    """An identical embedding shares the exact argmax cell — the IVF
    staging can never miss it; and on real testdata every IVF flag
    must be a subset of the exact operator's flags with the same
    scores where present (pruning only removes candidates)."""
    from decision_tree_stuff_spark.operators.decontam import (
        embedding_decontamination,
        embedding_decontamination_ivf,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus, bench = emb.where("vec_id % 7 <> 0"), emb.where("vec_id % 7 = 0")
    exact = {
        r["vec_id"]: r
        for r in embedding_decontamination(
            corpus, bench, threshold=0.8
        ).collect()
    }
    approx = {
        r["vec_id"]: r
        for r in embedding_decontamination_ivf(
            corpus, bench, threshold=0.8, n_centroids=16, nprobe=2
        ).collect()
    }
    assert approx.keys() == exact.keys()  # every corpus row scored
    for vid, a in approx.items():
        e = exact[vid]
        if a["max_bench_cos"] is not None:
            # a candidate the IVF saw can never beat the exact max
            assert a["max_bench_cos"] <= e["max_bench_cos"], vid
        if a["contaminated"]:
            assert e["contaminated"], vid
    # planted identical vector: corpus clone of a bench embedding
    brow = bench.orderBy("vec_id").first()
    clone = spark.createDataFrame(
        [(999_999, list(brow["embedding"]))],
        "vec_id bigint, embedding array<double>",
    )
    got = embedding_decontamination_ivf(
        corpus.select("vec_id", "embedding").unionByName(clone),
        bench, threshold=0.99, n_centroids=16, nprobe=1,
    ).where(F.col("vec_id") == 999_999).first()
    assert got["contaminated"] and got["bench_id"] == brow["vec_id"]


def test_bloom_stats_matches_python_reference(spark):
    """r12 saturation card: exact distinct-position count and the
    (f*f)*f FPR chain vs a hashlib reference on a tiny benchmark with
    forced position collisions (small m)."""
    import hashlib

    from decision_tree_stuff_spark.operators.decontam import bloom_stats

    bench = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e"), (3, "a b c d")],
        "doc_id bigint, text string",
    )
    m, k, n = 64, 3, 3
    r = bloom_stats(bench, n=n, m=m, k=k).first()

    grams = set()
    for _, text in [(1, "a b c d"), (2, "b c d e"), (3, "a b c d")]:
        toks = text.split()
        for i in range(len(toks) - n + 1):
            grams.add(" ".join(toks[i:i + n]))
    pos = set()
    for g in grams:
        d = hashlib.md5(g.encode()).hexdigest()
        h1, h2 = int(d[:15], 16), int(d[16:31], 16)
        for i in range(k):
            pos.add((h1 + i * h2) % m)
    fill = len(pos) / m
    assert (r["m_bits"], r["k"]) == (m, k)
    assert r["n_grams"] == len(grams) == 3
    assert r["n_set"] == len(pos)
    assert r["fill_ratio"] == round(fill, 6)
    assert r["expected_fpr"] == round((fill * fill) * fill, 6)
    assert r["n_set"] <= min(k * r["n_grams"], m)
