"""Property-based differential test for the blocked token-Jaccard
dedup: the DataFrame join program must equal brute-force Python set
math on random corpora (catches join/blocking/size-accounting bugs
the fixed synthetic corpus can't)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from decision_tree_stuff_spark.operators.dedup import ngram_jaccard_pairs

WORDS = ["spark", "join", "scan", "hash", "sort", "agg", "row", "col"]


@st.composite
def corpora(draw):
    n = draw(st.integers(3, 10))
    docs = []
    for i in range(n):
        k = draw(st.integers(1, 8))
        words = [draw(st.sampled_from(WORDS)) for _ in range(k)]
        lang = draw(st.sampled_from(["en", "fr"]))
        docs.append((i, " ".join(words), lang))
    return docs


def py_jaccard_pairs(docs, threshold):
    out = {}
    toks = {i: set(t.split()) for i, t, _ in docs}
    lang = {i: g for i, _, g in docs}
    for (a, _, _), (b, _, _) in itertools.combinations(docs, 2):
        if lang[a] != lang[b]:
            continue
        inter = len(toks[a] & toks[b])
        if inter == 0:
            continue
        j = round(inter / len(toks[a] | toks[b]), 6)
        if j >= threshold:
            out[(a, b)] = j
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=corpora(),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
    prefix_filter=st.booleans(),
)
def test_jaccard_pairs_match_brute_force(spark, docs, threshold, prefix_filter):
    """Both the PPJoin prefix plan (default) and the naive self-join
    baseline must equal brute-force Python set math — this is the
    exactness proof-by-testing for the prefix filter."""
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, block_cols=["lang"], threshold=threshold,
            prefix_filter=prefix_filter,
        ).collect()
    }
    want = py_jaccard_pairs(docs, threshold)
    assert got == want, f"\ndocs={docs}\ngot={got}\nwant={want}"


def test_max_df_cap_kills_hot_token_pairs(spark):
    """Every doc shares one hot token; without the cap that token alone
    forms C(n,2) candidate pairs (threshold=0 surfaces them all). With
    the cap the hot token never enters the join, while a genuinely
    near-dup pair sharing rare tokens still comes out."""
    n = 40
    rows = [(i, f"the unique{i}", "en") for i in range(n)]
    # one true near-dup pair on rare tokens (ids n, n+1)
    rows += [(n, "rare alpha beta gamma", "en"), (n + 1, "rare alpha beta delta", "en")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    uncapped = ngram_jaccard_pairs(df, block_cols=["lang"], threshold=0.0)
    capped = ngram_jaccard_pairs(df, block_cols=["lang"], threshold=0.0, max_df=10)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    # hot token 'the' joins all 40 docs pairwise: >= C(40,2) candidates
    assert n_uncapped >= n * (n - 1) // 2
    # cap drops 'the' (df=41 > 10); only rare-token pairs remain
    assert n_capped < n_uncapped / 100
    survivors = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    assert (n, n + 1) in survivors
    # jaccard over capped sets: |{rare,alpha,beta}∩{...}|=3, |∪|=5
    assert survivors[(n, n + 1)] == 0.6


def test_minhash_md5_family_matches_xxhash_on_exact_dups(spark):
    """Identical docs must reach est_jaccard=1.0 under BOTH hash
    families (md5 exists for oracle parity; xxhash64 is prod)."""
    from decision_tree_stuff_spark.operators.dedup import minhash_lsh_pairs

    rows = [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "totally different words here")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for fam in ("xxhash64", "md5"):
        pairs = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in minhash_lsh_pairs(
                df, bands=8, threshold=0.7, hash_fn=fam
            ).collect()
        }
        assert pairs == {(0, 1): 1.0}, fam


def test_jaccard_xxhash_key_matches_text_key(spark):
    """key='xxhash64' carries 8-byte token hashes through every
    jaccard structure (df table, prefix join, verify arrays) — the
    narrow-shuffle 100 TB shape — and must produce the same pairs and
    jaccard values as the oracle-checkable text-key plan, in both the
    prefix-filtered and naive formulations."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    a = ngram_jaccard_pairs(docs, threshold=0.5, key="text")
    b = ngram_jaccard_pairs(docs, threshold=0.5, key="xxhash64")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = ngram_jaccard_pairs(
        docs, threshold=0.5, key="xxhash64", prefix_filter=False
    )
    assert b.exceptAll(c).count() == 0 and c.exceptAll(b).count() == 0


def test_span_dedup_semantics(spark):
    """Hand-built corpus pinning the C4 span rules: a chunk repeated
    ACROSS docs is dropped from every doc carrying it; a chunk
    repeated only WITHIN one doc survives (distinct-doc count is 1);
    surviving chunks keep their original order; a doc losing every
    chunk comes back with text='' and stays in the result."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    boiler = "a b c"          # shared 3-token chunk (n=3 below)
    rows = [
        (0, boiler + " x y z"),            # boiler + unique tail
        (1, boiler + " p q r"),            # boiler + unique tail
        (2, boiler),                       # all-boilerplate doc
        (3, "m n o m n o"),                # within-doc repeat only
        (4, "   "),                        # whitespace-only
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_chunks"], r["n_kept"])
        for r in span_dedup(df, n=3, min_docs=2).collect()
    }
    assert out[0] == ("x y z", 2, 1)
    assert out[1] == ("p q r", 2, 1)
    assert out[2] == ("", 1, 0)
    assert out[3] == ("m n o m n o", 2, 2)
    assert out[4] == ("", 0, 0)


def test_span_dedup_xxhash_key_matches_text_key(spark):
    """key='xxhash64' (the narrow-shuffle 100 TB shape) must produce
    the same result set as the oracle-checkable text-key plan."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    a = span_dedup(docs, n=10, min_docs=2, key="text")
    b = span_dedup(docs, n=10, min_docs=2, key="xxhash64")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_span_strip_against_corpus_and_stream_equals_batch(
    spark, sf_dir, tmp_path
):
    """Ingest-time span dedup: (1) self-strip against the corpus's own
    frequent-span table reproduces span_dedup(keep='none') exactly;
    (2) the strip is micro-batch-invariant — foreachBatch over two
    file-triggered micro-batches yields the same rows as one batch
    run, because the frequent table is static and the op is per-doc."""
    from decision_tree_stuff_spark.operators.dedup import (
        frequent_spans,
        span_dedup,
        span_dedup_against_corpus,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    freq = frequent_spans(docs, n=10, min_docs=2)
    want = span_dedup_against_corpus(docs, freq, n=10)
    ref = span_dedup(docs, n=10, min_docs=2)  # keep='none'
    assert want.exceptAll(ref).count() == 0
    assert ref.exceptAll(want).count() == 0

    import glob
    import shutil

    d = tmp_path / "docs_stream"
    d.mkdir()
    for i, cond in enumerate(
        (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1)
    ):
        staging = str(tmp_path / f"stage{i}")
        docs.where(cond).coalesce(1).write.parquet(staging)
        shutil.move(
            glob.glob(f"{staging}/part-*.parquet")[0],
            str(d / f"half{i}.parquet"),
        )

    got = []

    def strip(batch_df, batch_id):
        out = span_dedup_against_corpus(batch_df, freq, n=10)
        got.extend(tuple(r) for r in out.collect())

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .writeStream.foreachBatch(strip)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(got) == sorted(tuple(r) for r in want.collect())
    assert len(got) > 0


def test_span_dedup_rejects_reserved_columns(spark):
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(0, "a b", 1)], "doc_id bigint, text string, __k int"
    )
    try:
        span_dedup(df)
        assert False, "expected ValueError for reserved column"
    except ValueError as e:
        assert "__k" in str(e)


def py_span_dedup(docs, n, min_docs):
    """Brute-force reference: same chunking (split on single spaces,
    keeping empties), same distinct-doc frequency rule."""
    from collections import defaultdict

    spans_by_doc = {}
    for i, text in docs:
        if text.strip() == "":
            spans_by_doc[i] = []
            continue
        toks = text.split(" ")
        spans_by_doc[i] = [
            " ".join(toks[j * n:(j + 1) * n])
            for j in range((len(toks) + n - 1) // n)
        ]
    docs_per_span = defaultdict(set)
    for i, spans in spans_by_doc.items():
        for s in spans:
            docs_per_span[s].add(i)
    freq = {s for s, ds in docs_per_span.items() if len(ds) >= min_docs}
    return {
        i: (" ".join(s for s in spans if s not in freq),
            len(spans), sum(1 for s in spans if s not in freq))
        for i, spans in spans_by_doc.items()
    }


@st.composite
def span_corpora(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        kind = draw(st.integers(0, 10))
        if kind == 0:
            text = draw(st.sampled_from(["", "   ", " ", "spark  join"]))
        else:
            k = draw(st.integers(1, 9))
            text = " ".join(
                draw(st.sampled_from(WORDS[:4])) for _ in range(k)
            )
        docs.append((i, text))
    return docs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=span_corpora(),
    n=st.sampled_from([1, 2, 3]),
    min_docs=st.sampled_from([2, 3]),
)
def test_span_dedup_matches_brute_force(spark, docs, n, min_docs):
    """The DataFrame program must equal brute-force Python over random
    corpora — tiny vocab + tiny n force heavy cross-doc span
    collisions, and the edge texts cover empty/whitespace/double-space
    chunking."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_chunks"], r["n_kept"])
        for r in span_dedup(df, n=n, min_docs=min_docs).collect()
    }
    assert got == py_span_dedup(docs, n, min_docs)


def test_span_dedup_keep_first_retains_one_occurrence(spark):
    """keep='first' (C4's discard-all-but-one): the lowest (doc, pos)
    occurrence of a frequent span survives, every other copy —
    including within-doc repeats — is dropped; infrequent spans are
    untouched."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    rows = [
        (0, "a b c x y z"),        # first occurrence of 'a b c'
        (1, "a b c p q r"),
        (2, "a b c a b c"),        # two more occurrences
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_chunks"], r["n_kept"])
        for r in span_dedup(df, n=3, min_docs=2, keep="first").collect()
    }
    assert out[0] == ("a b c x y z", 2, 2)   # keeper + unique tail
    assert out[1] == ("p q r", 2, 1)
    assert out[2] == ("", 2, 0)
    # default mode drops the doc-0 occurrence too
    none = {
        r["doc_id"]: r["text"]
        for r in span_dedup(df, n=3, min_docs=2, keep="none").collect()
    }
    assert none[0] == "x y z"


def test_span_dedup_keep_first_plan_has_no_span_key_window(spark):
    """keep='first' must pick winners with a map-side-combinable
    min(struct) aggregate, NOT a row_number window partitioned by the
    span key: a window sorts every occurrence of a span in one task,
    a straggler for viral boilerplate (one license header in 10^8
    docs). Pin: no Window node anywhere in the plan, and the winner
    aggregate shows a partial_min (map-side combine)."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(0, "a b c x y z"), (1, "a b c p q r")], "doc_id bigint, text string"
    )
    plan = (
        span_dedup(df, n=3, min_docs=2, keep="first")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_winnow_guarantee_and_pairs(spark):
    """The winnowing contract (SIGMOD'03): two docs sharing a verbatim
    run of ≥ w+k-1 characters MUST share a fingerprint — no
    probabilistic misses; unrelated docs share none; empty docs emit
    no rows; max_df drops ubiquitous-fingerprint pairs."""
    from decision_tree_stuff_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    shared = "the quick brown fox jumps over the lazy dog"  # >> w+k-1
    rows = [
        (0, f"prefix one {shared} suffix alpha"),
        (1, f"other start {shared} tail omega"),
        (2, "completely unrelated text with different letters xyzzy"),
        (3, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnow_fingerprints(df, k=8, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[0] & by_doc[1], "guaranteed shared fingerprint missing"
    assert 3 not in by_doc  # whitespace-only doc -> no rows
    got = {
        (r["id_a"], r["id_b"])
        for r in winnow_pairs(df, k=8, w=4, min_shared=2).collect()
    }
    assert (0, 1) in got
    assert all(2 not in p and 3 not in p for p in got)
    # a fingerprint in EVERY doc is exactly what max_df=1 drops
    all_same = spark.createDataFrame(
        [(i, shared) for i in range(4)], "doc_id bigint, text string"
    )
    assert (
        winnow_pairs(all_same, k=8, w=4, min_shared=1, max_df=1).count() == 0
    )


def test_corpus_diff_statuses(spark):
    from decision_tree_stuff_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(0, "same"), (1, "will change"), (2, "gone")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(0, "same"), (1, "did change"), (3, "brand new")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {0: "unchanged", 1: "changed", 2: "removed", 3: "added"}
    # normalization: whitespace/case differences are NOT a change
    new2 = spark.createDataFrame(
        [(0, "  SAME "), (1, "will   change"), (2, "gone")],
        "doc_id bigint, text string",
    )
    got2 = {r["doc_id"]: r["status"] for r in corpus_diff(old, new2).collect()}
    assert got2 == {0: "unchanged", 1: "unchanged", 2: "unchanged"}


def test_winnow_fingerprints_plan_is_shuffle_free(spark):
    """Fingerprint selection is a pure per-doc projection: the plan up
    to the distinct must contain no Exchange beyond the distinct's own
    aggregation — pin that the pre-distinct frame has ZERO exchanges."""
    from decision_tree_stuff_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(0, "some example text for the plan pin test")],
        "doc_id bigint, text string",
    )
    # distinct() adds its own (necessary, bounded) aggregate, and
    # spread_small may add ONE round-robin exchange of the raw docs
    # BEFORE any fingerprint work (r7); the fingerprint GENERATION
    # itself must be exchange-free — so: at most one hash exchange
    # (the distinct's) and at most one round-robin (the spread).
    plan = (
        winnow_fingerprints(df, k=8, w=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_edit_similarity_pairs_verifies_sequences(spark):
    """Edit verification separates reordered-token docs (high bag
    overlap, high edit distance) from genuinely near-identical docs;
    distances match Python's textbook DP values."""
    from decision_tree_stuff_spark.operators.dedup import (
        edit_similarity_pairs,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # 1 word off
        (2, "dog lazy the over jumps fox brown quick the"),  # same bag, reordered
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    cand = spark.createDataFrame(
        [(0, 1), (0, 2)], "id_a bigint, id_b bigint"
    )
    out = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["rel_dist"])
        for r in edit_similarity_pairs(
            docs, cand, max_rel_dist=1.0
        ).collect()
    }
    # dog -> cat: 3 substitutions over 43 chars
    assert out[(0, 1)] == (3, round(3 / 43, 6))
    assert out[(0, 2)][0] > 10      # reordering costs many edits
    # the verify threshold actually verifies
    tight = edit_similarity_pairs(docs, cand, max_rel_dist=0.2)
    assert {(r["id_a"], r["id_b"]) for r in tight.collect()} == {(0, 1)}
    # max_chars truncation bounds the DP cost deterministically
    trunc = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_similarity_pairs(
            docs, cand, max_rel_dist=1.0, max_chars=9
        ).collect()
    }
    assert trunc[(0, 1)] == 0       # identical first 9 chars


@st.composite
def _winnow_docs(draw):
    n = draw(st.integers(2, 6))
    out = []
    for i in range(n):
        k = draw(st.integers(0, 6))
        words = [draw(st.sampled_from(WORDS))  for _ in range(k)]
        out.append((i, " ".join(words)))
    return out


def _py_winnow(docs, k, w):
    """Brute-force winnowing with the operator's exact conventions:
    normalized text, md5-hex gram hashes (truncated-tail shingle for
    len < k via greatest(len-k+1, 1)), window minima over clamped
    slices, distinct."""
    import hashlib
    import re

    want = set()
    for i, t in docs:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        if not norm:
            continue
        n_grams = max(len(norm) - k + 1, 1)
        grams = [
            hashlib.md5(norm[j:j + k].encode()).hexdigest()
            for j in range(n_grams)
        ]
        n_windows = max(len(grams) - w + 1, 1)
        for j in range(n_windows):
            want.add((i, min(grams[j:j + w])))
    return want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_winnow_docs(), k=st.sampled_from([3, 8]), w=st.sampled_from([2, 4]))
def test_winnow_fingerprints_match_brute_force(spark, docs, k, w):
    """The Spark fingerprint SET must equal a pure-Python winnowing
    oracle on random corpora — including the short-doc (len < k),
    short-gram-list (< w) and empty/whitespace edge cases Hypothesis
    likes to find."""
    from decision_tree_stuff_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    assert got == _py_winnow(docs, k, w), f"k={k} w={w} docs={docs}"


def test_winnow_pairs_grouped_plan_equals_self_join(spark, sf_dir):
    """The capped (grouped array-local pair generation) and uncapped
    (self-join) formulations must agree wherever both apply: with
    max_df above every fingerprint's df, the cap is a no-op and the
    two plans must produce identical pair sets."""
    from decision_tree_stuff_spark.operators.dedup import winnow_pairs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 5 == 0)
    )
    a = winnow_pairs(docs, k=8, w=4, min_shared=2, max_df=10**9)
    b = winnow_pairs(docs, k=8, w=4, min_shared=2, max_df=None)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_winnow_auto_cap_matches_manual(spark, sf_dir):
    """max_df='auto' derives its cap from the fingerprint-df
    distribution (P70, floored at 10) and produces EXACTLY the output
    of the manually-capped call at that value on the bench corpus —
    the hand-tuned literal is now just an override."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = winnow_fingerprints(docs, k=8, w=4)
    q = (
        fps.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.percentile_approx("df", F.lit(0.70), F.lit(10000)))
        .first()[0]
    )
    derived = max(int(q), 10)
    auto = sorted(
        map(tuple, winnow_pairs(docs, k=8, w=4, min_shared=2).collect())
    )
    manual = sorted(
        map(
            tuple,
            winnow_pairs(
                docs, k=8, w=4, min_shared=2, max_df=derived
            ).collect(),
        )
    )
    assert auto == manual and len(auto) > 0


def test_jaccard_cache_docsets_identical_output(spark, sf_dir):
    """r13 scan knob: cache_docsets=True persists the four-consumer
    docsets table (the corpus is otherwise rescanned per consumer —
    the 100 TB defect SCALING_r13.md §3 documents) and must be
    bit-identical to the lazy default."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    kw = dict(block_cols=["lang", "len_bucket"], threshold=0.8)
    a = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, **kw).collect()
    )
    b = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, cache_docsets=True, **kw
        ).collect()
    )
    assert a == b and a
    spark.catalog.clearCache()
