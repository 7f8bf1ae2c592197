"""corpus_profile: the approximate (HLL++ / GK-sketch) 100 TB mode
must track the exact oracled mode within its configured error bounds,
and its plan must not shuffle distinct (group, token) pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.textstats import corpus_profile


def _by_group(df):
    return {r["lang"]: r.asDict() for r in df.collect()}


def test_approx_profile_within_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = _by_group(corpus_profile(docs))
    approx = _by_group(corpus_profile(docs, approximate=True, rsd=0.02))
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        # exact aggregates are identical in both modes
        assert a["n_docs"] == e["n_docs"]
        assert a["n_tokens"] == e["n_tokens"]
        # HLL++ with rsd=0.02: allow 5 sigma
        rel = abs(a["n_distinct_tokens"] - e["n_distinct_tokens"]) / max(
            e["n_distinct_tokens"], 1
        )
        assert rel <= 0.10, (lang, a["n_distinct_tokens"], e["n_distinct_tokens"])
    # approx_percentile guarantees RANK error (returns a real data
    # point near the requested rank), not value error — check each
    # approximate quartile lies inside the exact value range for
    # rank +-5% (generous vs the sketch's 1/accuracy bound; keeps the
    # test meaningful on small per-group doc counts where neighboring
    # ranks can differ by tens of chars)
    from pyspark.sql import functions as F

    for lang in exact:
        lens = docs.where(F.col("lang") == lang).select(
            F.length("text").cast("double").alias("len")
        )
        for k, p in (("len_p25", 0.25), ("len_p50", 0.5), ("len_p75", 0.75)):
            lo, hi = lens.agg(
                F.percentile("len", F.array(F.lit(max(p - 0.05, 0.0)),
                                            F.lit(min(p + 0.05, 1.0))))
            ).first()[0]
            assert lo <= approx[lang][k] <= hi, (lang, k, approx[lang][k], lo, hi)


def test_approx_profile_avoids_distinct_token_shuffle(spark, sf_dir):
    """The approximate plan's aggregate carries HLL sketch buffers —
    it must NOT expand to the exact mode's count(DISTINCT token)
    double-shuffle (Expand + two Exchanges over every token pair)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact_plan = (
        corpus_profile(docs)._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        corpus_profile(docs, approximate=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # r11: the distinct estimate rides the engine's OWN HLL register
    # table (bounded 2^b-row shuffle keyed by bucket), not the
    # engine-internal approx_count_distinct sketch
    assert "approx_count_distinct" not in approx_plan
    assert "maxrho" in approx_plan
    # exact mode must shuffle (lang, token) pairs for the distinct
    # count; approximate mode merges fixed-size sketches — no exchange
    # keyed by token anywhere in its plan
    import re

    def token_exchanges(plan):
        return [
            m for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
            if "token" in m
        ]

    assert token_exchanges(exact_plan), "exact mode should shuffle tokens"
    assert not token_exchanges(approx_plan), "approx mode must not shuffle tokens"


def test_chunk_documents_layout_and_reconstruction(spark):
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(95))), (2, ""), (3, "a b")],
        "doc_id bigint, text string",
    )
    # non-overlapping: chunks partition the token stream exactly
    out = sorted(
        chunk_documents(df, 40).where("doc_id = 1").collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.n_tokens for r in out] == [40, 40, 15]
    assert " ".join(r.chunk_text for r in out) == " ".join(
        f"t{j}" for j in range(95)
    )
    # overlapping stride: starts at 0, 30, 60, 90 (0-based)
    ov = sorted(
        chunk_documents(df, 40, 30).where("doc_id = 1").collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_id for r in ov] == [0, 1, 2, 3]
    assert [r.n_tokens for r in ov] == [40, 40, 35, 5]
    assert ov[1].chunk_text.split()[0] == "t30"
    # token-less docs yield no chunks; short docs one
    per_doc = {
        r.doc_id: r.n
        for r in chunk_documents(df, 40)
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_doc == {1: 3, 3: 1}
    # shuffle-free projection
    plan = (
        chunk_documents(df, 40)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, 0)
    with _pytest.raises(ValueError):
        chunk_documents(df, 10, 0)


def test_chunk_documents_stream_equals_batch(spark, tmp_path):
    """Chunking is a stateless projection — it runs unchanged on a
    streaming source (ingest-time context-window prep)."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.textstats import chunk_documents
    from decision_tree_stuff_spark.streaming import run_stream_to_memory

    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(i % 90))) for i in range(40)],
        "doc_id bigint, text string",
    )
    d = tmp_path / "chunk_stream"
    df.write.parquet(str(d))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = run_stream_to_memory(
        chunk_documents(stream, 32, 24), "chunk_stream_t", mode="append"
    )
    try:
        got = {
            (r.doc_id, r.chunk_id, r.chunk_text)
            for r in spark.table("chunk_stream_t").collect()
        }
        want = {
            (r.doc_id, r.chunk_id, r.chunk_text)
            for r in chunk_documents(df, 32, 24).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_scrub_documents_planted_pii_matches_duckdb(spark):
    """Cross-engine differential on planted PII: Spark's regexp chain
    and the DuckDB twin ('g' flag; len(regexp_extract_all)) must agree
    byte-for-byte on scrubbed text and per-category counts — this is
    the engine-portability proof for the shared regex subset."""
    import duckdb

    from decision_tree_stuff_spark.operators.textstats import (
        scrub_documents,
    )
    from decision_tree_stuff_spark.functions.text import PII_PATTERNS

    rows = [
        (0, "contact me at alice.smith+x@example.co.uk or bob@test.io"),
        (1, "server 10.0.0.1 and 192.168.255.254 rebooted"),
        (2, "ssn 123-45-6789 leaked; call 123-456-7890"),  # phone != ssn
        (3, "no pii here, just 1.2 floats and a@b (not an email)"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_email"], r["n_ipv4"], r["n_ssn"])
        for r in scrub_documents(df).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    scrub = "text"
    for _, pat, repl in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"SELECT doc_id, {scrub}, {counts} FROM t"
        ).fetchall()
    }
    assert got == want
    # and the redactions themselves are what we expect
    assert got[0][0] == "contact me at <EMAIL> or <EMAIL>"
    assert got[1][0] == "server <IP> and <IP> rebooted"
    assert got[2] == ("ssn <ID> leaked; call 123-456-7890", 0, 0, 1)
    assert got[3] == (rows[3][1], 0, 0, 0)


def test_unigram_logprob_self_model_math(spark):
    """Self-model scores equal hand math: model p(tok) = share of all
    occurrences; doc score = round(mean ln p, 6). Empty doc comes back
    with n_tokens=0 and a null score."""
    import math

    from decision_tree_stuff_spark.operators.textstats import (
        unigram_logprob,
    )

    rows = [(0, "a a b"), (1, "b c"), (2, "   ")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # occurrences: a=2, b=2, c=1, total=5
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    want = {
        0: round((2 * math.log(p["a"]) + math.log(p["b"])) / 3, 6),
        1: round((math.log(p["b"]) + math.log(p["c"])) / 2, 6),
        2: None,
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
        for r in unigram_logprob(df).collect()
    }
    assert got == {0: (3, want[0]), 1: (2, want[1]), 2: (0, None)}


def test_unigram_logprob_external_model_and_oov(spark):
    """Ingest shape: a persisted unigram_model table scores a NEW
    batch; tokens outside the model's vocabulary hit the oov floor."""
    import math

    from decision_tree_stuff_spark.operators.textstats import (
        unigram_logprob,
        unigram_model,
    )

    corpus = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id bigint, text string"
    )
    model = unigram_model(corpus)
    got_model = {r["token"]: r["logprob"] for r in model.collect()}
    assert set(got_model) == {"a", "b", "c"}
    assert abs(got_model["a"] - math.log(2 / 5)) < 1e-12

    batch = spark.createDataFrame(
        [(10, "a zzz")], "doc_id bigint, text string"
    )
    out = unigram_logprob(batch, model=model, oov_logprob=-20.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_tokens"] == 2
    assert r["mean_logprob"] == round((math.log(2 / 5) + -20.0) / 2, 6)


def test_bigram_logprob_self_model_math(spark):
    """Self-model bigram scores equal hand math: P(w2|w1) =
    c(w1,w2) / sum_x c(w1,x); docs with < 2 tokens return n_bigrams=0
    and a null score."""
    import math

    from decision_tree_stuff_spark.operators.textstats import bigram_logprob

    rows = [(0, "a b a b"), (1, "a c"), (2, "solo"), (3, " ")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # bigrams: doc0: (a,b) (b,a) (a,b); doc1: (a,c)
    # contexts: a -> {b:2, c:1} ; b -> {a:1}
    p_ab, p_ba, p_ac = 2 / 3, 1 / 1, 1 / 3
    want0 = round(
        (2 * math.log(p_ab) + math.log(p_ba)) / 3, 6
    )
    want1 = round(math.log(p_ac), 6)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in bigram_logprob(df).collect()
    }
    assert got == {0: (3, want0), 1: (1, want1), 2: (0, None), 3: (0, None)}


def test_bigram_logprob_external_model_and_oov(spark):
    """Unseen transitions hit the OOV floor when scoring a new batch
    against a persisted bigram model."""
    import math

    from decision_tree_stuff_spark.operators.textstats import (
        bigram_logprob,
        bigram_model,
    )

    corpus = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id bigint, text string"
    )
    model = bigram_model(corpus)
    got = {(r["w1"], r["w2"]): r["logprob"] for r in model.collect()}
    assert abs(got[("a", "b")] - math.log(2 / 3)) < 1e-12
    batch = spark.createDataFrame(
        [(10, "a b zzz")], "doc_id bigint, text string"
    )
    out = bigram_logprob(batch, model=model, oov_logprob=-20.0).collect()[0]
    assert out["n_bigrams"] == 2   # (a,b) known; (b,zzz) OOV
    assert out["mean_logprob"] == round((math.log(2 / 3) + -20.0) / 2, 6)


def test_stream_lm_scoring_equals_batch(spark, sf_dir, tmp_path):
    """Score-on-ingest (r6): scoring a doc stream against a persisted
    unigram model is per-doc with a static model table, so foreachBatch
    over multiple micro-batches must equal one batch run — the same
    micro-batch-invariance contract as the span strip."""
    from decision_tree_stuff_spark.operators.textstats import (
        unigram_logprob,
        unigram_model,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    model = unigram_model(docs)
    want = sorted(
        tuple(r) for r in unigram_logprob(docs, model=model).collect()
    )

    import glob
    import shutil

    d = tmp_path / "docs_lm_stream"
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

    def score(batch_df, batch_id):
        out = unigram_logprob(batch_df, model=model)
        got.extend(tuple(r) for r in out.collect())

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .writeStream.foreachBatch(score)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(got) == want and len(got) > 0


def test_stupid_backoff_hand_math(spark):
    """Stupid Backoff hand math (Brants et al.: S = rel.freq at the
    highest observed order, discounted by alpha per backoff step, no
    normalization): a scoring batch engineered to hit all four rungs
    — exact trigram, bigram backoff, unigram backoff, OOV floor."""
    import math

    from decision_tree_stuff_spark.operators.textstats import (
        stupid_backoff_logprob,
        stupid_backoff_model,
    )

    corpus = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b x")], "doc_id bigint, text string"
    )
    model = stupid_backoff_model(corpus)
    # raw counts: unigrams a2 b2 c1 d1 x1 (N=7);
    # bigrams (a,b)2 (b,c)1 (c,d)1 (b,x)1; trigrams (a,b,c)1 (a,b,x)1 (b,c,d)1
    ln_a = math.log(0.4)
    # rung 1: trigram (a b c): ln(c3/c2(a,b)) = ln(1/2)
    # rung 2: (c d x): trigram unseen; bigram (d,x) unseen ->
    #         unigram x: 2*ln_a + ln(1/7)... careful — backoff looks at
    #         (w2,w3)=(d,x): unseen; w3=x seen -> 2*ln_a + ln(1/7)
    # rung 3: (a c d): trigram unseen; bigram (c,d) seen:
    #         ln_a + ln(c2(c,d)/c1(c)) = ln_a + ln(1/1)
    # rung 4: (q q q): all unseen -> -20.0
    batch = spark.createDataFrame(
        [(10, "a b c"), (11, "c d x"), (12, "a c d"), (13, "q q q")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["mean_logprob"])
        for r in stupid_backoff_logprob(batch, model=model).collect()
    }
    assert got == {
        10: (1, round(math.log(1 / 2), 6)),
        11: (1, round(2 * ln_a + math.log(1 / 7), 6)),
        12: (1, round(ln_a + math.log(1 / 1), 6)),
        13: (1, -20.0),
    }


def test_stupid_backoff_self_model_all_order3(spark):
    """Self-scored corpora resolve every trigram at order 3 (the model
    covers them by construction) — the mean is then pure trigram
    relative frequency."""
    import math

    from decision_tree_stuff_spark.operators.textstats import (
        stupid_backoff_logprob,
    )

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b d"), (3, "xy")],
        "doc_id bigint, text string",
    )
    # c3(a,b,c)=2, c3(a,b,d)=1, c2(a,b)=3
    got = {
        r["doc_id"]: (r["n_trigrams"], r["mean_logprob"])
        for r in stupid_backoff_logprob(df).collect()
    }
    assert got == {
        0: (1, round(math.log(2 / 3), 6)),
        1: (1, round(math.log(2 / 3), 6)),
        2: (1, round(math.log(1 / 3), 6)),
        3: (0, None),
    }


def test_kneser_ney_hand_math(spark):
    """Interpolated KN bigram hand math (Chen & Goodman '99): a batch
    engineered to hit every scoring case — seen bigram (discounted +
    interpolated continuation mass), unseen bigram over known
    context/continuation (pure λ·P_cont), unknown context, unknown
    continuation, and the <2-token null row."""
    import math

    from decision_tree_stuff_spark.operators.textstats import (
        kneser_ney_logprob,
        kneser_ney_model,
    )

    corpus = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id bigint, text string"
    )
    # bigram types: (a,b)=2 (b,a)=1 (a,c)=1  → 3 types
    # ctx a: ctot=3 nfwd=2 λ=0.5 ; ctx b: ctot=1 nfwd=1 λ=0.75
    # P_cont: a,b,c each 1/3
    model = kneser_ney_model(corpus)
    batch = spark.createDataFrame(
        [(10, "a b"), (11, "b c"), (12, "c a"), (13, "a z"), (14, "x")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in kneser_ney_logprob(batch, model=model).collect()
    }
    lam_a = 0.75 * 2.0 / 3.0
    lam_b = 0.75 * 1.0 / 1.0
    pcont = 1.0 / 3.0
    assert got == {
        # seen (a,b): (2-D)/3 + λ(a)·P_cont(b)
        10: (1, round(math.log((2 - 0.75) / 3.0 + lam_a * pcont), 6)),
        # unseen (b,c), both sides known: λ(b)·P_cont(c)
        11: (1, round(math.log(lam_b * pcont), 6)),
        # c never appears as a context → floor
        12: (1, -20.0),
        # z never appears as a continuation → floor
        13: (1, -20.0),
        14: (0, None),
    }


def test_kneser_ney_normalizes(spark):
    """The KN invariant that distinguishes it from Stupid Backoff:
    Σ_{w2 ∈ continuation vocab} P(w2|w1) = 1 exactly, for EVERY seen
    context — the discount mass removed from seen bigrams is exactly
    the mass the continuation distribution hands back."""
    from decision_tree_stuff_spark.operators.textstats import (
        kneser_ney_model,
    )

    corpus = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the rug"),
            (2, "a cat and a dog ran"),
            (3, "san francisco san diego san jose"),
        ],
        "doc_id bigint, text string",
    )
    m = kneser_ney_model(corpus).cache()
    big = m.where(F.col("kind") == "big").select(
        "w1", "w2", F.col("value").alias("disc")
    )
    lam = m.where(F.col("kind") == "ctx").select(
        "w1", F.col("value").alias("lam")
    )
    cont = m.where(F.col("kind") == "cont").select(
        "w2", F.col("value").alias("pcont")
    )
    sums = (
        lam.crossJoin(cont)
        .join(big, ["w1", "w2"], "left")
        .groupBy("w1")
        .agg(
            F.sum(
                F.coalesce(F.col("disc"), F.lit(0.0))
                + F.col("lam") * F.col("pcont")
            ).alias("total")
        )
        .collect()
    )
    m.unpersist()
    assert len(sums) > 3
    for r in sums:
        assert abs(r["total"] - 1.0) < 1e-9, (r["w1"], r["total"])


def test_blocklist_filter_hand_corpus(spark):
    """C4-style gating: occurrence counting (not distinct), the
    max_hits policy knob, case-normalized blocklist, null text →
    null counts and keep=false."""
    from decision_tree_stuff_spark.operators.textstats import (
        blocklist_filter,
    )

    docs = spark.createDataFrame(
        [
            (0, "clean words only here"),
            (1, "one bad word"),
            (2, "bad bad worse"),
            (3, None),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_flagged"], r["keep"])
        for r in blocklist_filter(docs, ["BAD", "worse"]).collect()
    }
    assert got == {
        0: (4, 0, True),
        1: (3, 1, False),
        2: (3, 3, False),
        3: (None, None, False),
        4: (0, 0, True),
    }
    lenient = {
        r["doc_id"]: r["keep"]
        for r in blocklist_filter(
            docs, ["bad", "worse"], max_hits=1
        ).collect()
    }
    assert lenient == {0: True, 1: True, 2: False, 3: False, 4: True}


def test_chi2_features_hand_math(spark):
    """Yang & Pedersen χ² on a 4-doc corpus: perfectly-associated
    tokens score N, independent ones 0, the 2x2 algebra matches hand
    math, and the everywhere-token is excluded (zero information,
    zero marginal)."""
    from decision_tree_stuff_spark.operators.textstats import (
        chi2_features,
    )

    docs = spark.createDataFrame(
        [
            (0, "en", "common apple banana"),
            (1, "en", "common apple cherry"),
            (2, "fr", "common banana date"),
            (3, "fr", "common date egg"),
        ],
        "doc_id bigint, lang string, text string",
    )
    got = {
        (r["label"], r["token"]): (r["chi2"], r["rank"])
        for r in chi2_features(docs, "lang", k=5).collect()
    }
    # 'common' is in every doc -> excluded entirely
    assert not any(t == "common" for _, t in got)
    assert got[("en", "apple")] == (4.0, 1)
    assert got[("fr", "date")] == (4.0, 1)
    assert got[("en", "cherry")] == (round(16 / 12, 6), 2)
    assert got[("en", "banana")][0] == 0.0
    # symmetric: a token absent from the label still appears as an
    # observed pair only where A>0 — 'date' has no 'en' row
    assert ("en", "date") not in got


def test_nb_classifier_hand_math(spark):
    """Multinomial NB with Laplace smoothing equals hand math on a
    2-label toy corpus, including the per-label OOV floor and the
    prior-only tokenless doc."""
    import math

    from decision_tree_stuff_spark.operators.textstats import (
        nb_classify,
        nb_model,
    )

    train = spark.createDataFrame(
        [
            (0, "good", "great great fine"),
            (1, "good", "fine"),
            (2, "bad", "awful awful"),
        ],
        "doc_id bigint, label string, text string",
    )
    tp, lp = nb_model(train, "label")
    # counts: good: great2 fine2 (n=4); bad: awful2 (n=2); V=3
    # P(t|good) = (c+1)/(4+3); P(t|bad) = (c+1)/(2+3)
    got_tp = {
        (r["label"], r["token"]): r["logprob"] for r in tp.collect()
    }
    assert abs(got_tp[("good", "great")] - math.log(3 / 7)) < 1e-12
    assert abs(got_tp[("bad", "awful")] - math.log(3 / 5)) < 1e-12
    got_lp = {
        r["label"]: (r["prior_logprob"], r["oov_logprob"])
        for r in lp.collect()
    }
    assert abs(got_lp["good"][0] - math.log(2 / 3)) < 1e-12
    assert abs(got_lp["bad"][1] - math.log(1 / 5)) < 1e-12

    batch = spark.createDataFrame(
        [(10, "great fine"), (11, "awful zzz"), (12, "   ")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["label"], r["score"])
        for r in nb_classify(batch, tp, lp).collect()
    }
    s10_good = math.log(2 / 3) + math.log(3 / 7) + math.log(3 / 7)
    s11_bad = math.log(1 / 3) + math.log(3 / 5) + math.log(1 / 5)
    assert got[10] == ("good", round(s10_good, 6))
    assert got[11] == ("bad", round(s11_bad, 6))
    # tokenless doc: prior-only argmax -> 'good' (larger prior)
    assert got[12] == ("good", round(math.log(2 / 3), 6))


def test_nb_classifier_discriminates_held_out_docs(spark):
    """Held-out generalization on a corpus whose classes have real
    vocabulary signal (the bench corpus's lang labels are arbitrary —
    every language draws from one shared template vocabulary, so
    nothing can beat chance there; cross-engine equality for that case
    is covered by the e4_nb_langid oracle row). Class vocabularies
    overlap on half their words; NB must still recover the class of
    every held-out doc through the distinctive half."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.textstats import (
        nb_classify,
        nb_model,
    )

    import random

    rng = random.Random(7)
    shared = ["data", "table", "row", "query"]
    vocab = {
        "sport": ["goal", "match", "team", "score"] + shared,
        "cooking": ["oven", "salt", "recipe", "dish"] + shared,
        "law": ["court", "clause", "ruling", "appeal"] + shared,
    }
    rows = []
    i = 0
    for label, words in vocab.items():
        for _ in range(30):
            rows.append(
                (i, label, " ".join(rng.choice(words) for _ in range(12)))
            )
            i += 1
    docs = spark.createDataFrame(
        rows, "doc_id bigint, label string, text string"
    )
    tp, lp = nb_model(docs.where(F.col("doc_id") % 2 == 0), "label")
    pred = nb_classify(docs.where(F.col("doc_id") % 2 == 1), tp, lp)
    joined = pred.withColumnRenamed("label", "pred").join(
        docs.select("doc_id", "label"), "doc_id"
    )
    acc = joined.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc >= 0.95, acc


def test_perplexity_buckets_thirds_and_null_bucket(spark):
    """9 docs with strictly ordered scores -> exactly 3 per bucket;
    a token-less doc (null score) gets a null bucket and never shifts
    the thresholds."""
    from decision_tree_stuff_spark.operators.textstats import (
        perplexity_buckets,
    )

    rows = [(i, float(-i)) for i in range(9)]  # scores 0 .. -8
    rows.append((99, None))
    scored = spark.createDataFrame(rows, "doc_id bigint, mean_logprob double")
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(scored).collect()
    }
    # interpolated 1/3 and 2/3 quantiles of 0..-8: t_high ~ -2.667,
    # t_low ~ -5.333 -> head = {0,-1,-2}, middle = {-3,-4,-5}
    assert [out[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert out[99] is None


def test_perplexity_buckets_approx_mode_close_to_exact(spark, sf_dir):
    """GK-sketch thresholds must land nearly all docs in the same
    bucket as the exact percentile (tolerance, not equality — the
    sketch is the 100 TB path)."""
    from decision_tree_stuff_spark.operators.textstats import (
        perplexity_buckets,
        unigram_logprob,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = unigram_logprob(docs).cache()
    try:
        exact = perplexity_buckets(scored, mode="exact").select(
            "doc_id", F.col("bucket").alias("b_exact")
        )
        approx = perplexity_buckets(scored, mode="approx").select(
            "doc_id", F.col("bucket").alias("b_approx")
        )
        agree = (
            exact.join(approx, "doc_id")
            .agg(
                F.avg(
                    (
                        F.coalesce(F.col("b_exact") == F.col("b_approx"), F.lit(True))
                    ).cast("double")
                )
            )
            .first()[0]
        )
        assert agree >= 0.99, agree
    finally:
        scored.unpersist()


def test_perplexity_buckets_invalid_mode_raises(spark):
    import pytest

    from decision_tree_stuff_spark.operators.textstats import (
        perplexity_buckets,
    )

    scored = spark.createDataFrame([(0, -1.0)], "doc_id bigint, mean_logprob double")
    with pytest.raises(ValueError, match="mode"):
        perplexity_buckets(scored, mode="bogus")


def test_profile_long_docs_clamp_vs_auto_grid(spark):
    """r12 advice regression: docs longer than the default hist grid
    (4096 chars) used to clamp approx quartiles to 4096.0 silently.
    The clamp is now DOCUMENTED behavior on the fixed grid; the
    caller-tunable grid and the hist_auto mode both recover real
    quantiles for long-doc corpora."""
    rows = [(i, "x" * (9000 + 200 * i), "en") for i in range(9)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )
    exact = _by_group(corpus_profile(docs))["en"]
    assert exact["len_p50"] == 9800.0

    # default grid: every length is overflow -> quartiles pin at 4096
    clamped = _by_group(corpus_profile(docs, approximate=True))["en"]
    assert (clamped["len_p25"], clamped["len_p50"], clamped["len_p75"]) \
        == (4096.0, 4096.0, 4096.0)

    # widened caller grid: back within one cell
    wide = _by_group(
        corpus_profile(docs, approximate=True, hist_hi=16384.0)
    )["en"]
    cell = 16384.0 / 512
    assert abs(wide["len_p50"] - exact["len_p50"]) <= cell + 1e-9

    # auto grid: exact min/max pass, one-cell bound with no guessing
    auto = _by_group(
        corpus_profile(docs, approximate=True, hist_auto=True)
    )["en"]
    cell_auto = (10600.0 - 9000.0) / 512
    for k in ("len_p25", "len_p50", "len_p75"):
        assert abs(auto[k] - exact[k]) <= cell_auto + 1e-9, (
            k, auto[k], exact[k])
