"""Count-min sketch (operators/sketch.py): hand-math cells, the
one-sided error guarantee, weighted updates, and the mergeable
streaming fold. Corpus-level value parity vs DuckDB runs via
test_oracle_parity (e4_cms_profile / e4_cms_watchlist)."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from decision_tree_stuff_spark.functions.text import tokens
from decision_tree_stuff_spark.operators.sketch import (
    cms_cells,
    cms_estimate,
    cms_merge,
)


def _ref_cells(counts: dict, d: int, w: int) -> dict:
    ref: dict = {}
    for key, n in counts.items():
        h = hashlib.md5(key.encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[16:31], 16)
        for i in range(d):
            cell = (i, (h1 + i * h2) % w)
            ref[cell] = ref.get(cell, 0) + n
    return ref


def test_cells_match_python_reference_with_collisions(spark):
    # w=8 forces column collisions; the cell sums must still agree
    rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 5 + [("dd",)]
    df = spark.createDataFrame(rows, "token string")
    got = {(r["row"], r.col): r.cnt for r in cms_cells(df, d=3, w=8).collect()}
    assert got == _ref_cells({"a": 3, "b": 2, "c": 5, "dd": 1}, 3, 8)


def test_estimate_is_one_sided(spark, sf_dir):
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(
                F.filter(tokens(F.col("text")), lambda t: t != "")
            ).alias("token")
        )
    )
    exact = {
        r.token: r.n
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    watch = sorted(exact, key=exact.get, reverse=True)[:12] + ["qqq_absent"]
    cells = cms_cells(toks)
    est = {r.key: r.est for r in cms_estimate(cells, watch).collect()}
    assert set(est) == set(watch)
    for k in watch:
        assert est[k] >= exact.get(k, 0), (k, est[k], exact.get(k))
    # the absent key's estimate is bounded by the heaviest collision,
    # and with w=2048 on this vocabulary it should be far below N
    n_total = sum(exact.values())
    assert est["qqq_absent"] < n_total * 0.05


def test_weighted_updates_equal_exploded_occurrences(spark):
    occ = spark.createDataFrame(
        [("x",)] * 4 + [("y",)] * 2, "token string"
    )
    pre = spark.createDataFrame(
        [("x", 4), ("y", 2)], "token string, n int"
    )
    a = {(r["row"], r.col): r.cnt for r in cms_cells(occ, d=2, w=16).collect()}
    b = {
        (r["row"], r.col): r.cnt
        for r in cms_cells(pre, d=2, w=16, weight_col="n").collect()
    }
    assert a == b


def test_stream_fold_equals_batch_sketch(spark, sf_dir, tmp_path_factory):
    # 3 files + maxFilesPerTrigger=1 → ≥3 micro-batches; per-batch
    # sketches merged with cms_merge must equal the batch sketch
    # exactly (counters are additive — the mergeability argument)
    d = tmp_path_factory.mktemp("cms_stream")
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    third = t.num_rows // 3
    for i in range(3):
        n = third if i < 2 else t.num_rows - 2 * third
        pq.write_table(t.slice(i * third, n), f"{d}/part{i}.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_expr = F.explode(
        F.filter(tokens(F.col("text")), lambda t: t != "")
    ).alias("token")

    per_batch = []

    def _on_batch(bdf, bid):
        per_batch.append(
            {
                (r["row"], r.col): r.cnt
                for r in cms_cells(bdf.select(tok_expr)).collect()
            }
        )

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .writeStream.foreachBatch(_on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(per_batch) >= 3

    folded: dict = {}
    for s in per_batch:
        for cell, cnt in s.items():
            folded[cell] = folded.get(cell, 0) + cnt
    batch = {
        (r["row"], r.col): r.cnt
        for r in cms_cells(docs.select(tok_expr)).collect()
    }
    assert folded == batch


def test_stream_cms_state_equals_batch_sketch(
    spark, sf_dir, tmp_path_factory
):
    """The packaged streaming operator: versioned-snapshot CMS state
    after draining >=3 micro-batches equals the batch sketch exactly,
    and only the newest snapshot (+ predecessor) is retained."""
    import os

    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_cms,
    )

    d = tmp_path_factory.mktemp("cms_stream_op")
    state = str(tmp_path_factory.mktemp("cms_state"))
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    third = t.num_rows // 3
    for i in range(3):
        n = third if i < 2 else t.num_rows - 2 * third
        pq.write_table(t.slice(i * third, n), f"{d}/part{i}.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_expr = F.explode(
        F.filter(tokens(F.col("text")), lambda t: t != "")
    ).alias("token")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .select(tok_expr)
    )
    stream_cms(stream, state)

    got = {
        (r["row"], r.col): r.cnt for r in read_capped_state(spark, state).collect()
    }
    batch = {
        (r["row"], r.col): r.cnt
        for r in cms_cells(docs.select(tok_expr)).collect()
    }
    assert got == batch
    versions = [v for v in os.listdir(state) if v.startswith("v")]
    assert len(versions) <= 2, versions


def test_merge_equals_batch_on_dataframe_level(spark):
    a = spark.createDataFrame([("a",)] * 3 + [("b",)], "token string")
    b = spark.createDataFrame([("a",)] * 2 + [("c",)], "token string")
    both = a.unionByName(b)
    merged = {
        (r["row"], r.col): r.cnt
        for r in cms_merge(
            cms_cells(a, d=3, w=32), cms_cells(b, d=3, w=32)
        ).collect()
    }
    batch = {
        (r["row"], r.col): r.cnt for r in cms_cells(both, d=3, w=32).collect()
    }
    assert merged == batch


def test_hll_estimate_within_theoretical_error(spark, sf_dir):
    """m=256 registers → standard error ~6.5%; assert every per-lang
    estimate lands within 4σ of the exact distinct count (and that
    the corpus actually exercises the harmonic-mean path, not just
    linear counting)."""
    from decision_tree_stuff_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "lang",
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias(
            "token"
        ),
    )
    est = {
        r["lang"]: r["est"]
        for r in hll_estimate(
            hll_registers(toks, "token", ["lang"]), ["lang"]
        ).collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in toks.distinct().groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(est) == set(exact) and est
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= 0.26 * n, (lang, est[lang], n)


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Sketch mergeability — the 100 TB union property: max-merging
    the two halves' register tables equals the one-shot table (hence
    identical estimates), and re-merging the same half is a no-op
    (idempotence, the retry-safety argument)."""
    from decision_tree_stuff_spark.operators.sketch import hll_registers

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_expr = F.explode(
        F.filter(tokens(F.col("text")), lambda t: t != "")
    ).alias("token")
    toks = docs.select("doc_id", tok_expr)

    def regs(df):
        return {
            r["bucket"]: r["maxrho"]
            for r in hll_registers(df, "token").collect()
        }

    whole = regs(toks)
    a = regs(toks.where("doc_id % 2 = 0"))
    b = regs(toks.where("doc_id % 2 = 1"))
    merged = dict(a)
    for k, v in b.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
    remerged = {k: max(v, a.get(k, 0)) for k, v in merged.items()}
    assert remerged == whole


def test_stream_hll_state_equals_batch_registers(
    spark, sf_dir, tmp_path_factory
):
    """Versioned-snapshot HLL state after draining >=3 micro-batches
    equals the batch register table exactly (so the estimates are
    identical too)."""
    import os

    from decision_tree_stuff_spark.operators.sketch import hll_registers
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_hll,
    )

    d = tmp_path_factory.mktemp("hll_stream_op")
    state = str(tmp_path_factory.mktemp("hll_state"))
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    third = t.num_rows // 3
    for i in range(3):
        n = third if i < 2 else t.num_rows - 2 * third
        pq.write_table(t.slice(i * third, n), f"{d}/part{i}.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_expr = F.explode(
        F.filter(tokens(F.col("text")), lambda t: t != "")
    ).alias("token")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .select("lang", tok_expr)
    )
    stream_hll(stream, state, group_cols=["lang"])

    got = {
        (r["lang"], r["bucket"]): r["maxrho"]
        for r in read_capped_state(spark, state).collect()
    }
    batch = {
        (r["lang"], r["bucket"]): r["maxrho"]
        for r in hll_registers(
            docs.select("lang", tok_expr), "token", ["lang"]
        ).collect()
    }
    assert got == batch and got
    versions = [v for v in os.listdir(state) if v.startswith("v")]
    assert len(versions) <= 2, versions


def test_hll_merge_equals_one_shot_and_union_estimates(spark, sf_dir):
    """hll_merge(shard sketches) == the one-shot register table — on
    OVERLAPPING shards (max is idempotent), so the merged estimate is
    the union's estimate, never an overcount."""
    from decision_tree_stuff_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias(
            "token"
        ),
    )
    # overlapping shards: ids 0-2 mod 4 and 1-3 mod 4
    a = hll_registers(toks.where("doc_id % 4 <= 2"), "token", ["lang"])
    b = hll_registers(toks.where("doc_id % 4 >= 1"), "token", ["lang"])
    merged = hll_merge(a, b, group_cols=["lang"])
    whole = hll_registers(toks, "token", ["lang"])

    def regs(df):
        return {
            (r["lang"], r["bucket"]): r["maxrho"] for r in df.collect()
        }

    assert regs(merged) == regs(whole)
    est = {
        r["lang"]: r["est"]
        for r in hll_estimate(merged, ["lang"]).collect()
    }
    want = {
        r["lang"]: r["est"] for r in hll_estimate(whole, ["lang"]).collect()
    }
    assert est == want and est


# --- KMV / theta sketch (r11) -------------------------------------------


def _py_kmv(keys, k):
    """Python reference: k smallest distinct 60-bit md5 halves."""
    hs = sorted({int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                 for t in keys})
    return hs[:k]


def test_kmv_sketch_matches_python_reference(spark, sf_dir):
    from decision_tree_stuff_spark.operators.sketch import kmv_sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias(
            "token"
        )
    )
    got = [
        r["h"]
        for r in kmv_sketch(toks, "token", k=64)
        .orderBy("rank")
        .collect()
    ]
    # differential over the engine's own token set, so the test is
    # about the SKETCH (hashing, dedup, top-k), not the tokenizer
    vocab = [r.token for r in toks.distinct().collect()]
    assert got == _py_kmv(vocab, 64)


def test_kmv_estimate_exact_when_underfull_and_formula_when_full(spark):
    from decision_tree_stuff_spark.operators.sketch import (
        KMV_SPACE,
        kmv_estimate,
        kmv_sketch,
    )

    # 10 distinct keys, k=64 -> under-full -> exact count
    small = spark.createDataFrame(
        [(f"key{i}",) for i in range(10)] * 3, "token string"
    )
    est = kmv_estimate(kmv_sketch(small, k=64), k=64).collect()[0]["est"]
    assert est == 10.0
    # 500 distinct keys, k=64 -> full -> (k-1) * 2^60 / h_k
    big = spark.createDataFrame(
        [(f"key{i}",) for i in range(500)], "token string"
    )
    got = kmv_estimate(kmv_sketch(big, k=64), k=64).collect()[0]["est"]
    hk = _py_kmv([f"key{i}" for i in range(500)], 64)[-1]
    assert got == round(63 * float(KMV_SPACE) / float(hk), 6)
    # and the estimate is in a sane band around the truth
    assert 300 < got < 800


def test_kmv_merge_equals_one_shot_on_overlapping_shards(spark, sf_dir):
    from decision_tree_stuff_spark.operators.sketch import (
        kmv_merge,
        kmv_sketch,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias(
            "token"
        ),
    )
    a = kmv_sketch(toks.where("doc_id % 4 <= 2"), "token", k=64)
    b = kmv_sketch(toks.where("doc_id % 4 >= 1"), "token", k=64)
    merged = [
        (r["rank"], r["h"])
        for r in kmv_merge(a, b, k=64).orderBy("rank").collect()
    ]
    whole = [
        (r["rank"], r["h"])
        for r in kmv_sketch(toks, "token", k=64).orderBy("rank").collect()
    ]
    vocab = toks.select("token").distinct().count()
    assert merged == whole and len(whole) == min(64, vocab)


def test_kmv_set_estimates_match_python_theta_math(spark):
    from decision_tree_stuff_spark.operators.sketch import (
        KMV_SPACE,
        kmv_set_estimates,
        kmv_sketch,
    )

    k = 64
    a_keys = [f"shared{i}" for i in range(300)] + [
        f"only_a{i}" for i in range(200)
    ]
    b_keys = [f"shared{i}" for i in range(300)] + [
        f"only_b{i}" for i in range(400)
    ]
    sa = kmv_sketch(
        spark.createDataFrame([(x,) for x in a_keys], "token string"), k=k
    )
    sb = kmv_sketch(
        spark.createDataFrame([(x,) for x in b_keys], "token string"), k=k
    )
    row = kmv_set_estimates(sa, sb, k=k).collect()[0]

    ha, hb = _py_kmv(a_keys, k), _py_kmv(b_keys, k)
    theta = min(ha[-1], hb[-1])
    inter = {h for h in ha if h < theta} & {h for h in hb if h < theta}
    union = {h for h in ha if h < theta} | {h for h in hb if h < theta}
    scale = float(KMV_SPACE) / float(theta)
    assert row["theta"] == theta
    assert row["n_inter"] == len(inter)
    assert row["est_intersection"] == round(len(inter) * scale, 6)
    assert row["est_union"] == round(len(union) * scale, 6)
    assert row["jaccard"] == round(len(inter) / len(union), 6)
    # sanity: truth intersection 300, union 900, jaccard 1/3
    assert 100 < row["est_intersection"] < 600
    assert 0.15 < row["jaccard"] < 0.55


def test_kmv_sketch_vs_duckdb_twin(spark, sf_dir):
    import duckdb

    from decision_tree_stuff_spark.operators.sketch import (
        kmv_sketch,
        kmv_sql_sketch,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias(
            "token"
        )
    )
    got = [
        (r["rank"], r["h"])
        for r in kmv_sketch(toks, "token", k=64).orderBy("rank").collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    src = r"""
      SELECT tok AS key FROM (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    """
    want = con.execute(kmv_sql_sketch(src, k=64)).fetchall()
    assert got == [(int(r0), int(r1)) for r0, r1 in want]


def test_stream_kmv_state_equals_batch_sketch(
    spark, sf_dir, tmp_path_factory
):
    """Versioned-snapshot KMV state after draining >=3 micro-batches
    equals the batch k-minimum table exactly (min-selection is
    idempotent, so batch boundaries are invisible)."""
    import os

    from decision_tree_stuff_spark.operators.sketch import kmv_sketch
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_kmv,
    )

    d = tmp_path_factory.mktemp("kmv_stream_op")
    state = str(tmp_path_factory.mktemp("kmv_state"))
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    third = t.num_rows // 3
    for i in range(3):
        n = third if i < 2 else t.num_rows - 2 * third
        pq.write_table(t.slice(i * third, n), f"{d}/part{i}.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_expr = F.explode(
        F.filter(tokens(F.col("text")), lambda t: t != "")
    ).alias("token")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .select(tok_expr)
    )
    stream_kmv(stream, state, k=16)

    got = [
        (r["rank"], r["h"])
        for r in read_capped_state(spark, state).orderBy("rank").collect()
    ]
    batch = [
        (r["rank"], r["h"])
        for r in kmv_sketch(docs.select(tok_expr), "token", k=16)
        .orderBy("rank")
        .collect()
    ]
    assert got == batch and got
    versions = [v for v in os.listdir(state) if v.startswith("v")]
    assert len(versions) <= 2, versions


# --- fixed-grid histogram quantile sketch (r11) ---------------------------


def _py_hist(values, lo, hi, n):
    scale = float(n) / (float(hi) - float(lo))
    out = {}
    for v in values:
        if v is None:
            continue
        fv = float(v)
        if fv < lo:
            b = -1
        elif fv >= hi:
            b = n
        else:
            b = int((fv - float(lo)) * scale // 1)
        out[b] = out.get(b, 0) + 1
    return out


def _py_hist_quantile(values, q, lo, hi, n):
    """Python mirror of the exact interpolation recipe."""
    h = sorted(_py_hist(values, lo, hi, n).items())
    total = sum(c for _, c in h)
    width = (float(hi) - float(lo)) / float(n)
    t = int(q * float(total - 1) // 1) + 1
    cum = 0
    for b, c in h:
        if cum + c >= t:
            if b == -1:
                return round(float(lo), 6)
            if b == n:
                return round(float(hi), 6)
            return round(
                (float(lo) + width * float(b))
                + width * (float(t - cum) / float(c)),
                6,
            )
        cum += c
    raise AssertionError("rank past histogram")


def test_hist_buckets_match_python_reference(spark, sf_dir):
    from decision_tree_stuff_spark.operators.sketch import hist_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["lang"], r["bucket"]): r["cnt"]
        for r in hist_buckets(
            docs, "n_chars", ["lang"], lo=0.0, hi=300.0, n_buckets=16
        ).collect()
    }
    by_lang = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    want = {
        (lang, b): c
        for lang, vs in by_lang.items()
        for b, c in _py_hist(vs, 0.0, 300.0, 16).items()
    }
    assert got == want and got


def test_hist_quantiles_match_python_and_error_bound(spark, sf_dir):
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_quantiles,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo, hi, n = 0.0, 1024.0, 64
    width = (hi - lo) / n
    b = hist_buckets(docs, "n_chars", ["lang"], lo=lo, hi=hi, n_buckets=n)
    got = {
        (r["lang"], r["q"]): r["est"]
        for r in hist_quantiles(
            b, (0.25, 0.5, 0.9), ["lang"], lo=lo, hi=hi, n_buckets=n
        ).collect()
    }
    by_lang = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    for lang, vs in by_lang.items():
        vs.sort()
        for q in (0.25, 0.5, 0.9):
            est = got[(lang, q)]
            assert est == _py_hist_quantile(vs, q, lo, hi, n), (lang, q)
            true = vs[int(q * (len(vs) - 1))]
            if lo <= true < hi:  # bound holds for in-grid ranks only
                assert abs(est - true) <= width + 1e-9, (lang, q, est, true)


def test_hist_merge_equals_one_shot(spark, sf_dir):
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_merge,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = hist_buckets(
        docs.where("doc_id % 2 = 0"), "n_chars", ["lang"], 0.0, 512.0, 32
    )
    b = hist_buckets(
        docs.where("doc_id % 2 = 1"), "n_chars", ["lang"], 0.0, 512.0, 32
    )
    merged = {
        (r["lang"], r["bucket"]): r["cnt"]
        for r in hist_merge(a, b, group_cols=["lang"]).collect()
    }
    whole = {
        (r["lang"], r["bucket"]): r["cnt"]
        for r in hist_buckets(
            docs, "n_chars", ["lang"], 0.0, 512.0, 32
        ).collect()
    }
    assert merged == whole and merged


def test_stream_hist_state_equals_batch_sketch(
    spark, sf_dir, tmp_path_factory
):
    from decision_tree_stuff_spark.operators.sketch import hist_buckets
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_hist,
    )

    d = tmp_path_factory.mktemp("hist_stream_op")
    state = str(tmp_path_factory.mktemp("hist_state"))
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    third = t.num_rows // 3
    for i in range(3):
        n = third if i < 2 else t.num_rows - 2 * third
        pq.write_table(t.slice(i * third, n), f"{d}/part{i}.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .select("lang", F.col("n_chars").alias("v"))
    )
    stream_hist(stream, state, group_cols=["lang"], hi=512.0, n_buckets=32)

    got = {
        (r["lang"], r["bucket"]): r["cnt"]
        for r in read_capped_state(spark, state).collect()
    }
    batch = {
        (r["lang"], r["bucket"]): r["cnt"]
        for r in hist_buckets(
            docs.select("lang", F.col("n_chars").alias("v")),
            "v", ["lang"], 0.0, 512.0, 32,
        ).collect()
    }
    assert got == batch and got


def test_kmv_pairwise_matches_python_reference(spark):
    """Pairwise matrix vs a Python theta-sketch reference over three
    synthetic corpora with known overlap structure."""
    from decision_tree_stuff_spark.operators.sketch import (
        KMV_SPACE,
        kmv_pairwise,
        kmv_sketch,
    )

    k = 32
    corp = {
        "a": [f"s{i}" for i in range(200)] + [f"a{i}" for i in range(100)],
        "b": [f"s{i}" for i in range(200)] + [f"b{i}" for i in range(300)],
        "c": [f"c{i}" for i in range(50)],  # disjoint, under-full
    }
    rows = [(g, t) for g, toks in corp.items() for t in toks]
    df = spark.createDataFrame(rows, "lang string, token string")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_pairwise(
            kmv_sketch(df, "token", group_cols=["lang"], k=k), "lang", k=k
        ).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    sk = {g: _py_kmv(toks, k) for g, toks in corp.items()}
    th = {g: (h[k - 1] if len(h) >= k else (1 << 60)) for g, h in sk.items()}
    for ga, gb in got:
        theta = min(th[ga], th[gb])
        xa = {h for h in sk[ga] if h < theta}
        xb = {h for h in sk[gb] if h < theta}
        ni, nu = len(xa & xb), len(xa) + len(xb) - len(xa & xb)
        r = got[(ga, gb)]
        assert r["theta"] == theta
        assert r["n_inter"] == ni
        scale = float(KMV_SPACE) / float(theta)
        assert r["est_intersection"] == round(ni * scale, 6)
        assert r["est_union"] == round(nu * scale, 6)
        assert r["jaccard"] == round(ni / nu if nu else 0.0, 6)
    # structure sanity: a-b share 200 of {500, 300-ish}; c disjoint
    assert got[("a", "b")]["jaccard"] > 0.15
    assert got[("a", "c")]["n_inter"] == 0
    assert got[("b", "c")]["n_inter"] == 0


# --- auto-range histogram (r12) -----------------------------------------


def test_hist_auto_recovers_out_of_range_quantiles(spark):
    """The mass-in-overflow regression the fixed grid cannot pass:
    values far beyond a guessed hi clamp fixed-grid quantiles to the
    guess (documented behavior), while the auto grid derives [lo, hi]
    from an exact min/max pass and keeps the one-cell bound for ALL
    data."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_buckets_auto,
        hist_quantiles,
        hist_quantiles_auto,
    )

    vals = [float(100 + 137 * i) for i in range(400)]  # 100 .. 54763
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    n = 64

    clamped = {
        r["q"]: r["est"]
        for r in hist_quantiles(
            hist_buckets(df, "v", lo=0.0, hi=100.0, n_buckets=n),
            (0.5, 0.75),
            lo=0.0,
            hi=100.0,
            n_buckets=n,
        ).collect()
    }
    # everything is >= hi -> overflow bucket -> estimates pin at hi
    assert clamped == {0.5: 100.0, 0.75: 100.0}

    auto = {
        r["q"]: r["est"]
        for r in hist_quantiles_auto(
            hist_buckets_auto(df, "v", n_buckets=n), (0.25, 0.5, 0.75)
            , n_buckets=n
        ).collect()
    }
    vals.sort()
    width = (vals[-1] - vals[0]) / n
    for q in (0.25, 0.5, 0.75):
        true = vals[int(q * (len(vals) - 1))]
        assert abs(auto[q] - true) <= width + 1e-9, (q, auto[q], true)


def test_hist_auto_degenerate_constant_column(spark):
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_quantiles_auto,
    )

    df = spark.createDataFrame([(42.0,)] * 10, "v double")
    b = hist_buckets_auto(df, "v", n_buckets=16)
    rows = b.collect()
    # span guard: hi == lo widens to 1.0; all mass in bucket 0
    assert [(r["bucket"], r["cnt"]) for r in rows] == [(0, 10)]
    got = {
        r["q"]: r["est"]
        for r in hist_quantiles_auto(b, (0.5,), n_buckets=16).collect()
    }
    assert abs(got[0.5] - 42.0) <= 1.0 / 16 + 1e-9


def test_hist_auto_grouped_shares_one_global_grid(spark, sf_dir):
    """Bounds are GLOBAL (one shared grid), so per-group sketches
    from one pass merge additively and the lo/hi columns are constant
    across groups."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = hist_buckets_auto(
        docs.select("lang", "n_chars"), "n_chars", ["lang"], n_buckets=32
    )
    rows = b.collect()
    bounds = {(r["lo"], r["hi"]) for r in rows}
    assert len(bounds) == 1
    lo, hi = bounds.pop()
    mm = docs.agg(
        F.min(F.col("n_chars").cast("double")),
        F.max(F.col("n_chars").cast("double")),
    ).collect()[0]
    assert (lo, hi) == (mm[0], mm[1])
    assert all(0 <= r["bucket"] <= 31 for r in rows)


# --- r12 advice regressions ---------------------------------------------


def test_kmv_sketch_filters_null_keys(spark):
    """md5(NULL) sorts first in an ascending window — an unfiltered
    null key would displace a real minimum hash."""
    from decision_tree_stuff_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), ("c",)], "token string"
    )
    rows = kmv_sketch(df, "token", k=2).collect()
    assert len(rows) == 2 and all(r["h"] is not None for r in rows)
    full = kmv_sketch(df.where("token is not null"), "token", k=2).collect()
    assert sorted(r["h"] for r in rows) == sorted(r["h"] for r in full)


def test_kmv_set_estimates_empty_inputs_yield_one_zero_row(spark):
    from decision_tree_stuff_spark.operators.sketch import (
        KMV_SPACE,
        kmv_sketch,
        kmv_set_estimates,
    )

    empty = spark.createDataFrame([], "token string")
    s = kmv_sketch(empty, "token")
    rows = kmv_set_estimates(s, s).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["theta"], r["n_inter"], r["est_intersection"],
            r["est_union"], r["jaccard"]) == (KMV_SPACE, 0, 0.0, 0.0, 0.0)


def test_hist_auto_grouped_per_group_bounds(spark):
    """r12 per-group variant: each group's grid comes from its OWN
    exact min/max, so a narrow group keeps full resolution next to a
    wide one; quantiles within one per-group cell of exact."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto_grouped,
        hist_quantiles_auto,
    )

    rows = [("narrow", float(100 + i)) for i in range(50)] + [
        ("wide", float(1000 * i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    n = 16
    b = hist_buckets_auto_grouped(df, "v", ["g"], n_buckets=n)
    bounds = {
        r["g"]: (r["lo"], r["hi"])
        for r in b.select("g", "lo", "hi").distinct().collect()
    }
    assert bounds == {
        "narrow": (100.0, 149.0),
        "wide": (0.0, 49000.0),
    }
    got = {
        (r["g"], r["q"]): r["est"]
        for r in hist_quantiles_auto(
            b, (0.5,), ["g"], n_buckets=n
        ).collect()
    }
    # exact medians: index floor(0.5*49)=24 -> narrow 124, wide 24000
    assert abs(got[("narrow", 0.5)] - 124.0) <= 49.0 / n + 1e-9
    assert abs(got[("wide", 0.5)] - 24000.0) <= 49000.0 / n + 1e-9
    # a GLOBAL grid at the same n would have one cell of width
    # 49000/16 ≈ 3060 — the narrow group's whole range fits in ONE
    # global cell; the per-group grid resolves it to ~3 chars
    assert 49.0 / n < 4


def test_hist_auto_grouped_requires_groups(spark):
    import pytest

    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto_grouped,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="group_cols"):
        hist_buckets_auto_grouped(df, "v", [])


def test_hist_weighted_equals_exploded_repeats(spark):
    """r12 weighted grid: integer weights must equal physically
    repeating each row weight times (cells AND quantiles)."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_quantiles,
    )

    rows = [("g", 10.0, 3), ("g", 200.0, 1), ("g", 90.0, 2),
            ("h", 50.0, 5)]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    exploded = spark.createDataFrame(
        [(g, v) for g, v, w in rows for _ in range(w)],
        "g string, v double",
    )
    kw = dict(lo=0.0, hi=256.0, n_buckets=16)
    wc = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hist_buckets(df, "v", ["g"], weight_col="w", **kw).collect()
    }
    ec = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hist_buckets(exploded, "v", ["g"], **kw).collect()
    }
    assert wc == ec and wc
    wq = {
        (r["g"], r["q"]): r["est"]
        for r in hist_quantiles(
            hist_buckets(df, "v", ["g"], weight_col="w", **kw),
            (0.25, 0.5), ["g"], **kw
        ).collect()
    }
    eq = {
        (r["g"], r["q"]): r["est"]
        for r in hist_quantiles(
            hist_buckets(exploded, "v", ["g"], **kw),
            (0.25, 0.5), ["g"], **kw
        ).collect()
    }
    assert wq == eq

    # null weights contribute nothing (row dropped, like null values)
    withnull = spark.createDataFrame(
        rows + [("g", 10.0, None)], "g string, v double, w int"
    )
    nc = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hist_buckets(
            withnull, "v", ["g"], weight_col="w", **kw
        ).collect()
    }
    assert nc == wc


def test_hist_auto_weighted_equals_exploded_repeats(spark):
    """r13 weighted × auto-range (both global and per-group grids):
    integer weights ≥ 1 must equal physically repeating each row
    weight times — cells, bounds AND quantiles — because the bounds
    pre-pass sees the same value set either way."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_buckets_auto_grouped,
        hist_quantiles_auto,
    )

    rows = [("g", 10.0, 3), ("g", 200.0, 1), ("g", 90.0, 2),
            ("h", 50.0, 5), ("h", 51000.0, 2)]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    exploded = spark.createDataFrame(
        [(g, v) for g, v, w in rows for _ in range(w)],
        "g string, v double",
    )
    for build in (hist_buckets_auto, hist_buckets_auto_grouped):
        wb = build(df, "v", ["g"], n_buckets=16, weight_col="w")
        eb = build(exploded, "v", ["g"], n_buckets=16)
        wc = {(r["g"], r["bucket"]): (r["cnt"], r["lo"], r["hi"])
              for r in wb.collect()}
        ec = {(r["g"], r["bucket"]): (r["cnt"], r["lo"], r["hi"])
              for r in eb.collect()}
        assert wc == ec and wc, build.__name__
        wq = {(r["g"], r["q"]): r["est"]
              for r in hist_quantiles_auto(
                  wb, (0.25, 0.5, 0.75), ["g"], n_buckets=16
              ).collect()}
        eq = {(r["g"], r["q"]): r["est"]
              for r in hist_quantiles_auto(
                  eb, (0.25, 0.5, 0.75), ["g"], n_buckets=16
              ).collect()}
        assert wq == eq, build.__name__

    # null weights drop the row entirely (value excluded from bounds
    # too); zero weights pin the bounds but add no mass — documented
    withnull = spark.createDataFrame(
        [("g", 10.0, 2), ("g", 99999.0, None)], "g string, v double, w int"
    )
    b = hist_buckets_auto(withnull, "v", ["g"], n_buckets=16,
                          weight_col="w").collect()
    assert all(r["hi"] == 10.0 for r in b)  # null-w row out of bounds
    withzero = spark.createDataFrame(
        [("g", 10.0, 2), ("g", 100.0, 0)], "g string, v double, w int"
    )
    bz = hist_buckets_auto(withzero, "v", ["g"], n_buckets=16,
                           weight_col="w").collect()
    assert all(r["hi"] == 100.0 for r in bz)  # zero-w pins the grid
    assert sum(r["cnt"] for r in bz) == 2     # ...but adds no mass


# --- hist_rebucket: cross-grid merge (r13) --------------------------------


def test_hist_rebucket_hand_math(spark):
    """Source auto grid [0,64)x64 (width 1), target [0,100)x10
    (width 10): cell b's midpoint b+0.5 lands in target bucket
    floor((b+0.5)/10) — checked cell by cell, mass conserved."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_rebucket,
    )

    # values 0..63 once each -> auto bounds [0,63], span 63
    df = spark.createDataFrame([(float(i),) for i in range(64)], "v double")
    sk = hist_buckets_auto(df, "v", [], n_buckets=64)
    out = {
        r["bucket"]: r["cnt"]
        for r in hist_rebucket(
            sk, 0.0, 100.0, 10, [], src_n_buckets=64
        ).collect()
    }
    # midpoint of src cell b = (63/64)*(b+0.5); expected target bucket
    import math as _m

    exp = {}
    for b in range(64):
        mid = 0.0 + (63.0 / 64.0) * (b + 0.5)
        tb = _m.floor((mid - 0.0) * (10.0 / 100.0))
        exp[tb] = exp.get(tb, 0) + 1
    assert out == exp
    assert sum(out.values()) == 64  # mass conserved


def test_hist_rebucket_under_overflow_cells(spark):
    """Mass outside the target range lands in the -1 / n_buckets
    sentinel cells, matching hist_buckets' fixed-grid shape."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_rebucket,
    )

    df = spark.createDataFrame(
        [(-500.0,), (-499.0,), (50.0,), (900.0,), (901.0,)], "v double"
    )
    sk = hist_buckets_auto(df, "v", [], n_buckets=64)
    out = {
        r["bucket"]: r["cnt"]
        for r in hist_rebucket(
            sk, 0.0, 100.0, 10, [], src_n_buckets=64
        ).collect()
    }
    assert out.get(-1) == 2 and out.get(10) == 2
    assert sum(out.values()) == 5


def test_hist_rebucket_merges_with_fixed_grid_and_grouped(spark):
    """Rebucketed auto sketches (incl. per-group grids) are
    shape-compatible with fixed-grid sketches: hist_merge re-sums and
    total mass is conserved."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_buckets_auto_grouped,
        hist_merge,
        hist_rebucket,
    )

    rows = [("g", float(i)) for i in range(20)] + [
        ("h", float(i * 100)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    auto = hist_buckets_auto_grouped(df, "v", ["g"], n_buckets=32)
    reb = hist_rebucket(auto, 0.0, 1000.0, 10, ["g"], src_n_buckets=32)
    fixed = hist_buckets(df, "v", ["g"], lo=0.0, hi=1000.0, n_buckets=10)
    merged = hist_merge(reb, fixed, group_cols=["g"])
    total = sum(r["cnt"] for r in merged.collect())
    assert total == 2 * len(rows)


def test_hist_rebucket_merge_quantiles_within_bound(spark):
    """The r12 verdict's 'Done =' bound: merge(rebucket(A),
    rebucket(B)) quantiles are within 2 target cell widths of the
    exact rank value when target_width >= every source width, and
    within 3 widths of the one-shot fixed-grid estimate."""
    import random as _r

    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_buckets_auto,
        hist_merge,
        hist_quantiles,
        hist_rebucket,
    )

    rng = _r.Random(13)
    vals_a = [round(rng.uniform(0, 99.9), 3) for _ in range(137)]
    vals_b = [round(rng.uniform(20, 80), 3) for _ in range(61)]
    da = spark.createDataFrame([(v,) for v in vals_a], "v double")
    db = spark.createDataFrame([(v,) for v in vals_b], "v double")
    kw = dict(lo=0.0, hi=100.0, n_buckets=10)
    width = 10.0
    reb = hist_merge(
        hist_rebucket(hist_buckets_auto(da, "v", [], n_buckets=64),
                      group_cols=[], src_n_buckets=64, **kw),
        hist_rebucket(hist_buckets_auto(db, "v", [], n_buckets=64),
                      group_cols=[], src_n_buckets=64, **kw),
    )
    qs = (0.1, 0.25, 0.5, 0.75, 0.9)
    got = {r["q"]: r["est"]
           for r in hist_quantiles(reb, qs, [], **kw).collect()}
    allv = sorted(vals_a + vals_b)
    one = hist_buckets(
        spark.createDataFrame([(v,) for v in allv], "v double"),
        "v", [], **kw,
    )
    oneshot = {r["q"]: r["est"]
               for r in hist_quantiles(one, qs, [], **kw).collect()}
    n = len(allv)
    for q in qs:
        t = int((q * (n - 1)) // 1) + 1
        exact = allv[t - 1]
        assert abs(got[q] - exact) <= 2 * width + 1e-6, (q, got[q], exact)
        assert abs(got[q] - oneshot[q]) <= 3 * width + 1e-6


def test_hist_rebucket_property(spark):
    """Hypothesis property: for ANY two shards in [0, 100), every
    merged-rebucketed quantile is within 2 target widths of the exact
    rank value (src grid 64 cells of span <= 100 -> src_width <=
    1.5625 <= target width 10, so the documented bound applies)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_merge,
        hist_quantiles,
        hist_rebucket,
    )

    vals = st.lists(
        st.floats(0, 99.5).map(lambda x: round(x, 2)),
        min_size=1,
        max_size=25,
    )

    @given(a=vals, b=vals)
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def check(a, b):
        da = spark.createDataFrame([(float(v),) for v in a], "v double")
        db = spark.createDataFrame([(float(v),) for v in b], "v double")
        kw = dict(lo=0.0, hi=100.0, n_buckets=10)
        reb = hist_merge(
            hist_rebucket(hist_buckets_auto(da, "v", [], n_buckets=64),
                          group_cols=[], src_n_buckets=64, **kw),
            hist_rebucket(hist_buckets_auto(db, "v", [], n_buckets=64),
                          group_cols=[], src_n_buckets=64, **kw),
        )
        got = {r["q"]: r["est"]
               for r in hist_quantiles(reb, (0.5,), [], **kw).collect()}
        allv = sorted(a + b)
        t = int((0.5 * (len(allv) - 1)) // 1) + 1
        assert abs(got[0.5] - allv[t - 1]) <= 20.0 + 1e-6

    check()


def test_hist_rebucket_weighted_sketches_compose(spark):
    """r13 composition: rebucketing WEIGHTED auto sketches conserves
    weighted mass and equals rebucketing the exploded-repeats
    unweighted sketches (cnt is just summed — rebucket is
    weight-agnostic by construction)."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_merge,
        hist_rebucket,
    )

    rows = [("g", 10.0, 3), ("g", 200.0, 1), ("g", 90.0, 2),
            ("h", 50.0, 5), ("h", 510.0, 2)]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    exploded = spark.createDataFrame(
        [(g, v) for g, v, w in rows for _ in range(w)],
        "g string, v double",
    )
    kw = dict(lo=0.0, hi=1024.0, n_buckets=16)
    wr = hist_rebucket(
        hist_buckets_auto(df, "v", ["g"], n_buckets=32, weight_col="w"),
        group_cols=["g"], src_n_buckets=32, **kw,
    )
    er = hist_rebucket(
        hist_buckets_auto(exploded, "v", ["g"], n_buckets=32),
        group_cols=["g"], src_n_buckets=32, **kw,
    )
    wc = {(r["g"], r["bucket"]): r["cnt"] for r in wr.collect()}
    ec = {(r["g"], r["bucket"]): r["cnt"] for r in er.collect()}
    assert wc == ec and wc
    assert sum(c for (_, _), c in wc.items()) == sum(
        w for _, _, w in rows
    )
    # and merged rebucketed weighted sketches stay additive
    m = hist_merge(wr, er, group_cols=["g"])
    assert sum(r["cnt"] for r in m.collect()) == 2 * sum(
        w for _, _, w in rows
    )


def test_stream_hist_rebucket_state_equals_batch_shard_program(
    spark, sf_dir, tmp_path_factory
):
    """r14 (the r13 verdict's streaming pin): the stream_hist_rebucket
    state after 3 micro-batches must equal the BATCH cross-shard
    program — per-shard auto sketch → hist_rebucket onto the fixed
    grid → hist_merge — with shards = the same 3 files, exactly
    (counts are integers; the midpoint assignment is deterministic
    double arithmetic in one parenthesization on both paths). Also
    pins snapshot retention (≤ 2 versions survive) and that
    hist_quantiles reads the state snapshot unchanged."""
    import os

    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_merge,
        hist_quantiles,
        hist_rebucket,
    )
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_hist_rebucket,
    )

    d = tmp_path_factory.mktemp("hist_rb_stream")
    state = str(tmp_path_factory.mktemp("hist_rb_state"))
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    third = t.num_rows // 3
    for i in range(3):
        n = third if i < 2 else t.num_rows - 2 * third
        pq.write_table(t.slice(i * third, n), f"{d}/part{i}.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo, hi, nb, src_nb = 0.0, 512.0, 32, 24
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .select(F.col("n_chars").cast("double").alias("v"))
    )
    stream_hist_rebucket(
        stream, state, lo=lo, hi=hi, n_buckets=nb, src_n_buckets=src_nb
    )

    got = {
        r["bucket"]: r["cnt"]
        for r in read_capped_state(spark, state).collect()
    }

    # batch cross-shard program over the SAME 3 shards
    shards = [
        hist_rebucket(
            hist_buckets_auto(
                spark.read.parquet(f"{d}/part{i}.parquet").select(
                    F.col("n_chars").cast("double").alias("v")
                ),
                "v",
                (),
                src_nb,
            ),
            lo, hi, nb, (), src_nb,
        )
        for i in range(3)
    ]
    merged = hist_merge(shards[0], shards[1])
    merged = hist_merge(merged, shards[2])
    batch = {r["bucket"]: r["cnt"] for r in merged.collect()}
    assert got == batch and got
    assert sum(got.values()) == docs.count()  # mass conserved

    # retention: only the newest snapshot + its direct predecessor
    versions = [v for v in os.listdir(state) if v.startswith("v")]
    assert len(versions) <= 2, versions

    # the snapshot feeds hist_quantiles unchanged (hist_buckets shape)
    qrows = hist_quantiles(
        read_capped_state(spark, state), [0.5, 0.9], (), lo, hi, nb
    ).collect()
    assert len(qrows) == 2
    assert all(lo <= r["est"] <= hi for r in qrows)
