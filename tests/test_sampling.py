"""Sampling / shuffle / packing tests (operators/sampling.py).

Value parity vs DuckDB is covered by test_oracle_parity (e8_*); these
pin the operator semantics and the two-phase-plan invariants.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.sampling import (
    deterministic_sample,
    global_shuffle,
    pack_sequences,
    rate_threshold,
    sample_to_budget,
    stratified_sample,
)


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_rate_threshold_edges():
    assert rate_threshold(0.0) == "0" * 32
    assert rate_threshold(1.0) == "g"
    assert len(rate_threshold(0.2)) == 32
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_sample_matches_python_md5(spark):
    # the engine decision must equal hashlib's digest comparison
    out = {
        r.doc_id
        for r in deterministic_sample(
            _ids(spark, 200), 0.3, ["doc_id"], seed="t"
        ).collect()
    }
    thr = rate_threshold(0.3)
    expected = {
        i
        for i in range(200)
        if hashlib.md5(f"t|{i}".encode()).hexdigest() < thr
    }
    assert out == expected
    assert 0 < len(out) < 200


def test_sample_is_stable_and_nested(spark):
    df = _ids(spark, 500)
    a = {r.doc_id for r in deterministic_sample(df, 0.2, ["doc_id"], "s").collect()}
    b = {r.doc_id for r in deterministic_sample(df, 0.2, ["doc_id"], "s").collect()}
    assert a == b
    # smaller rate with same seed is a subset (threshold monotone)
    c = {r.doc_id for r in deterministic_sample(df, 0.1, ["doc_id"], "s").collect()}
    assert c <= a


def test_hash_split_disjoint_exhaustive_and_stable(spark):
    from decision_tree_stuff_spark.operators.sampling import hash_split

    df = _ids(spark, 2000)
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"], "s")
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 2000  # exactly one split per row
    counts = {}
    for s in rows.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # membership is a pure function of (key, seed): rerun identical
    again = {
        r.doc_id: r.split
        for r in hash_split(
            df, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"], "s"
        ).collect()
    }
    assert rows == again


def test_hash_split_fraction_validation(spark):
    from decision_tree_stuff_spark.operators.sampling import hash_split

    with pytest.raises(ValueError, match="sum to 1.0"):
        hash_split(_ids(spark, 5), {"a": 0.5, "b": 0.4}, ["doc_id"])


def test_stratified_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zz") for i in range(1000)],
        "doc_id bigint, lang string",
    )
    out = stratified_sample(
        df, "lang", {"en": 1.0}, ["doc_id"], seed="s", default_rate=0.0
    ).collect()
    assert {r.lang for r in out} == {"en"}
    assert len(out) == 500


def test_global_shuffle_is_permutation(spark):
    rows = global_shuffle(_ids(spark, 777), ["doc_id"], seed="p").collect()
    assert sorted(r.shuffle_pos for r in rows) == list(range(777))
    # deterministic
    again = global_shuffle(_ids(spark, 777), ["doc_id"], seed="p").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in rows} == {
        (r.doc_id, r.shuffle_pos) for r in again
    }
    # a different seed is a different permutation
    other = global_shuffle(_ids(spark, 777), ["doc_id"], seed="q").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in rows} != {
        (r.doc_id, r.shuffle_pos) for r in other
    }


def test_pack_sequences_layout(spark):
    df = _ids(spark, 300).withColumn("n_tokens", F.lit(100))
    out = pack_sequences(df, "n_tokens", 512, ["doc_id"], seed="k").collect()
    # token stream = 300 docs x 100 tokens cut every 512: starts are
    # 0,100,...; offsets cycle mod 512; pack ids cover the full stream
    starts = sorted(r.pack_id * 512 + r.pack_offset for r in out)
    assert starts == [100 * i for i in range(300)]
    assert max(r.pack_id for r in out) == (299 * 100) // 512


def test_stream_deterministic_sample_equals_batch(spark, sf_dir, tmp_path):
    """The sampler is a stateless hash filter — it must run unchanged
    on a streaming DataFrame (append mode, no watermark needed) and
    select exactly the rows its batch twin selects."""
    import shutil

    from decision_tree_stuff_spark.queries import _events
    from decision_tree_stuff_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
    )

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")

    stream = deterministic_sample(
        read_events_stream(spark, str(d)), 0.25, ["user_id", "ts"], "st"
    )
    q = run_stream_to_memory(stream, "sample_stream_test", mode="append")
    try:
        cols = ["user_id", "ts", "event_type", "value"]

        def rows(df):
            return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())

        got = rows(spark.table("sample_stream_test"))
        want = rows(
            deterministic_sample(
                _events(spark, sf_dir), 0.25, ["user_id", "ts"], "st"
            )
        )
        assert got == want and 0 < len(got)
    finally:
        q.stop()


def test_stream_cap_per_group_equals_batch(spark, sf_dir, tmp_path):
    """E-8c on a stream: the foreachBatch compacted-state fold must
    end at EXACTLY the batch cap_per_group result over all input —
    including evictions (a later micro-batch carrying a lower-hash row
    displaces an earlier keeper, which the versioned-state merge
    handles and an append-only sink could not). Two parquet files +
    maxFilesPerTrigger=1 forces a genuinely multi-batch run."""
    from decision_tree_stuff_spark.operators.sampling import cap_per_group
    from decision_tree_stuff_spark.queries import _events
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        read_events_stream,
        stream_cap_per_group,
    )

    events = _events(spark, sf_dir)
    d = tmp_path / "events_cap_stream"
    d.mkdir()
    # split by user parity so both halves hit every event_type group —
    # guaranteeing cross-batch contention for the quota. The watch dir
    # needs PLAIN parquet files (the unit sniffer reads footers), so
    # lift each single part file out of its _write_ directory.
    import glob
    import shutil

    # write µs timestamps (not Spark's INT96 default) so the events
    # reader's unit sniffer sees a plain MICROS footer
    prev_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        for i, cond in enumerate(
            (F.col("user_id") % 2 == 0, F.col("user_id") % 2 == 1)
        ):
            staging = str(tmp_path / f"stage{i}")
            events.where(cond).coalesce(1).write.parquet(staging)
            part = glob.glob(f"{staging}/part-*.parquet")[0]
            shutil.move(part, str(d / f"half{i}.parquet"))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev_tt)

    state = str(tmp_path / "cap_state")
    q = stream_cap_per_group(
        read_events_stream(spark, str(d)),
        state,
        ["event_type"],
        7,
        ["user_id", "ts"],
        seed="sc",
    )
    assert q.lastProgress is not None
    import os

    versions = sorted(v for v in os.listdir(state) if v.startswith("v"))
    assert len(versions) >= 2, versions  # really ran multiple batches

    cols = ["user_id", "ts", "event_type", "value"]

    def rows(df):
        return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())

    got = rows(read_capped_state(spark, state))
    want = rows(cap_per_group(events, ["event_type"], 7, ["user_id", "ts"], seed="sc"))
    assert got == want and len(got) > 0


def test_pack_sequences_matches_driver_side_cumsum(spark):
    # irregular sizes: compare against a pure-Python prefix sum under
    # the same (md5, id) order
    import hashlib as hl

    sizes = {i: (i * 37) % 190 + 1 for i in range(250)}
    df = spark.createDataFrame(
        [(i, n) for i, n in sizes.items()], "doc_id bigint, n_tokens int"
    )
    out = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_sequences(df, "n_tokens", 256, ["doc_id"], seed="z").collect()
    }
    order = sorted(
        sizes, key=lambda i: (hl.md5(f"z|{i}".encode()).hexdigest(), i)
    )
    acc = 0
    for i in order:
        assert out[i] == (acc // 256, acc % 256), f"doc {i}"
        acc += sizes[i]


def test_pack_materialize_physical_packs(spark):
    """Every pack except the last is exactly seq_len tokens; the
    concatenated stream equals the docs' tokens laid out in
    deterministic shuffle order (straddlers split, nothing lost)."""
    import hashlib as hl

    from decision_tree_stuff_spark.operators.sampling import pack_materialize

    # irregular sizes incl. docs longer than seq_len (multi-straddle)
    # and an empty doc (must be dropped without shifting offsets)
    sizes = {i: (i * 61) % 300 for i in range(120)}
    rows = [(i, [f"t{i}_{j}" for j in range(n)]) for i, n in sizes.items()]
    df = spark.createDataFrame(rows, "doc_id bigint, toks array<string>")
    L = 128
    out = sorted(
        pack_materialize(df, "toks", L, ["doc_id"], seed="z").collect(),
        key=lambda r: r.pack_id,
    )

    total = sum(sizes.values())
    assert [r.pack_id for r in out] == list(range((total + L - 1) // L))
    for r in out[:-1]:
        assert r.n_tokens == L and len(r.tokens) == L
    assert out[-1].n_tokens == (total % L or L)
    # stream equality vs the single-node layout
    order = sorted(
        (i for i in sizes if sizes[i] > 0),
        key=lambda i: (hl.md5(f"z|{i}".encode()).hexdigest(), i),
    )
    want = [t for i in order for t in (f"t{i}_{j}" for j in range(sizes[i]))]
    got = [t for r in out for t in r.tokens]
    assert got == want


def test_k_fold_partitions_and_balance(spark):
    from decision_tree_stuff_spark.operators.sampling import k_fold

    df = _ids(spark, 5000)
    out = k_fold(df, 5, ["doc_id"], seed="cv")
    rows = out.collect()
    assert len(rows) == 5000                       # exhaustive, no dup rows
    sizes = {}
    for r in rows:
        assert 0 <= r.fold < 5
        sizes[r.fold] = sizes.get(r.fold, 0) + 1
    # hash-uniform balance: each fold within 15% of n/k
    for f in range(5):
        assert abs(sizes[f] - 1000) < 150, sizes
    # deterministic
    again = {(r.doc_id, r.fold) for r in k_fold(df, 5, ["doc_id"], seed="cv").collect()}
    assert {(r.doc_id, r.fold) for r in rows} == again
    # plan: shuffle-free projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    import pytest

    with pytest.raises(ValueError):
        k_fold(df, 1, ["doc_id"])


def _weighted_docs(spark):
    rows = [(i, "en" if i % 3 else "de", 10 + (i % 7)) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string, w bigint")


def test_sample_to_budget_fills_within_one_doc(spark):
    """Each stratum's kept weight lands within one document of the
    budget (never over), unbudgeted strata drop, and the kept set is
    the hash-first prefix — deterministic across calls."""
    df = _weighted_docs(spark)
    budgets = {"en": 500, "de": 200}
    out = sample_to_budget(
        df, "lang", budgets, ["doc_id"], seed="b", weight_col="w"
    )
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) <= set(budgets)
    for lang, rs in by_lang.items():
        total = sum(r.w for r in rs)
        assert total <= budgets[lang]
        # within one max-weight doc of the budget (nothing more fits)
        assert budgets[lang] - total < 17
    again = {r.doc_id for r in sample_to_budget(
        df, "lang", budgets, ["doc_id"], seed="b", weight_col="w"
    ).collect()}
    assert {r.doc_id for r in rows} == again


def test_sample_to_budget_row_count_mode(spark):
    """weight_col=None counts rows: exactly k per stratum (when the
    stratum has at least k rows)."""
    df = _weighted_docs(spark)
    out = sample_to_budget(df, "lang", {"en": 10, "de": 3}, ["doc_id"], seed="b")
    sizes = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"en": 10, "de": 3}


def test_sample_to_budget_seed_changes_selection(spark):
    df = _weighted_docs(spark)
    a = {r.doc_id for r in sample_to_budget(df, "lang", {"en": 20}, ["doc_id"], seed="s1").collect()}
    b = {r.doc_id for r in sample_to_budget(df, "lang", {"en": 20}, ["doc_id"], seed="s2").collect()}
    assert a != b and len(a) == len(b) == 20


def test_sample_to_budget_window_parallelizes_on_bucket(spark):
    """Scale pin: the running-sum window must partition on (stratum,
    hash bucket) — 256-way parallel per stratum — never on the
    stratum alone (a single-task sort of the largest domain)."""
    out = sample_to_budget(
        _weighted_docs(spark), "lang", {"en": 500}, ["doc_id"],
        seed="b", weight_col="w",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(lang" in plan and "_bucket" in plan.split(
        "hashpartitioning(lang", 1
    )[1][:60]


def test_sample_to_budget_refuses_reserved_columns(spark):
    df = _weighted_docs(spark).withColumn("_cum", F.lit(1))
    with pytest.raises(ValueError, match="_cum"):
        sample_to_budget(df, "lang", {"en": 10}, ["doc_id"])


def test_sample_to_budget_rejects_negative_weights(spark):
    """A negative weight breaks prefix-sum monotonicity (rows past the
    boundary could re-qualify, silently overshooting the budget) — the
    weight expression must raise at execution, not mis-sample."""
    df = _weighted_docs(spark).withColumn(
        "w", F.when(F.col("doc_id") == 7, F.lit(-5)).otherwise(F.col("w"))
    )
    with pytest.raises(Exception, match="negative or null weight"):
        sample_to_budget(
            df, "lang", {"en": 500, "de": 200}, ["doc_id"],
            seed="b", weight_col="w",
        ).collect()


def test_cap_per_group_quota_and_determinism(spark):
    """At most n survivors per group; the surviving set is a pure
    function of (group, keys, seed) — two independent plans agree —
    and a different seed picks a different (valid) subset."""
    from decision_tree_stuff_spark.operators.sampling import cap_per_group

    rows = [(i, "g%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    a = cap_per_group(df, ["grp"], 20, ["doc_id"], seed="s1")
    counts = {r["grp"]: r["n"] for r in
              a.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 20, "g1": 20, "g2": 20}
    b = cap_per_group(df, ["grp"], 20, ["doc_id"], seed="s1")
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())
    c = cap_per_group(df, ["grp"], 20, ["doc_id"], seed="s2")
    assert sorted(r["doc_id"] for r in c.collect()) != \
           sorted(r["doc_id"] for r in a.collect())


def test_cap_per_group_small_groups_untouched(spark):
    from decision_tree_stuff_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, grp string"
    )
    assert cap_per_group(df, ["grp"], 10, ["doc_id"]).count() == 3


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every member of a near-dup cluster lands in the SAME split —
    including multi-hop clusters — and the assignment covers all docs
    disjointly."""
    from decision_tree_stuff_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id bigint"
    )
    # chain 0-1-2 (transitive), pair 10-11, rest isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a bigint, id_b bigint"
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t"
    )
    rows = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    assert len(rows) == 40
    assert rows[0] == rows[1] == rows[2]
    assert rows[10] == rows[11]
    assert rows[0][0] == 0 and rows[10][0] == 10
    assert set(s for _, s in rows.values()) <= {"train", "val", "test"}


def test_filter_by_quantile_modes_and_bounds(spark):
    from decision_tree_stuff_spark.operators.sampling import (
        filter_by_quantile,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(101)], "id bigint, score double"
    )
    top = filter_by_quantile(df, "score", 0.9)
    assert sorted(r["id"] for r in top.collect()) == list(range(90, 101))
    bottom = filter_by_quantile(df, "score", 0.1, keep="bottom")
    assert sorted(r["id"] for r in bottom.collect()) == list(range(0, 11))
    # approx sketch lands within a small rank error of exact
    approx = filter_by_quantile(df, "score", 0.9, mode="approx").count()
    assert abs(approx - 11) <= 3
    with pytest.raises(ValueError, match="q must be"):
        filter_by_quantile(df, "score", 1.5)
    with pytest.raises(ValueError, match="mode must be"):
        filter_by_quantile(df, "score", 0.5, mode="tdigest")


def test_filter_by_quantile_rejects_reserved_column(spark):
    from decision_tree_stuff_spark.operators.sampling import (
        filter_by_quantile,
    )

    df = spark.createDataFrame(
        [(1, 1.0, "x")], "id bigint, score double, __thr string"
    )
    with pytest.raises(ValueError, match="__thr"):
        filter_by_quantile(df, "score", 0.5)


def test_weighted_sample_statistics_and_determinism(spark):
    """Efraimidis-Spirakis correctness: over many independent trials
    (trial id inside the hash key), an n=1 weighted sample includes
    each item with probability ~ w/sum(w); the draw is byte-stable
    across invocations; zero/null weights never sampled."""
    from decision_tree_stuff_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    trials = 400
    items = [("a", 1.0), ("b", 2.0), ("c", 7.0), ("z", 0.0)]
    rows = [(t, i, w) for t in range(trials) for i, w in items]
    df = spark.createDataFrame(rows, "trial int, item string, w double")
    out = weighted_sample_per_group(
        df, ["trial"], 1, "w", ["trial", "item"], seed="stat"
    )
    got = [r["item"] for r in out.collect()]
    assert len(got) == trials
    freq = {i: got.count(i) / trials for i, _ in items}
    assert freq["z"] == 0.0
    for item, p in (("a", 0.1), ("b", 0.2), ("c", 0.7)):
        assert abs(freq[item] - p) < 0.08, (item, freq)
    # determinism
    again = [r["item"] for r in weighted_sample_per_group(
        df, ["trial"], 1, "w", ["trial", "item"], seed="stat"
    ).collect()]
    assert sorted(got) == sorted(again)


def test_weighted_sample_plan_uses_window_group_limit(spark, sf_dir):
    """Same plan class as cap_per_group: the row_number <= n filter
    must be recognized as WindowGroupLimit so map tasks pre-prune
    before the group shuffle."""
    from decision_tree_stuff_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    plan = (
        weighted_sample_per_group(
            docs, ["lang"], 10, "n_chars", ["doc_id"], "ws7"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:1200]


def test_temperature_sample_allocation_hand_math(spark):
    """Exact largest-remainder allocation: alpha=0.5 over counts
    {a:100, b:25, c:4} -> weights {10, 5, 2} -> shares of n=10 are
    ideal {5.882.., 2.941.., 1.176..} -> floors {5, 2, 1} + 2 leftover
    seats to the largest remainders (a: .88, b: .94 -> b, a) ->
    {6, 3, 1}; allocation caps at group size."""
    from decision_tree_stuff_spark.operators.sampling import (
        temperature_sample,
    )

    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(25)]
        + [(2000 + i, "c") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, g string")
    out = temperature_sample(df, "g", 10, 0.5, ["doc_id"], seed="hm")
    got = {g: 0 for g in "abc"}
    for r in out.collect():
        got[r["g"]] += 1
    assert got == {"a": 6, "b": 3, "c": 1}, got
    # alpha=1.0 -> proportional: ideal {7.75, 1.94, 0.31} -> floors
    # {7, 1, 0} + 2 seats to remainders (b .94, a .75) -> {8, 2, 0}
    out1 = temperature_sample(df, "g", 10, 1.0, ["doc_id"], seed="hm")
    got1 = {g: 0 for g in "abc"}
    for r in out1.collect():
        got1[r["g"]] += 1
    assert got1 == {"a": 8, "b": 2, "c": 0}, got1
    # cap at group size: huge budget can't oversample a group
    out2 = temperature_sample(df, "g", 1000, 0.0, ["doc_id"], seed="hm")
    got2 = {g: 0 for g in "abc"}
    for r in out2.collect():
        got2[r["g"]] += 1
    assert got2["c"] == 4 and got2["a"] <= 100, got2
    # determinism
    again = sorted(r["doc_id"] for r in temperature_sample(
        df, "g", 10, 0.5, ["doc_id"], seed="hm").collect())
    assert sorted(r["doc_id"] for r in out.collect()) == again


def test_stream_weighted_sample_equals_batch(spark, tmp_path):
    """Streamed ES weighted sample over 3 micro-batches ends at
    EXACTLY the batch result over all input, including cross-batch
    evictions (the selection key is row-fixed, so the fold is
    mergeable — same algebra as the cap fold)."""
    import glob
    import shutil

    from decision_tree_stuff_spark.operators.sampling import (
        weighted_sample_per_group,
    )
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_weighted_sample_per_group,
    )

    rows = [
        (i, "g%d" % (i % 2), float(1 + (i * 13) % 50)) for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, g string, w double")
    d = tmp_path / "in"
    d.mkdir()
    for i in range(3):
        staging = str(tmp_path / f"s{i}")
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(staging)
        shutil.move(
            glob.glob(f"{staging}/part-*.parquet")[0],
            str(d / f"b{i}.parquet"),
        )

    state = str(tmp_path / "state")
    stream_weighted_sample_per_group(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d)),
        state,
        ["g"],
        7,
        "w",
        ["doc_id"],
        seed="sws",
    )
    cols = ["doc_id", "g", "w"]

    def rows_of(df):
        return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())

    got = rows_of(read_capped_state(spark, state))
    want = rows_of(
        weighted_sample_per_group(docs, ["g"], 7, "w", ["doc_id"], seed="sws")
    )
    assert got == want and len(got) == 14
    # winners span multiple micro-batches -> the fold really evicted
    assert len({int(r[0]) % 3 for r in got}) >= 2


def test_temperature_allocation_matches_python_largest_remainder(spark):
    """Hypothesis differential: the in-plan largest-remainder
    allocation equals a pure-Python reference implementation across
    random group-count tables, alphas, and budgets."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from decision_tree_stuff_spark.operators.sampling import (
        temperature_sample,
    )

    def py_alloc(counts, total_n, alpha):
        ws = {g: c**alpha for g, c in counts.items()}
        wsum = sum(ws.values())
        ideal = {g: round(total_n * w / wsum, 9) for g, w in ws.items()}
        base = {g: int(ideal[g] // 1) for g in ws}
        left = total_n - sum(base.values())
        order = sorted(ws, key=lambda g: (-(ideal[g] - base[g]), g))
        for g in order[:left]:
            base[g] += 1
        return {g: min(base[g], counts[g]) for g in ws}

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        counts=st.dictionaries(
            st.sampled_from(list("abcdef")),
            st.integers(1, 40), min_size=2, max_size=5,
        ),
        total_n=st.integers(1, 60),
        alpha=st.sampled_from([0.0, 0.3, 0.5, 1.0]),
    )
    def check(counts, total_n, alpha):
        rows = [
            (g_i * 1000 + i, g)
            for g_i, (g, c) in enumerate(sorted(counts.items()))
            for i in range(c)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, g string")
        got = {}
        for r in temperature_sample(
            df, "g", total_n, alpha, ["doc_id"], seed="h"
        ).collect():
            got[r["g"]] = got.get(r["g"], 0) + 1
        want = {g: n for g, n in py_alloc(counts, total_n, alpha).items() if n}
        assert got == want, (counts, total_n, alpha, got, want)

    check()


class TestFilterByQuantileGrouped:
    def _df(self, spark):
        rows = [("a", i) for i in (1, 2, 3, 4)] + [("b", i) for i in (10, 20)]
        return spark.createDataFrame(rows, "grp string, v long")

    def test_per_group_hand_math_top(self, spark):
        from decision_tree_stuff_spark.operators.sampling import (
            filter_by_quantile_grouped,
        )

        # P50: grp a -> 2.5 keeps {3,4}; grp b -> 15.0 keeps {20}
        got = sorted(
            (r["grp"], r["v"])
            for r in filter_by_quantile_grouped(
                self._df(spark), "v", 0.5, ["grp"]
            ).collect()
        )
        assert got == [("a", 3), ("a", 4), ("b", 20)]

    def test_per_group_hand_math_bottom(self, spark):
        from decision_tree_stuff_spark.operators.sampling import (
            filter_by_quantile_grouped,
        )

        got = sorted(
            (r["grp"], r["v"])
            for r in filter_by_quantile_grouped(
                self._df(spark), "v", 0.5, ["grp"], keep="bottom"
            ).collect()
        )
        assert got == [("a", 1), ("a", 2), ("b", 10)]

    def test_single_group_matches_global(self, spark):
        from decision_tree_stuff_spark.operators.sampling import (
            filter_by_quantile,
            filter_by_quantile_grouped,
        )

        df = self._df(spark).withColumn("one", F.lit(1))
        a = sorted(
            (r["grp"], r["v"])
            for r in filter_by_quantile_grouped(
                df, "v", 0.75, ["one"]
            ).collect()
        )
        b = sorted(
            (r["grp"], r["v"])
            for r in filter_by_quantile(
                df.drop("one"), "v", 0.75
            ).collect()
        )
        assert a == b

    def test_threshold_join_broadcasts(self, spark):
        from decision_tree_stuff_spark.operators.sampling import (
            filter_by_quantile_grouped,
        )

        plan = (
            filter_by_quantile_grouped(self._df(spark), "v", 0.5, ["grp"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_validation_errors(self, spark):
        from decision_tree_stuff_spark.operators.sampling import (
            filter_by_quantile_grouped,
        )

        df = self._df(spark)
        with pytest.raises(ValueError, match="non-empty"):
            filter_by_quantile_grouped(df, "v", 0.5, [])
        with pytest.raises(ValueError, match="__thr"):
            filter_by_quantile_grouped(
                df.withColumn("__thr", F.lit(1)), "v", 0.5, ["grp"]
            )
