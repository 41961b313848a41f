"""Curation operators: deterministic hash split + PII scrub + token top-n."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from asctb_ct_label_mapper_spark.operators.curation import hash_split, pii_scrub
from asctb_ct_label_mapper_spark.operators.textstats import token_topn


def test_hash_split_deterministic_and_partition_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    # same ids, different partitioning and row order -> identical assignment
    shuffled = df.repartition(7).orderBy(F.desc("doc_id"))
    b = {r["doc_id"]: r["split"] for r in hash_split(shuffled, "doc_id").collect()}
    assert a == b
    # buckets in range, all three splits materialize at sane proportions
    rows = hash_split(df, "doc_id").collect()
    assert all(0 <= r["bucket"] < 100 for r in rows)
    frac_train = sum(r["split"] == "train" for r in rows) / len(rows)
    frac_val = sum(r["split"] == "val" for r in rows) / len(rows)
    assert 0.7 < frac_train < 0.9 and 0.05 < frac_val < 0.15


def test_hash_split_plan_is_narrow(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_split(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-row expressions only


def test_pii_scrub_fixture(spark):
    rows = [
        (1, "write to alice.smith+x@sub.example.co.uk today"),
        (2, "server at 192.168.0.1 port 80"),
        (3, "call +1 (555) 123-4567 now"),
        (4, "two mails a@b.io and c_d%e@f-g.org"),
        (5, "clean text only"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scrub(df, "text").collect()}
    assert got[1]["scrubbed"] == "write to <EMAIL> today"
    assert got[1]["n_email"] == 1
    assert got[2]["scrubbed"] == "server at <IP> port 80"
    assert got[2]["n_ipv4"] == 1
    assert got[3]["scrubbed"] == "call <PHONE> now"
    assert got[3]["n_phone"] == 1
    assert got[4]["n_email"] == 2 and got[4]["scrubbed"].count("<EMAIL>") == 2
    assert got[5]["scrubbed"] == "clean text only"
    assert got[5]["n_email"] == got[5]["n_ipv4"] == got[5]["n_phone"] == 0
    assert got[6]["scrubbed"] is None  # null text propagates


def test_token_topn_tie_break_deterministic(spark):
    # b and c tie at 2 occurrences -> token-ascending breaks the tie
    df = spark.createDataFrame(
        [(1, "a a a b c"), (2, "b c a")], ["doc_id", "text"]
    )
    rows = token_topn(df, 3).orderBy("rank").collect()
    assert [(r["token"], r["cnt"], r["rank"]) for r in rows] == [
        ("a", 4, 1),
        ("b", 2, 2),
        ("c", 2, 3),
    ]
    # doc_freq counts documents, not occurrences
    assert rows[0]["doc_freq"] == 2


def test_stratified_sample_deterministic_and_proportional(spark):
    from asctb_ct_label_mapper_spark.operators.curation import stratified_sample

    df = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("grp", F.when(F.col("doc_id") % 4 == 0, "a").otherwise("b"))
    )
    frac = {"a": 0.5, "b": 0.1}
    kept = stratified_sample(df, "doc_id", "grp", frac)
    # same membership regardless of partitioning / order
    again = stratified_sample(df.repartition(9).orderBy(F.desc("doc_id")), "doc_id", "grp", frac)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    by_grp = {r["grp"]: r["n"] for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert 0.4 < by_grp["a"] / 1000 < 0.6
    assert 0.05 < by_grp["b"] / 3000 < 0.15
    # unknown stratum defaults to dropped
    other = df.withColumn("grp", F.lit("zz"))
    assert stratified_sample(other, "doc_id", "grp", frac).count() == 0
    # plan stays narrow
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_rules_fixture(spark):
    from asctb_ct_label_mapper_spark.operators.curation import quality_rules

    long_doc = " ".join(["the", "team", "have", "data", "sets"] * 12)  # 60 words
    rows = [
        (1, long_doc),  # passes everything
        (2, "short doc only"),  # fails word count + stopwords
        (3, " ".join(["####"] * 60)),  # symbols, no alpha, no stopwords
        (4, " ".join(["supercalifragilistic"] * 60)),  # mean len too high
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in quality_rules(df).collect()}

    assert out[1]["passes_all"] == 1
    assert out[1]["n_words"] == 60 and out[1]["n_stop_hits"] >= 2

    assert out[2]["passes_word_count"] == 0
    assert out[2]["passes_all"] == 0

    assert out[3]["passes_symbol"] == 0
    assert out[3]["passes_alpha"] == 0
    assert out[3]["passes_stopwords"] == 0

    assert out[4]["passes_mean_len"] == 0
    assert out[4]["mean_word_len"] == 20.0


def test_quality_rules_plan_is_narrow(spark):
    from asctb_ct_label_mapper_spark.operators.curation import quality_rules

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = quality_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from asctb_ct_label_mapper_spark.operators.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(150))  # 150 tokens, not a multiple
    df = spark.createDataFrame([(1, text), (2, "a b c")], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_size=64, overlap=16).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # stride 48, bound n - overlap - 1 = 133: starts 0, 48, 96 — the
    # start-96 chunk reaches the end (96..149), so no start-144 window is
    # emitted (it would be fully contained in its predecessor: pure
    # duplicate content downstream)
    assert [r["start_token"] for r in d1] == [0, 48, 96]
    assert [r["chunk_len"] for r in d1] == [64, 64, 54]
    # consecutive full chunks share exactly `overlap` tokens
    c0, c1 = d1[0]["chunk_text"].split(" "), d1[1]["chunk_text"].split(" ")
    assert c0[-16:] == c1[:16]
    # every token appears in at least one chunk
    covered = set()
    for r in d1:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(150)}
    # short doc: single chunk, intact
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b c"
    assert d2[0]["chunk_len"] == 3


def test_chunk_documents_plan_is_narrow(spark):
    from asctb_ct_label_mapper_spark.operators.curation import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    plan = (
        chunk_documents(df, 4, 1)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # generator + slice, zero shuffle


def test_mixture_budget_meets_but_never_overshoots_start(spark):
    from asctb_ct_label_mapper_spark.operators.curation import (
        mixture_budget_sample,
    )

    rows = [(i, "s0" if i % 2 else "s1", "tok " * 10 + "end") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])  # 11 tokens
    out = mixture_budget_sample(
        df, budgets={"s0": 100, "s1": 55}, default_budget=0
    ).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    # every selected doc started under budget; totals meet the budget
    assert set(by_group) == {"s0", "s1"}
    for g, budget in (("s0", 100), ("s1", 55)):
        sel = by_group[g]
        assert all(r["tokens_before"] < budget for r in sel)
        assert sum(r["n_tokens"] for r in sel) >= budget
        # minimality: dropping the last-started doc falls under budget
        last = max(r["tokens_before"] for r in sel)
        assert sum(r["n_tokens"] for r in sel if r["tokens_before"] != last) < budget


def test_mixture_budget_is_partition_independent(spark):
    from asctb_ct_label_mapper_spark.operators.curation import (
        mixture_budget_sample,
    )

    rows = [(i, f"s{i % 3}", "x " * (i % 7 + 1) + "y") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    budgets = {"s0": 50, "s1": 80, "s2": 30}
    a = {r["doc_id"] for r in mixture_budget_sample(df, budgets).collect()}
    b = {
        r["doc_id"]
        for r in mixture_budget_sample(
            df.repartition(13).orderBy(F.desc("doc_id")), budgets
        ).collect()
    }
    assert a == b


def test_capped_sample_exact_counts_and_determinism(spark):
    from asctb_ct_label_mapper_spark.operators.curation import capped_sample

    rows = [(i, f"g{i % 4}", i * 2) for i in range(200)] + [(900, "tiny", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "v"])
    out = capped_sample(df, 10, group_col="lang").collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["lang"], []).append(r)
    # full groups give exactly n; undersized groups give all they have
    assert {g: len(v) for g, v in by_g.items()} == {
        "g0": 10, "g1": 10, "g2": 10, "g3": 10, "tiny": 1
    }
    assert all(
        sorted(r["sample_rank"] for r in v) == list(range(1, len(v) + 1))
        for v in by_g.values()
    )
    # partition-independence: repartitioned input selects the same ids
    a = {r["doc_id"] for r in out}
    b = {
        r["doc_id"]
        for r in capped_sample(
            df.repartition(11).orderBy(F.desc("doc_id")), 10, group_col="lang"
        ).collect()
    }
    assert a == b


class TestWeightedSample:
    def test_deterministic_and_exact_n(self, spark, sf_dir):
        from asctb_ct_label_mapper_spark.schemas import load_table
        from asctb_ct_label_mapper_spark.operators.curation import weighted_sample

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        a = weighted_sample(docs, 50, "n_chars").collect()
        b = weighted_sample(docs.repartition(7), 50, "n_chars").collect()
        assert len(a) == 50
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]

    def test_weights_bias_selection(self, spark):
        """Rows with 100x the weight must be overwhelmingly more likely
        selected: ES keys ln(u)/w concentrate near 0 for large w."""
        from asctb_ct_label_mapper_spark.operators.curation import weighted_sample

        rows = [(i, 1000.0 if i < 100 else 1.0) for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        picked = [r["doc_id"] for r in weighted_sample(df, 100, "w").collect()]
        heavy = sum(1 for d in picked if d < 100)
        assert heavy >= 80, f"heavy rows underrepresented: {heavy}/100"

    def test_nonpositive_weights_excluded(self, spark):
        from asctb_ct_label_mapper_spark.operators.curation import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double",
        )
        got = [r["doc_id"] for r in weighted_sample(df, 10, "w").collect()]
        assert got == [1]

    def test_plan_is_take_ordered(self, spark, sf_dir):
        from asctb_ct_label_mapper_spark.schemas import load_table
        from asctb_ct_label_mapper_spark.operators.curation import weighted_sample

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        plan = (
            weighted_sample(docs, 50, "n_chars")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan  # heaps, not a sort shuffle


class TestShuffleShards:
    def test_permutation_covers_all_and_is_deterministic(self, spark, sf_dir):
        from asctb_ct_label_mapper_spark.schemas import load_table
        from asctb_ct_label_mapper_spark.operators.curation import shuffle_shards

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        n = docs.count()
        a = shuffle_shards(docs, n_shards=8, seed=3).collect()
        b = shuffle_shards(docs.repartition(5), n_shards=8, seed=3).collect()
        assert len(a) == n
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # (shard, pos) is a proper positioning: unique per shard, 1..size
        by_shard = {}
        for r in a:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for positions in by_shard.values():
            assert sorted(positions) == list(range(1, len(positions) + 1))

    def test_seed_changes_permutation_not_coverage(self, spark, sf_dir):
        from asctb_ct_label_mapper_spark.schemas import load_table
        from asctb_ct_label_mapper_spark.operators.curation import shuffle_shards

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        s1 = {(r["doc_id"], r["shard"], r["pos"])
              for r in shuffle_shards(docs, 8, seed=1).collect()}
        s2 = {(r["doc_id"], r["shard"], r["pos"])
              for r in shuffle_shards(docs, 8, seed=2).collect()}
        assert {t[0] for t in s1} == {t[0] for t in s2}  # same docs
        assert s1 != s2  # different epoch order

    def test_shards_roughly_balanced(self, spark, sf_dir):
        from asctb_ct_label_mapper_spark.schemas import load_table
        from asctb_ct_label_mapper_spark.operators.curation import shuffle_shards

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        n = docs.count()
        sizes = [
            r["c"]
            for r in shuffle_shards(docs, 8, seed=0)
            .groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()
        ]
        assert len(sizes) == 8
        assert max(sizes) < 2 * (n / 8)  # md5 uniformity, generous bound


class TestLeakageSafeSplit:
    def test_no_pair_straddles_splits(self, spark, sf_dir):
        from asctb_ct_label_mapper_spark.operators.curation import (
            leakage_safe_split,
        )
        from asctb_ct_label_mapper_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )
        from asctb_ct_label_mapper_spark.schemas import load_table

        docs = load_table(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(docs, "text", "doc_id", "lang", threshold=0.05)
        out = leakage_safe_split(docs.select("doc_id"), pairs)
        split_of = {r["doc_id"]: r["split"] for r in out.collect()}
        pr = pairs.select("id_a", "id_b").collect()
        assert len(pr) > 0
        for r in pr:
            assert split_of[r["id_a"]] == split_of[r["id_b"]]
        # every doc assigned exactly once, all three splits present
        assert len(split_of) == docs.count()
        assert set(split_of.values()) == {"train", "val", "test"}

    def test_plain_hash_split_does_leak_here(self, spark, sf_dir):
        """The motivating counterexample: per-doc hashing separates at
        least one near-dup pair on this fixture (else the guard would be
        vacuous)."""
        from asctb_ct_label_mapper_spark.operators.curation import hash_split
        from asctb_ct_label_mapper_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )
        from asctb_ct_label_mapper_spark.schemas import load_table

        docs = load_table(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(docs, "text", "doc_id", "lang", threshold=0.05)
        split_of = {
            r["doc_id"]: r["split"]
            for r in hash_split(docs.select("doc_id"), "doc_id").collect()
        }
        crossings = sum(
            1
            for r in pairs.select("id_a", "id_b").collect()
            if split_of[r["id_a"]] != split_of[r["id_b"]]
        )
        assert crossings > 0


def test_mixture_report_shares_sum_to_one(spark, sf_dir):
    from asctb_ct_label_mapper_spark.operators.curation import mixture_report
    from asctb_ct_label_mapper_spark.schemas import load_table

    rows = mixture_report(load_table(spark, sf_dir, "documents"), "source").collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    # cumulative share is monotone in the (tokens desc) order and ends at 1
    ordered = sorted(rows, key=lambda r: (-r["n_tokens"], r["source"]))
    cums = [r["cum_share"] for r in ordered]
    assert cums == sorted(cums) and abs(cums[-1] - 1.0) < 1e-6


def test_weighted_sample_threshold_matches_exact(spark, sf_dir):
    """The two-pass threshold plan selects the IDENTICAL set (same keys,
    same ordering) as the one-pass global top-n."""
    from asctb_ct_label_mapper_spark.operators.curation import (
        weighted_sample,
        weighted_sample_threshold,
    )
    from asctb_ct_label_mapper_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    exact = [tuple(r) for r in weighted_sample(docs, 50, "n_chars").collect()]
    two_pass = [
        tuple(r) for r in weighted_sample_threshold(docs, 50, "n_chars").collect()
    ]
    assert exact == two_pass
    # n larger than the table: both return everything, still equal
    big_e = [tuple(r) for r in weighted_sample(docs, 10_000, "n_chars").collect()]
    big_t = [
        tuple(r)
        for r in weighted_sample_threshold(docs, 10_000, "n_chars").collect()
    ]
    assert big_e == big_t


# --- global rank ------------------------------------------------------------


def test_global_rank_matches_single_window_definition(spark):
    from asctb_ct_label_mapper_spark.operators.curation import global_rank

    rows = [(i, (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = global_rank(
        df,
        bucket=(F.col("n_chars") / 10).cast("long"),
        order_cols=["n_chars", "doc_id"],
    ).collect()
    expect = {
        r[0]: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert len(out) == 200
    for r in out:
        assert r["global_rank"] == expect[r["doc_id"]]


def test_global_rank_dense_and_skew_tolerant(spark):
    from asctb_ct_label_mapper_spark.operators.curation import global_rank

    # all rows land in ONE bucket: still correct, just less parallel
    df = spark.createDataFrame([(i, 5) for i in range(50)], "doc_id long, v long")
    got = sorted(
        r["global_rank"]
        for r in global_rank(
            df, bucket=F.lit(0), order_cols=["v", "doc_id"]
        ).collect()
    )
    assert got == list(range(1, 51))


# --- largest-remainder proportional sample ----------------------------------


def test_proportional_sample_hamilton_allocation(spark):
    from asctb_ct_label_mapper_spark.operators.curation import (
        proportional_sample,
    )

    # 7/5/3 rows over total=10: exact quotas 4.666/3.333/2.0 ->
    # base 4/3/2 (sum 9), one leftover seat -> largest remainder 'a'
    rows = (
        [(i, "a") for i in range(7)]
        + [(100 + i, "b") for i in range(5)]
        + [(200 + i, "c") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = proportional_sample(df, total=10).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(out) == 10
    assert {k: len(v) for k, v in by_lang.items()} == {"a": 5, "b": 3, "c": 2}


def test_proportional_sample_exact_total_when_fractions_collide(spark):
    from asctb_ct_label_mapper_spark.operators.curation import (
        proportional_sample,
    )

    # four equal strata, total=10: 2.5 each -> base 2, two +1 seats by
    # group-name tie-break (all remainders equal)
    rows = [(g * 100 + i, f"g{g}") for g in range(4) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = proportional_sample(df, total=10).collect()
    sizes = {}
    for r in out:
        sizes[r["lang"]] = sizes.get(r["lang"], 0) + 1
    assert len(out) == 10
    assert sorted(sizes.values()) == [2, 2, 3, 3]
    assert sizes["g0"] == 3 and sizes["g1"] == 3  # deterministic tie-break


def test_global_rank_with_sampled_equi_depth_buckets(spark):
    from asctb_ct_label_mapper_spark.operators.curation import (
        global_rank,
        rank_buckets_from_sample,
    )

    # heavily skewed order column: 90% zeros — fixed-width buckets would
    # put 90% of rows in one bucket; equi-depth cuts still rank correctly
    rows = [(i, 0) for i in range(90)] + [(90 + i, i + 1) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    bucket = rank_buckets_from_sample(df, "v", n_buckets=8)
    out = global_rank(df, bucket=bucket, order_cols=["v", "doc_id"]).collect()
    expect = {
        r[0]: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert {r["doc_id"]: r["global_rank"] for r in out} == expect


def test_rank_buckets_route_nulls_first(spark):
    """Spark's ascending sort is NULLS FIRST; the sampled bucket
    expression must agree or global_rank breaks on nullable columns."""
    from asctb_ct_label_mapper_spark.operators.curation import (
        global_rank,
        rank_buckets_from_sample,
    )

    df = spark.createDataFrame(
        [(1, None), (2, 10), (3, 20)], "doc_id long, v long"
    )
    bucket = rank_buckets_from_sample(df, "v", n_buckets=4)
    out = {r["doc_id"]: r["global_rank"]
           for r in global_rank(df, bucket=bucket, order_cols=["v", "doc_id"]).collect()}
    assert out == {1: 1, 2: 2, 3: 3}  # NULL row ranks FIRST


def test_global_rank_null_buckets_rank_first_not_dropped(spark):
    from asctb_ct_label_mapper_spark.operators.curation import global_rank

    # NULL n_chars -> NULL bucket; Spark's ascending sort is NULLS FIRST,
    # so those rows must take the first ranks — and must NOT vanish.
    rows = [(1, None), (2, 10), (3, None), (4, 25), (5, 3)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {
        r["doc_id"]: r["global_rank"]
        for r in global_rank(
            df,
            bucket=(F.col("n_chars") / 10).cast("long"),
            order_cols=["n_chars", "doc_id"],
        ).collect()
    }
    assert out == {1: 1, 3: 2, 5: 3, 2: 4, 4: 5}


def test_negative_samples_uniform_no_self_deterministic(spark):
    from asctb_ct_label_mapper_spark.operators.curation import negative_samples

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = negative_samples(df, "doc_id", n_neg=4).collect()
    assert len(out) == 200
    for r in out:
        assert r["neg_id"] != r["doc_id"]  # cyclic shift is nonzero
        assert 0 <= r["neg_id"] < 50
    # deterministic: second run identical
    again = negative_samples(df, "doc_id", n_neg=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # roughly uniform usage as negatives (chi-square-ish loose bound)
    from collections import Counter

    c = Counter(r["neg_id"] for r in out)
    assert max(c.values()) <= 16  # mean 4; a hard hotspot would exceed


def test_negative_samples_two_rows_edge(spark):
    from asctb_ct_label_mapper_spark.operators.curation import negative_samples

    df = spark.createDataFrame([(7,), (9,)], "doc_id long")
    out = negative_samples(df, "doc_id", n_neg=2).collect()
    # only possible partner is the other row
    assert all(
        (r["doc_id"], r["neg_id"]) in {(7, 9), (9, 7)} for r in out
    ) and len(out) == 4


def test_kfold_assign_deterministic_partition_and_balance(spark):
    from asctb_ct_label_mapper_spark.operators.curation import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = kfold_assign(df, "doc_id", k=5).collect()
    folds = [r["fold"] for r in out]
    assert set(folds) == {0, 1, 2, 3, 4}
    from collections import Counter

    c = Counter(folds)
    assert max(c.values()) - min(c.values()) < 150  # roughly balanced
    again = {r["doc_id"]: r["fold"] for r in
             kfold_assign(df.repartition(7), "doc_id", k=5).collect()}
    assert all(again[r["doc_id"]] == r["fold"] for r in out)  # partition-proof


def test_pareto_coverage_minimal_set(spark):
    """Groups sort by weight desc; the Pareto set is the minimal prefix
    whose cumulative share reaches the target; shares sum to 1."""
    from pyspark.sql import functions as F

    from asctb_ct_label_mapper_spark.operators.curation import (
        pareto_coverage,
    )

    rows = [("a", 70), ("b", 20), ("c", 6), ("d", 4)]
    df = spark.createDataFrame(rows, "src string, n long")
    out = {r["g"]: r for r in
           pareto_coverage(df, "src", F.col("n"), target=0.8).collect()}
    assert out["a"]["in_pareto"] and out["b"]["in_pareto"]
    assert not out["c"]["in_pareto"] and not out["d"]["in_pareto"]
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-6
    assert out["d"]["cum_share"] == 1.0


def test_mixture_temperature_flattens_shares(spark):
    """T=1 reproduces raw shares; higher T pulls shares toward
    uniform; budgets sum to ~the total."""
    from asctb_ct_label_mapper_spark.operators.curation import (
        mixture_temperature,
    )

    rows = [(i, "big" if i < 90 else "small", "w " * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    t1 = {r["source"]: r for r in mixture_temperature(df, 1000, 1.0).collect()}
    assert t1["big"]["p_temp"] == t1["big"]["p_raw"] == 0.9
    t4 = {r["source"]: r for r in mixture_temperature(df, 1000, 4.0).collect()}
    assert t1["small"]["p_temp"] < t4["small"]["p_temp"] < 0.5
    total = sum(r["budget_tokens"] for r in t4.values())
    assert abs(total - 1000) < 0.01
