"""Round-6 operator tests: DSIR importance weights, contrastive
hard-negative mining, n-gram novelty scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions
from tests.conftest import SF_SMOKE

_load_extensions()


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_weights_hand_computed(spark):
    """Exact log-ratio check on a 3-doc corpus against hand arithmetic."""
    from etl_s3_to_redshift_spark.operators.textops import dsir_logratio_weights

    docs = spark.createDataFrame(
        [
            (1, "cat cat dog", "en"),
            (2, "dog fish", "en"),
            (3, "fish fish fish", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_logratio_weights(docs, F.col("lang") == "en").collect()
    }
    # corpus: V=3 (cat,dog,fish); N_all=8, N_tgt=5
    # target counts: cat 2, dog 2, fish 0; raw counts: cat 2, dog 2, fish 4
    v, nt, na = 3, 5, 8
    lr = {
        "cat": math.log(3 / (nt + v)) - math.log(3 / (na + v)),
        "dog": math.log(3 / (nt + v)) - math.log(3 / (na + v)),
        "fish": math.log(2 / (nt + v)) - math.log(5 / (na + v)),
    }
    want1 = (2 * lr["cat"] + 1 * lr["dog"]) / 3
    want3 = lr["fish"]
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logratio"] == pytest.approx(round(want1, 6), abs=1e-6)
    assert out[3]["avg_logratio"] == pytest.approx(round(want3, 6), abs=1e-6)
    # in-domain doc scores above the out-of-domain one
    assert out[1]["avg_logratio"] > out[3]["avg_logratio"]


def test_dsir_weights_target_slice_scores_higher_on_average(spark):
    """On the testdata corpus the mean weight of target (en) docs must
    exceed the mean weight of the rest — the defining property of an
    importance weight toward the target distribution."""
    docs_out = REGISTRY["data_dsir_weights"].spark(spark, SF_SMOKE)
    from etl_s3_to_redshift_spark.sources.tables import load_table

    langs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    j = docs_out.join(langs, "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("avg_logratio").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


# ---------------------------------------------------------------------------
# Contrastive hard negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_labels_differ_and_ranked(spark):
    from etl_s3_to_redshift_spark.sources.tables import load_table

    out = REGISTRY["emb_hard_negatives"].spark(spark, SF_SMOKE).collect()
    emb = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    assert len(out) > 0
    by_q: dict[int, list] = {}
    for r in out:
        assert emb[r["vec_id"]] != emb[r["query_id"]], "negative shares query label"
        assert r["vec_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) <= 5


def test_hard_negatives_equal_brute_force_with_label_filter(spark):
    """The miner must equal exact top-k over the different-label slice,
    computed independently per query."""
    from etl_s3_to_redshift_spark.operators.similarity import (
        brute_force_topk,
        contrastive_hard_negatives,
    )
    from etl_s3_to_redshift_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in contrastive_hard_negatives(emb, queries, k=4, round_to=6).collect()
    )
    want = []
    for q in queries.collect():
        corpus_slice = emb.filter(F.col("label") != q["label"])
        one_q = spark.createDataFrame(
            [(q["query_id"], q["embedding"])], "query_id long, embedding array<float>"
        )
        for r in brute_force_topk(corpus_slice, one_q, k=4, round_to=6).collect():
            want.append((r["query_id"], r["vec_id"], r["cos_sim"], r["rank"]))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semantic_dedup_decisions_match_brute_force(spark):
    """Every drop/keep decision re-derived by brute force: a vector is
    dropped iff some smaller-id vector in its cluster sits at rounded
    cosine >= threshold."""
    import math

    from etl_s3_to_redshift_spark.sources.tables import load_table

    out = REGISTRY["dedup_semantic_clusters"].spark(spark, SF_SMOKE).collect()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r["vec_id"])
    kept = {r["vec_id"]: r["kept"] for r in out}
    assert len(kept) == len(emb)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    n_dropped = 0
    for cluster, ids in by_cluster.items():
        ids.sort()
        for i, v in enumerate(ids):
            has_neighbor = any(cos(emb[u], emb[v]) >= 0.3 for u in ids[:i])
            assert kept[v] == (not has_neighbor), (cluster, v)
            n_dropped += int(has_neighbor)
    assert n_dropped > 0, "threshold chose no drops — query is degenerate"


def test_semantic_dedup_no_bnlj(spark):
    """The within-cluster self-join must be a cell-key equi-join, never
    a corpus-wide nested loop."""
    from tests.test_plans_and_scale import plan_of

    plan = plan_of(REGISTRY["dedup_semantic_clusters"].spark(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_tolerates_null_and_ragged_rows(spark):
    """NULL and wrong-length embeddings must pass through as KEPT rows
    (zero-norm never matches), not crash the Arrow kernels — the
    signature-kernel dirty-data contract (ADVICE r5)."""
    import random

    from etl_s3_to_redshift_spark.operators.similarity import semantic_dedup

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    rows += [(100, None), (101, [1.0, 2.0]), (102, [0.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.3, n_clusters=4).collect()}
    assert len(out) == 43
    for dirty in (100, 101, 102):
        assert out[dirty]["kept"] is True


# ---------------------------------------------------------------------------
# N-gram novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_hand_computed(spark):
    from etl_s3_to_redshift_spark.operators.textops import ngram_novelty_scores

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c", "b c d" — both first here
            (2, "a b c d e"),      # "a b c","b c d" seen; "c d e" new -> 1/3
            (3, "x y"),            # < 3 tokens: absent from output
            (4, "a b c"),          # single gram, seen -> 0.0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty_scores(docs, n=3).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["n_grams"] == 2 and out[1]["novelty_rate"] == 1.0
    assert out[2]["n_grams"] == 3 and out[2]["novelty_rate"] == pytest.approx(
        round(1 / 3, 6), abs=1e-6
    )
    assert out[4]["n_grams"] == 1 and out[4]["novelty_rate"] == 0.0


def test_ngram_novelty_distinct_grams_counted_once(spark):
    """A doc repeating one trigram counts it once (distinct grams)."""
    from etl_s3_to_redshift_spark.operators.textops import ngram_novelty_scores

    docs = spark.createDataFrame(
        [(7, "a b a b a b")],  # grams: "a b a","b a b","a b a","b a b"
        "doc_id long, text string",
    )
    row = ngram_novelty_scores(docs, n=3).collect()[0]
    assert row["n_grams"] == 2 and row["novelty_rate"] == 1.0


def test_ngram_novelty_rates_bounded_on_corpus(spark):
    rows = REGISTRY["text_ngram_novelty"].spark(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(0.0 <= r["novelty_rate"] <= 1.0 and r["n_grams"] >= 1 for r in rows)
    # first doc by id owns every one of its grams by min-id attribution
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["novelty_rate"] == 1.0
