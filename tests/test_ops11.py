"""Tests for the round-6 fourth-batch operators: BM25 lexical retrieval
matches a pure-Python replay (exact under the decimal-sum contract),
ignores query terms absent from the corpus, and ranks rare-term
documents by idf; the curation funnel reproduces a hand-computed staged
account on a planted corpus, keeps flags cumulative, and keeps exactly
the first copy per duplicated text."""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _py_bm25(docs, queries, k=10, k1=1.2, b=0.75):
    """Pure-Python replay of the documented BM25 contract: distinct
    query terms, Lucene idf, per-term scores rounded to 6 dp then
    summed exactly (Decimal — the operator's DECIMAL(20,6) sum)."""
    toks = {i: t.lower().split() for i, t in docs}
    n = float(len(docs))
    avgdl = float(sum(len(v) for v in toks.values())) / n
    out = {}
    for qid, qtext in queries:
        terms = sorted(set(qtext.lower().split()))
        scores = {}
        for term in terms:
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = math.log(1.0 + ((n - df) + 0.5) / (df + 0.5))
            for i, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                dl = float(len(v))
                s = idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * dl / avgdl)
                )
                scores.setdefault(i, Decimal(0))
                scores[i] += Decimal(str(round(s, 6)))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(i, float(s)) for i, s in ranked]
    return out


_DOCS = [
    (1, "spark join join table"),
    (2, "spark spark spark scan"),
    (3, "rare join table scan extra words here padding padding"),
    (4, "table scan table scan table"),
    (5, "unrelated vocabulary entirely different content"),
]
_QUERIES = [(1, "spark join"), (2, "rare table"), (3, "spark missing join")]


def test_bm25_matches_pure_python(spark):
    from etl_s3_to_redshift_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame(_DOCS, "doc_id INT, text STRING")
    qs = spark.createDataFrame(_QUERIES, "query_id INT, query_text STRING")
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in bm25_topk(docs, qs, k=3).collect()
    }
    want = _py_bm25(_DOCS, _QUERIES, k=3)
    for qid, ranked in want.items():
        for rank, (doc, score) in enumerate(ranked, start=1):
            gdoc, gscore = got[(qid, rank)]
            assert gdoc == doc, (qid, rank, got)
            assert abs(gscore - score) < 1e-9, (qid, rank, gscore, score)
    assert len(got) == sum(len(v) for v in want.values())


def test_bm25_missing_term_is_ignored(spark):
    """A query term with zero postings contributes nothing: 'spark
    missing join' scores identically to 'spark join'."""
    from etl_s3_to_redshift_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame(_DOCS, "doc_id INT, text STRING")
    qs = spark.createDataFrame(
        [(1, "spark join"), (2, "spark missing join")],
        "query_id INT, query_text STRING",
    )
    rows = bm25_topk(docs, qs, k=5).collect()
    by_q = {
        qid: sorted((r["rank"], r["doc_id"], r["score"]) for r in rows if r["query_id"] == qid)
        for qid in (1, 2)
    }
    assert by_q[1] == by_q[2] and len(by_q[1]) > 0


def test_bm25_rare_term_dominates_by_idf(spark):
    """With one doc holding a corpus-rare term, that doc tops the
    rare-term query even against higher-tf common terms elsewhere."""
    from etl_s3_to_redshift_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame(_DOCS, "doc_id INT, text STRING")
    qs = spark.createDataFrame([(1, "rare table")], "query_id INT, query_text STRING")
    top = bm25_topk(docs, qs, k=1).collect()[0]
    assert top["doc_id"] == 3


def test_bm25_plan_shape(spark):
    """Inverted-index access path pinned: postings semi-join the
    broadcast query-term set BEFORE any aggregation; exactly one 1-row
    BNLJ (the corpus-stats broadcast); the two-phase top-k plans
    rank-limit pushdown (WindowGroupLimit), never a global sort."""
    from etl_s3_to_redshift_spark.queries import REGISTRY

    from tests.test_plans_and_scale import SF_SMOKE, plan_of

    plan = plan_of(REGISTRY["text_bm25_topk"].spark(spark, SF_SMOKE))
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Curation funnel
# ---------------------------------------------------------------------------


def _long_doc(prefix: str, n: int = 60, head: str = "the") -> str:
    return " ".join([head] + [f"{prefix}{i:02d}" for i in range(n)])


_COMMON = _long_doc("c", 54)  # 55-token shared prefix for the near-dup pair


def _planted_docs(spark):
    rows = [
        (1, _long_doc("a")),                       # clean keeper
        (2, _long_doc("b")),                       # exact-dup pair, kept
        (3, _long_doc("b")),                       # exact-dup pair, dropped
        (4, _COMMON + " d4x0 d4x1 d4x2 d4x3 d4x4"),  # near-dup pair: both
        (5, _COMMON + " d5y0 d5y1 d5y2 d5y3 d5y4"),  # drop (coverage > 0.5)
        (6, "zz yy xx ww vv"),                     # no language markers
        (7, "the x1 x2 x3"),                       # too short for quality
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_funnel_counts_planted_corpus(spark):
    from etl_s3_to_redshift_spark.operators.curation import curation_funnel

    got = {
        r["stage"]: (r["stage_idx"], r["n_docs"], r["n_removed"], r["pct_kept"])
        for r in curation_funnel(
            _planted_docs(spark), min_required_words=1
        ).collect()
    }
    assert got == {
        "raw": (0, 7, 0, 1.0),
        "lang_id": (1, 6, 1, round(6 / 7, 6)),
        "quality_rules": (2, 5, 1, round(5 / 7, 6)),
        "exact_dedup": (3, 4, 1, round(4 / 7, 6)),
        "near_dedup": (4, 2, 2, round(2 / 7, 6)),
    }


def test_funnel_flags_cumulative_and_first_kept(spark):
    from etl_s3_to_redshift_spark.operators.curation import curation_flags

    rows = {
        r["doc_id"]: r
        for r in curation_flags(_planted_docs(spark), min_required_words=1).collect()
    }
    assert len(rows) == 7
    for r in rows.values():
        assert r["s_neardup"] <= r["s_exact"] <= r["s_quality"] <= r["s_lang"]
    # exact stage keeps the LOWEST id of the duplicated text
    assert rows[2]["s_exact"] and not rows[3]["s_exact"]
    # the kept copy's windows are unique once its twin is gone
    assert rows[2]["s_neardup"]
    # both members of the >50%-overlap pair fail the coverage gate
    assert rows[4]["s_exact"] and rows[5]["s_exact"]
    assert not rows[4]["s_neardup"] and not rows[5]["s_neardup"]


def test_funnel_report_consistent_with_flags(spark):
    """The 5-row report is exactly the flag-sum rollup of the same
    corpus (one aggregate, no drift between the two APIs)."""
    from etl_s3_to_redshift_spark.operators.curation import (
        curation_flags,
        curation_funnel,
    )

    docs = _planted_docs(spark)
    flags = curation_flags(docs, min_required_words=1)
    sums = flags.agg(
        F.count(F.lit(1)),
        *[F.sum(F.col(c).cast("long")) for c in ("s_lang", "s_quality", "s_exact", "s_neardup")],
    ).collect()[0]
    report = {
        r["stage_idx"]: r["n_docs"]
        for r in curation_funnel(docs, min_required_words=1).collect()
    }
    assert [report[i] for i in range(5)] == list(sums)
    # removals telescope back to the raw count
    rem = {
        r["stage_idx"]: r["n_removed"]
        for r in curation_funnel(docs, min_required_words=1).collect()
    }
    assert sum(rem.values()) == sums[0] - sums[4]


# ---------------------------------------------------------------------------
# Heavy hitters (Misra-Gries candidates + exact rescore)
# ---------------------------------------------------------------------------


def _py_mg(stream, k):
    """Pure-Python Misra-Gries summary of one partition."""
    counters = {}
    for v in stream:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [c for c, n in counters.items() if n == 1]
            for c in counters:
                counters[c] -= 1
            for c in dead:
                del counters[c]
    return set(counters)


def _brute_hh(stream, phi):
    from collections import Counter

    n = len(stream)
    return {
        v: c for v, c in Counter(stream).items() if c > phi * n
    }


def test_heavy_hitters_match_brute_force(spark):
    """Planted-skew stream: the operator's exact rescore equals a plain
    Counter threshold, independent of how Spark partitioned pass 1."""
    import random

    from etl_s3_to_redshift_spark.operators.skew import heavy_hitters_exact

    rng = random.Random(7)
    stream = [rng.randrange(1000) for _ in range(20_000)]
    stream += [1001] * 900 + [1002] * 500 + [1003] * 220  # planted hitters
    rng.shuffle(stream)
    phi = 0.01  # threshold 216.2 on 21620 rows: 1003 (220) just clears it
    df = spark.createDataFrame([(v,) for v in stream], "user_id LONG")

    got = {
        r["user_id"]: (r["freq"], r["share"])
        for r in heavy_hitters_exact(df, "user_id", phi=phi).collect()
    }
    want = _brute_hh(stream, phi)
    assert set(got) == set(want), (got, want)
    for v, c in want.items():
        assert got[v][0] == c
        assert abs(got[v][1] - round(c / len(stream), 6)) < 1e-12


def test_heavy_hitters_empty_on_flat_distribution(spark):
    """No key above phi*N → empty result, which IS the answer."""
    from etl_s3_to_redshift_spark.operators.skew import heavy_hitters_exact

    df = spark.createDataFrame([(i % 400,) for i in range(8000)], "user_id LONG")
    assert heavy_hitters_exact(df, "user_id", phi=0.01).count() == 0


def test_mg_candidate_superset_property():
    """The mergeability argument the operator relies on, replayed in
    pure Python over adversarial partitionings: the UNION of
    per-partition MG summaries (k=ceil(2/phi)) always contains every
    global phi-hitter."""
    import math
    import random

    rng = random.Random(13)
    for trial in range(25):
        n = rng.randrange(200, 2000)
        zipf_pool = [rng.randrange(1, 1 + rng.randrange(1, 40)) for _ in range(n)]
        phi = rng.choice([0.02, 0.05, 0.1])
        k = int(math.ceil(2.0 / phi))
        # adversarial partitioning: contiguous slices of random sizes
        parts, i = [], 0
        while i < n:
            w = rng.randrange(1, max(2, n // 3))
            parts.append(zipf_pool[i : i + w])
            i += w
        union = set()
        for p in parts:
            union |= _py_mg(p, k)
        want = _brute_hh(zipf_pool, phi)
        assert set(want) <= union, (trial, phi, sorted(want), sorted(union))


def test_heavy_hitters_plan_shape(spark):
    """Candidate set broadcast back as a LeftSemi hash join; exactly one
    1-row BNLJ (the total-count scalar); exact counts aggregate
    map-side-combined."""
    from etl_s3_to_redshift_spark.queries import REGISTRY

    from tests.test_plans_and_scale import SF_SMOKE, plan_of

    plan = plan_of(REGISTRY["approx_heavy_hitters"].spark(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_heavy_hitters_null_keys_excluded(spark):
    """NULL keys can't ride a semi-join; they are excluded from both
    candidacy and N up front instead of silently diverging from plain
    GROUP BY semantics on dirty data."""
    from etl_s3_to_redshift_spark.operators.skew import heavy_hitters_exact

    rows = [(1,)] * 60 + [(2,)] * 5 + [(None,)] * 35
    df = spark.createDataFrame(rows, "user_id LONG")
    got = {
        r["user_id"]: (r["freq"], r["share"])
        for r in heavy_hitters_exact(df, "user_id", phi=0.5).collect()
    }
    # N = 65 non-null rows; only key 1 (60/65) clears phi=0.5
    assert got == {1: (60, round(60 / 65, 6))}


def test_funnel_flags_false_not_null_on_dirty_text(spark):
    """NULL text rows surface as all-false flags (dropped at the first
    stage that inspects the text), never three-valued NULLs."""
    from etl_s3_to_redshift_spark.operators.curation import curation_flags

    rows = [(1, _long_doc("a")), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r["doc_id"]: r for r in curation_flags(df, min_required_words=1).collect()}
    assert len(got) == 3
    assert got[1]["s_neardup"] is True
    for d in (2, 3):
        for c in ("s_lang", "s_quality", "s_exact", "s_neardup"):
            assert got[d][c] is False, (d, c, got[d])


# ---------------------------------------------------------------------------
# Hybrid RRF fusion
# ---------------------------------------------------------------------------


def _py_cosine_ranks(vecs, qids, k):
    """Pure-Python dense leg: rank on 6-dp-rounded cosine, id ties."""
    import math as m

    out = {}
    for q in qids:
        qv = vecs[q]
        qn = m.sqrt(sum(x * x for x in qv))
        scored = []
        for i, v in vecs.items():
            if i == q:
                continue
            n = m.sqrt(sum(x * x for x in v))
            c = round(sum(a * b for a, b in zip(qv, v)) / (n * qn), 6)
            scored.append((i, c))
        scored.sort(key=lambda t: (-t[1], t[0]))
        out[q] = {i: r for r, (i, _) in enumerate(scored[:k], start=1)}
    return out


def _py_rrf(sparse, dense, k_rrf=60, k_final=10):
    out = {}
    for q in set(sparse) | set(dense):
        cand = set(sparse.get(q, {})) | set(dense.get(q, {}))
        scored = []
        for d in cand:
            s = 0.0
            if d in sparse.get(q, {}):
                s += 1.0 / (k_rrf + sparse[q][d])
            if d in dense.get(q, {}):
                s += 1.0 / (k_rrf + dense[q][d])
            scored.append((d, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        out[q] = scored[:k_final]
    return out


def test_hybrid_rrf_matches_pure_python(spark):
    """Tiny corpus with aligned ids: the full hybrid pipeline (BM25 leg
    with self-exclusion, dense leg, RRF fusion) equals the pure-Python
    replay of the documented contracts."""
    from etl_s3_to_redshift_spark.operators.similarity import hybrid_rrf_topk

    texts = {
        1: "spark join table scan spark",
        2: "spark spark scan merge",
        3: "rare join table words padding",
        4: "table scan table merge sort",
        5: "entirely different vocabulary here",
    }
    vecs = {
        1: [1.0, 0.0, 0.2],
        2: [0.9, 0.1, 0.1],
        3: [0.0, 1.0, 0.4],
        4: [0.1, 0.9, 0.0],
        5: [0.5, 0.5, 0.7],
    }
    qids = [1, 3]
    k_list, k_final = 3, 4
    docs = spark.createDataFrame(list(texts.items()), "doc_id INT, text STRING")
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id INT, embedding ARRAY<FLOAT>"
    )

    got = {}
    for r in hybrid_rrf_topk(
        docs, emb, qids, k_list=k_list, k_final=k_final
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["rrf_score"], r["sparse_rank"], r["dense_rank"])
        )

    # sparse leg replay: BM25 ranks with self excluded, cut to k_list
    sparse = {}
    for q in qids:
        ranked = _py_bm25(
            list(texts.items()), [(q, texts[q])], k=k_list + 1
        )[q]
        ranked = [(d, s) for d, s in ranked if d != q][:k_list]
        sparse[q] = {d: r for r, (d, _) in enumerate(ranked, start=1)}
    # dense leg uses the FLOAT32-truncated vectors Spark stores
    import numpy as np

    f32 = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}
    dense = _py_cosine_ranks(f32, qids, k_list)
    want = _py_rrf(sparse, dense, k_final=k_final)

    for q in qids:
        got_q = sorted(got[q])
        assert [d for _, d, _, _, _ in got_q] == [d for d, _ in want[q]], (
            q, got_q, want[q], sparse[q], dense[q],
        )
        for (rank, d, score, sr, dr) in got_q:
            assert abs(score - round(want[q][rank - 1][1], 6)) < 1e-9
            assert sr == sparse[q].get(d, 0)
            assert dr == dense[q].get(d, 0)


def test_hybrid_rrf_scores_self_consistent(spark):
    """On the real corpus: every emitted rrf_score equals the RRF
    arithmetic over its own emitted leg ranks (0 = absent from leg),
    and each query emits exactly 10 rows ranked 1..10."""
    from etl_s3_to_redshift_spark.queries import REGISTRY

    rows = REGISTRY["sim_hybrid_rrf"].spark(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
        expect = (1.0 / (60 + r["sparse_rank"]) if r["sparse_rank"] else 0.0) + (
            1.0 / (60 + r["dense_rank"]) if r["dense_rank"] else 0.0
        )
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9, r
        assert r["sparse_rank"] > 0 or r["dense_rank"] > 0, r
    for q, rs in by_q.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, 11)), q


def test_hybrid_rrf_ann_recall_floor_vs_exact(spark):
    """The ANN-backed fusion (dense leg = IVF shortlist) keeps at least
    60% of the exact fusion's top-10 per query at sf0.01 — the recall
    floor that makes the lake-scale swap an honest trade, and the same
    pinning style as emb_bitext_margin_ann. Also: the sparse leg is
    untouched (identical sparse_rank for shared candidates), and the
    output keeps the 1..10 rank contract."""
    from etl_s3_to_redshift_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    exact = REGISTRY["sim_hybrid_rrf"].spark(spark, sf).collect()
    ann = REGISTRY["sim_hybrid_rrf_ann"].spark(spark, sf).collect()
    ex_by_q, ann_by_q = {}, {}
    for r in exact:
        ex_by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r
    for r in ann:
        ann_by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r
    assert set(ann_by_q) == set(ex_by_q)
    for q, ex in ex_by_q.items():
        an = ann_by_q[q]
        assert sorted(r["rank"] for r in an.values()) == list(range(1, 11)), q
        overlap = len(set(ex) & set(an)) / len(ex)
        assert overlap >= 0.6, (q, overlap)
        for d in set(ex) & set(an):
            if ex[d]["sparse_rank"] and an[d]["sparse_rank"]:
                assert ex[d]["sparse_rank"] == an[d]["sparse_rank"], (q, d)


def test_hybrid_rrf_rejects_unknown_dense_impl(spark):
    import pytest

    from etl_s3_to_redshift_spark.operators.similarity import hybrid_rrf_topk

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    emb = spark.createDataFrame([(1, [0.1, 0.2])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dense_impl"):
        hybrid_rrf_topk(docs, emb, [1], dense_impl="hnsw")
    with pytest.raises(ValueError, match="index"):
        hybrid_rrf_topk(docs, emb, [1], dense_impl="ivf_saved")


def test_hybrid_rrf_ann_saved_recall_floor_and_sparse_leg(spark):
    """The amortized fusion (dense leg = saved-index arrow probe) keeps
    ≥60% of the exact fusion's top-10 per query at sf0.01 — the same
    floor contract as the inline-ANN variant — and leaves the sparse
    leg untouched (identical sparse_rank for shared candidates). Its
    dense CANDIDATE sets come from the same seeded quantizer as
    sim_hybrid_rrf_ann, so the two ANN variants' dense legs agree on
    membership (ranks may reorder only on exact 6-dp rounding ties)."""
    from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions

    _load_extensions()

    sf = "/root/testdata/sf0.01"
    exact = REGISTRY["sim_hybrid_rrf"].spark(spark, sf).collect()
    saved = REGISTRY["sim_hybrid_rrf_ann_saved"].spark(spark, sf).collect()
    ex_by_q, sv_by_q = {}, {}
    for r in exact:
        ex_by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r
    for r in saved:
        sv_by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r
    assert set(sv_by_q) == set(ex_by_q)
    for q, ex in ex_by_q.items():
        sv = sv_by_q[q]
        assert sorted(r["rank"] for r in sv.values()) == list(range(1, 11)), q
        overlap = len(set(ex) & set(sv)) / len(ex)
        assert overlap >= 0.6, (q, overlap)
        for d in set(ex) & set(sv):
            if ex[d]["sparse_rank"] and sv[d]["sparse_rank"]:
                assert ex[d]["sparse_rank"] == sv[d]["sparse_rank"], (q, d)


def test_sim_ann_ivf_saved_plan_prunes_and_matches_inline(spark, tmp_path, monkeypatch):
    """The registered amortized-ANN query: (a) its plan carries a STATIC
    ``cell IN (...)`` PartitionFilter (the arrow serving path prunes the
    scan without even a DPP subquery — the measured lake-scale claim),
    (b) its arrow-rescored output matches the inline-trained fold-path
    ``ivf_topk`` on the same corpus/queries/params when both rank on the
    6-dp grid (load == build, kernel == fold at the pinned precision),
    and (c) a second call hits the on-disk cache (no rebuild) and
    returns the identical result."""
    from etl_s3_to_redshift_spark.operators.similarity import ivf_probe, ivf_topk
    from etl_s3_to_redshift_spark.queries import REGISTRY
    from etl_s3_to_redshift_spark.queries_ops11 import _IVF_MEMO, _saved_ivf_index

    sf = "/root/testdata/sf0.01"
    monkeypatch.setenv("SPARK_GRAFT_IVF_CACHE", str(tmp_path))
    _IVF_MEMO.clear()  # other tests may have cached the default path
    df = REGISTRY["sim_ann_ivf_saved"].spark(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan[:2000]
    # static pruning: no runtime subquery needed
    assert "dynamicpruning" not in plan.lower(), plan[:2000]
    first = {tuple(r) for r in df.collect()}
    assert len(first) == 50

    # load == build and arrow == fold on the 6-dp grid: same queries
    # through the inline one-shot path, scores rounded identically
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    inline = {
        tuple(r)
        for r in ivf_topk(emb, queries, dim=64, k=10, n_probe=4)
        .withColumn("cos_sim", F.round(F.col("cos_sim"), 6))
        .collect()
    }
    assert first == inline

    # cache hit: the index dir is reused, not rebuilt — the receipt is
    # the SnapshotIndex _CURRENT pointer (a rebuild would publish a new
    # version and rewrite it)
    import os as _os

    cells = _os.path.join(str(tmp_path), _os.listdir(str(tmp_path))[0], "_CURRENT")
    mtime = _os.path.getmtime(cells)
    again = {
        tuple(r)
        for r in ivf_probe(
            _saved_ivf_index(spark, sf),
            queries,
            k=10,
            n_probe=4,
            rescore="arrow",
            round_to=6,
        ).collect()
    }
    assert again == first
    assert _os.path.getmtime(cells) == mtime
    _IVF_MEMO.clear()  # don't leak the tmp_path index into later tests


def test_ivf_append_equals_full_reassign(spark, tmp_path):
    """append_to_saved's contract: probing (saved(seed) + append(late))
    is row-identical to probing a fresh full save of ALL rows assigned
    under the SAME frozen centroids — on both rescore engines — and the
    appended layout stays compact (≤ 2 files/cell: one per write)."""
    import os

    from etl_s3_to_redshift_spark.operators.similarity import (
        IvfIndex,
        build_ivf_index,
        ivf_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    seed = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 0)
    late = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 0)
    built = build_ivf_index(seed, n_lists=16)
    path_a = str(tmp_path / "appended")
    built.save(path_a)
    built.append_to_saved(late, path_a)

    # full re-assignment of ALL rows under the same centroids
    full = IvfIndex(
        built.centroids,
        emb.select(
            F.col("vec_id"),
            F.col("embedding"),
            F.element_at(
                built.nearest_cells(F.col("embedding"), 1), 1
            ).alias("cell"),
        ),
        "vec_id",
        "embedding",
    )
    path_b = str(tmp_path / "full")
    full.save(path_b)

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a_idx = IvfIndex.load(spark, path_a)
    b_idx = IvfIndex.load(spark, path_b)
    for kwargs in ({}, {"rescore": "arrow", "round_to": 6}):
        a = {tuple(r) for r in ivf_probe(a_idx, queries, k=10, **kwargs).collect()}
        b = {tuple(r) for r in ivf_probe(b_idx, queries, k=10, **kwargs).collect()}
        assert a == b and len(a) == 50, kwargs

    # the merged corpus is fully present
    assert a_idx.cells.count() == emb.count()
    # layout compactness: at most one file per cell per write — resolve
    # the published SnapshotIndex version (hardlinked old files + the
    # append's delta files live under v=<n>/)
    from etl_s3_to_redshift_spark.operators.table_commit import resolve_index_root

    a_root = resolve_index_root(path_a)
    assert a_root != path_a, "append must publish a SnapshotIndex version"
    for cell_dir in os.listdir(f"{a_root}/cells"):
        if not cell_dir.startswith("cell="):
            continue
        n = len([f for f in os.listdir(f"{a_root}/cells/{cell_dir}") if f.endswith(".parquet")])
        assert n <= 2, (cell_dir, n)


def test_funnel_empty_corpus_null_pct(spark):
    """Empty corpus: five stage rows, zero counts, NULL pct_kept (the
    n0>0 guard — Spark's 0.0/0.0 NULL vs DuckDB's IEEE NaN would
    otherwise diverge cross-engine; ADVICE r6)."""
    from etl_s3_to_redshift_spark.operators.curation import curation_funnel

    docs = spark.createDataFrame([], "doc_id long, text string")
    rows = curation_funnel(docs, min_required_words=1).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_docs"] == 0 and r["n_removed"] == 0
        assert r["pct_kept"] is None


# ---------------------------------------------------------------------------
# Staged BM25 — the sparse leg's amortized form (round 9)
# ---------------------------------------------------------------------------


def test_bm25_staged_equals_inline(spark, tmp_path):
    """stage_bm25 + bm25_topk_staged must reproduce bm25_topk verbatim
    (shared _bm25_score_topk tail; full-vocabulary staging restricted to
    any query-term set equals the inline semi-joined derivation) —
    including the missing-term query and dirty docs (empty text,
    whitespace-only text, NULL text)."""
    from etl_s3_to_redshift_spark.operators.textops import (
        bm25_topk,
        bm25_topk_staged,
        stage_bm25,
    )

    dirty = _DOCS + [(6, ""), (7, "   "), (8, None)]
    docs = spark.createDataFrame(dirty, "doc_id INT, text STRING")
    qs = spark.createDataFrame(_QUERIES, "query_id INT, query_text STRING")
    base = str(tmp_path / "bm25")
    stage_bm25(docs, base, n_buckets=8)
    inline = {tuple(r) for r in bm25_topk(docs, qs, k=3).collect()}
    staged = {tuple(r) for r in bm25_topk_staged(spark, base, qs, k=3).collect()}
    assert staged == inline and len(staged) > 0

    # empty query-term set: zero rows, correct schema, no crash
    empty_q = spark.createDataFrame(
        [(9, "   ")], "query_id INT, query_text STRING"
    )
    out = bm25_topk_staged(spark, base, empty_q, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score", "rank"]


def test_bm25_staged_plan_prunes_buckets(spark, tmp_path, monkeypatch):
    """The registered staged query's postings scan carries a STATIC
    bucket PartitionFilter (directory pruning to the query terms'
    buckets — the inverted-file access path on disk) plus a term-IN
    data filter pushed to parquet; and a second call reuses the staged
    index (receipt hit, no re-stage)."""
    import os as _os

    from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions

    _load_extensions()
    monkeypatch.setenv("SPARK_GRAFT_BM25_CACHE", str(tmp_path))
    sf = "/root/testdata/sf0.01"
    df = REGISTRY["text_bm25_topk_staged"].spark(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:3000]
    assert "dynamicpruning" not in plan.lower(), plan[:3000]
    # the term filter reaches the parquet scan
    assert "PushedFilters" in plan and "term" in plan, plan[:3000]
    first = {tuple(r) for r in df.collect()}
    assert len(first) == 30

    key = _os.listdir(str(tmp_path))[0]
    # the reuse receipt is the SnapshotIndex _CURRENT pointer — a
    # re-stage would publish a new version and rewrite it
    receipt = _os.path.join(str(tmp_path), key, "_CURRENT")
    mtime = _os.path.getmtime(receipt)
    again = {
        tuple(r) for r in REGISTRY["text_bm25_topk_staged"].spark(spark, sf).collect()
    }
    assert again == first
    assert _os.path.getmtime(receipt) == mtime


def test_hybrid_staged_equals_saved(spark, tmp_path, monkeypatch):
    """sim_hybrid_rrf_staged (both legs saved) is row-identical to
    sim_hybrid_rrf_ann_saved (dense saved, sparse inline) — the staged
    sparse leg changes the access path, never the scores — which is what
    licenses reusing that query's committed-expectation oracle."""
    from etl_s3_to_redshift_spark.queries import REGISTRY
    from etl_s3_to_redshift_spark.queries_ops11 import _IVF_MEMO

    monkeypatch.setenv("SPARK_GRAFT_BM25_CACHE", str(tmp_path / "bm25"))
    monkeypatch.setenv("SPARK_GRAFT_IVF_CACHE", str(tmp_path / "ivf"))
    _IVF_MEMO.clear()
    sf = "/root/testdata/sf0.01"
    staged = {
        tuple(r) for r in REGISTRY["sim_hybrid_rrf_staged"].spark(spark, sf).collect()
    }
    saved = {
        tuple(r)
        for r in REGISTRY["sim_hybrid_rrf_ann_saved"].spark(spark, sf).collect()
    }
    assert staged == saved and len(staged) == 30
    _IVF_MEMO.clear()


def test_bm25_append_equals_full_stage(spark, tmp_path):
    """append_to_staged_bm25's contract: (stage(seed) + append(late)) is
    indistinguishable from stage(seed ∪ late) — postings rows, merged
    df, exact stats (sum_dl makes avgdl exact), and probe output all
    equal; and appending an EMPTY frame is a no-op."""
    from etl_s3_to_redshift_spark.operators.textops import (
        append_to_staged_bm25,
        bm25_topk_staged,
        stage_bm25,
    )

    extra = [(20, "spark join appended later"), (21, "rare appended words")]
    all_docs = spark.createDataFrame(_DOCS + extra, "doc_id INT, text STRING")
    seed = all_docs.filter("doc_id < 20")
    late = all_docs.filter("doc_id >= 20")
    full_p, inc_p = str(tmp_path / "full"), str(tmp_path / "inc")
    stage_bm25(all_docs, full_p, n_buckets=8)
    stage_bm25(seed, inc_p, n_buckets=8)
    append_to_staged_bm25(late, inc_p)

    from etl_s3_to_redshift_spark.operators.table_commit import resolve_index_root

    for sub in ("postings", "df", "stats"):
        a = {
            tuple(r)
            for r in spark.read.parquet(
                f"{resolve_index_root(full_p)}/{sub}"
            ).collect()
        }
        b = {
            tuple(r)
            for r in spark.read.parquet(
                f"{resolve_index_root(inc_p)}/{sub}"
            ).collect()
        }
        assert a == b, sub
    qs = spark.createDataFrame(
        _QUERIES + [(9, "appended")], "query_id INT, query_text STRING"
    )
    full_out = {tuple(r) for r in bm25_topk_staged(spark, full_p, qs, k=3).collect()}
    inc_out = {tuple(r) for r in bm25_topk_staged(spark, inc_p, qs, k=3).collect()}
    assert inc_out == full_out and len(inc_out) > 0

    append_to_staged_bm25(late.filter("doc_id < 0"), inc_p)  # empty append
    again = {tuple(r) for r in bm25_topk_staged(spark, inc_p, qs, k=3).collect()}
    assert again == full_out

    # pre-append-format index (no sum_dl) fails loudly
    import pytest as _pytest

    legacy = str(tmp_path / "legacy")
    stage_bm25(seed, legacy, n_buckets=8)
    legacy_root = resolve_index_root(legacy)
    spark.read.parquet(f"{legacy_root}/stats").drop("sum_dl").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "legacy_stats"))
    import shutil

    shutil.rmtree(f"{legacy_root}/stats")
    shutil.move(str(tmp_path / "legacy_stats"), f"{legacy_root}/stats")
    with _pytest.raises(ValueError, match="re-run stage_bm25"):
        append_to_staged_bm25(late, legacy)
    # and an unpublished path (no SnapshotIndex pointer) fails loudly too
    with _pytest.raises(ValueError, match="re-run stage_bm25"):
        append_to_staged_bm25(late, str(tmp_path / "nowhere"))
