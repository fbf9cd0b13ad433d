"""Dedup + similarity operator semantics on the driver testdata (sf0.001
for speed except where the planted near-dups at sf0.01 are the point)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators import dedup as D
from etl_s3_to_redshift_spark.operators import similarity as S
from etl_s3_to_redshift_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings")


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {(r.id_a, r.id_b): r.jaccard for r in D.jaccard_pairs(docs, 0.8).collect()}


def test_exact_dedup_idempotent_and_counts(spark, docs):
    manifest = D.exact_dedup(docs)
    rows = manifest.collect()
    # no exact duplicates in this corpus: every key survives with 1 copy
    assert len(rows) == docs.count()
    assert all(r.n_copies == 1 for r in rows)
    # synthetic duplicate: doubling the table halves survivors, n_copies=2
    doubled = docs.unionAll(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    m2 = D.exact_dedup(doubled)
    assert m2.count() == docs.count()
    assert m2.agg(F.max("n_copies")).first()[0] == 2
    # keeper is the lowest id
    assert m2.agg(F.max("doc_id")).first()[0] < 1_000_000


def test_minhash_lsh_equals_exact_on_planted_dups(docs, exact_pairs):
    """The planted near-dups sit at J>=0.9; verified LSH (16 bands x 2 of
    32 xxhash64 minhashes) must find exactly the brute-force pairs."""
    lsh = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_lsh_pairs(docs, 0.8, num_hashes=32, bands=16).collect()}
    assert lsh == exact_pairs
    assert len(lsh) > 0


def test_minhash_candidates_are_superset_of_verified(docs, exact_pairs):
    cand = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, 0.8, num_hashes=32, bands=16, verify=False).collect()
    }
    assert set(exact_pairs) <= cand


def test_staged_minhash_matches_inline_and_skips_recompute(spark, docs, tmp_path):
    """The 100 TB staging path must (a) produce verbatim the inline
    minhash_lsh_pairs output and (b) plan every branch as a parquet scan
    of the staged table — no re-derivation of shingles from text (no
    array_min signature computation, no tokenizer split) anywhere in the
    staged plan."""
    path = str(tmp_path / "minhash_stage")
    D.stage_minhash(docs, path)
    staged_df = D.minhash_lsh_pairs_staged(spark, path, threshold=0.5)
    inline_df = D.minhash_lsh_pairs(docs, threshold=0.5)
    staged = {(r.id_a, r.id_b): r.jaccard for r in staged_df.collect()}
    inline = {(r.id_a, r.id_b): r.jaccard for r in inline_df.collect()}
    assert staged == inline and len(staged) > 0

    plan = staged_df._jdf.queryExecution().executedPlan().toString()
    assert "array_min" not in plan          # signatures come from the scan
    assert "split(" not in plan             # no tokenization of text
    assert plan.count("FileScan parquet") >= 2  # banding + verify branches
    # and the inline plan (for contrast) DOES recompute signatures
    inline_plan = inline_df._jdf.queryExecution().executedPlan().toString()
    assert "array_min" in inline_plan


def test_simhash_recall_and_shape(docs, exact_pairs):
    pairs = D.simhash_pairs(docs, max_hamming=3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert all(r.hamming <= 3 for r in pairs)
    # hamming<=3 at 64 bits catches most J>=0.8 near-dups (measured 0.6)
    recall = len(found & set(exact_pairs)) / len(exact_pairs)
    assert recall >= 0.5


def test_brute_force_topk_is_exact_and_ranked(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = S.brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.query_id != r.vec_id for r in rows)


def test_lsh_ann_recall_floor(emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {(r.query_id, r.vec_id) for r in S.brute_force_topk(emb, queries, k=10).collect()}
    ann = {(r.query_id, r.vec_id) for r in S.lsh_topk(emb, queries, dim=64, k=10).collect()}
    # random-hyperplane LSH on weakly-similar random vectors: measured 0.4;
    # floor at 0.25 to keep the test robust to data regeneration
    assert len(bf & ann) / len(bf) >= 0.25
    # every ANN hit must carry a correct exact rescore (cos in [-1, 1])
    for r in S.lsh_topk(emb, queries, dim=64, k=10).collect():
        assert -1.0 <= r.cos_sim <= 1.0


def test_cosine_pairs_threshold(emb):
    pairs = S.cosine_pairs(emb, threshold=0.4).collect()
    assert len(pairs) > 0
    assert all(r.cos_sim >= 0.4 and r.id_a < r.id_b for r in pairs)


def test_embedding_neardup_matches_all_pairs_exactly(emb):
    """The LSH-blocked path must reproduce the brute-force answer verbatim
    at the registry's threshold/params: the seeded r=2/b=16 banding has
    candidate recall 1.0 on this corpus, and the exact verify scores each
    candidate with the same expression as cosine_pairs."""
    brute = {
        (r.id_a, r.id_b): round(r.cos_sim, 6)
        for r in S.cosine_pairs(emb, threshold=0.4).collect()
    }
    blocked = {
        (r.id_a, r.id_b): round(r.cos_sim, 6)
        for r in S.embedding_neardup_pairs(emb, threshold=0.4, dim=64).collect()
    }
    assert blocked == brute


def test_embedding_neardup_plan_has_no_broadcast_nested_loop(emb):
    plan = S.embedding_neardup_pairs(
        emb, threshold=0.4, dim=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_neardup_high_threshold_params_prune(emb):
    """The regime the blocker targets: near-dup banding (r=8 bits, b=6)
    keeps background candidates at ~b/2^r of the half-matrix. Pin that the
    candidate equi-join examines <10% of all pairs — the sub-quadratic
    claim — on this corpus (background cosine ~0, collision prob 0.5/bit)."""
    n = emb.count()
    bucketed = S.lsh_bucketize(emb.select("vec_id", "embedding"), dim=64, n_planes=48, bands=6)
    left = bucketed.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    right = bucketed.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    n_cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    assert n_cand < 0.10 * n * (n - 1) / 2


def test_lsh_signature_arrow_matches_jvm_fold_exactly(emb):
    """The Arrow signature kernel must be BIT-IDENTICAL to the JVM fold
    (and hence the DuckDB oracle's left-associative chain): same column-
    sequential IEEE add order. Any drift here silently changes candidate
    sets at sign boundaries, so pin full bucket equality on the corpus,
    across band geometries."""
    for n_planes, bands in [(16, 4), (48, 6)]:
        a = S.lsh_bucketize(
            emb.select("vec_id", "embedding"), 64, n_planes, bands, impl="arrow"
        ).select("vec_id", "band", "bucket")
        j = S.lsh_bucketize(
            emb.select("vec_id", "embedding"), 64, n_planes, bands, impl="jvm"
        ).select("vec_id", "band", "bucket")
        assert a.exceptAll(j).count() == 0 and j.exceptAll(a).count() == 0


def test_lsh_signature_arrow_null_and_ragged_rows(spark):
    """Dirty-data contract (ADVICE r5): a NULL or wrong-length embedding
    must not crash the Arrow kernel — it gets the same all-'0' signature
    the JVM fold produces for NULL (every dot product aggregates to 0,
    0 > 0 is false), keeping the two impls behavior-identical."""
    rows = [
        (1, [1.0, -2.0, 0.5, 3.0]),
        (2, None),
        (3, [1.0, 2.0]),  # ragged: wrong dimensionality
        (4, [-1.0, 2.0, -0.5, -3.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.lsh_bucketize(df, dim=4, n_planes=8, bands=2, impl="arrow")
    sigs = {
        r["vec_id"]: "".join(b["bucket"] for b in sorted(
            (x.asDict() for x in out.filter(F.col("vec_id") == r["vec_id"])
             .select(F.struct("band", "bucket").alias("s")).collect()
             for x in [x["s"]]), key=lambda d: d["band"]))
        for r in df.collect()
    }
    assert sigs[2] == "0" * 8 and sigs[3] == "0" * 8
    # clean rows agree with the JVM fold
    clean = df.filter(F.col("vec_id").isin(1, 4))
    a = S.lsh_bucketize(clean, 4, 8, 2, impl="arrow").select("vec_id", "band", "bucket")
    j = S.lsh_bucketize(clean, 4, 8, 2, impl="jvm").select("vec_id", "band", "bucket")
    assert a.exceptAll(j).count() == 0 and j.exceptAll(a).count() == 0


# ---------------------------------------------------------------------------
# Arrow top-k kernel hardening (round 9 — ADVICE r8)
# ---------------------------------------------------------------------------


def test_arrow_topk_keeps_all_boundary_ties(spark):
    """The tie-safe partition-local cut: with 30 IDENTICAL vectors (every
    cosine ties on the 6-dp grid) scattered across many partitions, the
    global top-k must be the k smallest ids — the old fixed k+9 margin
    kept an arbitrary 19 of a task's 30 tied rows, dropping small-id
    winners depending on partition layout (duplicate-heavy corpora are
    the dedup target, so this shape is realistic, not adversarial)."""
    base = [1.0, 2.0, 3.0]
    rows = [(i, base) for i in range(1, 31)] + [(99, [3.0, -1.0, 0.5])]
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).repartition(8)
    queries = spark.createDataFrame(
        [(0, base)], "query_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    got = S.brute_force_topk_np(emb, queries, k=10, round_to=6).collect()
    assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == list(
        range(1, 11)
    )
    # and in ONE partition (all 30 ties in a single task — the exact
    # regression: >9 rows rounding into the k-th boundary bin)
    got1 = S.brute_force_topk_np(
        emb.coalesce(1), queries, k=10, round_to=6
    ).collect()
    assert {tuple(r) for r in got1} == {tuple(r) for r in got}
    # fold path agrees (the kernel's ground truth)
    exact = S.brute_force_topk(emb, queries, k=10, round_to=6).collect()
    assert {(r.query_id, r.vec_id, r.rank) for r in exact} == {
        (r.query_id, r.vec_id, r.rank) for r in got
    }


def test_ivf_arrow_probe_keeps_all_boundary_ties(spark):
    """Same regression through the saved-index arrow probe: one probed
    cell holding >k+9 rounded-tied candidates must still yield the
    smallest-id winners."""
    base = [1.0, 0.0]
    rows = [(i, base) for i in range(1, 31)] + [
        (90, [0.0, 1.0]),
        (91, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    idx = S.build_ivf_index(emb, n_lists=2)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.1])], "query_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    got = S.ivf_probe(idx, queries, k=10, n_probe=2, rescore="arrow", round_to=6)
    fold = S.ivf_probe(idx, queries, k=10, n_probe=2, rescore="fold", round_to=6)
    g = sorted((r.vec_id, r.rank) for r in got.collect())
    f = sorted((r.vec_id, r.rank) for r in fold.collect())
    assert g == f
    assert [v for v, _ in g] == list(range(1, 11))


def test_arrow_topk_dirty_embeddings_lose_ranking(spark):
    """_dense_or_zero contract in the arrow kernels: NULL and ragged
    embeddings score 0 and lose ranking instead of crashing the
    worker (ADVICE r8 — build/append can assign such rows to a probed
    cell)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, None),
        (4, [1.0, 0.0, 5.0]),  # ragged vs corpus dim
        (5, [0.8, 0.2]),
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    got = sorted(
        S.brute_force_topk_np(emb, queries, k=3, round_to=6).collect(),
        key=lambda r: r.rank,
    )
    assert [r.vec_id for r in got] == [1, 2, 5]

    idx = S.build_ivf_index(emb.filter("vec_id IN (1, 2, 5)"), n_lists=2)
    # force a NULL and a ragged row INTO probed cells (what an append of
    # dirty data can produce)
    idx.cells = idx.cells.unionByName(
        spark.createDataFrame(
            [(3, None, 0), (4, [1.0, 0.0, 5.0], 1)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>, cell INT",
        )
    )
    probed = sorted(
        S.ivf_probe(idx, queries, k=3, n_probe=2, rescore="arrow", round_to=6).collect(),
        key=lambda r: r.rank,
    )
    assert [r.vec_id for r in probed] == [1, 2, 5]


def test_arrow_topk_string_ids_and_type_validation(spark):
    """Arrow kernels derive their output schema from the inputs' actual
    id types (string ids round-trip; decimal ids fail loudly pointing at
    the fold path) — the old hardcoded '<id> long' silently coerced or
    crashed (ADVICE r8)."""
    emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "vec_id STRING, embedding ARRAY<DOUBLE>",
    )
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "query_id STRING, embedding ARRAY<DOUBLE>"
    )
    got = sorted(
        S.brute_force_topk_np(emb, queries, k=2, round_to=6).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.query_id, r.vec_id) for r in got] == [("q1", "a"), ("q1", "b")]

    import pytest as _pytest

    from decimal import Decimal as _D

    dec = spark.createDataFrame(
        [(_D(1), [1.0, 0.0])], "vec_id DECIMAL(10,0), embedding ARRAY<DOUBLE>"
    )
    with _pytest.raises(TypeError, match="fold"):
        S.brute_force_topk_np(dec, queries, k=1)


def test_nearest_cells_sql_guards(spark):
    """nearest_cells_sql fails loudly on non-finite centroid components
    (they'd render as 'nanD' and die at parse time with an opaque error)
    and backtick-quotes plain-identifier vec_sql so reserved-word column
    names parse (ADVICE r8)."""
    import pytest as _pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    idx = S.build_ivf_index(emb, n_lists=2)
    # reserved-word column name: parses only if backticked
    frame = emb.select(F.col("vec_id"), F.col("embedding").alias("order"))
    cells = frame.select(
        F.expr(idx.nearest_cells_sql("order", 1)).alias("c")
    ).collect()
    assert all(len(r["c"]) == 1 for r in cells)

    idx.centroids = [[1.0, float("nan")], [0.0, 1.0]]
    with _pytest.raises(ValueError, match="non-finite"):
        idx.nearest_cells_sql("embedding", 1)
