"""Tests for the round-6 second-batch curation operators: margin-based
bitext mining matches a pure-numpy replay of the full contract on random
corpora (including dirty rows), and the Gopher rule gate matches a
pure-Python rule engine on synthetic docs that exercise the line rules
the driver corpus can't (bullets, ellipses, multi-line)."""

from __future__ import annotations

import math
from decimal import Decimal

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bitext margin mining
# ---------------------------------------------------------------------------


def _round6(x: float) -> float:
    """HALF_UP at 6 dp, matching Spark's F.round / DuckDB round."""
    d = Decimal(repr(x)) if not isinstance(x, Decimal) else x
    return float(d.quantize(Decimal("0.000001"), rounding="ROUND_HALF_UP"))


def _py_bitext(rows, k, threshold):
    """rows: list of (vec_id, vec|None, label). Returns
    {(src, tgt): (cos, margin, mutual)} replaying the documented
    contract: round-6 cosines, top-k by (cos desc, id), decimal-exact
    penalty sums, margin rounded before ranking, fwd/bwd best."""
    a = [(i, np.asarray(v, float)) for i, v, l in rows if l % 2 == 0 and v is not None]
    b = [(i, np.asarray(v, float)) for i, v, l in rows if l % 2 == 1 and v is not None]
    dim = next((len(v) for _, v in b), 0)
    scored = {}
    for sid, av in a:
        if len(av) != dim:
            continue
        na = math.sqrt(float(av @ av))
        for tid, bv in b:
            if len(bv) != dim:
                continue
            nb = math.sqrt(float(bv @ bv))
            if na > 0 and nb > 0:
                scored[(sid, tid)] = _round6(float(av @ bv) / (na * nb))
    pen_s, pen_t = {}, {}
    for sid in {s for s, _ in scored}:
        cands = sorted(
            ((c, t) for (s, t), c in scored.items() if s == sid),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        pen_s[sid] = sum(Decimal(repr(c)) for c, _ in cands)
    for tid in {t for _, t in scored}:
        cands = sorted(
            ((c, s) for (s, t), c in scored.items() if t == tid),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        pen_t[tid] = sum(Decimal(repr(c)) for c, _ in cands)
    margins = {}
    for (sid, tid), c in scored.items():
        denom = float(pen_s[sid] + pen_t[tid]) / (2.0 * k)
        if denom > 0:
            margins[(sid, tid)] = _round6(c / denom) + 0.0
    fwd, bwd = {}, {}
    for (sid, tid), m in margins.items():
        key = (-m, tid)
        if sid not in fwd or key < fwd[sid][0]:
            fwd[sid] = (key, tid)
        key_b = (-m, sid)
        if tid not in bwd or key_b < bwd[tid][0]:
            bwd[tid] = (key_b, sid)
    out = {}
    for sid, (_, tid) in fwd.items():
        m = margins[(sid, tid)]
        if m >= threshold:
            out[(sid, tid)] = (scored[(sid, tid)], m, bwd[tid][1] == sid)
    return out


vec = st.lists(st.integers(min_value=-2, max_value=3), min_size=3, max_size=3)
emb_rows = st.lists(
    st.tuples(vec, st.integers(min_value=0, max_value=3)),
    min_size=2,
    max_size=10,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=emb_rows)
def test_bitext_margin_matches_numpy_replay(spark, rows):
    from etl_s3_to_redshift_spark.operators.similarity import bitext_margin_pairs

    data = [(i, [float(x) for x in v], l) for i, (v, l) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["src_id"], r["tgt_id"]): (r["cos_sim"], r["margin"], r["mutual"])
        for r in bitext_margin_pairs(
            df, side=F.col("label") % 2 == 0, k=2, threshold=0.5
        ).collect()
    }
    want = _py_bitext([(i, v, l) for i, v, l in data], k=2, threshold=0.5)
    assert set(got) == set(want), (got, want)
    for p in want:
        assert abs(got[p][0] - want[p][0]) <= 1e-9, (p, got[p], want[p])
        assert abs(got[p][1] - want[p][1]) <= 1e-9, (p, got[p], want[p])
        assert got[p][2] == want[p][2], (p, got[p], want[p])


def test_bitext_margin_dirty_rows_never_match(spark):
    from etl_s3_to_redshift_spark.operators.similarity import bitext_margin_pairs

    clean = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 1),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [0.0, 0.9, 0.2], 1),
    ]
    dirty = clean + [
        (10, None, 0),  # NULL source vector
        (11, [1.0, 1.0], 1),  # ragged target (dim 2 vs 3)
        (12, [0.0, 0.0, 0.0], 0),  # zero vector
    ]
    df_clean = spark.createDataFrame(
        clean, "vec_id long, embedding array<float>, label int"
    )
    df_dirty = spark.createDataFrame(
        dirty, "vec_id long, embedding array<float>, label int"
    )
    side = F.col("label") % 2 == 0
    res_clean = {
        (r["src_id"], r["tgt_id"]): (r["cos_sim"], r["margin"], r["mutual"])
        for r in bitext_margin_pairs(df_clean, side, k=2, threshold=0.0).collect()
    }
    res_dirty = {
        (r["src_id"], r["tgt_id"]): (r["cos_sim"], r["margin"], r["mutual"])
        for r in bitext_margin_pairs(df_dirty, side, k=2, threshold=0.0).collect()
    }
    assert res_clean == res_dirty
    assert all(s < 10 and t < 10 for s, t in res_dirty)


def test_bitext_margin_empty_side_yields_empty(spark):
    from etl_s3_to_redshift_spark.operators.similarity import bitext_margin_pairs

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 2)],
        "vec_id long, embedding array<float>, label int",
    )
    out = bitext_margin_pairs(df, side=F.col("label") % 2 == 0, k=2)
    assert out.count() == 0
    assert out.columns == ["src_id", "tgt_id", "cos_sim", "margin", "mutual"]


# ---------------------------------------------------------------------------
# Gopher rule gate
# ---------------------------------------------------------------------------


def _py_gopher(text):
    toks = [t for t in text.split() if t]
    lns = [l for l in text.split("\n") if l.strip()]
    n_words = len(toks)
    mean_wl = sum(len(t) for t in toks) / n_words if n_words else None
    n_hash = text.count("#")
    n_ell = (len(text) - len(text.replace("...", ""))) / 3
    sym = (n_hash + n_ell) / n_words if n_words else None
    n_lines = len(lns)
    n_bullet = sum(
        1
        for l in lns
        if l.lstrip().startswith("- ")
        or l.lstrip().startswith("* ")
        or l.lstrip().startswith("•")
    )
    n_ell_end = sum(
        1 for l in lns if l.rstrip().endswith("...") or l.rstrip().endswith("…")
    )
    bullet = n_bullet / n_lines if n_lines else 0.0
    ell = n_ell_end / n_lines if n_lines else 0.0
    alpha = (
        sum(1 for t in toks if any(c.isascii() and c.isalpha() for c in t)) / n_words
        if n_words
        else None
    )
    req = sum(
        1
        for w in ("the", "be", "to", "of", "and", "that", "have", "with")
        if w in [t.lower() for t in toks]
    )
    rules = dict(
        rule_word_count=50 <= n_words <= 100_000,
        rule_mean_word_len=mean_wl is not None and 3.0 <= mean_wl <= 10.0,
        rule_symbol_ratio=sym is not None and sym <= 0.1,
        rule_bullet_lines=bullet < 0.9,
        rule_ellipsis_lines=ell < 0.3,
        rule_alpha_words=alpha is not None and alpha >= 0.8,
        rule_required_words=req >= 2,
    )
    rules["keep"] = all(rules.values())
    rules["n_words"] = n_words
    rules["n_required_words"] = req
    return rules


GOPHER_DOCS = [
    # passes everything: 60 words, the/of/and present, clean prose
    " ".join(["the quick brown fox jumps over one lazy dog of hill and dale"] * 5),
    # too short
    "the cat sat of the mat and slept",
    # bullet-heavy multi-line doc
    "\n".join(["- item one of the list"] * 19 + ["a closing line and the end"]),
    # ellipsis-heavy lines
    "\n".join(["the line trails off and..."] * 2 + ["the plain line of text"] * 2),
    # symbol spam
    " ".join(["##tag"] * 30 + ["the word of and list here"] * 6),
    # numeric tokens (alpha rule)
    " ".join(["123", "456"] * 30 + ["the of and word"] * 2),
    # mean word length too high
    " ".join(["pneumonoultramicroscopic"] * 55 + ["the of"]),
    # missing required words
    " ".join(["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 6),
    # empty text
    "",
    # unicode bullet + unicode ellipsis
    "\n".join(["• the bullet of item"] * 9 + ["the end and more…"]),
]


def test_gopher_rules_match_python_engine(spark):
    from etl_s3_to_redshift_spark.operators.textops import gopher_quality_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOPHER_DOCS)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_rules(df).collect()}
    assert len(got) == len(GOPHER_DOCS)
    seen_keep = set()
    for i, text in enumerate(GOPHER_DOCS):
        want = _py_gopher(text)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v, text[:60])
        seen_keep.add(want["keep"])
    # the fixture set must exercise both outcomes of the gate
    assert seen_keep == {True, False}


def test_gopher_each_rule_fails_somewhere():
    """Every rule is individually discriminating on the fixture docs."""
    for rule in (
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_bullet_lines",
        "rule_ellipsis_lines",
        "rule_alpha_words",
        "rule_required_words",
    ):
        vals = {_py_gopher(t)[rule] for t in GOPHER_DOCS}
        assert vals == {True, False}, rule


words_strategy = st.lists(
    st.sampled_from(
        ["the", "of", "and", "be", "to", "##", "123", "word", "a", "pneumono..."]
    ),
    min_size=0,
    max_size=80,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ws=words_strategy, newline_every=st.integers(min_value=0, max_value=7))
def test_gopher_rules_property(spark, ws, newline_every):
    from etl_s3_to_redshift_spark.operators.textops import gopher_quality_rules

    sep_parts = []
    for i, w in enumerate(ws):
        sep_parts.append(w)
        sep_parts.append("\n" if newline_every and (i + 1) % newline_every == 0 else " ")
    text = "".join(sep_parts)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = gopher_quality_rules(df).collect()[0].asDict()
    want = _py_gopher(text)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v, text[:80])


# ---------------------------------------------------------------------------
# bitext margin mining — LSH-shortlist (lake-scale) variant
# ---------------------------------------------------------------------------


def test_bitext_ann_recall_floor_vs_exact(spark):
    """The LSH-shortlist miner recovers a pinned fraction of the exact
    miner's pairs on the driver testdata (random synthetic embeddings —
    the LSH-hardest case; real multilingual encoders cluster far more).
    Measured 0.40 at sf0.01 with 16 planes / 4 bands; floor pinned with
    headroom."""
    from etl_s3_to_redshift_spark.operators.similarity import (
        bitext_margin_pairs,
        bitext_margin_pairs_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    side = F.col("label") % 2 == 0
    exact = {
        (r["src_id"], r["tgt_id"])
        for r in bitext_margin_pairs(emb, side, k=4, threshold=1.0).collect()
    }
    ann_rows = bitext_margin_pairs_lsh(
        emb, side, dim=64, k=4, threshold=1.0
    ).collect()
    ann = {(r["src_id"], r["tgt_id"]) for r in ann_rows}
    assert len(exact) > 0
    assert len(ann & exact) / len(exact) >= 0.30
    # schema parity with the exact miner
    assert sorted(ann_rows[0].asDict()) == [
        "cos_sim",
        "margin",
        "mutual",
        "src_id",
        "tgt_id",
    ]


def test_bitext_ann_dirty_rows_never_match(spark):
    """NULL embeddings hash to the all-'0' signature (they CAN collide in
    buckets) but zero out in the rescoring kernel → never emitted; ragged
    rows likewise. Clean results must be byte-identical."""
    from etl_s3_to_redshift_spark.operators.similarity import (
        bitext_margin_pairs_lsh,
    )

    clean = [
        (i, [float(j == i % 4) for j in range(4)], i % 2) for i in range(8)
    ]
    dirty = clean + [(20, None, 0), (21, [1.0, 1.0], 1)]
    side = F.col("label") % 2 == 0
    res = []
    for data in (clean, dirty):
        df = spark.createDataFrame(
            data, "vec_id long, embedding array<float>, label int"
        )
        res.append(
            {
                (r["src_id"], r["tgt_id"]): (r["cos_sim"], r["margin"], r["mutual"])
                for r in bitext_margin_pairs_lsh(
                    df, side, dim=4, k=2, threshold=0.0
                ).collect()
            }
        )
    assert res[0] == res[1]
    assert all(s < 20 and t < 20 for s, t in res[1])
