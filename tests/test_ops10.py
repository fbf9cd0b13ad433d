"""Tests for the round-6 third-batch curation operators: the C4 cleaning
gate matches a pure-Python rule engine on multi-line fixtures the driver
corpus can't exercise, exact-substring window coverage matches a
brute-force replay on random corpora, CCNet perplexity buckets respect
the per-language tercile contract, and SSL-prototypes pruning matches a
numpy replay of the rank-and-drop rule."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# C4 cleaning gate
# ---------------------------------------------------------------------------


def _py_c4(text: str, min_line_words: int = 5, min_sentences: int = 3) -> dict:
    """Pure-Python replay of the documented C4 contract. Spark trim/
    rtrim strip ASCII spaces only, so this replay does too."""
    lns = [l for l in text.split("\n") if l.strip(" ") != ""]

    def line_kept(l: str) -> bool:
        n_words = len([t for t in re.split(r"\s+", l.strip(" ")) if t])
        return (
            re.search(r'[.!?"”]$', l.rstrip(" ")) is not None
            and n_words >= min_line_words
            and "javascript" not in l.lower()
        )

    kept = [l for l in lns if line_kept(l)]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    rule_sent = n_sent >= min_sentences
    rule_lorem = "lorem ipsum" not in text.lower()
    rule_brace = "{" not in text
    return dict(
        n_lines=len(lns),
        n_kept_lines=len(kept),
        n_sentences=n_sent,
        clean_text=clean,
        rule_min_sentences=rule_sent,
        rule_no_lorem_ipsum=rule_lorem,
        rule_no_curly_brace=rule_brace,
        keep=rule_sent and rule_lorem and rule_brace,
    )


C4_DOCS = [
    # clean multi-sentence page: every line ends terminally, 5+ words
    "\n".join(["the quick brown fox jumps over the lazy dog."] * 4),
    # kept lines but only two sentences -> page dropped
    "the first full sentence has enough words here.\n"
    "the second full sentence also has enough words!",
    # short lines dropped (under 5 words) even with punctuation
    "\n".join(["too short a line."] * 6),
    # no terminal punctuation anywhere
    "\n".join(["this line has plenty of words but no ending mark"] * 5),
    # javascript line removed, rest keeps the page
    "please enable javascript to view this site.\n"
    + "\n".join(["a perfectly normal prose sentence sits here."] * 3),
    # lorem ipsum page veto despite clean lines
    "lorem ipsum dolor sit amet, consectetur adipiscing elit.\n"
    + "\n".join(["another good sentence with enough words here."] * 3),
    # curly brace page veto (template/code leak)
    "function f() { return 1; }\n"
    + "\n".join(["a good clean sentence with many words here."] * 3),
    # question/exclamation/closing-quote terminals all count
    'is this a question with enough words?\n'
    'what an exciting line this turned out to be!\n'
    '"a quoted line with five words ends here."',
    # blank lines are not lines; trailing spaces before the terminal
    "a solid sentence with enough words ends here.   \n\n   \n"
    "another solid sentence with enough words ends here.\n"
    "a third solid sentence with enough words ends here.",
    # empty text
    "",
]


def test_c4_rules_match_python_engine(spark):
    from etl_s3_to_redshift_spark.operators.textops import c4_quality_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(C4_DOCS)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in c4_quality_rules(df).collect()}
    assert len(got) == len(C4_DOCS)
    seen_keep = set()
    for i, text in enumerate(C4_DOCS):
        want = _py_c4(text)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v, text[:60])
        seen_keep.add(want["keep"])
    assert seen_keep == {True, False}


def test_c4_each_rule_fires_somewhere():
    """Each page rule and each line rule is discriminating on the
    fixtures: every rule boolean takes both values, and line filtering
    actually removes lines somewhere while keeping the page."""
    for rule in ("rule_min_sentences", "rule_no_lorem_ipsum", "rule_no_curly_brace"):
        vals = {_py_c4(t)[rule] for t in C4_DOCS}
        assert vals == {True, False}, rule
    partial = [
        _py_c4(t) for t in C4_DOCS if 0 < _py_c4(t)["n_kept_lines"] < _py_c4(t)["n_lines"]
    ]
    assert any(d["keep"] for d in partial)


c4_words = st.lists(
    st.sampled_from(
        ["the", "word.", "line!", "ok?", "javascript", "lorem", "ipsum", "{x}", "a", 'quote."']
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ws=c4_words, newline_every=st.integers(min_value=0, max_value=6))
def test_c4_rules_property(spark, ws, newline_every):
    from etl_s3_to_redshift_spark.operators.textops import c4_quality_rules

    parts = []
    for i, w in enumerate(ws):
        parts.append(w)
        parts.append("\n" if newline_every and (i + 1) % newline_every == 0 else " ")
    text = "".join(parts)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = c4_quality_rules(df).collect()[0].asDict()
    want = _py_c4(text)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v, text[:80])


# ---------------------------------------------------------------------------
# Exact-substring window coverage
# ---------------------------------------------------------------------------


def _py_window_coverage(docs: dict[int, str], k: int, max_freq: int = 1) -> dict:
    """Brute-force replay: overlapping k-token windows, corpus frequency
    by exact text, per-doc covered-position union computed POSITIONALLY
    (set of covered token indices) — independent of the operator's
    gap-sum formulation."""
    toks = {i: [t for t in re.split(r"\s+", s.strip(" ")) if t] for i, s in docs.items()}
    wins: dict[int, list[tuple[int, str]]] = {}
    freq: dict[str, int] = {}
    for i, w in toks.items():
        n = len(w)
        if n == 0:
            wins[i] = []
            continue
        starts = range(max(n - k, 0) + 1)
        wins[i] = [(s, " ".join(w[s : s + k])) for s in starts]
        for _, seg in wins[i]:
            freq[seg] = freq.get(seg, 0) + 1
    out = {}
    for i, w in toks.items():
        n = len(w)
        dup_starts = [s for s, seg in wins[i] if freq[seg] > max_freq]
        covered: set[int] = set()
        for s in dup_starts:
            covered.update(range(s, min(s + k, n)))
        out[i] = dict(
            n_tokens=n,
            n_windows=len(wins[i]),
            n_dup_windows=len(dup_starts),
            dup_coverage=round(len(covered) / n, 6) if n else 0.0,
        )
    return out


def test_window_coverage_planted(spark):
    from etl_s3_to_redshift_spark.operators.dedup import duplicated_window_coverage

    boiler = "alpha beta gamma delta epsilon zeta"  # 6 tokens, k=4 below
    docs = {
        0: boiler + " unique tail zero here now",
        1: boiler + " other ending words entirely different",
        2: "completely fresh text with no shared windows at all",
        3: "",  # empty doc
        4: "short",  # below window size, unique
        5: "short",  # below window size, duplicated whole-doc window
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in duplicated_window_coverage(df, window_tokens=4).collect()
    }
    want = _py_window_coverage(docs, k=4)
    assert len(got) == len(docs)
    for i in docs:
        for key, v in want[i].items():
            assert got[i][key] == v, (i, key, got[i][key], v)
    # the planted boilerplate prefix is flagged on both carriers
    assert got[0]["n_dup_windows"] >= 3 and got[1]["n_dup_windows"] >= 3
    assert got[2]["n_dup_windows"] == 0 and got[2]["dup_coverage"] == 0.0
    assert got[5]["dup_coverage"] == 1.0  # whole-doc window duplicated


tiny_doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
).map(" ".join)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(tiny_doc, min_size=1, max_size=6), k=st.integers(2, 4))
def test_window_coverage_matches_bruteforce(spark, texts, k):
    from etl_s3_to_redshift_spark.operators.dedup import duplicated_window_coverage

    docs = dict(enumerate(texts))
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in duplicated_window_coverage(df, window_tokens=k).collect()
    }
    want = _py_window_coverage(docs, k=k)
    assert set(got) == set(want)
    for i in want:
        for key, v in want[i].items():
            assert got[i][key] == v, (i, key, got[i][key], v, docs[i])


# ---------------------------------------------------------------------------
# CCNet perplexity buckets
# ---------------------------------------------------------------------------


def test_perplexity_buckets_contract(spark):
    """Every scoreable doc lands in exactly one bucket; within each
    language, every head score <= every middle score <= every tail
    score, and heads are never more than a third-plus-boundary-ties
    share of the language."""
    import math

    from etl_s3_to_redshift_spark.operators.textops import perplexity_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = perplexity_buckets(docs).collect()
    assert len(rows) > 0
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in rows:
        assert r["bucket"] in ("head", "middle", "tail")
        assert abs(r["ppl"] - round(math.exp(r["avg_neglogp"]), 6)) < 1e-9
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            r["avg_neglogp"]
        )
    for lang, buckets in by_lang.items():
        head = buckets.get("head", [])
        mid = buckets.get("middle", [])
        tail = buckets.get("tail", [])
        n = len(head) + len(mid) + len(tail)
        if head and mid:
            assert max(head) <= min(mid), lang
        if mid and tail:
            assert max(mid) <= min(tail), lang
        if tail and not mid and head:
            assert max(head) <= min(tail), lang
        # interpolated-percentile split puts ~1/3 in the head modulo ties
        assert len(head) <= n, lang


def test_perplexity_buckets_rowcount_matches_scores(spark):
    from etl_s3_to_redshift_spark.operators.textops import (
        perplexity_buckets,
        unigram_logprob_scores,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_scores = unigram_logprob_scores(docs).count()
    assert perplexity_buckets(docs).count() == n_scores


# ---------------------------------------------------------------------------
# SSL-prototypes pruning
# ---------------------------------------------------------------------------


def test_prototype_prune_matches_numpy_replay(spark):
    """On a corpus small enough to replay exactly: cluster assignment
    aside (shared, separately pinned machinery), within every cluster
    the dropped rows are exactly the floor(f*m) highest (rounded cos,
    -id) ranks among non-dirty rows."""
    from etl_s3_to_redshift_spark.operators.similarity import prototype_prune

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = prototype_prune(emb, drop_fraction=0.3).collect()
    assert len(rows) == emb.count()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster) == 16  # 500 rows -> max(16, 0) clusters
    for cid, members in by_cluster.items():
        m = len(members)
        drop_n = int(np.floor(0.3 * m))
        dropped = [r for r in members if not r["kept"]]
        assert len(dropped) == drop_n, (cid, m, len(dropped))
        # dropped = top-drop_n by (proto_cos desc, id asc), no NULLs
        ranked = sorted(
            members,
            key=lambda r: (
                -(r["proto_cos"] if r["proto_cos"] is not None else -2.0),
                r["vec_id"],
            ),
        )
        want_dropped = {r["vec_id"] for r in ranked[:drop_n]}
        assert {r["vec_id"] for r in dropped} == want_dropped, cid


def test_prototype_prune_dirty_rows_always_kept(spark):
    from etl_s3_to_redshift_spark.operators.similarity import prototype_prune

    data = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.98, 0.02, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, None),  # NULL vector
        (5, [1.0]),  # ragged
        (6, [0.0, 0.0, 0.0]),  # zero norm
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in prototype_prune(df, drop_fraction=0.5).collect()}
    assert len(got) == len(data)
    for dirty in (4, 5, 6):
        assert got[dirty]["kept"], dirty
        assert got[dirty]["proto_cos"] is None, dirty
    # with half of each cluster dropped, at least one clean row dropped
    assert any(not got[i]["kept"] for i in (0, 1, 2, 3))
