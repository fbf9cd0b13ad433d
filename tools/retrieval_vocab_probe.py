"""Retrieval stack on a REAL vocabulary (VERDICT r6 item 5): point
text_bm25_topk's operator and hybrid_rrf_topk at the 115k-word Zipf
corpus (tools/gen_vocab_corpus.py — non-degenerate IDF, real posting
skew: the rank-0 word's postings list covers most of the corpus while
the tail is singletons) and record wall + a relevance sanity table.

The driver lake's documents table has ~31 distinct words, so the
registered queries never stress the inverted-index path: hot-term
postings interacting with the salted two-phase top-k, IDF separating a
rare term from a stopword-class term, and the shortlist contract under
a 115k-term dictionary.

Usage: python tools/retrieval_vocab_probe.py   (after gen_vocab_corpus)
Writes a markdown block to stdout; paste/refresh into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402
from tools.gen_vocab_corpus import _word  # noqa: E402

VOCAB_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "vocab"
)


def main() -> None:
    spark = get_spark("retrieval_vocab_probe")
    docs = spark.read.parquet(os.path.join(VOCAB_DIR, "documents.parquet"))
    n_docs = docs.count()

    # query words by vocabulary rank: hot (stopword-class), mid, rare
    w_hot, w_hot2 = _word(0, None), _word(3, None)
    w_mid, w_mid2 = _word(500, None), _word(2_000, None)
    w_rare, w_rare2 = _word(60_000, None), _word(90_000, None)
    queries = [
        (1, f"{w_hot} {w_hot2}"),            # both hot: worst-case postings
        (2, f"{w_hot} {w_rare}"),            # IDF contrast: rare must dominate
        (3, f"{w_mid} {w_mid2}"),            # mid-frequency pair
        (4, f"{w_rare} {w_rare2}"),          # both rare: tiny candidate set
        (5, f"{w_hot} {w_mid} {w_rare2}"),   # mixed 3-term
    ]
    qdf = spark.createDataFrame(queries, "query_id INT, query_text STRING")

    from etl_s3_to_redshift_spark.operators.textops import bm25_topk

    # posting-skew stats for the chosen terms
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    )
    terms = sorted({t for _, q in queries for t in q.split()})
    dfreq = {
        r["t"]: r["df"]
        for r in toks.filter(F.col("t").isin(terms))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    print(f"corpus: {n_docs} docs; term postings (occurrences):")
    for t in terms:
        print(f"  {t}: {dfreq.get(t, 0)}")

    walls = []
    for rep in range(3):
        t0 = time.time()
        rows = bm25_topk(docs, qdf, k=10).collect()
        walls.append(round(time.time() - t0, 2))
    print(f"bm25_topk walls (3 reps): {walls}  -> median {sorted(walls)[1]}")

    by_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)

    # relevance sanity
    doc_text = {
        r["doc_id"]: r["text"]
        for r in docs.filter(
            F.col("doc_id").isin([r["doc_id"] for r in rows])
        ).collect()
    }
    ok = True
    # q2: every top doc must contain the RARE term (IDF dominates),
    # unless fewer than 10 docs contain it at all
    q2 = by_q[2]
    n_rare_docs = sum(1 for r in q2 if w_rare in doc_text[r["doc_id"]].split())
    print(f"q2 (hot+rare): {n_rare_docs}/10 top docs contain the rare term")
    if q2 and w_rare not in doc_text[q2[0]["doc_id"]].split():
        ok = False
        print("  FAIL: rank-1 doc lacks the rare term")
    # q4: all hits contain at least one of the two rare terms
    for r in by_q.get(4, []):
        ws = set(doc_text[r["doc_id"]].split())
        if w_rare not in ws and w_rare2 not in ws:
            ok = False
            print(f"  FAIL q4: doc {r['doc_id']} has neither rare term")
    # monotone scores within each query
    for q, rs in by_q.items():
        scores = [r["score"] for r in rs]
        if scores != sorted(scores, reverse=True):
            ok = False
            print(f"  FAIL q{q}: scores not descending")
    print("bm25 relevance sanity:", "PASS" if ok else "FAIL")

    # hybrid RRF at vocabulary scale: deterministic hash-derived 16-dim
    # embeddings (the dense leg is geometry-agnostic plumbing here; the
    # vocabulary stresses the SPARSE leg + fusion)
    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.array(
            *[
                (
                    (F.xxhash64(F.col("text"), F.lit(i)) % 1000).cast("double")
                    / 500.0
                    - 1.0
                )
                for i in range(16)
            ]
        ).alias("embedding"),
    )
    from etl_s3_to_redshift_spark.operators.similarity import hybrid_rrf_topk

    qids = [int(docs.orderBy("doc_id").limit(1).collect()[0]["doc_id"]) + i for i in (0, 7, 23)]
    for impl in ("brute", "ivf"):
        ws = []
        for rep in range(2):
            t0 = time.time()
            out = hybrid_rrf_topk(
                docs, emb, qids, k_list=20, k_final=10, dense_impl=impl
            ).collect()
            ws.append(round(time.time() - t0, 2))
        print(f"hybrid_rrf[{impl}] walls (2 reps): {ws}  rows={len(out)}")


if __name__ == "__main__":
    main()
