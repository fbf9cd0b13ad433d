"""Vocabulary-scale probe for the vocab-bound text paths (VERDICT r5
item 2): runs them against the ~115k-distinct-word Zipf corpus from
tools/gen_vocab_corpus.py — the driver lake's documents table (31
distinct words at sf0.1) never stresses these.

Probes (each timed, results printed as a markdown table for SCALING.md):
  1. text_vocab_topk / text_tfidf_topterms / text_zipf_fit /
     text_unigram_logprob registry queries pointed at the vocab corpus
     (registry callables take any sf_dir with a documents.parquet).
  2. Distributed BPE: train_bpe(local_vocab_max=0, batch_size=64,
     n_merges=256) — the driver-local fast path disabled, every round a
     real Spark pair-count + batched merge over the 115k-word vocab.
  3. apply_bpe_vocab with spark.sql.autoBroadcastJoinThreshold=-1 — the
     tokenized-vocabulary join forced to a real shuffle join (the 100 TB
     regime where a giant vocab outgrows broadcast).
  4. Sanity: distributed-vs-driver BPE merge-table equality at
     n_merges=64 on the REAL vocabulary (the unit suite pins this only
     on tiny vocab).

Usage: python tools/vocab_scale_probe.py  (regenerates nothing; run
gen_vocab_corpus.py first).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_s3_to_redshift_spark.operators import bpe  # noqa: E402
from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()

VOCAB_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "vocab"
)


def mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    if not os.path.exists(os.path.join(VOCAB_DIR, "documents.parquet")):
        print("run tools/gen_vocab_corpus.py first", file=sys.stderr)
        return 1
    spark = get_spark("vocab_probe")
    docs = spark.read.parquet(os.path.join(VOCAB_DIR, "documents.parquet"))
    n_docs = docs.count()
    n_distinct = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    print(f"corpus: {n_docs} docs, {n_distinct} distinct words\n")
    rows = []

    def probe(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        rows.append((name, best))
        print(f"  {name:55s} {best:7.2f}s", flush=True)

    # 1. registry text queries on the real vocabulary
    for q in (
        "text_vocab_topk",
        "text_tfidf_topterms",
        "text_zipf_fit",
        "text_unigram_logprob",
        "text_bigram_topk",
    ):
        probe(q, lambda q=q: mat(REGISTRY[q].spark(spark, VOCAB_DIR)))

    # 2. distributed BPE (driver-local path disabled), batched-greedy
    probe(
        "train_bpe distributed (256 merges, batch=64, 115k vocab)",
        lambda: bpe.train_bpe(
            docs, n_merges=256, batch_size=64, local_vocab_max=0
        ).collect(),
        reps=1,
    )

    # 3. vocab-memoized application with the vocab join forced off
    #    broadcast (the giant-vocabulary regime)
    merges_df = bpe.train_bpe(docs, n_merges=64, batch_size=64)
    merges = [(r["left"], r["right"]) for r in merges_df.collect()]
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    def apply_shuffle_join():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            mat(bpe.apply_bpe_vocab(docs.select("doc_id", "text"), merges))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)

    probe("apply_bpe_vocab 64 merges, vocab join FORCED shuffle", apply_shuffle_join)
    probe(
        "apply_bpe_vocab 64 merges, size-driven (broadcast)",
        lambda: mat(bpe.apply_bpe_vocab(docs.select("doc_id", "text"), merges)),
    )

    # 4. distributed == driver-local on the real vocabulary
    t0 = time.time()
    dist = bpe.train_bpe(docs, n_merges=64, batch_size=64, local_vocab_max=0)
    drv = bpe.train_bpe(docs, n_merges=64, batch_size=64, local_vocab_max=10**9)
    d, v = [tuple(r) for r in dist.collect()], [tuple(r) for r in drv.collect()]
    same = d == v
    print(f"\n  distributed == driver-local merge table (64 merges): {same} "
          f"({time.time()-t0:.1f}s)")
    if not same:
        for a, b in zip(d, v):
            if a != b:
                print("   first divergence:", a, b)
                break

    print("\n| probe | wall (best of reps) |")
    print("|---|---|")
    for name, t in rows:
        print(f"| {name} | {t:.2f}s |")
    return 0 if same else 2


if __name__ == "__main__":
    raise SystemExit(main())
