"""Measure headline-query scaling across sf0.001/0.01/0.1 (+ the local
sf1 lake if tools/gen_sf1.py has been run — the data-bound point where
constants stop dominating) → SCALING_DATA.json and a markdown table on
stdout. Usage: python tools/scaling_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()

QUERIES = [
    "q1_pricing_summary",
    "q18_large_orders",
    "r2_broadcast_enrich",
    "w1_top_orders_per_customer",
    "sessionize_events",
    "dedup_minhash_lsh",
    "sim_topk_cosine_fast",
    "text_tfidf_topterms",
    # round-2 TPC-H shapes: deepest join tree, outer-join double agg,
    # and the triple self-join — the plans most worth a data-bound point
    "q9_product_profit",
    "q13_order_count_distribution",
    "q21_waiting_supplier",
    # round-2b: chunk-frequency shuffle + reassembly, complement-key
    # blocked fuzzy join, spine-generating gap-fill
    "dedup_repeated_chunks",
    "fuzzy_customer_match",
    "ts_gapfill_hourly",
    # round-3c/3d: zipped n-grams, in-scan scrub, per-conversion window
    "text_bigram_topk",
    "text_pii_scrub",
    "attr_multi_touch",
    "ts_interpolate_linear",
    # round-3b: distinct-agg cohort matrix, vocabulary-sized shuffle +
    # TakeOrdered top-k, and the two-scan mixture apportionment
    "cohort_retention_weekly",
    "text_vocab_topk",
    "data_source_mixture",
    # round-4: vocab-bounded zipf fit, in-scan chunking, in-row basket
    # pairs, checkpointed PageRank iterations, islands streaks, RFM
    # percentile broadcast, integer-exact decomposition, +1/-1 sweep,
    # window-derived bigram model
    "text_zipf_fit",
    "text_chunk_windows",
    "basket_copurchase_pairs",
    "graph_pagerank_nations",
    "w9_longest_daily_streak",
    "customer_rfm_segments",
    "ts_decompose_hourly",
    "ts_inflight_shipments_daily",
    "text_bigram_logprob",
    # round-5: the two-pass prefix-sum pair (supplier-frame rank/cumsum,
    # full-fact exact equi-depth) and the vocab-memoized tokenizer loop
    "supplier_pareto_revenue",
    "hist_equidepth_deciles",
    "text_bpe_tokenize",
    # round-6: end-to-end ER (clique-contraction blocking + adaptive CC)
    "entity_groups_fuzzy",
    # round-6 curation additions: token-window DSIR weights, broadcast-
    # streamed hard-negative mining, gram-window novelty, per-cluster
    # gram-kernel SemDeDup
    "data_dsir_weights",
    "emb_hard_negatives",
    "text_ngram_novelty",
    "dedup_semantic_clusters",
    # round-6 second batch: the Gopher gate is a pure scan (probe the
    # full decade ladder); bitext margin is exact all-pairs mining —
    # quadratic by construction, so probe it only through sf0.1 and
    # read the curve against the documented ANN-shortlist swap.
    "text_gopher_rules",
    "emb_bitext_margin",
    # the ANN-shortlist miner's registered form keeps the FIXED 16-plane
    # geometry its baked-literal oracle needs, so its pair work is
    # ~n²/2^bits — probe through sf1 only (measured 3.5 → 23 s for the
    # sf0.1→sf1 decade); the lake path derives bits from the corpus
    # (n_planes=None, similarity._auto_band_bits) and is pinned
    # output-equal to fixed-16 at the oracle corpus in test_ops10
    "emb_bitext_margin_ann",
    # round-6 third batch: C4 gate (pure scan), overlapping window
    # coverage (two linear shuffles + doc-partitioned lag window),
    # CCNet perplexity buckets (unigram-model shuffle + per-lang
    # percentile join), SSL-prototypes pruning (quantizer assign +
    # broadcast-centroid cosine + cluster windows)
    "text_c4_rules",
    "dedup_exact_substrings",
    "text_perplexity_buckets",
    "emb_prototypes_prune",
    # round-6 fourth batch: token-budget mixture, line-hash keep-first
    # dedup, greedy k-center coreset (k bounded one-row round-trips)
    "data_token_budget",
    "dedup_lines_keepfirst",
    "emb_kcenter_coreset",
    "text_tokenizer_report",
    # round-6 fifth batch: BM25 postings scan + semi-joined shuffle;
    # the funnel chains a corpus scan, a keep-first window, and the
    # window-coverage shuffles over survivors
    "text_bm25_topk",
    "data_curation_funnel",
    "approx_heavy_hitters",
    "sim_hybrid_rrf",
    # round-8: the amortized ANN shape — rep 1 builds+saves the IVF
    # index (cold), rep 2 probes the saved cell-partitioned layout
    # (warm), so best-of-2 records the warm probe; compare against the
    # brute curves (sim_topk_cosine = the JVM fold the RRF dense leg
    # rides, sim_topk_cosine_fast = the Arrow kernel)
    "sim_ann_ivf_saved",
    "sim_topk_cosine",
    "sim_hybrid_rrf_ann_saved",
    "dedup_minhash_staged",
]
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(_REPO, ".localdata", "sf1"),
    "sf10": os.path.join(_REPO, ".localdata", "sf10"),
    "sf100": os.path.join(_REPO, ".localdata", "sf100"),
}
SFS = [sf for sf, d in SF_DIRS.items() if os.path.isdir(d)]

# Per-query scale ceilings: quadratic-by-construction baselines whose
# honest scale story is a documented swap, not a bigger probe point
# (SCALING.md "Why bitext stops"). A default full run skips past these
# instead of relying on every invocation remembering.
SF_CAP = {
    "emb_bitext_margin": "sf0.1",  # exact all-pairs baseline
    "emb_bitext_margin_ann": "sf1",  # registered fixed-16-plane form
}
_SF_ORDER = list(SF_DIRS)


def main() -> None:
    # optional argv: query names to (re)probe — results MERGE into the
    # existing SCALING_DATA.json instead of replacing it, so a targeted
    # sf10 pass extends curves without rerunning everything.
    # --sfs sf1,sf100 restricts the probed scale factors (a new decade
    # point shouldn't re-pay the whole curve); --reps N overrides the
    # best-of-2 default (1 is plenty for multi-minute sf100 runs).
    argv = sys.argv[1:]
    sfs = SFS
    reps = 2
    if "--sfs" in argv:
        i = argv.index("--sfs")
        want = argv[i + 1].split(",")
        sfs = [sf for sf in SFS if sf in want]
        argv = argv[:i] + argv[i + 2 :]
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    names = [a for a in argv if a in REGISTRY] or QUERIES
    spark = get_spark("scaling_probe")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "SCALING_DATA.json")
    data: dict[str, dict[str, float]] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    for name in names:
        data.setdefault(name, {})
        for sf in sfs:
            cap = SF_CAP.get(name)
            if cap is not None and _SF_ORDER.index(sf) > _SF_ORDER.index(cap):
                continue
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                REGISTRY[name].spark(spark, SF_DIRS[sf]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            data[name][sf] = round(best, 3)
            # persist per measurement: multi-minute sf100 passes that die
            # late (heap pressure) must not lose every finished point
            with open(out_path, "w") as f:
                json.dump(data, f, indent=2)
            print(f"  {name} {sf} {data[name][sf]}s", flush=True)
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    print("| query | " + " | ".join(SFS) + " |")
    print("|---|" + "---|" * len(SFS))
    for name in names:
        row = data[name]
        print(f"| {name} | " + " | ".join(str(row.get(sf, "-")) for sf in SFS) + " |")


if __name__ == "__main__":
    main()
