"""Benchmark harness — the driver runs this per-round at sf0.1.

Runs the headline queries on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The driver records only the LAST 2000 chars of stdout (BENCH_r03.json
was truncated to parsed:null when the 72-query line outgrew that), so
the printed line is hard-capped: the full per-query map always goes to
BENCH_DETAIL.json next to this script, and the stdout "queries" map
carries as many entries as fit under the cap, slowest first (the perf-
relevant tail), with "queries_omitted" counting the rest.

Each query is fully materialized via the noop sink (all partitions
computed, nothing shipped to the driver) — measuring engine throughput,
not toPandas serialization.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()

# Headline set: the scan/join/agg-heavy queries that dominate real use.
# Extended as operators land; cheap O(1)-output probes are excluded.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "r2_broadcast_enrich",
    "w1_top_orders_per_customer",
    "w2_running_user_value",
    "t1_hourly_event_rollup",
    "sessionize_events",
    "r4_distinct_projection",
    "r9_top_k",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "text_quality",
    "text_fingerprint",
    "stream_tumbling_events",
    "stream_session_window",
    "mm_binary_features",
    "asof_last_purchase",
    "range_join_shipments",
    "pivot_event_counts",
    "udf_minmax_normalize",
    "text_tfidf_topterms",
    "sim_topk_cosine_fast",
    "q4_order_priority_check",
    "q6_revenue_forecast",
    "q10_top_returners",
    "q14_promo_share",
    "q18_large_orders",
    "cube_order_stats",
    "sql_api_min_cost_supplier",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q12_late_shipment_priority",
    "q13_order_count_distribution",
    "q15_top_revenue_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q19_bracketed_revenue",
    "q21_waiting_supplier",
    "q22_dormant_value_customers",
    "q11_important_part_value",
    "q20_prolific_part_suppliers",
    "ts_gapfill_hourly",
    "fuzzy_customer_match",
    "emb_label_centroids",
    "agg_corr_regression",
    "w4_value_range_frames",
    "grouping_sets_orders",
    "rollup_incremental_merge",
    "data_source_mixture",
    "funnel_user_conversion",
    "cohort_retention_weekly",
    "event_transition_matrix",
    "text_vocab_topk",
    "text_unigram_logprob",
    "scd2_customer_history",
    "text_pii_scrub",
    "text_bigram_topk",
    "ts_interpolate_linear",
    "data_weighted_sample",
    "ts_anomaly_zscore",
    "attr_multi_touch",
    "mm_audio_windows",
    "data_split_leakage",
    "sim_ann_lsh",
    "dedup_containment",
    "w7_sliding_distinct_users",
    "agg_mode_median",
    "w6_topk_with_ties",
    "w8_moving_median",
    "text_zipf_fit",
    "basket_copurchase_pairs",
    "customer_rfm_segments",
    "graph_pagerank_nations",
    "w9_longest_daily_streak",
    "text_chunk_windows",
    "ts_decompose_hourly",
    "ts_inflight_shipments_daily",
    "entity_groups_fuzzy",
    "text_bigram_logprob",
    "events_top_paths",
    "basket_association_rules",
    "ts_seasonal_anomalies",
    "data_group_aware_split",
    "dq_orders_expectations",
    # round-5 additions: the scale-hardened prefix-sum pair, the exact
    # equi-depth histogram (no global window since r5), and the Arrow-
    # signature LSH already above; hist/pareto exercise ranked_running
    "orders_yoy_growth",
    "supplier_pareto_revenue",
    "hist_equidepth_deciles",
    "text_bpe_tokenize",  # train->apply tokenizer loop (vocab-memoized)
    "dq_drift_psi",  # PSI snapshot-drift audit (bucket-frame-bounded)
    # round-6 additions (this session): DSIR importance weights,
    # contrastive hard negatives, trigram first-occurrence novelty,
    # SemDeDup cluster-then-prune
    "data_dsir_weights",
    "emb_hard_negatives",
    "text_ngram_novelty",
    "dedup_semantic_clusters",
    # round-6 second batch: bitext margin mining (all-pairs Arrow
    # kernel + penalty windows), its LSH-shortlist lake-scale variant,
    # and the Gopher rule gate (narrow scan)
    "emb_bitext_margin",
    "emb_bitext_margin_ann",
    "text_gopher_rules",
    # round-6 third batch: C4 cleaning gate (narrow scan), overlapping
    # exact-substring coverage (two linear shuffles), CCNet perplexity
    # buckets (unigram model + per-lang percentile join), SSL-prototypes
    # pruning (quantizer + broadcast-centroid cosine + cluster windows)
    "text_c4_rules",
    "dedup_exact_substrings",
    "text_perplexity_buckets",
    "emb_prototypes_prune",
    # round-6 fourth batch: token-budget mixture (groupBy + broadcast
    # quota + per-source running sum), CCNet line-hash keep-first dedup
    # (two linear shuffles), greedy k-center coreset (k one-row
    # driver round-trips over a checkpointed narrow frame)
    "data_token_budget",
    "dedup_lines_keepfirst",
    "emb_kcenter_coreset",
    # tokenizer fertility/compression report (train 16 merges + vocab-
    # memoized apply + slice groupBy — the text_bpe_tokenize pipeline
    # rolled up per corpus slice)
    "text_tokenizer_report",
    # round-6 fifth batch: BM25 lexical retrieval (semi-joined postings
    # + 1-row stats broadcast + two-phase top-k), the end-to-end
    # curation funnel (gates fused into one scan + coverage shuffles
    # over survivors + one 5-count aggregate), and Misra-Gries heavy
    # hitters (bounded-memory mapInPandas sketch + exact rescore)
    "text_bm25_topk",
    "data_curation_funnel",
    "approx_heavy_hitters",
    # hybrid RRF fusion: both retrieval legs + a rank-frame join
    "sim_hybrid_rrf",
    # round-7: the ANN-backed fusion (IVF train→assign→probe inline —
    # the one-shot shape; the saved-index DPP path is plan-pinned in
    # tests and measured in SCALING.md)
    "sim_hybrid_rrf_ann",
    # round-8: the amortized shape — probe a SAVED cell-partitioned
    # index (build once per lake, statically-pruned arrow rescore);
    # the first MEASURED points where the ANN path beats the brute
    # dense scan — plus the full hybrid stack riding it
    "sim_ann_ivf_saved",
    "sim_hybrid_rrf_ann_saved",
    "sim_ann_ivf_appended",
    "dedup_minhash_staged",
]


# Data-bound subset for sf>=1 passes: the scan/shuffle-heavy queries where
# data volume (not plan/codegen constants) dominates wall time — the set the
# 100x question is about. At sf0.1 constants dominate (SCALING.md:182), so
# the per-round BENCH runs everything; pointing SPARK_GRAFT_SF_DIR at an
# sf>=1 lake (tools/gen_sf1.py builds one) trims to this subset and
# best-of-2 so the pass stays minutes, not an hour.
DATA_BOUND = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_supplier",
    "w2_running_user_value",
    "t1_hourly_event_rollup",
    "sessionize_events",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "text_tfidf_topterms",
    "fuzzy_customer_match",
    "agg_corr_regression",
    "rollup_incremental_merge",
    "cohort_retention_weekly",
    "text_vocab_topk",
    "text_bigram_topk",
    "text_pii_scrub",
    "text_zipf_fit",
    "text_chunk_windows",
    "basket_copurchase_pairs",
    "customer_rfm_segments",
    "graph_pagerank_nations",
    "w9_longest_daily_streak",
    "ts_decompose_hourly",
    "ts_inflight_shipments_daily",
    "text_bigram_logprob",
    "basket_association_rules",
    "supplier_pareto_revenue",
    "hist_equidepth_deciles",
    "dq_drift_psi",
    "text_bpe_tokenize",
    # round-6: end-to-end ER via clique-contraction blocking + CC
    "entity_groups_fuzzy",
    # round-6 additions: DSIR weights and trigram novelty are corpus-
    # scan text ops; hard-negative mining streams the corpus per query;
    # SemDeDup shuffles the corpus once into per-cluster gram kernels
    "data_dsir_weights",
    "emb_hard_negatives",
    "text_ngram_novelty",
    "dedup_semantic_clusters",
    # round-6 second batch: the Gopher gate is a pure corpus scan.
    # emb_bitext_margin is deliberately NOT here: its registered form is
    # exact all-pairs mining (|A|x|B| quadratic — the correctness
    # baseline); past sf0.1 the honest shape is the ANN-shortlist swap
    # documented in bitext_margin_pairs, not a quadratic bench point.
    "text_gopher_rules",
    # round-6 third batch: all four are corpus-linear — the C4 gate and
    # window-coverage audit scan/shuffle the corpus, perplexity buckets
    # ride the unigram-model shuffle, prototypes the quantizer assign
    "text_c4_rules",
    "dedup_exact_substrings",
    "text_perplexity_buckets",
    "emb_prototypes_prune",
    # round-6 fourth batch (all corpus-linear): token-budget mixture,
    # line-hash keep-first dedup, greedy k-center coreset (k bounded
    # scans — data-bound per scan)
    "data_token_budget",
    "dedup_lines_keepfirst",
    "emb_kcenter_coreset",
    "text_tokenizer_report",
    # round-6 fifth batch (corpus-linear): BM25 postings scan + query-
    # term shuffle; the funnel is two corpus scans + coverage shuffles;
    # heavy hitters one sketch scan + one candidate-count scan
    "text_bm25_topk",
    "data_curation_funnel",
    "approx_heavy_hitters",
    # hybrid fusion's dense leg is the brute-force broadcast scan (the
    # sim_topk_cosine class); corpus-linear, fusion join is rank-sized
    "sim_hybrid_rrf",
    # ANN-backed fusion, one-shot shape: quantizer train + corpus cell
    # assignment dominate (SCALING.md round-7 — slower than brute by
    # design here; the saved-index path is the lake shape)
    "sim_hybrid_rrf_ann",
    # round-8: the lake shape MEASURED — saved-index probe, build
    # amortized out of the timed path (first rep builds, so best-of-2
    # records the warm probe; the detail file keeps both reps) — and
    # the hybrid fusion with its dense leg on that probe
    "sim_ann_ivf_saved",
    "sim_hybrid_rrf_ann_saved",
    "sim_ann_ivf_appended",
    "dedup_minhash_staged",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    data_bound_pass = sf >= 1
    source = DATA_BOUND if data_bound_pass else HEADLINE
    names = [n for n in source if n in REGISTRY]
    missing = [n for n in source if n not in REGISTRY]
    if missing:
        print(f"WARNING: headline queries missing from registry: {missing}", file=sys.stderr)
    # warm the JVM + file-listing caches + Python/Arrow workers once
    materialize(REGISTRY[names[0]].spark(spark, sf_dir).limit(1))
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # 3 reps per query (2 at sf>=1 to keep the pass minutes-long): the
    # container shares its host (load avg ~3 while idle was measured),
    # which flaps single-shot wall times by up to 5× (round-2
    # measurement: back-to-back full runs spanned 18–28s total). The
    # REPORTED estimator is the per-query MEDIAN (VERDICT r5 item 6:
    # median separates noise from regression where a minimum hides both);
    # the detail file keeps every rep plus the min so the r1–r5 best-of
    # series stays comparable.
    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    reps = 2 if data_bound_pass else 3
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            materialize(REGISTRY[name].spark(spark, sf_dir))
            ts.append(round(time.time() - t0, 3))
        all_reps[name] = ts
        # isolate queries: drop SQL-cached relations and let the
        # ContextCleaner reap lineage-truncating localCheckpoint RDDs
        # whose Python references just went out of scope — a 100+-query
        # session otherwise accumulates storage blocks that bleed
        # memory/disk pressure into later queries' timings
        spark.catalog.clearCache()
        gc.collect()
        ordered = sorted(ts)
        # median for odd reps; for 2 reps the min (matches the prior
        # BENCH_sf1_r03..r05 best-of-2 series)
        timings[name] = ordered[len(ordered) // 2] if reps % 2 else ordered[0]

    metric = "data_bound_queries_total_sec" if data_bound_pass else "headline_queries_total_sec"
    total = round(sum(timings.values()), 3)

    detail = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "estimator": "median_of_3" if reps == 3 else "best_of_2",
        "queries": timings,
        "reps": all_reps,
        "best": {n: min(ts) for n, ts in all_reps.items()},
        "sf": sf,
    }
    # the sf>=1 data-bound pass writes its own detail file so it can't
    # clobber the headline artifact (it did, once)
    detail_name = "BENCH_DETAIL_sf1.json" if data_bound_pass else "BENCH_DETAIL.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")

    # stdout line, hard-capped under the driver's 2000-char tail capture:
    # slowest queries first so the perf-relevant entries always survive
    cap = 1900
    out = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "estimator": detail["estimator"],
        "queries": {},
        "queries_omitted": 0,
        "detail": detail_name,
        "sf": sf,
    }
    by_time = sorted(timings, key=lambda n: (-timings[n], n))
    for i, name in enumerate(by_time):
        trial = dict(out)
        trial["queries"] = {**out["queries"], name: round(timings[name], 2)}
        trial["queries_omitted"] = len(timings) - i - 1
        if len(json.dumps(trial, separators=(",", ":"))) > cap:
            break
        out = trial
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
