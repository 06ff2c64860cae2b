"""Scaling probe: run headline queries at sf0.1 and at the 10x replica
(tools/gen_scale_data.py -> /tmp/spark_graft_scale/sf1), report the
runtime ratio per query.

A shuffle- and scan-dominated plan on fixed cores should scale ~linearly
(ratio ~<= 10 for 10x rows); a quadratic or driver-bottlenecked plan shows
up immediately as a much larger ratio. Pairwise-dedup queries whose OUTPUT
is inherently superlinear in duplicate density (jaccard/minhash/simhash
pair emission) are probed via their bounded-output composition
(`dedup_survivors`) instead of raw pair dumps.

Usage: python tools/scaling_probe.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (  # noqa: E402
    get_spark,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)

SMALL = "/root/testdata/sf0.1"
BIG = "/tmp/spark_graft_scale/sf1"

PROBE = [
    # star fact + classic analytics (scan/join/agg dominated)
    "gold_fact_lineitem",
    "order_totals",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "window_dedup",
    "date_expr_join",
    "sessionize_batch",
    "sessionize_batch_split",  # skew-safe twin: one (user, time-bucket) exchange
    "asof_join",
    "range_join",
    "grouped_median",
    "exact_quantiles",
    "time_range_window",
    "lateral_topk",
    "recursive_chain",
    "variant_extract",
    "geo_cell_join",
    "fuzzy_join",
    # text / corpus operators (per-row + vocabulary shuffles)
    "text_analysis",
    "top_ngrams",
    "tf_idf",
    "segment_dedup",
    "bpe_pairs",
    "bpe_merges",       # K merge rounds, vocab-bounded per round
    "bpe_encode",       # train + one K-replace projection + doc groupBy
    "bm25_rank",        # one checkpointed tokenization, broadcast df/stats
    "mix_temperature",
    "incremental_dedup",
    "budget_select",    # two-phase prefix scan under a token budget
    "multimodal_phash",
    "multimodal_decode",  # real BMP encode->parse roundtrip (mapInPandas)
    "pii_scan",         # 3-regex scan+redact projection, O(sources) rollup
    "containment_dedup",  # winnow inverted-index self-join, df-capped
    "collocation_pmi",  # one tokenization -> checkpointed bigram counts
    # dedup composition with bounded output
    "dedup_survivors",
    # vector ops
    "ann_topk_np",
    "hard_negatives",   # bounded anchor batch x corpus, label-inequality
    "embedding_outliers",  # (label,dim) combine + broadcast centroid fold
    "embedding_quantize",
    "pq_topk",          # PQ/ADC: literal-codebook encode + query LUTs
    "pq_topk_trained",  # + 2 integer k-means rounds (O(codebook) collects)
    "ivfpq_topk",       # IVF cells x PQ codes: probe 1/16 corpus, ADC score
    "ivf_nprobe_topk",  # nprobe=4 recall knob: 4 probed cells per query
    "ivfpq_nprobe_topk",  # composed index with the recall knob turned
    "ivfpq_residual_topk",  # residual coding: per-cell query LUTs, nprobe=4
    "ann_recall_eval",  # recall@3 curve: brute-force truth + 3 IVF tiers
    "mmr_select",       # 5 fixed argmax rounds, literal selected vectors
    "substring_dedup",  # rolling 8-gram explode + count join, O(docs) out
    "substring_dedup_hashed",  # int64-gram twin: ~8x fewer exchange bytes
    "audio_decode",         # real WAV write+parse roundtrip per doc
    "audio_window_energy",  # windowed PCM energy fan-out (reduceat)
    "video_decode",         # real Y4M write+parse roundtrip per doc
    "video_frame_sample",   # true every-2nd-frame luma extraction
    "media_decode",         # 4-way magic-byte router over one blob column
    "substring_trim",   # dup-span removal: dup-window positions -> rebuild
    # round-9 additions
    "kcore_decompose",  # 3 peel rounds: degree agg + 2 semi-joins each
    "preference_pairs", # one struct-argmax aggregate per stratum
    "bloom_prune_join", # bounded-collect bitmap, codegen bit-test probe
    "keyword_textrank", # O(tokens) adjacency explode + word-graph pagerank
    "embedding_pca_power",  # 3 rounds x (zip_with fold + 64-col agg)
    "video_scene_cuts", # per-pair numpy SAD over real Y4M frames
    # round-10 additions
    "jaccard_prefix_join",  # dup-collapse + rare-first prefix candidates
    "cms_topk",         # depth*width bounded sketch, broadcast probe
    # streaming (availableNow, state-store bound)
    "streaming_window_agg",
    "streaming_running_totals",
    "running_totals_window",   # JVM twin of the Python-state path above
    # round-3 TPC-H decorrelation pack
    "tpch_q2",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    # round-3 iterative-graph + product-analytics families
    "list_ranking",
    "pagerank_trade",
    "dedup_sorted_neighborhood",
    "funnel_conversion",
    "cohort_retention",
    "copurchase_lift",
    "triangle_count",
    "bfs_reach",
    "label_propagation",  # O(E) join + 2 map-side aggs per round
    "community_modularity",  # LPA + 2 label joins, O(communities) aggs
    "ohlc_bars",        # one map-side-combined agg, O(types x hours) out
    "ols_trend",
    "profile_table",
    "profile_table_approx",
    "attribution_last_touch",
    "skew_profile",
    "robust_zscore",
    "robust_zscore_approx",
    "event_transitions",
    "oov_rate",
    "source_overlap",
    "pagerank_weighted",
    "global_median_select",
    "weighted_median",
    "weighted_median_approx",
    "gini_concentration",
    "mode_per_group",
    "ratio_to_report",
    "longest_streak",
    # round-4 CRM/product-analytics + ML-prep shapes
    "rfm_segments",
    "zipf_head_share",
    "token_diversity",
    "feature_hashing",
    "class_rebalance",
    "chi_square",
    "dau_wau",
    "target_encoding",
    "correlation_matrix",
    "ewma_smooth",
    "benford_deviation",
    "new_vs_returning",
    "interval_merge",
    "ab_test_zscore",
    "degree_assortativity",
    "shortest_path_weighted",
    "mutual_information",
    "token_entropy",
    "cusum_changepoint",
    "seasonality_dow",
    "token_drift",
    "lm_perplexity",
    "kl_divergence_sources",
    "k_anonymity_audit",
    "rank_fusion_rrf",
    "attribution_linear",
    "autocorrelation",
    "iqr_outliers",
    # round-5: corpus medallion pipeline + analytics additions
    "corpus_streaming_ingest",
    "corpus_survivors_agg",
    "leakage_safe_split",
    "corpus_silver_docs",
    "corpus_gold_survivors",
    "corpus_gold_mix",
    "corpus_expectations",
    "lm_perplexity_pruned",
    "user_paths",
    "event_entropy",
    "decile_lift",
    "pareto_customers",
    "time_weighted_avg",
]


from bench import time_noop  # noqa: E402


if __name__ == "__main__":
    only = set(sys.argv[1:])  # optional subset: python tools/scaling_probe.py q1 q2
    spark = get_spark("scaling-probe")
    print("| query | sf0.1 (s) | sf1 = 10x (s) | ratio |")
    print("|---|---|---|---|")
    for name in PROBE if not only else [q for q in PROBE if q in only]:
        fn = SPARK_QUERIES[name]
        try:
            t_small = time_noop(spark, fn, SMALL)
            t_big = time_noop(spark, fn, BIG)
            print(
                f"| {name} | {t_small:.2f} | {t_big:.2f} | "
                f"{t_big / t_small:.1f}x |",
                flush=True,
            )
        except Exception as exc:
            print(f"| {name} | — | — | ERROR {type(exc).__name__} |", flush=True)
