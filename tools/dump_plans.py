"""Generate PLANS.md: physical-plan evidence for the headline queries.

For each selected query, records the formatted plan's operator tree, the
parquet scans' PushedFilters/ReadSchema (pushdown + pruning evidence), and
plan-level scale indicators (exchange count, Python stages, codegen spans).
Reproducible: python tools/dump_plans.py [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# headline bench set + the scale-story operators worth showing the tree for
PLAN_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "wordcount",
    "log_top_domains",
    "window_rank_topk_per_customer",
    "asof_join_last_purchase",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard_capped",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "stream_session_windows",
    "stream_interval_join",
    "mr_wordcount",
    "mr_log_analyzer",
    "dedup_ngram_jaccard",
    "pii_scrub_redact",
    "length_outlier_docs",
    "salted_join_urgent_lineitems",
    "merge_upsert_orders",
    "scd2_user_status",
    "incremental_rollup_merge",
    "kmeans_embeddings",
    "recursive_compound_balance",
    "cohort_retention",
    "events_time_weighted_avg",
    "cluster_safe_split",
    "token_budget_selection",
    "graph_triangle_counts",
    "graph_common_neighbors_topk",
    "skyline_parts_2d",
    "pagerank_parts_2iter",
    "dup_span_detection",
    "semantic_dedup",
    "bigram_topk",
    "dedup_incremental_new_docs",
    "k_anonymity_audit",
    "bm25_search_topk",
    "unigram_freq_scores",
    "dedup_survivor_quality",
    "hard_negative_mining",
    "inverted_index_postings",
    # round 7
    "rag_chunk_topk",
    "training_shuffle_shards",
    "hard_negative_mining_batched",
    "vocab_coverage_thresholds",
    "lang_id_confusion_matrix",
    "embedding_dim_stats",
    "graph_cc_labels_2iter",
    # round 8
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "token_diversity_scores",
    "doc_length_ks_drift",
    "chi_square_source_drift",
    "dedup_fuzzy_levenshtein",
    "bpe_merge_candidates",
    "bpe_train_merges",
    "events_user_zscore_anomalies",
    "winnow_candidate_pairs",
    "gopher_quality_rules",
    "heavy_hitters_cms_audit",
    "events_cusum_alarms",
    # round 9
    "bpe_encode_corpus",
    "doc_pack_bins_bpe",
    "winnow_candidate_pairs_fast",
    "multimodal_pixels_bmp",
    "frequent_event_sequences",
    "assoc_rules_copurchase",
    "bigram_fluency_scores",
    "embedding_outlier_topk",
    "rrf_fusion_topk",
    "url_canonical_dedup",
    "span_corruption_plan",
    "curation_verdicts",
    # round 10
    "ann_lsh_calibrated_topk",
    "ann_lsh_batch_topk",
    "ann_cosine_batch_topk",
    "ann_ivf_calibrated_topk",
    "ann_calibrated_recall_audit",
    "bpe_train_merges_batched",
    "multimodal_pixels_png",
    "multimodal_pixels_gif",
    "events_rate_limit",
    "multimodal_audio_pcm",
    "xml_roundtrip_events_agg",
    # round 11
    "multimodal_pixels_jpeg",
    "ann_int8_rerank_topk",
    "contamination_ngram_audit",
    "pq_adc_topk",
    "ivf_pq_topk",
    "ann_quantized_recall_audit",
    # round 12
    "ivf_pq_rerank_topk",
    "multimodal_pixels_jpeg420",
    "span_dedup_plan",
    "span_dedup_apply",
    "span_dedup_keep_owner",
    "ivf_pq_residual_topk",
    "ivf_pq_residual_rerank_topk",
    "span_dedup_incremental",
    "multimodal_audio_wht",
    "corpus_sample_weighted",
    "corpus_sample_weighted_stratified",
    "zorder_layout_audit",
    "multimodal_video_y4m",
    "multimodal_video_scene_cuts",
    "html_text_extraction",
    "bloom_skipping_audit",
    "multimodal_gif_animation",
    "multimodal_audio_vad",
    "multimodal_image_phash_dedup",
    # round 13
    "multimodal_video_mjpeg",
    "multimodal_video_frame_dedup",
    "multimodal_video_frame_dedup_incremental",
    "multimodal_audio_fingerprint_dedup",
    "multimodal_video_keyframes",
    "multimodal_subtitle_srt",
    "multimodal_caption_alignment",
    "multimodal_audio_fingerprint_incremental",
    "multimodal_jpeg_metadata",
    "dedup_clusters",
    # round 14
    "multimodal_jpeg_metadata_stored",
    # round 15 (the chunk-tail twins return driver-collected rows, so
    # their static plans are LocalTableScan — omitted like the memory
    # twin always was; the appended-index query's plan shows the
    # two-generation stored index feeding the incremental match)
    "dedup_appended_index",
]


_TREE_CAP = 150  # plans over persisted frames embed each InMemoryRelation's
# full initial+final AQE subtree; past this depth the tree is evidence of
# caching, not of plan shape, so cap it and say so


def tree_of(formatted: str) -> str:
    """The numbered operator tree at the top of a formatted explain."""
    lines = []
    for ln in formatted.splitlines():
        if ln.startswith("== Physical Plan =="):
            continue
        if not ln.strip():
            break
        lines.append(ln.rstrip())
    if len(lines) > _TREE_CAP:
        lines = lines[:_TREE_CAP] + [
            f"... ({len(lines) - _TREE_CAP} more lines: cached-subtree "
            "initial/final AQE plans, truncated)"
        ]
    return "\n".join(lines)


def scan_details(formatted: str) -> list[str]:
    out = []
    for m in re.finditer(r"(PushedFilters: \[.*?\]|ReadSchema: struct<.*?>)", formatted):
        s = m.group(1)
        if len(s) > 160:
            s = s[:157] + "..."
        out.append(s)
    # dedupe preserving order
    seen: set[str] = set()
    return [s for s in out if not (s in seen or seen.add(s))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "PLANS.md"))
    args = ap.parse_args()

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = mod.queries()

    chunks = [
        "# PLANS — physical-plan evidence (generated by tools/dump_plans.py)",
        "",
        f"Source scale factor: `{args.sf_dir}` (plans are shape-identical at any "
        "SF; AQE may re-plan exchanges at runtime — trees below are the static "
        "plans).",
        "Indicators per query: exchanges (shuffles) in the static plan, Python "
        "stages (should be zero outside declared Arrow surfaces), and the "
        "parquet scans' pushdown/pruning lines.",
        "",
    ]
    for name in PLAN_QUERIES:
        if name not in qs:
            continue
        df = qs[name](spark, args.sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        tree = tree_of(formatted)
        n_exch = len(re.findall(r"\bExchange\b", tree))
        n_py = len(re.findall(r"MapInPandas|FlatMapGroupsInPandas|BatchEvalPython|ArrowEvalPython", tree))
        n_wsc = len(re.findall(r"WholeStageCodegen", tree))
        chunks += [
            f"## {name}",
            "",
            f"- exchanges: {n_exch} · python stages: {n_py} · codegen spans: {n_wsc}",
        ]
        for s in scan_details(formatted):
            chunks.append(f"- `{s}`")
        chunks += ["", "```", tree, "```", ""]

    with open(args.out, "w") as fh:
        fh.write("\n".join(chunks))
    print(f"wrote {args.out} ({len(chunks)} blocks)")
    spark.stop()


if __name__ == "__main__":
    main()
