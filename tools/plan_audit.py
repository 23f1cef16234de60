"""Dump formatted physical plans for the headline queries → PLANS.md.

The audit trail for the optimizer discipline claims (pushdown, pruning,
broadcast, TakeOrderedAndProject, exchange counts). Regenerate with:

    python tools/plan_audit.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_on_fhir_spark.operators.bucketing import plan_of
from parquet_on_fhir_spark.session import get_session
from parquet_on_fhir_spark.suite import all_queries

AUDITED = [
    "q00_flagship_shipping_priority",
    "q01_parquet_scan_pushdown",
    "q15_join_broadcast",
    "q18_join_asof",
    "q21_agg_tpch_q1",
    "q33_window_topk_per_group",
    "q66_dedup_exact",
    "q67c_dedup_minhash_md5",
    "q69_similarity_topk_bruteforce",
    "q75_sql_tpch_q5",
    "qf09_view_definition_patient",
    "q95_decontaminate",
    "q99_pack_sequences",
    "q109_doc_chunking",
    "q111_importance_weights",
    "q113_duplicate_spans",
    "q114_bm25",
    "q121_ngram_lm_score",
    "q122_dedup_lines",
    "q123_frequent_ngrams",
    "q124_fuzzy_join",
    "q125_resample_gapfill",
    "q133_funnel",
    "q136_anomaly_detection",
    "q138_pagerank",
    "q144_classifier_score",
    "q146_embedding_covariance",
    "q147_bpe_pairs",
    "q149_tpch_q5_local_supplier",
    "q150_triangle_count",
    "q151_scd2_dimension",
    "q152_ohlc_bars",
    "q153_time_weighted_avg",
    "q154_rolling_time_range",
    "q155_regression_aggs",
    "q156_winsorize",
    "q157_chi2_crosstab",
    "q158_market_basket",
    "q160_numeric_histogram",
    "q161_distribution_drift",
    "q162_robust_outliers",
    "q165_target_encoding",
    "q166_quantile_bin",
    "q167_correlation_matrix",
    "q168_kaplan_meier",
    "q169_binary_auc",
    "q172_concentration_report",
    "q173_zipf_slope",
    "q175_hierarchy_rollup",
    "q176_autocorrelation",
    "q177_longest_streak",
    "q178_soft_dedup",
    "q179_pmi_collocations",
    # round-7 rewrites + additions
    "q180_weighted_percentile",
    "q182_curriculum_interleave",
    "q184_rolling_active_users",
    "q185_png_real_decode",
    "qf21_valueset_predicate_filters",
    "q186_seasonal_decompose",
    "q188_cuped_adjust",
    "q191_stratified_folds",
    "q194_set_similarity_join",
    "q197_hll_distinct_rollup",
    "q198_attribution_last_touch",
    "q201_transition_matrix",
    "q202_clustering_coefficient",
    # round-9 additions: distinct-value-frame analytics + causal pair
    "q216_log_rank",
    "q217_average_precision",
    "q218_ipw_ate",
    "q220_rmst",
    # round-9 second/third waves: rank statistics, IR metrics, text audits
    "q221_mann_whitney",
    "q222_ndcg_at_k",
    "q224_spearman",
    "q225_repetition_audit",
    "q227_kruskal_wallis",
    "q228_source_overlap",
    "q229_brown_forsythe",
    "q230_vocab_richness",
    "q232_psi_drift",
    "q234_proportions_ztest",
    "q235_bootstrap_ci",
    # round-11 wave: forecast quality, ranking agreement, curation
    # sampling, FDR, link analysis + the sf-scaled terminology line
    "q256_brier_decomposition",
    "q257_rank_biased_overlap",
    "q258_weighted_sample",
    "q259_bh_fdr",
    "q260_hits",
    "qf40_validate_code_facts",
    # round-12 wave: runtime-filter semi join + stratified sampling
    "q264_bloom_semi_join",
    "q265_stratified_weighted_sample",
    # round-12 wave 3: the two new bench lines + the DPP lever
    "q282_url_dedup_audit",
    "q287_bpe_encode",
    "q288_dynamic_partition_pruning",
    # round-13: the codec/audit debuts (broadcast fixture joins — the
    # fact side must never shuffle) + the new bench line
    "q299_webp_vp8_real_decode",
    "q301_webp_animation_frames",
    "q302_avif_real_decode",
    "q303_exif_audit",
    # round-14: the crawl family (compliance, ingestion, frontier,
    # cleaning, binary ANN) — r14 verdict hygiene item 1
    "q307_robots_filter",
    "q309_charset_decode",
    "q310_crawl_pipeline",
    "q311_frontier_schedule",
    "q312_crawl_budget",
    "q313_anchor_topk",
    "q314_html_metadata",
    "q315_sitemap_discovery",
    "q316_c4_filter",
    "q317_binary_hamming_topk",
    "q319_mojibake_repair",
    "q320_sitemap_parse",
    "q326_crawl_delay_schedule",
    # round-15: link extraction, the composed crawl loop, WARC revisit
    "q327_link_extraction",
    "q328_crawl_loop",
    "q329_warc_revisit",
    "q330_crawl_rank",
]


def summarize(plan: str) -> list[str]:
    out = []
    for marker in (
        "PushedFilters",
        "dynamicpruning",
        "ReadSchema",
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "TakeOrderedAndProject",
        "HashAggregate",
        "Exchange",
        "WholeStageCodegen",
        "Window",
    ):
        hits = [ln.strip()[:150] for ln in plan.splitlines() if marker in ln]
        if marker in ("Exchange", "WholeStageCodegen", "HashAggregate", "Window"):
            if hits:
                out.append(f"{marker}: ×{len(hits)}")
        else:
            out.extend(hits[:4])
    return out


def main() -> None:
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    specs = {q.name: q for q in all_queries()}
    lines = [
        "# PLANS — physical-plan audit of headline queries (sf0.1)",
        "",
        "Generated by `python tools/plan_audit.py`. Summary markers per query;",
        "the claims these support are in SCALE_NOTES.md.",
        "",
    ]
    for name in AUDITED:
        plan = plan_of(specs[name].fn(spark, sf_dir))
        lines.append(f"## {name}\n")
        lines.append("```")
        lines.extend(summarize(plan))
        lines.append("```")
        lines.append("")
    Path("PLANS.md").write_text("\n".join(lines))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
