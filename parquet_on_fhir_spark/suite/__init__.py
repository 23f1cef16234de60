"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q

# The correctness driver hash-checks the FIRST 50 registered queries
# only, so registration order is coverage policy.  Round-6 window =
# flagship + ALL 47 oracle queries built this round (zero lifetime
# driver rows — q121-q164, qf12-qf17; first-ever rows beat second rows)
# + 2 re-confirmation picks guarding this round's riskiest rewrites:
# q108 (graph.py decimal-overflow witness fix + CC callers) and q120
# (dedup.py incremental cross-set banding rewrite).  Queries built
# after the window filled (q165-q167, q168-q170, qf18) and the
# remaining single-row queries (TPC-H tails q100-q106, r4 scalar/
# streaming singles, q95-q99, qf09-qf11 etc.) stay selfcheck-covered
# and rotate next round.  Rows-only queries are registered LAST so the window
# contains only hash-checkable entries; each names the test that
# carries its correctness.  Full-suite verification is always
# available via `python tools/selfcheck.py`.
WINDOW = [
    "q00_flagship_shipping_priority",
    # -- zero-lifetime-row: round-6 queries (first-ever driver rows)
    "q121_ngram_lm_score",
    "q122_dedup_lines",
    "q123_frequent_ngrams",
    "q124_fuzzy_join",
    "q125_resample_gapfill",
    "q126_tpch_q2_min_cost_supplier",
    "q127_tpch_q9_profit",
    "q128_tpch_q11_important_parts",
    "q129_tpch_q16_supplier_cnt",
    "q130_tpch_q20_excess_shipments",
    "q132_resample_interpolate",
    "q133_funnel",
    "q134_cohort_retention",
    "q135_expectations",
    "q136_anomaly_detection",
    "q137_sessionize",
    "q138_pagerank",
    "q139_weighted_sample",
    "q140_ewma",
    "q141_snapshot_diff",
    "q142_skew_report",
    "q143_contamination_report",
    "q144_classifier_score",
    "q145_temperature_mixture",
    "q146_embedding_covariance",
    "q147_bpe_pairs",
    "q149_tpch_q5_local_supplier",
    "qf12_valueset_expand",
    "qf13_conceptmap_translate",
    "qf14_valueset_isa_filter",
    # -- zero-lifetime-row: built mid-round after the first rotation
    "q150_triangle_count",
    "q151_scd2_dimension",
    "q152_ohlc_bars",
    "q153_time_weighted_avg",
    "q154_rolling_time_range",
    "q155_regression_aggs",
    "q156_winsorize",
    "q157_chi2_crosstab",
    "q158_market_basket",
    "qf15_patient_everything",
    "qf16_has_reverse_chain",
    "qf17_observation_lastn",
    "q160_numeric_histogram",
    "q161_distribution_drift",
    "q162_robust_outliers",
    "q163_multimodal_real_decode",
    "q164_stream_cdc_apply",
    # -- single-lifetime-row re-confirms for the riskiest rewrites this
    # round (graph decimal witness + CC callers, incremental-dedup
    # cross-set banding, views ofType, store chaining+compartment); the
    # other touched-path singles stay selfcheck-covered and rotate next
    # round
    "q108_dedup_clusters_md5",
    "q120_incremental_dedup",
]

# Rows-only by design (no portable oracle); each is carried by the named
# test instead of a driver hash row.  Kept out of the 50-query window.
ROWS_ONLY_COVERAGE = {
    "q67_dedup_minhash_lsh": "tests/test_llm_ops.py (vs exact n-gram Jaccard)",
    "q67b_dedup_simhash": "tests/test_llm_ops.py (vs exact Hamming)",
    "q70_similarity_ann_lsh": "tests/test_llm_ops.py (recall vs brute force)",
    "q70b_similarity_ivf": "tests/test_llm_ops.py (recall vs brute force)",
    "q74c_doc_fingerprints": "tests/test_text_multimodal.py (winnowing props)",
    "q86_corpus_curation_pipeline": "tests/test_llm_ops.py (pipeline stages)",
    "q91b_embedding_near_dup_lsh": "tests/test_llm_ops.py (recall vs exact q91)",
    "q119_embedding_quantize": "tests/test_llm_ops.py (int8 roundtrip invariants)",
    "q131_semantic_dedup": "tests/test_llm_ops.py (planted duplicate pairs; KMeans not oracle-portable)",
    "q148_pca_project": "tests/test_llm_ops.py (vs numpy eigh; eigendecomposition not oracle-portable)",
    "q159_kcore": "tests/test_graph.py (vs brute-force peeling; iterative deletion not oracle-portable)",
}


def all_queries() -> list[Q]:
    # Imports deferred so a syntax error in one module doesn't take down
    # the whole registry during development.
    from parquet_on_fhir_spark.suite import (
        fhir_queries,
        llm,
        relational,
        scalars,
        streaming_queries,
        udfs,
        windows,
    )

    declared: list[Q] = []
    for mod in (
        relational,
        windows,
        scalars,
        fhir_queries,
        llm,
        udfs,
        streaming_queries,
    ):
        declared.extend(mod.QUERIES)
    by_name = {q.name: q for q in declared}
    assert len(by_name) == len(declared), "duplicate query names"
    missing = [n for n in WINDOW if n not in by_name]
    assert not missing, f"WINDOW names not declared: {missing}"
    assert len(WINDOW) == len(set(WINDOW)) == 50, "window must be exactly 50 names"
    bad = [n for n in WINDOW if by_name[n].oracle is None]
    assert not bad, f"rows-only queries may not sit in the checked window: {bad}"
    unmapped = [
        q.name
        for q in declared
        if q.oracle is None and q.name not in ROWS_ONLY_COVERAGE
    ]
    assert not unmapped, f"rows-only queries missing a coverage note: {unmapped}"

    windowed = [by_name[n] for n in WINDOW]
    rest_oracle = [
        q for q in declared if q.name not in set(WINDOW) and q.oracle is not None
    ]
    rest_rows_only = [q for q in declared if q.oracle is None]
    return windowed + rest_oracle + rest_rows_only
