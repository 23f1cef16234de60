"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q

# The correctness driver hash-checks the FIRST 50 registered queries
# only, so registration order is coverage policy.
#
# Round-13 window (the r12 verdict's prescription, task 1 — retire BOTH
# remaining evidence tails):
#   1. flagship;
#   2. the 13 r12 debuts the driver never sampled (judge-selfchecked
#      green, but driver evidence is the standard): q57c, qf48, qf49,
#      q276, q279, q281, q289, q290, q291, q295-q298;
#   3. the 13 r5-vintage lifetime rows (the oldest green anywhere):
#      q23, q51b, q57, q59, q72, q74, q74d, q86c, q89-q93;
#   4. remaining 23 slots filled oldest-first from the r6 cohort
#      (q108-q142 in registration order); r13 debuts displace the
#      NEWEST of these fills as they land (debuts-land-with-a-driver-
#      row rule). After r13 the oldest green anywhere is r6.
WINDOW = [
    "q00_flagship_shipping_priority",
    # -- tier 2: r12 debuts, never driver-sampled
    "q57c_stream_dedup_within_watermark",
    "qf48_version_pinning",
    "qf49_expand_active_only",
    "q276_gif_animation_frames",
    "q279_unicode_nfc_audit",
    "q281_rolling_origin_splits",
    "q289_tiff_real_decode",
    "q290_pii_luhn_audit",
    "q291_peak_concurrency",
    "q295_cohens_d",
    "q296_bland_altman",
    "q297_icc_oneway",
    "q298_deming_regression",
    # -- tier 3: the full r5-vintage cohort (oldest lifetime evidence)
    "q23_agg_approx_distinct",
    "q51b_hash_ids_local",
    "q57_dedup_keep_first",
    "q59_stream_static_join",
    "q72_term_idf",
    "q74_quality_filter",
    "q74d_doc_fingerprints_md5",
    "q86c_curation_pipeline_md5",
    "q89_tpch_q18",
    "q90_scale10_agg",
    "q91_embedding_near_dup",
    "q92_tpch_q4_exists",
    "q93_tpch_q22_not_exists",
    # -- r13 debuts (land with a driver row; each displaced the newest
    #    r6 fill below — q299 displaced q142, qf50 displaced q141,
    #    q301 displaced q140, q302 displaced q139, q303 displaced q138,
    #    q304 displaced q137, q305 displaced q136, q306 displaced q135, q307 displaced q134, q308 displaced q133)
    "q299_webp_vp8_real_decode",
    "qf50_ecl_reverse_numeric",
    "q301_webp_animation_frames",
    "q302_avif_real_decode",
    "q303_exif_audit",
    "q304_compressed_payload_audit",
    "q305_html_main_text",
    "q306_warc_records",
    "q307_robots_filter",
    "q308_mime_sniff_audit",
    # -- tier 4: r6-cohort fills, oldest-first
    "q108_dedup_clusters_md5",
    "q120_incremental_dedup",
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
    "q195_holt_smoothing": "tests/test_timeseries.py (vs reference recurrence; coupled level/trend not oracle-portable)",
    "q292_holt_winters_seasonal": "tests/test_timeseries.py (vs reference recurrence; coupled level/trend/season not oracle-portable)",
    "q300_holt_winters_mul_damped": "tests/test_timeseries.py (mul + damped variants vs independent recurrences; phi=1 bit-equality pin)",
    "q203_cusum_changepoints": "tests/test_timeseries.py (vs reference recurrence; reset accumulator not oracle-portable)",
    "q210_ols_fit": "tests/test_analytics.py (vs numpy lstsq; multi-feature matrix solve not oracle-portable)",
    "q231_logistic_fit": "tests/test_analytics.py (vs independent numpy IRLS; iterative MLE not oracle-portable)",
    "q248_cox_ph": "tests/test_analytics.py (vs independent brute-force numpy Breslow Cox; iterative partial MLE not oracle-portable)",
    "q275_isotonic_calibration": "tests/test_r12_wave2.py (PAV hand example, monotonicity, mean preservation, tie pre-averaging; the pooling stack is not oracle-portable)",
    "q277_bpe_train_merges": "tests/test_r12_wave2.py (vs independent pure-python BPE incl. the Sennrich walkthrough; iterative argmax not oracle-portable)",
    "q278_pq_topk": "tests/test_r12_wave2.py (cluster recall + lossless-codebook exactness vs brute force; seeded Lloyd not oracle-portable)",
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
    # Rows-only queries are allowed in the window ONLY when named in
    # ROWS_ONLY_COVERAGE: the driver records spark_rows for no-oracle
    # entries (r3 precedent), which is this round's deliberate way to
    # give zero-lifetime-row queries an executed-under-driver record.
    bad = [
        n
        for n in WINDOW
        if by_name[n].oracle is None and n not in ROWS_ONLY_COVERAGE
    ]
    assert not bad, f"unmapped rows-only queries in the checked window: {bad}"
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
    rest_rows_only = [
        q for q in declared if q.oracle is None and q.name not in set(WINDOW)
    ]
    return windowed + rest_oracle + rest_rows_only
