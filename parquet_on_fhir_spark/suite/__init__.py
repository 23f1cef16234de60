"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q

# The correctness driver hash-checks the FIRST 50 registered queries
# only, so registration order is coverage policy.  Round-12 window
# (the r11 verdict's prescription, task 1 — rotate the stale-evidence
# families so that after r12 no green is older than r5; computed
# oldest-first across CORRECTNESS_r01-r11):
#   1. flagship;
#   2. the 13 genuinely stale rows: the r2-vintage twins
#      q13b/q37b and the r4-vintage window/streaming/LLM cores
#      (q30-q33, q52/q53, q66/q68/q69/q71/q74b) — 7+ rounds of
#      refactors since their last driver hash;
#   3. the full r5-vintage cohort (22 queries — approx-distinct, map
#      funcs, streaming windows/watermark, dedup/minhash/embedding
#      twins, tf-idf, multimodal, curation, TPC-H q4/q18/q22, upsert,
#      clustered write, the Observation ViewDefinition);
#   4. remaining slots oldest-first from the r6 cohort; r12 debuts
#      displace the NEWEST of these fills as they land (the
#      debuts-land-with-a-driver-row rule). Exception (the r10/r11
#      twin-cede pattern, inverted): q57c_stream_dedup_within_watermark
#      debuts WITHOUT a slot because both its twins (q57, q57b — the
#      same oracle) are already in-window this round; likewise the
#      wave-2 late debuts q275 (rows-only, carried by its property
#      tests), q276 (its multimodal codec family q73/q270 is
#      in-window), qf48 (its terminology family holds five slots:
#      qf43/qf44/qf45/qf46/qf47), q279 (its text-audit family q71
#      is in-window) and q281 (its time-series family q269/q274 is
#      in-window) cede their slots to the r5 freshness cohort; the
#      wave-3 late debuts qf49 (its terminology family holds five
#      slots: qf43-qf47), q289 (its codec family holds q73 + the new
#      q284/q285), q290 (its curation-audit family holds q74b + the
#      new q282) and q291 (its time-series family holds the q269/q274
#      lifetime rows — the q281 precedent) cede likewise; the wave-4
#      method-comparison quartet q295-q298 cedes too (the experiment/
#      agreement stats family holds three in-window slots: q283 fisher,
#      q286 mcnemar, q294 msprt).
# All 50 are oracle-backed this round. Full-suite verification is
# always available via `python tools/selfcheck.py`.
WINDOW = [
    "q00_flagship_shipping_priority",
    # -- r2-vintage (last driver hash: CORRECTNESS_r02)
    "q13b_join_full_outer",
    "q37b_union_distinct",
    # -- r4-vintage window functions
    "q30_window_ranking",
    "q31_window_lag_lead",
    "q32_window_frames",
    "q33_window_topk_per_group",
    # -- r4-vintage streaming core
    "q52_stream_source_sink_available_now",
    "q53_stream_window_tumbling",
    # -- r4-vintage LLM core
    "q66_dedup_exact",
    "q68_cosine_similarity",
    "q69_similarity_topk_bruteforce",
    "q71_text_stats",
    "q74b_quality_scoring",
    # -- r12 debuts (land with a driver row; each displaces the newest
    #    r6 fill below — wave 2 added q266-q272 + qf46/qf47,
    #    ceding the whole r6 fill tier q108-q126, plus four r5 rows
    #    with covered families: q51b (q51 carries r10), q74d (q74/q74b
    #    stay in-window), q90 (its q21 base anchors bench every round),
    #    q92 (the semi/exists family's q14 is in-window; q93's
    #    anti/not-exists form stays), and — see below — none of the
    #    streaming tier)
    "qf43_ecl_comparisons",
    "qf44_expand_paging",
    "q263_jpeg_progressive_decode",
    "qf45_ecl_refinement_sets",
    "q264_bloom_semi_join",
    "q265_stratified_weighted_sample",
    "q266_degree_assortativity",
    "q267_histogram_sketch_quantiles",
    "q268_kendall_tau",
    "q269_cross_correlation",
    "q270_gif_real_decode",
    "qf46_bundle_ingest",
    "qf47_expand_designations",
    "q271_mutual_best_match",
    "q272_label_propagation",
    "q273_containment_pairs",
    "q274_mann_kendall",
    "q280_geo_radius_join",
    # -- r12 wave-3 debuts (debuts-land-with-a-driver-row rule; each
    #    displaces one r5-cohort row whose family keeps other slots:
    #    q74 ceded (q74b holds the quality family), q59 ceded (the
    #    streaming family holds q52-q57), q72 ceded (q71 holds the
    #    text family), q89 ceded (the agg-join shape is anchored by
    #    the q00 flagship + q93's TPC-H slot). The ceded rows stay
    #    r5-vintage, which still meets the r11 verdict's "no green
    #    older than r5" bar.
    "q282_url_dedup_audit",
    "q283_fisher_exact",
    "q284_webp_lossless_real_decode",
    "q285_audio_spectral_features",
    # -- wave-3 continuation debuts (same rule; cedes: q23 — its exact
    #    twin q22 is r11-green and the HLL family holds q197's lifetime
    #    row; q86c — the curation family holds q74b + the new q282;
    #    q93 — the anti-join shape is held by q14 in-window)
    "q286_mcnemar_exact",
    "q287_bpe_encode",
    "q288_dynamic_partition_pruning",
    # -- wave-4 debuts (same rule; cedes: q57 — the exact-dedup family
    #    holds q66 in-window and q57's streaming twins q57b/q57c carry
    #    multibatch tests; q91 — the embedding family holds q68 + q69
    #    in-window)
    "q293_fs_record_linkage",
    "q294_msprt_monitor",
    # -- r5-vintage cohort (refreshed through r12 minus the nine
    #    family-covered cedes above: oldest lifetime row stays r5)
    "q48_map_funcs",
    "q54_window_sliding",
    "q55_window_session",
    "q56_stream_watermark",
    "q67c_dedup_minhash_md5",
    "q73_multimodal_features",
    "q87_merge_upsert",
    "q94_clustered_write",
    "qf10_view_definition_observation",
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
