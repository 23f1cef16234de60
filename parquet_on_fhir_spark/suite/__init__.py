"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q

# The correctness driver hash-checks the FIRST 50 registered queries
# only, so registration order is coverage policy.  Round-11 window
# (the r10 verdict's prescription, tasks 1/3):
#   1. flagship;
#   2. q210b/q231b — the two r10 hash-reds, repaired (moment columns
#      now project as strings on both sides; the r10 verdict's task 1
#      requires both back in-window until green);
#   3. the round-11 debuts (qf38 depth-N ValueSet references + mixed
#      includes; qf39 ECL prefixed wildcards + in-group card/reverse;
#      qf40 sf-scaled $validate-code — the data-scaling qf bench line;
#      q255 baseline-JPEG real decode; q256-q260 analytics wave:
#      Brier decomposition, rank-biased overlap, weighted WOR
#      sampling, BH-FDR, HITS) — every new query lands WITH a driver
#      row in its debut window;
#   4. remaining 38 slots strictly oldest-first by lifetime driver
#      row (computed across CORRECTNESS_r01-r10): the r2-vintage
#      relational cohort (q02-q85 — sources/sinks, join family, agg
#      family, set ops, TPC-H line) and the r3-vintage q73b; the last
#      refresh slots ceded to the late-round debuts qf41 (nested
#      ECL member-of), qf42 (expression-valued attributes), q261
#      (Heaps-law fit) and q262 (Adamic-Adar) per the
#      debuts-land-with-a-driver-row rule (the displaced q67/q70
#      rows-only refreshes keep their r3 lifetime rows + the
#      recall/property tests in ROWS_ONLY_COVERAGE).
# All 50 are oracle-backed this round. Full-suite verification is
# always available via `python tools/selfcheck.py`.
WINDOW = [
    "q00_flagship_shipping_priority",
    # -- r10 verdict task 1: the repaired DECIMAL-output reds stay
    #    in-window until the driver confirms hash_match
    "q210b_ols_moments",
    "q231b_logistic_moments",
    # -- round-11 debuts:
    "qf38_valueset_nested_refs",
    "qf39_ecl_wildcard_group_flags",
    "qf40_validate_code_facts",
    "q255_jpeg_real_decode",
    "q256_brier_decomposition",
    "q257_rank_biased_overlap",
    "q258_weighted_sample",
    "q259_bh_fdr",
    "q260_hits",
    # -- r10 verdict task 3: stalest-first refresh. The r2-vintage
    #    relational cohort (last driver rows in CORRECTNESS_r02):
    "q02_schema_merged_scan",
    "q04_csv_source",
    "q05_parquet_sink_roundtrip",
    "q07_nested_projection",
    "q09_in_between_like",
    "q10_conditional_expr",
    "q11_distinct",
    "q13_join_left_outer",
    #    twin-cede (r10 pattern): q13b/q37b are the harder-sibling
    #    twins of in-window q13/q37 — their slots go to the last two
    #    r11 debuts q261/q262 so every debut lands with a driver row
    "q261_heaps_law",
    "q14_join_semi_anti",
    "q16_join_theta_range",
    "q17_join_cross",
    "q19_join_interval_overlap",
    "q20_join_self",
    "q22_agg_distinct",
    "q24_agg_rollup_grouping",
    "q26_agg_median",
    "q27_agg_minby_maxby_collect",
    "q28_agg_global",
    "q29_pivot",
    "q35_limit_topk",
    "q36_sort_within_partitions",
    "q37_union_all",
    "q262_adamic_adar",
    "q38_union_by_name",
    "q39_intersect",
    "q76_agg_cube",
    "q78_join_salted_skew",
    "q79_array_sequence_collect",
    "q80_unpivot",
    "q81_subqueries",
    "q82_tpch_q6",
    "q83_tpch_q14",
    "q84_tpch_q10",
    "q85_tpch_q19",
    #    r3-vintage multimodal frame plan, then the late-round debuts:
    "q73b_multimodal_frame_plan",
    "qf41_ecl_member_of_nested",
    "qf42_ecl_attribute_expressions",
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
    "q203_cusum_changepoints": "tests/test_timeseries.py (vs reference recurrence; reset accumulator not oracle-portable)",
    "q210_ols_fit": "tests/test_analytics.py (vs numpy lstsq; multi-feature matrix solve not oracle-portable)",
    "q231_logistic_fit": "tests/test_analytics.py (vs independent numpy IRLS; iterative MLE not oracle-portable)",
    "q248_cox_ph": "tests/test_analytics.py (vs independent brute-force numpy Breslow Cox; iterative partial MLE not oracle-portable)",
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
