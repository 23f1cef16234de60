"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q

# The correctness driver hash-checks the FIRST 50 registered queries
# only, so registration order is coverage policy.  Round-8 window
# (drain the verification debt — the r7 verdict's explicit order):
#   1. flagship;
#   2. the 4 r7-red queries, rewritten this round for driver-hash
#      robustness (per-term 12-dp quantization / integer-exact AUC) —
#      the only hard-signal failures in the repo;
#   3. ALL 20 never-driver-checked oracle queries from the r7 wave
#      (q194-q215; q204 de-vacuated this round with planted
#      duplicates, q198b oracle boundary floored);
#   4. the 7 rows-only queries with zero lifetime driver rows
#      (q119/q131/q148/q159/q195/q203/q210): the driver records
#      spark_rows even without an oracle (r3 precedent), documenting
#      that each at least executes under the driver's environment;
#   5. second rows for the TPC-H tails dropped from the r7 window
#      (q103-q106, q109, q112-q114, q117);
#   6. remaining slots: the oldest singles (r3-vintage q44-q50 funcs,
#      q62/q64/q65 UDF surface, q71b).
# NO net-new queries this round until the backlog drains (r7 verdict
# task 2).  Remaining singles stay selfcheck-covered and rotate.
# Full-suite verification is always available via
# `python tools/selfcheck.py`.
WINDOW = [
    "q00_flagship_shipping_priority",
    # -- the four r7 driver-hash reds, fixed this round
    "q168_kaplan_meier",
    "q169_binary_auc",
    "q173_zipf_slope",
    "q192_unigram_entropy",
    # -- first-ever rows: the r7 never-driver-checked wave
    "q194_set_similarity_join",
    "q196_frequency_sketch",
    "q197_hll_distinct_rollup",
    "q198_attribution_last_touch",
    "q198b_attribution_linear",
    "q199_dp_noisy_counts",
    "q200_k_anonymity",
    "q201_transition_matrix",
    "q202_clustering_coefficient",
    "q204_cross_source_dup_audit",
    "q205_token_length_histogram",
    "q206_conversion_window_funnel",
    "q207_rfm_segmentation",
    "q208_centroid_similarity",
    "q209_quantile_normalize",
    "q211_nelson_aalen",
    "q212_naive_forecast_eval",
    "q213_bh_fdr",
    "q214_mutual_information",
    "q215_stream_curation",
    # -- rows-only with zero lifetime driver rows: executed under the
    # driver for a spark_rows record (hash correctness carried by the
    # tests named in ROWS_ONLY_COVERAGE)
    "q119_embedding_quantize",
    "q131_semantic_dedup",
    "q148_pca_project",
    "q159_kcore",
    "q195_holt_smoothing",
    "q203_cusum_changepoints",
    "q210_ols_fit",
    # -- second driver rows: TPC-H tails dropped from the r7 window
    "q103_tpch_q13_custdist",
    "q104_tpch_q15_top_supplier",
    "q105_tpch_q17_small_qty",
    "q106_tpch_q21_waiting_supplier",
    "q109_doc_chunking",
    "q112_source_cap",
    "q113_duplicate_spans",
    "q114_bm25",
    "q117_rollup_chain",
    # -- second driver rows: the oldest (r3) singles
    "q44_math_funcs",
    "q46_array_funcs",
    "q47_higher_order_funcs",
    "q49_json_funcs",
    "q50_struct_ops",
    "q62_pandas_udf",
    "q64_pandas_udaf",
    "q65_python_udtf",
    "q71b_language_id",
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
