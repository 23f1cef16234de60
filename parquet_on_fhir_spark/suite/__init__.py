"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q

# The correctness driver hash-checks the FIRST 50 registered queries
# only, so registration order is coverage policy.  Round-6 window =
# flagship + ALL 42 oracle queries holding exactly one lifetime green
# driver row (computed from CORRECTNESS_r01..r05: the 26 r5
# first-timers plus the r4 singles q36/q44/q46/q47/q49/q50, the
# streaming "b" variants, q62/q64/q65, q71b/q73b) + 7 re-confirmation
# anchors chosen because round 6 touches their code paths (qf04 UCUM
# extension, qf08 registry breadth) or because they anchor the bench
# (q21/q66/q69/q18/q43).  After this window every oracle query holds
# >=2 lifetime rows, making the suite regression-proof against testdata
# regeneration.  Rows-only queries are registered LAST so the window
# contains only hash-checkable entries; each names the test that
# carries its correctness.  Full-suite verification is always
# available via `python tools/selfcheck.py`.
WINDOW = [
    "q00_flagship_shipping_priority",
    # -- single-lifetime-row: r5 first-timers (second row => 2x coverage)
    "q100_tpch_q7_volume_shipping",
    "q101_tpch_q8_market_share",
    "q102_tpch_q12_late_lines",
    "q103_tpch_q13_custdist",
    "q104_tpch_q15_top_supplier",
    "q105_tpch_q17_small_qty",
    "q106_tpch_q21_waiting_supplier",
    "q108_dedup_clusters_md5",
    "q109_doc_chunking",
    "q111_importance_weights",
    "q112_source_cap",
    "q113_duplicate_spans",
    "q114_bm25",
    "q115_table_profile",
    "q116_corpus_split",
    "q117_rollup_chain",
    "q118_zorder_write",
    "q120_incremental_dedup",
    "q95_decontaminate",
    "q96_sample_mixture",
    "q97_repetition_stats",
    "q98_redact_pii",
    "q99_pack_sequences",
    "qf09_view_definition_patient",
    "qf10_view_definition_observation",
    "qf11_chained_search",
    # -- single-lifetime-row: r4 singles that yielded their r5 slot
    "q36_sort_within_partitions",
    "q44_math_funcs",
    "q46_array_funcs",
    "q47_higher_order_funcs",
    "q49_json_funcs",
    "q50_struct_ops",
    "q54b_stream_window_sliding",
    "q55b_stream_window_session",
    "q56b_stream_watermark_multibatch",
    "q57b_stream_dedup",
    "q59b_stream_stream_join",
    "q62_pandas_udf",
    "q64_pandas_udaf",
    "q65_python_udtf",
    "q71b_language_id",
    "q73b_multimodal_frame_plan",
    # -- re-confirmation anchors (code paths touched in round 6 + bench anchors)
    "qf04_fhir_quantity_canonical",
    "qf08_fhir_definition_schema",
    "q43_fhir_partial_date_bounds",
    "q21_agg_tpch_q1",
    "q66_dedup_exact",
    "q69_similarity_topk_bruteforce",
    "q18_join_asof",
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
