"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q

# The correctness driver hash-checks the FIRST 50 registered queries
# only, so registration order is coverage policy.  Round-5 window =
# flagship + every oracle-backed query that has never had a driver row
# (the new TPC-H tail q100-q106, round-4's ViewDefinition/search
# qf09-qf11 and curation q95-q99) + re-confirmations of the 34 queries
# holding exactly one prior green row.  Rows-only queries are
# registered LAST so the window contains only hash-checkable entries;
# each names the test that carries its correctness.  Full-suite
# verification is always available via `python tools/selfcheck.py`.
WINDOW = [
    "q00_flagship_shipping_priority",
    # -- never driver-verified: round-5 TPC-H tail (Q7/Q8/Q12/Q13/Q15/Q17/Q21)
    "q100_tpch_q7_volume_shipping",
    "q101_tpch_q8_market_share",
    "q102_tpch_q12_late_lines",
    "q103_tpch_q13_custdist",
    "q104_tpch_q15_top_supplier",
    "q105_tpch_q17_small_qty",
    "q106_tpch_q21_waiting_supplier",
    # -- never driver-verified: round-4 ViewDefinition / search / curation ops
    "qf09_view_definition_patient",
    "qf10_view_definition_observation",
    "qf11_chained_search",
    "q95_decontaminate",
    "q96_sample_mixture",
    "q97_repetition_stats",
    "q98_redact_pii",
    "q99_pack_sequences",
    # -- never driver-verified: built this round (r5)
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
    # -- re-confirmations: queries with exactly one prior driver row
    # (q44/q46/q47/q49/q50 scalar re-confirms and the stream-"b" variants
    # q54b/q55b/q56b/q57b/q59b yielded their slots to the new r5 queries;
    # they rotate back in round 6)
    "q23_agg_approx_distinct",
    "q48_map_funcs",
    "q51_hash_funcs",
    "q51b_hash_ids_local",
    "q54_window_sliding",
    "q55_window_session",
    "q56_stream_watermark",
    "q57_dedup_keep_first",
    "q58_stream_stateful",
    "q59_stream_static_join",
    "q67c_dedup_minhash_md5",
    "q72_term_idf",
    "q73_multimodal_features",
    "q74_quality_filter",
    "q74d_doc_fingerprints_md5",
    "q86c_curation_pipeline_md5",
    "q87_merge_upsert",
    "q89_tpch_q18",
    "q90_scale10_agg",
    "q91_embedding_near_dup",
    "q92_tpch_q4_exists",
    "q93_tpch_q22_not_exists",
    "q94_clustered_write",
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
