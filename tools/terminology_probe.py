"""Terminology scaling probe: the qf-family's queries run on inline
fixture CodeSystems, so table replication (tools/scale_probe.py) tells
us nothing about them — their scaling axis is CONCEPT COUNT and
hierarchy depth. This probe generates synthetic CodeSystems of N
concepts (a branching tree with per-concept properties), times the
closure build (path-doubling fixpoint) and representative ECL
evaluations (prefix, refinement, attribute group), and prints one JSON
line per N so bands land in SCALE_NOTES.md.

Usage: python tools/terminology_probe.py [N ...]   (default 1000 10000 50000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BRANCH = 10  # tree fanout -> depth = ceil(log10 N): 50k concepts = depth 5


def synth_codesystem(n: int) -> dict:
    """Branching-tree CodeSystem of ~n concepts; every leaf carries a
    'site' property pointing at an internal node (so refinements and
    groups have non-trivial matches) and a 'parity' literal property."""
    counter = [0]

    def node(depth_budget: int, remaining: list[int]) -> dict:
        i = counter[0]
        counter[0] += 1
        remaining[0] -= 1
        c: dict = {"code": f"c{i}", "display": f"Concept {i}"}
        if i > 0:  # root carries no properties
            c["property"] = [
                {"code": "site", "valueCode": f"c{max(0, i // BRANCH)}"},
                {"code": "parity", "valueCode": "even" if i % 2 == 0 else "odd"},
            ]
        if depth_budget > 0 and remaining[0] > 0:
            kids = []
            for _ in range(BRANCH):
                if remaining[0] <= 0:
                    break
                kids.append(node(depth_budget - 1, remaining))
            if kids:
                c["concept"] = kids
        return c

    remaining = [n]
    depth = 1
    while BRANCH**depth < n:
        depth += 1
    root = node(depth, remaining)
    return {
        "resourceType": "CodeSystem", "id": "cs-probe", "status": "active",
        "url": "http://example.org/cs/probe", "content": "complete",
        "concept": [root],
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1000, 10000, 50000]
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        ecl_expand,
    )
    from parquet_on_fhir_spark.session import get_session
    from parquet_on_fhir_spark.suite.fhir_queries import _encode_doc

    spark = get_session()

    def cached_mb() -> float:
        """Total cached-block storage (MB) — the closure's RETAINED
        memory cost, read from the block manager (r13 verdict task 6:
        record closure-build memory, not just wall time)."""
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return sum(i.memSize() for i in infos) / (1 << 20)

    def jvm_used_mb() -> float:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        spark._jvm.System.gc()
        return (rt.totalMemory() - rt.freeMemory()) / (1 << 20)

    for n in ns:
        doc = synth_codesystem(n)
        t0 = time.time()
        cs = _encode_doc(spark, doc, "CodeSystem")
        cs = cs.cache()
        cs.count()
        t_encode = time.time() - t0
        cache_before = cached_mb()
        jvm_before = jvm_used_mb()
        t0 = time.time()
        clo = concept_closure(concept_edges(cs)).cache()
        closure_rows = clo.count()
        t_closure = time.time() - t0
        closure_cache_mb = cached_mb() - cache_before
        jvm_delta_mb = jvm_used_mb() - jvm_before
        sysu = "http://example.org/cs/probe"
        timings = {}
        for tag, ecl in [
            ("prefix", "<< c0"),
            ("minus", "(<< c0) MINUS (<< c1)"),
            ("refine", "<< c0 : site = << c1"),
            # one assertion must satisfy both members (self-grouped
            # semantics): wildcard + literal on the parity assertion
            ("group", "<< c0 : { * = even , parity = even }"),
            # r11: prefixed wildcard (closure projection, anchor-free)
            ("wild", "( < * ) MINUS ( << c1 )"),
            # r11: within-group cardinality ([0..0] complements against
            # the whole assertion table — the heaviest group form)
            ("grpcard", "<< c0 : { [0..0] site = c1 }"),
        ]:
            t0 = time.time()
            cnt = ecl_expand(ecl, cs, clo, sysu).count()
            timings[tag] = round(time.time() - t0, 2)
            timings[f"{tag}_rows"] = cnt
        # incremental maintenance (closure_delta, r10): register the
        # DEEPEST 10% of edges as "new" against a closure of the rest —
        # the nightly-increment shape; time the delta vs the full build
        from parquet_on_fhir_spark.fhir.terminology import (
            closure_delta,
            concept_edges,
        )

        edges = concept_edges(cs).cache()
        n_edges = edges.count()
        cutoff = int(n_edges * 0.9)
        from pyspark.sql import functions as FF
        from pyspark.sql import Window as W

        ranked = edges.withColumn(
            "__r",
            FF.row_number().over(W.orderBy("parent", "child")),
        )
        old_e = ranked.filter(FF.col("__r") <= cutoff).drop("__r")
        new_e = ranked.filter(FF.col("__r") > cutoff).drop("__r")
        t0 = time.time()
        old_clo = concept_closure(old_e).cache()
        old_clo.count()
        t_oldclo = time.time() - t0
        t0 = time.time()
        delta_rows = closure_delta(old_clo, new_e).count()
        t_delta = time.time() - t0
        # r11 depth-N ValueSet reference chains: vs_0 selects `is-a c1`,
        # vs_i references vs_{i-1} — the expansion resolves in i strata
        # (one table-level expansion + lineage cut per level), so chain
        # time should grow LINEARLY in depth, not quadratically
        from parquet_on_fhir_spark.fhir.terminology import expand_valueset

        chain_timings = {}
        for depth in (2, 8):
            docs = [{
                "resourceType": "ValueSet", "id": "vs0",
                "status": "active",
                "url": "http://example.org/ValueSet/chain0",
                "compose": {"include": [
                    {"system": sysu,
                     "filter": [{"property": "concept", "op": "is-a",
                                 "value": "c1"}]}]},
            }]
            for i in range(1, depth + 1):
                docs.append({
                    "resourceType": "ValueSet", "id": f"vs{i}",
                    "status": "active",
                    "url": f"http://example.org/ValueSet/chain{i}",
                    "compose": {"include": [
                        {"valueSet":
                         [f"http://example.org/ValueSet/chain{i-1}"]}]},
                })
            vs = _encode_doc(spark, docs, "ValueSet")
            t0 = time.time()
            rows = (
                expand_valueset(vs, cs, closure=clo)
                .filter(
                    FF.col("url")
                    == f"http://example.org/ValueSet/chain{depth}"
                )
                .count()
            )
            chain_timings[f"chain_d{depth}_s"] = round(time.time() - t0, 2)
            chain_timings[f"chain_d{depth}_rows"] = rows
        print(json.dumps({
            "n_concepts": n,
            "closure_rows": closure_rows,
            "encode_s": round(t_encode, 2),
            "closure_s": round(t_closure, 2),
            "closure_cache_mb": round(closure_cache_mb, 1),
            "jvm_delta_mb": round(jvm_delta_mb, 1),
            **timings,
            "delta_new_edges": n_edges - cutoff,
            "delta_rows": delta_rows,
            "delta_s": round(t_delta, 2),
            "old_closure_s": round(t_oldclo, 2),
            **chain_timings,
        }))
        edges.unpersist()
        old_clo.unpersist()
        cs.unpersist()
        clo.unpersist()


if __name__ == "__main__":
    main()
