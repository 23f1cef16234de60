"""Whole-suite physical-plan police: builds every batch query at
sf0.001 and flags plan shapes that should never appear —
CartesianProductExec (a join that lost its equi-condition and its
broadcastability) anywhere, and unpartitioned Window operators whose
input is not a pre-aggregated bounded frame are caught separately by
tests/test_scale_plans.py.

Heavier than a unit test (~7 min: fixpoint queries execute during
construction), so it runs per-round alongside selfcheck rather than
inside pytest. Exit 1 on any hit.

Usage: python tools/plan_police.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_on_fhir_spark.session import get_session  # noqa: E402
from parquet_on_fhir_spark.suite import all_queries  # noqa: E402


def walk(plan):
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        yield name, node
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("plan-police")
    spark.sparkContext.setLogLevel("ERROR")
    hits: list[str] = []
    errs: list[str] = []
    for q in all_queries():
        if "stream" in q.name:  # streaming queries run real streams
            continue
        try:
            df = q.fn(spark, sf_dir)
            for name, _node in walk(df._jdf.queryExecution().executedPlan()):
                if name == "CartesianProductExec":
                    hits.append(q.name)
                    break
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            errs.append(f"{q.name}: {type(e).__name__}: {e}")
    for e in errs:
        print("ERR ", e[:200])
    print("cartesian hits:", sorted(set(hits)) or "none")
    return 1 if hits or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
