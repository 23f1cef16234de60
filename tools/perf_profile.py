"""Round-15 optimization profiler (guide §1): for each headline bench
query, capture the formatted physical plan and time the computation in
isolation with the noop sink (all columns computed, no sink cost, no
count()-style column pruning).

Usage:
    python tools/perf_profile.py [sf_dir] [--plans-dir plans/r15] \
        [--reps N] [--tag before] [name-substring ...]

Writes ``<plans-dir>/<query>_<tag>.txt`` (the explain output) and
prints one JSON line per query to stdout:
    {"name": ..., "noop_med": s, "noop_min": s, "count_med": s,
     "exchanges": n, "py_evals": n}
plus a final summary line. Jobs are labelled so the UI stays readable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_on_fhir_spark.session import get_session  # noqa: E402
from parquet_on_fhir_spark.suite import all_queries  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].startswith("-") and "/" in args[0]:
        sf_dir = args.pop(0)
    plans_dir = Path("plans/r15")
    reps = 3
    tag = "before"
    subs: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans-dir":
            plans_dir = Path(args[i + 1])
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        else:
            subs.append(args[i])
            i += 1

    import bench

    names = list(bench.HEADLINE)
    if subs:
        names = [n for n in names if any(s in n for s in subs)]
    plans_dir.mkdir(parents=True, exist_ok=True)

    spark = get_session("perf-profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {q.name: q for q in all_queries()}

    totals = {"noop_med": 0.0, "count_med": 0.0}
    for name in names:
        fn = specs[name].fn
        sc = spark.sparkContext
        # warm (and once more for streaming startup, as bench.py does)
        sc.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).count()
        if "stream" in name:
            fn(spark, sf_dir).count()
        df = fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (plans_dir / f"{name}_{tag}.txt").write_text(plan)
        exchanges = plan.count("Exchange")
        py_evals = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
            + plan.count("FlatMapGroupsInPandas")
        )
        noop_runs, count_runs = [], []
        for r in range(reps):
            sc.setJobDescription(f"noop:{name}#{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_runs.append(time.perf_counter() - t0)
            sc.setJobDescription(f"count:{name}#{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            count_runs.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        rec = {
            "name": name,
            "noop_med": round(statistics.median(noop_runs), 3),
            "noop_min": round(min(noop_runs), 3),
            "count_med": round(statistics.median(count_runs), 3),
            "count_min": round(min(count_runs), 3),
            "exchanges": exchanges,
            "py_evals": py_evals,
        }
        totals["noop_med"] += rec["noop_med"]
        totals["count_med"] += rec["count_med"]
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "name": "_TOTAL",
                "noop_med": round(totals["noop_med"], 3),
                "count_med": round(totals["count_med"], 3),
                "n_queries": len(names),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
