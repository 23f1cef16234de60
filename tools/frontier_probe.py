"""politeness_schedule hot-host skew probe (r14 verdict task 6 band):
the cap path's scaling hazard is ONE host owning a frontier-sized URL
set — the single-stage form sorts that host in one task before the
cap prunes. This probe builds a frontier with one hot host at N urls
plus 999 background hosts at 1k urls each (generated distributively
with spark.range — nothing frontier-sized touches the driver), runs
the capped schedule single-stage (cap_salts=1) and two-stage
(cap_salts=16), verifies the outputs are IDENTICAL (count + slot/eta
checksum), and prints one JSON line per N for SCALE_NOTES.md.

Usage: python tools/frontier_probe.py [N ...]   (default 100000 1000000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators.frontier import politeness_schedule
from parquet_on_fhir_spark.session import get_session

BG_HOSTS = 999
BG_URLS = 1000
CAP = 100


def main() -> int:
    ns = [int(x) for x in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_session("frontier_probe")
    for n in ns:
        total = n + BG_HOSTS * BG_URLS
        frontier = spark.range(total).select(
            F.when(F.col("id") < n, F.lit("hot.ex"))
            .otherwise(
                F.concat(
                    F.lit("h"), (F.col("id") - n) % BG_HOSTS, F.lit(".ex")
                )
            )
            .alias("host"),
            F.concat(F.lit("https://x/p"), F.col("id")).alias("url"),
            (F.col("id") % 50).cast("int").alias("priority"),
        )
        frontier = frontier.localCheckpoint(eager=True)  # freeze input
        results = {}
        for salts in (1, 16):
            t0 = time.time()
            out = politeness_schedule(
                frontier, per_host_cap=CAP, cap_salts=salts
            )
            agg = out.agg(
                F.count("*").alias("rows"),
                F.sum(F.crc32(F.concat_ws("|", "host", "url", "slot",
                                          "eta_ms"))).alias("chk"),
            ).collect()[0]
            results[salts] = (
                round(time.time() - t0, 2), agg["rows"], agg["chk"],
            )
        assert results[1][1:] == results[16][1:], results
        # the structural claim: the largest SINGLE-TASK sort each form
        # performs (what actually kills a hot host at cluster scale —
        # wall-clock here is shuffle-volume-bound and reads as parity)
        salt = F.crc32(F.col("url").cast("string")) % 16
        stage1_max = (
            frontier.groupBy("host", salt.alias("s"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        single_max = (
            frontier.groupBy("host").count().agg(F.max("count")).collect()[0][0]
        )
        print(json.dumps({
            "hot_urls": n,
            "total_urls": total,
            "cap": CAP,
            "single_stage_sec": results[1][0],
            "two_stage_sec": results[16][0],
            "max_task_sort_single": single_max,
            "max_task_sort_two_stage": max(stage1_max, CAP * 16),
            "rows": results[1][1],
            "identical": True,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
