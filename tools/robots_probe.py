"""robots_filter host-count scaling probe (r13 verdict task 1 band):
the operator's scaling axis is the HOST SET (a crawl's robots frame
grows with the crawl — 10⁷–10⁸ hosts in production), which table
replication doesn't exercise. This probe synthesizes N hosts × ~4
rules each plus URLS_PER_HOST urls per host (generated distributively
with spark.range — nothing host-count-sized ever touches the driver),
runs ``robots_filter`` end-to-end in auto mode, and prints one JSON
line per N so the band lands in SCALE_NOTES.md.

Usage: python tools/robots_probe.py [N ...]   (default 1000 10000 100000 1000000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators.robots import robots_filter
from parquet_on_fhir_spark.session import get_session

URLS_PER_HOST = 4

# four rule classes cycled by host id: plain prefix, wildcard+anchor,
# allow-overrides-disallow, exact-UA group preferred over *
_TEMPLATES = [
    "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n",
    "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/\n",
    "User-agent: probebot\nDisallow: /pub/\n\nUser-agent: *\nDisallow: /\n",
    "User-agent: *\nDisallow:\n",
]


def main() -> int:
    ns = [int(x) for x in sys.argv[1:]] or [1000, 10000, 100000, 1000000]
    spark = get_session("robots_probe")
    tmpl = F.array(*[F.lit(t) for t in _TEMPLATES])
    paths = F.array(
        F.lit("/private/doc.html"),
        F.lit("/private/ok/doc.html"),
        F.lit("/files/doc.pdf"),
        F.lit("/pub/doc.txt"),
    )
    for n in ns:
        robots = spark.range(n).select(
            F.concat(F.lit("h"), F.col("id"), F.lit(".ex")).alias("host"),
            F.element_at(tmpl, (F.col("id") % 4 + 1).cast("int")).alias(
                "robots_txt"
            ),
        )
        urls = spark.range(n * URLS_PER_HOST).select(
            F.col("id"),
            F.concat(
                F.lit("h"), (F.col("id") % n), F.lit(".ex")
            ).alias("host"),
        ).withColumn(
            "url",
            F.concat(
                F.lit("https://"),
                F.col("host"),
                F.element_at(paths, ((F.col("id") / n) % 4 + 1).cast("int")),
            ),
        )
        t0 = time.time()
        out = robots_filter(urls, robots, user_agent="probebot")
        n_urls, n_denied = out.select(
            F.count("*"), F.count(F.when(~F.col("allowed"), 1))
        ).first()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "hosts": n,
                    "urls": n_urls,
                    "denied": n_denied,
                    "sec": round(dt, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
