"""Query suite: the executable inventory of SURVEY.md §2.

Each module contributes a list of :class:`Q` specs. ``all_queries()``
aggregates them; ``__spark_entry__.py`` exposes them to the driver.
"""

from __future__ import annotations

from parquet_on_fhir_spark.suite.common import Q


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

    # Registration order matters: the correctness driver checks the first 50
    # registered queries only.  Rounds 1-2 ran `relational` first, so those 50
    # have two rounds of green driver rows on record; round 3 rotates the
    # never-driver-verified modules (windows/scalars/fhir/llm/udfs/streaming)
    # into the window, keeping the flagship q00 at position 0 for the smoke
    # check.  Full-suite verification is always available via
    # `python tools/selfcheck.py <sf_dir>` regardless of order.
    out: list[Q] = []
    flagship = [q for q in relational.QUERIES if q.name.startswith("q00")]
    rest_relational = [q for q in relational.QUERIES if not q.name.startswith("q00")]
    out.extend(flagship)
    for mod in (windows, scalars, fhir_queries, llm, udfs, streaming_queries):
        out.extend(mod.QUERIES)
    out.extend(rest_relational)
    names = [q.name for q in out]
    assert len(names) == len(set(names)), "duplicate query names"
    return out
