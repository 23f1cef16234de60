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

    out: list[Q] = []
    for mod in (relational, windows, scalars, llm, streaming_queries, udfs, fhir_queries):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    assert len(names) == len(set(names)), "duplicate query names"
    return out
