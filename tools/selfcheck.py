"""Local mimic of the driver's correctness gate: run every declared
query on Spark AND its DuckDB oracle, compare row-count + schema-width +
order-insensitive value-hash. Usage:

    python tools/selfcheck.py [sf_dir] [name-substring ...]
    python tools/selfcheck.py [sf_dir] --changed-since <git-ref> [--sample N]

``--changed-since`` (r9 verdict task 7 — keeps the inner loop fast as
the suite grows) selects only queries plausibly affected by the diff
against <git-ref>: a query is selected when its own suite module
changed, when its function source references a changed module path
(function-local imports), or when its suite MODULE imports a changed
operator module (module-top imports — conservative over-selection by
design). A deterministic random re-confirmation sample of N unaffected
queries (default 10, seeded by the ref string) rides along to catch
drift the file heuristic misses. The full sweep stays the per-round
event.
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_on_fhir_spark.api import TABLES  # noqa: E402
from parquet_on_fhir_spark.session import get_session  # noqa: E402
from parquet_on_fhir_spark.suite import all_queries  # noqa: E402
from tools.oracle_lint import (  # noqa: E402
    lint_oracle_types,
    lint_type_divergence,
)


def norm_cell(v):
    # numpy scalars (from the driver-faithful .df() oracle fetch)
    # unwrap to their Python equivalents so np.bool_/np.int64 normalize
    # identically to Spark's bool/int.
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            # NaN ≡ NULL: DuckDB's .df() fetch materializes SQL NULL in
            # float64 columns as NaN, while Spark's collect() gives None.
            # Lifetime driver-green queries (q18, q38, q186, q218, q234,
            # q239, q249) have NULLs in double columns, which proves the
            # driver normalizes the two identically — mimic that.
            return "NULL"
        # integral float ≡ int: DuckDB's .df() fetch degrades NULL-able
        # integer columns to float64 (1211 -> 1211.0) while our Spark
        # collect() keeps exact ints.  Lifetime driver-green q18 proves
        # the driver compares these equal (it degrades BOTH sides
        # through pandas, symmetrically); the asymmetric shapes this
        # could mask (HUGEINT, int-vs-float divergence) are statically
        # banned by oracle_lint, so the merge cannot hide a driver red.
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        # driver-style normalization: repr of a rounded float
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def select_changed_since(specs, ref: str, sample_n: int) -> list:
    """Queries plausibly affected by the diff vs ``ref`` plus a
    deterministic random re-confirmation sample (module docstring)."""
    import importlib
    import inspect
    import random
    import subprocess

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        ["git", "diff", "--name-only", ref],
        capture_output=True,
        text=True,
        cwd=repo,
        check=True,
    ).stdout.split()
    changed_mods = {
        Path(p).with_suffix("").as_posix().replace("/", ".")
        for p in out
        if p.endswith(".py") and p.startswith("parquet_on_fhir_spark/")
    }
    if not changed_mods:
        print(f"# --changed-since {ref}: no package files changed")
    module_src: dict[str, str] = {}

    def mod_source(modname: str) -> str:
        if modname not in module_src:
            try:
                module_src[modname] = inspect.getsource(
                    importlib.import_module(modname)
                )
            except Exception:
                module_src[modname] = ""
        return module_src[modname]

    selected = []
    for q in specs:
        mod = q.fn.__module__
        try:
            fn_src = inspect.getsource(q.fn)
        except Exception:
            fn_src = ""
        hit = mod in changed_mods
        for m in changed_mods:
            if m in fn_src or m in mod_source(mod):
                hit = True
        if hit:
            selected.append(q)
    rng = random.Random(ref)
    rest = [q for q in specs if q not in selected]
    sample = rng.sample(rest, min(sample_n, len(rest)))
    print(
        f"# --changed-since {ref}: {len(selected)} affected + "
        f"{len(sample)} random re-confirmation of {len(specs)} declared"
    )
    return selected + sample


def main() -> int:
    args = sys.argv[1:]
    changed_ref = None
    sample_n = 10
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i : i + 2]
    if "--changed-since" in args:
        i = args.index("--changed-since")
        changed_ref = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filters = args[1:]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_session("selfcheck")

    specs = all_queries()
    if changed_ref is not None:
        specs = select_changed_since(specs, changed_ref, sample_n)
    if filters:
        specs = [q for q in specs if any(f in q.name for f in filters)]

    n_pass = n_fail = n_rows_only = 0
    for q in specs:
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            if q.oracle is None:
                n_rows_only += 1
                print(f"ROWSONLY {q.name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
                continue
            # Portability lint FIRST (bind-only, no execution): HUGEINT
            # etc. pass fetchall() locally but red the driver (r8 proof).
            problems = lint_oracle_types(con, q.oracle)
            for w in lint_type_divergence(con, q.oracle, sdf.dtypes):
                print(f"WARN     {q.name}: {w}")
            # Driver-faithful fetch (r10 verdict task 2): materialize the
            # oracle result through pandas/Arrow (.df()), NOT fetchall().
            # fetchall() returns exact decimal.Decimal/int objects and
            # hid both driver-red classes (r8 HUGEINT, r10 DECIMAL
            # output columns) — .df() degrades them to float64 exactly
            # as the driver's fetch path does, so local green == driver
            # green.
            odf = con.execute(q.oracle).df()
            ocols = list(odf.columns)
            orows = [
                tuple(None if v is pd.NaT else v for v in r)
                for r in odf.itertuples(index=False, name=None)
            ]
            if len(srows) != len(orows):
                problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
            if sorted(scols) != sorted(ocols):
                problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
            if not problems:
                sh = table_hash(scols, [tuple(r) for r in srows])
                oh = table_hash(ocols, orows)
                if sh != oh:
                    problems.append("value-hash mismatch")
                    # show a sample diff
                    sset = {
                        "\x01".join(
                            norm_cell(r[i])
                            for i in sorted(range(len(scols)), key=lambda i: scols[i])
                        )
                        for r in [tuple(x) for x in srows]
                    }
                    oset = {
                        "\x01".join(
                            norm_cell(r[i])
                            for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                        )
                        for r in orows
                    }
                    only_s = list(sset - oset)[:2]
                    only_o = list(oset - sset)[:2]
                    for x in only_s:
                        problems.append(f"  spark-only: {x[:200]}")
                    for x in only_o:
                        problems.append(f"  duck-only:  {x[:200]}")
            if problems:
                n_fail += 1
                print(f"FAIL     {q.name}: " + "; ".join(problems))
            else:
                n_pass += 1
                print(f"PASS     {q.name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        except Exception:
            n_fail += 1
            print(f"ERROR    {q.name}:")
            traceback.print_exc(limit=4)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
