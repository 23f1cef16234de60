"""CLI for the engine — what a user of the reference format runs daily:

    python -m parquet_on_fhir_spark encode   IN.ndjson OUT_DIR [--resource-type Patient] [--no-annotations]
    python -m parquet_on_fhir_spark decode   IN_PARQUET OUT_DIR
    python -m parquet_on_fhir_spark validate IN_PARQUET [--resource-type Patient]
    python -m parquet_on_fhir_spark merge    OUT_DIR IN1 IN2 [...]
    python -m parquet_on_fhir_spark schema   IN.ndjson
    python -m parquet_on_fhir_spark search   IN_PARQUET "birthDate=ge1960&gender=male&_count=20"
    python -m parquet_on_fhir_spark view     IN_PARQUET view_definition.json [--output OUT_PARQUET]
    python -m parquet_on_fhir_spark ingest   SRC_DIR OUT_TABLE CHECKPOINT --resource-type Patient
    python -m parquet_on_fhir_spark expand    VALUESET_PARQUET [--codesystems CS_PARQUET]
    python -m parquet_on_fhir_spark translate FACTS_PARQUET CONCEPTMAP_PARQUET --system-col system --code-col code
    python -m parquet_on_fhir_spark validate-code FACTS_PARQUET VALUESET_PARQUET VS_URL [--codesystems CS_PARQUET]
    python -m parquet_on_fhir_spark subsumes PAIRS_PARQUET CS_PARQUET SYSTEM_URL
    python -m parquet_on_fhir_spark diff      OLD_PARQUET NEW_PARQUET --id-cols id
    python -m parquet_on_fhir_spark profile   IN_PARQUET [--columns a b] [--approx]
    python -m parquet_on_fhir_spark dedup     IN_PARQUET OUT_PARQUET [--near] [--text-col text] [--id-col doc_id]

Exit code 0 on success; ``validate`` exits 1 when invariants fail.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="parquet_on_fhir_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode", help="FHIR NDJSON -> Parquet-on-FHIR table")
    enc.add_argument("input")
    enc.add_argument("output")
    enc.add_argument("--resource-type")
    enc.add_argument("--no-annotations", action="store_true")
    enc.add_argument("--no-validate", action="store_true")
    enc.add_argument("--partition-by", nargs="*")
    enc.add_argument("--max-extension-depth", type=int)

    dec = sub.add_parser("decode", help="Parquet-on-FHIR table -> FHIR NDJSON")
    dec.add_argument("input")
    dec.add_argument("output")

    val = sub.add_parser("validate", help="check spec invariants")
    val.add_argument("input")
    val.add_argument("--resource-type")

    mrg = sub.add_parser("merge", help="schema-merge tables of one resource type")
    mrg.add_argument("output")
    mrg.add_argument("inputs", nargs="+")

    sch = sub.add_parser("schema", help="print the derived schema for an NDJSON file")
    sch.add_argument("input")
    sch.add_argument("--max-extension-depth", type=int)

    srch = sub.add_parser(
        "search", help="FHIR search parameters over a table (token/date/quantity/string)"
    )
    srch.add_argument("input")
    srch.add_argument("params")
    srch.add_argument("--output", help="write matches as parquet instead of printing")
    srch.add_argument("--show", type=int, default=20)

    vw = sub.add_parser(
        "view", help="run a SQL-on-FHIR v2 ViewDefinition (JSON file) over a table"
    )
    vw.add_argument("input")
    vw.add_argument("view_definition")
    vw.add_argument("--output", help="write the view as parquet instead of printing")
    vw.add_argument("--show", type=int, default=20)

    ing = sub.add_parser(
        "ingest",
        help="streaming NDJSON ingest -> Parquet-on-FHIR (exactly-once, "
        "AvailableNow: processes what's there and stops; re-run to pick up "
        "new files)",
    )
    ing.add_argument("src_dir")
    ing.add_argument("output")
    ing.add_argument("checkpoint")
    ing.add_argument("--resource-type")
    ing.add_argument("--no-annotations", action="store_true")
    ing.add_argument("--quarantine", action="store_true")

    exp = sub.add_parser(
        "expand", help="expand ValueSet.compose to (url, system, code, display) rows"
    )
    exp.add_argument("valuesets")
    exp.add_argument("--codesystems", help="CodeSystem table for whole-system includes")
    exp.add_argument("--output", help="write the expansion as parquet instead of printing")
    exp.add_argument("--show", type=int, default=50)
    exp.add_argument("--url", help="$expand url parameter: slice one ValueSet")
    exp.add_argument("--count", type=int, help="$expand paging: page size (0 = total probe)")
    exp.add_argument("--offset", type=int, default=0, help="$expand paging: start rank")
    exp.add_argument("--filter", dest="text_filter", help="$expand text filter (code or display substring)")
    exp.add_argument("--display-language", help="$expand displayLanguage: designation language for displays")
    exp.add_argument("--include-designations", action="store_true", help="$expand includeDesignations: one row per designation")
    exp.add_argument("--active-only", action="store_true", help="$expand activeOnly: drop concepts asserted inactive/retired/deprecated")
    exp.add_argument("--versioned", action="store_true", help="resolve url|version canonical pins and include.version (expand_versioned)")

    trn = sub.add_parser(
        "translate", help="translate (system, code) pairs through a ConceptMap table"
    )
    trn.add_argument("facts")
    trn.add_argument("conceptmaps")
    trn.add_argument("--system-col", default="system")
    trn.add_argument("--code-col", default="code")
    trn.add_argument("--map-url")
    trn.add_argument("--output")
    trn.add_argument("--show", type=int, default=20)
    trn.add_argument(
        "--reverse", action="store_true",
        help="$translate reverse mode: match element.target.code, return "
        "the element side (equivalence as stated; unmapped rules are "
        "forward-only)",
    )

    vcd = sub.add_parser(
        "validate-code",
        help="batch $validate-code: flag (system, code) rows against one ValueSet",
    )
    vcd.add_argument("facts")
    vcd.add_argument("valuesets")
    vcd.add_argument("vs_url")
    vcd.add_argument(
        "--codesystems",
        help="CodeSystem table (needed for filter/whole-system includes; "
        "enables hierarchical/ECL filters via an in-memory closure)",
    )
    vcd.add_argument("--system-col", default="system")
    vcd.add_argument("--code-col", default="code")
    vcd.add_argument("--output")
    vcd.add_argument("--show", type=int, default=20)

    sbs = sub.add_parser(
        "subsumes",
        help="batch CodeSystem $subsumes: classify (code_a, code_b) "
        "pair rows against one system's hierarchy",
    )
    sbs.add_argument("pairs")
    sbs.add_argument("codesystems")
    sbs.add_argument("system")
    sbs.add_argument("--code-a-col", default="code_a")
    sbs.add_argument("--code-b-col", default="code_b")
    sbs.add_argument("--output")
    sbs.add_argument("--show", type=int, default=20)

    lkp = sub.add_parser(
        "lookup",
        help="batch CodeSystem $lookup: display + property assertions "
        "for (system, code) rows",
    )
    lkp.add_argument("facts")
    lkp.add_argument("codesystems")
    lkp.add_argument("--system-col", default="system")
    lkp.add_argument("--code-col", default="code")
    lkp.add_argument("--output")
    lkp.add_argument("--show", type=int, default=20)

    cld = sub.add_parser(
        "closure-delta",
        help="incremental $closure: subsumption pairs ADDED by a new "
        "CodeSystem version (edges(v2) minus edges(v1) bridged through "
        "closure(v1) — the old graph is never re-closed)",
    )
    cld.add_argument("codesystems_v1")
    cld.add_argument("codesystems_v2")
    cld.add_argument("--output")
    cld.add_argument("--show", type=int, default=20)

    unb = sub.add_parser(
        "unbundle",
        help="split Bundle NDJSON (one Bundle per line) into one "
        "Parquet-on-FHIR table per entry resourceType",
    )
    unb.add_argument("input")
    unb.add_argument("out_root")
    unb.add_argument("--no-annotations", action="store_true")
    unb.add_argument(
        "--fast",
        action="store_true",
        help="all-JVM from_json extraction (normalizes number tokens, "
        "e.g. 72.50 -> 72.5; default is the byte-exact span scanner)",
    )

    dif = sub.add_parser(
        "diff", help="row-level snapshot diff: added/removed/changed/unchanged by id"
    )
    dif.add_argument("old")
    dif.add_argument("new")
    dif.add_argument("--id-cols", nargs="+", required=True)
    dif.add_argument("--compare-cols", nargs="*")
    dif.add_argument("--output")
    dif.add_argument("--summary", action="store_true",
                     help="print per-change counts instead of rows")

    prof = sub.add_parser(
        "profile", help="one-pass per-column data-quality profile of any parquet"
    )
    prof.add_argument("input")
    prof.add_argument("--columns", nargs="*")
    prof.add_argument("--approx", action="store_true",
                      help="HLL distinct counts (the 100 TB tier)")

    ddp = sub.add_parser(
        "dedup", help="exact or MinHash-LSH near dedup of a text column"
    )
    ddp.add_argument("input")
    ddp.add_argument("output")
    ddp.add_argument("--text-col", default="text")
    ddp.add_argument("--id-col", default="doc_id")
    ddp.add_argument("--near", action="store_true",
                     help="MinHash-LSH + connected-components clusters "
                     "(default: exact sha2 dedup)")
    ddp.add_argument("--threshold", type=float, default=0.5,
                     help="estimated-Jaccard threshold for --near")

    args = ap.parse_args(argv)

    from parquet_on_fhir_spark.session import get_session

    spark = get_session("pofs-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "encode":
        from parquet_on_fhir_spark.fhir.encode import encode_ndjson, write_table
        from parquet_on_fhir_spark.fhir.schema import derive_schema

        schema = derive_schema(
            spark, args.input, args.max_extension_depth, resource_type=args.resource_type
        )
        df = encode_ndjson(
            spark,
            args.input,
            schema=schema,
            resource_type=args.resource_type,
            annotations=not args.no_annotations,
            validate=not args.no_validate,
        )
        write_table(df, args.output, partition_by=args.partition_by)
        print(f"encoded {df.count()} resources -> {args.output}")
        return 0

    if args.cmd == "decode":
        from parquet_on_fhir_spark.fhir.decode import write_ndjson

        df = spark.read.parquet(args.input)
        write_ndjson(df, args.output)
        print(f"decoded {df.count()} resources -> {args.output}")
        return 0

    if args.cmd == "validate":
        from parquet_on_fhir_spark.fhir.validate import validate

        report = validate(spark.read.parquet(args.input), args.resource_type)
        print(json.dumps(report, indent=2))
        return 1 if report["errors"] else 0

    if args.cmd == "merge":
        from parquet_on_fhir_spark.fhir.merge import merge_tables

        merged = merge_tables(spark, *args.inputs)
        merged.write.mode("overwrite").parquet(args.output)
        print(f"merged {len(args.inputs)} tables ({merged.count()} rows) -> {args.output}")
        return 0

    if args.cmd == "search":
        from parquet_on_fhir_spark.fhir.table import FhirTable

        hits = FhirTable.read(spark, args.input).search(args.params)
        if args.output:
            hits.df.write.mode("overwrite").parquet(args.output)
            print(f"{hits.count()} matches -> {args.output}")
        else:
            n = hits.count()
            hits.df.show(args.show, truncate=40)
            print(f"{n} matches")
        return 0

    if args.cmd == "view":
        from parquet_on_fhir_spark.fhir.views import run_view

        with open(args.view_definition) as f:
            vd = json.load(f)
        out = run_view(spark.read.parquet(args.input), vd)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} rows -> {args.output}")
        else:
            out.show(args.show, truncate=40)
            print(f"{out.count()} rows")
        return 0

    if args.cmd == "ingest":
        from parquet_on_fhir_spark.streaming.fhir_ingest import stream_encode_ndjson

        q = stream_encode_ndjson(
            spark,
            args.src_dir,
            args.output,
            args.checkpoint,
            resource_type=args.resource_type,
            annotations=not args.no_annotations,
            quarantine=args.quarantine,
        )
        q.awaitTermination()
        n = spark.read.parquet(args.output).count()
        print(f"table now holds {n} resources -> {args.output}")
        return 0

    if args.cmd == "expand":
        from parquet_on_fhir_spark.fhir.terminology import (
            expand_operation,
            expand_valueset,
            expand_versioned,
        )

        cs = spark.read.parquet(args.codesystems) if args.codesystems else None
        vs = spark.read.parquet(args.valuesets)
        wants_operation = (
            args.url is not None
            or args.count is not None
            or args.offset
            or args.text_filter is not None
            or args.display_language is not None
            or args.include_designations
            or args.active_only
        )
        if args.versioned:
            if wants_operation:
                raise SystemExit(
                    "--versioned composes with the plain expansion only; "
                    "page/filter the written table instead"
                )
            out = expand_versioned(vs, cs)
        elif wants_operation:
            out = expand_operation(
                vs,
                cs,
                url=args.url,
                count=args.count,
                offset=args.offset,
                text_filter=args.text_filter,
                display_language=args.display_language,
                include_designations=args.include_designations,
                active_only=args.active_only,
            )
        else:
            out = expand_valueset(vs, cs)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} codes -> {args.output}")
        else:
            out.show(args.show, truncate=60)
        return 0

    if args.cmd == "translate":
        from parquet_on_fhir_spark.fhir.terminology import translate_codes

        out = translate_codes(
            spark.read.parquet(args.facts),
            spark.read.parquet(args.conceptmaps),
            args.system_col,
            args.code_col,
            map_url=args.map_url,
            reverse=args.reverse,
        )
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} rows -> {args.output}")
        else:
            out.show(args.show, truncate=40)
        return 0

    if args.cmd == "validate-code":
        from parquet_on_fhir_spark.fhir.terminology import (
            concept_closure,
            concept_edges,
            validate_codes,
        )

        cs = spark.read.parquet(args.codesystems) if args.codesystems else None
        clo = concept_closure(concept_edges(cs)) if cs is not None else None
        out = validate_codes(
            spark.read.parquet(args.facts),
            spark.read.parquet(args.valuesets),
            args.system_col,
            args.code_col,
            args.vs_url,
            codesystems=cs,
            closure=clo,
        )
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} rows -> {args.output}")
        else:
            out.show(args.show, truncate=40)
        return 0

    if args.cmd == "subsumes":
        from parquet_on_fhir_spark.fhir.terminology import (
            concept_closure,
            concept_edges,
            subsumes,
        )

        cs = spark.read.parquet(args.codesystems)
        out = subsumes(
            spark.read.parquet(args.pairs),
            concept_closure(concept_edges(cs)),
            args.system,
            args.code_a_col,
            args.code_b_col,
        )
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} rows -> {args.output}")
        else:
            out.show(args.show, truncate=40)
        return 0

    if args.cmd == "lookup":
        from parquet_on_fhir_spark.fhir.terminology import lookup_codes

        out = lookup_codes(
            spark.read.parquet(args.facts),
            spark.read.parquet(args.codesystems),
            args.system_col,
            args.code_col,
        )
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} rows -> {args.output}")
        else:
            out.show(args.show, truncate=40)
        return 0

    if args.cmd == "closure-delta":
        from parquet_on_fhir_spark.fhir.terminology import (
            closure_delta,
            concept_closure,
            concept_edges,
        )

        e1 = concept_edges(spark.read.parquet(args.codesystems_v1))
        e2 = concept_edges(spark.read.parquet(args.codesystems_v2))
        old_clo = concept_closure(e1)
        new_edges = e2.join(e1, ["system", "parent", "child"], "left_anti")
        out = closure_delta(old_clo, new_edges)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} rows -> {args.output}")
        else:
            out.show(args.show, truncate=40)
        return 0

    if args.cmd == "unbundle":
        from parquet_on_fhir_spark.fhir.encode import unbundle_ndjson

        counts = unbundle_ndjson(
            spark,
            args.input,
            args.out_root,
            annotations=not args.no_annotations,
            lexical=not args.fast,
        )
        print(json.dumps(counts, indent=2))
        return 0

    if args.cmd == "diff":
        from parquet_on_fhir_spark.operators.layout import snapshot_diff

        out = snapshot_diff(
            spark.read.parquet(args.old),
            spark.read.parquet(args.new),
            args.id_cols,
            compare_cols=args.compare_cols or None,
        )
        if args.summary:
            out.groupBy("change").count().orderBy("change").show()
        elif args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"{out.count()} rows -> {args.output}")
        else:
            out.filter("change <> 'unchanged'").show(50, truncate=40)
        return 0

    if args.cmd == "profile":
        from parquet_on_fhir_spark.operators.text import profile_table

        out = profile_table(
            spark.read.parquet(args.input),
            columns=args.columns or None,
            exact_distinct=not args.approx,
        )
        out.orderBy("column").show(200, truncate=40)
        return 0

    if args.cmd == "dedup":
        df = spark.read.parquet(args.input)
        if args.near:
            from parquet_on_fhir_spark.operators.dedup import near_dup_clusters

            clustered = near_dup_clusters(
                df, args.text_col, id_col=args.id_col,
                jaccard_threshold=args.threshold,
            )
            keep = clustered.filter("is_survivor").select(args.id_col)
            out = df.join(keep, args.id_col, "left_semi")
        else:
            from parquet_on_fhir_spark.operators.dedup import exact_dedup

            out = exact_dedup(df, args.text_col, args.id_col)
        before = df.count()
        out.write.mode("overwrite").parquet(args.output)
        # count the WRITTEN files: counting `out` first would execute the
        # whole LSH/CC pipeline twice
        after = spark.read.parquet(args.output).count()
        print(f"kept {after}/{before} rows -> {args.output}")
        return 0

    if args.cmd == "schema":
        from parquet_on_fhir_spark.fhir.schema import derive_schema

        print(
            derive_schema(spark, args.input, args.max_extension_depth).treeString()
        )
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
