"""FHIR format-layer queries (SURVEY.md §2A F1-F14), exercised over the
reference's own example files (/root/reference/examples/*.parquet —
read-only golden inputs, 100 Synthea rows each).

qf01 carries a DuckDB oracle (DuckDB reads the same parquet path);
the others are rows-only — their exact semantics are covered by the
conformance tests in tests/test_fhir_format.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from parquet_on_fhir_spark.fhir.annotations import annotate
from parquet_on_fhir_spark.fhir.decode import to_fhir_json
from parquet_on_fhir_spark.fhir.encode import encode_ndjson
from parquet_on_fhir_spark.fhir.merge import merge_tables
from parquet_on_fhir_spark.fhir.validate import validate
from parquet_on_fhir_spark.session import utc
from parquet_on_fhir_spark.suite.common import local_df, Q, d4, ts_str

PATIENT = "/root/reference/examples/Patient.parquet"
OBSERVATION = "/root/reference/examples/Observation.parquet"
EOB = "/root/reference/examples/ExplanationOfBenefit.parquet"


# --- F-scan: nested projection over a real Parquet-on-FHIR table --------------
def qf01(spark, sf_dir):
    p = utc(spark).read.parquet(PATIENT)
    return p.select(
        "id", F.explode("name").alias("n"), "gender", "birthDate"
    ).select(
        "id",
        F.col("n.family").alias("family"),
        F.col("n.given")[0].alias("first_given"),
        "gender",
        "birthDate",
    )


QF01_ORACLE = f"""
WITH e AS (
  SELECT id, gender, birthDate, unnest(name) AS n
  FROM read_parquet('{PATIENT}')
)
SELECT id, n.family AS family, n.given[1] AS first_given, gender, birthDate FROM e
"""


# --- F3+F4: decode → re-encode round-trip ----------------------------------------
def qf02(spark, sf_dir):
    p = utc(spark).read.parquet(PATIENT)
    base = tempfile.mkdtemp(prefix="pofs_fhir_rt_")
    to_fhir_json(p).write.mode("overwrite").text(base)
    back = encode_ndjson(spark, base, resource_type="Patient")
    return back.select("id", "resourceType", "birthDate")


# --- F10: date-range annotations on real birthDates --------------------------------
def qf03(spark, sf_dir):
    p = utc(spark).read.parquet(PATIENT)
    ann = annotate(p.select("id", "birthDate"))
    return ann.select(
        "id",
        "birthDate",
        ts_str("__birthDate_start", "yyyy-MM-dd HH:mm:ss.SSS").alias("bd_start"),
        ts_str("__birthDate_end", "yyyy-MM-dd HH:mm:ss.SSS").alias("bd_end"),
    )


# --- F12: UCUM quantity canonicalization ---------------------------------------------
# Clinical-unit batch appended to the golden observations so the
# driver-checked query exercises the extended UCUM table (pressure,
# mass/molar concentration, counts, rates, dimensionless) — the golden
# file itself only populates kg and cm. Same literals feed the Spark
# union and the oracle's VALUES clause.
UCUM_EXTRA = [
    ("x-bp-sys", "120", "mm[Hg]"),
    ("x-bp-kpa", "2.133", "kPa"),
    ("x-glucose", "90", "mg/dL"),
    ("x-hgb", "14.2", "g/dL"),
    ("x-na", "140", "mmol/L"),
    ("x-crea", "88.4", "umol/L"),
    ("x-hr", "72", "/min"),
    ("x-wbc", "4.5", "10*3/uL"),
    ("x-spo2", "98", "%"),
    ("x-uo", "125", "mL/min"),
    ("x-alt", "40", "U/L"),
    ("x-kcal", "1850", "kcal"),
    ("x-temp-f", "98.6", "[degF]"),
    ("x-unknown", "12.3", "{score}"),  # unknown unit → identity passthrough
]
# exact factors restated digit-for-digit in the oracle CASE below
_UCUM_ORACLE_CASES = {
    "mm[Hg]": ("dv * 133.322387415", "Pa"),
    "kPa": ("dv * 1000.0", "Pa"),
    "mg/dL": ("dv * 0.01", "g/L"),
    "g/dL": ("dv * 10.0", "g/L"),
    "mmol/L": ("dv * 0.001", "mol/L"),
    "umol/L": ("dv * 0.000001", "mol/L"),
    "/min": ("dv / 60.0", "/s"),
    "10*3/uL": ("dv * 1000000000.0", "/L"),
    "%": ("dv * 0.01", "1"),
    "mL/min": ("dv * 0.000001 / 60.0", "m3/s"),
    "U/L": ("dv", "U/L"),
    "kcal": ("dv * 4184.0", "J"),
    "[degF]": ("(dv + 459.67) * 5.0 / 9.0", "K"),
    "kg": ("dv * 1000.0", "g"),
    "cm": ("dv * 0.01", "m"),
    # remaining codes the golden file populates (pg/fL round to 0.000000
    # at DECIMAL(38,6) — the canonical form's fixed scale, same both sides)
    "pg": ("dv * 1e-12", "g"),
    "fL": ("dv * 1e-18", "m3"),
    "10*6/uL": ("dv * 1000000000000.0", "/L"),
    "kg/m2": ("dv * 1000.0", "g/m2"),
}


def qf04(spark, sf_dir):
    o = utc(spark).read.parquet(OBSERVATION)
    golden = o.select(
        "id",
        F.col("valueQuantity.value").alias("value"),
        F.col("valueQuantity.code").alias("code"),
    ).filter(F.col("valueQuantity.value").isNotNull())
    extra = local_df(utc(spark), 
        UCUM_EXTRA, "id string, value string, code string"
    )
    un = golden.unionByName(extra).withColumn(
        "valueQuantity", F.struct(F.col("value"), F.col("code"))
    )
    ann = annotate(un.select("id", "valueQuantity"))
    return ann.select(
        "id",
        F.col("valueQuantity.value").alias("value"),
        F.col("valueQuantity.code").alias("code"),
        F.col("__valueQuantity_canonical.value").cast("string").alias("canon_value"),
        F.col("__valueQuantity_canonical.code").alias("canon_code"),
    )


# UCUM canonicalization restated for every code the inputs can carry;
# unlisted codes take the identity canonical form (spec-legal — the
# annotation is optional per element).
_UCUM_WHEN_V = "\n".join(
    f"        WHEN code = '{c}' THEN {expr}" for c, (expr, _t) in _UCUM_ORACLE_CASES.items()
)
_UCUM_WHEN_C = "\n".join(
    f"        WHEN code = '{c}' THEN '{t}'" for c, (_e, t) in _UCUM_ORACLE_CASES.items()
)
_UCUM_VALUES = ",\n".join(f"('{i}', '{v}', '{c}')" for i, v, c in UCUM_EXTRA)
QF04_ORACLE = f"""
WITH v AS (
  SELECT id, valueQuantity.value AS value, valueQuantity.code AS code,
         CAST(valueQuantity.value AS DOUBLE) AS dv
  FROM read_parquet('{OBSERVATION}')
  WHERE valueQuantity.value IS NOT NULL
  UNION ALL
  SELECT id, value, code, CAST(value AS DOUBLE) AS dv
  FROM (VALUES
{_UCUM_VALUES}
  ) AS x(id, value, code)
)
SELECT id, value, code,
  CAST(CAST(CASE
{_UCUM_WHEN_V}
        ELSE dv END AS DECIMAL(38,6)) AS VARCHAR) AS canon_value,
  CASE
{_UCUM_WHEN_C}
        ELSE code END AS canon_code
FROM v
"""

# --- F13: schema merge across sparse tables of one resource type -----------------------
def qf05(spark, sf_dir):
    p = utc(spark).read.parquet(PATIENT)
    base = tempfile.mkdtemp(prefix="pofs_fhir_merge_")
    p.select("resourceType", "id", "gender").write.mode("overwrite").parquet(f"{base}/a")
    p.select("resourceType", "id", "birthDate", "maritalStatus").write.mode(
        "overwrite"
    ).parquet(f"{base}/b")
    merged = merge_tables(spark, f"{base}/a", f"{base}/b")
    return merged.select("resourceType", "id", "gender", "birthDate")


# --- F14: invariant validation reports ----------------------------------------------------
def qf06(spark, sf_dir):
    rows = []
    for name, path in [("Patient", PATIENT), ("Observation", OBSERVATION), ("ExplanationOfBenefit", EOB)]:
        df = utc(spark).read.parquet(path)
        report = validate(df, name)
        rows.append((name, len(report["errors"]), "; ".join(report["errors"])))
    return local_df(spark, rows, "resource STRING, n_errors INT, errors STRING")


# Round-trip re-encode must reproduce the original columns exactly —
# the oracle is simply the source file.
QF02_ORACLE = f"""
SELECT id, resourceType, birthDate FROM read_parquet('{PATIENT}')
"""

# Every golden birthDate is a full YYYY-MM-DD, so the date-range
# annotation bounds are the day's [00:00:00.000, 23:59:59.999].
QF03_ORACLE = f"""
SELECT id, birthDate,
       CASE WHEN birthDate IS NULL THEN NULL
            ELSE birthDate || ' 00:00:00.000' END AS bd_start,
       CASE WHEN birthDate IS NULL THEN NULL
            ELSE birthDate || ' 23:59:59.999' END AS bd_end
FROM read_parquet('{PATIENT}')
"""

QF05_ORACLE = f"""
SELECT resourceType, id, gender, CAST(NULL AS VARCHAR) AS birthDate
FROM read_parquet('{PATIENT}')
UNION ALL
SELECT resourceType, id, CAST(NULL AS VARCHAR) AS gender, birthDate
FROM read_parquet('{PATIENT}')
"""

QF06_ORACLE = """
SELECT * FROM (VALUES
('Patient', 0, ''), ('Observation', 0, ''), ('ExplanationOfBenefit', 0, '')
) AS t(resource, n_errors, errors)
"""

QUERIES = [
    Q("qf01_fhir_nested_query", qf01, QF01_ORACLE),
    Q("qf02_fhir_roundtrip_reencode", qf02, QF02_ORACLE),
    Q("qf03_fhir_date_annotations", qf03, QF03_ORACLE),
    Q("qf04_fhir_quantity_canonical", qf04, QF04_ORACLE),
    Q("qf05_fhir_schema_merge", qf05, QF05_ORACLE),
    Q("qf06_fhir_validate", qf06, QF06_ORACLE),
]


# --- FHIR reference traversal: Observation.subject → Patient join ---------------------
def qf07(spark, sf_dir):
    """Resolve FHIR reference strings ('Patient/<id>') and join resource
    tables — the core cross-resource query pattern. Patient side is tiny
    relative to Observations at scale → broadcast."""
    o = utc(spark).read.parquet(OBSERVATION)
    p = spark.read.parquet(PATIENT)
    obs = o.select(
        F.col("id").alias("obs_id"),
        F.regexp_extract(F.col("subject.reference"), "Patient/(.*)", 1).alias("pid"),
    )
    pat = p.select(F.col("id").alias("pid"), "gender")
    return (
        obs.join(F.broadcast(pat), "pid", "inner")
        .groupBy("gender")
        .agg(
            F.count("*").alias("n_obs"),
            F.countDistinct("pid").alias("n_patients"),
        )
    )


QF07_ORACLE = f"""
SELECT p.gender, count(*) AS n_obs, count(DISTINCT p.id) AS n_patients
FROM read_parquet('{OBSERVATION}') o
JOIN read_parquet('{PATIENT}') p
  ON regexp_extract(o.subject.reference, 'Patient/(.*)', 1) = p.id
GROUP BY p.gender
"""

QUERIES.append(Q("qf07_fhir_reference_join", qf07, QF07_ORACLE))


# --- F1 v2: schema derived from the resource DEFINITION alone (no data) -----------------
# Restricted to the element paths of the spec's own Patient/Observation
# listings (README.md:385-719) — a fixed, spec-pinned surface.
_SPEC_LISTING_PATHS: dict[str, list[tuple[str, ...]]] = {
    "Patient": [
        ("resourceType",), ("id",), ("meta", "profile"),
        ("text", "div"), ("text", "status"),
        ("extension", "url"), ("extension", "valueCoding", "code"),
        ("extension", "valueCoding", "display"), ("extension", "valueCoding", "system"),
        ("identifier", "system"), ("identifier", "type", "coding", "code"),
        ("identifier", "type", "coding", "system"), ("identifier", "type", "text"),
        ("identifier", "value"),
        ("name", "family"), ("name", "given"), ("name", "prefix"),
        ("name", "text"), ("name", "use"),
        ("telecom", "system"), ("telecom", "use"), ("telecom", "value"),
        ("gender",), ("birthDate",),
        ("address", "city"), ("address", "country"), ("address", "line"),
        ("address", "postalCode"), ("address", "state"), ("address", "use"),
        ("communication", "language", "coding", "code"),
        ("communication", "language", "coding", "system"),
        ("communication", "language", "text"),
    ],
    "Observation": [
        ("resourceType",), ("id",), ("meta", "profile"),
        ("text", "div"), ("text", "status"), ("status",),
        ("category", "coding", "code"), ("category", "coding", "display"),
        ("category", "coding", "system"), ("category", "text"),
        ("code", "coding", "code"), ("code", "coding", "display"),
        ("code", "coding", "system"), ("code", "text"),
        ("subject", "reference"), ("effectiveDateTime",),
        ("valueQuantity", "code"), ("valueQuantity", "system"),
        ("valueQuantity", "unit"), ("valueQuantity", "value"),
    ],
}


def _flatten_leaves(dtype, prefix=()):
    from pyspark.sql import types as T

    out = []
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            out += _flatten_leaves(f.dataType, prefix + (f.name,))
    elif isinstance(dtype, T.ArrayType):
        out += [(p, f"array<{t}>") for p, t in _flatten_leaves(dtype.elementType, prefix)]
    else:
        out = [(prefix, dtype.simpleString())]
    return out


def qf08(spark, sf_dir):
    """Schema from the resource definition ALONE (README.md:26-27) via
    the packaged R4 element registry — no data sample involved."""
    from parquet_on_fhir_spark.fhir.r4_elements import definition_schema

    rows = []
    for rtype, paths in _SPEC_LISTING_PATHS.items():
        sch = definition_schema(rtype, paths=set(paths))
        for p, t in _flatten_leaves(sch):
            rows.append((rtype, ".".join(p), t))
    return local_df(spark, 
        sorted(rows), "resource STRING, path STRING, dtype STRING"
    )


# Literal expected rows (pinned 2026-08-13 from the registry, verified
# against the spec listings by tests/test_r4_registry.py) — the oracle is
# independent of the code under test: a registry regression fails here.
QF08_ORACLE = """
SELECT * FROM (VALUES
('Observation', 'category.coding.code', 'array<array<string>>'),
('Observation', 'category.coding.display', 'array<array<string>>'),
('Observation', 'category.coding.system', 'array<array<string>>'),
('Observation', 'category.text', 'array<string>'),
('Observation', 'code.coding.code', 'array<string>'),
('Observation', 'code.coding.display', 'array<string>'),
('Observation', 'code.coding.system', 'array<string>'),
('Observation', 'code.text', 'string'),
('Observation', 'effectiveDateTime', 'string'),
('Observation', 'id', 'string'),
('Observation', 'meta.profile', 'array<string>'),
('Observation', 'resourceType', 'string'),
('Observation', 'status', 'string'),
('Observation', 'subject.reference', 'string'),
('Observation', 'text.div', 'string'),
('Observation', 'text.status', 'string'),
('Observation', 'valueQuantity.code', 'string'),
('Observation', 'valueQuantity.system', 'string'),
('Observation', 'valueQuantity.unit', 'string'),
('Observation', 'valueQuantity.value', 'string'),
('Patient', 'address.city', 'array<string>'),
('Patient', 'address.country', 'array<string>'),
('Patient', 'address.line', 'array<array<string>>'),
('Patient', 'address.postalCode', 'array<string>'),
('Patient', 'address.state', 'array<string>'),
('Patient', 'address.use', 'array<string>'),
('Patient', 'birthDate', 'string'),
('Patient', 'communication.language.coding.code', 'array<array<string>>'),
('Patient', 'communication.language.coding.system', 'array<array<string>>'),
('Patient', 'communication.language.text', 'array<string>'),
('Patient', 'extension.url', 'array<string>'),
('Patient', 'extension.valueCoding.code', 'array<string>'),
('Patient', 'extension.valueCoding.display', 'array<string>'),
('Patient', 'extension.valueCoding.system', 'array<string>'),
('Patient', 'gender', 'string'),
('Patient', 'id', 'string'),
('Patient', 'identifier.system', 'array<string>'),
('Patient', 'identifier.type.coding.code', 'array<array<string>>'),
('Patient', 'identifier.type.coding.system', 'array<array<string>>'),
('Patient', 'identifier.type.text', 'array<string>'),
('Patient', 'identifier.value', 'array<string>'),
('Patient', 'meta.profile', 'array<string>'),
('Patient', 'name.family', 'array<string>'),
('Patient', 'name.given', 'array<array<string>>'),
('Patient', 'name.prefix', 'array<array<string>>'),
('Patient', 'name.text', 'array<string>'),
('Patient', 'name.use', 'array<string>'),
('Patient', 'resourceType', 'string'),
('Patient', 'telecom.system', 'array<string>'),
('Patient', 'telecom.use', 'array<string>'),
('Patient', 'telecom.value', 'array<string>'),
('Patient', 'text.div', 'string'),
('Patient', 'text.status', 'string')
) AS t(resource, path, dtype)
"""

QUERIES.append(Q("qf08_fhir_definition_schema", qf08, QF08_ORACLE))


# --- SQL-on-FHIR v2 ViewDefinition runner (fhir/views.py) ---------------------------
# The standard tabular-view layer over Parquet-on-FHIR tables
# (hl7.org/fhir/uv/sql-on-fhir). Both queries compile entirely to
# explode + project — map-only plans, hash-checked against DuckDB
# restatements of the same flattening.
def qf09(spark, sf_dir):
    from parquet_on_fhir_spark.fhir.views import run_view

    p = utc(spark).read.parquet(PATIENT)
    return run_view(p, {
        "resource": "Patient",
        "select": [
            {"column": [
                {"name": "patient_id", "path": "getResourceKey()"},
                {"name": "gender", "path": "gender"},
                {"name": "birth_date", "path": "birthDate"},
            ]},
            {"forEach": "name", "column": [
                {"name": "family", "path": "family"},
                {"name": "given1", "path": "given.first()"},
            ]},
        ],
    })


QF09_ORACLE = f"""
SELECT id AS patient_id, gender, birthDate AS birth_date,
       n.family AS family, n.given[1] AS given1
FROM (SELECT id, gender, birthDate, unnest(name) AS n
      FROM read_parquet('{PATIENT}'))
"""


def qf10(spark, sf_dir):
    from parquet_on_fhir_spark.fhir.views import run_view

    o = utc(spark).read.parquet(OBSERVATION)
    return run_view(o, {
        "resource": "Observation",
        "where": [{"path": "status = 'final'"}],
        "select": [{"column": [
            {"name": "obs_id", "path": "getResourceKey()"},
            {"name": "patient_id", "path": "subject.getReferenceKey(Patient)"},
            {"name": "qty_value", "path": "value.ofType(Quantity).value"},
            # FHIRPath arithmetic with precedence + parens (round 6)
            {"name": "qty_scaled", "path": "(value.ofType(Quantity).value * 2 + 1) / 10"},
            {"name": "code1", "path": "code.coding.first().code"},
            {"name": "has_category", "path": "category.exists()"},
        ]}],
    })


QF10_ORACLE = f"""
SELECT id AS obs_id,
       CASE WHEN len(string_split(subject.reference, '/')) = 2
                 AND string_split(subject.reference, '/')[1] = 'Patient'
                 AND NOT starts_with(subject.reference, '#')
            THEN string_split(subject.reference, '/')[2] END AS patient_id,
       valueQuantity."value" AS qty_value,
       (TRY_CAST(valueQuantity."value" AS DOUBLE) * 2 + 1) / 10 AS qty_scaled,
       code.coding[1].code AS code1,
       len(COALESCE(category, [])) > 0 AS has_category
FROM read_parquet('{OBSERVATION}')
WHERE status = 'final'
"""

QUERIES.append(Q("qf09_view_definition_patient", qf09, QF09_ORACLE))
QUERIES.append(Q("qf10_view_definition_observation", qf10, QF10_ORACLE))


# --- chained search parameter (fhir/store.py) ---------------------------------------
def qf11(spark, sf_dir):
    """Observations whose subject chain-matches Patient.gender=female,
    with the reference key surfaced — filtered-target LEFT SEMI join
    (hl7.org/fhir/R4/search.html#chaining)."""
    from parquet_on_fhir_spark.fhir.store import FhirStore
    from parquet_on_fhir_spark.fhir.table import FhirTable

    utc(spark)
    store = FhirStore({
        "Patient": FhirTable.read(spark, PATIENT),
        "Observation": FhirTable.read(spark, OBSERVATION),
    })
    obs = store.search(
        "Observation", "status=final&subject:Patient.gender=female"
    )["Observation"]
    return obs.select(
        "id",
        F.split("subject.reference", "/").getItem(1).alias("patient_id"),
        "status",
        F.col("code.coding").getItem(0).getField("code").alias("code1"),
    )


QF11_ORACLE = f"""
SELECT o.id AS id,
       string_split(o.subject.reference, '/')[2] AS patient_id,
       o.status AS status,
       o.code.coding[1].code AS code1
FROM read_parquet('{OBSERVATION}') o
WHERE o.status = 'final'
  AND string_split(o.subject.reference, '/')[1] = 'Patient'
  AND string_split(o.subject.reference, '/')[2] IN (
        SELECT id FROM read_parquet('{PATIENT}') WHERE gender = 'female')
"""

QUERIES.append(Q("qf11_chained_search", qf11, QF11_ORACLE))


# --- terminology: ValueSet expansion + ConceptMap translation (fhir/terminology.py) --
# Fixed-literal terminology resources, encoded through the REAL
# NDJSON->Parquet path (registry-derived ValueSet/CodeSystem/ConceptMap
# schemas), so the oracle is the deterministic golden expansion.
_VS_DOC = {
    "resourceType": "ValueSet", "id": "vs-vitals", "status": "active",
    "url": "http://example.org/ValueSet/vitals",
    "compose": {
        "include": [
            {"system": "http://loinc.org",
             "concept": [{"code": "8867-4", "display": "Heart rate"},
                          {"code": "9279-1", "display": "Respiratory rate"},
                          {"code": "8310-5", "display": "Body temperature"}]},
            {"system": "http://example.org/cs/local"},  # whole system
        ],
        "exclude": [
            {"system": "http://loinc.org",
             "concept": [{"code": "8310-5"}]},
        ],
    },
}
_CS_DOC = {
    "resourceType": "CodeSystem", "id": "cs-local", "status": "active",
    "url": "http://example.org/cs/local", "content": "complete",
    "concept": [{"code": "bp-sys", "display": "Systolic BP"},
                 {"code": "bp-dia", "display": "Diastolic BP"}],
}
_CM_DOC = {
    "resourceType": "ConceptMap", "id": "cm-local", "status": "active",
    "url": "http://example.org/cm/local-to-loinc",
    "group": [{
        "source": "http://example.org/cs/local",
        "target": "http://loinc.org",
        "element": [
            {"code": "bp-sys",
             "target": [{"code": "8480-6", "display": "Systolic BP",
                          "equivalence": "equivalent"}]},
            {"code": "bp-dia",
             "target": [{"code": "8462-4", "display": "Diastolic BP",
                          "equivalence": "equivalent"},
                         {"code": "85354-9", "display": "BP panel",
                          "equivalence": "wider"}]},
        ],
    }],
}


def _encode_doc(spark, doc, rtype):
    import json as _json

    docs = doc if isinstance(doc, list) else [doc]
    base = tempfile.mkdtemp(prefix=f"pofs_term_{rtype}_")
    with open(f"{base}/r.ndjson", "w") as fh:
        for d in docs:
            fh.write(_json.dumps(d) + "\n")
    # validate=False: these are self-authored fixture docs — the
    # invariant-aggregate job per encode is covered by the encode
    # conformance tests, and at fixture scale jobs are the cost unit.
    # annotations=False (r15): terminology operators never read the
    # __x_start/__x_numeric annotation columns (verified by grep +
    # full qf-family selfcheck), and the annotate() projection over
    # the nested ValueSet/CodeSystem schemas was ~0.6 s of pure
    # driver plan construction per encode pair (guide §1.2: don't
    # compute things you throw away). Annotation coverage itself is
    # carried by qf02/qf03/qf04 and the encode conformance tests.
    return encode_ndjson(
        spark, base, resource_type=rtype, validate=False, annotations=False
    )


def qf12(spark, sf_dir):
    from parquet_on_fhir_spark.fhir.terminology import expand_valueset

    utc(spark)
    vs = _encode_doc(spark, _VS_DOC, "ValueSet")
    cs = _encode_doc(spark, _CS_DOC, "CodeSystem")
    return expand_valueset(vs, cs).select("url", "system", "code", "display")


QF12_ORACLE = """
SELECT * FROM (VALUES
  ('http://example.org/ValueSet/vitals', 'http://loinc.org', '8867-4', 'Heart rate'),
  ('http://example.org/ValueSet/vitals', 'http://loinc.org', '9279-1', 'Respiratory rate'),
  ('http://example.org/ValueSet/vitals', 'http://example.org/cs/local', 'bp-sys', 'Systolic BP'),
  ('http://example.org/ValueSet/vitals', 'http://example.org/cs/local', 'bp-dia', 'Diastolic BP')
) AS t(url, system, code, display)
"""


QUERIES.append(Q("qf12_valueset_expand", qf12, QF12_ORACLE))


def qf13(spark, sf_dir):
    from parquet_on_fhir_spark.fhir.terminology import translate_codes

    utc(spark)
    cm = _encode_doc(spark, _CM_DOC, "ConceptMap")
    facts = local_df(spark, 
        [
            (1, "http://example.org/cs/local", "bp-sys"),
            (2, "http://example.org/cs/local", "bp-dia"),
            (3, "http://example.org/cs/local", "unknown-code"),
            (4, "http://other.org", "bp-sys"),
        ],
        "row_id long, system string, code string",
    )
    return translate_codes(facts, cm, "system", "code").select(
        "row_id", "code", "target_system", "target_code", "equivalence"
    )


QF13_ORACLE = """
SELECT * FROM (VALUES
  (1, 'bp-sys', 'http://loinc.org', '8480-6', 'equivalent'),
  (2, 'bp-dia', 'http://loinc.org', '8462-4', 'equivalent'),
  (2, 'bp-dia', 'http://loinc.org', '85354-9', 'wider'),
  (3, 'unknown-code', NULL, NULL, NULL),
  (4, 'bp-sys', NULL, NULL, NULL)
) AS t(row_id, code, target_system, target_code, equivalence)
"""


QUERIES.append(Q("qf13_conceptmap_translate", qf13, QF13_ORACLE))


# --- qf14: hierarchical ValueSet filter expansion (is-a closure) ---------------------
# A 4-level anatomy hierarchy: the is-a filter must walk nested
# concept[].concept[] transitively (fhir/terminology.py::
# concept_edges → concept_closure → expand_valueset(closure=...)).
_CS_ANATOMY_DOC = {
    "resourceType": "CodeSystem", "id": "cs-anatomy", "status": "active",
    "url": "http://example.org/cs/anatomy", "content": "complete",
    "concept": [
        {"code": "body", "display": "Body", "concept": [
            {"code": "limb", "display": "Limb", "concept": [
                {"code": "arm", "display": "Arm", "concept": [
                    {"code": "hand", "display": "Hand"}]},
                {"code": "leg", "display": "Leg", "concept": [
                    {"code": "foot", "display": "Foot"}]}]},
            {"code": "organ", "display": "Organ", "concept": [
                {"code": "heart", "display": "Heart"}]}]},
    ],
}
_VS_LIMBS_DOC = {
    "resourceType": "ValueSet", "id": "vs-limbs", "status": "active",
    "url": "http://example.org/ValueSet/limbs",
    "compose": {
        "include": [
            {"system": "http://example.org/cs/anatomy",
             "filter": [{"property": "concept", "op": "is-a",
                          "value": "limb"}]},
        ],
        "exclude": [
            {"system": "http://example.org/cs/anatomy",
             "concept": [{"code": "foot"}]},
        ],
    },
}


def qf14(spark, sf_dir):
    """is-a filter expansion over a 4-level hierarchy: limb + all
    transitive descendants, minus the excluded foot."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_LIMBS_DOC, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select(
        "url", "system", "code", "display"
    )


QF14_ORACLE = """
SELECT * FROM (VALUES
  ('http://example.org/ValueSet/limbs', 'http://example.org/cs/anatomy', 'limb', 'Limb'),
  ('http://example.org/ValueSet/limbs', 'http://example.org/cs/anatomy', 'arm', 'Arm'),
  ('http://example.org/ValueSet/limbs', 'http://example.org/cs/anatomy', 'hand', 'Hand'),
  ('http://example.org/ValueSet/limbs', 'http://example.org/cs/anatomy', 'leg', 'Leg')
) AS t(url, system, code, display)
"""


QUERIES.append(Q("qf14_valueset_isa_filter", qf14, QF14_ORACLE))


# --- patient compartment: $everything as a bulk cohort extraction -------------------
def qf15(spark, sf_dir):
    """Patient $everything over the reference's three example tables
    (fhir/store.py::FhirStore.everything): every resource in every
    patient's compartment, flattened to (resource_type, id, patient_id)
    rows. Bulk form — all patients at once, member tables scanned once
    and joined against the broadcast patient-id set."""
    from parquet_on_fhir_spark.fhir.store import FhirStore
    from parquet_on_fhir_spark.fhir.table import FhirTable

    utc(spark)
    store = FhirStore({
        "Patient": FhirTable.read(spark, PATIENT),
        "Observation": FhirTable.read(spark, OBSERVATION),
        "ExplanationOfBenefit": FhirTable.read(spark, EOB),
    })
    frames = store.everything()
    out = None
    for rtype in sorted(frames):
        part = frames[rtype].select(
            F.lit(rtype).alias("resource_type"),
            F.col("id"),
            F.col("patient_id"),
        )
        out = part if out is None else out.unionAll(part)
    return out


QF15_ORACLE = f"""
SELECT 'Patient' AS resource_type, id, id AS patient_id
FROM read_parquet('{PATIENT}')
UNION ALL
SELECT 'Observation', o.id,
       regexp_replace(o.subject.reference, '^Patient/', '') AS patient_id
FROM read_parquet('{OBSERVATION}') o
WHERE o.subject.reference LIKE 'Patient/%'
  AND regexp_replace(o.subject.reference, '^Patient/', '')
      IN (SELECT id FROM read_parquet('{PATIENT}'))
UNION ALL
SELECT 'ExplanationOfBenefit', e.id,
       regexp_replace(e.patient.reference, '^Patient/', '') AS patient_id
FROM read_parquet('{EOB}') e
WHERE e.patient.reference LIKE 'Patient/%'
  AND regexp_replace(e.patient.reference, '^Patient/', '')
      IN (SELECT id FROM read_parquet('{PATIENT}'))
"""


QUERIES.append(Q("qf15_patient_everything", qf15, QF15_ORACLE))


# --- _has reverse chaining ----------------------------------------------------------
def qf16(spark, sf_dir):
    """Patients that HAVE a final Observation — reverse chaining
    (`_has:Observation:subject:status=final`, fhir/store.py): the
    referencing table is filtered first, its parsed subject keys
    broadcast, and Patient LEFT SEMI joined on its own id."""
    from parquet_on_fhir_spark.fhir.store import FhirStore
    from parquet_on_fhir_spark.fhir.table import FhirTable

    utc(spark)
    store = FhirStore({
        "Patient": FhirTable.read(spark, PATIENT),
        "Observation": FhirTable.read(spark, OBSERVATION),
    })
    out = store.search("Patient", "_has:Observation:subject:status=final")
    return out["Patient"].select("id", "gender")


QF16_ORACLE = f"""
SELECT id, gender FROM read_parquet('{PATIENT}')
WHERE id IN (
  SELECT regexp_replace(subject.reference, '^Patient/', '')
  FROM read_parquet('{OBSERVATION}')
  WHERE status = 'final'
)
"""


QUERIES.append(Q("qf16_has_reverse_chain", qf16, QF16_ORACLE))


# --- Observation $lastn (most recent N per patient+code) ----------------------------
def qf17(spark, sf_dir):
    """Observation $lastn (hl7.org/fhir/R4/observation-operation-lastn):
    the 2 most recent observations per (patient, code), ordered by the
    parsed effectiveDateTime instant — ISO offsets normalize to UTC
    epoch in BOTH engines, so cross-timezone ordering is correct (a
    lexical string sort would not be). Tie-broken by id."""
    utc(spark)
    o = utc(spark).read.parquet(OBSERVATION)
    eff = F.unix_micros(
        F.to_timestamp(F.col("effectiveDateTime"), "yyyy-MM-dd'T'HH:mm:ssXXX")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("patient_id", "code").orderBy(
        F.desc("eff_us"), F.desc("id")
    )
    return (
        o.select(
            F.regexp_replace(F.col("subject.reference"), "^Patient/", "").alias(
                "patient_id"
            ),
            F.col("code.coding")[0]["code"].alias("code"),
            F.col("id"),
            eff.alias("eff_us"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("patient_id", "code", "id", "eff_us", "rank")
    )


QF17_ORACLE = f"""
WITH o AS (
  SELECT regexp_replace(subject.reference, '^Patient/', '') AS patient_id,
         code.coding[1].code AS code,
         id,
         epoch_us(strptime(effectiveDateTime, '%Y-%m-%dT%H:%M:%S%z')) AS eff_us
  FROM read_parquet('{OBSERVATION}')
)
SELECT patient_id, code, id, eff_us, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY patient_id, code
              ORDER BY eff_us DESC, id DESC) AS rank
  FROM o
) WHERE rank <= 2
"""


QUERIES.append(Q("qf17_observation_lastn", qf17, QF17_ORACLE))


# --- patient linkage ($match batch form) --------------------------------------------
def qf18(spark, sf_dir):
    """Link perturbed patient records back to the registry
    (fhir/store.py::match_patients): candidates are each golden patient
    with the family name upper-cased and truncated by one character —
    a deterministic perturbation both engines can restate — blocked on
    (gender, birthDate), scored by case-folded Levenshtein, best match
    per candidate."""
    from parquet_on_fhir_spark.fhir.store import match_patients

    p = utc(spark).read.parquet(PATIENT)
    base = p.select(
        "id",
        "gender",
        "birthDate",
        F.col("name")[0]["family"].alias("family"),
    )
    cands = base.select(
        F.col("id").alias("cand_id"),
        "gender",
        "birthDate",
        F.upper(F.expr("substring(family, 1, length(family) - 1)")).alias(
            "family"
        ),
    )
    out = match_patients(base, cands, ["gender", "birthDate"], "family", 3)
    return out.orderBy("cand_id")


QF18_ORACLE = f"""
WITH base AS (
  SELECT id, gender, birthDate, name[1].family AS family
  FROM read_parquet('{PATIENT}')
),
cand AS (
  SELECT id AS cand_id, gender, birthDate,
         upper(substring(family, 1, length(family) - 1)) AS family
  FROM base
),
scored AS (
  SELECT cand.cand_id, base.id AS matched_id,
         levenshtein(lower(cand.family), lower(base.family)) AS distance
  FROM cand JOIN base USING (gender, birthDate)
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY cand_id
              ORDER BY distance, matched_id) AS rn
  FROM scored WHERE distance <= 3
)
SELECT cand_id, matched_id, distance FROM best WHERE rn = 1
"""


QUERIES.append(Q("qf18_patient_linkage", qf18, QF18_ORACLE))


# --- component pivot: blood pressure systolic/diastolic -----------------------------
def qf19(spark, sf_dir):
    """Flatten Observation.component to one (patient, systolic,
    diastolic) row per blood-pressure panel — THE SQL-on-FHIR demo
    query. Array filter by LOINC code picks each component (a pure map
    over the component list, no explode/regroup round trip), and the
    numeric comes from the format's OWN decimal annotation
    (``__value_numeric``, /root/reference/README.md:343-363) rather
    than a lossy string cast."""
    utc(spark)
    o = utc(spark).read.parquet(OBSERVATION)

    def comp_value(code):
        hit = F.filter(
            F.col("component"),
            lambda c: c["code"]["coding"][0]["code"] == code,
        )
        # try_element_at: observations lacking this component yield NULL
        # instead of an ANSI index error on the empty filtered array
        return (
            F.try_element_at(hit, F.lit(1))["valueQuantity"]["__value_numeric"]
            .cast("double")
        )

    return (
        o.filter(F.col("component").isNotNull())
        .select(
            F.col("id"),
            F.regexp_replace(F.col("subject.reference"), "^Patient/", "").alias(
                "patient_id"
            ),
            comp_value("8480-6").alias("systolic"),
            comp_value("8462-4").alias("diastolic"),
        )
        .filter(F.col("systolic").isNotNull() & F.col("diastolic").isNotNull())
    )


QF19_ORACLE = f"""
WITH bp AS (
  SELECT id,
         regexp_replace(subject.reference, '^Patient/', '') AS patient_id,
         list_filter(component,
                     c -> c.code.coding[1].code = '8480-6') AS sys_c,
         list_filter(component,
                     c -> c.code.coding[1].code = '8462-4') AS dia_c
  FROM read_parquet('{OBSERVATION}')
  WHERE component IS NOT NULL
)
SELECT id, patient_id,
       CAST(sys_c[1].valueQuantity.__value_numeric AS DOUBLE) AS systolic,
       CAST(dia_c[1].valueQuantity.__value_numeric AS DOUBLE) AS diastolic
FROM bp
WHERE sys_c[1].valueQuantity.__value_numeric IS NOT NULL
  AND dia_c[1].valueQuantity.__value_numeric IS NOT NULL
"""


QUERIES.append(Q("qf19_bp_component_pivot", qf19, QF19_ORACLE))


# --- robust lab-value outliers (FHIR × robust stats composition) --------------------
def qf20(spark, sf_dir):
    """Median/MAD modified z-scores of Observation quantities per LOINC
    code — the FHIR composition of
    operators/analytics.py::robust_outliers: values come from the
    format's decimal annotation, groups are the code.coding codes, and
    the masking-proof scoring flags implausible lab entries (unit
    mix-ups, fat-fingered magnitudes) without a reference-range
    table."""
    from parquet_on_fhir_spark.operators.analytics import robust_outliers

    o = utc(spark).read.parquet(OBSERVATION)
    vals = o.select(
        "id",
        F.col("code.coding")[0]["code"].alias("code"),
        F.col("valueQuantity.__value_numeric").cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    out = robust_outliers(vals, "v", ["code"], threshold=3.5)
    return out.select(
        "id",
        "code",
        d4(F.col("modified_z")).alias("modified_z"),
        "is_outlier",
    )


QF20_ORACLE = f"""
WITH vals AS (
  SELECT id, code.coding[1].code AS code,
         CAST(valueQuantity.__value_numeric AS DOUBLE) AS v
  FROM read_parquet('{OBSERVATION}')
  WHERE valueQuantity.__value_numeric IS NOT NULL
),
med AS (SELECT code, quantile_cont(v, 0.5) AS med FROM vals GROUP BY code),
dev AS (
  SELECT vals.*, med.med, abs(v - med.med) AS adev
  FROM vals JOIN med USING (code)
),
mad AS (SELECT code, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY code)
SELECT id, dev.code,
       round(CASE WHEN mad.mad > 0
             THEN 0.6745 * (v - dev.med) / mad.mad END + 1e-9, 4) + 0.0
         AS modified_z,
       COALESCE(CASE WHEN mad.mad > 0
             THEN abs(0.6745 * (v - dev.med) / mad.mad) > 3.5 END, false)
         AS is_outlier
FROM dev JOIN mad USING (code)
"""


QUERIES.append(Q("qf20_lab_value_outliers", qf20, QF20_ORACLE))


# --- qf21: predicate ValueSet filters (regex / in / property / is-not-a, AND) --------
# A status-annotated anatomy CodeSystem: concept.property[] carries
# {status: active|retired}. Four includes across two ValueSets exercise
# every non-hierarchical filter family fhir/terminology.py::
# _expand_filters supports, plus AND semantics inside one include and
# is-not-a against the closure.
_CS_ANATOMY_PROPS_DOC = {
    "resourceType": "CodeSystem", "id": "cs-anatomy2", "status": "active",
    "url": "http://example.org/cs/anatomy2", "content": "complete",
    "concept": [
        {"code": "body", "display": "Body",
         "property": [{"code": "status", "valueCode": "active"}],
         "concept": [
            {"code": "limb", "display": "Limb",
             "property": [{"code": "status", "valueCode": "active"}],
             "concept": [
                {"code": "arm", "display": "Arm",
                 "property": [{"code": "status", "valueCode": "active"},
                              {"code": "laterality", "valueCode": "paired"}],
                 "concept": [
                    {"code": "hand", "display": "Hand",
                     "property": [{"code": "status", "valueCode": "retired"}]}]},
                {"code": "leg", "display": "Leg",
                 "property": [{"code": "status", "valueCode": "active"},
                              {"code": "laterality", "valueCode": "paired"}],
                 "concept": [
                    {"code": "foot", "display": "Foot",
                     "property": [{"code": "status", "valueCode": "active"}]}]}]},
            {"code": "organ", "display": "Organ",
             "property": [{"code": "status", "valueCode": "active"}],
             "concept": [
                {"code": "heart", "display": "Heart",
                 "property": [{"code": "status", "valueCode": "active"}]}]}]},
    ],
}
_VS_FILTER_DOCS = [
    {"resourceType": "ValueSet", "id": "vs-preds", "status": "active",
     "url": "http://example.org/ValueSet/preds",
     "compose": {"include": [
         # regex: whole-value match over the system's code universe
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "code", "op": "regex", "value": "h.*"}]},
         # in: comma-separated list (unknown codes ignored)
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "code", "op": "in",
                      "value": "arm,leg,ghost"}]},
         # AND inside one include: limb subtree ∩ status=active
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "concept", "op": "is-a", "value": "limb"},
                     {"property": "status", "op": "=", "value": "active"}]},
     ]}},
    {"resourceType": "ValueSet", "id": "vs-notlimb", "status": "active",
     "url": "http://example.org/ValueSet/not-limbs",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "concept", "op": "is-not-a",
                      "value": "limb"}]},
     ]}},
]


def qf21(spark, sf_dir):
    """Predicate ValueSet filters (fhir/terminology.py::_expand_filters):
    regex / in over the concept universe, concept-property equality,
    AND semantics across one include's filters, and is-not-a against
    the transitive closure — the filter ops round 6 still raised on."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_FILTER_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select(
        "url", "system", "code", "display"
    )


QF21_ORACLE = """
SELECT * FROM (VALUES
  -- preds: regex 'h.*' -> hand, heart
  ('http://example.org/ValueSet/preds', 'http://example.org/cs/anatomy2', 'hand', 'Hand'),
  ('http://example.org/ValueSet/preds', 'http://example.org/cs/anatomy2', 'heart', 'Heart'),
  -- preds: in 'arm,leg,ghost' -> arm, leg
  ('http://example.org/ValueSet/preds', 'http://example.org/cs/anatomy2', 'arm', 'Arm'),
  ('http://example.org/ValueSet/preds', 'http://example.org/cs/anatomy2', 'leg', 'Leg'),
  -- preds: is-a limb AND status=active -> limb, foot (arm/leg already
  -- present; hand is retired)
  ('http://example.org/ValueSet/preds', 'http://example.org/cs/anatomy2', 'limb', 'Limb'),
  ('http://example.org/ValueSet/preds', 'http://example.org/cs/anatomy2', 'foot', 'Foot'),
  -- not-limbs: everything outside the limb-or-descendant set
  ('http://example.org/ValueSet/not-limbs', 'http://example.org/cs/anatomy2', 'body', 'Body'),
  ('http://example.org/ValueSet/not-limbs', 'http://example.org/cs/anatomy2', 'organ', 'Organ'),
  ('http://example.org/ValueSet/not-limbs', 'http://example.org/cs/anatomy2', 'heart', 'Heart')
) AS t(url, system, code, display)
"""


QUERIES.append(Q("qf21_valueset_predicate_filters", qf21, QF21_ORACLE))


# --- qf22: `code exists` ValueSet filters (r8 verdict gap, closed r9) ---------------
_VS_CODE_EXISTS_DOCS = [
    {"resourceType": "ValueSet", "id": "vs-allcodes", "status": "active",
     "url": "http://example.org/ValueSet/all-codes",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "code", "op": "exists",
                      "value": "true"}]},
     ]}},
    {"resourceType": "ValueSet", "id": "vs-nocodes", "status": "active",
     "url": "http://example.org/ValueSet/no-codes",
     "compose": {"include": [
         # `code exists false` is vacuously empty (every concept has a
         # code); OR'd with a second include so the ValueSet itself is
         # not vacuous and the oracle pins BOTH behaviors
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "code", "op": "exists",
                      "value": "false"}]},
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "code", "op": "in", "value": "heart"}]},
     ]}},
]


def qf22(spark, sf_dir):
    """`code exists` ValueSet filters (fhir/terminology.py::
    _expand_filters, r9): every concept has a code, so exists=true
    expands to the system's whole concept universe and exists=false to
    nothing — previously a NotImplementedError (r8 verdict gap #4)."""
    from parquet_on_fhir_spark.fhir.terminology import expand_valueset

    utc(spark)
    vs = _encode_doc(spark, _VS_CODE_EXISTS_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    return expand_valueset(vs, cs).select("url", "code", "display")


QF22_ORACLE = """
SELECT * FROM (VALUES
  ('http://example.org/ValueSet/all-codes', 'body', 'Body'),
  ('http://example.org/ValueSet/all-codes', 'limb', 'Limb'),
  ('http://example.org/ValueSet/all-codes', 'arm', 'Arm'),
  ('http://example.org/ValueSet/all-codes', 'hand', 'Hand'),
  ('http://example.org/ValueSet/all-codes', 'leg', 'Leg'),
  ('http://example.org/ValueSet/all-codes', 'foot', 'Foot'),
  ('http://example.org/ValueSet/all-codes', 'organ', 'Organ'),
  ('http://example.org/ValueSet/all-codes', 'heart', 'Heart'),
  ('http://example.org/ValueSet/no-codes', 'heart', 'Heart')
) AS t(url, code, display)
"""


QUERIES.append(Q("qf22_valueset_code_exists", qf22, QF22_ORACLE))


# --- qf23: ECL constraint filters (SNOMED expression-constraint subset) -------------
_VS_ECL_DOCS = [
    {"resourceType": "ValueSet", "id": f"vs-ecl{i}", "status": "active",
     "url": f"http://example.org/ValueSet/ecl{i}",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "constraint", "op": "=",
                      "value": ecl}]},
     ]}}
    for i, ecl in enumerate(
        [
            "<< limb",                      # descendant-or-self
            "(<< limb) MINUS (<< arm)",     # exclusion
            "> hand",                       # strict ancestors
            "(< body) AND (>> heart)",      # conjunction of desc + anc-or-self
            "* MINUS << limb",              # wildcard + exclusion
        ],
        start=1,
    )
]


def qf23(spark, sf_dir):
    """ECL subset evaluation (fhir/terminology.py::ecl_expand, r9):
    SNOMED's standard ValueSet idiom `constraint = <ecl>` with <|<<|>|>>
    prefixes, '*', parentheses and AND/OR/MINUS — all evaluated as
    broadcast joins / set ops against the concept closure, never on the
    driver. Previously raised (r8 verdict gap #4)."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_ECL_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select("url", "code")


QF23_ORACLE = """
SELECT * FROM (VALUES
  -- ecl1: << limb
  ('http://example.org/ValueSet/ecl1', 'limb'),
  ('http://example.org/ValueSet/ecl1', 'arm'),
  ('http://example.org/ValueSet/ecl1', 'hand'),
  ('http://example.org/ValueSet/ecl1', 'leg'),
  ('http://example.org/ValueSet/ecl1', 'foot'),
  -- ecl2: (<< limb) MINUS (<< arm)
  ('http://example.org/ValueSet/ecl2', 'limb'),
  ('http://example.org/ValueSet/ecl2', 'leg'),
  ('http://example.org/ValueSet/ecl2', 'foot'),
  -- ecl3: > hand
  ('http://example.org/ValueSet/ecl3', 'arm'),
  ('http://example.org/ValueSet/ecl3', 'limb'),
  ('http://example.org/ValueSet/ecl3', 'body'),
  -- ecl4: (< body) AND (>> heart)
  ('http://example.org/ValueSet/ecl4', 'organ'),
  ('http://example.org/ValueSet/ecl4', 'heart'),
  -- ecl5: * MINUS << limb
  ('http://example.org/ValueSet/ecl5', 'body'),
  ('http://example.org/ValueSet/ecl5', 'organ'),
  ('http://example.org/ValueSet/ecl5', 'heart')
) AS t(url, code)
"""


QUERIES.append(Q("qf23_ecl_expand", qf23, QF23_ORACLE))


# --- qf24: ECL attribute refinements ------------------------------------------------
_CS_FINDINGS_DOC = {
    "resourceType": "CodeSystem", "id": "cs-findings", "status": "active",
    "url": "http://example.org/cs/findings", "content": "complete",
    "concept": [
        {"code": "anatomy", "display": "Anatomy", "concept": [
            {"code": "limb", "display": "Limb", "concept": [
                {"code": "arm", "display": "Arm", "concept": [
                    {"code": "hand", "display": "Hand"}]},
                {"code": "leg", "display": "Leg"}]}]},
        {"code": "finding", "display": "Finding", "concept": [
            {"code": "arm-fracture", "display": "Arm fracture",
             "property": [{"code": "site", "valueCode": "arm"},
                          {"code": "severity", "valueCode": "high"}]},
            {"code": "hand-burn", "display": "Hand burn",
             "property": [{"code": "site", "valueCode": "hand"},
                          {"code": "severity", "valueCode": "low"}]},
            {"code": "leg-sprain", "display": "Leg sprain",
             "property": [{"code": "site", "valueCode": "leg"},
                          {"code": "severity", "valueCode": "low"}]}]},
    ],
}
_VS_ECL_REFINE_DOCS = [
    {"resourceType": "ValueSet", "id": f"vs-eclr{i}", "status": "active",
     "url": f"http://example.org/ValueSet/eclr{i}",
     "compose": {"include": [
         {"system": "http://example.org/cs/findings",
          "filter": [{"property": "constraint", "op": "=",
                      "value": ecl}]},
     ]}}
    for i, ecl in enumerate(
        [
            # concept-set value: site ∈ descendants-or-self(arm)
            "<< finding : site = << arm",
            # literal value match
            "<< finding : severity = high",
            # parenthesized set-expression value
            "<< finding : site = (<< limb MINUS << arm)",
            # comma = refinement conjunction
            "<< finding : site = << arm , severity = low",
            # wildcard attribute
            "* : * = high",
        ],
        start=1,
    )
]


def qf24(spark, sf_dir):
    """ECL attribute refinements (fhir/terminology.py::ecl_expand, r9):
    ``focus : attr = value`` against CodeSystem concept.property[]
    assertions — value as literal (string equality) or as a concept
    set expression (membership via the closure), comma conjunction,
    '*' wildcard attribute. Each refinement is a broadcast semi-join
    of the focus set against the matching property rows; previously
    ':' raised NotImplementedError (the last gap qf23 left open)."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_ECL_REFINE_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_FINDINGS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select("url", "code")


QF24_ORACLE = """
SELECT * FROM (VALUES
  -- eclr1: << finding : site = << arm  (site ∈ {arm, hand})
  ('http://example.org/ValueSet/eclr1', 'arm-fracture'),
  ('http://example.org/ValueSet/eclr1', 'hand-burn'),
  -- eclr2: << finding : severity = high
  ('http://example.org/ValueSet/eclr2', 'arm-fracture'),
  -- eclr3: << finding : site = (<< limb MINUS << arm)  (site ∈ {limb, leg})
  ('http://example.org/ValueSet/eclr3', 'leg-sprain'),
  -- eclr4: << finding : site = << arm , severity = low
  ('http://example.org/ValueSet/eclr4', 'hand-burn'),
  -- eclr5: * : * = high
  ('http://example.org/ValueSet/eclr5', 'arm-fracture')
) AS t(url, code)
"""


QUERIES.append(Q("qf24_ecl_refinement", qf24, QF24_ORACLE))


# --- qf25: batch $validate-code ------------------------------------------------------
def qf25(spark, sf_dir):
    """Batch ValueSet $validate-code (fhir/terminology.py::
    validate_codes, r9): every (system, code) row of a fact-side frame
    gets in_valueset + member display by a BROADCAST join against the
    one-time ValueSet expansion — the fact table is never shuffled.
    Probes a member reached via regex filter, one via is-a+property
    AND, a real-but-nonmember code, an unknown code, and a code under
    the wrong system."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        validate_codes,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_FILTER_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    codes = local_df(spark, 
        [
            ("http://example.org/cs/anatomy2", "hand"),
            ("http://example.org/cs/anatomy2", "body"),
            ("http://example.org/cs/anatomy2", "ghost"),
            ("http://example.org/cs/anatomy2", "heart"),
            ("http://example.org/cs/other", "hand"),
        ],
        "system string, code string",
    )
    return validate_codes(
        codes,
        vs,
        "system",
        "code",
        "http://example.org/ValueSet/preds",
        codesystems=cs,
        closure=closure,
    ).select("system", "code", "in_valueset", "display")


QF25_ORACLE = """
SELECT * FROM (VALUES
  ('http://example.org/cs/anatomy2', 'hand', TRUE, 'Hand'),
  ('http://example.org/cs/anatomy2', 'body', FALSE, CAST(NULL AS VARCHAR)),
  ('http://example.org/cs/anatomy2', 'ghost', FALSE, CAST(NULL AS VARCHAR)),
  ('http://example.org/cs/anatomy2', 'heart', TRUE, 'Heart'),
  ('http://example.org/cs/other', 'hand', FALSE, CAST(NULL AS VARCHAR))
) AS t(system, code, in_valueset, display)
"""


QUERIES.append(Q("qf25_validate_code", qf25, QF25_ORACLE))


# --- qf26: ECL member-of (^ refset) ---------------------------------------------------
_VS_MEMBER_DOCS = [
    {"resourceType": "ValueSet", "id": "vs-m1", "status": "active",
     "url": "http://example.org/ValueSet/m1",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "code", "op": "in",
                      "value": "arm,heart"}]},
     ]}},
    {"resourceType": "ValueSet", "id": "vs-m2", "status": "active",
     "url": "http://example.org/ValueSet/m2",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "constraint", "op": "=",
                      "value": "(^ vs-m1) OR hand"}]},
     ]}},
    {"resourceType": "ValueSet", "id": "vs-m3", "status": "active",
     "url": "http://example.org/ValueSet/m3",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "constraint", "op": "=",
                      "value": "(<< limb) MINUS (^ vs-m1)"}]},
     ]}},
]


def qf26(spark, sf_dir):
    """ECL member-of (fhir/terminology.py::ecl_expand `^ refset`, r9):
    a ValueSet acts as the reference set, resolved against the same
    ValueSet table being expanded (depth-N since r11 — qf41 covers
    nesting; circular ^ chains raise ValueError). vs-m2/vs-m3 compose
    the refset with OR/MINUS; vs-m1 is the refset itself and also
    expands normally."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_MEMBER_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select("url", "code")


QF26_ORACLE = """
SELECT * FROM (VALUES
  -- m1 (the refset): in 'arm,heart'
  ('http://example.org/ValueSet/m1', 'arm'),
  ('http://example.org/ValueSet/m1', 'heart'),
  -- m2: (^ vs-m1) OR hand
  ('http://example.org/ValueSet/m2', 'arm'),
  ('http://example.org/ValueSet/m2', 'heart'),
  ('http://example.org/ValueSet/m2', 'hand'),
  -- m3: (<< limb) MINUS (^ vs-m1)
  ('http://example.org/ValueSet/m3', 'limb'),
  ('http://example.org/ValueSet/m3', 'hand'),
  ('http://example.org/ValueSet/m3', 'leg'),
  ('http://example.org/ValueSet/m3', 'foot')
) AS t(url, code)
"""


QUERIES.append(Q("qf26_ecl_member_of", qf26, QF26_ORACLE))


# --- qf27/qf28/qf29: ECL dotted walks, cardinality, reverse attributes (r9) ----------
# One richer findings tree exercises all three: multi-trauma carries TWO
# site assertions (cardinality > 1), fatigue carries none ([0..0]), and
# the site values land back in the anatomy branch (dotted / reverse).
_CS_FINDINGS2_DOC = {
    "resourceType": "CodeSystem", "id": "cs-findings2", "status": "active",
    "url": "http://example.org/cs/findings2", "content": "complete",
    "concept": [
        {"code": "anatomy", "display": "Anatomy", "concept": [
            {"code": "limb", "display": "Limb", "concept": [
                {"code": "arm", "display": "Arm", "concept": [
                    {"code": "hand", "display": "Hand"}]},
                {"code": "leg", "display": "Leg"}]}]},
        {"code": "finding", "display": "Finding", "concept": [
            {"code": "arm-fracture", "display": "Arm fracture",
             "property": [{"code": "site", "valueCode": "arm"},
                          {"code": "severity", "valueCode": "high"}]},
            {"code": "hand-burn", "display": "Hand burn",
             "property": [{"code": "site", "valueCode": "hand"},
                          {"code": "severity", "valueCode": "low"}]},
            {"code": "leg-sprain", "display": "Leg sprain",
             "property": [{"code": "site", "valueCode": "leg"},
                          {"code": "severity", "valueCode": "low"}]},
            {"code": "multi-trauma", "display": "Multiple trauma",
             "property": [{"code": "site", "valueCode": "arm"},
                          {"code": "site", "valueCode": "leg"},
                          {"code": "severity", "valueCode": "high"}]},
            {"code": "fatigue", "display": "Fatigue",
             "property": [{"code": "severity", "valueCode": "low"}]}]},
    ],
}


def _ecl_vs_docs(tag, ecls):
    return [
        {"resourceType": "ValueSet", "id": f"vs-{tag}{i}", "status": "active",
         "url": f"http://example.org/ValueSet/{tag}{i}",
         "compose": {"include": [
             {"system": "http://example.org/cs/findings2",
              "filter": [{"property": "constraint", "op": "=",
                          "value": ecl}]},
         ]}}
        for i, ecl in enumerate(ecls, start=1)
    ]


def _ecl_findings2(spark, vs_docs):
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, vs_docs, "ValueSet")
    cs = _encode_doc(spark, _CS_FINDINGS2_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select("url", "code")


def qf27(spark, sf_dir):
    """ECL dotted attribute walks (fhir/terminology.py::ecl_expand
    `focus . attr`, r9): project the focus set to its attribute VALUES,
    semi-joined back into the concept universe (severity values 'high'/
    'low' are not concepts, so '*' walks drop them) — evaluated as one
    broadcast semi-join against the property assertions plus one
    against the universe, chainable and composable with set ops."""
    return _ecl_findings2(spark, _ecl_vs_docs("dot", [
        "<< finding . site",
        "(<< finding : severity = high) . site",
        "<< finding . *",
        "(<< finding . site) AND (<< arm)",
        "multi-trauma . site",
    ]))


QF27_ORACLE = """
SELECT * FROM (VALUES
  -- dot1: << finding . site
  ('http://example.org/ValueSet/dot1', 'arm'),
  ('http://example.org/ValueSet/dot1', 'hand'),
  ('http://example.org/ValueSet/dot1', 'leg'),
  -- dot2: (<< finding : severity = high) . site
  ('http://example.org/ValueSet/dot2', 'arm'),
  ('http://example.org/ValueSet/dot2', 'leg'),
  -- dot3: << finding . *  (severity values are not concepts)
  ('http://example.org/ValueSet/dot3', 'arm'),
  ('http://example.org/ValueSet/dot3', 'hand'),
  ('http://example.org/ValueSet/dot3', 'leg'),
  -- dot4: (<< finding . site) AND (<< arm)
  ('http://example.org/ValueSet/dot4', 'arm'),
  ('http://example.org/ValueSet/dot4', 'hand'),
  -- dot5: multi-trauma . site
  ('http://example.org/ValueSet/dot5', 'arm'),
  ('http://example.org/ValueSet/dot5', 'leg')
) AS t(url, code)
"""


QUERIES.append(Q("qf27_ecl_dotted", qf27, QF27_ORACLE))


def qf28(spark, sf_dir):
    """ECL attribute cardinality (fhir/terminology.py::ecl_expand
    `[m..n] attr`, r9): matching-assertion counts per focus concept via
    a left join against the K-row count frame (zero included), so
    `[0..0]` must-not-have and `[2..*]` multi-valued fall out of one
    plan shape; value conditions compose (`[1..2] site = << arm`)."""
    return _ecl_findings2(spark, _ecl_vs_docs("card", [
        "< finding : [2..*] site = *",
        "< finding : [0..0] site = *",
        "< finding : [1..1] site = << limb",
        "< finding : [1..2] site = << arm",
        "< finding : [0..1] site = *",
    ]))


QF28_ORACLE = """
SELECT * FROM (VALUES
  -- card1: < finding : [2..*] site = *
  ('http://example.org/ValueSet/card1', 'multi-trauma'),
  -- card2: < finding : [0..0] site = *
  ('http://example.org/ValueSet/card2', 'fatigue'),
  -- card3: < finding : [1..1] site = << limb
  ('http://example.org/ValueSet/card3', 'arm-fracture'),
  ('http://example.org/ValueSet/card3', 'hand-burn'),
  ('http://example.org/ValueSet/card3', 'leg-sprain'),
  -- card4: < finding : [1..2] site = << arm  (multi-trauma: only site=arm matches)
  ('http://example.org/ValueSet/card4', 'arm-fracture'),
  ('http://example.org/ValueSet/card4', 'hand-burn'),
  ('http://example.org/ValueSet/card4', 'multi-trauma'),
  -- card5: < finding : [0..1] site = *
  ('http://example.org/ValueSet/card5', 'arm-fracture'),
  ('http://example.org/ValueSet/card5', 'hand-burn'),
  ('http://example.org/ValueSet/card5', 'leg-sprain'),
  ('http://example.org/ValueSet/card5', 'fatigue')
) AS t(url, code)
"""


QUERIES.append(Q("qf28_ecl_cardinality", qf28, QF28_ORACLE))


def qf29(spark, sf_dir):
    """ECL reverse attributes (fhir/terminology.py::ecl_expand
    `R attr`, r9): the focus member must be the VALUE of an assertion
    whose SOURCE satisfies the condition (literal = source-code
    equality; expression = source ∈ that set) — the same broadcast
    semi-join with the assertion roles swapped, composable with
    cardinality (`[2..*] R site` = 'site of at least two findings')."""
    return _ecl_findings2(spark, _ecl_vs_docs("rev", [
        "* : R site = << finding",
        "* : R site = multi-trauma",
        "(<< limb) : R site = (< finding : severity = high)",
        "* : [2..*] R site = < finding",
        "(<< anatomy) MINUS (* : R site = < finding)",
    ]))


QF29_ORACLE = """
SELECT * FROM (VALUES
  -- rev1: * : R site = << finding
  ('http://example.org/ValueSet/rev1', 'arm'),
  ('http://example.org/ValueSet/rev1', 'hand'),
  ('http://example.org/ValueSet/rev1', 'leg'),
  -- rev2: * : R site = multi-trauma (literal source code)
  ('http://example.org/ValueSet/rev2', 'arm'),
  ('http://example.org/ValueSet/rev2', 'leg'),
  -- rev3: (<< limb) : R site = (< finding : severity = high)
  ('http://example.org/ValueSet/rev3', 'arm'),
  ('http://example.org/ValueSet/rev3', 'leg'),
  -- rev4: * : [2..*] R site = < finding  (site of >= 2 findings)
  ('http://example.org/ValueSet/rev4', 'arm'),
  ('http://example.org/ValueSet/rev4', 'leg'),
  -- rev5: (<< anatomy) MINUS (* : R site = < finding)
  ('http://example.org/ValueSet/rev5', 'anatomy'),
  ('http://example.org/ValueSet/rev5', 'limb')
) AS t(url, code)
"""


QUERIES.append(Q("qf29_ecl_reverse", qf29, QF29_ORACLE))


# --- qf30: CodeSystem $subsumes in batch ---------------------------------------------
def qf30(spark, sf_dir):
    """Batch CodeSystem $subsumes (fhir/terminology.py::subsumes, r9
    wave 3): classify (codeA, codeB) pairs into equivalent / subsumes
    / subsumed-by / not-subsumed against the anatomy closure — two
    broadcast left joins, the pair side never shuffles. Covers every
    outcome plus unknown-code and NULL behavior."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        subsumes,
    )

    utc(spark)
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    pairs = local_df(spark, 
        [
            ("limb", "hand"),   # ancestor -> subsumes
            ("hand", "limb"),   # descendant -> subsumed-by
            ("arm", "arm"),     # same concept -> equivalent
            ("arm", "leg"),     # siblings -> not-subsumed
            ("body", "heart"),  # deep ancestor -> subsumes
            ("ghost", "arm"),   # unknown code -> not-subsumed
        ],
        "code_a string, code_b string",
    )
    return subsumes(
        pairs, closure, "http://example.org/cs/anatomy2"
    ).select("code_a", "code_b", "outcome")


QF30_ORACLE = """
SELECT * FROM (VALUES
  ('limb', 'hand', 'subsumes'),
  ('hand', 'limb', 'subsumed-by'),
  ('arm', 'arm', 'equivalent'),
  ('arm', 'leg', 'not-subsumed'),
  ('body', 'heart', 'subsumes'),
  ('ghost', 'arm', 'not-subsumed')
) AS t(code_a, code_b, outcome)
"""


QUERIES.append(Q("qf30_subsumes", qf30, QF30_ORACLE))


# --- qf31: ConceptMap group.unmapped modes -------------------------------------------
_CM_UNMAPPED_DOCS = [
    {"resourceType": "ConceptMap", "id": "cm-main", "status": "active",
     "url": "http://example.org/cm/main",
     "group": [
         {"source": "http://example.org/cs/a",
          "target": "http://example.org/cs/t",
          "element": [{"code": "x", "target": [
              {"code": "X", "display": "Big X", "equivalence": "equal"}]}],
          "unmapped": {"mode": "provided"}},
         {"source": "http://example.org/cs/b",
          "target": "http://example.org/cs/t",
          "element": [
              {"code": "y", "target": [
                  {"code": "Y", "equivalence": "equal"}]},
              # explicit CODELESS target (target.code is optional in
              # R4): equivalence 'unmatched' must survive as-is and
              # must NOT fall into the fixed-UNK fallback (r9 ADVICE)
              {"code": "n", "target": [{"equivalence": "unmatched"}]},
          ],
          "unmapped": {"mode": "fixed", "code": "UNK",
                       "display": "Unknown"}},
         {"source": "http://example.org/cs/c",
          "target": "http://example.org/cs/t",
          "element": [{"code": "z", "target": [
              {"code": "Z", "equivalence": "equal"}]}],
          "unmapped": {"mode": "other-map",
                       "url": "http://example.org/cm/fallback"}},
     ]},
    {"resourceType": "ConceptMap", "id": "cm-fallback", "status": "active",
     "url": "http://example.org/cm/fallback",
     "group": [
         {"source": "http://example.org/cs/c",
          "target": "http://example.org/cs/t2",
          "element": [{"code": "w", "target": [
              {"code": "W2", "equivalence": "wider"}]}],
          # self-referencing other-map: depth-1 resolution terminates
          "unmapped": {"mode": "other-map",
                       "url": "http://example.org/cm/fallback"}},
     ]},
]


def qf31(spark, sf_dir):
    """ConceptMap group.unmapped (fhir/terminology.py::translate_codes,
    r9): per-group fallback rules for codes with no element mapping —
    `provided` echoes the source code, `fixed` substitutes a constant,
    `other-map` re-translates through the referenced map (depth-1; the
    fallback map's self-referencing unmapped rule terminates instead
    of recursing). Unmapped-rule hits keep equivalence NULL so element
    matches stay distinguishable; the fact side never shuffles."""
    from parquet_on_fhir_spark.fhir.terminology import translate_codes

    utc(spark)
    cm = _encode_doc(spark, _CM_UNMAPPED_DOCS, "ConceptMap")
    facts = local_df(spark, 
        [
            (1, "http://example.org/cs/a", "x"),   # element match
            (2, "http://example.org/cs/a", "q"),   # provided -> q
            (3, "http://example.org/cs/b", "q"),   # fixed -> UNK
            (4, "http://example.org/cs/c", "w"),   # other-map -> W2
            (5, "http://example.org/cs/c", "v"),   # unmapped everywhere
            (6, "http://other.org", "q"),          # no group at all
            (7, "http://example.org/cs/b", "n"),   # codeless explicit target
        ],
        "row_id long, system string, code string",
    )
    out = translate_codes(
        facts, cm, "system", "code", map_url="http://example.org/cm/main"
    )
    return out.select(
        "row_id", "code", "target_system", "target_code",
        "target_display", "equivalence",
    )


QF31_ORACLE = """
SELECT * FROM (VALUES
  (1, 'x', 'http://example.org/cs/t', 'X', 'Big X', 'equal'),
  (2, 'q', 'http://example.org/cs/t', 'q', NULL, NULL),
  (3, 'q', 'http://example.org/cs/t', 'UNK', 'Unknown', NULL),
  (4, 'w', 'http://example.org/cs/t2', 'W2', NULL, 'wider'),
  (5, 'v', NULL, NULL, NULL, NULL),
  (6, 'q', NULL, NULL, NULL, NULL),
  (7, 'n', 'http://example.org/cs/t', NULL, NULL, 'unmatched')
) AS t(row_id, code, target_system, target_code, target_display, equivalence)
"""


QUERIES.append(Q("qf31_conceptmap_unmapped", qf31, QF31_ORACLE))


# --- qf32: ECL attribute groups + parenthesized AND/OR mixing -------------------------
def qf32(spark, sf_dir):
    """ECL attribute groups (fhir/terminology.py::ecl_expand
    `{ attr = value , ... }`, r10): every member refinement must be
    satisfied by assertions in the SAME relationship group — (code,
    grp) inner joins across the members' matched-assertion frames. R4
    concept.property[] carries no group ids, so assertions are
    self-grouped per the SNOMED ECL rule for ungrouped data: grp2's
    two-attribute group matches NOTHING (site/severity live on
    different assertions) while the ungrouped twin grp4 does — the
    semantic split a conjunction-only reading would miss. grp5
    exercises mixed AND/OR composition through explicit parentheses
    (the no-mixing rule applies per chain, spec-correct)."""
    return _ecl_findings2(spark, _ecl_vs_docs("grp", [
        # single-member group == plain refinement
        "< finding : { site = arm }",
        # two attrs on DIFFERENT assertions: self-grouped -> empty
        "< finding : { site = arm , severity = high }",
        # one assertion satisfies both members (wildcard attr)
        "< finding : { * = arm , site = << limb }",
        # group + ungrouped refinement conjunction
        "< finding : { site = << limb } , severity = high",
        # parenthesized mixed AND/OR + cardinality composition
        "(( < finding : severity = low ) OR ( < finding : site = arm ))"
        " AND ( < finding : [1..*] site = * )",
        # expression-valued group members
        "< finding : { site = ( << arm OR leg ) , * = << anatomy }",
    ]))


QF32_ORACLE = """
SELECT * FROM (VALUES
  -- grp1: single-member group == plain refinement
  ('http://example.org/ValueSet/grp1', 'arm-fracture'),
  ('http://example.org/ValueSet/grp1', 'multi-trauma'),
  -- grp2: { site = arm , severity = high } self-grouped -> no rows
  -- grp3: { * = arm , site = << limb } (the site=arm assertion)
  ('http://example.org/ValueSet/grp3', 'arm-fracture'),
  ('http://example.org/ValueSet/grp3', 'multi-trauma'),
  -- grp4: { site = << limb } , severity = high (ungrouped conj)
  ('http://example.org/ValueSet/grp4', 'arm-fracture'),
  ('http://example.org/ValueSet/grp4', 'multi-trauma'),
  -- grp5: (low OR site=arm) AND [1..*] site
  ('http://example.org/ValueSet/grp5', 'arm-fracture'),
  ('http://example.org/ValueSet/grp5', 'hand-burn'),
  ('http://example.org/ValueSet/grp5', 'leg-sprain'),
  ('http://example.org/ValueSet/grp5', 'multi-trauma'),
  -- grp6: { site = (<< arm OR leg) , * = << anatomy }
  ('http://example.org/ValueSet/grp6', 'arm-fracture'),
  ('http://example.org/ValueSet/grp6', 'hand-burn'),
  ('http://example.org/ValueSet/grp6', 'leg-sprain'),
  ('http://example.org/ValueSet/grp6', 'multi-trauma')
) AS t(url, code)
"""


QUERIES.append(Q("qf32_ecl_attribute_groups", qf32, QF32_ORACLE))


# --- qf33: incremental closure maintenance ($closure operation pattern) ---------------
_CS_CLOSURE_V1_DOC = {
    "resourceType": "CodeSystem", "id": "cs-clo", "status": "active",
    "url": "http://example.org/cs/clo", "content": "complete",
    "version": "1",
    "concept": [
        {"code": "root", "concept": [
            {"code": "a", "concept": [{"code": "c"}]},
            {"code": "b"}]},
    ],
}
_CS_CLOSURE_V2_DOC = {
    "resourceType": "CodeSystem", "id": "cs-clo", "status": "active",
    "url": "http://example.org/cs/clo", "content": "complete",
    "version": "2",
    "concept": [
        {"code": "root", "concept": [
            {"code": "a", "concept": [
                {"code": "c", "concept": [
                    {"code": "d", "concept": [{"code": "f"}]}]}]},
            {"code": "b", "concept": [{"code": "e"}]}]},
    ],
}


def qf33(spark, sf_dir):
    """Incremental closure maintenance (fhir/terminology.py::
    closure_delta — the ConceptMap $closure operation pattern, r10):
    version 2 of a CodeSystem adds concepts d/e/f under the registered
    version-1 hierarchy; the delta returns ONLY the new subsumption
    pairs, computed by bridging the new edges through the OLD closure
    and path-doubling the bridged frame — never re-closing the old
    graph (the nightly-SNOMED-increment shape). New edges are detected
    as edges(v2) anti-join edges(v1)."""
    from parquet_on_fhir_spark.fhir.terminology import (
        closure_delta,
        concept_closure,
        concept_edges,
    )

    utc(spark)
    e1 = concept_edges(_encode_doc(spark, _CS_CLOSURE_V1_DOC, "CodeSystem"))
    e2 = concept_edges(_encode_doc(spark, _CS_CLOSURE_V2_DOC, "CodeSystem"))
    old = concept_closure(e1)
    new_edges = e2.join(e1, ["system", "parent", "child"], "left_anti")
    return closure_delta(old, new_edges).select("ancestor", "descendant")


QF33_ORACLE = """
SELECT * FROM (VALUES
  -- new concepts d (under c), e (under b), f (under d):
  ('root', 'd'), ('root', 'e'), ('root', 'f'),
  ('a', 'd'), ('a', 'f'),
  ('c', 'd'), ('c', 'f'),
  ('d', 'f'),
  ('b', 'e')
) AS t(ancestor, descendant)
"""


QUERIES.append(Q("qf33_closure_delta", qf33, QF33_ORACLE))


# --- qf34: reverse $translate ----------------------------------------------------------
def qf34(spark, sf_dir):
    """Reverse $translate (fhir/terminology.py::translate_codes
    reverse=True, r10 — the operation's ``reverse`` parameter): LOINC
    facts matched against element.target.code, the element side
    returned as the translation ("what maps TO this code"); 85354-9
    comes back from bp-dia's 'wider' forward mapping with the
    equivalence AS STATED, unknown/foreign-system codes fall through
    with NULLs, and group.unmapped (a forward-direction rule) does not
    fire. Same broadcast join shape as forward, roles swapped."""
    from parquet_on_fhir_spark.fhir.terminology import translate_codes

    utc(spark)
    cm = _encode_doc(spark, _CM_DOC, "ConceptMap")
    facts = local_df(spark, 
        [
            (1, "http://loinc.org", "8480-6"),
            (2, "http://loinc.org", "8462-4"),
            (3, "http://loinc.org", "85354-9"),
            (4, "http://loinc.org", "9999-9"),
            (5, "http://example.org/cs/local", "bp-sys"),
        ],
        "row_id long, system string, code string",
    )
    return translate_codes(
        facts, cm, "system", "code", reverse=True
    ).select("row_id", "code", "target_system", "target_code", "equivalence")


QF34_ORACLE = """
SELECT * FROM (VALUES
  (1, '8480-6', 'http://example.org/cs/local', 'bp-sys', 'equivalent'),
  (2, '8462-4', 'http://example.org/cs/local', 'bp-dia', 'equivalent'),
  (3, '85354-9', 'http://example.org/cs/local', 'bp-dia', 'wider'),
  (4, '9999-9', NULL, NULL, NULL),
  (5, 'bp-sys', NULL, NULL, NULL)
) AS t(row_id, code, target_system, target_code, equivalence)
"""


QUERIES.append(Q("qf34_translate_reverse", qf34, QF34_ORACLE))


# --- qf35: ECL child-of/parent-of + term annotations ------------------------------------
def qf35(spark, sf_dir):
    """ECL immediate-hierarchy operators and term annotations
    (fhir/terminology.py::_ecl_parse + ecl_expand, r10): `<!` children
    and `>!` parents evaluate against the DIRECT is-a edge frame
    (derived lazily from the CodeSystem — the closure cannot recover
    direct edges), and `|display term|` annotations are documentation
    stripped before lexing (unpaired '|' still refuses). Composes
    with closure prefixes, set ops and refinements."""
    return _ecl_findings2(spark, _ecl_vs_docs("chp", [
        "<! limb",
        ">! hand |Hand structure|",
        "( <! finding ) : severity = high |High severity|",
        "<< limb |Limb structure| MINUS <! limb",
        "<! arm OR >! leg",
    ]))


QF35_ORACLE = """
SELECT * FROM (VALUES
  -- chp1: <! limb (direct children)
  ('http://example.org/ValueSet/chp1', 'arm'),
  ('http://example.org/ValueSet/chp1', 'leg'),
  -- chp2: >! hand (direct parents)
  ('http://example.org/ValueSet/chp2', 'arm'),
  -- chp3: (<! finding) : severity = high
  ('http://example.org/ValueSet/chp3', 'arm-fracture'),
  ('http://example.org/ValueSet/chp3', 'multi-trauma'),
  -- chp4: << limb MINUS <! limb
  ('http://example.org/ValueSet/chp4', 'limb'),
  ('http://example.org/ValueSet/chp4', 'hand'),
  -- chp5: <! arm OR >! leg
  ('http://example.org/ValueSet/chp5', 'hand'),
  ('http://example.org/ValueSet/chp5', 'limb')
) AS t(url, code)
"""


QUERIES.append(Q("qf35_ecl_children_terms", qf35, QF35_ORACLE))


# --- qf36: ValueSet-by-reference composition --------------------------------------------
_VS_REF_DOCS = [
    {"resourceType": "ValueSet", "id": "vr1", "status": "active",
     "url": "http://example.org/ValueSet/ref1",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy",
          "concept": [{"code": "arm"}, {"code": "hand"}, {"code": "leg"}]}]}},
    {"resourceType": "ValueSet", "id": "vr2", "status": "active",
     "url": "http://example.org/ValueSet/ref2",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy",
          "concept": [{"code": "hand"}, {"code": "leg"}, {"code": "foot"}]}]}},
    # intersection of two referenced sets
    {"resourceType": "ValueSet", "id": "vr3", "status": "active",
     "url": "http://example.org/ValueSet/ref3",
     "compose": {"include": [
         {"valueSet": ["http://example.org/ValueSet/ref1",
                       "http://example.org/ValueSet/ref2"]}]}},
    # reference-include unioned with a listed include
    {"resourceType": "ValueSet", "id": "vr4", "status": "active",
     "url": "http://example.org/ValueSet/ref4",
     "compose": {"include": [
         {"valueSet": ["http://example.org/ValueSet/ref2"]},
         {"system": "http://example.org/cs/anatomy",
          "concept": [{"code": "heart"}]}]}},
    # whole-system include minus a referenced set
    {"resourceType": "ValueSet", "id": "vr5", "status": "active",
     "url": "http://example.org/ValueSet/ref5",
     "compose": {"include": [{"system": "http://example.org/cs/anatomy"}],
                 "exclude": [{"valueSet": ["http://example.org/ValueSet/ref1"]}]}},
]


def qf36(spark, sf_dir):
    """ValueSet-by-reference composition (fhir/terminology.py::
    expand_valueset, r10): compose.include.valueSet — an include of
    canonical references contributes the INTERSECTION of the
    referenced expansions (spec: codes must be in all referenced value
    sets), unioned with the other includes; exclude.valueSet
    anti-joins a referenced expansion. References resolve against the
    same ValueSet table to any depth since r11 (qf38 covers nesting;
    cycles raise ValueError)."""
    from parquet_on_fhir_spark.fhir.terminology import expand_valueset

    utc(spark)
    vs = _encode_doc(spark, _VS_REF_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_DOC, "CodeSystem")
    out = expand_valueset(vs, cs)
    return out.filter(
        F.col("url").isin(
            "http://example.org/ValueSet/ref3",
            "http://example.org/ValueSet/ref4",
            "http://example.org/ValueSet/ref5",
        )
    ).select("url", "code")


QF36_ORACLE = """
SELECT * FROM (VALUES
  -- ref3: ref1 ∩ ref2
  ('http://example.org/ValueSet/ref3', 'hand'),
  ('http://example.org/ValueSet/ref3', 'leg'),
  -- ref4: ref2 ∪ {heart}
  ('http://example.org/ValueSet/ref4', 'hand'),
  ('http://example.org/ValueSet/ref4', 'leg'),
  ('http://example.org/ValueSet/ref4', 'foot'),
  ('http://example.org/ValueSet/ref4', 'heart'),
  -- ref5: whole anatomy system minus ref1
  ('http://example.org/ValueSet/ref5', 'body'),
  ('http://example.org/ValueSet/ref5', 'limb'),
  ('http://example.org/ValueSet/ref5', 'foot'),
  ('http://example.org/ValueSet/ref5', 'organ'),
  ('http://example.org/ValueSet/ref5', 'heart')
) AS t(url, code)
"""


QUERIES.append(Q("qf36_valueset_references", qf36, QF36_ORACLE))


# --- qf37: batch CodeSystem $lookup ------------------------------------------------------
def qf37(spark, sf_dir):
    """Batch $lookup (fhir/terminology.py::lookup_codes, r10): display
    + property assertions for every fact (system, code) pair via two
    terminology-sized broadcasts — found is a join-match witness (the
    translate_codes r9 lesson), rows multiply per property assertion,
    unknown codes and foreign systems come back found=false with one
    row."""
    from parquet_on_fhir_spark.fhir.terminology import lookup_codes

    utc(spark)
    cs = _encode_doc(spark, _CS_FINDINGS2_DOC, "CodeSystem")
    facts = local_df(spark, 
        [
            (1, "http://example.org/cs/findings2", "arm-fracture"),
            (2, "http://example.org/cs/findings2", "multi-trauma"),
            (3, "http://example.org/cs/findings2", "anatomy"),
            (4, "http://example.org/cs/findings2", "nope"),
            (5, "http://other.org", "arm-fracture"),
        ],
        "row_id long, system string, code string",
    )
    return lookup_codes(facts, cs, "system", "code").select(
        "row_id", "code", "found", "display", "prop", "pval"
    )


QF37_ORACLE = """
SELECT * FROM (VALUES
  (1, 'arm-fracture', true, 'Arm fracture', 'site', 'arm'),
  (1, 'arm-fracture', true, 'Arm fracture', 'severity', 'high'),
  (2, 'multi-trauma', true, 'Multiple trauma', 'site', 'arm'),
  (2, 'multi-trauma', true, 'Multiple trauma', 'site', 'leg'),
  (2, 'multi-trauma', true, 'Multiple trauma', 'severity', 'high'),
  (3, 'anatomy', true, 'Anatomy', NULL, NULL),
  (4, 'nope', false, NULL, NULL, NULL),
  (5, 'arm-fracture', false, NULL, NULL, NULL)
) AS t(row_id, code, found, display, prop, pval)
"""


QUERIES.append(Q("qf37_lookup", qf37, QF37_ORACLE))


# --- qf38: depth-N ValueSet references + mixed-include conjunction ----------------------
_VS_NESTED_DOCS = [
    {"resourceType": "ValueSet", "id": "nr1", "status": "active",
     "url": "http://example.org/ValueSet/nr1",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy",
          "concept": [{"code": "arm"}, {"code": "hand"},
                      {"code": "leg"}, {"code": "foot"}]}]}},
    {"resourceType": "ValueSet", "id": "nr2", "status": "active",
     "url": "http://example.org/ValueSet/nr2",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy",
          "concept": [{"code": "hand"}, {"code": "foot"},
                      {"code": "heart"}]}]}},
    # depth 1: intersection of two leaf references
    {"resourceType": "ValueSet", "id": "nr3", "status": "active",
     "url": "http://example.org/ValueSet/nr3",
     "compose": {"include": [
         {"valueSet": ["http://example.org/ValueSet/nr1",
                       "http://example.org/ValueSet/nr2"]}]}},
    # depth 2: references a ValueSet that itself references (plus a
    # listed include with a code outside the CodeSystem — enumerated
    # includes are authoritative, so 'ghost' survives HERE...)
    {"resourceType": "ValueSet", "id": "nr4", "status": "active",
     "url": "http://example.org/ValueSet/nr4",
     "compose": {"include": [
         {"valueSet": ["http://example.org/ValueSet/nr3"]},
         {"system": "http://example.org/cs/anatomy",
          "concept": [{"code": "organ"}, {"code": "ghost"}]}]}},
    # depth 3 + MIXED include: whole-system ∩ referenced expansion
    # (...and is dropped here, because the system side cannot
    # enumerate it)
    {"resourceType": "ValueSet", "id": "nr5", "status": "active",
     "url": "http://example.org/ValueSet/nr5",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy",
          "valueSet": ["http://example.org/ValueSet/nr4"]}]}},
    # mixed include: hierarchy filter ∩ reference
    {"resourceType": "ValueSet", "id": "nr6", "status": "active",
     "url": "http://example.org/ValueSet/nr6",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy",
          "filter": [{"property": "concept", "op": "is-a",
                      "value": "limb"}],
          "valueSet": ["http://example.org/ValueSet/nr1"]}]}},
    # exclude referencing a REFERENCE-BEARING ValueSet (depth-2
    # resolution through the exclude side)
    {"resourceType": "ValueSet", "id": "nr7", "status": "active",
     "url": "http://example.org/ValueSet/nr7",
     "compose": {"include": [{"system": "http://example.org/cs/anatomy"}],
                 "exclude": [
                     {"valueSet": ["http://example.org/ValueSet/nr3"]}]}},
    # mixed include: listed concepts ∩ reference
    {"resourceType": "ValueSet", "id": "nr8", "status": "active",
     "url": "http://example.org/ValueSet/nr8",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy",
          "concept": [{"code": "arm"}, {"code": "heart"}],
          "valueSet": ["http://example.org/ValueSet/nr1"]}]}},
]


def qf38(spark, sf_dir):
    """Depth-N ValueSet-by-reference composition + mixed includes
    (fhir/terminology.py::expand_valueset, r11 — the r10 verdict's
    task 4): nr5 resolves a 3-deep reference chain (nr5 → nr4 → nr3 →
    nr1/nr2) via driver-side topological strata with a cycle guard
    (cycles raise ValueError); an include MIXING valueSet references
    with system/concept/filter applies the spec's conjunction — the
    system-side selection intersected with every referenced expansion
    (hl7.org/fhir/R4/valueset-definitions.html compose.include.
    valueSet) — covering whole-system (nr5), is-a-filter (nr6) and
    listed-concept (nr8) system sides; nr7 resolves a reference-bearing
    ValueSet through the EXCLUDE side. Each stratum is one table-level
    expansion over broadcast terminology frames; lineage is cut per
    stratum so a depth-k chain stays k plans."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_NESTED_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    out = expand_valueset(vs, cs, closure=closure)
    return out.filter(
        F.col("url").isin(
            *[f"http://example.org/ValueSet/nr{i}" for i in range(4, 9)]
        )
    ).select("url", "code")


QF38_ORACLE = """
SELECT * FROM (VALUES
  -- nr4 (depth 2): (nr1 ∩ nr2) ∪ {organ, ghost} — listed includes are
  -- authoritative, so the CodeSystem-less 'ghost' survives
  ('http://example.org/ValueSet/nr4', 'hand'),
  ('http://example.org/ValueSet/nr4', 'foot'),
  ('http://example.org/ValueSet/nr4', 'organ'),
  ('http://example.org/ValueSet/nr4', 'ghost'),
  -- nr5 (depth 3, mixed whole-system ∩ nr4): ghost is not enumerable
  -- from the system side, so it drops
  ('http://example.org/ValueSet/nr5', 'hand'),
  ('http://example.org/ValueSet/nr5', 'foot'),
  ('http://example.org/ValueSet/nr5', 'organ'),
  -- nr6 (is-a limb ∩ nr1)
  ('http://example.org/ValueSet/nr6', 'arm'),
  ('http://example.org/ValueSet/nr6', 'hand'),
  ('http://example.org/ValueSet/nr6', 'leg'),
  ('http://example.org/ValueSet/nr6', 'foot'),
  -- nr7 (whole system minus referenced nr3 = {hand, foot})
  ('http://example.org/ValueSet/nr7', 'body'),
  ('http://example.org/ValueSet/nr7', 'limb'),
  ('http://example.org/ValueSet/nr7', 'arm'),
  ('http://example.org/ValueSet/nr7', 'leg'),
  ('http://example.org/ValueSet/nr7', 'organ'),
  ('http://example.org/ValueSet/nr7', 'heart'),
  -- nr8 (listed {arm, heart} ∩ nr1)
  ('http://example.org/ValueSet/nr8', 'arm')
) AS t(url, code)
"""


QUERIES.append(Q("qf38_valueset_nested_refs", qf38, QF38_ORACLE))


# --- qf39: ECL remainder — prefixed wildcards + card/reverse inside groups ---------------
def qf39(spark, sf_dir):
    """ECL grammar remainder (fhir/terminology.py::ecl_expand, r11 —
    the r10 verdict's task 5): prefixed wildcards evaluate the
    hierarchy with an unconstrained anchor ('< *' = concepts with any
    ancestor, '>! *' = concepts with a direct child, '<< *' = the
    universe — terminology-sized closure/edge projections); REVERSE
    flags inside attribute groups bind the focus to the assertion's
    VALUE side of the same-group join; and within-group CARDINALITY
    counts matching assertions per group — under R4's self-grouped
    properties each group holds one assertion, so '{ [0..0] site =
    arm }' keeps focus concepts having ANY non-site-arm assertion
    (wc4: all five findings) while the UNGROUPED '[0..0] site = arm'
    (wc5) keeps only those with no site=arm assertion at all — the
    semantic split that proves the group universe is per-assertion."""
    return _ecl_findings2(spark, _ecl_vs_docs("wc", [
        # prefixed wildcards
        "< *",
        ">! *",
        "( << * ) MINUS ( < finding )",
        # within-group [0..0] vs ungrouped [0..0]
        "< finding : { [0..0] site = arm }",
        "< finding : [0..0] site = arm",
        # group-internal card + plain member: one assertion that is
        # severity=low (and trivially not site=arm)
        "< finding : { [0..0] site = arm , severity = low }",
        # reverse inside a group: anatomy codes appearing as the site
        # VALUE of a finding's assertion
        "< anatomy : { R site = << finding }",
        # group card over an expression value + wildcard composition
        "( < finding : { [1..*] site = << limb } ) AND ( < * )",
    ]))


QF39_ORACLE = """
SELECT * FROM (VALUES
  -- wc1: '< *' — every concept with an ancestor (non-roots)
  ('http://example.org/ValueSet/wc1', 'limb'),
  ('http://example.org/ValueSet/wc1', 'arm'),
  ('http://example.org/ValueSet/wc1', 'hand'),
  ('http://example.org/ValueSet/wc1', 'leg'),
  ('http://example.org/ValueSet/wc1', 'arm-fracture'),
  ('http://example.org/ValueSet/wc1', 'hand-burn'),
  ('http://example.org/ValueSet/wc1', 'leg-sprain'),
  ('http://example.org/ValueSet/wc1', 'multi-trauma'),
  ('http://example.org/ValueSet/wc1', 'fatigue'),
  -- wc2: '>! *' — concepts with a direct child
  ('http://example.org/ValueSet/wc2', 'anatomy'),
  ('http://example.org/ValueSet/wc2', 'limb'),
  ('http://example.org/ValueSet/wc2', 'arm'),
  ('http://example.org/ValueSet/wc2', 'finding'),
  -- wc3: universe minus finding-descendants
  ('http://example.org/ValueSet/wc3', 'anatomy'),
  ('http://example.org/ValueSet/wc3', 'limb'),
  ('http://example.org/ValueSet/wc3', 'arm'),
  ('http://example.org/ValueSet/wc3', 'hand'),
  ('http://example.org/ValueSet/wc3', 'leg'),
  ('http://example.org/ValueSet/wc3', 'finding'),
  -- wc4: within-group [0..0] — any assertion that is not site=arm
  ('http://example.org/ValueSet/wc4', 'arm-fracture'),
  ('http://example.org/ValueSet/wc4', 'hand-burn'),
  ('http://example.org/ValueSet/wc4', 'leg-sprain'),
  ('http://example.org/ValueSet/wc4', 'multi-trauma'),
  ('http://example.org/ValueSet/wc4', 'fatigue'),
  -- wc5: ungrouped [0..0] — NO site=arm assertion at all
  ('http://example.org/ValueSet/wc5', 'hand-burn'),
  ('http://example.org/ValueSet/wc5', 'leg-sprain'),
  ('http://example.org/ValueSet/wc5', 'fatigue'),
  -- wc6: a severity=low assertion that is not site=arm
  ('http://example.org/ValueSet/wc6', 'hand-burn'),
  ('http://example.org/ValueSet/wc6', 'leg-sprain'),
  ('http://example.org/ValueSet/wc6', 'fatigue'),
  -- wc7: reverse-in-group — site values of finding assertions
  ('http://example.org/ValueSet/wc7', 'arm'),
  ('http://example.org/ValueSet/wc7', 'hand'),
  ('http://example.org/ValueSet/wc7', 'leg'),
  -- wc8: group card [1..*] over << limb sites, ∩ non-roots
  ('http://example.org/ValueSet/wc8', 'arm-fracture'),
  ('http://example.org/ValueSet/wc8', 'hand-burn'),
  ('http://example.org/ValueSet/wc8', 'leg-sprain'),
  ('http://example.org/ValueSet/wc8', 'multi-trauma')
) AS t(url, code)
"""


QUERIES.append(Q("qf39_ecl_wildcard_group_flags", qf39, QF39_ORACLE))


# --- qf40: $validate-code over the sf-scaled fact table ----------------------------------
_QF40_CODES = [
    "hand", "body", "ghost", "heart", "limb",
    "organ", "arm", "leg", "foot", "root",
]


def qf40(spark, sf_dir):
    """Batch $validate-code over a FACT-SCALED code column (fhir/
    terminology.py::validate_codes, r11 — the r10 verdict's task 6):
    every events row derives a deterministic (system, code) pair, the
    preds ValueSet (regex + in-list + is-a∩property includes) expands
    ONCE, and membership is a BROADCAST left join against the fact
    side — the events table is never shuffled; the only exchange is
    the final ~20-group count aggregate. Unlike qf23/qf25 (fixture-
    sized at any sf), this line's cost moves with sf, so the bench can
    see a terminology-join regression against data growth."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        validate_codes,
    )
    from parquet_on_fhir_spark.suite.common import t

    utc(spark)
    vs = _encode_doc(spark, _VS_FILTER_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    facts = t(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.col("event_id") % 7 == 0,
            F.lit("http://example.org/cs/other"),
        )
        .otherwise(F.lit("http://example.org/cs/anatomy2"))
        .alias("system"),
        F.element_at(
            F.array(*[F.lit(c) for c in _QF40_CODES]),
            (F.col("event_id") % 10).cast("int") + 1,
        ).alias("code"),
    )
    out = validate_codes(
        facts,
        vs,
        "system",
        "code",
        "http://example.org/ValueSet/preds",
        codesystems=cs,
        closure=closure,
    )
    return out.groupBy("system", "code", "in_valueset", "display").agg(
        F.count("*").cast("long").alias("n")
    )


# preds members (computed once in qf25's docstring): regex h.* →
# {hand, heart}; in-list → {arm, leg}; is-a limb ∩ status=active →
# {limb, arm, leg, foot}; union = {hand, heart, arm, leg, limb, foot}
QF40_ORACLE = """
WITH f AS (
  SELECT CASE WHEN event_id % 7 = 0 THEN 'http://example.org/cs/other'
              ELSE 'http://example.org/cs/anatomy2' END AS system,
         list_extract(
           ['hand','body','ghost','heart','limb',
            'organ','arm','leg','foot','root'],
           CAST(event_id % 10 AS INT) + 1) AS code
  FROM events
),
m AS (
  SELECT *,
         (system = 'http://example.org/cs/anatomy2'
          AND code IN ('hand','heart','arm','leg','limb','foot'))
           AS in_valueset
  FROM f
)
SELECT system, code, in_valueset,
       CASE WHEN in_valueset
            THEN upper(substring(code, 1, 1)) || substring(code, 2)
            ELSE NULL END AS display,
       CAST(count(*) AS BIGINT) AS n
FROM m
GROUP BY 1, 2, 3, 4
"""


QUERIES.append(Q("qf40_validate_code_facts", qf40, QF40_ORACLE))


# --- qf41: nested ECL member-of (depth-N ^ chains) ---------------------------------------
_VS_MEMBER_NESTED_DOCS = _VS_MEMBER_DOCS + [
    # ^ through a refset whose OWN ECL uses ^ (refused before r11)
    {"resourceType": "ValueSet", "id": "vs-m4", "status": "active",
     "url": "http://example.org/ValueSet/m4",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "constraint", "op": "=",
                      "value": "(^ vs-m2) MINUS (^ vs-m1)"}]},
     ]}},
    # depth 3: m5 -> m4 -> m2 -> m1
    {"resourceType": "ValueSet", "id": "vs-m5", "status": "active",
     "url": "http://example.org/ValueSet/m5",
     "compose": {"include": [
         {"system": "http://example.org/cs/anatomy2",
          "filter": [{"property": "constraint", "op": "=",
                      "value": "(^ vs-m4) OR (^ vs-m3)"}]},
     ]}},
]


def qf41(spark, sf_dir):
    """Nested ECL member-of (fhir/terminology.py::ecl_expand, r11): a
    `^ refset` whose referenced ValueSet's own ECL uses `^` resolves
    RECURSIVELY — vs-m4's constraint subtracts one refset expansion
    from another nested one, and vs-m5 chains three levels deep
    (m5 → m4 → m2 → m1). The `_ecl_stack` cycle guard carries every
    refset id/url on the ^-path, so circular chains (even mixing id-
    and url-form references) raise ValueError instead of recursing;
    the refset's own ^ and compose references resolve against the
    FULL table via the `_context` seam, not the filtered slice."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _VS_MEMBER_NESTED_DOCS, "ValueSet")
    cs = _encode_doc(spark, _CS_ANATOMY_PROPS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return (
        expand_valueset(vs, cs, closure=closure)
        .filter(
            F.col("url").isin(
                "http://example.org/ValueSet/m4",
                "http://example.org/ValueSet/m5",
            )
        )
        .select("url", "code")
    )


QF41_ORACLE = """
SELECT * FROM (VALUES
  -- m4: (^ m2) MINUS (^ m1) = {arm,heart,hand} - {arm,heart}
  ('http://example.org/ValueSet/m4', 'hand'),
  -- m5: (^ m4) OR (^ m3) = {hand} ∪ {limb,hand,leg,foot}
  ('http://example.org/ValueSet/m5', 'hand'),
  ('http://example.org/ValueSet/m5', 'limb'),
  ('http://example.org/ValueSet/m5', 'leg'),
  ('http://example.org/ValueSet/m5', 'foot')
) AS t(url, code)
"""


QUERIES.append(Q("qf41_ecl_member_of_nested", qf41, QF41_ORACLE))


# --- qf42: ECL expression-valued attribute names (attribute hierarchy) -------------------
_CS_FINDINGS3_DOC = {
    "resourceType": "CodeSystem", "id": "cs-findings3", "status": "active",
    "url": "http://example.org/cs/findings3", "content": "complete",
    "concept": [
        # the property CODES are themselves concepts under 'attribute'
        # — the SNOMED attribute-hierarchy arrangement
        {"code": "attribute", "concept": [
            {"code": "site"}, {"code": "severity"}]},
        {"code": "anatomy", "concept": [
            {"code": "limb", "concept": [
                {"code": "arm"}, {"code": "leg"}]}]},
        {"code": "finding", "concept": [
            {"code": "arm-fracture", "property": [
                {"code": "site", "valueCode": "arm"},
                {"code": "severity", "valueCode": "high"}]},
            {"code": "leg-sprain", "property": [
                {"code": "site", "valueCode": "leg"},
                {"code": "severity", "valueCode": "low"}]},
            {"code": "fatigue", "property": [
                {"code": "severity", "valueCode": "low"}]}]},
    ],
}


def qf42(spark, sf_dir):
    """ECL expression-valued attribute NAMES (fhir/terminology.py::
    ecl_expand, r11 — the SNOMED attribute-hierarchy form): the
    attribute slot of a refinement may be any sub-expression —
    `( < attribute ) = arm` matches assertions whose property CODE
    lies in the evaluated concept set, via one broadcast semi-join on
    the assertion table's prop column. Works in plain refinements,
    inside attribute groups, and under the reverse flag; the findings3
    fixture models property codes as concepts under an 'attribute'
    parent, so hierarchy prefixes select attribute sets."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    ecls = [
        "< finding : ( < attribute ) = arm",
        "< finding : ( <! attribute ) = << limb",
        "< finding : ( < attribute ) = low",
        "< finding : { ( << attribute ) = leg }",
        "< anatomy : { R ( < attribute ) = ( < finding ) }",
    ]
    docs = [
        {"resourceType": "ValueSet", "id": f"vs-ax{i}", "status": "active",
         "url": f"http://example.org/ValueSet/ax{i}",
         "compose": {"include": [
             {"system": "http://example.org/cs/findings3",
              "filter": [{"property": "constraint", "op": "=",
                          "value": ecl}]}]}}
        for i, ecl in enumerate(ecls, start=1)
    ]
    vs = _encode_doc(spark, docs, "ValueSet")
    cs = _encode_doc(spark, _CS_FINDINGS3_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select("url", "code")


QF42_ORACLE = """
SELECT * FROM (VALUES
  -- ax1: any attribute under 'attribute' valued arm
  ('http://example.org/ValueSet/ax1', 'arm-fracture'),
  -- ax2: direct children of 'attribute', value in << limb
  ('http://example.org/ValueSet/ax2', 'arm-fracture'),
  ('http://example.org/ValueSet/ax2', 'leg-sprain'),
  -- ax3: any attribute valued low
  ('http://example.org/ValueSet/ax3', 'leg-sprain'),
  ('http://example.org/ValueSet/ax3', 'fatigue'),
  -- ax4: group with expression attribute, value leg
  ('http://example.org/ValueSet/ax4', 'leg-sprain'),
  -- ax5: reverse expression attribute — anatomy codes appearing as
  -- any attribute VALUE of a finding
  ('http://example.org/ValueSet/ax5', 'arm'),
  ('http://example.org/ValueSet/ax5', 'leg')
) AS t(url, code)
"""


QUERIES.append(Q("qf42_ecl_attribute_expressions", qf42, QF42_ORACLE))


# --- qf43: ECL comparison operators (!=, numeric concrete values) ------------------------
_CS_MEDS_DOC = {
    "resourceType": "CodeSystem", "id": "cs-meds", "status": "active",
    "url": "http://example.org/cs/meds", "content": "complete",
    "concept": [
        # numeric-valued 'strength' properties (valueDecimal) drive the
        # '#'-literal comparisons; concept-valued 'form' drives != and
        # reverse refinements (tablet/capsule are concepts under
        # form-kind)
        {"code": "drug", "display": "Drug", "concept": [
            {"code": "amoxicillin-250", "property": [
                {"code": "strength", "valueDecimal": 250},
                {"code": "form", "valueCode": "tablet"}]},
            {"code": "amoxicillin-500", "property": [
                {"code": "strength", "valueDecimal": 500},
                {"code": "form", "valueCode": "capsule"}]},
            {"code": "ibuprofen-200", "property": [
                {"code": "strength", "valueDecimal": 200},
                {"code": "form", "valueCode": "tablet"}]},
            {"code": "ibuprofen-400-plus", "property": [
                {"code": "strength", "valueDecimal": 400},
                {"code": "strength", "valueDecimal": 100},
                {"code": "form", "valueCode": "tablet"}]},
            {"code": "placebo", "property": [
                {"code": "form", "valueCode": "tablet"}]}]},
        {"code": "form-kind", "concept": [
            {"code": "tablet"}, {"code": "capsule"}]},
    ],
}


def qf43(spark, sf_dir):
    """ECL refinement comparison operators (fhir/terminology.py::
    ecl_expand, r12 — the r11 verdict's task 4): '!=' on concept
    values (literal inequality / broadcast anti-join for expression
    values; NULL-valued assertions never match), numeric concrete
    values ('#'-prefixed literals with = != < <= > >=, compared via
    try_cast to double so non-numeric property values never match),
    their composition with cardinality ('[0..0] strength > #300' =
    must-not-have) and attribute groups (cmp7 requires ONE assertion
    inside [150, 300] — ibuprofen-400-plus fails with assertions at
    400 and 100 — while the ungrouped twin cmp8 admits different
    assertions per side and keeps it), and the previously-refused
    in-group cardinality+reverse combination (cmp10: a [0..0] reverse
    member is an anti-constraint on the positive joint; cmp11: with no
    positive member it becomes a per-focus excluded-group count
    against the total group count — never a cross product)."""
    return _ecl_meds(spark, _ecl_vs_docs_for(
        "http://example.org/cs/meds", "cmp", [
            "< drug : strength >= #250",
            "< drug : strength < #250",
            "< drug : strength != #250",
            "< drug : form != tablet",
            "< drug : form != ( << capsule )",
            "< drug : [0..0] strength > #300",
            "< drug : { strength >= #150 , strength <= #300 }",
            "< drug : strength >= #150 , strength <= #300",
            "< form-kind : [2..*] R form = ( < drug : strength >= #250 )",
            "< form-kind : { [1..1] R form = ( << drug ) , "
            "[0..0] R form = ( << drug : strength >= #500 ) }",
            "< form-kind : { [0..0] R form = ( << drug : strength >= #500 ) }",
        ]))


def _ecl_vs_docs_for(system, tag, ecls):
    return [
        {"resourceType": "ValueSet", "id": f"vs-{tag}{i}", "status": "active",
         "url": f"http://example.org/ValueSet/{tag}{i}",
         "compose": {"include": [
             {"system": system,
              "filter": [{"property": "constraint", "op": "=",
                          "value": ecl}]},
         ]}}
        for i, ecl in enumerate(ecls, start=1)
    ]


def _ecl_meds(spark, vs_docs):
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, vs_docs, "ValueSet")
    cs = _encode_doc(spark, _CS_MEDS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select("url", "code")


QF43_ORACLE = """
SELECT * FROM (VALUES
  -- cmp1: strength >= 250
  ('http://example.org/ValueSet/cmp1', 'amoxicillin-250'),
  ('http://example.org/ValueSet/cmp1', 'amoxicillin-500'),
  ('http://example.org/ValueSet/cmp1', 'ibuprofen-400-plus'),
  -- cmp2: strength < 250
  ('http://example.org/ValueSet/cmp2', 'ibuprofen-200'),
  ('http://example.org/ValueSet/cmp2', 'ibuprofen-400-plus'),
  -- cmp3: a strength assertion != 250
  ('http://example.org/ValueSet/cmp3', 'amoxicillin-500'),
  ('http://example.org/ValueSet/cmp3', 'ibuprofen-200'),
  ('http://example.org/ValueSet/cmp3', 'ibuprofen-400-plus'),
  -- cmp4: form != tablet (literal)
  ('http://example.org/ValueSet/cmp4', 'amoxicillin-500'),
  -- cmp5: form != (<< capsule) (expression anti-join)
  ('http://example.org/ValueSet/cmp5', 'amoxicillin-250'),
  ('http://example.org/ValueSet/cmp5', 'ibuprofen-200'),
  ('http://example.org/ValueSet/cmp5', 'ibuprofen-400-plus'),
  ('http://example.org/ValueSet/cmp5', 'placebo'),
  -- cmp6: [0..0] strength > 300 (no high-strength assertion)
  ('http://example.org/ValueSet/cmp6', 'amoxicillin-250'),
  ('http://example.org/ValueSet/cmp6', 'ibuprofen-200'),
  ('http://example.org/ValueSet/cmp6', 'placebo'),
  -- cmp7: ONE assertion inside [150, 300]
  ('http://example.org/ValueSet/cmp7', 'amoxicillin-250'),
  ('http://example.org/ValueSet/cmp7', 'ibuprofen-200'),
  -- cmp8: ungrouped twin — different assertions per side allowed
  ('http://example.org/ValueSet/cmp8', 'amoxicillin-250'),
  ('http://example.org/ValueSet/cmp8', 'ibuprofen-200'),
  ('http://example.org/ValueSet/cmp8', 'ibuprofen-400-plus'),
  -- cmp9: >= 2 reverse form matches from strength>=250 drugs
  ('http://example.org/ValueSet/cmp9', 'tablet'),
  -- cmp10: positive reverse member minus [0..0] reverse member
  ('http://example.org/ValueSet/cmp10', 'tablet'),
  -- cmp11: [0..0]-only group — excluded-group count < total groups
  ('http://example.org/ValueSet/cmp11', 'tablet'),
  ('http://example.org/ValueSet/cmp11', 'capsule')
) AS t(url, code)
"""


QUERIES.append(Q("qf43_ecl_comparisons", qf43, QF43_ORACLE))


# --- qf44: ValueSet $expand paging (count/offset/filter + total) --------------------------
def qf44(spark, sf_dir):
    """ValueSet $expand operation parameters (fhir/terminology.py::
    expand_operation, r12 — the r11 verdict's task 6; R4
    valueset-operation-expand.html): the expansion gets a
    deterministic (system, code) total order per url, each row carries
    the R4 expansion.total/.offset response fields plus its global
    rank rn, and count/offset window the pages — p1/p2/p3 walk the
    9-concept whole-system meds expansion in pages of 4 (partial last
    page), pf applies the operation's text 'filter' BEFORE
    ordering/total (spec: total counts the filtered expansion), and
    pall is the unpaged call. The order-by window is per-url and
    terminology-sized — $expand pages metadata, never fact data."""
    from pyspark.sql import functions as F

    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_operation,
    )

    utc(spark)
    docs = [{
        "resourceType": "ValueSet", "id": "vs-pg", "status": "active",
        "url": "http://example.org/ValueSet/pg",
        "compose": {"include": [{"system": "http://example.org/cs/meds"}]},
    }]
    vs = _encode_doc(spark, docs, "ValueSet")
    cs = _encode_doc(spark, _CS_MEDS_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))

    def page(tag, **kw):
        return expand_operation(vs, cs, closure, **kw).select(
            F.lit(tag).alias("page"), "code", "display", "rn", "total",
            "offset",
        )

    return (
        page("p1", count=4, offset=0)
        .unionByName(page("p2", count=4, offset=4))
        .unionByName(page("p3", count=4, offset=8))
        .unionByName(page("pf", text_filter="ibu", offset=1))
        .unionByName(page("pall"))
    )


QF44_ORACLE = """
SELECT * FROM (VALUES
  ('p1', 'amoxicillin-250', NULL, 0, 9, 0),
  ('p1', 'amoxicillin-500', NULL, 1, 9, 0),
  ('p1', 'capsule', NULL, 2, 9, 0),
  ('p1', 'drug', 'Drug', 3, 9, 0),
  ('p2', 'form-kind', NULL, 4, 9, 4),
  ('p2', 'ibuprofen-200', NULL, 5, 9, 4),
  ('p2', 'ibuprofen-400-plus', NULL, 6, 9, 4),
  ('p2', 'placebo', NULL, 7, 9, 4),
  ('p3', 'tablet', NULL, 8, 9, 8),
  ('pf', 'ibuprofen-400-plus', NULL, 1, 2, 1),
  ('pall', 'amoxicillin-250', NULL, 0, 9, 0),
  ('pall', 'amoxicillin-500', NULL, 1, 9, 0),
  ('pall', 'capsule', NULL, 2, 9, 0),
  ('pall', 'drug', 'Drug', 3, 9, 0),
  ('pall', 'form-kind', NULL, 4, 9, 0),
  ('pall', 'ibuprofen-200', NULL, 5, 9, 0),
  ('pall', 'ibuprofen-400-plus', NULL, 6, 9, 0),
  ('pall', 'placebo', NULL, 7, 9, 0),
  ('pall', 'tablet', NULL, 8, 9, 0)
) AS t(page, code, display, rn, total, "offset")
"""


QUERIES.append(Q("qf44_expand_paging", qf44, QF44_ORACLE))


# --- qf45: ECL refinement conjunction/disjunction (AND/OR between refinements) ----------
def qf45(spark, sf_dir):
    """ECL refinement-level AND/OR (fhir/terminology.py::_ecl_parse
    refset grammar, r12): refinement items combine with ',' ≡ AND and
    the OR keyword (the SNOMED eclRefinement conjunction/disjunction),
    parentheses group, and mixing without parens refuses — evaluated
    as universe-relative matching SETS intersected/unioned before the
    focus semi-join, so groups ('ro3'), cardinality windows ('ro4' —
    [0..0] relative to the whole universe) and reverse members ('ro6')
    all compose under OR. Per the ECL grammar a set operator after a
    refined constraint binds to the REFINEMENT — combining whole
    refined constraints still requires parenthesizing them."""
    return _ecl_findings2(spark, _ecl_vs_docs("ro", [
        "< finding : site = arm OR severity = low",
        "< finding : ( site = arm OR site = leg ) AND severity = high",
        "< finding : { site = arm , severity = high } OR severity = low",
        "< finding : [0..0] site = * OR site = arm",
        "< finding : site = leg AND severity = low",
        "< anatomy : R site = ( << finding : severity = high ) "
        "OR R severity = *",
    ]))


QF45_ORACLE = """
SELECT * FROM (VALUES
  -- ro1: site=arm OR severity=low
  ('http://example.org/ValueSet/ro1', 'arm-fracture'),
  ('http://example.org/ValueSet/ro1', 'hand-burn'),
  ('http://example.org/ValueSet/ro1', 'leg-sprain'),
  ('http://example.org/ValueSet/ro1', 'multi-trauma'),
  ('http://example.org/ValueSet/ro1', 'fatigue'),
  -- ro2: (site=arm OR site=leg) AND severity=high
  ('http://example.org/ValueSet/ro2', 'arm-fracture'),
  ('http://example.org/ValueSet/ro2', 'multi-trauma'),
  -- ro3: unsatisfiable group OR severity=low
  ('http://example.org/ValueSet/ro3', 'hand-burn'),
  ('http://example.org/ValueSet/ro3', 'leg-sprain'),
  ('http://example.org/ValueSet/ro3', 'fatigue'),
  -- ro4: no site assertion at all OR site=arm
  ('http://example.org/ValueSet/ro4', 'arm-fracture'),
  ('http://example.org/ValueSet/ro4', 'fatigue'),
  ('http://example.org/ValueSet/ro4', 'multi-trauma'),
  -- ro5: AND keyword == comma
  ('http://example.org/ValueSet/ro5', 'leg-sprain'),
  -- ro6: reverse members under OR (severity values are not concepts)
  ('http://example.org/ValueSet/ro6', 'arm'),
  ('http://example.org/ValueSet/ro6', 'leg')
) AS t(url, code)
"""


QUERIES.append(Q("qf45_ecl_refinement_sets", qf45, QF45_ORACLE))


# --- qf47: $expand displayLanguage + includeDesignations ------------------------------
_CS_I18N_DOC = {
    "resourceType": "CodeSystem", "id": "cs-i18n", "status": "active",
    "content": "complete", "url": "http://example.org/cs/findings-i18n",
    "concept": [
        {"code": "pain", "display": "Pain",
         "designation": [
             {"language": "de", "value": "Schmerz"},
             {"language": "fr", "value": "Douleur"},
         ],
         "concept": [
             {"code": "headache", "display": "Headache",
              "designation": [{"language": "de", "value": "Kopfschmerz"}]},
             {"code": "backpain", "display": "Back pain"},
         ]},
        {"code": "fever", "display": "Fever",
         "designation": [
             {"language": "de", "value": "Fieber"},
             {"language": "de", "value": "Pyrexie"},
         ]},
        {"code": "cough", "display": "Cough"},
    ],
}


def qf47(spark, sf_dir):
    """$expand displayLanguage + includeDesignations (fhir/
    terminology.py::expand_operation + concept_designations, r12 wave
    2 — the r11 verdict's missing-item 4 remainder): designations are
    collected from EVERY concept nesting depth (headache's sits at
    depth 2), displayLanguage substitutes the matching designation
    value for the display (min per language when a concept repeats
    one — fever carries two 'de' terms; unknown languages and
    designation-less concepts keep their default), the text filter
    runs against the SUBSTITUTED display, and includeDesignations
    fans rows out per designation AFTER paging so rn/total keep
    counting concepts. All joins are terminology-sized metadata."""
    from pyspark.sql import functions as F

    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_operation,
    )

    utc(spark)
    docs = [{
        "resourceType": "ValueSet", "id": "vs-i18n", "status": "active",
        "url": "http://example.org/ValueSet/i18n",
        "compose": {"include": [
            {"system": "http://example.org/cs/findings-i18n"}
        ]},
    }]
    vs = _encode_doc(spark, docs, "ValueSet")
    cs = _encode_doc(spark, _CS_I18N_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))

    def page(tag, **kw):
        out = expand_operation(vs, cs, closure, **kw)
        if "d_language" not in out.columns:
            out = out.withColumn(
                "d_language", F.lit(None).cast("string")
            ).withColumn("d_value", F.lit(None).cast("string"))
        return out.select(
            F.lit(tag).alias("page"), "code", "display", "rn", "total",
            "d_language", "d_value",
        )

    return (
        page("de", display_language="de")
        .unionByName(page("fr", display_language="fr"))
        .unionByName(page("dz", display_language="dz"))
        .unionByName(page("dd", include_designations=True))
        .unionByName(page("pg", display_language="de", count=2, offset=2))
        .unionByName(page("ft", display_language="de", text_filter="schmerz"))
    )


QF47_ORACLE = """
SELECT * FROM (VALUES
  -- de: designation value substitutes the display where one exists
  ('de', 'backpain', 'Back pain', 0, 5, NULL, NULL),
  ('de', 'cough', 'Cough', 1, 5, NULL, NULL),
  ('de', 'fever', 'Fieber', 2, 5, NULL, NULL),
  ('de', 'headache', 'Kopfschmerz', 3, 5, NULL, NULL),
  ('de', 'pain', 'Schmerz', 4, 5, NULL, NULL),
  -- fr: only pain has a French designation
  ('fr', 'backpain', 'Back pain', 0, 5, NULL, NULL),
  ('fr', 'cough', 'Cough', 1, 5, NULL, NULL),
  ('fr', 'fever', 'Fever', 2, 5, NULL, NULL),
  ('fr', 'headache', 'Headache', 3, 5, NULL, NULL),
  ('fr', 'pain', 'Douleur', 4, 5, NULL, NULL),
  -- dz: unknown language, defaults throughout
  ('dz', 'backpain', 'Back pain', 0, 5, NULL, NULL),
  ('dz', 'cough', 'Cough', 1, 5, NULL, NULL),
  ('dz', 'fever', 'Fever', 2, 5, NULL, NULL),
  ('dz', 'headache', 'Headache', 3, 5, NULL, NULL),
  ('dz', 'pain', 'Pain', 4, 5, NULL, NULL),
  -- dd: rows multiply per designation, rn/total still count concepts
  ('dd', 'backpain', 'Back pain', 0, 5, NULL, NULL),
  ('dd', 'cough', 'Cough', 1, 5, NULL, NULL),
  ('dd', 'fever', 'Fever', 2, 5, 'de', 'Fieber'),
  ('dd', 'fever', 'Fever', 2, 5, 'de', 'Pyrexie'),
  ('dd', 'headache', 'Headache', 3, 5, 'de', 'Kopfschmerz'),
  ('dd', 'pain', 'Pain', 4, 5, 'de', 'Schmerz'),
  ('dd', 'pain', 'Pain', 4, 5, 'fr', 'Douleur'),
  -- pg: paging composes with displayLanguage
  ('pg', 'fever', 'Fieber', 2, 5, NULL, NULL),
  ('pg', 'headache', 'Kopfschmerz', 3, 5, NULL, NULL),
  -- ft: text filter sees the SUBSTITUTED display
  ('ft', 'headache', 'Kopfschmerz', 0, 2, NULL, NULL),
  ('ft', 'pain', 'Schmerz', 1, 2, NULL, NULL)
) AS t(page, code, display, rn, total, d_language, d_value)
"""


QUERIES.append(Q("qf47_expand_designations", qf47, QF47_ORACLE))


# --- qf46: Bundle NDJSON ingestion (transaction-export transport) ---------------------
def qf46(spark, sf_dir):
    """Bundle NDJSON → per-type Parquet-on-FHIR tables (fhir/
    encode.py::unbundle_ndjson, r12 wave 2 — the FHIR transaction/
    Synthea export transport, hl7.org/fhir/R4/bundle.html): entry
    resources are cut out as BYTE-EXACT spans (the one deliberate
    Python pass in ingestion — every JVM JSON route re-serializes
    72.50 → 72.5, breaking the spec's lossless contract,
    README.md:11-13), resource-less request entries are skipped, and
    each type flows through the standard sparse-schema encode. The
    driver row reads the RESULTING tables and emits the lexical
    decimal — trailing zero intact — so losslessness-through-
    unbundling is hash-checked, not just unit-tested."""
    import json as _json

    utc(spark)

    def bundle(pid, gender, oid, value):
        s = _json.dumps({
            "resourceType": "Bundle", "type": "transaction",
            "entry": [
                {"resource": {"resourceType": "Patient", "id": pid,
                              "gender": gender}},
                {"request": {"method": "GET", "url": "Patient"}},
                {"resource": {"resourceType": "Observation", "id": oid,
                              "status": "final", "code": {"text": "hr"},
                              "valueQuantity": {"value": "__V__",
                                                "unit": "bpm"}}},
            ],
        })
        return s.replace('"__V__"', value)

    from parquet_on_fhir_spark.fhir.encode import unbundle_ndjson

    src = tempfile.mkdtemp(prefix="pofs_qf46_src_")
    out = tempfile.mkdtemp(prefix="pofs_qf46_out_")
    with open(f"{src}/bundles.ndjson", "w") as fh:
        fh.write(bundle("p1", "male", "o1", "72.50") + "\n")
        fh.write(bundle("p2", "female", "o2", "98.6") + "\n")
        fh.write(bundle("p3", "other", "o3", "120") + "\n")
    unbundle_ndjson(spark, src, out)
    pats = spark.read.parquet(f"{out}/Patient").select(
        F.lit("Patient").alias("resource_type"),
        "id",
        F.col("gender").alias("detail"),
    )
    obs = spark.read.parquet(f"{out}/Observation").select(
        F.lit("Observation").alias("resource_type"),
        "id",
        F.col("valueQuantity.value").alias("detail"),
    )
    return pats.unionByName(obs)


QF46_ORACLE = """
SELECT * FROM (VALUES
  ('Patient', 'p1', 'male'),
  ('Patient', 'p2', 'female'),
  ('Patient', 'p3', 'other'),
  -- lexical decimals survive unbundling: 72.50 keeps its zero
  ('Observation', 'o1', '72.50'),
  ('Observation', 'o2', '98.6'),
  ('Observation', 'o3', '120')
) AS t(resource_type, id, detail)
"""


QUERIES.append(Q("qf46_bundle_ingest", qf46, QF46_ORACLE))


# --- qf48: canonical version pinning (url|version) ------------------------------------
def qf48(spark, sf_dir):
    """R4 canonical versioning in expansion (fhir/terminology.py::
    expand_versioned, r12 wave 2 — references.html#canonical): the
    table carries TWO versions of a CodeSystem and of a referenced
    ValueSet; unpinned uses resolve to the LATEST version
    (deterministic descending version order), ``include.version``
    pins the code-system version (the expansion's system column
    reports the canonical ``system|version`` form), a ``url|v``
    canonical reference pins the referenced ValueSet version, and a
    version absent from the table expands EMPTY (the unresolvable-
    reference contract — never a silent fallback). Implemented as a
    table REWRITE in front of the untouched url-keyed core."""
    from pyspark.sql import functions as F

    from parquet_on_fhir_spark.fhir.terminology import expand_versioned

    utc(spark)
    cs_url = "http://example.org/cs/vers"
    vb_url = "http://example.org/ValueSet/vbase"
    cs_docs = [
        {"resourceType": "CodeSystem", "id": "csv1", "status": "active",
         "content": "complete", "url": cs_url, "version": "1.0",
         "concept": [
             {"code": "a", "display": "Alpha v1"},
             {"code": "b", "display": "Beta v1"},
         ]},
        {"resourceType": "CodeSystem", "id": "csv2", "status": "active",
         "content": "complete", "url": cs_url, "version": "2.0",
         "concept": [
             {"code": "a", "display": "Alpha v2"},
             {"code": "b", "display": "Beta v2"},
             {"code": "c", "display": "Gamma v2"},
         ]},
    ]
    vs_docs = [
        {"resourceType": "ValueSet", "id": "vb1", "status": "active",
         "url": vb_url, "version": "1.0",
         "compose": {"include": [
             {"system": cs_url, "concept": [{"code": "a"}]}]}},
        {"resourceType": "ValueSet", "id": "vb2", "status": "active",
         "url": vb_url, "version": "2.0",
         "compose": {"include": [
             {"system": cs_url,
              "concept": [{"code": "a"}, {"code": "c"}]}]}},
        {"resourceType": "ValueSet", "id": "v-latest", "status": "active",
         "url": "http://example.org/ValueSet/v-latest",
         "compose": {"include": [{"system": cs_url}]}},
        {"resourceType": "ValueSet", "id": "v-pin1", "status": "active",
         "url": "http://example.org/ValueSet/v-pin1",
         "compose": {"include": [{"system": cs_url, "version": "1.0"}]}},
        {"resourceType": "ValueSet", "id": "v-refpin", "status": "active",
         "url": "http://example.org/ValueSet/v-refpin",
         "compose": {"include": [{"valueSet": [vb_url + "|1.0"]}]}},
        {"resourceType": "ValueSet", "id": "v-reflatest", "status": "active",
         "url": "http://example.org/ValueSet/v-reflatest",
         "compose": {"include": [{"valueSet": [vb_url]}]}},
        {"resourceType": "ValueSet", "id": "v-pinmissing", "status": "active",
         "url": "http://example.org/ValueSet/v-pinmissing",
         "compose": {"include": [{"system": cs_url, "version": "9.9"}]}},
        {"resourceType": "ValueSet", "id": "v-refmissing", "status": "active",
         "url": "http://example.org/ValueSet/v-refmissing",
         "compose": {"include": [{"valueSet": [vb_url + "|9.9"]}]}},
    ]
    vs = _encode_doc(spark, vs_docs, "ValueSet")
    cs = _encode_doc(spark, cs_docs, "CodeSystem")
    out = expand_versioned(vs, cs)
    return out.select("url", "system", "code", "display").orderBy(
        "url", "code"
    )


QF48_ORACLE = """
SELECT * FROM (VALUES
  -- vbase itself resolves to its latest version (2.0: a, c)
  ('http://example.org/ValueSet/vbase', 'http://example.org/cs/vers',
   'a', NULL),
  ('http://example.org/ValueSet/vbase', 'http://example.org/cs/vers',
   'c', NULL),
  -- unpinned whole-system include -> latest CodeSystem (2.0)
  ('http://example.org/ValueSet/v-latest', 'http://example.org/cs/vers',
   'a', 'Alpha v2'),
  ('http://example.org/ValueSet/v-latest', 'http://example.org/cs/vers',
   'b', 'Beta v2'),
  ('http://example.org/ValueSet/v-latest', 'http://example.org/cs/vers',
   'c', 'Gamma v2'),
  -- include.version pins 1.0; system column reports the canonical form
  ('http://example.org/ValueSet/v-pin1', 'http://example.org/cs/vers|1.0',
   'a', 'Alpha v1'),
  ('http://example.org/ValueSet/v-pin1', 'http://example.org/cs/vers|1.0',
   'b', 'Beta v1'),
  -- url|1.0 canonical reference -> vbase 1.0 (concept a; enumerated
  -- concepts carry the ValueSet's OWN display, which vbase omits)
  ('http://example.org/ValueSet/v-refpin', 'http://example.org/cs/vers',
   'a', NULL),
  -- unpinned reference -> vbase latest (2.0)
  ('http://example.org/ValueSet/v-reflatest', 'http://example.org/cs/vers',
   'a', NULL),
  ('http://example.org/ValueSet/v-reflatest', 'http://example.org/cs/vers',
   'c', NULL)
  -- v-pinmissing / v-refmissing: zero rows
) AS t(url, system, code, display)
"""


QUERIES.append(Q("qf48_version_pinning", qf48, QF48_ORACLE))


# --- qf49: $expand activeOnly / inactive-concept handling ------------------------------
def qf49(spark, sf_dir):
    """$expand activeOnly (fhir/terminology.py::expand_operation, r12
    wave 3; R4 valueset-operation-expand.html): the operation's
    activeOnly parameter drops concepts their CodeSystem asserts
    inactive — both R4 concept-level conventions are honored (the
    `inactive` boolean property AND `status` = retired/deprecated,
    hl7.org/fhir/R4/codesystem-concept-properties.html), including on
    NESTED child concepts; the filter lands BEFORE ordering, so rn
    and expansion.total count the ACTIVE expansion (pages don't skip).
    The default mode keeps inactive concepts, matching the
    operation's default of including them in expansions. Same
    broadcast-anti-join shape as qf40's fact-side validate: the
    property frame is terminology-sized metadata."""
    from pyspark.sql import functions as F

    from parquet_on_fhir_spark.fhir.terminology import expand_operation

    utc(spark)
    cs_doc = {
        "resourceType": "CodeSystem", "id": "cs-act", "status": "active",
        "url": "http://example.org/cs/act", "content": "complete",
        "concept": [
            {"code": "alive"},
            {"code": "flagged", "property": [
                {"code": "inactive", "valueBoolean": True}]},
            {"code": "old-name", "property": [
                {"code": "status", "valueCode": "retired"}]},
            {"code": "current", "property": [
                {"code": "status", "valueCode": "active"}]},
            {"code": "parent", "concept": [
                {"code": "child-gone", "property": [
                    {"code": "status", "valueCode": "deprecated"}]},
                {"code": "child-kept"}]},
        ],
    }
    vs_doc = [{
        "resourceType": "ValueSet", "id": "vs-act", "status": "active",
        "url": "http://example.org/ValueSet/act",
        "compose": {"include": [{"system": "http://example.org/cs/act"}]},
    }]
    vs = _encode_doc(spark, vs_doc, "ValueSet")
    cs = _encode_doc(spark, cs_doc, "CodeSystem")

    def mode(tag, **kw):
        return expand_operation(vs, cs, **kw).select(
            F.lit(tag).alias("mode"), "code", "rn", "total"
        )

    return mode("all").unionByName(mode("active", active_only=True))


QF49_ORACLE = """
SELECT * FROM (VALUES
  ('all', 'alive', 0, 7),
  ('all', 'child-gone', 1, 7),
  ('all', 'child-kept', 2, 7),
  ('all', 'current', 3, 7),
  ('all', 'flagged', 4, 7),
  ('all', 'old-name', 5, 7),
  ('all', 'parent', 6, 7),
  ('active', 'alive', 0, 4),
  ('active', 'child-kept', 1, 4),
  ('active', 'current', 2, 4),
  ('active', 'parent', 3, 4)
) AS t(mode, code, rn, total)
"""


QUERIES.append(Q("qf49_expand_active_only", qf49, QF49_ORACLE))


# --- QF50: ECL reverse + numeric comparison (r13) ---------------------------------------
_CS_RXNUM_DOC = {
    "resourceType": "CodeSystem", "id": "cs-rxnum", "status": "active",
    "url": "http://example.org/cs/rxnum", "content": "complete",
    "concept": [
        # SNOMED-style numeric concept CODES: reverse+numeric
        # refinements compare the assertion SOURCE code as a number,
        # so products get numeric codes; 'misc' is the non-numeric
        # source that must never match (its ingredient 309 is
        # observable by its absence)
        {"code": "product", "concept": [
            {"code": "8001", "property": [
                {"code": "has-ingredient", "valueCode": "101"},
                {"code": "has-ingredient", "valueCode": "102"},
                {"code": "strength", "valueDecimal": 250}]},
            {"code": "8002", "property": [
                {"code": "has-ingredient", "valueCode": "102"}]},
            {"code": "8003", "property": [
                {"code": "has-ingredient", "valueCode": "205"}]},
            {"code": "misc", "property": [
                {"code": "has-ingredient", "valueCode": "309"}]}]},
        {"code": "substance", "concept": [
            {"code": "101"}, {"code": "102"}, {"code": "205"},
            {"code": "309"}]},
    ],
}


def qf50(spark, sf_dir):
    """ECL reverse flag + numeric comparison (fhir/terminology.py::
    ecl_expand, r13 — the LAST refinement-grammar refusal lifted, r12
    verdict task 3): ``R attr op #n`` tests the assertion SOURCE code
    cast to double — the exact symmetric extension of the forward
    semantics (forward numerics test the VALUE) — while the focus
    still binds to the assertion's value. Non-numeric sources never
    match (try_cast → NULL), including under != (rn3/rn7: ingredient
    309, whose only source is 'misc', never appears). Composed with
    cardinality windows over the universe (rn4 counts assertions per
    VALUE; rn5's [0..0] keeps zero-assertion substances like 309),
    attribute groups (rn6) and refinement conjunction (rn8).
    Differential-fuzzed against the pure-python reference evaluator
    over numeric-coded concepts in tests/test_fhir_fuzz.py."""
    from parquet_on_fhir_spark.fhir.terminology import (
        concept_closure,
        concept_edges,
        expand_valueset,
    )

    utc(spark)
    vs = _encode_doc(spark, _ecl_vs_docs_for(
        "http://example.org/cs/rxnum", "rn", [
            "< substance : R has-ingredient >= #8002",
            "< substance : R has-ingredient < #8002",
            "< substance : R has-ingredient != #8002",
            "< substance : [2..*] R has-ingredient <= #8003",
            "< substance : [0..0] R has-ingredient >= #8003",
            "< substance : { [1..1] R has-ingredient < #8002 }",
            "< substance : R has-ingredient >= #0",
            "< substance : R has-ingredient >= #8002 , "
            "R has-ingredient < #8002",
        ]), "ValueSet")
    cs = _encode_doc(spark, _CS_RXNUM_DOC, "CodeSystem")
    closure = concept_closure(concept_edges(cs))
    return expand_valueset(vs, cs, closure=closure).select("url", "code")


QF50_ORACLE = """
SELECT * FROM (VALUES
  -- rn1: sources >= 8002 are 8002 (->102) and 8003 (->205)
  ('http://example.org/ValueSet/rn1', '102'),
  ('http://example.org/ValueSet/rn1', '205'),
  -- rn2: source < 8002 is 8001 (->101, 102)
  ('http://example.org/ValueSet/rn2', '101'),
  ('http://example.org/ValueSet/rn2', '102'),
  -- rn3: sources != 8002 are 8001 and 8003 ('misc' never matches)
  ('http://example.org/ValueSet/rn3', '101'),
  ('http://example.org/ValueSet/rn3', '102'),
  ('http://example.org/ValueSet/rn3', '205'),
  -- rn4: values of >= 2 assertions with source <= 8003: only 102
  ('http://example.org/ValueSet/rn4', '102'),
  -- rn5: substances with NO assertion sourced >= 8003 (205 excluded;
  -- 309's only source is non-numeric, count 0, kept)
  ('http://example.org/ValueSet/rn5', '101'),
  ('http://example.org/ValueSet/rn5', '102'),
  ('http://example.org/ValueSet/rn5', '309'),
  -- rn6: grouped [1..1] reverse-numeric member
  ('http://example.org/ValueSet/rn6', '101'),
  ('http://example.org/ValueSet/rn6', '102'),
  -- rn7: any numeric source (>= 0): 309 absent, its source is 'misc'
  ('http://example.org/ValueSet/rn7', '101'),
  ('http://example.org/ValueSet/rn7', '102'),
  ('http://example.org/ValueSet/rn7', '205'),
  -- rn8: conjunction of both directions: only 102
  ('http://example.org/ValueSet/rn8', '102')
) AS t(url, code)
"""


QUERIES.append(Q("qf50_ecl_reverse_numeric", qf50, QF50_ORACLE))
