"""F1 v2 — StructureDefinition-driven schema derivation conformance
(reference README.md:26-27 "derived from a single base FHIR resource
definition"; listings at README.md:385-719)."""

import json
import tempfile

from pyspark.sql import types as T

from parquet_on_fhir_spark.fhir.r4_elements import (
    definition_schema,
    registry_type_at,
)
from parquet_on_fhir_spark.fhir.encode import encode_ndjson


def _flatten(dtype, prefix=()):
    """{path: leaf Spark type} over a nested schema, arrays unwrapped,
    annotation fields skipped."""
    out = {}
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            if f.name.startswith("__"):
                continue
            out.update(_flatten(f.dataType, prefix + (f.name,)))
    elif isinstance(dtype, T.ArrayType):
        out.update(_flatten(dtype.elementType, prefix))
    else:
        out[prefix] = dtype
    return out


# The spec's Patient listing (README.md:480-590), transcribed as
# path → parquet primitive. Everything is STRING except annotations.
_PATIENT_LISTING = {
    "resourceType": "s", "id": "s", "meta.profile": "s",
    "text.div": "s", "text.status": "s",
    "extension.url": "s", "extension.valueCoding.code": "s",
    "extension.valueCoding.display": "s", "extension.valueCoding.system": "s",
    "identifier.system": "s", "identifier.type.coding.code": "s",
    "identifier.type.coding.system": "s", "identifier.type.text": "s",
    "identifier.value": "s",
    "name.family": "s", "name.given": "s", "name.prefix": "s",
    "name.text": "s", "name.use": "s",
    "telecom.system": "s", "telecom.use": "s", "telecom.value": "s",
    "gender": "s", "birthDate": "s",
    "address.city": "s", "address.country": "s", "address.line": "s",
    "address.postalCode": "s", "address.state": "s", "address.use": "s",
    "communication.language.coding.code": "s",
    "communication.language.coding.system": "s",
    "communication.language.text": "s",
}

# The spec's Observation listing (README.md:668-719).
_OBSERVATION_LISTING = {
    "resourceType": "s", "id": "s", "meta.profile": "s",
    "text.div": "s", "text.status": "s", "status": "s",
    "category.coding.code": "s", "category.coding.display": "s",
    "category.coding.system": "s", "category.text": "s",
    "code.coding.code": "s", "code.coding.display": "s",
    "code.coding.system": "s", "code.text": "s",
    "subject.reference": "s", "effectiveDateTime": "s",
    "valueQuantity.code": "s", "valueQuantity.system": "s",
    "valueQuantity.unit": "s", "valueQuantity.value": "s",
}


def _assert_covers(rtype, listing):
    flat = {
        ".".join(p): t for p, t in _flatten(definition_schema(rtype)).items()
    }
    for path in listing:
        assert path in flat, f"{rtype}.{path} missing from definition schema"
        # every field in the spec listings is STRING (binary STRING)
        assert isinstance(flat[path], T.StringType), (path, flat[path])


def test_definition_schema_covers_spec_patient_listing():
    _assert_covers("Patient", _PATIENT_LISTING)


def test_definition_schema_covers_spec_observation_listing():
    _assert_covers("Observation", _OBSERVATION_LISTING)


def test_registry_path_typing():
    # the path-aware wins where names are ambiguous
    assert registry_type_at("Observation", ("valueQuantity", "value")) == "decimal"
    assert registry_type_at("Patient", ("identifier", "value")) == "string"
    assert registry_type_at("Patient", ("birthDate",)) == "date"
    assert registry_type_at("Claim", ("item", "factor")) == "decimal"
    assert registry_type_at("Claim", ("item", "net", "value")) == "decimal"
    assert registry_type_at("Patient", ("nope", "nope")) is None
    assert registry_type_at("NotAResource", ("id",)) is None


def test_definition_schema_matches_golden_observation(spark):
    """Definition-derived types agree with the golden example file for
    every path both sides know."""
    golden = spark.read.parquet("/root/reference/examples/Observation.parquet").schema
    defn = _flatten(definition_schema("Observation"))
    mismatches = []
    for path, gtype in _flatten(golden).items():
        if path in defn and defn[path] != gtype:
            mismatches.append((path, str(gtype), str(defn[path])))
    assert not mismatches, mismatches


def test_registry_overrides_name_rules_in_data_derivation(spark):
    """Claim.item.factor (decimal by definition; unknowable from the
    name) must come out as lossless STRING when resource_type is given."""
    d = tempfile.mkdtemp(prefix="reg_")
    with open(f"{d}/c.ndjson", "w") as f:
        f.write(json.dumps({
            "resourceType": "Claim", "id": "c1", "status": "active",
            "item": [{"sequence": 1, "factor": 0.80,
                      "net": {"value": 12.5, "currency": "USD"}}],
        }) + "\n")
    df = encode_ndjson(spark, d, resource_type="Claim")
    item = df.schema["item"].dataType.elementType
    assert isinstance(item["factor"].dataType, T.StringType)
    assert isinstance(item["sequence"].dataType, T.IntegerType)  # positiveInt → INT32
    assert isinstance(item["net"].dataType["value"].dataType, T.StringType)


def test_definition_schema_matches_golden_eob(spark):
    """ExplanationOfBenefit — the widest golden file — must agree with
    the definition-derived types on every shared path."""
    golden = spark.read.parquet(
        "/root/reference/examples/ExplanationOfBenefit.parquet"
    ).schema
    defn = _flatten(definition_schema("ExplanationOfBenefit"))
    mismatches = []
    for path, gtype in _flatten(golden).items():
        if path in defn and defn[path] != gtype:
            mismatches.append((path, str(gtype), str(defn[path])))
    assert not mismatches, mismatches


def test_definition_schema_matches_golden_patient(spark):
    golden = spark.read.parquet("/root/reference/examples/Patient.parquet").schema
    defn = _flatten(definition_schema("Patient"))
    mismatches = []
    for path, gtype in _flatten(golden).items():
        if path in defn and defn[path] != gtype:
            mismatches.append((path, str(gtype), str(defn[path])))
    assert not mismatches, mismatches
