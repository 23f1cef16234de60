"""F2 — FHIR primitive type → Parquet/Spark type mapping.

Source: the spec's mapping table (/root/reference/README.md:61-82) as
summarized in SURVEY.md §1.2:

- temporal + decimal FHIR types stay STRINGS (lossless partial dates /
  decimal precision; typed access comes from annotations, README.md:301+)
- integer → INT32; integer64 → INT64; positiveInt/unsignedInt → INT32
  (Spark has no unsigned; ≥0 is validated at encode — documented
  deviation, SURVEY.md §7)
- base64Binary → binary

Element typing without a StructureDefinition package (not available in
this container): a registry of well-known element names plus FHIR's
choice-type naming rule — ``value[x]`` concrete fields carry their type
in the name suffix (README.md:139-172), e.g. ``valueDecimal``,
``multipleBirthInteger``. This is exactly the information the spec's
naming convention is designed to carry.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# FHIR primitive → Spark type (README.md:61-82)
PRIMITIVE_TO_SPARK: dict[str, T.DataType] = {
    "base64Binary": T.BinaryType(),
    "boolean": T.BooleanType(),
    "canonical": T.StringType(),
    "code": T.StringType(),
    "id": T.StringType(),
    "markdown": T.StringType(),
    "oid": T.StringType(),
    "string": T.StringType(),
    "uri": T.StringType(),
    "url": T.StringType(),
    "uuid": T.StringType(),
    "date": T.StringType(),       # lossless text + __x_start/__x_end annotations
    "dateTime": T.StringType(),
    "instant": T.StringType(),
    "time": T.StringType(),
    "decimal": T.StringType(),    # lossless text + __x_numeric annotation
    "integer": T.IntegerType(),
    "integer64": T.LongType(),
    "positiveInt": T.IntegerType(),
    "unsignedInt": T.IntegerType(),
}

DATE_TYPES = {"date", "dateTime", "instant"}
DECIMAL_TYPES = {"decimal"}

# choice-type name suffix → FHIR type (README.md:139-172 upper-camel rule)
CHOICE_SUFFIXES: dict[str, str] = {
    "Boolean": "boolean",
    "Integer": "integer",
    "String": "string",
    "Decimal": "decimal",
    "Date": "date",
    "DateTime": "dateTime",
    "Instant": "instant",
    "Time": "time",
    "Code": "code",
    "Uri": "uri",
    "Canonical": "canonical",
    "Base64Binary": "base64Binary",
    "PositiveInt": "positiveInt",
    "UnsignedInt": "unsignedInt",
    # complex choice variants (typed as structs; listed so choice groups
    # can be detected for validation)
    "Quantity": "Quantity",
    "CodeableConcept": "CodeableConcept",
    "Coding": "Coding",
    "Address": "Address",
    "Period": "Period",
    "Range": "Range",
    "Ratio": "Ratio",
    "Reference": "Reference",
    "Attachment": "Attachment",
    "Identifier": "Identifier",
    "HumanName": "HumanName",
    "Annotation": "Annotation",
    "SampledData": "SampledData",
}

# well-known element names → FHIR type (R4 common resources; extend as needed)
ELEMENT_TYPES: dict[str, str] = {
    "id": "id",
    "resourceType": "code",
    "birthDate": "date",
    "gender": "code",
    "status": "code",
    "use": "code",
    "system": "uri",
    "url": "uri",
    "issued": "instant",
    "lastUpdated": "instant",
    "recordedDate": "dateTime",
    "authoredOn": "dateTime",
    "onsetDateTime": "dateTime",
    "abatementDateTime": "dateTime",
    "effectiveDateTime": "dateTime",
    "deceasedDateTime": "dateTime",
    "start": "dateTime",   # Period.start / Period.end
    "end": "dateTime",
    "date": "dateTime",
    "created": "dateTime",
    "billablePeriodStart": "dateTime",
    "rank": "positiveInt",
    "multipleBirthInteger": "integer",
    # decimal in every R4 occurrence (Claim/EOB item.factor, Contract
    # valuedItem.factor/points) — needed so decode regenerates the JSON
    # number without a resource-specific registry at hand
    "factor": "decimal",
    # common R4 resource elements (Encounter/Condition/Procedure/
    # MedicationRequest/Immunization/DiagnosticReport/Claim/AllergyIntolerance)
    "performedDateTime": "dateTime",
    "occurrenceDateTime": "dateTime",
    "assertedDate": "dateTime",
    "dateWritten": "dateTime",
    "authored": "dateTime",
    "timestamp": "instant",
    "deceasedBoolean": "boolean",
    "active": "boolean",
    "preferred": "boolean",
    "primarySource": "boolean",
    "doNotPerform": "boolean",
    "priority": "code",
    "intent": "code",
    "mode": "code",
    "language": "code",
    "severity": "code",
    "criticality": "code",
    "clinicalStatus": "code",  # R3-style string form; R4 CodeableConcept stays struct
    "sequence": "positiveInt",
    "numberOfSeries": "positiveInt",
    "numberOfInstances": "unsignedInt",
    "total": "unsignedInt",
    "version": "string",
    "display": "string",
    "reference": "string",
    "division": "string",
}

_CHOICE_RE = re.compile(r"^([a-z][A-Za-z0-9]*?)((?:[A-Z][a-z0-9]*)+)$")


def fhir_type_of(field_name: str) -> str | None:
    """Best-effort FHIR type of an element from its name: explicit
    registry first, then the choice-type suffix convention."""
    if field_name in ELEMENT_TYPES:
        return ELEMENT_TYPES[field_name]
    m = _CHOICE_RE.match(field_name)
    if m:
        for suffix in sorted(CHOICE_SUFFIXES, key=len, reverse=True):
            if field_name.endswith(suffix) and len(field_name) > len(suffix):
                return CHOICE_SUFFIXES[suffix]
    return None


def choice_group(field_name: str) -> str | None:
    """The choice-group prefix of a ``value[x]`` concrete field
    (``valueQuantity`` → ``value``), or None if not a choice field."""
    for suffix in sorted(CHOICE_SUFFIXES, key=len, reverse=True):
        if field_name.endswith(suffix) and len(field_name) > len(suffix):
            prefix = field_name[: -len(suffix)]
            if prefix and prefix[0].islower():
                return prefix
    return None


def spark_type_for(fhir_type: str) -> T.DataType | None:
    return PRIMITIVE_TO_SPARK.get(fhir_type)


def is_quantity_shaped(dtype: T.DataType) -> bool:
    """FHIR Quantity/Money shape: a ``value`` child plus a unit/code/
    currency sibling. ``system`` alone does NOT qualify — Identifier is
    (system, value, …) and its value is an arbitrary string that must
    never be treated as decimal. This structural test is how
    Quantity.value (the most common FHIR decimal site, README.md:343+)
    is recognized without a name registry: 'value' alone is ambiguous,
    'value' inside a unit-bearing struct is the spec's Quantity.

    ``value`` must itself be atomic: backbones like InsurancePlan's
    benefit.limit are (value: Quantity, code: CodeableConcept) — same
    field NAMES, but their value is a struct and must not be treated as
    a decimal leaf."""
    if not isinstance(dtype, T.StructType):
        return False
    names = set(dtype.fieldNames())
    if "value" not in names or not (names & {"unit", "code", "currency"}):
        return False
    return not isinstance(
        dtype["value"].dataType, (T.StructType, T.ArrayType)
    )
