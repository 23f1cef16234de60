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


# One synthetic document per registered resource type, exercising a mix
# of typed leaves (codes, dates, decimals, references, nested backbones).
# Literal values pinned here — never generated from the code under test.
_ROUNDTRIP_DOCS = {
    "Patient": {"resourceType": "Patient", "id": "p1", "gender": "female",
                "birthDate": "1970-03", "name": [{"family": "Doe", "given": ["A", "B"]}]},
    "Observation": {"resourceType": "Observation", "id": "o1", "status": "final",
                    "code": {"coding": [{"system": "http://loinc.org", "code": "8867-4"}]},
                    "valueQuantity": {"value": 72.50, "unit": "beats/minute"}},
    "Encounter": {"resourceType": "Encounter", "id": "e1", "status": "finished",
                  "class": {"code": "AMB"},
                  "period": {"start": "2020-01-01T10:00:00Z", "end": "2020-01-01T10:30:00Z"}},
    "Condition": {"resourceType": "Condition", "id": "c1",
                  "code": {"text": "Hypertension"}, "subject": {"reference": "Patient/p1"}},
    "Procedure": {"resourceType": "Procedure", "id": "pr1", "status": "completed",
                  "performedDateTime": "2019-06-01"},
    "Immunization": {"resourceType": "Immunization", "id": "i1", "status": "completed",
                     "vaccineCode": {"text": "flu"}, "occurrenceDateTime": "2021-10-01",
                     "doseQuantity": {"value": 0.50, "unit": "mL"}},
    "MedicationRequest": {"resourceType": "MedicationRequest", "id": "m1",
                          "status": "active", "intent": "order",
                          "medicationCodeableConcept": {"text": "lisinopril"}},
    "DiagnosticReport": {"resourceType": "DiagnosticReport", "id": "d1",
                         "status": "final", "code": {"text": "CBC"},
                         "result": [{"reference": "Observation/o1"}]},
    "Claim": {"resourceType": "Claim", "id": "cl1", "status": "active",
              "item": [{"sequence": 1, "factor": 0.80, "net": {"value": 12.50, "currency": "USD"}}]},
    "Organization": {"resourceType": "Organization", "id": "org1", "name": "Acme Clinic"},
    "Practitioner": {"resourceType": "Practitioner", "id": "pc1",
                     "name": [{"family": "Smith", "prefix": ["Dr"]}]},
    "Location": {"resourceType": "Location", "id": "l1", "name": "Ward 3"},
    "AllergyIntolerance": {"resourceType": "AllergyIntolerance", "id": "a1",
                           "code": {"text": "peanut"}, "criticality": "high"},
    "CareTeam": {"resourceType": "CareTeam", "id": "ct1", "status": "active"},
    "CarePlan": {"resourceType": "CarePlan", "id": "cp1", "status": "active",
                 "intent": "plan"},
    "Device": {"resourceType": "Device", "id": "dv1", "status": "active"},
    "ExplanationOfBenefit": {"resourceType": "ExplanationOfBenefit", "id": "eob1",
                             "status": "active",
                             "total": [{"category": {"text": "submitted"},
                                        "amount": {"value": 100.00, "currency": "USD"}}]},
    "ServiceRequest": {"resourceType": "ServiceRequest", "id": "sr1",
                       "status": "active", "intent": "order",
                       "occurrenceDateTime": "2022-05-01T08:00:00Z",
                       "quantityQuantity": {"value": 2.0, "unit": "units"}},
    "DocumentReference": {"resourceType": "DocumentReference", "id": "dr1",
                          "status": "current", "date": "2023-01-01T00:00:00Z",
                          "content": [{"attachment": {"contentType": "text/plain",
                                                      "title": "note"}}]},
    "Medication": {"resourceType": "Medication", "id": "med1", "status": "active",
                   "code": {"text": "amoxicillin"},
                   "amount": {"numerator": {"value": 250.0, "unit": "mg"},
                              "denominator": {"value": 1.0, "unit": "tablet"}},
                   "batch": {"lotNumber": "L-42", "expirationDate": "2027-12-31"}},
    "MedicationAdministration": {"resourceType": "MedicationAdministration",
                                 "id": "ma1", "status": "completed",
                                 "medicationCodeableConcept": {"text": "heparin"},
                                 "subject": {"reference": "Patient/p1"},
                                 "effectiveDateTime": "2024-02-01T09:15:00Z",
                                 "dosage": {"route": {"text": "IV"},
                                            "dose": {"value": 5000.0, "unit": "U"}}},
    "MedicationDispense": {"resourceType": "MedicationDispense", "id": "md1",
                           "status": "completed",
                           "medicationCodeableConcept": {"text": "metformin"},
                           "quantity": {"value": 60.0, "unit": "tablets"},
                           "daysSupply": {"value": 30.0, "unit": "days"},
                           "whenHandedOver": "2024-03-05T14:00:00Z",
                           "substitution": {"wasSubstituted": False}},
    "MedicationStatement": {"resourceType": "MedicationStatement", "id": "ms1",
                            "status": "active",
                            "medicationCodeableConcept": {"text": "aspirin"},
                            "subject": {"reference": "Patient/p1"},
                            "effectivePeriod": {"start": "2023-01-01"},
                            "dateAsserted": "2023-06-15T00:00:00Z"},
    "Specimen": {"resourceType": "Specimen", "id": "sp1", "status": "available",
                 "type": {"text": "whole blood"},
                 "subject": {"reference": "Patient/p1"},
                 "receivedTime": "2024-04-10T08:30:00Z",
                 "collection": {"collectedDateTime": "2024-04-10T08:00:00Z",
                                "quantity": {"value": 5.0, "unit": "mL"}},
                 "container": [{"description": "EDTA tube",
                                "capacity": {"value": 10.0, "unit": "mL"}}]},
    "Goal": {"resourceType": "Goal", "id": "g1", "lifecycleStatus": "active",
             "description": {"text": "HbA1c below 7%"},
             "subject": {"reference": "Patient/p1"}, "startDate": "2024-01-01",
             "target": [{"measure": {"text": "HbA1c"},
                         "detailQuantity": {"value": 7.0, "unit": "%"},
                         "dueDate": "2024-12-31"}],
             "statusDate": "2024-02-01"},
    "RelatedPerson": {"resourceType": "RelatedPerson", "id": "rp1",
                      "active": True, "patient": {"reference": "Patient/p1"},
                      "relationship": [{"text": "mother"}],
                      "name": [{"family": "Doe", "given": ["C"]}],
                      "gender": "female", "birthDate": "1945-11-02"},
    "Provenance": {"resourceType": "Provenance", "id": "pv1",
                   "target": [{"reference": "Observation/o1"}],
                   "occurredDateTime": "2024-05-01T12:00:00Z",
                   "recorded": "2024-05-01T12:00:05.123Z",
                   "agent": [{"type": {"text": "author"},
                              "who": {"reference": "Practitioner/pc1"}}],
                   "entity": [{"role": "source",
                               "what": {"reference": "DocumentReference/dr1"},
                               "agent": [{"who": {"reference": "Device/dv1"}}]}]},
    "Coverage": {"resourceType": "Coverage", "id": "cov1", "status": "active",
                 "subscriberId": "S-100", "beneficiary": {"reference": "Patient/p1"},
                 "relationship": {"text": "self"},
                 "period": {"start": "2024-01-01", "end": "2024-12-31"},
                 "payor": [{"reference": "Organization/org1"}],
                 "class": [{"type": {"text": "group"}, "value": "G-7"}],
                 "order": 1,
                 "costToBeneficiary": [{"type": {"text": "copay"},
                                        "valueMoney": {"value": 25.00,
                                                       "currency": "USD"}}]},
    "ImagingStudy": {"resourceType": "ImagingStudy", "id": "im1",
                     "status": "available",
                     "subject": {"reference": "Patient/p1"},
                     "started": "2024-06-01T09:00:00Z",
                     "numberOfSeries": 1, "numberOfInstances": 2,
                     "series": [{"uid": "1.2.3", "number": 1,
                                 "modality": {"code": "CT"},
                                 "numberOfInstances": 2,
                                 "instance": [{"uid": "1.2.3.1", "number": 1},
                                              {"uid": "1.2.3.2", "number": 2}]}]},
    "Appointment": {"resourceType": "Appointment", "id": "ap1",
                    "status": "booked",
                    "start": "2024-07-01T10:00:00Z", "end": "2024-07-01T10:30:00Z",
                    "minutesDuration": 30,
                    "participant": [{"actor": {"reference": "Patient/p1"},
                                     "required": "required", "status": "accepted"}]},
    "Communication": {"resourceType": "Communication", "id": "com1",
                      "status": "completed",
                      "subject": {"reference": "Patient/p1"},
                      "sent": "2024-08-01T08:00:00Z",
                      "recipient": [{"reference": "Practitioner/pc1"}],
                      "payload": [{"contentString": "lab results ready"}]},
    "Composition": {"resourceType": "Composition", "id": "cmp1",
                    "status": "final", "type": {"text": "Discharge summary"},
                    "subject": {"reference": "Patient/p1"},
                    "date": "2024-09-01T12:00:00Z",
                    "author": [{"reference": "Practitioner/pc1"}],
                    "title": "Discharge",
                    "section": [{"title": "Meds",
                                 "entry": [{"reference": "MedicationStatement/ms1"}]}]},
    "Consent": {"resourceType": "Consent", "id": "cns1", "status": "active",
                "scope": {"text": "privacy"},
                "category": [{"text": "HIPAA"}],
                "patient": {"reference": "Patient/p1"},
                "dateTime": "2024-02-15T00:00:00Z",
                "provision": {"type": "permit",
                              "period": {"start": "2024-02-15"},
                              "purpose": [{"code": "TREAT"}]}},
    "Task": {"resourceType": "Task", "id": "t1", "status": "completed",
             "intent": "order", "priority": "routine",
             "for": {"reference": "Patient/p1"},
             "authoredOn": "2024-03-01T09:00:00Z",
             "executionPeriod": {"start": "2024-03-01T09:05:00Z"},
             "restriction": {"repetitions": 1}},
    "QuestionnaireResponse": {"resourceType": "QuestionnaireResponse",
                              "id": "qr1", "status": "completed",
                              "subject": {"reference": "Patient/p1"},
                              "authored": "2024-04-01T10:00:00Z",
                              "item": [{"linkId": "q1", "text": "Smoker?",
                                        "answer": [{"valueBoolean": False}]},
                                       {"linkId": "q2",
                                        "answer": [{"valueDecimal": 72.50},
                                                   {"valueString": "kg"}]}]},
    "DetectedIssue": {"resourceType": "DetectedIssue", "id": "di1",
                      "status": "final", "severity": "moderate",
                      "patient": {"reference": "Patient/p1"},
                      "identifiedPeriod": {"start": "2024-10-01",
                                           "end": "2024-10-02"},
                      "implicated": [{"reference": "MedicationRequest/m1"}],
                      "evidence": [{"code": [{"text": "interaction"}]}],
                      "mitigation": [{"action": {"text": "dose reduced"},
                                      "date": "2024-10-03T09:00:00Z"}]},
    "EpisodeOfCare": {"resourceType": "EpisodeOfCare", "id": "ep1",
                      "status": "active",
                      "statusHistory": [{"status": "planned",
                                         "period": {"start": "2024-01-01",
                                                    "end": "2024-01-15"}}],
                      "diagnosis": [{"condition": {"reference": "Condition/c1"},
                                     "rank": 1}],
                      "patient": {"reference": "Patient/p1"},
                      "period": {"start": "2024-01-15"}},
    "Flag": {"resourceType": "Flag", "id": "fl1", "status": "active",
             "category": [{"text": "safety"}], "code": {"text": "fall risk"},
             "subject": {"reference": "Patient/p1"},
             "period": {"start": "2024-02-01"}},
    "HealthcareService": {"resourceType": "HealthcareService", "id": "hs1",
                          "active": True,
                          "providedBy": {"reference": "Organization/org1"},
                          "name": "Imaging Dept", "appointmentRequired": True,
                          "eligibility": [{"code": {"text": "referral"},
                                           "comment": "GP referral needed"}],
                          "availableTime": [{"daysOfWeek": ["mon", "wed"],
                                             "allDay": False,
                                             "availableStartTime": "08:30:00",
                                             "availableEndTime": "17:00:00"}],
                          "notAvailable": [{"description": "holidays",
                                            "during": {"start": "2024-12-24",
                                                       "end": "2024-12-26"}}]},
    "List": {"resourceType": "List", "id": "ls1", "status": "current",
             "mode": "working", "title": "Problem list",
             "subject": {"reference": "Patient/p1"},
             "date": "2024-05-01T00:00:00Z",
             "entry": [{"deleted": False, "date": "2024-05-01T00:00:00Z",
                        "item": {"reference": "Condition/c1"}}],
             "emptyReason": {"text": "n/a"}},
    "PractitionerRole": {"resourceType": "PractitionerRole", "id": "prr1",
                         "active": True,
                         "period": {"start": "2023-01-01"},
                         "practitioner": {"reference": "Practitioner/pc1"},
                         "organization": {"reference": "Organization/org1"},
                         "code": [{"text": "attending"}],
                         "availableTime": [{"daysOfWeek": ["tue"],
                                            "allDay": True}],
                         "availabilityExceptions": "on call only"},
    "Schedule": {"resourceType": "Schedule", "id": "sch1", "active": True,
                 "serviceType": [{"text": "radiology"}],
                 "actor": [{"reference": "PractitionerRole/prr1"}],
                 "planningHorizon": {"start": "2024-06-01T00:00:00Z",
                                     "end": "2024-06-30T23:59:59Z"},
                 "comment": "summer schedule"},
    "Slot": {"resourceType": "Slot", "id": "sl1",
             "appointmentType": {"text": "routine"},
             "schedule": {"reference": "Schedule/sch1"},
             "status": "free",
             "start": "2024-06-05T09:00:00.000Z",
             "end": "2024-06-05T09:20:00.000Z",
             "overbooked": False},
}

# round-6 breadth additions (each doc exercises at least one choice
# element or nested backbone of its resource)
_ROUNDTRIP_DOCS.update({
    "Account": {"resourceType": "Account", "id": "ac1", "status": "active",
                "name": "ward stay", "subject": [{"reference": "Patient/p1"}],
                "servicePeriod": {"start": "2024-01-01", "end": "2024-01-09"},
                "coverage": [{"coverage": {"reference": "Coverage/cov1"},
                              "priority": 1}],
                "guarantor": [{"party": {"reference": "RelatedPerson/rp1"},
                               "onHold": False}]},
    "AppointmentResponse": {"resourceType": "AppointmentResponse", "id": "ar1",
                            "appointment": {"reference": "Appointment/ap1"},
                            "start": "2024-06-05T09:00:00Z",
                            "end": "2024-06-05T09:20:00Z",
                            "actor": {"reference": "Patient/p1"},
                            "participantStatus": "accepted",
                            "comment": "confirmed by phone"},
    "AuditEvent": {"resourceType": "AuditEvent", "id": "ae1",
                   "type": {"system": "http://dicom.nema.org/resources/ontology/DCM",
                            "code": "110110"},
                   "subtype": [{"code": "read"}], "action": "R",
                   "recorded": "2024-03-01T12:00:00Z", "outcome": "0",
                   "agent": [{"who": {"reference": "Practitioner/pc1"},
                              "requestor": True,
                              "network": {"address": "10.0.0.1", "type": "2"}}],
                   "source": {"site": "clinic", "observer": {"display": "audit svc"},
                              "type": [{"code": "4"}]},
                   "entity": [{"what": {"reference": "Patient/p1"},
                               "detail": [{"type": "query",
                                           "valueString": "name=smith"}]}]},
    "Basic": {"resourceType": "Basic", "id": "ba1",
              "code": {"text": "referral"}, "subject": {"reference": "Patient/p1"},
              "created": "2024-02-02", "author": {"reference": "Practitioner/pc1"}},
    "BodyStructure": {"resourceType": "BodyStructure", "id": "bs1",
                      "active": True, "morphology": {"text": "lesion"},
                      "location": {"text": "left forearm"},
                      "description": "3cm lesion",
                      "patient": {"reference": "Patient/p1"}},
    "ChargeItem": {"resourceType": "ChargeItem", "id": "ci1",
                   "definitionUri": ["http://example.org/fee/123"],
                   "status": "billable", "code": {"text": "consult"},
                   "subject": {"reference": "Patient/p1"},
                   "occurrenceDateTime": "2024-03-03T10:00:00Z",
                   "performer": [{"actor": {"reference": "Practitioner/pc1"}}],
                   "quantity": {"value": 1},
                   "factorOverride": 0.8,
                   "priceOverride": {"value": 40.00, "currency": "EUR"},
                   "overrideReason": "staff discount",
                   "account": [{"reference": "Account/ac1"}]},
    "ClaimResponse": {"resourceType": "ClaimResponse", "id": "cr1",
                      "status": "active", "type": {"text": "institutional"},
                      "use": "claim", "patient": {"reference": "Patient/p1"},
                      "created": "2024-04-01T00:00:00Z",
                      "insurer": {"reference": "Organization/org1"},
                      "outcome": "complete",
                      "item": [{"itemSequence": 1, "noteNumber": [1],
                                "adjudication": [{"category": {"text": "benefit"},
                                                  "amount": {"value": 80.50,
                                                             "currency": "USD"},
                                                  "value": 0.8}],
                                "detail": [{"detailSequence": 1,
                                            "adjudication": [{"category":
                                                              {"text": "copay"}}],
                                            "subDetail": [{"subDetailSequence": 1}]}]}],
                      "addItem": [{"itemSequence": [1],
                                   "productOrService": {"text": "dressing"},
                                   "servicedDate": "2024-04-01",
                                   "net": {"value": 12.5, "currency": "USD"},
                                   "adjudication": [{"category": {"text": "add"}}]}],
                      "total": [{"category": {"text": "submitted"},
                                 "amount": {"value": 100.0, "currency": "USD"}}],
                      "payment": {"type": {"text": "complete"},
                                  "date": "2024-04-15",
                                  "amount": {"value": 80.50, "currency": "USD"}},
                      "processNote": [{"number": 1, "type": "print",
                                       "text": "processed"}],
                      "error": [{"itemSequence": 2,
                                 "code": {"text": "missing info"}}]},
    "CoverageEligibilityRequest": {
        "resourceType": "CoverageEligibilityRequest", "id": "cer1",
        "status": "active", "purpose": ["benefits", "validation"],
        "patient": {"reference": "Patient/p1"},
        "servicedPeriod": {"start": "2024-05-01", "end": "2024-05-31"},
        "created": "2024-04-20T00:00:00Z",
        "insurer": {"reference": "Organization/org1"},
        "supportingInfo": [{"sequence": 1,
                            "information": {"reference": "Condition/c1"},
                            "appliesToAll": True}],
        "insurance": [{"focal": True, "coverage": {"reference": "Coverage/cov1"}}],
        "item": [{"category": {"text": "medical"},
                  "diagnosis": [{"diagnosisCodeableConcept": {"text": "J45"}}]}]},
    "CoverageEligibilityResponse": {
        "resourceType": "CoverageEligibilityResponse", "id": "cerp1",
        "status": "active", "purpose": ["benefits"],
        "patient": {"reference": "Patient/p1"},
        "servicedDate": "2024-05-01",
        "created": "2024-04-21T00:00:00Z",
        "request": {"reference": "CoverageEligibilityRequest/cer1"},
        "outcome": "complete",
        "insurer": {"reference": "Organization/org1"},
        "insurance": [{"coverage": {"reference": "Coverage/cov1"},
                       "inforce": True,
                       "item": [{"category": {"text": "medical"},
                                 "excluded": False, "network": {"text": "in"},
                                 "benefit": [{"type": {"text": "visit"},
                                              "allowedUnsignedInt": 20,
                                              "usedUnsignedInt": 3},
                                             {"type": {"text": "copay-max"},
                                              "allowedMoney": {"value": 500.00,
                                                               "currency": "USD"}}]}]}]},
    "Endpoint": {"resourceType": "Endpoint", "id": "ep1", "status": "active",
                 "connectionType": {"system":
                                    "http://terminology.hl7.org/CodeSystem/endpoint-connection-type",
                                    "code": "hl7-fhir-rest"},
                 "name": "fhir api",
                 "payloadType": [{"text": "any"}],
                 "payloadMimeType": ["application/fhir+json"],
                 "address": "https://fhir.example.org/r4",
                 "header": ["Authorization: Bearer x"]},
    "EnrollmentRequest": {"resourceType": "EnrollmentRequest", "id": "er1",
                          "status": "active", "created": "2024-01-05T00:00:00Z",
                          "insurer": {"reference": "Organization/org1"},
                          "candidate": {"reference": "Patient/p1"},
                          "coverage": {"reference": "Coverage/cov1"}},
    "EnrollmentResponse": {"resourceType": "EnrollmentResponse", "id": "erp1",
                           "status": "active",
                           "request": {"reference": "EnrollmentRequest/er1"},
                           "outcome": "complete", "disposition": "enrolled",
                           "created": "2024-01-06T00:00:00Z",
                           "organization": {"reference": "Organization/org1"}},
    "Group": {"resourceType": "Group", "id": "gr1", "active": True,
              "type": "person", "actual": True, "name": "diabetes cohort",
              "quantity": 2,
              "characteristic": [{"code": {"text": "diagnosis"},
                                  "valueCodeableConcept": {"text": "E11"},
                                  "exclude": False}],
              "member": [{"entity": {"reference": "Patient/p1"},
                          "inactive": False}]},
    "Invoice": {"resourceType": "Invoice", "id": "inv1", "status": "issued",
                "type": {"text": "outpatient"},
                "subject": {"reference": "Patient/p1"},
                "date": "2024-04-30T00:00:00Z",
                "participant": [{"role": {"text": "physician"},
                                 "actor": {"reference": "Practitioner/pc1"}}],
                "lineItem": [{"sequence": 1,
                              "chargeItemReference": {"reference": "ChargeItem/ci1"},
                              "priceComponent": [{"type": "base",
                                                  "factor": 1.0,
                                                  "amount": {"value": 40.00,
                                                             "currency": "EUR"}}]}],
                "totalNet": {"value": 40.00, "currency": "EUR"},
                "totalGross": {"value": 47.60, "currency": "EUR"},
                "paymentTerms": "30 days"},
    "Linkage": {"resourceType": "Linkage", "id": "lk1", "active": True,
                "author": {"reference": "Practitioner/pc1"},
                "item": [{"type": "source",
                          "resource": {"reference": "Condition/c1"}},
                         {"type": "alternate",
                          "resource": {"reference": "Condition/c2"}}]},
    "MessageHeader": {"resourceType": "MessageHeader", "id": "mh1",
                      "eventCoding": {"system": "http://example.org/events",
                                      "code": "admin-notify"},
                      "destination": [{"name": "EHR",
                                       "endpoint": "https://ehr.example.org/in"}],
                      "sender": {"reference": "Organization/org1"},
                      "source": {"name": "lab system", "software": "labd",
                                 "version": "2.1",
                                 "endpoint": "https://lab.example.org/out"},
                      "reason": {"text": "admit"},
                      "response": {"identifier": "msg-000", "code": "ok"},
                      "focus": [{"reference": "Encounter/e1"}]},
    "OperationOutcome": {"resourceType": "OperationOutcome", "id": "oo1",
                         "issue": [{"severity": "error", "code": "invalid",
                                    "diagnostics": "birthDate malformed",
                                    "location": ["Patient.birthDate"],
                                    "expression": ["Patient.birthDate"]}]},
    "OrganizationAffiliation": {"resourceType": "OrganizationAffiliation",
                                "id": "oa1", "active": True,
                                "period": {"start": "2023-01-01"},
                                "organization": {"reference": "Organization/org1"},
                                "participatingOrganization":
                                    {"reference": "Organization/org2"},
                                "code": [{"text": "provider"}],
                                "location": [{"reference": "Location/loc1"}]},
    "PaymentNotice": {"resourceType": "PaymentNotice", "id": "pn1",
                      "status": "active", "created": "2024-04-16T00:00:00Z",
                      "payment": {"reference": "PaymentReconciliation/pr1"},
                      "paymentDate": "2024-04-15",
                      "recipient": {"reference": "Organization/org1"},
                      "amount": {"value": 80.50, "currency": "USD"},
                      "paymentStatus": {"text": "paid"}},
    "PaymentReconciliation": {"resourceType": "PaymentReconciliation",
                              "id": "pr1", "status": "active",
                              "period": {"start": "2024-04-01",
                                         "end": "2024-04-30"},
                              "created": "2024-05-01T00:00:00Z",
                              "paymentIssuer": {"reference": "Organization/org1"},
                              "outcome": "complete",
                              "paymentDate": "2024-04-30",
                              "paymentAmount": {"value": 1200.00,
                                                "currency": "USD"},
                              "detail": [{"type": {"text": "payment"},
                                          "date": "2024-04-15",
                                          "amount": {"value": 80.50,
                                                     "currency": "USD"}}],
                              "processNote": [{"type": "display",
                                               "text": "monthly run"}]},
    "Person": {"resourceType": "Person", "id": "pe1",
               "name": [{"family": "Smith", "given": ["Jo"]}],
               "gender": "female", "birthDate": "1980-04-02",
               "active": True,
               "link": [{"target": {"reference": "Patient/p1"},
                         "assurance": "level3"}]},
    "Subscription": {"resourceType": "Subscription", "id": "su1",
                     "status": "active", "reason": "notify on new obs",
                     "criteria": "Observation?patient=p1",
                     "channel": {"type": "rest-hook",
                                 "endpoint": "https://hook.example.org/cb",
                                 "payload": "application/fhir+json",
                                 "header": ["X-Key: abc"]}},
    "Substance": {"resourceType": "Substance", "id": "sb1", "status": "active",
                  "category": [{"text": "drug"}],
                  "code": {"text": "amoxicillin powder"},
                  "instance": [{"expiry": "2026-01-01T00:00:00Z",
                                "quantity": {"value": 500, "unit": "g",
                                             "system": "http://unitsofmeasure.org",
                                             "code": "g"}}],
                  "ingredient": [{"quantity": {"numerator": {"value": 1},
                                               "denominator": {"value": 10}},
                                  "substanceCodeableConcept":
                                      {"text": "amoxicillin trihydrate"}}]},
    "AdverseEvent": {"resourceType": "AdverseEvent", "id": "adv1",
                     "identifier": {"value": "AE-7"},
                     "actuality": "actual",
                     "event": {"text": "rash"},
                     "subject": {"reference": "Patient/p1"},
                     "date": "2024-03-10T00:00:00Z",
                     "seriousness": {"text": "non-serious"},
                     "suspectEntity": [{"instance":
                                        {"reference": "Medication/m1"},
                                        "causality": [{"assessment":
                                                       {"text": "probable"}}]}]},
    "ClinicalImpression": {"resourceType": "ClinicalImpression", "id": "cim1",
                           "status": "completed",
                           "subject": {"reference": "Patient/p1"},
                           "effectivePeriod": {"start": "2024-03-01",
                                               "end": "2024-03-02"},
                           "date": "2024-03-02T00:00:00Z",
                           "assessor": {"reference": "Practitioner/pc1"},
                           "investigation": [{"code": {"text": "exam"},
                                              "item": [{"reference":
                                                        "Observation/o1"}]}],
                           "summary": "stable",
                           "finding": [{"itemCodeableConcept": {"text": "J45"},
                                        "basis": "history"}]},
    "CommunicationRequest": {"resourceType": "CommunicationRequest",
                             "id": "cmr1", "status": "active",
                             "priority": "routine", "doNotPerform": False,
                             "subject": {"reference": "Patient/p1"},
                             "payload": [{"contentString": "please call"}],
                             "occurrenceDateTime": "2024-03-05T09:00:00Z",
                             "authoredOn": "2024-03-04T00:00:00Z",
                             "requester": {"reference": "Practitioner/pc1"},
                             "recipient": [{"reference": "Patient/p1"}]},
    "DeviceMetric": {"resourceType": "DeviceMetric", "id": "dm1",
                     "type": {"text": "SpO2"}, "unit": {"text": "%"},
                     "source": {"reference": "Device/d1"},
                     "operationalStatus": "on", "category": "measurement",
                     "calibration": [{"type": "gain", "state": "calibrated",
                                      "time": "2024-01-01T00:00:00Z"}]},
    "DeviceRequest": {"resourceType": "DeviceRequest", "id": "dr1",
                      "status": "active", "intent": "order",
                      "priority": "routine",
                      "codeCodeableConcept": {"text": "wheelchair"},
                      "parameter": [{"code": {"text": "width"},
                                     "valueQuantity": {"value": 60, "unit": "cm",
                                                       "code": "cm"}}],
                      "subject": {"reference": "Patient/p1"},
                      "occurrenceDateTime": "2024-04-01T00:00:00Z",
                      "requester": {"reference": "Practitioner/pc1"}},
    "DeviceUseStatement": {"resourceType": "DeviceUseStatement", "id": "dus1",
                           "status": "active",
                           "subject": {"reference": "Patient/p1"},
                           "timingPeriod": {"start": "2024-01-01"},
                           "recordedOn": "2024-01-02T00:00:00Z",
                           "device": {"reference": "Device/d1"},
                           "bodySite": {"text": "left wrist"}},
    "FamilyMemberHistory": {"resourceType": "FamilyMemberHistory", "id": "fmh1",
                            "status": "completed",
                            "patient": {"reference": "Patient/p1"},
                            "date": "2024-02-01T00:00:00Z",
                            "relationship": {"text": "mother"},
                            "sex": {"text": "female"},
                            "bornDate": "1950-06-01",
                            "deceasedBoolean": False,
                            "condition": [{"code": {"text": "E11"},
                                           "contributedToDeath": False,
                                           "onsetAge": {"value": 55, "unit": "a",
                                                        "system":
                                                        "http://unitsofmeasure.org",
                                                        "code": "a"}}]},
    "ImmunizationEvaluation": {"resourceType": "ImmunizationEvaluation",
                               "id": "ie1", "status": "completed",
                               "patient": {"reference": "Patient/p1"},
                               "date": "2024-01-15T00:00:00Z",
                               "targetDisease": {"text": "measles"},
                               "immunizationEvent":
                                   {"reference": "Immunization/im1"},
                               "doseStatus": {"text": "valid"},
                               "doseNumberPositiveInt": 2,
                               "seriesDosesPositiveInt": 2},
    "ImmunizationRecommendation": {
        "resourceType": "ImmunizationRecommendation", "id": "ir1",
        "patient": {"reference": "Patient/p1"},
        "date": "2024-01-15T00:00:00Z",
        "recommendation": [{"vaccineCode": [{"text": "MMR"}],
                            "forecastStatus": {"text": "due"},
                            "dateCriterion": [{"code": {"text": "earliest"},
                                               "value": "2024-02-01T00:00:00Z"}],
                            "doseNumberPositiveInt": 2,
                            "supportingImmunization":
                                [{"reference": "Immunization/im1"}]}]},
    "Media": {"resourceType": "Media", "id": "md1", "status": "completed",
              "type": {"text": "image"},
              "subject": {"reference": "Patient/p1"},
              "createdDateTime": "2024-03-01T10:00:00Z",
              "issued": "2024-03-01T10:05:00Z",
              "bodySite": {"text": "left forearm"},
              "height": 480, "width": 640,
              "content": {"contentType": "image/jpeg",
                          "url": "https://pacs.example.org/img/1",
                          "title": "lesion photo"}},
    "MeasureReport": {"resourceType": "MeasureReport", "id": "mr1",
                      "status": "complete", "type": "summary",
                      "measure": "http://example.org/Measure/diabetes-a1c",
                      "date": "2024-07-01T00:00:00Z",
                      "period": {"start": "2024-01-01", "end": "2024-06-30"},
                      "group": [{"code": {"text": "all"},
                                 "population": [{"code": {"text": "denominator"},
                                                 "count": 100},
                                                {"code": {"text": "numerator"},
                                                 "count": 62}],
                                 "measureScore": {"value": 0.62},
                                 "stratifier": [{"code": [{"text": "sex"}],
                                                 "stratum": [{"value":
                                                              {"text": "female"},
                                                              "population":
                                                              [{"count": 33}]}]}]}]},
    "NutritionOrder": {"resourceType": "NutritionOrder", "id": "no1",
                       "status": "active", "intent": "order",
                       "patient": {"reference": "Patient/p1"},
                       "dateTime": "2024-03-01T00:00:00Z",
                       "orderer": {"reference": "Practitioner/pc1"},
                       "oralDiet": {"type": [{"text": "diabetic"}],
                                    "nutrient": [{"modifier":
                                                  {"text": "carbohydrate"},
                                                  "amount": {"value": 180,
                                                             "unit": "g",
                                                             "code": "g"}}],
                                    "instruction": "consistent carbs"},
                       "supplement": [{"type": {"text": "protein shake"},
                                       "productName": "Boost",
                                       "instruction": "bid"}],
                       "enteralFormula": {"baseFormulaProductName": "Jevity",
                                          "caloricDensity": {"value": 1.5,
                                                             "unit": "cal/mL"},
                                          "routeofAdministration":
                                              {"text": "NG tube"},
                                          "administration":
                                              [{"quantity": {"value": 240,
                                                             "unit": "mL",
                                                             "code": "mL"},
                                                "rateQuantity":
                                                    {"value": 60,
                                                     "unit": "mL/h"}}]}},
    "ResearchStudy": {"resourceType": "ResearchStudy", "id": "rs1",
                      "title": "A1c control trial", "status": "active",
                      "phase": {"text": "phase-3"},
                      "condition": [{"text": "E11"}],
                      "contact": [{"name": "study desk",
                                   "telecom": [{"system": "email",
                                                "value": "study@example.org"}]}],
                      "period": {"start": "2024-01-01"},
                      "sponsor": {"reference": "Organization/org1"},
                      "arm": [{"name": "control", "description": "placebo"},
                              {"name": "treatment"}],
                      "objective": [{"name": "A1c < 7%"}]},
    "ResearchSubject": {"resourceType": "ResearchSubject", "id": "rsub1",
                        "status": "on-study",
                        "period": {"start": "2024-02-01"},
                        "study": {"reference": "ResearchStudy/rs1"},
                        "individual": {"reference": "Patient/p1"},
                        "assignedArm": "treatment",
                        "actualArm": "treatment"},
    "RiskAssessment": {"resourceType": "RiskAssessment", "id": "ra1",
                       "status": "final", "subject": {"reference": "Patient/p1"},
                       "occurrenceDateTime": "2024-03-01T00:00:00Z",
                       "performer": {"reference": "Practitioner/pc1"},
                       "basis": [{"reference": "Observation/o1"}],
                       "prediction": [{"outcome": {"text": "stroke"},
                                       "probabilityDecimal": 0.024,
                                       "qualitativeRisk": {"text": "low"},
                                       "whenPeriod": {"start": "2024-03-01",
                                                      "end": "2034-03-01"}}],
                       "mitigation": "statin therapy"},
    "SupplyDelivery": {"resourceType": "SupplyDelivery", "id": "sd1",
                       "status": "completed",
                       "patient": {"reference": "Patient/p1"},
                       "type": {"text": "device"},
                       "suppliedItem": {"quantity": {"value": 1},
                                        "itemCodeableConcept":
                                            {"text": "glucometer"}},
                       "occurrenceDateTime": "2024-03-02T00:00:00Z",
                       "supplier": {"reference": "Organization/org1"}},
    "SupplyRequest": {"resourceType": "SupplyRequest", "id": "sr1",
                      "status": "active", "category": {"text": "central"},
                      "priority": "routine",
                      "itemCodeableConcept": {"text": "glucometer"},
                      "quantity": {"value": 10},
                      "parameter": [{"code": {"text": "color"},
                                     "valueCodeableConcept": {"text": "black"}}],
                      "occurrenceDateTime": "2024-03-01T00:00:00Z",
                      "requester": {"reference": "Practitioner/pc1"},
                      "deliverTo": {"reference": "Location/loc1"}},
    "Questionnaire": {"resourceType": "Questionnaire", "id": "q1",
                      "url": "http://example.org/Questionnaire/phq9",
                      "version": "1.0", "name": "PHQ9", "title": "PHQ-9",
                      "status": "active", "subjectType": ["Patient"],
                      "date": "2024-01-01T00:00:00Z",
                      "item": [{"linkId": "1",
                                "text": "Little interest or pleasure",
                                "type": "choice", "required": True,
                                "answerOption": [{"valueInteger": 0},
                                                 {"valueInteger": 1}],
                                "enableWhen": [{"question": "0",
                                                "operator": "=",
                                                "answerBoolean": True}],
                                "initial": [{"valueInteger": 0}]}]},
    "ValueSet": {"resourceType": "ValueSet", "id": "vs1",
                 "url": "http://example.org/ValueSet/loinc-vitals",
                 "status": "active", "name": "Vitals",
                 "compose": {"include": [{"system": "http://loinc.org",
                                          "concept": [{"code": "8867-4",
                                                       "display": "Heart rate"}]}],
                             "exclude": [{"system": "http://loinc.org",
                                          "concept": [{"code": "9999-9"}]}]},
                 "expansion": {"timestamp": "2024-01-01T00:00:00Z",
                               "total": 1,
                               "contains": [{"system": "http://loinc.org",
                                             "code": "8867-4",
                                             "display": "Heart rate"}]}},
    "CodeSystem": {"resourceType": "CodeSystem", "id": "cs1",
                   "url": "http://example.org/CodeSystem/triage",
                   "status": "active", "content": "complete",
                   "caseSensitive": True, "count": 2,
                   "concept": [{"code": "red", "display": "Immediate",
                                "property": [{"code": "order",
                                              "valueInteger": 1}]},
                               {"code": "green", "display": "Delayed"}]},
    "ConceptMap": {"resourceType": "ConceptMap", "id": "cm1",
                   "url": "http://example.org/ConceptMap/tri2sev",
                   "status": "active",
                   "sourceCanonical": "http://example.org/ValueSet/triage",
                   "targetCanonical": "http://example.org/ValueSet/severity",
                   "group": [{"source": "http://example.org/CodeSystem/triage",
                              "element": [{"code": "red",
                                           "target": [{"code": "severe",
                                                       "equivalence": "equivalent",
                                                       "dependsOn": [{"property":
                                                                      "http://example.org/p",
                                                                      "value": "x"}]}]}],
                              "unmapped": {"mode": "fixed", "code": "unknown"}}]},
    "Library": {"resourceType": "Library", "id": "lib1",
                "url": "http://example.org/Library/cql-common",
                "status": "active", "type": {"text": "logic-library"},
                "parameter": [{"name": "MeasurementPeriod", "use": "in",
                               "type": "Period"}],
                "dataRequirement": [{"type": "Observation",
                                     "codeFilter": [{"path": "code",
                                                     "code": [{"system":
                                                               "http://loinc.org",
                                                               "code": "4548-4"}]}],
                                     "limit": 100}],
                "content": [{"contentType": "text/cql",
                             "title": "common logic"}]},
    "Measure": {"resourceType": "Measure", "id": "ms1",
                "url": "http://example.org/Measure/a1c-control",
                "status": "active", "scoring": {"text": "proportion"},
                "library": ["http://example.org/Library/cql-common"],
                "improvementNotation": {"text": "decrease"},
                "group": [{"code": {"text": "all"},
                           "population": [{"code": {"text": "denominator"},
                                           "criteria": {"language": "text/cql",
                                                        "expression": "InDenom"}}],
                           "stratifier": [{"code": {"text": "sex"},
                                           "criteria": {"language": "text/cql",
                                                        "expression": "Sex"},
                                           "component": [{"code": {"text": "age"},
                                                          "criteria":
                                                          {"language": "text/cql",
                                                           "expression": "Age"}}]}]}],
                "supplementalData": [{"code": {"text": "payer"},
                                      "criteria": {"language": "text/cql",
                                                   "expression": "Payer"}}]},
    "PlanDefinition": {"resourceType": "PlanDefinition", "id": "pd1",
                       "url": "http://example.org/PlanDefinition/dm-care",
                       "status": "active", "type": {"text": "clinical-protocol"},
                       "goal": [{"description": {"text": "A1c under 7%"},
                                 "target": [{"measure": {"text": "A1c"},
                                             "detailQuantity": {"value": 7,
                                                                "unit": "%"},
                                             "due": {"value": 90,
                                                     "unit": "d",
                                                     "system":
                                                     "http://unitsofmeasure.org",
                                                     "code": "d"}}]}],
                       "action": [{"title": "order A1c",
                                   "priority": "routine",
                                   "condition": [{"kind": "applicability",
                                                  "expression":
                                                  {"language": "text/cql",
                                                   "expression": "Overdue"}}],
                                   "timingDuration": {"value": 90, "unit": "d",
                                                      "system":
                                                      "http://unitsofmeasure.org",
                                                      "code": "d"},
                                   "definitionCanonical":
                                       "http://example.org/ActivityDefinition/a1c",
                                   "dynamicValue": [{"path": "priority",
                                                     "expression":
                                                     {"language": "text/cql",
                                                      "expression": "Prio"}}]}]},
    "ActivityDefinition": {"resourceType": "ActivityDefinition", "id": "ad1",
                           "url": "http://example.org/ActivityDefinition/a1c",
                           "status": "active", "kind": "ServiceRequest",
                           "code": {"text": "HbA1c panel"},
                           "intent": "order", "doNotPerform": False,
                           "timingTiming": {"repeat": {"frequency": 1,
                                                       "period": 90,
                                                       "periodUnit": "d"}},
                           "participant": [{"type": "practitioner"}],
                           "quantity": {"value": 1},
                           "dynamicValue": [{"path": "priority",
                                             "expression":
                                             {"language": "text/cql",
                                              "expression": "Prio"}}]},
    "Bundle": {"resourceType": "Bundle", "id": "bu1",
               "identifier": {"value": "batch-7"},
               "type": "transaction",
               "timestamp": "2024-05-01T00:00:00Z",
               "total": 1,
               "link": [{"relation": "self",
                         "url": "https://fhir.example.org/Bundle/bu1"}],
               "entry": [{"fullUrl": "urn:uuid:1",
                          "request": {"method": "POST", "url": "Patient",
                                      "ifNoneExist": "identifier=ssn|1"},
                          "response": {"status": "201",
                                       "location": "Patient/p1/_history/1",
                                       "etag": "W/\"1\""},
                          "search": {"mode": "match", "score": 0.9}}]},
    "Parameters": {"resourceType": "Parameters", "id": "pa1",
                   "parameter": [{"name": "code",
                                  "valueCoding": {"system": "http://loinc.org",
                                                  "code": "4548-4"}},
                                 {"name": "options",
                                  "part": [{"name": "strict",
                                            "valueBoolean": True}]}]},
    "Binary": {"resourceType": "Binary", "id": "bi1",
               "contentType": "application/pdf",
               "securityContext": {"reference": "Patient/p1"},
               "data": "JVBERi0xLjQ="},
    "StructureDefinition": {
        "resourceType": "StructureDefinition", "id": "sd1",
        "url": "http://example.org/StructureDefinition/my-patient",
        "name": "MyPatient", "status": "active", "kind": "resource",
        "abstract": False, "type": "Patient", "fhirVersion": "4.0.1",
        "baseDefinition": "http://hl7.org/fhir/StructureDefinition/Patient",
        "derivation": "constraint",
        "differential": {"element": [
            {"id": "Patient.birthDate", "path": "Patient.birthDate",
             "min": 1, "max": "1", "mustSupport": True,
             "type": [{"code": "date"}],
             "constraint": [{"key": "mp-1", "severity": "error",
                             "human": "birthDate required",
                             "expression": "birthDate.exists()"}],
             "binding": {"strength": "required",
                          "valueSet": "http://example.org/ValueSet/x"}}]}},
    "SearchParameter": {
        "resourceType": "SearchParameter", "id": "sp1",
        "url": "http://example.org/SearchParameter/patient-maiden",
        "name": "maiden", "status": "active",
        "description": "maiden name search",
        "code": "maiden", "base": ["Patient"], "type": "string",
        "expression": "Patient.name.where(use = 'maiden').family",
        "multipleOr": True,
        "modifier": ["exact", "contains"]},
    "NamingSystem": {
        "resourceType": "NamingSystem", "id": "ns1",
        "name": "LocalMRN", "status": "active", "kind": "identifier",
        "date": "2024-01-01T00:00:00Z",
        "uniqueId": [{"type": "uri",
                      "value": "http://hospital.example.org/mrn",
                      "preferred": True}]},
    "DocumentManifest": {
        "resourceType": "DocumentManifest", "id": "dm2",
        "masterIdentifier": {"value": "manifest-1"},
        "status": "current", "subject": {"reference": "Patient/p1"},
        "created": "2024-03-01T00:00:00Z",
        "content": [{"reference": "DocumentReference/doc1"}],
        "related": [{"identifier": {"value": "rel-1"},
                     "ref": {"reference": "Encounter/e1"}}]},
    "RequestGroup": {
        "resourceType": "RequestGroup", "id": "rg1",
        "status": "active", "intent": "order", "priority": "routine",
        "subject": {"reference": "Patient/p1"},
        "authoredOn": "2024-03-01T00:00:00Z",
        "action": [{"title": "labs then meds",
                    "selectionBehavior": "all",
                    "condition": [{"kind": "applicability",
                                   "expression": {"language": "text/cql",
                                                  "expression": "Eligible"}}],
                    "relatedAction": [{"actionId": "a2",
                                       "relationship": "before-start",
                                       "offsetDuration": {"value": 1,
                                                          "unit": "d",
                                                          "code": "d"}}],
                    "resource": {"reference": "ServiceRequest/sr9"}}]},
    "GuidanceResponse": {
        "resourceType": "GuidanceResponse", "id": "gr2",
        "moduleCanonical": "http://example.org/PlanDefinition/dm-care",
        "status": "success", "subject": {"reference": "Patient/p1"},
        "occurrenceDateTime": "2024-03-02T00:00:00Z",
        "result": {"reference": "RequestGroup/rg1"},
        "dataRequirement": [{"type": "Observation",
                             "limit": 5}]},
    "DeviceDefinition": {
        "resourceType": "DeviceDefinition", "id": "dd1",
        "manufacturerString": "Acme Devices",
        "deviceName": [{"name": "PulseOx 3000", "type": "manufacturer-name"}],
        "modelNumber": "PX-3000", "type": {"text": "pulse oximeter"},
        "version": ["3.1"],
        "capability": [{"type": {"text": "SpO2"},
                        "description": [{"text": "percent saturation"}]}],
        "property": [{"type": {"text": "accuracy"},
                      "valueQuantity": [{"value": 2, "unit": "%"}]}],
        "material": [{"substance": {"text": "silicone"},
                      "allergenicIndicator": False}]},
    "SpecimenDefinition": {
        "resourceType": "SpecimenDefinition", "id": "spd1",
        "identifier": {"value": "spec-def-1"},
        "typeCollected": {"text": "venous blood"},
        "timeAspect": "fasting",
        "typeTested": [{"isDerived": False, "type": {"text": "serum"},
                        "preference": "preferred",
                        "container": {"type": {"text": "SST tube"},
                                      "capacity": {"value": 5, "unit": "mL",
                                                   "code": "mL"},
                                      "minimumVolumeQuantity":
                                          {"value": 2, "unit": "mL",
                                           "code": "mL"}},
                        "retentionTime": {"value": 7, "unit": "d",
                                          "code": "d"},
                        "handling": [{"temperatureQualifier":
                                      {"text": "refrigerated"},
                                      "instruction": "2-8C"}]}]},
    "ObservationDefinition": {
        "resourceType": "ObservationDefinition", "id": "od1",
        "code": {"text": "HbA1c"},
        "permittedDataType": ["Quantity"],
        "multipleResultsAllowed": False,
        "quantitativeDetails": {"unit": {"text": "%"},
                                "conversionFactor": 1.0,
                                "decimalPrecision": 1},
        "qualifiedInterval": [{"category": "reference",
                               "range": {"low": {"value": 4.0},
                                         "high": {"value": 5.6}},
                               "gender": "female"}]},
    "InsurancePlan": {
        "resourceType": "InsurancePlan", "id": "ip1",
        "status": "active", "name": "Gold PPO",
        "type": [{"text": "medical"}],
        "ownedBy": {"reference": "Organization/org1"},
        "coverage": [{"type": {"text": "medical"},
                      "benefit": [{"type": {"text": "primary care"},
                                   "limit": [{"value": {"value": 20},
                                              "code": {"text": "visits/yr"}}]}]}],
        "plan": [{"type": {"text": "standard"},
                  "generalCost": [{"type": {"text": "premium"},
                                   "groupSize": 1,
                                   "cost": {"value": 450.00,
                                            "currency": "USD"}}],
                  "specificCost": [{"category": {"text": "outpatient"},
                                    "benefit": [{"type": {"text": "copay"},
                                                 "cost": [{"type":
                                                           {"text": "copay"},
                                                           "value":
                                                           {"value": 30}}]}]}]}]},
    "VerificationResult": {
        "resourceType": "VerificationResult", "id": "vr1",
        "target": [{"reference": "Practitioner/pc1"}],
        "status": "validated",
        "statusDate": "2024-02-01T00:00:00Z",
        "validationType": {"text": "primary"},
        "lastPerformed": "2024-02-01T00:00:00Z",
        "nextScheduled": "2025-02-01",
        "primarySource": [{"who": {"reference": "Organization/org1"},
                           "validationStatus": {"text": "successful"},
                           "validationDate": "2024-02-01T00:00:00Z"}],
        "attestation": {"who": {"reference": "Practitioner/pc1"},
                        "date": "2024-01-15"}},
    "MolecularSequence": {
        "resourceType": "MolecularSequence", "id": "mseq1",
        "type": "dna", "coordinateSystem": 0,
        "patient": {"reference": "Patient/p1"},
        "referenceSeq": {"chromosome": {"text": "chr17"},
                         "genomeBuild": "GRCh38", "strand": "watson",
                         "windowStart": 43044294, "windowEnd": 43044394},
        "variant": [{"start": 43044300, "end": 43044301,
                     "observedAllele": "T", "referenceAllele": "C"}],
        "quality": [{"type": "snp", "start": 43044294, "end": 43044394,
                     "precision": 0.99, "recall": 0.95,
                     "fScore": 0.97,
                     "roc": {"score": [10, 20],
                             "precision": [0.9, 0.95],
                             "sensitivity": [0.98, 0.92]}}],
        "readCoverage": 30,
        "repository": [{"type": "login",
                        "url": "https://genomics.example.org",
                        "name": "repo", "datasetId": "ds-1"}]},
    "VisionPrescription": {"resourceType": "VisionPrescription", "id": "vp1",
                           "status": "active",
                           "created": "2024-02-01T00:00:00Z",
                           "patient": {"reference": "Patient/p1"},
                           "dateWritten": "2024-02-01T00:00:00Z",
                           "prescriber": {"reference": "Practitioner/pc1"},
                           "lensSpecification": [{"product": {"text": "lens"},
                                                  "eye": "right",
                                                  "sphere": -2.00,
                                                  "cylinder": -0.50,
                                                  "axis": 180,
                                                  "prism": [{"amount": 0.5,
                                                             "base": "down"}],
                                                  "add": 1.75}]},
})


def test_registry_resources_roundtrip(spark):
    """Every registered resource type: encode a synthetic doc under the
    definition-derived schema, decode, and regenerate the input JSON
    byte-for-byte (lossless contract incl. lexical decimals)."""
    from parquet_on_fhir_spark.fhir.r4_elements import RESOURCES
    from parquet_on_fhir_spark.fhir.decode import to_fhir_json

    assert set(_ROUNDTRIP_DOCS) == set(RESOURCES)
    assert len(RESOURCES) >= 12
    failures = []
    for rt, doc in _ROUNDTRIP_DOCS.items():
        d = tempfile.mkdtemp(prefix=f"rt_{rt}_")
        raw = json.dumps(doc)
        with open(f"{d}/r.ndjson", "w") as f:
            f.write(raw + "\n")
        df = encode_ndjson(spark, d, resource_type=rt)
        out = to_fhir_json(df, resource_type=rt).collect()[0][0]
        if json.loads(out) != json.loads(raw):
            failures.append((rt, out))
    assert not failures, failures


def test_no_duplicate_registry_keys():
    """Python dict literals silently keep the LAST duplicate key — a
    duplicated resource entry would shadow a fuller definition with a
    stale one (this bit DocumentReference in round 3). Parse the source
    and reject duplicate keys in every top-level registry dict."""
    import ast
    from pathlib import Path

    import parquet_on_fhir_spark.fhir.r4_elements as mod

    src = Path(mod.__file__).read_text()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate dict keys near line {node.lineno}: {dupes}"


def test_definition_schema_primitive_extension_companions():
    """README.md:267-296: a populated ``_birthDate`` path materializes
    the Element carrier {id, extension} beside the primitive; repeating
    primitives get ARRAY-shaped companions (paired arrays). Companions
    are sparse — only requested paths appear."""
    from parquet_on_fhir_spark.fhir.r4_elements import definition_schema

    s = definition_schema(
        "Patient",
        paths={
            ("birthDate",),
            ("_birthDate", "id"),
            ("_birthDate", "extension", "url"),
            ("_birthDate", "extension", "valueDateTime"),
            ("name", "given"),
            ("name", "_given", "id"),
        },
    )
    assert (
        s.simpleString()
        == "struct<birthDate:string,"
        "_birthDate:struct<extension:array<struct<url:string,"
        "valueDateTime:string>>,id:string>,"
        "name:array<struct<given:array<string>,"
        "_given:array<struct<id:string>>>>>"
    )
    # no companion unless asked for
    bare = definition_schema("Patient", paths={("birthDate",)})
    assert "_birthDate" not in bare.simpleString()
