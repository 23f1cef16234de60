"""F1 v2 — packaged FHIR R4 element registry (public HL7 R4 content).

The spec says the table schema "SHALL be derived from a single base FHIR
resource definition" (/root/reference/README.md:26-27). Round 1 derived
schemas purely from data (JSON inference ∩ name-based typing rules); this
registry adds the StructureDefinition side: element paths → FHIR types
for the R4 base resource definitions and complex datatypes, transcribed
from the published HL7 FHIR R4 specification (hl7.org/fhir/R4 — public
standard). Two uses:

1. ``definition_schema(resource_type)`` — derive a Spark schema from the
   resource definition ALONE (no data sample needed), optionally
   restricted to a sparse set of populated element paths (README.md:15-18
   allows omitting unpopulated fields).
2. ``registry_type_at(resource_type, path)`` — path-aware element typing
   for the data-driven deriver, replacing name-only guesses wherever the
   registry knows the path (an element name like ``value`` is ambiguous;
   the path ``Observation.valueQuantity.value`` is not).

Registry encoding (per element dict):
- ``"string"``            → scalar primitive / complex-type reference
- ``("string", True)``    → repeating element (→ Spark ArrayType)
- ``{...}`` / ``({...}, True)`` → inline backbone element (→ struct)
- ``["boolean","dateTime"]``    → choice element ``name[x]`` (key must
  end with ``[x]``); expands to one sibling field per concrete type
  (README.md:139-172)

Not every R4 resource is transcribed — unknown paths fall back to the
data-driven rules (types.fhir_type_of), so coverage degrades gracefully.
"""

from __future__ import annotations

from pyspark.sql import types as T

from parquet_on_fhir_spark.fhir.types import PRIMITIVE_TO_SPARK

A = lambda t: (t, True)  # noqa: E731 — repeating element marker

# ---------------------------------------------------------------------------
# Complex datatypes (hl7.org/fhir/R4/datatypes.html)
# ---------------------------------------------------------------------------

# The Quantity family (Age, Distance, Duration, Count, SimpleQuantity)
# shares Quantity's elements.
_QUANTITY = {
    "value": "decimal",
    "comparator": "code",
    "unit": "string",
    "system": "uri",
    "code": "code",
}

COMPLEX: dict[str, dict] = {
    "Meta": {
        "versionId": "id",
        "lastUpdated": "instant",
        "source": "uri",
        "profile": A("canonical"),
        "security": A("Coding"),
        "tag": A("Coding"),
    },
    "Narrative": {"status": "code", "div": "string"},
    "Identifier": {
        "use": "code",
        "type": "CodeableConcept",
        "system": "uri",
        "value": "string",
        "period": "Period",
        "assigner": "Reference",
    },
    "CodeableConcept": {"coding": A("Coding"), "text": "string"},
    "Coding": {
        "system": "uri",
        "version": "string",
        "code": "code",
        "display": "string",
        "userSelected": "boolean",
    },
    "Quantity": dict(_QUANTITY),
    "Age": dict(_QUANTITY),
    "Distance": dict(_QUANTITY),
    "Duration": dict(_QUANTITY),
    "Count": dict(_QUANTITY),
    "SimpleQuantity": dict(_QUANTITY),
    "Money": {"value": "decimal", "currency": "code"},
    "Range": {"low": "Quantity", "high": "Quantity"},
    "Ratio": {"numerator": "Quantity", "denominator": "Quantity"},
    "Period": {"start": "dateTime", "end": "dateTime"},
    "SampledData": {
        "origin": "Quantity",
        "period": "decimal",
        "factor": "decimal",
        "lowerLimit": "decimal",
        "upperLimit": "decimal",
        "dimensions": "positiveInt",
        "data": "string",
    },
    "Attachment": {
        "contentType": "code",
        "language": "code",
        "data": "base64Binary",
        "url": "url",
        "size": "unsignedInt",
        "hash": "base64Binary",
        "title": "string",
        "creation": "dateTime",
    },
    "HumanName": {
        "use": "code",
        "text": "string",
        "family": "string",
        "given": A("string"),
        "prefix": A("string"),
        "suffix": A("string"),
        "period": "Period",
    },
    "Address": {
        "use": "code",
        "type": "code",
        "text": "string",
        "line": A("string"),
        "city": "string",
        "district": "string",
        "state": "string",
        "postalCode": "string",
        "country": "string",
        "period": "Period",
    },
    "ContactPoint": {
        "system": "code",
        "value": "string",
        "use": "code",
        "rank": "positiveInt",
        "period": "Period",
    },
    "Reference": {
        "reference": "string",
        "type": "uri",
        "identifier": "Identifier",
        "display": "string",
    },
    "Annotation": {
        "authorReference": "Reference",
        "authorString": "string",
        "time": "dateTime",
        "text": "markdown",
    },
    "Timing": {
        "event": A("dateTime"),
        "repeat": {
            "bounds[x]": ["Duration", "Range", "Period"],
            "count": "positiveInt",
            "countMax": "positiveInt",
            "duration": "decimal",
            "durationMax": "decimal",
            "durationUnit": "code",
            "frequency": "positiveInt",
            "frequencyMax": "positiveInt",
            "period": "decimal",
            "periodMax": "decimal",
            "periodUnit": "code",
            "dayOfWeek": A("code"),
            "timeOfDay": A("time"),
            "when": A("code"),
            "offset": "unsignedInt",
        },
        "code": "CodeableConcept",
    },
    "Dosage": {
        "sequence": "integer",
        "text": "string",
        "additionalInstruction": A("CodeableConcept"),
        "patientInstruction": "string",
        "timing": "Timing",
        "asNeeded[x]": ["boolean", "CodeableConcept"],
        "site": "CodeableConcept",
        "route": "CodeableConcept",
        "method": "CodeableConcept",
        "doseAndRate": A(
            {
                "type": "CodeableConcept",
                "dose[x]": ["Range", "Quantity"],
                "rate[x]": ["Ratio", "Range", "Quantity"],
            }
        ),
        "maxDosePerPeriod": "Ratio",
        "maxDosePerAdministration": "Quantity",
        "maxDosePerLifetime": "Quantity",
    },
    "Signature": {
        "type": A("Coding"),
        "when": "instant",
        "who": "Reference",
        "onBehalfOf": "Reference",
        "targetFormat": "code",
        "sigFormat": "code",
        "data": "base64Binary",
    },
    # metadata types (hl7.org/fhir/R4/metadatatypes.html)
    "ContactDetail": {"name": "string", "telecom": A("ContactPoint")},
    "RelatedArtifact": {
        "type": "code",
        "label": "string",
        "display": "string",
        "citation": "markdown",
        "url": "url",
        "document": "Attachment",
        "resource": "canonical",
    },
    "UsageContext": {
        "code": "Coding",
        "value[x]": ["CodeableConcept", "Quantity", "Range", "Reference"],
    },
    "Expression": {
        "description": "string",
        "name": "id",
        "language": "code",
        "expression": "string",
        "reference": "uri",
    },
    "ParameterDefinition": {
        "name": "code",
        "use": "code",
        "min": "integer",
        "max": "string",
        "documentation": "string",
        "type": "code",
        "profile": "canonical",
    },
    "DataRequirement": {
        "type": "code",
        "profile": A("canonical"),
        "subject[x]": ["CodeableConcept", "Reference"],
        "mustSupport": A("string"),
        "codeFilter": A(
            {
                "path": "string",
                "searchParam": "string",
                "valueSet": "canonical",
                "code": A("Coding"),
            }
        ),
        "dateFilter": A(
            {
                "path": "string",
                "searchParam": "string",
                "value[x]": ["dateTime", "Period", "Duration"],
            }
        ),
        "limit": "positiveInt",
        "sort": A({"path": "string", "direction": "code"}),
    },
    "TriggerDefinition": {
        "type": "code",
        "name": "string",
        "timing[x]": ["Timing", "Reference", "date", "dateTime"],
        "data": A("DataRequirement"),
        "condition": "Expression",
    },
    # Extension.value[x] admits every type; the common subset is listed —
    # unknown variants fall back to data inference.
    "Extension": {
        "url": "uri",
        "extension": A("Extension"),
        "value[x]": [
            "boolean", "integer", "decimal", "string", "code", "uri",
            "url", "canonical", "date", "dateTime", "instant", "time",
            "base64Binary", "positiveInt", "unsignedInt", "markdown",
            "Quantity", "CodeableConcept", "Coding", "Address", "Period",
            "Range", "Ratio", "Reference", "Attachment", "Identifier",
            "HumanName", "Annotation", "SampledData", "Money",
        ],
    },
    # Special-purpose datatypes used only by the medicinal-product /
    # substance-definition tier (hl7.org/fhir/R4/marketingstatus.html,
    # population.html, prodcharacteristic.html, productshelflife.html,
    # substanceamount.html)
    "MarketingStatus": {
        "country": "CodeableConcept",
        "jurisdiction": "CodeableConcept",
        "status": "CodeableConcept",
        "dateRange": "Period",
        "restoreDate": "dateTime",
    },
    "Population": {
        "age[x]": ["Range", "CodeableConcept"],
        "gender": "CodeableConcept",
        "race": "CodeableConcept",
        "physiologicalCondition": "CodeableConcept",
    },
    "ProdCharacteristic": {
        "height": "Quantity",
        "width": "Quantity",
        "depth": "Quantity",
        "weight": "Quantity",
        "nominalVolume": "Quantity",
        "externalDiameter": "Quantity",
        "shape": "string",
        "color": ("string", True),
        "imprint": ("string", True),
        "image": ("Attachment", True),
        "scoring": "CodeableConcept",
    },
    "ProductShelfLife": {
        "identifier": "Identifier",
        "type": "CodeableConcept",
        "period": "Quantity",
        "specialPrecautionsForStorage": ("CodeableConcept", True),
    },
    "SubstanceAmount": {
        "amount[x]": ["Quantity", "Range", "string"],
        "amountType": "CodeableConcept",
        "amountText": "string",
        "referenceRange": {"lowLimit": "Quantity", "highLimit": "Quantity"},
    },
}

# DomainResource base elements shared by every resource
# (hl7.org/fhir/R4/domainresource.html)
_DOMAIN = {
    "id": "id",
    "resourceType": "code",
    "meta": "Meta",
    "implicitRules": "uri",
    "language": "code",
    "text": "Narrative",
    "extension": A("Extension"),
    "modifierExtension": A("Extension"),
}

_VALUE_CHOICE = [
    "Quantity", "CodeableConcept", "string", "boolean", "integer",
    "Range", "Ratio", "SampledData", "time", "dateTime", "Period",
]

# Provenance.agent backbone, shared verbatim by Provenance.entity.agent
# (hl7.org/fhir/R4/provenance.html) — one dict, two mount points.
_PROVENANCE_AGENT = {
    "type": "CodeableConcept",
    "role": A("CodeableConcept"),
    "who": "Reference",
    "onBehalfOf": "Reference",
}


# Availability backbone shared verbatim by PractitionerRole and
# HealthcareService (hl7.org/fhir/R4/practitionerrole.html)
_AVAILABLE_TIME = {
    "daysOfWeek": A("code"),
    "allDay": "boolean",
    "availableStartTime": "time",
    "availableEndTime": "time",
}
_NOT_AVAILABLE = {"description": "string", "during": "Period"}

# ClaimResponse adjudication backbone, mounted at item/detail/subDetail
# and every addItem level (hl7.org/fhir/R4/claimresponse.html)
_ADJUDICATION = {
    "category": "CodeableConcept",
    "reason": "CodeableConcept",
    "amount": "Money",
    "value": "decimal",
}

# Invoice price-component backbone, shared by lineItem and the
# totalPriceComponent mount (hl7.org/fhir/R4/invoice.html)
_PRICE_COMPONENT = {
    "type": "code",
    "code": "CodeableConcept",
    "factor": "decimal",
    "amount": "Money",
}

# MeasureReport population backbone, shared by group and stratum
# (hl7.org/fhir/R4/measurereport.html)
_MR_POPULATION = {
    "code": "CodeableConcept",
    "count": "integer",
    "subjectResults": "Reference",
}

# Canonical-resource metadata header shared by the definitional
# resources (Questionnaire, ValueSet, CodeSystem, Library, Measure,
# PlanDefinition, ActivityDefinition — hl7.org/fhir/R4/<r>.html)
_CANONICAL_HEADER = {
    "url": "uri",
    "identifier": ("Identifier", True),
    "version": "string",
    "name": "string",
    "title": "string",
    "status": "code",
    "experimental": "boolean",
    "date": "dateTime",
    "publisher": "string",
    "contact": ("ContactDetail", True),
    "description": "markdown",
    "useContext": ("UsageContext", True),
    "jurisdiction": ("CodeableConcept", True),
    "purpose": "markdown",
    "copyright": "markdown",
}

# Knowledge-artifact lifecycle tail shared by Library/Measure/
# PlanDefinition/ActivityDefinition
_ARTIFACT_TAIL = {
    "approvalDate": "date",
    "lastReviewDate": "date",
    "effectivePeriod": "Period",
    "topic": ("CodeableConcept", True),
    "author": ("ContactDetail", True),
    "editor": ("ContactDetail", True),
    "reviewer": ("ContactDetail", True),
    "endorser": ("ContactDetail", True),
    "relatedArtifact": ("RelatedArtifact", True),
}

# Resource base WITHOUT DomainResource's text/extension — Bundle,
# Parameters, and Binary derive straight from Resource
# (hl7.org/fhir/R4/resource.html)
_RESOURCE_BASE = {
    "id": "id",
    "resourceType": "code",
    "meta": "Meta",
    "implicitRules": "uri",
    "language": "code",
}

# ValueSet.compose include/exclude share one backbone
# (hl7.org/fhir/R4/valueset.html)
_VS_INCLUDE = {
    "system": "uri",
    "version": "string",
    "concept": (
        {
            "code": "code",
            "display": "string",
            "designation": (
                {"language": "code", "use": "Coding", "value": "string"},
                True,
            ),
        },
        True,
    ),
    "filter": (
        {"property": "code", "op": "code", "value": "string"},
        True,
    ),
    "valueSet": ("canonical", True),
}

# ConceptMap dependsOn/product share one backbone
_CM_DEPENDS_ON = {
    "property": "uri",
    "system": "canonical",
    "value": "string",
    "display": "string",
}

# Bundle.link backbone, shared by entry.link
_BUNDLE_LINK = {"relation": "string", "url": "uri"}

# CapabilityStatement searchParam/operation backbones, shared by the
# rest-level and resource-level mounts (hl7.org/fhir/R4/capabilitystatement.html)
_CAP_SEARCH_PARAM = {
    "name": "string",
    "definition": "canonical",
    "type": "code",
    "documentation": "markdown",
}
_CAP_OPERATION = {
    "name": "string",
    "definition": "canonical",
    "documentation": "markdown",
}
_CAP_INTERACTION = {"code": "code", "documentation": "markdown"}

# TestReport operation/assert result backbones, shared by setup/test/
# teardown actions (hl7.org/fhir/R4/testreport.html)
_TR_OPERATION = {"result": "code", "message": "markdown", "detail": "uri"}
_TR_ASSERT = {"result": "code", "message": "markdown", "detail": "string"}

# TestScript operation/assert backbones, shared by setup/test/teardown
# (hl7.org/fhir/R4/testscript.html)
_TS_OPERATION = {
    "type": "Coding",
    "resource": "code",
    "label": "string",
    "description": "string",
    "accept": "code",
    "contentType": "code",
    "destination": "integer",
    "encodeRequestUrl": "boolean",
    "method": "code",
    "origin": "integer",
    "params": "string",
    "requestHeader": ({"field": "string", "value": "string"}, True),
    "requestId": "id",
    "responseId": "id",
    "sourceId": "id",
    "targetId": "id",
    "url": "string",
}
_TS_ASSERT = {
    "label": "string",
    "description": "string",
    "direction": "code",
    "compareToSourceId": "string",
    "compareToSourceExpression": "string",
    "compareToSourcePath": "string",
    "contentType": "code",
    "expression": "string",
    "headerField": "string",
    "minimumId": "string",
    "navigationLinks": "boolean",
    "operator": "code",
    "path": "string",
    "requestMethod": "code",
    "requestURL": "string",
    "resource": "code",
    "response": "code",
    "responseCode": "string",
    "sourceId": "id",
    "validateProfileId": "id",
    "value": "string",
    "warningOnly": "boolean",
}

# Contract offer.answer / party backbones, shared by term.offer and
# term.asset (hl7.org/fhir/R4/contract.html)
_CONTRACT_ANSWER = {
    "value[x]": [
        "boolean", "decimal", "integer", "date", "dateTime", "time",
        "string", "uri", "Attachment", "Coding", "Quantity", "Reference",
    ],
}
_CONTRACT_PARTY = {"reference": ("Reference", True), "role": "CodeableConcept"}

# ElementDefinition subset shared by StructureDefinition snapshot and
# differential (hl7.org/fhir/R4/elementdefinition.html — fixed[x]/
# pattern[x]/defaultValue[x]/example omitted: open choice over every
# type; data-driven typing covers them when populated)
_ELEMENT_DEF = {
    "id": "string",
    "path": "string",
    "representation": ("code", True),
    "sliceName": "string",
    "label": "string",
    "code": ("Coding", True),
    "short": "string",
    "definition": "markdown",
    "comment": "markdown",
    "requirements": "markdown",
    "alias": ("string", True),
    "min": "unsignedInt",
    "max": "string",
    "base": {"path": "string", "min": "unsignedInt", "max": "string"},
    "contentReference": "uri",
    "type": (
        {
            "code": "uri",
            "profile": ("canonical", True),
            "targetProfile": ("canonical", True),
            "aggregation": ("code", True),
            "versioning": "code",
        },
        True,
    ),
    "meaningWhenMissing": "markdown",
    "orderMeaning": "string",
    "condition": ("id", True),
    "constraint": (
        {
            "key": "id",
            "requirements": "string",
            "severity": "code",
            "human": "string",
            "expression": "string",
            "xpath": "string",
            "source": "canonical",
        },
        True,
    ),
    "mustSupport": "boolean",
    "isModifier": "boolean",
    "isModifierReason": "string",
    "isSummary": "boolean",
    "binding": {
        "strength": "code",
        "description": "string",
        "valueSet": "canonical",
    },
    "mapping": (
        {
            "identity": "id",
            "language": "code",
            "map": "string",
            "comment": "string",
        },
        True,
    ),
}

# ---------------------------------------------------------------------------
# Resource definitions (hl7.org/fhir/R4/<resource>.html)
# ---------------------------------------------------------------------------

# Evidence-family metadata header (Evidence, EvidenceVariable,
# EffectEvidenceSynthesis, RiskEvidenceSynthesis —
# hl7.org/fhir/R4/evidence.html and siblings): the canonical header
# minus experimental/purpose, plus note, plus the artifact tail.
_EVIDENCE_HEADER = {
    "url": "uri",
    "identifier": ("Identifier", True),
    "version": "string",
    "name": "string",
    "title": "string",
    "status": "code",
    "date": "dateTime",
    "publisher": "string",
    "contact": ("ContactDetail", True),
    "description": "markdown",
    "note": ("Annotation", True),
    "useContext": ("UsageContext", True),
    "jurisdiction": ("CodeableConcept", True),
    "copyright": "markdown",
    **_ARTIFACT_TAIL,
}

# Synthesis backbones shared by EffectEvidenceSynthesis and
# RiskEvidenceSynthesis (hl7.org/fhir/R4/effectevidencesynthesis.html)
_SYNTHESIS_CERTAINTY = {
    "rating": ("CodeableConcept", True),
    "note": ("Annotation", True),
    "certaintySubcomponent": (
        {
            "type": "CodeableConcept",
            "rating": ("CodeableConcept", True),
            "note": ("Annotation", True),
        },
        True,
    ),
}
_SYNTHESIS_SAMPLE_SIZE = {
    "description": "string",
    "numberOfStudies": "integer",
    "numberOfParticipants": "integer",
}
_PRECISION_ESTIMATE = {
    "type": "CodeableConcept",
    "level": "decimal",
    "from": "decimal",
    "to": "decimal",
}

# MedicinalProduct{Contraindication,Indication}.otherTherapy — shared
# verbatim (hl7.org/fhir/R4/medicinalproductcontraindication.html)
_MP_OTHER_THERAPY = {
    "therapyRelationshipType": "CodeableConcept",
    "medication[x]": ["CodeableConcept", "Reference"],
}

# MedicinalProductIngredient strength backbone — two mount points
# (specifiedSubstance.strength, substance.strength)
_MPI_STRENGTH = {
    "presentation": "Ratio",
    "presentationLowLimit": "Ratio",
    "concentration": "Ratio",
    "concentrationLowLimit": "Ratio",
    "measurementPoint": "string",
    "country": ("CodeableConcept", True),
    "referenceStrength": (
        {
            "substance": "CodeableConcept",
            "strength": "Ratio",
            "strengthLowLimit": "Ratio",
            "measurementPoint": "string",
            "country": ("CodeableConcept", True),
        },
        True,
    ),
}

# MedicinalProductPackaged.packageItem nests recursively; one
# structured level per the registry's recursion convention
_MPP_PACKAGE_ITEM_LEAF = {
    "identifier": ("Identifier", True),
    "type": "CodeableConcept",
    "quantity": "Quantity",
    "material": ("CodeableConcept", True),
    "alternateMaterial": ("CodeableConcept", True),
    "device": ("Reference", True),
    "manufacturedItem": ("Reference", True),
    "physicalCharacteristics": "ProdCharacteristic",
    "otherCharacteristics": ("CodeableConcept", True),
    "shelfLifeStorage": ("ProductShelfLife", True),
    "manufacturer": ("Reference", True),
}
_MPP_PACKAGE_ITEM = {
    **_MPP_PACKAGE_ITEM_LEAF,
    "packageItem": (_MPP_PACKAGE_ITEM_LEAF, True),
}

# SubstanceSpecification molecular-weight backbone — three mount points
# (structure.isotope.molecularWeight, structure.molecularWeight, and
# the resource-level molecularWeight list)
_SS_MOLECULAR_WEIGHT = {
    "method": "CodeableConcept",
    "type": "CodeableConcept",
    "amount": "Quantity",
}

# Structural-representation backbone shared by SubstanceSpecification
# .structure.representation and SubstancePolymer
# .repeat.repeatUnit.structuralRepresentation
_SS_REPRESENTATION = {
    "type": "CodeableConcept",
    "representation": "string",
    "attachment": "Attachment",
}

# SubstanceSpecification.name nests recursively via synonym/translation;
# one structured level
_SS_NAME_LEAF = {
    "name": "string",
    "type": "CodeableConcept",
    "status": "CodeableConcept",
    "preferred": "boolean",
    "language": ("CodeableConcept", True),
    "domain": ("CodeableConcept", True),
    "jurisdiction": ("CodeableConcept", True),
    "official": (
        {
            "authority": "CodeableConcept",
            "status": "CodeableConcept",
            "date": "dateTime",
        },
        True,
    ),
    "source": ("Reference", True),
}
_SS_NAME = {
    **_SS_NAME_LEAF,
    "synonym": (_SS_NAME_LEAF, True),
    "translation": (_SS_NAME_LEAF, True),
}

# ExampleScenario backbones (hl7.org/fhir/R4/examplescenario.html).
# containedInstance mounts at three points; process/step nest
# recursively — one structured level.
_ES_CONTAINED_INSTANCE = {"resourceId": "string", "versionId": "string"}
_ES_OPERATION = {
    "number": "string",
    "type": "string",
    "name": "string",
    "initiator": "string",
    "receiver": "string",
    "description": "markdown",
    "initiatorActive": "boolean",
    "receiverActive": "boolean",
    "request": _ES_CONTAINED_INSTANCE,
    "response": _ES_CONTAINED_INSTANCE,
}
_ES_STEP_LEAF = {"pause": "boolean", "operation": _ES_OPERATION}
_ES_PROCESS_LEAF = {
    "title": "string",
    "description": "markdown",
    "preConditions": "markdown",
    "postConditions": "markdown",
}
_ES_PROCESS = {
    **_ES_PROCESS_LEAF,
    "step": (
        {
            **_ES_STEP_LEAF,
            "process": (_ES_PROCESS_LEAF, True),
            "alternative": (
                {
                    "title": "string",
                    "description": "markdown",
                    "step": (_ES_STEP_LEAF, True),
                },
                True,
            ),
        },
        True,
    ),
}

# ImplementationGuide.definition.page nests recursively; one level
_IG_PAGE_LEAF = {
    "name[x]": ["url", "Reference"],
    "title": "string",
    "generation": "code",
}

# StructureMap backbones (hl7.org/fhir/R4/structuremap.html).
# group.rule.rule nests recursively — one structured level.
_SM_SOURCE = {
    "context": "id",
    "min": "integer",
    "max": "string",
    "type": "string",
    # defaultValue[x] is the full open-type choice in R4; transcribed
    # to the same pragmatic subset the registry uses for
    # Extension.value[x] primitives
    "defaultValue[x]": [
        "boolean", "integer", "decimal", "string", "code", "uri",
        "url", "canonical", "date", "dateTime", "instant", "time",
        "base64Binary", "positiveInt", "unsignedInt", "markdown",
        "id", "oid", "uuid",
    ],
    "element": "string",
    "listMode": "code",
    "variable": "id",
    "condition": "string",
    "check": "string",
    "logMessage": "string",
}
_SM_TARGET = {
    "context": "id",
    "contextType": "code",
    "element": "string",
    "variable": "id",
    "listMode": ("code", True),
    "listRuleId": "id",
    "transform": "code",
    "parameter": (
        {"value[x]": ["id", "string", "boolean", "integer", "decimal"]},
        True,
    ),
}
_SM_RULE_LEAF = {
    "name": "id",
    "source": (_SM_SOURCE, True),
    "target": (_SM_TARGET, True),
    "dependent": ({"name": "id", "variable": ("string", True)}, True),
    "documentation": "string",
}

# ResearchElementDefinition / EvidenceVariable effective[x] choice
_STUDY_EFFECTIVE = ["dateTime", "Period", "Duration", "Timing"]

RESOURCES: dict[str, dict] = {
    "Patient": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "name": A("HumanName"),
        "telecom": A("ContactPoint"),
        "gender": "code",
        "birthDate": "date",
        "deceased[x]": ["boolean", "dateTime"],
        "address": A("Address"),
        "maritalStatus": "CodeableConcept",
        "multipleBirth[x]": ["boolean", "integer"],
        "photo": A("Attachment"),
        "contact": A(
            {
                "relationship": A("CodeableConcept"),
                "name": "HumanName",
                "telecom": A("ContactPoint"),
                "address": "Address",
                "gender": "code",
                "organization": "Reference",
                "period": "Period",
            }
        ),
        "communication": A({"language": "CodeableConcept", "preferred": "boolean"}),
        "generalPractitioner": A("Reference"),
        "managingOrganization": "Reference",
        "link": A({"other": "Reference", "type": "code"}),
    },
    "Observation": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "partOf": A("Reference"),
        "status": "code",
        "category": A("CodeableConcept"),
        "code": "CodeableConcept",
        "subject": "Reference",
        "focus": A("Reference"),
        "encounter": "Reference",
        "effective[x]": ["dateTime", "Period", "Timing", "instant"],
        "issued": "instant",
        "performer": A("Reference"),
        "value[x]": _VALUE_CHOICE,
        "dataAbsentReason": "CodeableConcept",
        "interpretation": A("CodeableConcept"),
        "note": A("Annotation"),
        "bodySite": "CodeableConcept",
        "method": "CodeableConcept",
        "specimen": "Reference",
        "device": "Reference",
        "referenceRange": A(
            {
                "low": "SimpleQuantity",
                "high": "SimpleQuantity",
                "type": "CodeableConcept",
                "appliesTo": A("CodeableConcept"),
                "age": "Range",
                "text": "string",
            }
        ),
        "hasMember": A("Reference"),
        "derivedFrom": A("Reference"),
        "component": A(
            {
                "code": "CodeableConcept",
                "value[x]": _VALUE_CHOICE,
                "dataAbsentReason": "CodeableConcept",
                "interpretation": A("CodeableConcept"),
            }
        ),
    },
    "Encounter": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "class": "Coding",
        "type": A("CodeableConcept"),
        "serviceType": "CodeableConcept",
        "priority": "CodeableConcept",
        "subject": "Reference",
        "participant": A(
            {
                "type": A("CodeableConcept"),
                "period": "Period",
                "individual": "Reference",
            }
        ),
        "period": "Period",
        "length": "Duration",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "hospitalization": {
            "admitSource": "CodeableConcept",
            "dischargeDisposition": "CodeableConcept",
        },
        "location": A({"location": "Reference", "status": "code", "period": "Period"}),
        "serviceProvider": "Reference",
        "partOf": "Reference",
    },
    "Condition": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "clinicalStatus": "CodeableConcept",
        "verificationStatus": "CodeableConcept",
        "category": A("CodeableConcept"),
        "severity": "CodeableConcept",
        "code": "CodeableConcept",
        "bodySite": A("CodeableConcept"),
        "subject": "Reference",
        "encounter": "Reference",
        "onset[x]": ["dateTime", "Age", "Period", "Range", "string"],
        "abatement[x]": ["dateTime", "Age", "Period", "Range", "string"],
        "recordedDate": "dateTime",
        "recorder": "Reference",
        "asserter": "Reference",
        "stage": A({"summary": "CodeableConcept", "assessment": A("Reference"), "type": "CodeableConcept"}),
        "evidence": A({"code": A("CodeableConcept"), "detail": A("Reference")}),
        "note": A("Annotation"),
    },
    "Procedure": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "statusReason": "CodeableConcept",
        "category": "CodeableConcept",
        "code": "CodeableConcept",
        "subject": "Reference",
        "encounter": "Reference",
        "performed[x]": ["dateTime", "Period", "string", "Age", "Range"],
        "recorder": "Reference",
        "asserter": "Reference",
        "performer": A({"function": "CodeableConcept", "actor": "Reference", "onBehalfOf": "Reference"}),
        "location": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "bodySite": A("CodeableConcept"),
        "outcome": "CodeableConcept",
        "note": A("Annotation"),
    },
    "Immunization": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "statusReason": "CodeableConcept",
        "vaccineCode": "CodeableConcept",
        "patient": "Reference",
        "encounter": "Reference",
        "occurrence[x]": ["dateTime", "string"],
        "recorded": "dateTime",
        "primarySource": "boolean",
        "location": "Reference",
        "manufacturer": "Reference",
        "lotNumber": "string",
        "expirationDate": "date",
        "site": "CodeableConcept",
        "route": "CodeableConcept",
        "doseQuantity": "SimpleQuantity",
        "note": A("Annotation"),
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
    },
    "MedicationRequest": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "statusReason": "CodeableConcept",
        "intent": "code",
        "category": A("CodeableConcept"),
        "priority": "code",
        "doNotPerform": "boolean",
        "reported[x]": ["boolean", "Reference"],
        "medication[x]": ["CodeableConcept", "Reference"],
        "subject": "Reference",
        "encounter": "Reference",
        "authoredOn": "dateTime",
        "requester": "Reference",
        "performer": "Reference",
        "recorder": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "note": A("Annotation"),
        "dosageInstruction": A("Dosage"),
        "dispenseRequest": {
            "numberOfRepeatsAllowed": "unsignedInt",
            "quantity": "SimpleQuantity",
            "expectedSupplyDuration": "Duration",
            "validityPeriod": "Period",
        },
    },
    "DiagnosticReport": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "status": "code",
        "category": A("CodeableConcept"),
        "code": "CodeableConcept",
        "subject": "Reference",
        "encounter": "Reference",
        "effective[x]": ["dateTime", "Period"],
        "issued": "instant",
        "performer": A("Reference"),
        "resultsInterpreter": A("Reference"),
        "specimen": A("Reference"),
        "result": A("Reference"),
        "conclusion": "string",
        "conclusionCode": A("CodeableConcept"),
        "presentedForm": A("Attachment"),
    },
    # hl7.org/fhir/R4/servicerequest.html
    "ServiceRequest": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiatesCanonical": A("canonical"),
        "instantiatesUri": A("uri"),
        "basedOn": A("Reference"),
        "replaces": A("Reference"),
        "requisition": "Identifier",
        "status": "code",
        "intent": "code",
        "category": A("CodeableConcept"),
        "priority": "code",
        "doNotPerform": "boolean",
        "code": "CodeableConcept",
        "orderDetail": A("CodeableConcept"),
        "quantity[x]": ["Quantity", "Ratio", "Range"],
        "subject": "Reference",
        "encounter": "Reference",
        "occurrence[x]": ["dateTime", "Period", "Timing"],
        "asNeeded[x]": ["boolean", "CodeableConcept"],
        "authoredOn": "dateTime",
        "requester": "Reference",
        "performerType": "CodeableConcept",
        "performer": A("Reference"),
        "locationCode": A("CodeableConcept"),
        "locationReference": A("Reference"),
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "insurance": A("Reference"),
        "supportingInfo": A("Reference"),
        "specimen": A("Reference"),
        "bodySite": A("CodeableConcept"),
        "note": A("Annotation"),
        "patientInstruction": "string",
        "relevantHistory": A("Reference"),
    },
    # hl7.org/fhir/R4/documentreference.html
    "DocumentReference": {
        **_DOMAIN,
        "masterIdentifier": "Identifier",
        "identifier": A("Identifier"),
        "status": "code",
        "docStatus": "code",
        "type": "CodeableConcept",
        "category": A("CodeableConcept"),
        "subject": "Reference",
        "date": "instant",
        "author": A("Reference"),
        "authenticator": "Reference",
        "custodian": "Reference",
        "relatesTo": A({"code": "code", "target": "Reference"}),
        "description": "string",
        "securityLabel": A("CodeableConcept"),
        "content": A({"attachment": "Attachment", "format": "Coding"}),
        "context": {
            "encounter": A("Reference"),
            "event": A("CodeableConcept"),
            "period": "Period",
            "facilityType": "CodeableConcept",
            "practiceSetting": "CodeableConcept",
            "sourcePatientInfo": "Reference",
            "related": A("Reference"),
        },
    },
    "Claim": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "type": "CodeableConcept",
        "subType": "CodeableConcept",
        "use": "code",
        "patient": "Reference",
        "billablePeriod": "Period",
        "created": "dateTime",
        "enterer": "Reference",
        "insurer": "Reference",
        "provider": "Reference",
        "priority": "CodeableConcept",
        "prescription": "Reference",
        "supportingInfo": A(
            {
                "sequence": "positiveInt",
                "category": "CodeableConcept",
                "code": "CodeableConcept",
                "timing[x]": ["date", "Period"],
                "value[x]": ["boolean", "string", "Quantity", "Attachment", "Reference"],
            }
        ),
        "diagnosis": A(
            {
                "sequence": "positiveInt",
                "diagnosis[x]": ["CodeableConcept", "Reference"],
                "type": A("CodeableConcept"),
            }
        ),
        "procedure": A(
            {
                "sequence": "positiveInt",
                "date": "dateTime",
                "procedure[x]": ["CodeableConcept", "Reference"],
            }
        ),
        "insurance": A(
            {
                "sequence": "positiveInt",
                "focal": "boolean",
                "coverage": "Reference",
            }
        ),
        "item": A(
            {
                "sequence": "positiveInt",
                "diagnosisSequence": A("positiveInt"),
                "procedureSequence": A("positiveInt"),
                "informationSequence": A("positiveInt"),
                "category": "CodeableConcept",
                "productOrService": "CodeableConcept",
                "serviced[x]": ["date", "Period"],
                "location[x]": ["CodeableConcept", "Address", "Reference"],
                "quantity": "SimpleQuantity",
                "unitPrice": "Money",
                "factor": "decimal",
                "net": "Money",
                "encounter": A("Reference"),
            }
        ),
        "total": "Money",
    },
    "Organization": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "type": A("CodeableConcept"),
        "name": "string",
        "alias": A("string"),
        "telecom": A("ContactPoint"),
        "address": A("Address"),
        "partOf": "Reference",
        "contact": A(
            {
                "purpose": "CodeableConcept",
                "name": "HumanName",
                "telecom": A("ContactPoint"),
                "address": "Address",
            }
        ),
    },
    "Practitioner": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "name": A("HumanName"),
        "telecom": A("ContactPoint"),
        "address": A("Address"),
        "gender": "code",
        "birthDate": "date",
        "qualification": A(
            {
                "identifier": A("Identifier"),
                "code": "CodeableConcept",
                "period": "Period",
                "issuer": "Reference",
            }
        ),
    },
    "Location": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "name": "string",
        "description": "string",
        "mode": "code",
        "type": A("CodeableConcept"),
        "telecom": A("ContactPoint"),
        "address": "Address",
        "physicalType": "CodeableConcept",
        "position": {
            "longitude": "decimal",
            "latitude": "decimal",
            "altitude": "decimal",
        },
        "managingOrganization": "Reference",
        "partOf": "Reference",
    },
    "AllergyIntolerance": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "clinicalStatus": "CodeableConcept",
        "verificationStatus": "CodeableConcept",
        "type": "code",
        "category": A("code"),
        "criticality": "code",
        "code": "CodeableConcept",
        "patient": "Reference",
        "encounter": "Reference",
        "onset[x]": ["dateTime", "Age", "Period", "Range", "string"],
        "recordedDate": "dateTime",
        "recorder": "Reference",
        "asserter": "Reference",
        "lastOccurrence": "dateTime",
        "note": A("Annotation"),
        "reaction": A(
            {
                "substance": "CodeableConcept",
                "manifestation": A("CodeableConcept"),
                "description": "string",
                "onset": "dateTime",
                "severity": "code",
                "exposureRoute": "CodeableConcept",
            }
        ),
    },
    "CareTeam": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "category": A("CodeableConcept"),
        "name": "string",
        "subject": "Reference",
        "encounter": "Reference",
        "period": "Period",
        "participant": A(
            {
                "role": A("CodeableConcept"),
                "member": "Reference",
                "onBehalfOf": "Reference",
                "period": "Period",
            }
        ),
        "reasonCode": A("CodeableConcept"),
        "managingOrganization": A("Reference"),
    },
    "CarePlan": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "replaces": A("Reference"),
        "partOf": A("Reference"),
        "status": "code",
        "intent": "code",
        "category": A("CodeableConcept"),
        "title": "string",
        "description": "string",
        "subject": "Reference",
        "encounter": "Reference",
        "period": "Period",
        "created": "dateTime",
        "author": "Reference",
        "careTeam": A("Reference"),
        "addresses": A("Reference"),
        "goal": A("Reference"),
        "activity": A(
            {
                "outcomeCodeableConcept": A("CodeableConcept"),
                "outcomeReference": A("Reference"),
                "detail": {
                    "kind": "code",
                    "code": "CodeableConcept",
                    "status": "code",
                    "statusReason": "CodeableConcept",
                    "doNotPerform": "boolean",
                    "scheduled[x]": ["Timing", "Period", "string"],
                    "location": "Reference",
                    "description": "string",
                },
            }
        ),
    },
    "Device": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "distinctIdentifier": "string",
        "manufacturer": "string",
        "manufactureDate": "dateTime",
        "expirationDate": "dateTime",
        "lotNumber": "string",
        "serialNumber": "string",
        "deviceName": A({"name": "string", "type": "code"}),
        "modelNumber": "string",
        "type": "CodeableConcept",
        "patient": "Reference",
        "owner": "Reference",
        "location": "Reference",
        "udiCarrier": A(
            {
                "deviceIdentifier": "string",
                "issuer": "uri",
                "jurisdiction": "uri",
                "carrierHRF": "string",
                "entryType": "code",
            }
        ),
    },
    "ExplanationOfBenefit": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "type": "CodeableConcept",
        "subType": "CodeableConcept",
        "use": "code",
        "patient": "Reference",
        "billablePeriod": "Period",
        "created": "dateTime",
        "enterer": "Reference",
        "insurer": "Reference",
        "provider": "Reference",
        "priority": "CodeableConcept",
        "related": A(
            {
                "claim": "Reference",
                "relationship": "CodeableConcept",
                "reference": "Identifier",
            }
        ),
        "prescription": "Reference",
        "originalPrescription": "Reference",
        "payee": {"type": "CodeableConcept", "party": "Reference"},
        "referral": "Reference",
        "facility": "Reference",
        "claim": "Reference",
        "claimResponse": "Reference",
        "outcome": "code",
        "disposition": "string",
        "preAuthRef": A("string"),
        "precedence": "positiveInt",
        "careTeam": A(
            {
                "sequence": "positiveInt",
                "provider": "Reference",
                "responsible": "boolean",
                "role": "CodeableConcept",
                "qualification": "CodeableConcept",
            }
        ),
        "supportingInfo": A(
            {
                "sequence": "positiveInt",
                "category": "CodeableConcept",
                "code": "CodeableConcept",
                "timing[x]": ["date", "Period"],
                "value[x]": ["boolean", "string", "Quantity", "Attachment", "Reference"],
                "reason": "Coding",
            }
        ),
        "diagnosis": A(
            {
                "sequence": "positiveInt",
                "diagnosis[x]": ["CodeableConcept", "Reference"],
                "type": A("CodeableConcept"),
                "onAdmission": "CodeableConcept",
                "packageCode": "CodeableConcept",
            }
        ),
        "procedure": A(
            {
                "sequence": "positiveInt",
                "type": A("CodeableConcept"),
                "date": "dateTime",
                "procedure[x]": ["CodeableConcept", "Reference"],
                "udi": A("Reference"),
            }
        ),
        "insurance": A(
            {
                "focal": "boolean",
                "coverage": "Reference",
                "preAuthRef": A("string"),
            }
        ),
        "accident": {
            "date": "date",
            "type": "CodeableConcept",
            "location[x]": ["Address", "Reference"],
        },
        "item": A(
            {
                "sequence": "positiveInt",
                "careTeamSequence": A("positiveInt"),
                "diagnosisSequence": A("positiveInt"),
                "procedureSequence": A("positiveInt"),
                "informationSequence": A("positiveInt"),
                "revenue": "CodeableConcept",
                "category": "CodeableConcept",
                "productOrService": "CodeableConcept",
                "modifier": A("CodeableConcept"),
                "programCode": A("CodeableConcept"),
                "serviced[x]": ["date", "Period"],
                "location[x]": ["CodeableConcept", "Address", "Reference"],
                "quantity": "SimpleQuantity",
                "unitPrice": "Money",
                "factor": "decimal",
                "net": "Money",
                "udi": A("Reference"),
                "bodySite": "CodeableConcept",
                "subSite": A("CodeableConcept"),
                "encounter": A("Reference"),
                "noteNumber": A("positiveInt"),
                "adjudication": A(
                    {
                        "category": "CodeableConcept",
                        "reason": "CodeableConcept",
                        "amount": "Money",
                        "value": "decimal",
                    }
                ),
            }
        ),
        "total": A({"category": "CodeableConcept", "amount": "Money"}),
        "payment": {
            "type": "CodeableConcept",
            "adjustment": "Money",
            "adjustmentReason": "CodeableConcept",
            "date": "date",
            "amount": "Money",
            "identifier": "Identifier",
        },
    },
    "Medication": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "code": "CodeableConcept",
        "status": "code",
        "manufacturer": "Reference",
        "form": "CodeableConcept",
        "amount": "Ratio",
        "ingredient": A(
            {
                "item[x]": ["CodeableConcept", "Reference"],
                "isActive": "boolean",
                "strength": "Ratio",
            }
        ),
        "batch": {"lotNumber": "string", "expirationDate": "dateTime"},
    },
    "MedicationAdministration": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiates": A("uri"),
        "partOf": A("Reference"),
        "status": "code",
        "statusReason": A("CodeableConcept"),
        "category": "CodeableConcept",
        "medication[x]": ["CodeableConcept", "Reference"],
        "subject": "Reference",
        "context": "Reference",
        "supportingInformation": A("Reference"),
        "effective[x]": ["dateTime", "Period"],
        "performer": A({"function": "CodeableConcept", "actor": "Reference"}),
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "request": "Reference",
        "device": A("Reference"),
        "note": A("Annotation"),
        "dosage": {
            "text": "string",
            "site": "CodeableConcept",
            "route": "CodeableConcept",
            "method": "CodeableConcept",
            "dose": "SimpleQuantity",
            "rate[x]": ["Ratio", "SimpleQuantity"],
        },
        "eventHistory": A("Reference"),
    },
    "MedicationDispense": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "partOf": A("Reference"),
        "status": "code",
        "statusReason[x]": ["CodeableConcept", "Reference"],
        "category": "CodeableConcept",
        "medication[x]": ["CodeableConcept", "Reference"],
        "subject": "Reference",
        "context": "Reference",
        "supportingInformation": A("Reference"),
        "performer": A({"function": "CodeableConcept", "actor": "Reference"}),
        "location": "Reference",
        "authorizingPrescription": A("Reference"),
        "type": "CodeableConcept",
        "quantity": "SimpleQuantity",
        "daysSupply": "SimpleQuantity",
        "whenPrepared": "dateTime",
        "whenHandedOver": "dateTime",
        "destination": "Reference",
        "receiver": A("Reference"),
        "note": A("Annotation"),
        "dosageInstruction": A("Dosage"),
        "substitution": {
            "wasSubstituted": "boolean",
            "type": "CodeableConcept",
            "reason": A("CodeableConcept"),
            "responsibleParty": A("Reference"),
        },
        "detectedIssue": A("Reference"),
        "eventHistory": A("Reference"),
    },
    "MedicationStatement": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "partOf": A("Reference"),
        "status": "code",
        "statusReason": A("CodeableConcept"),
        "category": "CodeableConcept",
        "medication[x]": ["CodeableConcept", "Reference"],
        "subject": "Reference",
        "context": "Reference",
        "effective[x]": ["dateTime", "Period"],
        "dateAsserted": "dateTime",
        "informationSource": "Reference",
        "derivedFrom": A("Reference"),
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "note": A("Annotation"),
        "dosage": A("Dosage"),
    },
    "Specimen": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "accessionIdentifier": "Identifier",
        "status": "code",
        "type": "CodeableConcept",
        "subject": "Reference",
        "receivedTime": "dateTime",
        "parent": A("Reference"),
        "request": A("Reference"),
        "collection": {
            "collector": "Reference",
            "collected[x]": ["dateTime", "Period"],
            "duration": "Duration",
            "quantity": "SimpleQuantity",
            "method": "CodeableConcept",
            "bodySite": "CodeableConcept",
            "fastingStatus[x]": ["CodeableConcept", "Duration"],
        },
        "processing": A(
            {
                "description": "string",
                "procedure": "CodeableConcept",
                "additive": A("Reference"),
                "time[x]": ["dateTime", "Period"],
            }
        ),
        "container": A(
            {
                "identifier": A("Identifier"),
                "description": "string",
                "type": "CodeableConcept",
                "capacity": "SimpleQuantity",
                "specimenQuantity": "SimpleQuantity",
                "additive[x]": ["CodeableConcept", "Reference"],
            }
        ),
        "condition": A("CodeableConcept"),
        "note": A("Annotation"),
    },
    "Goal": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "lifecycleStatus": "code",
        "achievementStatus": "CodeableConcept",
        "category": A("CodeableConcept"),
        "priority": "CodeableConcept",
        "description": "CodeableConcept",
        "subject": "Reference",
        "start[x]": ["date", "CodeableConcept"],
        "target": A(
            {
                "measure": "CodeableConcept",
                "detail[x]": [
                    "Quantity",
                    "Range",
                    "CodeableConcept",
                    "string",
                    "boolean",
                    "integer",
                    "Ratio",
                ],
                "due[x]": ["date", "Duration"],
            }
        ),
        "statusDate": "date",
        "statusReason": "string",
        "expressedBy": "Reference",
        "addresses": A("Reference"),
        "note": A("Annotation"),
        "outcomeCode": A("CodeableConcept"),
        "outcomeReference": A("Reference"),
    },
    "RelatedPerson": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "patient": "Reference",
        "relationship": A("CodeableConcept"),
        "name": A("HumanName"),
        "telecom": A("ContactPoint"),
        "gender": "code",
        "birthDate": "date",
        "address": A("Address"),
        "photo": A("Attachment"),
        "period": "Period",
        "communication": A(
            {"language": "CodeableConcept", "preferred": "boolean"}
        ),
    },
    "Provenance": {
        **_DOMAIN,
        "target": A("Reference"),
        "occurred[x]": ["Period", "dateTime"],
        "recorded": "instant",
        "policy": A("uri"),
        "location": "Reference",
        "reason": A("CodeableConcept"),
        "activity": "CodeableConcept",
        "agent": A(_PROVENANCE_AGENT),
        "entity": A(
            {
                "role": "code",
                "what": "Reference",
                # entity.agent repeats the Provenance.agent backbone
                # (hl7.org/fhir/R4/provenance.html); shared dict, no recursion
                "agent": A(_PROVENANCE_AGENT),
            }
        ),
        "signature": A("Signature"),
    },
    "Coverage": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "type": "CodeableConcept",
        "policyHolder": "Reference",
        "subscriber": "Reference",
        "subscriberId": "string",
        "beneficiary": "Reference",
        "dependent": "string",
        "relationship": "CodeableConcept",
        "period": "Period",
        "payor": A("Reference"),
        "class": A(
            {"type": "CodeableConcept", "value": "string", "name": "string"}
        ),
        "order": "positiveInt",
        "network": "string",
        "costToBeneficiary": A(
            {
                "type": "CodeableConcept",
                "value[x]": ["SimpleQuantity", "Money"],
                "exception": A({"type": "CodeableConcept", "period": "Period"}),
            }
        ),
        "subrogation": "boolean",
        "contract": A("Reference"),
    },
    "ImagingStudy": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "modality": A("Coding"),
        "subject": "Reference",
        "encounter": "Reference",
        "started": "dateTime",
        "basedOn": A("Reference"),
        "referrer": "Reference",
        "interpreter": A("Reference"),
        "endpoint": A("Reference"),
        "numberOfSeries": "unsignedInt",
        "numberOfInstances": "unsignedInt",
        "procedureReference": "Reference",
        "procedureCode": A("CodeableConcept"),
        "location": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "note": A("Annotation"),
        "description": "string",
        "series": A(
            {
                "uid": "id",
                "number": "unsignedInt",
                "modality": "Coding",
                "description": "string",
                "numberOfInstances": "unsignedInt",
                "endpoint": A("Reference"),
                "bodySite": "Coding",
                "laterality": "Coding",
                "specimen": A("Reference"),
                "started": "dateTime",
                "performer": A(
                    {"function": "CodeableConcept", "actor": "Reference"}
                ),
                "instance": A(
                    {
                        "uid": "id",
                        "sopClass": "Coding",
                        "number": "unsignedInt",
                        "title": "string",
                    }
                ),
            }
        ),
    },
    "Appointment": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "cancelationReason": "CodeableConcept",
        "serviceCategory": A("CodeableConcept"),
        "serviceType": A("CodeableConcept"),
        "specialty": A("CodeableConcept"),
        "appointmentType": "CodeableConcept",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "priority": "unsignedInt",
        "description": "string",
        "supportingInformation": A("Reference"),
        "start": "instant",
        "end": "instant",
        "minutesDuration": "positiveInt",
        "slot": A("Reference"),
        "created": "dateTime",
        "comment": "string",
        "patientInstruction": "string",
        "basedOn": A("Reference"),
        "participant": A(
            {
                "type": A("CodeableConcept"),
                "actor": "Reference",
                "required": "code",
                "status": "code",
                "period": "Period",
            }
        ),
        "requestedPeriod": A("Period"),
    },
    "Communication": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiatesCanonical": A("canonical"),
        "instantiatesUri": A("uri"),
        "basedOn": A("Reference"),
        "partOf": A("Reference"),
        "inResponseTo": A("Reference"),
        "status": "code",
        "statusReason": "CodeableConcept",
        "category": A("CodeableConcept"),
        "priority": "code",
        "medium": A("CodeableConcept"),
        "subject": "Reference",
        "topic": "CodeableConcept",
        "about": A("Reference"),
        "encounter": "Reference",
        "sent": "dateTime",
        "received": "dateTime",
        "recipient": A("Reference"),
        "sender": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "payload": A(
            {"content[x]": ["string", "Attachment", "Reference"]}
        ),
        "note": A("Annotation"),
    },
    "Composition": {
        **_DOMAIN,
        "identifier": "Identifier",
        "status": "code",
        "type": "CodeableConcept",
        "category": A("CodeableConcept"),
        "subject": "Reference",
        "encounter": "Reference",
        "date": "dateTime",
        "author": A("Reference"),
        "title": "string",
        "confidentiality": "code",
        "attester": A(
            {"mode": "code", "time": "dateTime", "party": "Reference"}
        ),
        "custodian": "Reference",
        "relatesTo": A(
            {"code": "code", "target[x]": ["Identifier", "Reference"]}
        ),
        "event": A(
            {
                "code": A("CodeableConcept"),
                "period": "Period",
                "detail": A("Reference"),
            }
        ),
        # Composition.section nests recursively; one structured level,
        # matching the extension depth policy (deeper via JSON spill)
        "section": A(
            {
                "title": "string",
                "code": "CodeableConcept",
                "author": A("Reference"),
                "focus": "Reference",
                "text": "Narrative",
                "mode": "code",
                "orderedBy": "CodeableConcept",
                "entry": A("Reference"),
                "emptyReason": "CodeableConcept",
            }
        ),
    },
    "Consent": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "scope": "CodeableConcept",
        "category": A("CodeableConcept"),
        "patient": "Reference",
        "dateTime": "dateTime",
        "performer": A("Reference"),
        "organization": A("Reference"),
        "source[x]": ["Attachment", "Reference"],
        "policy": A({"authority": "uri", "uri": "uri"}),
        "policyRule": "CodeableConcept",
        "verification": A(
            {
                "verified": "boolean",
                "verifiedWith": "Reference",
                "verificationDate": "dateTime",
            }
        ),
        "provision": {
            "type": "code",
            "period": "Period",
            "actor": A({"role": "CodeableConcept", "reference": "Reference"}),
            "action": A("CodeableConcept"),
            "securityLabel": A("Coding"),
            "purpose": A("Coding"),
            "class": A("Coding"),
            "code": A("CodeableConcept"),
            "dataPeriod": "Period",
            "data": A({"meaning": "code", "reference": "Reference"}),
        },
    },
    "Task": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiatesCanonical": "canonical",
        "instantiatesUri": "uri",
        "basedOn": A("Reference"),
        "groupIdentifier": "Identifier",
        "partOf": A("Reference"),
        "status": "code",
        "statusReason": "CodeableConcept",
        "businessStatus": "CodeableConcept",
        "intent": "code",
        "priority": "code",
        "code": "CodeableConcept",
        "description": "string",
        "focus": "Reference",
        "for": "Reference",
        "encounter": "Reference",
        "executionPeriod": "Period",
        "authoredOn": "dateTime",
        "lastModified": "dateTime",
        "requester": "Reference",
        "performerType": A("CodeableConcept"),
        "owner": "Reference",
        "location": "Reference",
        "reasonCode": "CodeableConcept",
        "reasonReference": "Reference",
        "insurance": A("Reference"),
        "note": A("Annotation"),
        "relevantHistory": A("Reference"),
        "restriction": {
            "repetitions": "positiveInt",
            "period": "Period",
            "recipient": A("Reference"),
        },
    },
    "QuestionnaireResponse": {
        **_DOMAIN,
        "identifier": "Identifier",
        "basedOn": A("Reference"),
        "partOf": A("Reference"),
        "questionnaire": "canonical",
        "status": "code",
        "subject": "Reference",
        "encounter": "Reference",
        "authored": "dateTime",
        "author": "Reference",
        "source": "Reference",
        # item nests recursively (item.item, item.answer.item); one
        # structured answer level, as with Composition.section
        "item": A(
            {
                "linkId": "string",
                "definition": "uri",
                "text": "string",
                "answer": A(
                    {
                        "value[x]": [
                            "boolean", "decimal", "integer", "date",
                            "dateTime", "time", "string", "uri",
                            "Attachment", "Coding", "SimpleQuantity",
                            "Reference",
                        ],
                    }
                ),
            }
        ),
    },
    "PractitionerRole": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "period": "Period",
        "practitioner": "Reference",
        "organization": "Reference",
        "code": A("CodeableConcept"),
        "specialty": A("CodeableConcept"),
        "location": A("Reference"),
        "healthcareService": A("Reference"),
        "telecom": A("ContactPoint"),
        "availableTime": A(_AVAILABLE_TIME),
        "notAvailable": A(_NOT_AVAILABLE),
        "availabilityExceptions": "string",
        "endpoint": A("Reference"),
    },
    "Schedule": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "serviceCategory": A("CodeableConcept"),
        "serviceType": A("CodeableConcept"),
        "specialty": A("CodeableConcept"),
        "actor": A("Reference"),
        "planningHorizon": "Period",
        "comment": "string",
    },
    "Slot": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "serviceCategory": A("CodeableConcept"),
        "serviceType": A("CodeableConcept"),
        "specialty": A("CodeableConcept"),
        "appointmentType": "CodeableConcept",
        "schedule": "Reference",
        "status": "code",
        "start": "instant",
        "end": "instant",
        "overbooked": "boolean",
        "comment": "string",
    },
    "EpisodeOfCare": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "statusHistory": A({"status": "code", "period": "Period"}),
        "type": A("CodeableConcept"),
        "diagnosis": A(
            {
                "condition": "Reference",
                "role": "CodeableConcept",
                "rank": "positiveInt",
            }
        ),
        "patient": "Reference",
        "managingOrganization": "Reference",
        "period": "Period",
        "referralRequest": A("Reference"),
        "careManager": "Reference",
        "team": A("Reference"),
        "account": A("Reference"),
    },
    "Flag": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "category": A("CodeableConcept"),
        "code": "CodeableConcept",
        "subject": "Reference",
        "period": "Period",
        "encounter": "Reference",
        "author": "Reference",
    },
    "List": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "mode": "code",
        "title": "string",
        "code": "CodeableConcept",
        "subject": "Reference",
        "encounter": "Reference",
        "date": "dateTime",
        "source": "Reference",
        "orderedBy": "CodeableConcept",
        "note": A("Annotation"),
        "entry": A(
            {
                "flag": "CodeableConcept",
                "deleted": "boolean",
                "date": "dateTime",
                "item": "Reference",
            }
        ),
        "emptyReason": "CodeableConcept",
    },
    "HealthcareService": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "providedBy": "Reference",
        "category": A("CodeableConcept"),
        "type": A("CodeableConcept"),
        "specialty": A("CodeableConcept"),
        "location": A("Reference"),
        "name": "string",
        "comment": "string",
        "extraDetails": "markdown",
        "photo": "Attachment",
        "telecom": A("ContactPoint"),
        "coverageArea": A("Reference"),
        "serviceProvisionCode": A("CodeableConcept"),
        "eligibility": A({"code": "CodeableConcept", "comment": "markdown"}),
        "program": A("CodeableConcept"),
        "characteristic": A("CodeableConcept"),
        "communication": A("CodeableConcept"),
        "referralMethod": A("CodeableConcept"),
        "appointmentRequired": "boolean",
        "availableTime": A(_AVAILABLE_TIME),
        "notAvailable": A(_NOT_AVAILABLE),
        "availabilityExceptions": "string",
        "endpoint": A("Reference"),
    },
    "DetectedIssue": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "code": "CodeableConcept",
        "severity": "code",
        "patient": "Reference",
        "identified[x]": ["dateTime", "Period"],
        "author": "Reference",
        "implicated": A("Reference"),
        "evidence": A(
            {"code": A("CodeableConcept"), "detail": A("Reference")}
        ),
        "detail": "string",
        "reference": "uri",
        "mitigation": A(
            {
                "action": "CodeableConcept",
                "date": "dateTime",
                "author": "Reference",
            }
        ),
    },
    # --- round-6 breadth: administrative / financial -----------------------
    "Account": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "type": "CodeableConcept",
        "name": "string",
        "subject": A("Reference"),
        "servicePeriod": "Period",
        "coverage": A({"coverage": "Reference", "priority": "positiveInt"}),
        "owner": "Reference",
        "description": "string",
        "guarantor": A(
            {"party": "Reference", "onHold": "boolean", "period": "Period"}
        ),
        "partOf": "Reference",
    },
    "AppointmentResponse": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "appointment": "Reference",
        "start": "instant",
        "end": "instant",
        "participantType": A("CodeableConcept"),
        "actor": "Reference",
        "participantStatus": "code",
        "comment": "string",
    },
    "AuditEvent": {
        **_DOMAIN,
        "type": "Coding",
        "subtype": A("Coding"),
        "action": "code",
        "period": "Period",
        "recorded": "instant",
        "outcome": "code",
        "outcomeDesc": "string",
        "purposeOfEvent": A("CodeableConcept"),
        "agent": A(
            {
                "type": "CodeableConcept",
                "role": A("CodeableConcept"),
                "who": "Reference",
                "altId": "string",
                "name": "string",
                "requestor": "boolean",
                "location": "Reference",
                "policy": A("uri"),
                "media": "Coding",
                "network": {"address": "string", "type": "code"},
                "purposeOfUse": A("CodeableConcept"),
            }
        ),
        "source": {
            "site": "string",
            "observer": "Reference",
            "type": A("Coding"),
        },
        "entity": A(
            {
                "what": "Reference",
                "type": "Coding",
                "role": "Coding",
                "lifecycle": "Coding",
                "securityLabel": A("Coding"),
                "name": "string",
                "description": "string",
                "query": "base64Binary",
                "detail": A(
                    {"type": "string", "value[x]": ["string", "base64Binary"]}
                ),
            }
        ),
    },
    "Basic": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "code": "CodeableConcept",
        "subject": "Reference",
        "created": "date",
        "author": "Reference",
    },
    "BodyStructure": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "morphology": "CodeableConcept",
        "location": "CodeableConcept",
        "locationQualifier": A("CodeableConcept"),
        "description": "string",
        "image": A("Attachment"),
        "patient": "Reference",
    },
    "ChargeItem": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "definitionUri": A("uri"),
        "definitionCanonical": A("canonical"),
        "status": "code",
        "partOf": A("Reference"),
        "code": "CodeableConcept",
        "subject": "Reference",
        "context": "Reference",
        "occurrence[x]": ["dateTime", "Period", "Timing"],
        "performer": A({"function": "CodeableConcept", "actor": "Reference"}),
        "performingOrganization": "Reference",
        "requestingOrganization": "Reference",
        "costCenter": "Reference",
        "quantity": "Quantity",
        # R4 spells this element lowercase-s "bodysite"
        "bodysite": A("CodeableConcept"),
        "factorOverride": "decimal",
        "priceOverride": "Money",
        "overrideReason": "string",
        "enterer": "Reference",
        "enteredDate": "dateTime",
        "reason": A("CodeableConcept"),
        "service": A("Reference"),
        "product[x]": ["Reference", "CodeableConcept"],
        "account": A("Reference"),
        "note": A("Annotation"),
        "supportingInformation": A("Reference"),
    },
    "ClaimResponse": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "type": "CodeableConcept",
        "subType": "CodeableConcept",
        "use": "code",
        "patient": "Reference",
        "created": "dateTime",
        "insurer": "Reference",
        "requestor": "Reference",
        "request": "Reference",
        "outcome": "code",
        "disposition": "string",
        "preAuthRef": "string",
        "preAuthPeriod": "Period",
        "payeeType": "CodeableConcept",
        "item": A(
            {
                "itemSequence": "positiveInt",
                "noteNumber": A("positiveInt"),
                "adjudication": A(_ADJUDICATION),
                "detail": A(
                    {
                        "detailSequence": "positiveInt",
                        "noteNumber": A("positiveInt"),
                        "adjudication": A(_ADJUDICATION),
                        "subDetail": A(
                            {
                                "subDetailSequence": "positiveInt",
                                "noteNumber": A("positiveInt"),
                                "adjudication": A(_ADJUDICATION),
                            }
                        ),
                    }
                ),
            }
        ),
        "addItem": A(
            {
                "itemSequence": A("positiveInt"),
                "detailSequence": A("positiveInt"),
                # R4 spells this lowercase-d "subdetailSequence"
                "subdetailSequence": A("positiveInt"),
                "provider": A("Reference"),
                "productOrService": "CodeableConcept",
                "modifier": A("CodeableConcept"),
                "programCode": A("CodeableConcept"),
                "serviced[x]": ["date", "Period"],
                "location[x]": ["CodeableConcept", "Address", "Reference"],
                "quantity": "Quantity",
                "unitPrice": "Money",
                "factor": "decimal",
                "net": "Money",
                "bodySite": "CodeableConcept",
                "subSite": A("CodeableConcept"),
                "noteNumber": A("positiveInt"),
                "adjudication": A(_ADJUDICATION),
                "detail": A(
                    {
                        "productOrService": "CodeableConcept",
                        "modifier": A("CodeableConcept"),
                        "quantity": "Quantity",
                        "unitPrice": "Money",
                        "factor": "decimal",
                        "net": "Money",
                        "noteNumber": A("positiveInt"),
                        "adjudication": A(_ADJUDICATION),
                        "subDetail": A(
                            {
                                "productOrService": "CodeableConcept",
                                "modifier": A("CodeableConcept"),
                                "quantity": "Quantity",
                                "unitPrice": "Money",
                                "factor": "decimal",
                                "net": "Money",
                                "noteNumber": A("positiveInt"),
                                "adjudication": A(_ADJUDICATION),
                            }
                        ),
                    }
                ),
            }
        ),
        "adjudication": A(_ADJUDICATION),
        "total": A({"category": "CodeableConcept", "amount": "Money"}),
        "payment": {
            "type": "CodeableConcept",
            "adjustment": "Money",
            "adjustmentReason": "CodeableConcept",
            "date": "date",
            "amount": "Money",
            "identifier": "Identifier",
        },
        "fundsReserve": "CodeableConcept",
        "formCode": "CodeableConcept",
        "form": "Attachment",
        "processNote": A(
            {
                "number": "positiveInt",
                "type": "code",
                "text": "string",
                "language": "CodeableConcept",
            }
        ),
        "communicationRequest": A("Reference"),
        "insurance": A(
            {
                "sequence": "positiveInt",
                "focal": "boolean",
                "coverage": "Reference",
                "businessArrangement": "string",
                "claimResponse": "Reference",
            }
        ),
        "error": A(
            {
                "itemSequence": "positiveInt",
                "detailSequence": "positiveInt",
                "subDetailSequence": "positiveInt",
                "code": "CodeableConcept",
            }
        ),
    },
    "CoverageEligibilityRequest": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "priority": "CodeableConcept",
        "purpose": A("code"),
        "patient": "Reference",
        "serviced[x]": ["date", "Period"],
        "created": "dateTime",
        "enterer": "Reference",
        "provider": "Reference",
        "insurer": "Reference",
        "facility": "Reference",
        "supportingInfo": A(
            {
                "sequence": "positiveInt",
                "information": "Reference",
                "appliesToAll": "boolean",
            }
        ),
        "insurance": A(
            {
                "focal": "boolean",
                "coverage": "Reference",
                "businessArrangement": "string",
            }
        ),
        "item": A(
            {
                "supportingInfoSequence": A("positiveInt"),
                "category": "CodeableConcept",
                "productOrService": "CodeableConcept",
                "modifier": A("CodeableConcept"),
                "provider": "Reference",
                "quantity": "SimpleQuantity",
                "unitPrice": "Money",
                "facility": "Reference",
                "diagnosis": A(
                    {"diagnosis[x]": ["CodeableConcept", "Reference"]}
                ),
                "detail": A("Reference"),
            }
        ),
    },
    "CoverageEligibilityResponse": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "purpose": A("code"),
        "patient": "Reference",
        "serviced[x]": ["date", "Period"],
        "created": "dateTime",
        "requestor": "Reference",
        "request": "Reference",
        "outcome": "code",
        "disposition": "string",
        "insurer": "Reference",
        "insurance": A(
            {
                "coverage": "Reference",
                "inforce": "boolean",
                "benefitPeriod": "Period",
                "item": A(
                    {
                        "category": "CodeableConcept",
                        "productOrService": "CodeableConcept",
                        "modifier": A("CodeableConcept"),
                        "provider": "Reference",
                        "excluded": "boolean",
                        "name": "string",
                        "description": "string",
                        "network": "CodeableConcept",
                        "unit": "CodeableConcept",
                        "term": "CodeableConcept",
                        "benefit": A(
                            {
                                "type": "CodeableConcept",
                                "allowed[x]": ["unsignedInt", "string", "Money"],
                                "used[x]": ["unsignedInt", "string", "Money"],
                            }
                        ),
                        "authorizationRequired": "boolean",
                        "authorizationSupporting": A("CodeableConcept"),
                        "authorizationUrl": "uri",
                    }
                ),
            }
        ),
        "preAuthRef": "string",
        "form": "CodeableConcept",
        "error": A({"code": "CodeableConcept"}),
    },
    "Endpoint": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "connectionType": "Coding",
        "name": "string",
        "managingOrganization": "Reference",
        "contact": A("ContactPoint"),
        "period": "Period",
        "payloadType": A("CodeableConcept"),
        "payloadMimeType": A("code"),
        "address": "url",
        "header": A("string"),
    },
    "EnrollmentRequest": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "created": "dateTime",
        "insurer": "Reference",
        "provider": "Reference",
        "candidate": "Reference",
        "coverage": "Reference",
    },
    "EnrollmentResponse": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "request": "Reference",
        "outcome": "code",
        "disposition": "string",
        "created": "dateTime",
        "organization": "Reference",
        "requestProvider": "Reference",
    },
    "Group": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "type": "code",
        "actual": "boolean",
        "code": "CodeableConcept",
        "name": "string",
        "quantity": "unsignedInt",
        "managingEntity": "Reference",
        "characteristic": A(
            {
                "code": "CodeableConcept",
                "value[x]": [
                    "CodeableConcept", "boolean", "Quantity", "Range",
                    "Reference",
                ],
                "exclude": "boolean",
                "period": "Period",
            }
        ),
        "member": A(
            {"entity": "Reference", "period": "Period", "inactive": "boolean"}
        ),
    },
    "Invoice": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "cancelledReason": "string",
        "type": "CodeableConcept",
        "subject": "Reference",
        "recipient": "Reference",
        "date": "dateTime",
        "participant": A({"role": "CodeableConcept", "actor": "Reference"}),
        "issuer": "Reference",
        "account": "Reference",
        "lineItem": A(
            {
                "sequence": "positiveInt",
                "chargeItem[x]": ["Reference", "CodeableConcept"],
                "priceComponent": A(_PRICE_COMPONENT),
            }
        ),
        "totalPriceComponent": A(_PRICE_COMPONENT),
        "totalNet": "Money",
        "totalGross": "Money",
        "paymentTerms": "markdown",
        "note": A("Annotation"),
    },
    "Linkage": {
        **_DOMAIN,
        "active": "boolean",
        "author": "Reference",
        "item": A({"type": "code", "resource": "Reference"}),
    },
    "MessageHeader": {
        **_DOMAIN,
        "event[x]": ["Coding", "uri"],
        "destination": A(
            {
                "name": "string",
                "target": "Reference",
                "endpoint": "url",
                "receiver": "Reference",
            }
        ),
        "sender": "Reference",
        "enterer": "Reference",
        "author": "Reference",
        "source": {
            "name": "string",
            "software": "string",
            "version": "string",
            "contact": "ContactPoint",
            "endpoint": "url",
        },
        "responsible": "Reference",
        "reason": "CodeableConcept",
        "response": {"identifier": "id", "code": "code", "details": "Reference"},
        "focus": A("Reference"),
        "definition": "canonical",
    },
    "OperationOutcome": {
        **_DOMAIN,
        "issue": A(
            {
                "severity": "code",
                "code": "code",
                "details": "CodeableConcept",
                "diagnostics": "string",
                "location": A("string"),
                "expression": A("string"),
            }
        ),
    },
    "OrganizationAffiliation": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "active": "boolean",
        "period": "Period",
        "organization": "Reference",
        "participatingOrganization": "Reference",
        "network": A("Reference"),
        "code": A("CodeableConcept"),
        "specialty": A("CodeableConcept"),
        "location": A("Reference"),
        "healthcareService": A("Reference"),
        "telecom": A("ContactPoint"),
        "endpoint": A("Reference"),
    },
    "PaymentNotice": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "request": "Reference",
        "response": "Reference",
        "created": "dateTime",
        "provider": "Reference",
        "payment": "Reference",
        "paymentDate": "date",
        "payee": "Reference",
        "recipient": "Reference",
        "amount": "Money",
        "paymentStatus": "CodeableConcept",
    },
    "PaymentReconciliation": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "period": "Period",
        "created": "dateTime",
        "paymentIssuer": "Reference",
        "request": "Reference",
        "requestor": "Reference",
        "outcome": "code",
        "disposition": "string",
        "paymentDate": "date",
        "paymentAmount": "Money",
        "paymentIdentifier": "Identifier",
        "detail": A(
            {
                "identifier": "Identifier",
                "predecessor": "Identifier",
                "type": "CodeableConcept",
                "request": "Reference",
                "submitter": "Reference",
                "response": "Reference",
                "date": "date",
                "responsible": "Reference",
                "payee": "Reference",
                "amount": "Money",
            }
        ),
        "formCode": "CodeableConcept",
        "processNote": A({"type": "code", "text": "string"}),
    },
    "Person": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "name": A("HumanName"),
        "telecom": A("ContactPoint"),
        "gender": "code",
        "birthDate": "date",
        "address": A("Address"),
        "photo": "Attachment",
        "managingOrganization": "Reference",
        "active": "boolean",
        "link": A({"target": "Reference", "assurance": "code"}),
    },
    "Subscription": {
        **_DOMAIN,
        "status": "code",
        "contact": A("ContactPoint"),
        "end": "instant",
        "reason": "string",
        "criteria": "string",
        "error": "string",
        "channel": {
            "type": "code",
            "endpoint": "url",
            "payload": "code",
            "header": A("string"),
        },
    },
    "Substance": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "category": A("CodeableConcept"),
        "code": "CodeableConcept",
        "description": "string",
        "instance": A(
            {
                "identifier": "Identifier",
                "expiry": "dateTime",
                "quantity": "SimpleQuantity",
            }
        ),
        "ingredient": A(
            {
                "quantity": "Ratio",
                "substance[x]": ["CodeableConcept", "Reference"],
            }
        ),
    },
    # --- round-6 breadth: clinical ------------------------------------------
    "AdverseEvent": {
        **_DOMAIN,
        # identifier is 0..1 on AdverseEvent (unusual for R4)
        "identifier": "Identifier",
        "actuality": "code",
        "category": A("CodeableConcept"),
        "event": "CodeableConcept",
        "subject": "Reference",
        "encounter": "Reference",
        "date": "dateTime",
        "detected": "dateTime",
        "recordedDate": "dateTime",
        "resultingCondition": A("Reference"),
        "location": "Reference",
        "seriousness": "CodeableConcept",
        "severity": "CodeableConcept",
        "outcome": "CodeableConcept",
        "recorder": "Reference",
        "contributor": A("Reference"),
        "suspectEntity": A(
            {
                "instance": "Reference",
                "causality": A(
                    {
                        "assessment": "CodeableConcept",
                        "productRelatedness": "string",
                        "author": "Reference",
                        "method": "CodeableConcept",
                    }
                ),
            }
        ),
        "subjectMedicalHistory": A("Reference"),
        "referenceDocument": A("Reference"),
        "study": A("Reference"),
    },
    "ClinicalImpression": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "statusReason": "CodeableConcept",
        "code": "CodeableConcept",
        "description": "string",
        "subject": "Reference",
        "encounter": "Reference",
        "effective[x]": ["dateTime", "Period"],
        "date": "dateTime",
        "assessor": "Reference",
        "previous": "Reference",
        "problem": A("Reference"),
        "investigation": A(
            {"code": "CodeableConcept", "item": A("Reference")}
        ),
        "protocol": A("uri"),
        "summary": "string",
        "finding": A(
            {
                "itemCodeableConcept": "CodeableConcept",
                "itemReference": "Reference",
                "basis": "string",
            }
        ),
        "prognosisCodeableConcept": A("CodeableConcept"),
        "prognosisReference": A("Reference"),
        "supportingInfo": A("Reference"),
        "note": A("Annotation"),
    },
    "CommunicationRequest": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "replaces": A("Reference"),
        "groupIdentifier": "Identifier",
        "status": "code",
        "statusReason": "CodeableConcept",
        "category": A("CodeableConcept"),
        "priority": "code",
        "doNotPerform": "boolean",
        "medium": A("CodeableConcept"),
        "subject": "Reference",
        "about": A("Reference"),
        "encounter": "Reference",
        "payload": A({"content[x]": ["string", "Attachment", "Reference"]}),
        "occurrence[x]": ["dateTime", "Period"],
        "authoredOn": "dateTime",
        "requester": "Reference",
        "recipient": A("Reference"),
        "sender": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "note": A("Annotation"),
    },
    "DeviceMetric": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "type": "CodeableConcept",
        "unit": "CodeableConcept",
        "source": "Reference",
        "parent": "Reference",
        "operationalStatus": "code",
        "color": "code",
        "category": "code",
        "measurementPeriod": "Timing",
        "calibration": A(
            {"type": "code", "state": "code", "time": "instant"}
        ),
    },
    "DeviceRequest": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiatesCanonical": A("canonical"),
        "instantiatesUri": A("uri"),
        "basedOn": A("Reference"),
        "priorRequest": A("Reference"),
        "groupIdentifier": "Identifier",
        "status": "code",
        "intent": "code",
        "priority": "code",
        "code[x]": ["Reference", "CodeableConcept"],
        "parameter": A(
            {
                "code": "CodeableConcept",
                "value[x]": ["CodeableConcept", "Quantity", "Range", "boolean"],
            }
        ),
        "subject": "Reference",
        "encounter": "Reference",
        "occurrence[x]": ["dateTime", "Period", "Timing"],
        "authoredOn": "dateTime",
        "requester": "Reference",
        "performerType": "CodeableConcept",
        "performer": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "insurance": A("Reference"),
        "supportingInfo": A("Reference"),
        "note": A("Annotation"),
        "relevantHistory": A("Reference"),
    },
    "DeviceUseStatement": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "status": "code",
        "subject": "Reference",
        "derivedFrom": A("Reference"),
        "timing[x]": ["Timing", "Period", "dateTime"],
        "recordedOn": "dateTime",
        "source": "Reference",
        "device": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "bodySite": "CodeableConcept",
        "note": A("Annotation"),
    },
    "FamilyMemberHistory": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiatesCanonical": A("canonical"),
        "instantiatesUri": A("uri"),
        "status": "code",
        "dataAbsentReason": "CodeableConcept",
        "patient": "Reference",
        "date": "dateTime",
        "name": "string",
        "relationship": "CodeableConcept",
        "sex": "CodeableConcept",
        "born[x]": ["Period", "date", "string"],
        "age[x]": ["Age", "Range", "string"],
        "estimatedAge": "boolean",
        "deceased[x]": ["boolean", "Age", "Range", "date", "string"],
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "note": A("Annotation"),
        "condition": A(
            {
                "code": "CodeableConcept",
                "outcome": "CodeableConcept",
                "contributedToDeath": "boolean",
                "onset[x]": ["Age", "Range", "Period", "string"],
                "note": A("Annotation"),
            }
        ),
    },
    "ImmunizationEvaluation": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "patient": "Reference",
        "date": "dateTime",
        "authority": "Reference",
        "targetDisease": "CodeableConcept",
        "immunizationEvent": "Reference",
        "doseStatus": "CodeableConcept",
        "doseStatusReason": A("CodeableConcept"),
        "description": "string",
        "series": "string",
        "doseNumber[x]": ["positiveInt", "string"],
        "seriesDoses[x]": ["positiveInt", "string"],
    },
    "ImmunizationRecommendation": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "patient": "Reference",
        "date": "dateTime",
        "authority": "Reference",
        "recommendation": A(
            {
                "vaccineCode": A("CodeableConcept"),
                "targetDisease": "CodeableConcept",
                "contraindicatedVaccineCode": A("CodeableConcept"),
                "forecastStatus": "CodeableConcept",
                "forecastReason": A("CodeableConcept"),
                "dateCriterion": A(
                    {"code": "CodeableConcept", "value": "dateTime"}
                ),
                "description": "string",
                "series": "string",
                "doseNumber[x]": ["positiveInt", "string"],
                "seriesDoses[x]": ["positiveInt", "string"],
                "supportingImmunization": A("Reference"),
                "supportingPatientInformation": A("Reference"),
            }
        ),
    },
    "Media": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "partOf": A("Reference"),
        "status": "code",
        "type": "CodeableConcept",
        "modality": "CodeableConcept",
        "view": "CodeableConcept",
        "subject": "Reference",
        "encounter": "Reference",
        "created[x]": ["dateTime", "Period"],
        "issued": "instant",
        "operator": "Reference",
        "reasonCode": A("CodeableConcept"),
        "bodySite": "CodeableConcept",
        "deviceName": "string",
        "device": "Reference",
        "height": "positiveInt",
        "width": "positiveInt",
        "frames": "positiveInt",
        "duration": "decimal",
        "content": "Attachment",
        "note": A("Annotation"),
    },
    "MeasureReport": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "type": "code",
        "measure": "canonical",
        "subject": "Reference",
        "date": "dateTime",
        "reporter": "Reference",
        "period": "Period",
        "improvementNotation": "CodeableConcept",
        "group": A(
            {
                "code": "CodeableConcept",
                "population": A(_MR_POPULATION),
                "measureScore": "Quantity",
                "stratifier": A(
                    {
                        "code": A("CodeableConcept"),
                        "stratum": A(
                            {
                                "value": "CodeableConcept",
                                "component": A(
                                    {
                                        "code": "CodeableConcept",
                                        "value": "CodeableConcept",
                                    }
                                ),
                                "population": A(_MR_POPULATION),
                                "measureScore": "Quantity",
                            }
                        ),
                    }
                ),
            }
        ),
        "evaluatedResource": A("Reference"),
    },
    "NutritionOrder": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiatesCanonical": A("canonical"),
        "instantiatesUri": A("uri"),
        "instantiates": A("uri"),
        "status": "code",
        "intent": "code",
        "patient": "Reference",
        "encounter": "Reference",
        "dateTime": "dateTime",
        "orderer": "Reference",
        "allergyIntolerance": A("Reference"),
        "foodPreferenceModifier": A("CodeableConcept"),
        "excludeFoodModifier": A("CodeableConcept"),
        "oralDiet": {
            "type": A("CodeableConcept"),
            "schedule": A("Timing"),
            "nutrient": A(
                {"modifier": "CodeableConcept", "amount": "SimpleQuantity"}
            ),
            "texture": A(
                {"modifier": "CodeableConcept", "foodType": "CodeableConcept"}
            ),
            "fluidConsistencyType": A("CodeableConcept"),
            "instruction": "string",
        },
        "supplement": A(
            {
                "type": "CodeableConcept",
                "productName": "string",
                "schedule": A("Timing"),
                "quantity": "SimpleQuantity",
                "instruction": "string",
            }
        ),
        "enteralFormula": {
            "baseFormulaType": "CodeableConcept",
            "baseFormulaProductName": "string",
            "additiveType": "CodeableConcept",
            "additiveProductName": "string",
            "caloricDensity": "SimpleQuantity",
            # R4 spells this element lowercase-o "routeofAdministration"
            "routeofAdministration": "CodeableConcept",
            "administration": A(
                {
                    "schedule": "Timing",
                    "quantity": "SimpleQuantity",
                    "rate[x]": ["SimpleQuantity", "Ratio"],
                }
            ),
            "maxVolumeToDeliver": "SimpleQuantity",
            "administrationInstruction": "string",
        },
        "note": A("Annotation"),
    },
    "ResearchStudy": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "title": "string",
        "protocol": A("Reference"),
        "partOf": A("Reference"),
        "status": "code",
        "primaryPurposeType": "CodeableConcept",
        "phase": "CodeableConcept",
        "category": A("CodeableConcept"),
        "focus": A("CodeableConcept"),
        "condition": A("CodeableConcept"),
        "contact": A("ContactDetail"),
        "relatedArtifact": A("RelatedArtifact"),
        "keyword": A("CodeableConcept"),
        "location": A("CodeableConcept"),
        "description": "markdown",
        "enrollment": A("Reference"),
        "period": "Period",
        "sponsor": "Reference",
        "principalInvestigator": "Reference",
        "site": A("Reference"),
        "reasonStopped": "CodeableConcept",
        "note": A("Annotation"),
        "arm": A(
            {
                "name": "string",
                "type": "CodeableConcept",
                "description": "string",
            }
        ),
        "objective": A({"name": "string", "type": "CodeableConcept"}),
    },
    "ResearchSubject": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "period": "Period",
        "study": "Reference",
        "individual": "Reference",
        "assignedArm": "string",
        "actualArm": "string",
        "consent": "Reference",
    },
    "RiskAssessment": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": "Reference",
        "parent": "Reference",
        "status": "code",
        "method": "CodeableConcept",
        "code": "CodeableConcept",
        "subject": "Reference",
        "encounter": "Reference",
        "occurrence[x]": ["dateTime", "Period"],
        "condition": "Reference",
        "performer": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "basis": A("Reference"),
        "prediction": A(
            {
                "outcome": "CodeableConcept",
                "probability[x]": ["decimal", "Range"],
                "qualitativeRisk": "CodeableConcept",
                "relativeRisk": "decimal",
                "when[x]": ["Period", "Range"],
                "rationale": "string",
            }
        ),
        "mitigation": "string",
        "note": A("Annotation"),
    },
    "SupplyDelivery": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "basedOn": A("Reference"),
        "partOf": A("Reference"),
        "status": "code",
        "patient": "Reference",
        "type": "CodeableConcept",
        "suppliedItem": {
            "quantity": "SimpleQuantity",
            "item[x]": ["CodeableConcept", "Reference"],
        },
        "occurrence[x]": ["dateTime", "Period", "Timing"],
        "supplier": "Reference",
        "destination": "Reference",
        "receiver": A("Reference"),
    },
    "SupplyRequest": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "category": "CodeableConcept",
        "priority": "code",
        "item[x]": ["CodeableConcept", "Reference"],
        "quantity": "Quantity",
        "parameter": A(
            {
                "code": "CodeableConcept",
                "value[x]": ["CodeableConcept", "Quantity", "Range", "boolean"],
            }
        ),
        "occurrence[x]": ["dateTime", "Period", "Timing"],
        "authoredOn": "dateTime",
        "requester": "Reference",
        "supplier": A("Reference"),
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "deliverFrom": "Reference",
        "deliverTo": "Reference",
    },
    "VisionPrescription": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "created": "dateTime",
        "patient": "Reference",
        "encounter": "Reference",
        "dateWritten": "dateTime",
        "prescriber": "Reference",
        "lensSpecification": A(
            {
                "product": "CodeableConcept",
                "eye": "code",
                "sphere": "decimal",
                "cylinder": "decimal",
                "axis": "integer",
                "prism": A({"amount": "decimal", "base": "code"}),
                "add": "decimal",
                "power": "decimal",
                "backCurve": "decimal",
                "diameter": "decimal",
                "duration": "SimpleQuantity",
                "color": "string",
                "brand": "string",
                "note": A("Annotation"),
            }
        ),
    },
    # --- round-6 breadth: definitional / infrastructure resources -----------
    "Questionnaire": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        "derivedFrom": A("canonical"),
        "subjectType": A("code"),
        "approvalDate": "date",
        "lastReviewDate": "date",
        "effectivePeriod": "Period",
        "code": A("Coding"),
        # item nests recursively (item.item); one structured level, as
        # with QuestionnaireResponse/Composition.section
        "item": A(
            {
                "linkId": "string",
                "definition": "uri",
                "code": A("Coding"),
                "prefix": "string",
                "text": "string",
                "type": "code",
                "enableWhen": A(
                    {
                        "question": "string",
                        "operator": "code",
                        "answer[x]": [
                            "boolean", "decimal", "integer", "date",
                            "dateTime", "time", "string", "Coding",
                            "SimpleQuantity", "Reference",
                        ],
                    }
                ),
                "enableBehavior": "code",
                "required": "boolean",
                "repeats": "boolean",
                "readOnly": "boolean",
                "maxLength": "integer",
                "answerValueSet": "canonical",
                "answerOption": A(
                    {
                        "value[x]": [
                            "integer", "date", "time", "string", "Coding",
                            "Reference",
                        ],
                        "initialSelected": "boolean",
                    }
                ),
                "initial": A(
                    {
                        "value[x]": [
                            "boolean", "decimal", "integer", "date",
                            "dateTime", "time", "string", "uri",
                            "Attachment", "Coding", "SimpleQuantity",
                            "Reference",
                        ],
                    }
                ),
            }
        ),
    },
    "ValueSet": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        "immutable": "boolean",
        "compose": {
            "lockedDate": "date",
            "inactive": "boolean",
            "include": A(_VS_INCLUDE),
            "exclude": A(_VS_INCLUDE),
        },
        "expansion": {
            "identifier": "uri",
            "timestamp": "dateTime",
            "total": "integer",
            "offset": "integer",
            "parameter": A(
                {
                    "name": "string",
                    "value[x]": [
                        "string", "boolean", "integer", "decimal", "uri",
                        "code", "dateTime",
                    ],
                }
            ),
            # contains nests recursively; one structured level
            "contains": A(
                {
                    "system": "uri",
                    "abstract": "boolean",
                    "inactive": "boolean",
                    "version": "string",
                    "code": "code",
                    "display": "string",
                }
            ),
        },
    },
    "CodeSystem": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        "caseSensitive": "boolean",
        "valueSet": "canonical",
        "hierarchyMeaning": "code",
        "compositional": "boolean",
        "versionNeeded": "boolean",
        "content": "code",
        "supplements": "canonical",
        "count": "unsignedInt",
        "filter": A(
            {
                "code": "code",
                "description": "string",
                "operator": A("code"),
                "value": "string",
            }
        ),
        "property": A(
            {
                "code": "code",
                "uri": "uri",
                "description": "string",
                "type": "code",
            }
        ),
        # concept nests recursively; one structured level
        "concept": A(
            {
                "code": "code",
                "display": "string",
                "definition": "string",
                "designation": A(
                    {"language": "code", "use": "Coding", "value": "string"}
                ),
                "property": A(
                    {
                        "code": "code",
                        "value[x]": [
                            "code", "Coding", "string", "integer",
                            "boolean", "dateTime", "decimal",
                        ],
                    }
                ),
            }
        ),
    },
    "ConceptMap": {
        **_DOMAIN,
        # identifier is 0..1 on ConceptMap (unlike most canonicals)
        **{**_CANONICAL_HEADER, "identifier": "Identifier"},
        "source[x]": ["uri", "canonical"],
        "target[x]": ["uri", "canonical"],
        "group": A(
            {
                "source": "uri",
                "sourceVersion": "string",
                "target": "uri",
                "targetVersion": "string",
                "element": A(
                    {
                        "code": "code",
                        "display": "string",
                        "target": A(
                            {
                                "code": "code",
                                "display": "string",
                                "equivalence": "code",
                                "comment": "string",
                                "dependsOn": A(_CM_DEPENDS_ON),
                                "product": A(_CM_DEPENDS_ON),
                            }
                        ),
                    }
                ),
                "unmapped": {
                    "mode": "code",
                    "code": "code",
                    "display": "string",
                    "url": "canonical",
                },
            }
        ),
    },
    "Library": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        **_ARTIFACT_TAIL,
        "subtitle": "string",
        "type": "CodeableConcept",
        "subject[x]": ["CodeableConcept", "Reference"],
        "usage": "string",
        "parameter": A("ParameterDefinition"),
        "dataRequirement": A("DataRequirement"),
        "content": A("Attachment"),
    },
    "Measure": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        **_ARTIFACT_TAIL,
        "subtitle": "string",
        "subject[x]": ["CodeableConcept", "Reference"],
        "usage": "string",
        "library": A("canonical"),
        "disclaimer": "markdown",
        "scoring": "CodeableConcept",
        "compositeScoring": "CodeableConcept",
        "type": A("CodeableConcept"),
        "riskAdjustment": "string",
        "rateAggregation": "string",
        "rationale": "markdown",
        "clinicalRecommendationStatement": "markdown",
        "improvementNotation": "CodeableConcept",
        "definition": A("markdown"),
        "guidance": "markdown",
        "group": A(
            {
                "code": "CodeableConcept",
                "description": "string",
                "population": A(
                    {
                        "code": "CodeableConcept",
                        "description": "string",
                        "criteria": "Expression",
                    }
                ),
                "stratifier": A(
                    {
                        "code": "CodeableConcept",
                        "description": "string",
                        "criteria": "Expression",
                        "component": A(
                            {
                                "code": "CodeableConcept",
                                "description": "string",
                                "criteria": "Expression",
                            }
                        ),
                    }
                ),
            }
        ),
        "supplementalData": A(
            {
                "code": "CodeableConcept",
                "usage": A("CodeableConcept"),
                "description": "string",
                "criteria": "Expression",
            }
        ),
    },
    "PlanDefinition": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        **_ARTIFACT_TAIL,
        "subtitle": "string",
        "type": "CodeableConcept",
        "subject[x]": ["CodeableConcept", "Reference"],
        "usage": "string",
        "library": A("canonical"),
        "goal": A(
            {
                "category": "CodeableConcept",
                "description": "CodeableConcept",
                "priority": "CodeableConcept",
                "start": "CodeableConcept",
                "addresses": A("CodeableConcept"),
                "documentation": A("RelatedArtifact"),
                "target": A(
                    {
                        "measure": "CodeableConcept",
                        "detail[x]": ["Quantity", "Range", "CodeableConcept"],
                        "due": "Duration",
                    }
                ),
            }
        ),
        # action nests recursively; one structured level
        "action": A(
            {
                "prefix": "string",
                "title": "string",
                "description": "string",
                "textEquivalent": "string",
                "priority": "code",
                "code": A("CodeableConcept"),
                "reason": A("CodeableConcept"),
                "documentation": A("RelatedArtifact"),
                "goalId": A("id"),
                "subject[x]": ["CodeableConcept", "Reference"],
                "trigger": A("TriggerDefinition"),
                "condition": A({"kind": "code", "expression": "Expression"}),
                "input": A("DataRequirement"),
                "output": A("DataRequirement"),
                "relatedAction": A(
                    {
                        "actionId": "id",
                        "relationship": "code",
                        "offset[x]": ["Duration", "Range"],
                    }
                ),
                "timing[x]": [
                    "dateTime", "Age", "Period", "Duration", "Range", "Timing",
                ],
                "participant": A({"type": "code", "role": "CodeableConcept"}),
                "type": "CodeableConcept",
                "groupingBehavior": "code",
                "selectionBehavior": "code",
                "requiredBehavior": "code",
                "precheckBehavior": "code",
                "cardinalityBehavior": "code",
                "definition[x]": ["canonical", "uri"],
                "transform": "canonical",
                "dynamicValue": A(
                    {"path": "string", "expression": "Expression"}
                ),
            }
        ),
    },
    "ActivityDefinition": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        **_ARTIFACT_TAIL,
        "subtitle": "string",
        "subject[x]": ["CodeableConcept", "Reference"],
        "usage": "string",
        "library": A("canonical"),
        "kind": "code",
        "profile": "canonical",
        "code": "CodeableConcept",
        "intent": "code",
        "priority": "code",
        "doNotPerform": "boolean",
        "timing[x]": ["Timing", "dateTime", "Age", "Period", "Range", "Duration"],
        "location": "Reference",
        "participant": A({"type": "code", "role": "CodeableConcept"}),
        "product[x]": ["Reference", "CodeableConcept"],
        "quantity": "SimpleQuantity",
        "dosage": A("Dosage"),
        "bodySite": A("CodeableConcept"),
        "specimenRequirement": A("Reference"),
        "observationRequirement": A("Reference"),
        "observationResultRequirement": A("Reference"),
        "transform": "canonical",
        "dynamicValue": A({"path": "string", "expression": "Expression"}),
    },
    "Bundle": {
        **_RESOURCE_BASE,
        "identifier": "Identifier",
        "type": "code",
        "timestamp": "instant",
        "total": "unsignedInt",
        "link": A(_BUNDLE_LINK),
        # entry.resource holds an ARBITRARY resource — untypeable as one
        # static column; Parquet-on-FHIR splits bundles per resourceType
        # at encode (fhir/encode.py mixed-NDJSON split), so the registry
        # omits it and data-driven derivation types any residue.
        "entry": A(
            {
                "link": A(_BUNDLE_LINK),
                "fullUrl": "uri",
                "search": {"mode": "code", "score": "decimal"},
                "request": {
                    "method": "code",
                    "url": "uri",
                    "ifNoneMatch": "string",
                    "ifModifiedSince": "instant",
                    "ifMatch": "string",
                    "ifNoneExist": "string",
                },
                "response": {
                    "status": "string",
                    "location": "uri",
                    "etag": "string",
                    "lastModified": "instant",
                },
            }
        ),
        "signature": "Signature",
    },
    "Parameters": {
        **_RESOURCE_BASE,
        # part nests recursively (and resource holds arbitrary
        # resources); one structured level, common value[x] subset
        "parameter": A(
            {
                "name": "string",
                "value[x]": [
                    "boolean", "integer", "decimal", "string", "code",
                    "uri", "date", "dateTime", "Coding", "CodeableConcept",
                    "Quantity", "Reference", "Period", "Identifier",
                ],
                "part": A(
                    {
                        "name": "string",
                        "value[x]": [
                            "boolean", "integer", "decimal", "string",
                            "code", "uri", "date", "dateTime", "Coding",
                            "CodeableConcept", "Quantity", "Reference",
                        ],
                    }
                ),
            }
        ),
    },
    "Binary": {
        **_RESOURCE_BASE,
        "contentType": "code",
        "securityContext": "Reference",
        "data": "base64Binary",
    },
    # --- round-6 second batch: conformance / catalog / misc tier ------------
    "StructureDefinition": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        "keyword": A("Coding"),
        "fhirVersion": "code",
        "mapping": A(
            {
                "identity": "id",
                "uri": "uri",
                "name": "string",
                "comment": "string",
            }
        ),
        "kind": "code",
        "abstract": "boolean",
        "context": A({"type": "code", "expression": "string"}),
        "contextInvariant": A("string"),
        "type": "uri",
        "baseDefinition": "canonical",
        "derivation": "code",
        "snapshot": {"element": A(_ELEMENT_DEF)},
        "differential": {"element": A(_ELEMENT_DEF)},
    },
    "SearchParameter": {
        **_DOMAIN,
        # SearchParameter has no identifier element in R4
        **{k: v for k, v in _CANONICAL_HEADER.items() if k != "identifier"},
        "derivedFrom": "canonical",
        "code": "code",
        "base": A("code"),
        "type": "code",
        "expression": "string",
        "xpath": "string",
        "xpathUsage": "code",
        "target": A("code"),
        "multipleOr": "boolean",
        "multipleAnd": "boolean",
        "comparator": A("code"),
        "modifier": A("code"),
        "chain": A("string"),
        "component": A({"definition": "canonical", "expression": "string"}),
    },
    "NamingSystem": {
        **_DOMAIN,
        "name": "string",
        "status": "code",
        "kind": "code",
        "date": "dateTime",
        "publisher": "string",
        "contact": A("ContactDetail"),
        "responsible": "string",
        "type": "CodeableConcept",
        "description": "markdown",
        "useContext": A("UsageContext"),
        "jurisdiction": A("CodeableConcept"),
        "usage": "string",
        "uniqueId": A(
            {
                "type": "code",
                "value": "string",
                "preferred": "boolean",
                "comment": "string",
                "period": "Period",
            }
        ),
    },
    "DocumentManifest": {
        **_DOMAIN,
        "masterIdentifier": "Identifier",
        "identifier": A("Identifier"),
        "status": "code",
        "type": "CodeableConcept",
        "subject": "Reference",
        "created": "dateTime",
        "author": A("Reference"),
        "recipient": A("Reference"),
        "source": "uri",
        "description": "string",
        "content": A("Reference"),
        "related": A({"identifier": "Identifier", "ref": "Reference"}),
    },
    "RequestGroup": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "instantiatesCanonical": A("canonical"),
        "instantiatesUri": A("uri"),
        "basedOn": A("Reference"),
        "replaces": A("Reference"),
        "groupIdentifier": "Identifier",
        "status": "code",
        "intent": "code",
        "priority": "code",
        "code": "CodeableConcept",
        "subject": "Reference",
        "encounter": "Reference",
        "authoredOn": "dateTime",
        "author": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "note": A("Annotation"),
        # action nests recursively; one structured level
        "action": A(
            {
                "prefix": "string",
                "title": "string",
                "description": "string",
                "textEquivalent": "string",
                "priority": "code",
                "code": A("CodeableConcept"),
                "documentation": A("RelatedArtifact"),
                "condition": A({"kind": "code", "expression": "Expression"}),
                "relatedAction": A(
                    {
                        "actionId": "id",
                        "relationship": "code",
                        "offset[x]": ["Duration", "Range"],
                    }
                ),
                "timing[x]": [
                    "dateTime", "Age", "Period", "Duration", "Range", "Timing",
                ],
                "participant": A("Reference"),
                "type": "CodeableConcept",
                "groupingBehavior": "code",
                "selectionBehavior": "code",
                "requiredBehavior": "code",
                "precheckBehavior": "code",
                "cardinalityBehavior": "code",
                "resource": "Reference",
            }
        ),
    },
    "GuidanceResponse": {
        **_DOMAIN,
        "requestIdentifier": "Identifier",
        "identifier": A("Identifier"),
        "module[x]": ["uri", "canonical", "CodeableConcept"],
        "status": "code",
        "subject": "Reference",
        "encounter": "Reference",
        "occurrenceDateTime": "dateTime",
        "performer": "Reference",
        "reasonCode": A("CodeableConcept"),
        "reasonReference": A("Reference"),
        "note": A("Annotation"),
        "evaluationMessage": A("Reference"),
        "outputParameters": "Reference",
        "result": "Reference",
        "dataRequirement": A("DataRequirement"),
    },
    "DeviceDefinition": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "udiDeviceIdentifier": A(
            {
                "deviceIdentifier": "string",
                "issuer": "uri",
                "jurisdiction": "uri",
            }
        ),
        "manufacturer[x]": ["string", "Reference"],
        "deviceName": A({"name": "string", "type": "code"}),
        "modelNumber": "string",
        "type": "CodeableConcept",
        "specialization": A({"systemType": "string", "version": "string"}),
        "version": A("string"),
        "safety": A("CodeableConcept"),
        "languageCode": A("CodeableConcept"),
        "capability": A(
            {"type": "CodeableConcept", "description": A("CodeableConcept")}
        ),
        "property": A(
            {
                "type": "CodeableConcept",
                "valueQuantity": A("Quantity"),
                "valueCode": A("CodeableConcept"),
            }
        ),
        "owner": "Reference",
        "contact": A("ContactPoint"),
        "url": "uri",
        "onlineInformation": "uri",
        "note": A("Annotation"),
        "quantity": "Quantity",
        "parentDevice": "Reference",
        "material": A(
            {
                "substance": "CodeableConcept",
                "alternate": "boolean",
                "allergenicIndicator": "boolean",
            }
        ),
    },
    "SpecimenDefinition": {
        **_DOMAIN,
        # identifier is 0..1 on SpecimenDefinition
        "identifier": "Identifier",
        "typeCollected": "CodeableConcept",
        "patientPreparation": A("CodeableConcept"),
        "timeAspect": "string",
        "collection": A("CodeableConcept"),
        "typeTested": A(
            {
                "isDerived": "boolean",
                "type": "CodeableConcept",
                "preference": "code",
                "container": {
                    "material": "CodeableConcept",
                    "type": "CodeableConcept",
                    "cap": "CodeableConcept",
                    "description": "string",
                    "capacity": "SimpleQuantity",
                    "minimumVolume[x]": ["SimpleQuantity", "string"],
                    "additive": A(
                        {"additive[x]": ["CodeableConcept", "Reference"]}
                    ),
                    "preparation": "string",
                },
                "requirement": "string",
                "retentionTime": "Duration",
                "rejectionCriterion": A("CodeableConcept"),
                "handling": A(
                    {
                        "temperatureQualifier": "CodeableConcept",
                        "temperatureRange": "Range",
                        "maxDuration": "Duration",
                        "instruction": "string",
                    }
                ),
            }
        ),
    },
    "ObservationDefinition": {
        **_DOMAIN,
        "category": A("CodeableConcept"),
        "code": "CodeableConcept",
        "identifier": A("Identifier"),
        "permittedDataType": A("code"),
        "multipleResultsAllowed": "boolean",
        "method": "CodeableConcept",
        "preferredReportName": "string",
        "quantitativeDetails": {
            "customaryUnit": "CodeableConcept",
            "unit": "CodeableConcept",
            "conversionFactor": "decimal",
            "decimalPrecision": "integer",
        },
        "qualifiedInterval": A(
            {
                "category": "code",
                "range": "Range",
                "context": "CodeableConcept",
                "appliesTo": A("CodeableConcept"),
                "gender": "code",
                "age": "Range",
                "gestationalAge": "Range",
                "condition": "string",
            }
        ),
        "validCodedValueSet": "Reference",
        "normalCodedValueSet": "Reference",
        "abnormalCodedValueSet": "Reference",
        "criticalCodedValueSet": "Reference",
    },
    "InsurancePlan": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "status": "code",
        "type": A("CodeableConcept"),
        "name": "string",
        "alias": A("string"),
        "period": "Period",
        "ownedBy": "Reference",
        "administeredBy": "Reference",
        "coverageArea": A("Reference"),
        "contact": A(
            {
                "purpose": "CodeableConcept",
                "name": "HumanName",
                "telecom": A("ContactPoint"),
                "address": "Address",
            }
        ),
        "endpoint": A("Reference"),
        "network": A("Reference"),
        "coverage": A(
            {
                "type": "CodeableConcept",
                "network": A("Reference"),
                "benefit": A(
                    {
                        "type": "CodeableConcept",
                        "requirement": "string",
                        "limit": A(
                            {"value": "Quantity", "code": "CodeableConcept"}
                        ),
                    }
                ),
            }
        ),
        "plan": A(
            {
                "identifier": A("Identifier"),
                "type": "CodeableConcept",
                "coverageArea": A("Reference"),
                "network": A("Reference"),
                "generalCost": A(
                    {
                        "type": "CodeableConcept",
                        "groupSize": "positiveInt",
                        "cost": "Money",
                        "comment": "string",
                    }
                ),
                "specificCost": A(
                    {
                        "category": "CodeableConcept",
                        "benefit": A(
                            {
                                "type": "CodeableConcept",
                                "cost": A(
                                    {
                                        "type": "CodeableConcept",
                                        "applicability": "CodeableConcept",
                                        "qualifiers": A("CodeableConcept"),
                                        "value": "Quantity",
                                    }
                                ),
                            }
                        ),
                    }
                ),
            }
        ),
    },
    "VerificationResult": {
        **_DOMAIN,
        "target": A("Reference"),
        "targetLocation": A("string"),
        "need": "CodeableConcept",
        "status": "code",
        "statusDate": "dateTime",
        "validationType": "CodeableConcept",
        "validationProcess": A("CodeableConcept"),
        "frequency": "Timing",
        "lastPerformed": "dateTime",
        "nextScheduled": "date",
        "failureAction": "CodeableConcept",
        "primarySource": A(
            {
                "who": "Reference",
                "type": A("CodeableConcept"),
                "communicationMethod": A("CodeableConcept"),
                "validationStatus": "CodeableConcept",
                "validationDate": "dateTime",
                "canPushUpdates": "CodeableConcept",
                "pushTypeAvailable": A("CodeableConcept"),
            }
        ),
        "attestation": {
            "who": "Reference",
            "onBehalfOf": "Reference",
            "communicationMethod": "CodeableConcept",
            "date": "date",
            "sourceIdentityCertificate": "string",
            "proxyIdentityCertificate": "string",
            "proxySignature": "Signature",
            "sourceSignature": "Signature",
        },
        "validator": A(
            {
                "organization": "Reference",
                "identityCertificate": "string",
                "attestationSignature": "Signature",
            }
        ),
    },
    "CapabilityStatement": {
        **_DOMAIN,
        # CapabilityStatement has no identifier element in R4
        **{k: v for k, v in _CANONICAL_HEADER.items() if k != "identifier"},
        "kind": "code",
        "instantiates": A("canonical"),
        "imports": A("canonical"),
        "software": {
            "name": "string",
            "version": "string",
            "releaseDate": "dateTime",
        },
        "implementation": {
            "description": "string",
            "url": "url",
            "custodian": "Reference",
        },
        "fhirVersion": "code",
        "format": A("code"),
        "patchFormat": A("code"),
        "implementationGuide": A("canonical"),
        "rest": A(
            {
                "mode": "code",
                "documentation": "markdown",
                "security": {
                    "cors": "boolean",
                    "service": A("CodeableConcept"),
                    "description": "markdown",
                },
                "resource": A(
                    {
                        "type": "code",
                        "profile": "canonical",
                        "supportedProfile": A("canonical"),
                        "documentation": "markdown",
                        "interaction": A(_CAP_INTERACTION),
                        "versioning": "code",
                        "readHistory": "boolean",
                        "updateCreate": "boolean",
                        "conditionalCreate": "boolean",
                        "conditionalRead": "code",
                        "conditionalUpdate": "boolean",
                        "conditionalDelete": "code",
                        "referencePolicy": A("code"),
                        "searchInclude": A("string"),
                        "searchRevInclude": A("string"),
                        "searchParam": A(_CAP_SEARCH_PARAM),
                        "operation": A(_CAP_OPERATION),
                    }
                ),
                "interaction": A(_CAP_INTERACTION),
                "searchParam": A(_CAP_SEARCH_PARAM),
                "operation": A(_CAP_OPERATION),
                "compartment": A("canonical"),
            }
        ),
        "messaging": A(
            {
                "endpoint": A({"protocol": "Coding", "address": "url"}),
                "reliableCache": "unsignedInt",
                "documentation": "markdown",
                "supportedMessage": A(
                    {"mode": "code", "definition": "canonical"}
                ),
            }
        ),
        "document": A(
            {
                "mode": "code",
                "documentation": "markdown",
                "profile": "canonical",
            }
        ),
    },
    "OperationDefinition": {
        **_DOMAIN,
        # OperationDefinition has no identifier element in R4
        **{k: v for k, v in _CANONICAL_HEADER.items() if k != "identifier"},
        "kind": "code",
        "affectsState": "boolean",
        "code": "code",
        "comment": "markdown",
        "base": "canonical",
        "resource": A("code"),
        "system": "boolean",
        "type": "boolean",
        "instance": "boolean",
        "inputProfile": "canonical",
        "outputProfile": "canonical",
        # parameter.part nests recursively; one structured level
        "parameter": A(
            {
                "name": "code",
                "use": "code",
                "min": "integer",
                "max": "string",
                "documentation": "string",
                "type": "code",
                "targetProfile": A("canonical"),
                "searchType": "code",
                "binding": {"strength": "code", "valueSet": "canonical"},
                "referencedFrom": A(
                    {"source": "string", "sourceId": "string"}
                ),
            }
        ),
        "overload": A(
            {"parameterName": A("string"), "comment": "string"}
        ),
    },
    "MessageDefinition": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        "replaces": A("canonical"),
        "base": "canonical",
        "parent": A("canonical"),
        "event[x]": ["Coding", "uri"],
        "category": "code",
        "focus": A(
            {
                "code": "code",
                "profile": "canonical",
                "min": "unsignedInt",
                "max": "string",
            }
        ),
        "responseRequired": "code",
        "allowedResponse": A(
            {"message": "canonical", "situation": "markdown"}
        ),
        "graph": A("canonical"),
    },
    "EventDefinition": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        **_ARTIFACT_TAIL,
        "subtitle": "string",
        "subject[x]": ["CodeableConcept", "Reference"],
        "usage": "string",
        "trigger": A("TriggerDefinition"),
    },
    "ChargeItemDefinition": {
        **_DOMAIN,
        # ChargeItemDefinition has title but NO name element
        **{k: v for k, v in _CANONICAL_HEADER.items() if k != "name"},
        "derivedFromUri": A("uri"),
        "partOf": A("canonical"),
        "replaces": A("canonical"),
        "approvalDate": "date",
        "lastReviewDate": "date",
        "effectivePeriod": "Period",
        "code": "CodeableConcept",
        "instance": A("Reference"),
        "applicability": A(
            {
                "description": "string",
                "language": "string",
                "expression": "string",
            }
        ),
        "propertyGroup": A(
            {
                "applicability": A(
                    {
                        "description": "string",
                        "language": "string",
                        "expression": "string",
                    }
                ),
                "priceComponent": A(
                    {
                        "type": "code",
                        "code": "CodeableConcept",
                        "factor": "decimal",
                        "amount": "Money",
                    }
                ),
            }
        ),
    },
    "CompartmentDefinition": {
        **_DOMAIN,
        "url": "uri",
        "version": "string",
        "name": "string",
        "status": "code",
        "experimental": "boolean",
        "date": "dateTime",
        "publisher": "string",
        "contact": A("ContactDetail"),
        "description": "markdown",
        "useContext": A("UsageContext"),
        "purpose": "markdown",
        "code": "code",
        "search": "boolean",
        "resource": A(
            {
                "code": "code",
                "param": A("string"),
                "documentation": "string",
            }
        ),
    },
    "GraphDefinition": {
        **_DOMAIN,
        "url": "uri",
        "version": "string",
        "name": "string",
        "status": "code",
        "experimental": "boolean",
        "date": "dateTime",
        "publisher": "string",
        "contact": A("ContactDetail"),
        "description": "markdown",
        "useContext": A("UsageContext"),
        "jurisdiction": A("CodeableConcept"),
        "purpose": "markdown",
        "start": "code",
        "profile": "canonical",
        # link.target.link nests recursively; one structured level
        "link": A(
            {
                "path": "string",
                "sliceName": "string",
                "min": "integer",
                "max": "string",
                "description": "string",
                "target": A(
                    {
                        "type": "code",
                        "params": "string",
                        "profile": "canonical",
                        "compartment": A(
                            {
                                "use": "code",
                                "code": "code",
                                "rule": "code",
                                "expression": "string",
                                "description": "string",
                            }
                        ),
                    }
                ),
            }
        ),
    },
    "TerminologyCapabilities": {
        **_DOMAIN,
        # TerminologyCapabilities has no identifier element in R4
        **{k: v for k, v in _CANONICAL_HEADER.items() if k != "identifier"},
        "kind": "code",
        "software": {"name": "string", "version": "string"},
        "implementation": {"description": "string", "url": "url"},
        "lockedDate": "boolean",
        "codeSystem": A(
            {
                "uri": "canonical",
                "version": A(
                    {
                        "code": "string",
                        "isDefault": "boolean",
                        "compositional": "boolean",
                        "language": A("code"),
                        "filter": A({"code": "code", "op": A("code")}),
                        "property": A("code"),
                    }
                ),
                "subsumption": "boolean",
            }
        ),
        "expansion": {
            "hierarchical": "boolean",
            "paging": "boolean",
            "incomplete": "boolean",
            "parameter": A({"name": "code", "documentation": "string"}),
            "textFilter": "markdown",
        },
        "codeSearch": "code",
        "validateCode": {"translations": "boolean"},
        "translation": {"needsMap": "boolean"},
        "closure": {"translation": "boolean"},
    },
    "TestReport": {
        **_DOMAIN,
        "identifier": "Identifier",
        "name": "string",
        "status": "code",
        "testScript": "Reference",
        "result": "code",
        "score": "decimal",
        "tester": "string",
        "issued": "dateTime",
        "participant": A(
            {"type": "code", "uri": "uri", "display": "string"}
        ),
        "setup": {
            "action": A({"operation": _TR_OPERATION, "assert": _TR_ASSERT})
        },
        "test": A(
            {
                "name": "string",
                "description": "string",
                "action": A(
                    {"operation": _TR_OPERATION, "assert": _TR_ASSERT}
                ),
            }
        ),
        "teardown": {"action": A({"operation": _TR_OPERATION})},
    },
    "TestScript": {
        **_DOMAIN,
        # identifier is 0..1 on TestScript
        **{**_CANONICAL_HEADER, "identifier": "Identifier"},
        "origin": A({"index": "integer", "profile": "Coding"}),
        "destination": A({"index": "integer", "profile": "Coding"}),
        "metadata": {
            "link": A({"url": "uri", "description": "string"}),
            "capability": A(
                {
                    "required": "boolean",
                    "validated": "boolean",
                    "description": "string",
                    "origin": A("integer"),
                    "destination": "integer",
                    "link": A("uri"),
                    "capabilities": "canonical",
                }
            ),
        },
        "fixture": A(
            {
                "autocreate": "boolean",
                "autodelete": "boolean",
                "resource": "Reference",
            }
        ),
        "profile": A("Reference"),
        "variable": A(
            {
                "name": "string",
                "defaultValue": "string",
                "description": "string",
                "expression": "string",
                "headerField": "string",
                "hint": "string",
                "path": "string",
                "sourceId": "id",
            }
        ),
        "setup": {
            "action": A({"operation": _TS_OPERATION, "assert": _TS_ASSERT})
        },
        "test": A(
            {
                "name": "string",
                "description": "string",
                "action": A(
                    {"operation": _TS_OPERATION, "assert": _TS_ASSERT}
                ),
            }
        ),
        "teardown": {"action": A({"operation": _TS_OPERATION})},
    },
    "CatalogEntry": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "type": "CodeableConcept",
        "orderable": "boolean",
        "referencedItem": "Reference",
        "additionalIdentifier": A("Identifier"),
        "classification": A("CodeableConcept"),
        "status": "code",
        "validityPeriod": "Period",
        "validTo": "dateTime",
        "lastUpdated": "dateTime",
        "additionalCharacteristic": A("CodeableConcept"),
        "additionalClassification": A("CodeableConcept"),
        "relatedEntry": A({"relationtype": "code", "item": "Reference"}),
    },
    "BiologicallyDerivedProduct": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "productCategory": "code",
        "productCode": "CodeableConcept",
        "status": "code",
        "request": A("Reference"),
        "quantity": "integer",
        "parent": A("Reference"),
        "collection": {
            "collector": "Reference",
            "source": "Reference",
            "collected[x]": ["dateTime", "Period"],
        },
        "processing": A(
            {
                "description": "string",
                "procedure": "CodeableConcept",
                "additive": "Reference",
                "time[x]": ["dateTime", "Period"],
            }
        ),
        "manipulation": {
            "description": "string",
            "time[x]": ["dateTime", "Period"],
        },
        "storage": A(
            {
                "description": "string",
                "temperature": "decimal",
                "scale": "code",
                "duration": "Period",
            }
        ),
    },
    "MedicationKnowledge": {
        **_DOMAIN,
        "code": "CodeableConcept",
        "status": "code",
        "manufacturer": "Reference",
        "doseForm": "CodeableConcept",
        "amount": "SimpleQuantity",
        "synonym": A("string"),
        "relatedMedicationKnowledge": A(
            {"type": "CodeableConcept", "reference": A("Reference")}
        ),
        "associatedMedication": A("Reference"),
        "productType": A("CodeableConcept"),
        "monograph": A({"type": "CodeableConcept", "source": "Reference"}),
        "ingredient": A(
            {
                "item[x]": ["CodeableConcept", "Reference"],
                "isActive": "boolean",
                "strength": "Ratio",
            }
        ),
        "preparationInstruction": "markdown",
        "intendedRoute": A("CodeableConcept"),
        "cost": A(
            {"type": "CodeableConcept", "source": "string", "cost": "Money"}
        ),
        "monitoringProgram": A(
            {"type": "CodeableConcept", "name": "string"}
        ),
        "administrationGuidelines": A(
            {
                "dosage": A(
                    {"type": "CodeableConcept", "dosage": A("Dosage")}
                ),
                "indication[x]": ["CodeableConcept", "Reference"],
                "patientCharacteristics": A(
                    {
                        "characteristic[x]": [
                            "CodeableConcept", "SimpleQuantity",
                        ],
                        "value": A("string"),
                    }
                ),
            }
        ),
        "medicineClassification": A(
            {
                "type": "CodeableConcept",
                "classification": A("CodeableConcept"),
            }
        ),
        "packaging": {"type": "CodeableConcept", "quantity": "SimpleQuantity"},
        "drugCharacteristic": A(
            {
                "type": "CodeableConcept",
                "value[x]": [
                    "CodeableConcept", "string", "SimpleQuantity",
                    "base64Binary",
                ],
            }
        ),
        "contraindication": A("Reference"),
        "regulatory": A(
            {
                "regulatoryAuthority": "Reference",
                "substitution": A(
                    {"type": "CodeableConcept", "allowed": "boolean"}
                ),
                "schedule": A({"schedule": "CodeableConcept"}),
                "maxDispense": {
                    "quantity": "SimpleQuantity",
                    "period": "Duration",
                },
            }
        ),
        "kinetics": A(
            {
                "areaUnderCurve": A("SimpleQuantity"),
                "lethalDose50": A("SimpleQuantity"),
                "halfLifePeriod": "Duration",
            }
        ),
    },
    "Contract": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "url": "uri",
        "version": "string",
        "status": "code",
        "legalState": "CodeableConcept",
        "instantiatesCanonical": "Reference",
        "instantiatesUri": "uri",
        "contentDerivative": "CodeableConcept",
        "issued": "dateTime",
        "applies": "Period",
        "expirationType": "CodeableConcept",
        "subject": A("Reference"),
        "authority": A("Reference"),
        "domain": A("Reference"),
        "site": A("Reference"),
        "name": "string",
        "title": "string",
        "subtitle": "string",
        "alias": A("string"),
        "author": "Reference",
        "scope": "CodeableConcept",
        "topic[x]": ["CodeableConcept", "Reference"],
        "type": "CodeableConcept",
        "subType": A("CodeableConcept"),
        "contentDefinition": {
            "type": "CodeableConcept",
            "subType": "CodeableConcept",
            "publisher": "Reference",
            "publicationDate": "dateTime",
            "publicationStatus": "code",
            "copyright": "markdown",
        },
        # term.group nests recursively; one structured level
        "term": A(
            {
                "identifier": "Identifier",
                "issued": "dateTime",
                "applies": "Period",
                "topic[x]": ["CodeableConcept", "Reference"],
                "type": "CodeableConcept",
                "subType": "CodeableConcept",
                "text": "string",
                "securityLabel": A(
                    {
                        "number": A("unsignedInt"),
                        "classification": "Coding",
                        "category": A("Coding"),
                        "control": A("Coding"),
                    }
                ),
                "offer": {
                    "identifier": ("Identifier", True),
                    "party": (_CONTRACT_PARTY, True),
                    "topic": "Reference",
                    "type": "CodeableConcept",
                    "decision": "CodeableConcept",
                    "decisionMode": ("CodeableConcept", True),
                    "answer": (_CONTRACT_ANSWER, True),
                    "text": "string",
                    "linkId": ("string", True),
                    "securityLabelNumber": ("unsignedInt", True),
                },
                "asset": A(
                    {
                        "scope": "CodeableConcept",
                        "type": A("CodeableConcept"),
                        "typeReference": A("Reference"),
                        "subtype": A("CodeableConcept"),
                        "relationship": "Coding",
                        "context": A(
                            {
                                "reference": "Reference",
                                "code": A("CodeableConcept"),
                                "text": "string",
                            }
                        ),
                        "condition": "string",
                        "periodType": A("CodeableConcept"),
                        "period": A("Period"),
                        "usePeriod": A("Period"),
                        "text": "string",
                        "linkId": A("string"),
                        "answer": A(_CONTRACT_ANSWER),
                        "securityLabelNumber": A("unsignedInt"),
                        "valuedItem": A(
                            {
                                "entity[x]": ["CodeableConcept", "Reference"],
                                "identifier": "Identifier",
                                "effectiveTime": "dateTime",
                                "quantity": "SimpleQuantity",
                                "unitPrice": "Money",
                                "factor": "decimal",
                                "points": "decimal",
                                "net": "Money",
                                "payment": "string",
                                "paymentDate": "dateTime",
                                "responsible": "Reference",
                                "recipient": "Reference",
                                "linkId": A("string"),
                                "securityLabelNumber": A("unsignedInt"),
                            }
                        ),
                    }
                ),
                "action": A(
                    {
                        "doNotPerform": "boolean",
                        "type": "CodeableConcept",
                        "subject": A(_CONTRACT_PARTY),
                        "intent": "CodeableConcept",
                        "linkId": A("string"),
                        "status": "CodeableConcept",
                        "context": "Reference",
                        "contextLinkId": A("string"),
                        "occurrence[x]": ["dateTime", "Period", "Timing"],
                        "requester": A("Reference"),
                        "requesterLinkId": A("string"),
                        "performerType": A("CodeableConcept"),
                        "performerRole": "CodeableConcept",
                        "performer": "Reference",
                        "performerLinkId": A("string"),
                        "reasonCode": A("CodeableConcept"),
                        "reasonReference": A("Reference"),
                        "reason": A("string"),
                        "reasonLinkId": A("string"),
                        "note": A("Annotation"),
                        "securityLabelNumber": A("unsignedInt"),
                    }
                ),
            }
        ),
        "supportingInfo": A("Reference"),
        "relevantHistory": A("Reference"),
        "signer": A(
            {
                "type": "Coding",
                "party": "Reference",
                "signature": A("Signature"),
            }
        ),
        "friendly": A({"content[x]": ["Attachment", "Reference"]}),
        "legal": A({"content[x]": ["Attachment", "Reference"]}),
        "rule": A({"content[x]": ["Attachment", "Reference"]}),
        "legallyBinding[x]": ["Attachment", "Reference"],
    },
    "MolecularSequence": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "type": "code",
        "coordinateSystem": "integer",
        "patient": "Reference",
        "specimen": "Reference",
        "device": "Reference",
        "performer": "Reference",
        "quantity": "Quantity",
        "referenceSeq": {
            "chromosome": "CodeableConcept",
            "genomeBuild": "string",
            "orientation": "code",
            "referenceSeqId": "CodeableConcept",
            "referenceSeqPointer": "Reference",
            "referenceSeqString": "string",
            "strand": "code",
            "windowStart": "integer",
            "windowEnd": "integer",
        },
        "variant": A(
            {
                "start": "integer",
                "end": "integer",
                "observedAllele": "string",
                "referenceAllele": "string",
                "cigar": "string",
                "variantPointer": "Reference",
            }
        ),
        "observedSeq": "string",
        "quality": A(
            {
                "type": "code",
                "standardSequence": "CodeableConcept",
                "start": "integer",
                "end": "integer",
                "score": "Quantity",
                "method": "CodeableConcept",
                "truthTP": "decimal",
                "queryTP": "decimal",
                "truthFN": "decimal",
                "queryFP": "decimal",
                "gtFP": "decimal",
                "precision": "decimal",
                "recall": "decimal",
                "fScore": "decimal",
                "roc": {
                    "score": A("integer"),
                    "numTP": A("integer"),
                    "numFP": A("integer"),
                    "numFN": A("integer"),
                    "precision": A("decimal"),
                    "sensitivity": A("decimal"),
                    "fMeasure": A("decimal"),
                },
            }
        ),
        "readCoverage": "integer",
        "repository": A(
            {
                "type": "code",
                "url": "uri",
                "name": "string",
                "datasetId": "string",
                "variantsetId": "string",
                "readsetId": "string",
            }
        ),
        "pointer": A("Reference"),
        "structureVariant": A(
            {
                "variantType": "CodeableConcept",
                "exact": "boolean",
                "length": "integer",
                "outer": {"start": "integer", "end": "integer"},
                "inner": {"start": "integer", "end": "integer"},
            }
        ),
    },
    # -- final tier: medicinal-product / substance-definition /
    #    evidence-synthesis / authoring resources. Completes the
    #    registry at all 146 R4 resource types
    #    (hl7.org/fhir/R4/resourcelist.html).
    "MedicinalProduct": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "type": "CodeableConcept",
        "domain": "Coding",
        "combinedPharmaceuticalDoseForm": "CodeableConcept",
        "legalStatusOfSupply": "CodeableConcept",
        "additionalMonitoringIndicator": "CodeableConcept",
        "specialMeasures": A("string"),
        "paediatricUseIndicator": "CodeableConcept",
        "productClassification": A("CodeableConcept"),
        "marketingStatus": A("MarketingStatus"),
        "pharmaceuticalProduct": A("Reference"),
        "packagedMedicinalProduct": A("Reference"),
        "attachedDocument": A("Reference"),
        "masterFile": A("Reference"),
        "contact": A("Reference"),
        "clinicalTrial": A("Reference"),
        "name": A(
            {
                "productName": "string",
                "namePart": A({"part": "string", "type": "Coding"}),
                "countryLanguage": A(
                    {
                        "country": "CodeableConcept",
                        "jurisdiction": "CodeableConcept",
                        "language": "CodeableConcept",
                    }
                ),
            }
        ),
        "crossReference": A("Identifier"),
        "manufacturingBusinessOperation": A(
            {
                "operationType": "CodeableConcept",
                "authorisationReferenceNumber": "Identifier",
                "effectiveDate": "dateTime",
                "confidentialityIndicator": "CodeableConcept",
                "manufacturer": A("Reference"),
                "regulator": "Reference",
            }
        ),
        "specialDesignation": A(
            {
                "identifier": A("Identifier"),
                "type": "CodeableConcept",
                "intendedUse": "CodeableConcept",
                "indication[x]": ["CodeableConcept", "Reference"],
                "status": "CodeableConcept",
                "date": "dateTime",
                "species": "CodeableConcept",
            }
        ),
    },
    "MedicinalProductAuthorization": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "subject": "Reference",
        "country": A("CodeableConcept"),
        "jurisdiction": A("CodeableConcept"),
        "status": "CodeableConcept",
        "statusDate": "dateTime",
        "restoreDate": "dateTime",
        "validityPeriod": "Period",
        "dataExclusivityPeriod": "Period",
        "dateOfFirstAuthorization": "dateTime",
        "internationalBirthDate": "dateTime",
        "legalBasis": "CodeableConcept",
        "jurisdictionalAuthorization": A(
            {
                "identifier": A("Identifier"),
                "country": "CodeableConcept",
                "jurisdiction": A("CodeableConcept"),
                "legalStatusOfSupply": "CodeableConcept",
                "validityPeriod": "Period",
            }
        ),
        "holder": "Reference",
        "regulator": "Reference",
        # procedure.application nests recursively; one structured level
        "procedure": {
            "identifier": "Identifier",
            "type": "CodeableConcept",
            "date[x]": ["Period", "dateTime"],
            "application": A(
                {
                    "identifier": "Identifier",
                    "type": "CodeableConcept",
                    "date[x]": ["Period", "dateTime"],
                }
            ),
        },
    },
    "MedicinalProductContraindication": {
        **_DOMAIN,
        "subject": A("Reference"),
        "disease": "CodeableConcept",
        "diseaseStatus": "CodeableConcept",
        "comorbidity": A("CodeableConcept"),
        "therapeuticIndication": A("Reference"),
        "otherTherapy": A(_MP_OTHER_THERAPY),
        "population": A("Population"),
    },
    "MedicinalProductIndication": {
        **_DOMAIN,
        "subject": A("Reference"),
        "diseaseSymptomProcedure": "CodeableConcept",
        "diseaseStatus": "CodeableConcept",
        "comorbidity": A("CodeableConcept"),
        "intendedEffect": "CodeableConcept",
        "duration": "Quantity",
        "otherTherapy": A(_MP_OTHER_THERAPY),
        "undesirableEffect": A("Reference"),
        "population": A("Population"),
    },
    "MedicinalProductIngredient": {
        **_DOMAIN,
        "identifier": "Identifier",
        "role": "CodeableConcept",
        "allergenicIndicator": "boolean",
        "manufacturer": A("Reference"),
        "specifiedSubstance": A(
            {
                "code": "CodeableConcept",
                "group": "CodeableConcept",
                "confidentiality": "CodeableConcept",
                "strength": A(_MPI_STRENGTH),
            }
        ),
        "substance": {
            "code": "CodeableConcept",
            "strength": A(_MPI_STRENGTH),
        },
    },
    "MedicinalProductInteraction": {
        **_DOMAIN,
        "subject": A("Reference"),
        "description": "string",
        "interactant": A({"item[x]": ["Reference", "CodeableConcept"]}),
        "type": "CodeableConcept",
        "effect": "CodeableConcept",
        "incidence": "CodeableConcept",
        "management": "CodeableConcept",
    },
    "MedicinalProductManufactured": {
        **_DOMAIN,
        "manufacturedDoseForm": "CodeableConcept",
        "unitOfPresentation": "CodeableConcept",
        "quantity": "Quantity",
        "manufacturer": A("Reference"),
        "ingredient": A("Reference"),
        "physicalCharacteristics": "ProdCharacteristic",
        "otherCharacteristics": A("CodeableConcept"),
    },
    "MedicinalProductPackaged": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "subject": A("Reference"),
        "description": "string",
        "legalStatusOfSupply": "CodeableConcept",
        "marketingStatus": A("MarketingStatus"),
        "marketingAuthorization": "Reference",
        "manufacturer": A("Reference"),
        "batchIdentifier": A(
            {
                "outerPackaging": "Identifier",
                "immediatePackaging": "Identifier",
            }
        ),
        "packageItem": A(_MPP_PACKAGE_ITEM),
    },
    "MedicinalProductPharmaceutical": {
        **_DOMAIN,
        "identifier": A("Identifier"),
        "administrableDoseForm": "CodeableConcept",
        "unitOfPresentation": "CodeableConcept",
        "ingredient": A("Reference"),
        "device": A("Reference"),
        "characteristics": A(
            {"code": "CodeableConcept", "status": "CodeableConcept"}
        ),
        "routeOfAdministration": A(
            {
                "code": "CodeableConcept",
                "firstDose": "Quantity",
                "maxSingleDose": "Quantity",
                "maxDosePerDay": "Quantity",
                "maxDosePerTreatmentPeriod": "Ratio",
                "maxTreatmentPeriod": "Duration",
                "targetSpecies": A(
                    {
                        "code": "CodeableConcept",
                        "withdrawalPeriod": A(
                            {
                                "tissue": "CodeableConcept",
                                "value": "Quantity",
                                "supportingInformation": "string",
                            }
                        ),
                    }
                ),
            }
        ),
    },
    "MedicinalProductUndesirableEffect": {
        **_DOMAIN,
        "subject": A("Reference"),
        "symptomConditionEffect": "CodeableConcept",
        "classification": "CodeableConcept",
        "frequencyOfOccurrence": "CodeableConcept",
        "population": A("Population"),
    },
    "SubstanceNucleicAcid": {
        **_DOMAIN,
        "sequenceType": "CodeableConcept",
        "numberOfSubunits": "integer",
        "areaOfHybridisation": "string",
        "oligoNucleotideType": "CodeableConcept",
        "subunit": A(
            {
                "subunit": "integer",
                "sequence": "string",
                "length": "integer",
                "sequenceAttachment": "Attachment",
                "fivePrime": "CodeableConcept",
                "threePrime": "CodeableConcept",
                "linkage": A(
                    {
                        "connectivity": "string",
                        "identifier": "Identifier",
                        "name": "string",
                        "residueSite": "string",
                    }
                ),
                "sugar": A(
                    {
                        "identifier": "Identifier",
                        "name": "string",
                        "residueSite": "string",
                    }
                ),
            }
        ),
    },
    "SubstancePolymer": {
        **_DOMAIN,
        "class": "CodeableConcept",
        "geometry": "CodeableConcept",
        "copolymerConnectivity": A("CodeableConcept"),
        "modification": A("string"),
        "monomerSet": A(
            {
                "ratioType": "CodeableConcept",
                "startingMaterial": A(
                    {
                        "material": "CodeableConcept",
                        "type": "CodeableConcept",
                        "isDefining": "boolean",
                        "amount": "SubstanceAmount",
                    }
                ),
            }
        ),
        "repeat": A(
            {
                "numberOfUnits": "integer",
                "averageMolecularFormula": "string",
                "repeatUnitAmountType": "CodeableConcept",
                "repeatUnit": A(
                    {
                        "orientationOfPolymerisation": "CodeableConcept",
                        "repeatUnit": "string",
                        "amount": "SubstanceAmount",
                        "degreeOfPolymerisation": A(
                            {
                                "degree": "CodeableConcept",
                                "amount": "SubstanceAmount",
                            }
                        ),
                        "structuralRepresentation": A(_SS_REPRESENTATION),
                    }
                ),
            }
        ),
    },
    "SubstanceProtein": {
        **_DOMAIN,
        "sequenceType": "CodeableConcept",
        "numberOfSubunits": "integer",
        "disulfideLinkage": A("string"),
        "subunit": A(
            {
                "subunit": "integer",
                "sequence": "string",
                "length": "integer",
                "sequenceAttachment": "Attachment",
                "nTerminalModificationId": "Identifier",
                "nTerminalModification": "string",
                "cTerminalModificationId": "Identifier",
                "cTerminalModification": "string",
            }
        ),
    },
    "SubstanceReferenceInformation": {
        **_DOMAIN,
        "comment": "string",
        "gene": A(
            {
                "geneSequenceOrigin": "CodeableConcept",
                "gene": "CodeableConcept",
                "source": A("Reference"),
            }
        ),
        "geneElement": A(
            {
                "type": "CodeableConcept",
                "element": "Identifier",
                "source": A("Reference"),
            }
        ),
        "classification": A(
            {
                "domain": "CodeableConcept",
                "classification": "CodeableConcept",
                "subtype": A("CodeableConcept"),
                "source": A("Reference"),
            }
        ),
        "target": A(
            {
                "target": "Identifier",
                "type": "CodeableConcept",
                "interaction": "CodeableConcept",
                "organism": "CodeableConcept",
                "organismType": "CodeableConcept",
                "amount[x]": ["Quantity", "Range", "string"],
                "amountType": "CodeableConcept",
                "source": A("Reference"),
            }
        ),
    },
    "SubstanceSourceMaterial": {
        **_DOMAIN,
        "sourceMaterialClass": "CodeableConcept",
        "sourceMaterialType": "CodeableConcept",
        "sourceMaterialState": "CodeableConcept",
        "organismId": "Identifier",
        "organismName": "string",
        "parentSubstanceId": A("Identifier"),
        "parentSubstanceName": A("string"),
        "countryOfOrigin": A("CodeableConcept"),
        "geographicalLocation": A("string"),
        "developmentStage": "CodeableConcept",
        "fractionDescription": A(
            {"fraction": "string", "materialType": "CodeableConcept"}
        ),
        "organism": {
            "family": "CodeableConcept",
            "genus": "CodeableConcept",
            "species": "CodeableConcept",
            "intraspecificType": "CodeableConcept",
            "intraspecificDescription": "string",
            "author": A(
                {
                    "authorType": "CodeableConcept",
                    "authorDescription": "string",
                }
            ),
            "hybrid": {
                "maternalOrganismId": "string",
                "maternalOrganismName": "string",
                "paternalOrganismId": "string",
                "paternalOrganismName": "string",
                "hybridType": "CodeableConcept",
            },
            "organismGeneral": {
                "kingdom": "CodeableConcept",
                "phylum": "CodeableConcept",
                "class": "CodeableConcept",
                "order": "CodeableConcept",
            },
        },
        "partDescription": A(
            {"part": "CodeableConcept", "partLocation": "CodeableConcept"}
        ),
    },
    "SubstanceSpecification": {
        **_DOMAIN,
        "identifier": "Identifier",
        "type": "CodeableConcept",
        "status": "CodeableConcept",
        "domain": "CodeableConcept",
        "description": "string",
        "source": A("Reference"),
        "comment": "string",
        "moiety": A(
            {
                "role": "CodeableConcept",
                "identifier": "Identifier",
                "name": "string",
                "stereochemistry": "CodeableConcept",
                "opticalActivity": "CodeableConcept",
                "molecularFormula": "string",
                "amount[x]": ["Quantity", "string"],
            }
        ),
        "property": A(
            {
                "category": "CodeableConcept",
                "code": "CodeableConcept",
                "parameters": "string",
                "definingSubstance[x]": ["Reference", "CodeableConcept"],
                "amount[x]": ["Quantity", "string"],
            }
        ),
        "referenceInformation": "Reference",
        "structure": {
            "stereochemistry": "CodeableConcept",
            "opticalActivity": "CodeableConcept",
            "molecularFormula": "string",
            "molecularFormulaByMoiety": "string",
            "isotope": A(
                {
                    "identifier": "Identifier",
                    "name": "CodeableConcept",
                    "substitution": "CodeableConcept",
                    "halfLife": "Quantity",
                    "molecularWeight": _SS_MOLECULAR_WEIGHT,
                }
            ),
            "molecularWeight": _SS_MOLECULAR_WEIGHT,
            "source": A("Reference"),
            "representation": A(_SS_REPRESENTATION),
        },
        "code": A(
            {
                "code": "CodeableConcept",
                "status": "CodeableConcept",
                "statusDate": "dateTime",
                "comment": "string",
                "source": A("Reference"),
            }
        ),
        "name": A(_SS_NAME),
        "molecularWeight": A(_SS_MOLECULAR_WEIGHT),
        "relationship": A(
            {
                "substance[x]": ["Reference", "CodeableConcept"],
                "relationship": "CodeableConcept",
                "isDefining": "boolean",
                "amount[x]": ["Quantity", "Range", "Ratio", "string"],
                "amountRatioLowLimit": "Ratio",
                "amountType": "CodeableConcept",
                "source": A("Reference"),
            }
        ),
        "nucleicAcid": "Reference",
        "polymer": "Reference",
        "protein": "Reference",
        "sourceMaterial": "Reference",
    },
    "Evidence": {
        **_DOMAIN,
        **_EVIDENCE_HEADER,
        "shortTitle": "string",
        "subtitle": "string",
        "exposureBackground": "Reference",
        "exposureVariant": A("Reference"),
        "outcome": A("Reference"),
    },
    "EvidenceVariable": {
        **_DOMAIN,
        **_EVIDENCE_HEADER,
        "shortTitle": "string",
        "subtitle": "string",
        "type": "code",
        "characteristic": A(
            {
                "description": "string",
                "definition[x]": [
                    "Reference", "canonical", "CodeableConcept",
                    "Expression", "DataRequirement", "TriggerDefinition",
                ],
                "usageContext": A("UsageContext"),
                "exclude": "boolean",
                "participantEffective[x]": _STUDY_EFFECTIVE,
                "timeFromStart": "Duration",
                "groupMeasure": "code",
            }
        ),
    },
    "EffectEvidenceSynthesis": {
        **_DOMAIN,
        **_EVIDENCE_HEADER,
        "synthesisType": "CodeableConcept",
        "studyType": "CodeableConcept",
        "population": "Reference",
        "exposure": "Reference",
        "exposureAlternative": "Reference",
        "outcome": "Reference",
        "sampleSize": _SYNTHESIS_SAMPLE_SIZE,
        "resultsByExposure": A(
            {
                "description": "string",
                "exposureState": "code",
                "variantState": "CodeableConcept",
                "riskEvidenceSynthesis": "Reference",
            }
        ),
        "effectEstimate": A(
            {
                "description": "string",
                "type": "CodeableConcept",
                "variantState": "CodeableConcept",
                "value": "decimal",
                "unitOfMeasure": "CodeableConcept",
                "precisionEstimate": A(_PRECISION_ESTIMATE),
            }
        ),
        "certainty": A(_SYNTHESIS_CERTAINTY),
    },
    "RiskEvidenceSynthesis": {
        **_DOMAIN,
        **_EVIDENCE_HEADER,
        "synthesisType": "CodeableConcept",
        "studyType": "CodeableConcept",
        "population": "Reference",
        "exposure": "Reference",
        "outcome": "Reference",
        "sampleSize": _SYNTHESIS_SAMPLE_SIZE,
        "riskEstimate": {
            "description": "string",
            "type": "CodeableConcept",
            "value": "decimal",
            "unitOfMeasure": "CodeableConcept",
            "denominatorCount": "integer",
            "numeratorCount": "integer",
            "precisionEstimate": A(_PRECISION_ESTIMATE),
        },
        "certainty": A(_SYNTHESIS_CERTAINTY),
    },
    "ResearchDefinition": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        **_ARTIFACT_TAIL,
        "shortTitle": "string",
        "subtitle": "string",
        "subject[x]": ["CodeableConcept", "Reference"],
        "comment": A("string"),
        "usage": "string",
        "library": A("canonical"),
        "population": "Reference",
        "exposure": "Reference",
        "exposureAlternative": "Reference",
        "outcome": "Reference",
    },
    "ResearchElementDefinition": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        **_ARTIFACT_TAIL,
        "shortTitle": "string",
        "subtitle": "string",
        "subject[x]": ["CodeableConcept", "Reference"],
        "comment": A("string"),
        "usage": "string",
        "library": A("canonical"),
        "type": "code",
        "variableType": "code",
        "characteristic": A(
            {
                "definition[x]": [
                    "CodeableConcept", "canonical", "Expression",
                    "DataRequirement",
                ],
                "usageContext": A("UsageContext"),
                "exclude": "boolean",
                "unitOfMeasure": "CodeableConcept",
                "studyEffectiveDescription": "string",
                "studyEffective[x]": _STUDY_EFFECTIVE,
                "studyEffectiveTimeFromStart": "Duration",
                "studyEffectiveGroupMeasure": "code",
                "participantEffectiveDescription": "string",
                "participantEffective[x]": _STUDY_EFFECTIVE,
                "participantEffectiveTimeFromStart": "Duration",
                "participantEffectiveGroupMeasure": "code",
            }
        ),
    },
    "ExampleScenario": {
        **_DOMAIN,
        "url": "uri",
        "identifier": A("Identifier"),
        "version": "string",
        "name": "string",
        "status": "code",
        "experimental": "boolean",
        "date": "dateTime",
        "publisher": "string",
        "contact": A("ContactDetail"),
        "useContext": A("UsageContext"),
        "jurisdiction": A("CodeableConcept"),
        "copyright": "markdown",
        "purpose": "markdown",
        "actor": A(
            {
                "actorId": "string",
                "type": "code",
                "name": "string",
                "description": "markdown",
            }
        ),
        "instance": A(
            {
                "resourceId": "string",
                "resourceType": "code",
                "name": "string",
                "description": "markdown",
                "version": A(
                    {"versionId": "string", "description": "markdown"}
                ),
                "containedInstance": A(_ES_CONTAINED_INSTANCE),
            }
        ),
        "process": A(_ES_PROCESS),
        "workflow": A("canonical"),
    },
    "ImplementationGuide": {
        **_DOMAIN,
        "url": "uri",
        "version": "string",
        "name": "string",
        "title": "string",
        "status": "code",
        "experimental": "boolean",
        "date": "dateTime",
        "publisher": "string",
        "contact": A("ContactDetail"),
        "description": "markdown",
        "useContext": A("UsageContext"),
        "jurisdiction": A("CodeableConcept"),
        "copyright": "markdown",
        "packageId": "id",
        "license": "code",
        "fhirVersion": A("code"),
        "dependsOn": A(
            {"uri": "canonical", "packageId": "id", "version": "string"}
        ),
        "global": A({"type": "code", "profile": "canonical"}),
        "definition": {
            "grouping": A({"name": "string", "description": "string"}),
            "resource": A(
                {
                    "reference": "Reference",
                    "fhirVersion": A("code"),
                    "name": "string",
                    "description": "string",
                    "example[x]": ["boolean", "canonical"],
                    "groupingId": "id",
                }
            ),
            # page.page nests recursively; one structured level
            "page": {**_IG_PAGE_LEAF, "page": (_IG_PAGE_LEAF, True)},
            "parameter": A({"code": "string", "value": "string"}),
            "template": A(
                {"code": "string", "source": "string", "scope": "string"}
            ),
        },
        "manifest": {
            "rendering": "url",
            "resource": A(
                {
                    "reference": "Reference",
                    "example[x]": ["boolean", "canonical"],
                    "relativePath": "url",
                }
            ),
            "page": A(
                {
                    "name": "string",
                    "title": "string",
                    "anchor": A("string"),
                }
            ),
            "image": A("string"),
            "other": A("string"),
        },
    },
    "StructureMap": {
        **_DOMAIN,
        **_CANONICAL_HEADER,
        "structure": A(
            {
                "url": "canonical",
                "mode": "code",
                "alias": "string",
                "documentation": "string",
            }
        ),
        "import": A("canonical"),
        "group": A(
            {
                "name": "id",
                "extends": "id",
                "typeMode": "code",
                "documentation": "string",
                "input": A(
                    {
                        "name": "id",
                        "type": "string",
                        "mode": "code",
                        "documentation": "string",
                    }
                ),
                # rule.rule nests recursively; one structured level
                "rule": A({**_SM_RULE_LEAF, "rule": (_SM_RULE_LEAF, True)}),
            }
        ),
    },
}


# ---------------------------------------------------------------------------
# Registry walk
# ---------------------------------------------------------------------------


def _expand(spec: dict) -> dict[str, tuple]:
    """Flatten one element dict to {concrete_field: (typeref, many)} with
    choice elements expanded to their sibling concrete fields."""
    out: dict[str, tuple] = {}
    for key, val in spec.items():
        many = False
        if isinstance(val, tuple):
            val, many = val
        if key.endswith("[x]"):
            base = key[:-3]
            for t in val:
                out[base + t[0].upper() + t[1:]] = (t, False)
        else:
            out[key] = (val, many)
    return out


def expanded_elements(ref) -> dict[str, tuple] | None:
    """Resolve a registry node to its ``{concrete_field: (typeref, many)}``
    element dict: accepts a resource type name, a complex type name, or an
    inline backbone dict. None for primitives / unknown names — callers
    (e.g. decode's path-aware decimal marking) then fall back to
    name-based rules."""
    if isinstance(ref, dict):
        return _expand(ref)
    if ref in RESOURCES:
        return _expand(RESOURCES[ref])
    if ref in COMPLEX:
        return _expand(COMPLEX[ref])
    return None


def registry_type_at(resource_type: str, path: tuple[str, ...]) -> str | None:
    """FHIR type name at a dotted element path (e.g.
    ``('valueQuantity', 'value')`` under Observation) — or None when the
    registry doesn't cover the path. Complex types resolve recursively;
    ``_field`` primitive-extension siblings resolve as Element
    (extension carriers), reported as None (struct stays data-typed)."""
    spec = RESOURCES.get(resource_type)
    if spec is None:
        return None
    current: dict | None = _expand(spec)
    ftype: str | None = None
    for part in path:
        if current is None:
            return None
        if part not in current:
            return None
        ref, _many = current[part]
        if isinstance(ref, dict):
            current, ftype = _expand(ref), None
        elif ref in COMPLEX:
            current, ftype = _expand(COMPLEX[ref]), None
        else:
            current, ftype = None, ref
    return ftype


def definition_schema(
    resource_type: str,
    paths: set[tuple[str, ...]] | None = None,
    extension_depth: int = 2,
    _spec: dict | None = None,
) -> T.StructType:
    """Spark schema derived from the resource definition alone
    (README.md:26-27), optionally restricted to a sparse set of
    populated element paths (README.md:15-18). Recursive complex types
    (Extension.extension, Reference→Identifier→Reference) are bounded by
    ``extension_depth`` / single-visit cycling, exactly as Spark's
    non-recursive types require (SURVEY.md §7)."""
    spec = _spec if _spec is not None else RESOURCES[resource_type]
    return _build_struct(
        _expand(spec), paths, prefix=(), ext_depth=extension_depth, on_path=frozenset()
    )


def _wanted(prefix: tuple[str, ...], paths: set[tuple[str, ...]] | None) -> bool:
    if paths is None:
        return True
    return any(p[: len(prefix)] == prefix for p in paths)


def _build_struct(
    fields: dict[str, tuple],
    paths: set[tuple[str, ...]] | None,
    prefix: tuple[str, ...],
    ext_depth: int,
    on_path: frozenset[str],
) -> T.StructType:
    out: list[T.StructField] = []
    for name in sorted(fields):
        ref, many = fields[name]
        fp = prefix + (name,)
        if not _wanted(fp, paths):
            continue
        dtype: T.DataType | None
        if isinstance(ref, dict):
            dtype = _build_struct(_expand(ref), paths, fp, ext_depth, on_path)
            if not dtype.fields:
                continue
        elif ref in COMPLEX:
            if ref == "Extension":
                if ext_depth <= 0:
                    continue
                sub = _build_struct(
                    _expand(COMPLEX[ref]), paths, fp, ext_depth - 1, on_path
                )
            else:
                if ref in on_path:  # cycle (Reference→Identifier→Reference)
                    continue
                sub = _build_struct(
                    _expand(COMPLEX[ref]), paths, fp, ext_depth, on_path | {ref}
                )
            if not sub.fields:
                continue
            dtype = sub
        else:
            dtype = PRIMITIVE_TO_SPARK.get(ref, T.StringType())
        if many:
            dtype = T.ArrayType(dtype, True)
        out.append(T.StructField(name, dtype, name != "resourceType"))
        # Primitive-extension companion (README.md:267-296): a populated
        # ``_name`` path materializes the Element carrier {id, extension}
        # beside its primitive — array-shaped for repeating primitives
        # (paired arrays, README.md paired-null placement). Emitted only
        # when the sparse path set asks for it: companions on every
        # primitive would bloat definition-only schemas.
        comp = prefix + ("_" + name,)
        is_primitive = not isinstance(ref, dict) and ref not in COMPLEX
        if (
            is_primitive
            and paths is not None
            and any(p[: len(comp)] == comp for p in paths)
            and ext_depth > 0
        ):
            el = _build_struct(
                _expand({"id": "string", "extension": ("Extension", True)}),
                paths,
                comp,
                ext_depth,
                on_path,
            )
            if el.fields:
                cdtype: T.DataType = T.ArrayType(el, True) if many else el
                out.append(T.StructField("_" + name, cdtype, True))
    return T.StructType(out)
