"""Property-based FHIR encode/decode round-trip (SURVEY.md §5.4):
hypothesis-generated resources with random sparse field subsets, partial
dates, choice variants, and nested extensions must regenerate exactly
(README.md:11-13 losslessness)."""

import json
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_on_fhir_spark.fhir import encode_ndjson, to_fhir_json

names = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll")), min_size=1, max_size=12
)
partial_dates = st.one_of(
    st.integers(1900, 2099).map(lambda y: f"{y:04d}"),
    st.tuples(st.integers(1900, 2099), st.integers(1, 12)).map(
        lambda t: f"{t[0]:04d}-{t[1]:02d}"
    ),
    st.tuples(st.integers(1900, 2099), st.integers(1, 12), st.integers(1, 28)).map(
        lambda t: f"{t[0]:04d}-{t[1]:02d}-{t[2]:02d}"
    ),
)
# JSON decimals rendered with explicit precision (round-trip compares the
# parsed python value, so plain floats with short reprs are the honest case)
decimals = st.integers(-10**6, 10**6).map(lambda n: n / 100.0)

extension = st.fixed_dictionaries(
    {"url": st.just("http://example.org/ext")},
    optional={
        "valueString": names,
        "valueDecimal": decimals,
        "valueCode": names,
    },
)


@st.composite
def patients(draw, i):
    p = {"resourceType": "Patient", "id": f"p{i}"}
    if draw(st.booleans()):
        p["gender"] = draw(st.sampled_from(["male", "female", "other"]))
    if draw(st.booleans()):
        p["birthDate"] = draw(partial_dates)
    # choice type: at most one variant
    variant = draw(st.sampled_from(["none", "bool", "int"]))
    if variant == "bool":
        p["multipleBirthBoolean"] = draw(st.booleans())
    elif variant == "int":
        p["multipleBirthInteger"] = draw(st.integers(0, 5))
    if draw(st.booleans()):
        p["name"] = draw(
            st.lists(
                st.fixed_dictionaries(
                    {},
                    optional={
                        "family": names,
                        "given": st.lists(names, min_size=1, max_size=3),
                    },
                ).filter(lambda d: d),
                min_size=1,
                max_size=3,
            )
        )
    if draw(st.booleans()):
        p["extension"] = draw(st.lists(extension, min_size=1, max_size=3))
    return p


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_random_sparse_patients_roundtrip(spark, data):
    rows = [data.draw(patients(i)) for i in range(data.draw(st.integers(1, 6)))]
    d = tempfile.mkdtemp(prefix="fhir_fuzz_")
    with open(f"{d}/p.ndjson", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = encode_ndjson(spark, f"{d}/p.ndjson", resource_type="Patient")
    back = sorted(
        (json.loads(r.json) for r in to_fhir_json(df).collect()),
        key=lambda x: x["id"],
    )
    assert back == sorted(rows, key=lambda x: x["id"])
