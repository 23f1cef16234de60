"""FHIR search-parameter layer (hl7.org/fhir/R4/search.html shapes) over
the golden Patient example file."""

from pyspark.sql import functions as F

from parquet_on_fhir_spark.fhir.table import FhirTable

PATIENT = "/root/reference/examples/Patient.parquet"


def _pt(spark):
    return FhirTable.read(spark, PATIENT)


def test_token_identifier(spark):
    pt = _pt(spark)
    row = pt.df.select(F.explode("identifier").alias("i")).select(
        "i.system", "i.value"
    ).first()
    hits = pt.where_token("identifier", row.system, row.value)
    assert hits.count() >= 1
    got = hits.df.select(F.explode("identifier").alias("i")).filter(
        (F.col("i.system") == row.system) & (F.col("i.value") == row.value)
    )
    assert got.count() >= 1
    # system mismatch finds nothing
    assert pt.where_token("identifier", "http://nope", row.value).count() == 0


def test_token_codeable_concept(spark):
    pt = _pt(spark)
    ms = pt.df.filter(F.col("maritalStatus").isNotNull()).select(
        F.col("maritalStatus.coding")[0].alias("c")
    ).first()
    hits = pt.where_token("maritalStatus", ms.c.system, ms.c.code)
    assert 0 < hits.count() <= 100
    # bare-code leaf token
    assert _pt(spark).where_token("gender", None, "male").count() == \
        pt.df.filter(F.col("gender") == "male").count()


def test_string_search_name(spark):
    pt = _pt(spark)
    fam = pt.df.select(F.explode("name").alias("n")).select("n.family").first().family
    prefix = fam[:4]
    hits = pt.where_string("name", prefix.lower())  # case-insensitive starts-with
    assert hits.count() >= 1
    assert pt.where_string("name", fam, exact=True).count() >= 1
    assert pt.where_string("name", "zzzznobody").count() == 0


def test_reference_search(spark):
    obs = FhirTable.read(spark, "/root/reference/examples/Observation.parquet")
    pid = obs.df.select(F.col("subject.reference").alias("r")).first().r
    assert obs.where_reference("subject", pid).count() >= 1
    bare = pid.split("/", 1)[1]
    assert obs.where_reference("subject", bare).count() >= 1


def test_search_front_end_or_missing_sort_count(spark):
    pt = _pt(spark)
    n_m = pt.df.filter(F.col("gender") == "male").count()
    n_f = pt.df.filter(F.col("gender") == "female").count()
    assert pt.search("gender=male,female").count() == n_m + n_f  # OR values
    n_no_ms = pt.df.filter(F.col("maritalStatus").isNull()).count()
    assert pt.search("maritalStatus:missing=true").count() == n_no_ms
    top = pt.search("gender=male&_sort=-birthDate&_count=5")
    rows = top.df.select("birthDate").collect()
    assert len(rows) == 5
    bds = [r.birthDate for r in rows]
    assert bds == sorted(bds, reverse=True)


def test_search_front_end_token_route(spark):
    pt = _pt(spark)
    row = pt.df.select(F.explode("identifier").alias("i")).select(
        "i.system", "i.value"
    ).first()
    hits = pt.search(f"identifier={row.system}|{row.value}")
    assert hits.count() >= 1


def test_search_numeric_identifier_routes_to_token(spark):
    """A 4-digit-leading identifier value must route to token search, not
    the date/decimal annotation paths (which would crash on a non-date
    element)."""
    df = spark.createDataFrame(
        [("p1", [{"system": "http://sys", "value": "0042"}]),
         ("p2", [{"system": "http://sys", "value": "9999"}])],
        "id string, identifier array<struct<system string, value string>>",
    )
    t = FhirTable.from_df(df)
    assert t.search("identifier=0042").df.select("id").first().id == "p1"
    assert t.search("identifier=http://sys|0042").count() == 1
    assert t.search("identifier=http://nope|0042").count() == 0


def test_search_token_syntax_on_code_leaf(spark):
    """system|code on a scalar code leaf routes to token search (no
    ValueError from the quantity branch). A leaf carries no system, so a
    system-qualified search conservatively matches nothing."""
    pt = _pt(spark)
    hits = pt.search("gender=http://hl7.org/fhir/administrative-gender|male")
    assert hits.count() == 0  # documented conservative leaf semantics
    # any-system token on a leaf matches by code
    assert pt.search("gender=|male").count() == \
        pt.df.filter(F.col("gender") == "male").count()


def test_search_date_route_still_works_on_date_elements(spark):
    pt = _pt(spark)
    n = pt.search("birthDate=ge2010").count()
    assert n == pt.where_date("birthDate", "ge", "2010").count()
    assert n >= 1


def test_reference_search_array_element(spark):
    df = spark.createDataFrame(
        [("o1", [{"reference": "ServiceRequest/a1"}, {"reference": "ServiceRequest/a2"}]),
         ("o2", [{"reference": "ServiceRequest/b1"}]),
         ("o3", None)],
        "id string, basedOn array<struct<reference string>>",
    )
    t = FhirTable.from_df(df)
    assert t.where_reference("basedOn", "ServiceRequest/a2").df.first().id == "o1"
    assert t.where_reference("basedOn", "b1").df.first().id == "o2"
    assert t.where_reference("basedOn", "nope").count() == 0


def test_where_string_no_searchable_parts_matches_nothing(spark):
    pt = _pt(spark)
    assert pt.where_string("identifier", "abc").count() == 0  # no IndexError


def test_search_numeric_leaf_comparison(spark):
    df = spark.createDataFrame(
        [("p1", 2), ("p2", 1), ("p3", None)],
        "id string, multipleBirthInteger int",
    )
    t = FhirTable.from_df(df)
    assert t.search("multipleBirthInteger=gt1").df.first().id == "p1"
    assert t.search("multipleBirthInteger=1").df.first().id == "p2"
