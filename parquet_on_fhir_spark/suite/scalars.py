"""Scalar function group queries (SURVEY.md §2B Q41-Q51).

One representative query per function group, per the survey's oracle
strategy. All expressions are built-in Catalyst functions — JVM-side,
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_on_fhir_spark.functions.partial_date import fhir_date_end, fhir_date_start
from parquet_on_fhir_spark.suite.common import Q, d2, d4, t

MICROS_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
MICROS_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# --- Q41: string functions ----------------------------------------------------
def q41(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 5).alias("prefix5"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.regexp_extract("c_name", r"(\d+)", 1).alias("digits"),
        F.instr(F.col("c_name"), "0").cast("long").alias("pos_zero"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("lev_bldg"),
        F.regexp_replace("c_name", r"\d", "#").alias("masked"),
    )


Q41_ORACLE = """
SELECT c_custkey, upper(c_name) AS uname, substring(c_name, 1, 5) AS prefix5,
       concat_ws('-', c_mktsegment, c_name) AS seg_name,
       length(c_name) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       regexp_extract(c_name, '(\\d+)', 1) AS digits,
       CAST(strpos(c_name, '0') AS BIGINT) AS pos_zero,
       levenshtein(c_mktsegment, 'BUILDING') AS lev_bldg,
       regexp_replace(c_name, '\\d', '#', 'g') AS masked
FROM customer
"""


# --- Q42: date/time functions ---------------------------------------------------
def q42(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 7), "yyyy-MM-dd").alias(
            "plus_week"
        ),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01")))
        .cast("long")
        .alias("days_since_95"),
        F.unix_timestamp("o_orderdate").cast("long").alias("epoch_s"),
    )


Q42_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d') AS plus_week,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
"""


# --- Q43: FHIR partial-date bounds (spec README.md:314-341) -----------------------
def q43(spark, sf_dir):
    """Applies the engine's partial-date bound expressions to year / month /
    day precision strings derived from o_orderdate."""
    o = t(spark, sf_dir, "orders")
    parts = (
        o.select(F.date_format("o_orderdate", "yyyy-MM-dd").alias("s"))
        .union(o.select(F.date_format("o_orderdate", "yyyy-MM")))
        .union(o.select(F.date_format("o_orderdate", "yyyy")))
        .distinct()
    )
    return parts.select(
        "s",
        F.date_format(fhir_date_start("s"), MICROS_SPARK).alias("start_ts"),
        F.date_format(fhir_date_end("s"), MICROS_SPARK).alias("end_ts"),
    )


Q43_ORACLE = f"""
WITH ds AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS s FROM orders
  UNION SELECT strftime(o_orderdate, '%Y-%m') FROM orders
  UNION SELECT strftime(o_orderdate, '%Y') FROM orders
)
SELECT s,
  strftime(CASE length(s)
    WHEN 4 THEN strptime(s || '-01-01', '%Y-%m-%d')
    WHEN 7 THEN strptime(s || '-01', '%Y-%m-%d')
    ELSE strptime(s, '%Y-%m-%d') END, '{MICROS_DUCK}') AS start_ts,
  strftime(CASE length(s)
    WHEN 4 THEN strptime(s || '-12-31 23:59:59.999', '%Y-%m-%d %H:%M:%S.%g')
    WHEN 7 THEN last_day(strptime(s || '-01', '%Y-%m-%d')) + INTERVAL '23:59:59.999'
    ELSE strptime(s || ' 23:59:59.999', '%Y-%m-%d %H:%M:%S.%g') END, '{MICROS_DUCK}') AS end_ts
FROM ds
"""


# --- Q44: math functions -------------------------------------------------------------
def q44(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        d4(F.abs(F.col("l_discount") - 0.05)).alias("abs_disc"),
        F.ceil("l_extendedprice").cast("long").alias("ceil_price"),
        F.floor("l_extendedprice").cast("long").alias("floor_price"),
        d4(F.pow("l_quantity", 2)).alias("qty_sq"),
        d4(F.sqrt("l_extendedprice")).alias("sqrt_price"),
        d4(F.log("l_extendedprice")).alias("ln_price"),
        d4(F.greatest("l_tax", "l_discount")).alias("max_rate"),
        d4(F.least("l_tax", "l_discount")).alias("min_rate"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
    )


Q44_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05) + 1e-9, 4) AS abs_disc,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
       round(pow(l_quantity, 2) + 1e-9, 4) AS qty_sq,
       round(sqrt(l_extendedprice) + 1e-9, 4) AS sqrt_price,
       round(ln(l_extendedprice) + 1e-9, 4) AS ln_price,
       round(greatest(l_tax, l_discount) + 1e-9, 4) AS max_rate,
       round(least(l_tax, l_discount) + 1e-9, 4) AS min_rate,
       l_orderkey % 7 AS key_mod7
FROM lineitem
"""


# --- Q45: DECIMAL(38,6) precision (spec README.md:343-363) -----------------------------
def q45(spark, sf_dir):
    """Exact decimal aggregation — the annotation type for FHIR decimals.
    Decimal sums are exact, so the string renderings must match byte-wise."""
    l = t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(38,6)")
    return l.groupBy("l_returnflag").agg(
        F.sum(dec).cast("decimal(38,6)").cast("string").alias("sum_dec"),
        F.max(dec).cast("string").alias("max_dec"),
        F.count("*").alias("n"),
    )


Q45_ORACLE = """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_dec,
       CAST(max(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS max_dec,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# --- Q46: array functions -----------------------------------------------------------------
def q46(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.array_contains(tokens, "data").alias("has_data"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(tokens)), 1, 5), " ").alias(
            "first5_distinct"
        ),
        tokens[1].alias("second_token"),
        F.size(F.array_distinct(tokens)).alias("n_distinct_tokens"),
    )


Q46_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       list_contains(string_split(text, ' '), 'data') AS has_data,
       array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ' ') AS first5_distinct,
       string_split(text, ' ')[2] AS second_token,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
FROM documents
"""


# --- Q47: higher-order functions -------------------------------------------------------------
def q47(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(tokens, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(tokens, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
        )
        .cast("long")
        .alias("total_len"),
        F.exists(tokens, lambda x: x == F.lit("the")).alias("has_the"),
        F.array_join(
            F.transform(F.slice(tokens, 1, 3), lambda x: F.upper(x)), " "
        ).alias("first3_upper"),
        F.forall(tokens, lambda x: F.length(x) < 20).alias("all_short"),
    )


Q47_ORACLE = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_len,
       list_contains(string_split(text, ' '), 'the') AS has_the,
       array_to_string(list_transform(string_split(text, ' ')[1:3], x -> upper(x)), ' ') AS first3_upper,
       len(list_filter(string_split(text, ' '), x -> length(x) >= 20)) = 0 AS all_short
FROM documents
"""


# --- Q48: map functions (map-derived scalars — the driver's hasher can't sort raw
# map/array cells, so every output column is flattened to string/int/bool) --------------
def q48(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
        F.concat_ws(",", F.map_values(m)).alias("vals_csv"),
        m["lang"].alias("lang_from_map"),
        F.element_at(m, F.lit("source")).alias("source_from_map"),
        F.size(m).cast("int").alias("n_entries"),
        F.map_contains_key(m, "lang").alias("has_lang"),
        F.concat_ws(
            ",",
            F.transform(
                F.map_entries(m), lambda e: F.concat_ws("=", e["key"], e["value"])
            ),
        ).alias("entries_csv"),
    )


Q48_ORACLE = """
SELECT doc_id,
       array_to_string(list_sort(map_keys(map(['lang','source'], [lang, source]))), ',') AS keys_csv,
       array_to_string(map_values(map(['lang','source'], [lang, source])), ',') AS vals_csv,
       lang AS lang_from_map,
       source AS source_from_map,
       CAST(cardinality(map(['lang','source'], [lang, source])) AS INT) AS n_entries,
       list_contains(map_keys(map(['lang','source'], [lang, source])), 'lang') AS has_lang,
       concat_ws(',', 'lang=' || lang, 'source=' || source) AS entries_csv
FROM documents
"""


# --- Q49: JSON functions ----------------------------------------------------------------------
def q49(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        d4(F.avg(k)).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k.isNotNull(), 1)).alias("n_with_k"),
    )


Q49_ORACLE = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)) + 1e-9, 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       count(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 END) AS n_with_k
FROM events GROUP BY event_type
"""


# --- Q50: struct build / withField / dropFields -------------------------------------------------
def q50(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    s = F.struct(F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"))
    s2 = s.withField("uname", F.upper("c_name")).withField(
        "bal2", F.col("c_acctbal") * 2
    )
    s3 = s2.dropFields("bal")
    return c.select(
        F.col("c_custkey"),
        s3.getField("uname").alias("uname"),
        d2(s3.getField("bal2")).alias("bal2"),
    )


Q50_ORACLE = """
SELECT c_custkey, upper(c_name) AS uname, round(c_acctbal * 2, 2) AS bal2
FROM customer
"""


# --- Q51: hash functions -------------------------------------------------------------------------
def q51(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 100).select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("md5_name"),
        F.sha2(F.col("c_name"), 256).alias("sha256_name"),
    )


Q51_ORACLE = """
SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha256_name
FROM customer WHERE c_custkey <= 100
"""


# --- Q51b: engine-local hash/id functions, checked via invariants -------------------------------
# xxhash64/crc32/monotonically_increasing_id/uuid() have no portable
# cross-engine values, but their CONTRACTS do: ids are distinct, crc32 is
# non-negative, xxhash64 is injective on this corpus, one id per row. The
# query emits those invariants as booleans (deterministic for fixed
# input), so the oracle is exact.
def q51b(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    ids = c.select(
        "c_custkey",
        "c_name",
        F.xxhash64("c_name").alias("xx64"),
        F.crc32(F.col("c_name").cast("binary")).alias("crc"),
        F.monotonically_increasing_id().alias("mono_id"),
        F.expr("uuid()").alias("row_uuid"),
    )
    return ids.agg(
        F.count("*").alias("n_rows"),
        (F.countDistinct("row_uuid") == F.count("*")).alias("uuids_distinct"),
        (F.countDistinct("mono_id") == F.count("*")).alias("mono_ids_distinct"),
        (F.min("crc") >= 0).alias("crc_nonneg"),
        (F.countDistinct("xx64") == F.countDistinct("c_name")).alias("xx64_injective"),
        (F.max(F.length("row_uuid")) == 36).alias("uuid_len_36"),
    )


Q51B_ORACLE = """
SELECT count(*) AS n_rows, TRUE AS uuids_distinct, TRUE AS mono_ids_distinct,
       TRUE AS crc_nonneg, TRUE AS xx64_injective, TRUE AS uuid_len_36
FROM customer
"""


QUERIES = [
    Q("q41_string_funcs", q41, Q41_ORACLE),
    Q("q42_datetime_funcs", q42, Q42_ORACLE),
    Q("q43_fhir_partial_date_bounds", q43, Q43_ORACLE),
    Q("q44_math_funcs", q44, Q44_ORACLE),
    Q("q45_decimal_precision", q45, Q45_ORACLE),
    Q("q46_array_funcs", q46, Q46_ORACLE),
    Q("q47_higher_order_funcs", q47, Q47_ORACLE),
    Q("q48_map_funcs", q48, Q48_ORACLE),
    Q("q49_json_funcs", q49, Q49_ORACLE),
    Q("q50_struct_ops", q50, Q50_ORACLE),
    Q("q51_hash_funcs", q51, Q51_ORACLE),
    Q("q51b_hash_ids_local", q51b, Q51B_ORACLE),
]
