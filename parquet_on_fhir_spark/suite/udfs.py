"""UDF / UDAF / UDTF surface (SURVEY.md §2B Q61-Q65).

These exist to prove the engine's extension surface, not for hot paths:
the suite's bulk operators are all built-in Catalyst expressions, and
the pandas variants here are Arrow-vectorized. The row-at-a-time Python
UDF (q61) is deliberately on a small projection.

All UDF objects are created INSIDE the query functions: decorators like
``@udf("string")`` parse their DDL return type eagerly, which requires
an active SparkSession — at module import time on an executor there is
none, and the worker's re-import of this module would crash.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from parquet_on_fhir_spark.suite.common import Q, d4, t


# --- Q61: scalar Python UDF -----------------------------------------------------
def q61(spark, sf_dir):
    from pyspark.sql.functions import udf

    @udf("string")
    def bucket(n_chars: int) -> str:
        if n_chars is None:
            return "unknown"
        if n_chars < 200:
            return "short"
        if n_chars < 800:
            return "medium"
        return "long"

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", bucket(F.col("n_chars")).alias("len_bucket"))


Q61_ORACLE = """
SELECT doc_id,
       CASE WHEN n_chars < 200 THEN 'short'
            WHEN n_chars < 800 THEN 'medium'
            ELSE 'long' END AS len_bucket
FROM documents
"""


# --- Q62: pandas (Arrow-vectorized) UDF --------------------------------------------
def q62(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def chars_per_token(n_chars: pd.Series, n_tokens: pd.Series) -> pd.Series:
        return n_chars / n_tokens

    d = t(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        d4(
            chars_per_token(F.col("n_chars").cast("double"), ntok.cast("double"))
        ).alias("chars_per_token"),
    )


Q62_ORACLE = """
SELECT doc_id,
       round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) + 1e-9, 4) AS chars_per_token
FROM documents
"""


# --- Q63: grouped-map applyInPandas --------------------------------------------------
def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)  # matches SQL stddev_samp
    pdf["zscore"] = (pdf["value"] - mu) / sd
    return pdf[["event_id", "event_type", "zscore"]]


def q63(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    res = e.groupBy("event_type").applyInPandas(
        _zscore, schema="event_id bigint, event_type string, zscore double"
    )
    return res.select("event_id", "event_type", d4(F.col("zscore")).alias("zscore"))


Q63_ORACLE = """
SELECT event_id, event_type,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type) + 1e-9, 4) AS zscore
FROM events
"""


# --- Q64: pandas UDAF (grouped one-row aggregate) --------------------------------------
def _weighted_avg(pdf: pd.DataFrame) -> pd.DataFrame:
    w = pdf["l_quantity"]
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "wavg_price": [(pdf["l_extendedprice"] * w).sum() / w.sum()],
        }
    )


def q64(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    res = l.groupBy("l_returnflag").applyInPandas(
        _weighted_avg, schema="l_returnflag string, wavg_price double"
    )
    return res.select("l_returnflag", d4(F.col("wavg_price")).alias("wavg_price"))


Q64_ORACLE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity) + 1e-9, 4) AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""


# --- Q65: Python UDTF (table function, lateral join) -------------------------------------
def q65(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class SplitTokens:
        def eval(self, text: str):
            if text:
                for tok in text.split(" "):
                    yield (tok,)

    d = t(spark, sf_dir, "documents")
    spark.udtf.register("pofs_split_tokens", SplitTokens)
    d.createOrReplaceTempView("pofs_docs_udtf")
    return spark.sql(
        """
        SELECT s.token, count(*) AS n
        FROM pofs_docs_udtf d, LATERAL pofs_split_tokens(d.text) s
        GROUP BY s.token
        """
    )


Q65_ORACLE = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


QUERIES = [
    Q("q61_python_udf", q61, Q61_ORACLE),
    Q("q62_pandas_udf", q62, Q62_ORACLE),
    Q("q63_apply_in_pandas", q63, Q63_ORACLE),
    Q("q64_pandas_udaf", q64, Q64_ORACLE),
    Q("q65_python_udtf", q65, Q65_ORACLE),
]
