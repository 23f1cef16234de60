"""Custom operators the reference's query surface needs but Spark lacks
as single primitives — each expressed as a composition of built-in
DataFrame operations (SURVEY.md §2B; preference order: compose
built-in pyspark.sql.functions first, Pandas UDFs only when needed)."""
