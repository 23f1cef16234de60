"""Custom operators the reference's query surface needs but Spark lacks
as single primitives — each expressed as a composition of built-in
DataFrame operations (SURVEY.md §2B; preference order per
/opt/skills/guides/pyspark_guide.md: compose built-ins first)."""
