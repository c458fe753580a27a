"""Query surface of the engine — every module here registers its queries
into :mod:`etl_tpch_spark.registry` (one entry per SURVEY.md §2 row)."""
