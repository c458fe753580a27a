"""Typed JSON parsing for semi-structured columns.

Two tiers for the ``events.props`` JSON-string column (SURVEY.md §2.8
north-star row):

- ``get_json_object(col, '$.path')`` — per-path string extraction;
  fine for one field, but N paths = N parses of the same string.
- ``from_json(col, schema)`` — ONE parse into a typed struct; every
  field access afterwards is a no-cost struct projection.  At 100 TB
  this is the difference between parsing the payload once and parsing
  it per referenced field; always the scale path when the schema is
  known.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.props payload: {"k": <long>}  (FIXTURES.md)
PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def parse_props(col: Column) -> Column:
    """props JSON string → typed struct (one parse)."""
    return F.from_json(col, PROPS_SCHEMA)
