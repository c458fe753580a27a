"""Explicit StructTypes for every engine table.

The reference never declares schemas — pandas infers per JSON file and
Delta enforces at the lakehouse boundary (reference
pipeline/preprocess.py:38-44; SURVEY.md §1.3).  We instead declare
schemas up front: required for Structured Streaming file sources and the
only robust choice at 100 TB (no inference scans).

Two schema families (FIXTURES.md):

- ``TESTDATA`` — the driver parquet fixtures (classic TPC-H names,
  int64 keys, ``l_shipdate``/``o_orderdate`` timestamps) plus the
  extension tables ``events``/``documents``/``embeddings``.
- ``LIVE`` — the reference's live-pipeline JSON staging schema (uuid4
  *string* order keys per data.py:74-93, ``*_time`` renamed timestamp
  columns per data.py:96-108).  Join logic elsewhere is key-type
  agnostic so both work (SURVEY.md §7 risk c).
"""

from __future__ import annotations

from pyspark.sql import types as T

_f = T.StructField

TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [_f("r_regionkey", T.IntegerType()), _f("r_name", T.StringType())]
    ),
    "nation": T.StructType(
        [
            _f("n_nationkey", T.IntegerType()),
            _f("n_name", T.StringType()),
            _f("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            _f("c_custkey", T.LongType()),
            _f("c_name", T.StringType()),
            _f("c_nationkey", T.IntegerType()),
            _f("c_acctbal", T.DoubleType()),
            _f("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            _f("s_suppkey", T.LongType()),
            _f("s_name", T.StringType()),
            _f("s_nationkey", T.IntegerType()),
            _f("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            _f("p_partkey", T.LongType()),
            _f("p_name", T.StringType()),
            _f("p_brand", T.StringType()),
            _f("p_type", T.StringType()),
            _f("p_size", T.IntegerType()),
            _f("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            _f("o_orderkey", T.LongType()),
            _f("o_custkey", T.LongType()),
            _f("o_orderstatus", T.StringType()),
            _f("o_totalprice", T.DoubleType()),
            _f("o_orderdate", T.TimestampType()),
            _f("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            _f("l_orderkey", T.LongType()),
            _f("l_partkey", T.LongType()),
            _f("l_suppkey", T.LongType()),
            _f("l_linenumber", T.IntegerType()),
            _f("l_quantity", T.DoubleType()),
            _f("l_extendedprice", T.DoubleType()),
            _f("l_discount", T.DoubleType()),
            _f("l_tax", T.DoubleType()),
            _f("l_returnflag", T.StringType()),
            _f("l_linestatus", T.StringType()),
            _f("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            _f("event_id", T.LongType()),
            _f("ts", T.TimestampType()),
            _f("user_id", T.LongType()),
            _f("event_type", T.StringType()),
            _f("value", T.DoubleType()),
            _f("props", T.StringType()),  # JSON string → from_json downstream
        ]
    ),
    "documents": T.StructType(
        [
            _f("doc_id", T.LongType()),
            _f("text", T.StringType()),
            _f("lang", T.StringType()),
            _f("source", T.StringType()),
            _f("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            _f("vec_id", T.LongType()),
            _f("embedding", T.ArrayType(T.FloatType())),
            _f("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(TESTDATA)

# Reference live-pipeline variants (FIXTURES.md §B): uuid *string* order
# keys (data.py:74-93) and `*date` → `*_time` renames (data.py:96-108).
# Static tables are identical to TESTDATA (minus partsupp, which testdata
# omits); only the two dynamic tables differ.
LIVE: dict[str, T.StructType] = dict(TESTDATA)
LIVE["orders"] = T.StructType(
    [
        _f("o_orderkey", T.StringType()),  # uuid4 hex
        _f("o_custkey", T.LongType()),
        _f("o_orderstatus", T.StringType()),
        _f("o_totalprice", T.DoubleType()),
        _f("o_order_time", T.TimestampType()),
        _f("o_orderpriority", T.StringType()),
    ]
)
LIVE["lineitem"] = T.StructType(
    [
        _f("l_orderkey", T.StringType()),  # uuid4 hex
        _f("l_partkey", T.LongType()),
        _f("l_suppkey", T.LongType()),
        _f("l_linenumber", T.IntegerType()),
        _f("l_quantity", T.DoubleType()),
        _f("l_extendedprice", T.DoubleType()),
        _f("l_discount", T.DoubleType()),
        _f("l_tax", T.DoubleType()),
        _f("l_returnflag", T.StringType()),
        _f("l_linestatus", T.StringType()),
        _f("l_ship_time", T.TimestampType()),
    ]
)
