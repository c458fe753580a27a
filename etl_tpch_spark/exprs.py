"""Single-round-trip expression construction helpers.

Guide §4 (shrink the Python⇄JVM boundary) applied to DataFrame
CONSTRUCTION, not just row data: every ``F.<fn>``/``Column`` operator
call is one or more py4j round-trips, so a builder that assembles a
large expression tree node-by-node from Python pays milliseconds per
node before any job runs — cProfile of warm headline reps (round 11)
measured 1.0-2.1k round-trips per query construction, dominating the
sub-second queries' wall.  ``F.expr(sql)`` ships the WHOLE subtree as
one string and parses it JVM-side: 3 round-trips regardless of size,
and the parsed tree is the same Catalyst expression the node-by-node
builder produced (verified per converted operator in plans/r11).

Literal arrays need one extra trick: SQL ``array(a, b, ...)`` parses
to a CreateArray with N literal children, whose copies inflate
analysis time on wide arrays (the round-11 bloom/hyperplane fix), and
``F.lit(list)`` costs ~2 round-trips per element.  ``from_json`` of a
constant string is one expression node at analysis, is constant-folded
to a single ArrayType ``Literal`` by the optimizer (verified: the
optimized plan prints the folded array), and costs 3 round-trips
total.  Values are exact: ints round-trip digit-for-digit, and Python
``repr``/``json.dumps`` emit shortest-round-trip decimal for float64,
which Jackson parses back to the identical IEEE-754 double.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_str(s: str) -> str:
    """A SQL single-quoted string literal with Spark escaping."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sql_ident(name: str) -> str:
    """A backtick-quoted SQL identifier: a column name that is a SQL
    keyword or contains spaces/dots parses as the NAME it is instead
    of failing or resolving differently than the ``F.col`` form the
    parser-twin builders replaced (ADVICE r11)."""
    return "`" + name.replace("`", "``") + "`"


def sql_double(x) -> str:
    """A SQL double literal from any real number, validated HERE: a
    non-finite float or a non-castable argument raises a clear Python
    error instead of a JVM parse error mid-plan (ADVICE r11 — ``repr``
    of inf/nan is not a valid Spark literal).  Finite floats/ints
    round-trip exactly (shortest-round-trip decimal + D suffix)."""
    import math

    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"not a finite double literal: {x!r}")
    return f"{v!r}D"


def json_array_sql(values: Iterable, element_type: str) -> str:
    """SQL text of a constant ``array<element_type>`` literal carried
    through ``from_json`` (one node at analysis, folded to a Literal at
    optimization).  Embed in a larger expression string for zero extra
    round-trips."""
    payload = json.dumps(list(values), ensure_ascii=True)
    return f"from_json({sql_str(payload)}, 'array<{element_type}>')"


def json_array_lit(values: Iterable, element_type: str) -> Column:
    """The same literal as a ``Column`` (3 py4j round-trips total)."""
    return F.expr(json_array_sql(values, element_type))
