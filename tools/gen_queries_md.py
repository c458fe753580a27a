"""Regenerate QUERIES.md — the index of all registered queries with
their driver check type.  Run from the repo root after adding queries:

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tpch_spark import registry  # noqa: E402


def main() -> None:
    qs = registry.load_all()
    lines = [
        "# QUERIES — all registered driver-checked queries",
        "",
        f"Auto-generated from `etl_tpch_spark/registry.py` ({len(qs)} "
        "queries; oracle = DuckDB value-hash check at sf0.01, rows-only "
        "where marked).",
        "",
        "| query | check | description |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        q = qs[name]
        check = "hash" if q.oracle else "rows-only"
        doc = re.sub(r"\s+", " ", q.doc or "").strip()
        if len(doc) > 155:
            doc = doc[:155].rstrip() + "..."
        lines.append(f"| `{name}` | {check} | {doc} |")
    with open(os.path.join(os.path.dirname(__file__), "..", "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md with {len(qs)} queries")


if __name__ == "__main__":
    main()
