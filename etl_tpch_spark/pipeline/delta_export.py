"""Export a TxTable's commit history as a spec-compliant Delta Lake
``_delta_log`` — real-format interop WITHOUT the delta-spark jars.

The reference appends/optimizes/vacuums actual Delta tables (reference
pipeline/preprocess.py:41-76, reduce.py:43-54).  This sandbox cannot
resolve the jars (DEPLOY.md — 12 consecutive rounds), so txlog.py
reproduces the Delta behaviors on parquet with its own log format.
This module closes the remaining interop gap from the WRITE side: the
Delta transaction-log format is an open, published specification
(delta.io PROTOCOL.md — JSON actions ``protocol`` / ``metaData`` /
``add`` / ``remove`` / ``commitInfo`` in zero-padded
``<version>.json`` files), so a TxTable's retained history can be
mirrored into a real ``_delta_log`` directory beside its data files.
A cluster WITH delta-spark (or any Delta reader: trino, duckdb's
delta extension, delta-rs) can then open the exported table path
directly — time travel, stats-based skipping and all — while this
environment validates the export with an independent minimal replayer
(:func:`read_delta_log`) plus structural spec checks in
tests/test_delta_export.py.

Mapping
-------
- TxTable retained versions (ascending) → Delta versions ``0..K-1``.
  VACUUM drops old TxTable log entries, so the earliest retained
  snapshot exports as Delta version 0's full ``add`` set — the same
  truncation Delta's own retention applies; every later version is a
  snapshot DIFF (``remove`` + ``add``), exactly how Delta commits
  express overwrite/merge/compact.
- ``commitInfo.operation`` carries the TxTable op (APPEND/OVERWRITE/
  MERGE/DELETE/COMPACT/RESTORE/VACUUM), ``commitInfo.txlogVersion``
  the source version — DESCRIBE HISTORY parity and a stable join key
  for incremental export.
- Per-file manifest stats (rows + min/max, already in the TxTable
  commit) become the ``add.stats`` JSON (``numRecords`` /
  ``minValues`` / ``maxValues``) — Delta readers use them for the
  same data skipping read_where does.
- ``metaData.schemaString`` is the Spark-schema JSON derived from a
  current data file's parquet footer (pyarrow → Spark type mapping —
  no Spark session needed driver-side).

Incremental: export state (which TxTable versions are already
mirrored) lives in ``_txlog/_delta_export_state.json`` — NOT inside
``_delta_log`` (readers must see only spec files there).  Re-running
the export after new commits appends only the new Delta versions;
re-running with nothing new is a no-op.

Limitations (documented, not silent): schema evolution emits an
updated ``metaData`` action in the version where the exported schema
changes; partitioned layouts are not produced by TxTable (``
partitionColumns`` is always ``[]``); checkpoint parquet files are
not written (the spec makes them an optimization — readers replay
JSON from 0).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from .txlog import TxTable

_STATE_FILE = "_delta_export_state.json"
_DELTA_DIR = "_delta_log"

# pyarrow primitive -> Spark schema-JSON type name
_ARROW_TO_SPARK = {
    "int8": "byte",
    "int16": "short",
    "int32": "integer",
    "int64": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _spark_type(arrow_type) -> object:
    """Arrow DataType → Spark schema-JSON type (primitive name or
    nested object).  Raises on types TxTable never writes rather than
    exporting a wrong schema silently."""
    import pyarrow as pa

    s = str(arrow_type)
    if s in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[s]
    if s.startswith("timestamp"):
        # Spark writes timestamps as INT96/µs; both read back as
        # timestamp (session-zoned) — NTZ arrow types map to _ntz
        return "timestamp_ntz" if "tz=" not in s else "timestamp"
    if pa.types.is_decimal(arrow_type):
        return f"decimal({arrow_type.precision},{arrow_type.scale})"
    if pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type):
        return {
            "type": "array",
            "elementType": _spark_type(arrow_type.value_type),
            "containsNull": True,
        }
    if pa.types.is_struct(arrow_type):
        return {
            "type": "struct",
            "fields": [
                {
                    "name": f.name,
                    "type": _spark_type(f.type),
                    "nullable": True,
                    "metadata": {},
                }
                for f in arrow_type
            ],
        }
    if pa.types.is_map(arrow_type):
        return {
            "type": "map",
            "keyType": _spark_type(arrow_type.key_type),
            "valueType": _spark_type(arrow_type.item_type),
            "valueContainsNull": True,
        }
    raise ValueError(f"unsupported arrow type for Delta export: {s}")


def _schema_string(table_path: str, files: list[str]) -> str | None:
    """Spark-schema JSON for the snapshot, from the first data file's
    parquet footer (metadata read only).  None for an empty snapshot
    (metaData then carries the last known schema or waits)."""
    if not files:
        return None
    import pyarrow.parquet as pq

    sch = pq.read_schema(os.path.join(table_path, files[0]))
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": f.name,
                    "type": _spark_type(f.type),
                    "nullable": True,
                    "metadata": {},
                }
                for f in sch
            ],
        }
    )


def _add_action(table_path: str, fname: str, stats: dict | None) -> dict:
    fp = os.path.join(table_path, fname)
    st = os.stat(fp)
    action = {
        "path": fname,
        "partitionValues": {},
        "size": st.st_size,
        "modificationTime": int(st.st_mtime * 1000),
        "dataChange": True,
    }
    if stats and "rows" in stats:
        delta_stats: dict = {"numRecords": stats["rows"]}
        cols = stats.get("cols") or {}
        if cols:
            delta_stats["minValues"] = {c: v[0] for c, v in cols.items()}
            delta_stats["maxValues"] = {c: v[1] for c, v in cols.items()}
        action["stats"] = json.dumps(delta_stats)
    return {"add": action}


def export_delta_log(table: TxTable) -> int:
    """Mirror every not-yet-exported retained TxTable version into
    ``<table>/_delta_log/`` as Delta JSON commits.  Returns the number
    of Delta versions written this call (0 = already up to date).
    Incremental and idempotent via the export-state file."""
    log_dir = os.path.join(table.path, _DELTA_DIR)
    state_path = os.path.join(table.path, "_txlog", _STATE_FILE)
    state = {"exported_txlog_versions": [], "schema": None}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
    exported = list(state["exported_txlog_versions"])
    todo = [v for v in table.versions() if v not in set(exported)]
    if not todo:
        return 0
    os.makedirs(log_dir, exist_ok=True)

    # replay the already-exported tail to know the previous file set
    prev_files: set[str] = set()
    if exported:
        prev_files = set(table.commit_entry(exported[-1])["files"])

    written = 0
    now_ms = int(time.time() * 1000)
    for v in sorted(todo):
        entry = table.commit_entry(v)
        files = list(entry["files"])
        stats = entry.get("stats", {})
        delta_v = len(exported)
        actions: list[dict] = []
        if delta_v == 0:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 2,
                    }
                }
            )
        schema = _schema_string(table.path, files) or state.get("schema")
        if schema and schema != state.get("schema"):
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema,
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": now_ms,
                    }
                }
            )
            state["schema"] = schema
        for gone in sorted(prev_files - set(files)):
            actions.append(
                {
                    "remove": {
                        "path": gone,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
        for new in sorted(set(files) - prev_files):
            actions.append(_add_action(table.path, new, stats.get(new)))
        actions.append(
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": str(entry.get("op", "")).upper(),
                    "operationParameters": {},
                    "txlogVersion": v,
                    "engineInfo": "etl_tpch_spark txlog export",
                }
            }
        )
        # atomic publish, txlog-style: full temp write + exclusive link
        tmp = os.path.join(log_dir, f"_tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        final = os.path.join(log_dir, f"{delta_v:020d}.json")
        try:
            os.link(tmp, final)
        except FileExistsError:
            # a rival exporter won this Delta version; state re-read on
            # the next call reconciles — single-box tooling, same
            # benign-race posture as artifact_store builds
            os.remove(tmp)
            break
        os.remove(tmp)
        exported.append(v)
        prev_files = set(files)
        written += 1

    state["exported_txlog_versions"] = exported
    tmp_state = state_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp_state, "w") as f:
        json.dump(state, f)
    os.replace(tmp_state, state_path)
    return written


def read_delta_log(table_path: str) -> list[dict]:
    """Independent minimal Delta-log replayer (validation only — the
    read twin a real Delta reader embodies): parse every
    ``_delta_log/<v>.json`` in order, apply add/remove, and return one
    dict per version: ``{"version", "files", "num_records",
    "operation", "schema_fields"}``.  Deliberately shares NO code with
    the exporter."""
    log_dir = os.path.join(table_path, _DELTA_DIR)
    versions = sorted(
        int(f[:-5])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and not f.startswith("_")
    )
    live: set[str] = set()
    records: dict[str, int | None] = {}
    schema_fields: list[str] | None = None
    out = []
    expected = 0
    for v in versions:
        if v != expected:
            raise ValueError(f"delta log gap: expected {expected}, saw {v}")
        expected += 1
        op = None
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    live.add(a["add"]["path"])
                    stats = a["add"].get("stats")
                    records[a["add"]["path"]] = (
                        json.loads(stats).get("numRecords")
                        if stats
                        else None
                    )
                elif "remove" in a:
                    live.discard(a["remove"]["path"])
                elif "metaData" in a:
                    schema_fields = [
                        fld["name"]
                        for fld in json.loads(
                            a["metaData"]["schemaString"]
                        )["fields"]
                    ]
                elif "commitInfo" in a:
                    op = a["commitInfo"].get("operation")
        n = (
            sum(records[p] for p in live)
            if live and all(records.get(p) is not None for p in live)
            else (0 if not live else None)
        )
        out.append(
            {
                "version": v,
                "files": sorted(live),
                "num_records": n,
                "operation": op,
                "schema_fields": schema_fields,
            }
        )
    return out
