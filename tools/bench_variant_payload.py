"""Measure the VARIANT parse-once-extract-many crossover along the
payload axis (round 11).

The driver fixture's event payloads are minimal (``{"k": N}``), where
query-time ``parse_json`` is so cheap the STORED binary form shows no
win over parsing at query time (SCALING.md round-11 adjudication).
This tool makes the claim's real axis measurable: synthetic payloads
with ``--keys`` top-level fields (built from the fixture's events —
deterministic, seeded by event_id), extracted at ``--paths`` typed
paths per query, compared three ways over the same rows:

- ``text``: per-path ``get_json_object`` on the raw JSON string — the
  string tier, re-scans the text once PER PATH;
- ``parse``: ``parse_json`` once per row at query time, then
  ``variant_get`` per path — parse-once-extract-many inside one query;
- ``stored``: ``variant_get`` against a PRE-PARSED binary variant
  column persisted to parquet — the parse paid once at ingest, zero
  parse at query time (the events_variant_stored lifecycle).

Output: one markdown table row per (keys, paths) cell with the three
best-of-N walls and the stored/parse and parse/text ratios.  The
one-time parse+store wall is reported separately (ingest-cadence
cost, amortized).

Usage:
    python tools/bench_variant_payload.py [--sf-dir DIR] [--keys 4,16,64]
        [--paths 1,4,8] [--rows 1000000] [--repeat 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.session import get_spark  # noqa: E402


def _best_of(fn, repeat: int) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def synth_payloads(spark, rows: int, keys: int):
    """(event_id, props) with a deterministic ``keys``-field JSON
    payload per row — values derived from event_id so every engine/run
    sees identical bytes; no fixture file dependency beyond row
    count."""
    parts = []
    for i in range(keys):
        if i:
            parts.append("','")
        parts.append(
            f"'\"f{i}\":', CAST(id * {i + 1} % 997 AS STRING)"
        )
    expr = "concat('{', " + ", ".join(parts) + ", '}')"
    return spark.range(rows).selectExpr("id AS event_id", f"{expr} AS props")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="4,16,64")
    ap.add_argument("--paths", default="1,4,8")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--scratch", default="/tmp/variant_payload_bench")
    args = ap.parse_args()

    spark = get_spark("bench-variant-payload")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(
        "| keys | paths | text s | parse s | stored s | store-once s "
        "| parse/text | stored/parse |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for keys in [int(k) for k in args.keys.split(",")]:
        df = synth_payloads(spark, args.rows, keys)
        base = os.path.join(args.scratch, f"k{keys}")
        text_dir = os.path.join(base, "text")
        var_dir = os.path.join(base, "variant")
        if not os.path.exists(text_dir):
            df.write.mode("overwrite").parquet(text_dir)
        text_df = spark.read.parquet(text_dir)
        t0 = time.perf_counter()
        if not os.path.exists(var_dir):
            text_df.select(
                "event_id", F.parse_json(F.col("props")).alias("v")
            ).write.mode("overwrite").parquet(var_dir)
        store_once = time.perf_counter() - t0
        stored_df = spark.read.parquet(var_dir)

        seen_paths = set()
        for paths in [int(p) for p in args.paths.split(",")]:
            paths = min(paths, keys)
            if paths in seen_paths:  # clamped duplicates add no cell
                continue
            seen_paths.add(paths)
            sel = range(paths)

            def run_text():
                text_df.select(
                    *[
                        F.get_json_object("props", f"$.f{i}")
                        .cast("long")
                        .alias(f"x{i}")
                        for i in sel
                    ]
                ).agg(
                    *[F.sum(f"x{i}").alias(f"s{i}") for i in sel]
                ).collect()

            def run_parse():
                v = F.parse_json(F.col("props"))
                text_df.select(v.alias("v")).select(
                    *[
                        F.expr(f"variant_get(v, '$.f{i}', 'bigint')").alias(
                            f"x{i}"
                        )
                        for i in sel
                    ]
                ).agg(
                    *[F.sum(f"x{i}").alias(f"s{i}") for i in sel]
                ).collect()

            def run_stored():
                stored_df.select(
                    *[
                        F.expr(f"variant_get(v, '$.f{i}', 'bigint')").alias(
                            f"x{i}"
                        )
                        for i in sel
                    ]
                ).agg(
                    *[F.sum(f"x{i}").alias(f"s{i}") for i in sel]
                ).collect()

            # correctness guard: all three tiers must agree before the
            # walls mean anything
            a = text_df.select(
                F.sum(
                    F.get_json_object("props", "$.f0").cast("long")
                ).alias("s")
            ).first()["s"]
            b = stored_df.select(
                F.sum(
                    F.expr("variant_get(v, '$.f0', 'bigint')")
                ).alias("s")
            ).first()["s"]
            assert a == b, (a, b)

            run_text(); run_parse(); run_stored()  # warm
            t_text = _best_of(run_text, args.repeat)
            t_parse = _best_of(run_parse, args.repeat)
            t_stored = _best_of(run_stored, args.repeat)
            print(
                f"| {keys} | {paths} | {t_text:.3f} | {t_parse:.3f} "
                f"| {t_stored:.3f} | {store_once:.1f} "
                f"| {t_parse / t_text:.2f}x | {t_stored / t_parse:.2f}x |",
                flush=True,
            )


if __name__ == "__main__":
    main()
