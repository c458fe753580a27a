"""CLI: ``python -m etl_tpch_spark <command>``.

The engine's operational entry points without writing a script:

    python -m etl_tpch_spark list
    python -m etl_tpch_spark run q1_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m etl_tpch_spark explain flagship_unshipped_orders
    python -m etl_tpch_spark cycle --root /tmp/lake --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime, timezone

from . import registry
from .catalog import DEFAULT_SF_DIR
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_tpch_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run one query, print the result")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    run.add_argument("--limit", type=int, default=20)

    ex = sub.add_parser("explain", help="print a query's physical plan")
    ex.add_argument("query")
    ex.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    cyc = sub.add_parser("cycle", help="run one pipeline tick")
    cyc.add_argument("--root", required=True)
    cyc.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    cyc.add_argument("--compact", action="store_true")
    cyc.add_argument("--reduce", action="store_true")

    srv = sub.add_parser(
        "serve",
        help="interval scheduling daemon: N pipeline ticks on a timer "
        "(reference workflow.py:12-39 deployment cadences)",
    )
    srv.add_argument("--root", required=True)
    srv.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    srv.add_argument("--ticks", type=int, default=4)
    srv.add_argument("--interval", type=float, default=0.0,
                     help="seconds between ticks (reference: 900)")
    srv.add_argument("--compact-every", type=int, default=24)
    srv.add_argument("--reduce-every", type=int, default=96)

    dash = sub.add_parser(
        "dashboard",
        help="render the gold-zone results as formatted tables "
        "(reference dashboard.py:9-70, terminal form)",
    )
    dash.add_argument("--root", required=True)
    dash.add_argument("--limit", type=int, default=10)

    args = p.parse_args(argv)
    qs = registry.load_all()

    if args.cmd == "list":
        for name in sorted(qs):
            kind = "hash " if qs[name].oracle else "rows "
            print(f"{kind} {name}")
        return 0

    if args.cmd in ("run", "explain"):
        if args.query not in qs:
            print(f"unknown query {args.query!r}; try: list", file=sys.stderr)
            return 2
        spark = get_spark("etl_tpch_spark-cli")
        df = qs[args.query].fn(spark, args.sf_dir)
        if args.cmd == "explain":
            from .plans import explain_text

            print(explain_text(df))
        else:
            df.show(args.limit, truncate=False)
            print(f"({df.count()} rows total)")
        return 0

    if args.cmd == "serve":
        from .pipeline.workflow import serve_loop

        spark = get_spark("etl_tpch_spark-cli")
        outs = serve_loop(
            spark,
            args.sf_dir,
            args.root,
            ticks=args.ticks,
            interval_s=args.interval,
            compact_every=args.compact_every,
            reduce_every=args.reduce_every,
            quality_gate=True,
        )
        for out in outs:
            print(out)
        return 0

    if args.cmd == "dashboard":
        import os

        from .pipeline.serving import format_for_display
        from .pipeline.workflow import results_ready

        results = os.path.join(args.root, "results")
        if not results_ready(results):
            # reference pipeline/dashboard.py:24-32: wait-for-results
            # health check; here we report instead of blocking
            print("results not ready (run `serve` or `cycle --reduce`)",
                  file=sys.stderr)
            return 1
        spark = get_spark("etl_tpch_spark-cli")
        for entry in sorted(os.listdir(results)):
            seg_path = os.path.join(results, entry)
            seg = entry.split(".")[0].upper()
            print(f"=== {seg} — top unshipped orders by revenue ===")
            format_for_display(spark.read.parquet(seg_path)).show(
                args.limit, truncate=False
            )
        return 0

    if args.cmd == "cycle":
        from .pipeline.workflow import run_cycle

        spark = get_spark("etl_tpch_spark-cli")
        out = run_cycle(
            spark,
            args.sf_dir,
            args.root,
            now=datetime.now(timezone.utc).replace(tzinfo=None),
            compact=args.compact,
            reduce=args.reduce,
            quality_gate=True,
        )
        for stage, result in out.items():
            print(f"{stage}: {result}")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
