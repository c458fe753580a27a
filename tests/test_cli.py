"""CLI smoke tests (__main__.py) — list must enumerate the registry,
run/explain must reject unknown names without starting a session."""

from __future__ import annotations

import pytest

from etl_tpch_spark.__main__ import main


def test_list_enumerates_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_unshipped_orders" in out
    assert "sim_kmeans_clusters" in out


def test_unknown_query_rejected(capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_verify_runs_oracle_gate(capsys):
    assert main([
        "verify", "q6_forecast_revenue", "dedup_exact",
        "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    out = capsys.readouterr().out
    assert "2/2 verified" in out


def test_verify_rejects_unknown(capsys):
    assert main(["verify", "not_a_query"]) == 2


def test_dashboard_reports_not_ready(capsys, tmp_path):
    assert main(["dashboard", "--root", str(tmp_path)]) == 1
    assert "results not ready" in capsys.readouterr().err


@pytest.mark.slow
def test_serve_then_dashboard(capsys, tmp_path):
    """serve ticks the pipeline to a served state; dashboard then
    renders every segment's formatted gold table (reference
    dashboard.py:9-70 flow, terminal form)."""
    root = str(tmp_path / "lake")
    assert main([
        "serve", "--root", root, "--sf-dir", "/root/testdata/sf0.001",
        "--ticks", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "'tick': 0" in out and "'tick': 1" in out
    assert main(["dashboard", "--root", root, "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "BUILDING" in out and "revenue_display" in out


def test_lm_tick_trains_once_scores_idempotently(capsys, tmp_path):
    """lm-tick: first call trains the LM and scores its window; a
    replayed batch id appends nothing; a second window appends and the
    LM is NOT retrained."""
    root = str(tmp_path / "lmroot")
    args = ["lm-tick", "--root", root,
            "--sf-dir", "/root/testdata/sf0.001"]
    assert main(args + ["--batch-id", "day0", "--doc-id-max", "25"]) == 0
    out = capsys.readouterr().out
    assert "lm trained: version 1" in out
    assert "scores: version 1" in out

    # replay: same batch id → same scores version
    assert main(args + ["--batch-id", "day0", "--doc-id-max", "25"]) == 0
    out = capsys.readouterr().out
    assert "lm trained" not in out  # train-once
    assert "scores: version 1" in out

    # next crawl day appends
    assert main(
        args + ["--batch-id", "day1",
                "--doc-id-min", "25", "--doc-id-max", "50"]
    ) == 0
    assert "scores: version 2" in capsys.readouterr().out


def test_search_builds_then_reuses_index(capsys, tmp_path):
    """First call builds the inverted index from the documents table;
    the second serves from the stored postings without rebuilding."""
    root = str(tmp_path / "lake")
    args = [
        "search", "dup", "vector", "--root", root,
        "--sf-dir", "/root/testdata/sf0.001", "--topk", "3",
    ]
    assert main(args) == 0
    out = capsys.readouterr().out
    assert "index built" in out and "bm25" in out
    assert main(args) == 0
    out = capsys.readouterr().out
    assert "index built" not in out and "bm25" in out


def test_history_renders_table_log(capsys, tmp_path):
    root = str(tmp_path / "lake")
    assert main([
        "corpus-tick", "--root", root,
        "--sf-dir", "/root/testdata/sf0.001", "--batch-id", "b0",
    ]) == 0
    capsys.readouterr()
    assert main(["history", "--root", root, "--table", "corpus"]) == 0
    out = capsys.readouterr().out
    assert "append" in out and "batch_id" in out
    assert main(["history", "--root", root, "--table", "nope"]) == 1
    assert "no committed table" in capsys.readouterr().err
