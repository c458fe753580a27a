"""CLI smoke tests (__main__.py) — list must enumerate the registry,
run/explain must reject unknown names without starting a session."""

from __future__ import annotations

from etl_tpch_spark.__main__ import main


def test_list_enumerates_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_unshipped_orders" in out
    assert "sim_kmeans_clusters" in out


def test_unknown_query_rejected(capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err
