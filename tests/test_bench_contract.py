"""bench.py artifact contract (VERDICT r8 #4 + #6): the round JSON must
carry structured calibration + anomaly fields, and a timed-query
exception must poison the exit code — never hide as a stderr stack
fragment (the BENCH_r08 tail adjudication this closes).

Runs bench.main() IN-PROCESS: get_spark() is getOrCreate, so the bench
reuses the session fixture's SparkSession (no second JVM), and the
query set / repeat count are pinned tiny through the env contract the
driver itself uses."""

from __future__ import annotations

import json

import pytest

import bench


def _run_bench(monkeypatch, capsys, spark, **env) -> tuple[dict, int]:
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # warmup dir == sf dir ⇒ warmup pass skipped (fast path)
    monkeypatch.setenv(
        "SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001"
    )
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEAT", "1")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    rc = 0
    try:
        bench.main()
    except SystemExit as e:
        if isinstance(e.code, str):  # abort-with-message: let the
            raise  # caller's pytest.raises match it
        rc = int(e.code or 0)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out), rc


@pytest.mark.slow  # r9 tier rebalance: runs real bench queries (~13 s each)
def test_bench_json_carries_calibration_and_empty_anomalies(
    monkeypatch, capsys, spark
):
    doc, rc = _run_bench(
        monkeypatch,
        capsys,
        spark,
        SPARK_GRAFT_BENCH_QUERIES="text_stats,q18_large_orders",
    )
    assert rc == 0
    assert doc["anomalies"] == []
    assert set(doc["queries"]) == {"text_stats", "q18_large_orders"}
    cal = doc["calibration"]
    for k in (
        "spark_probe_pre_sec",
        "spark_probe_post_sec",
        "spark_probe_anchor_sec",
        "duckdb_probe_pre_sec",
        "duckdb_probe_post_sec",
        "duckdb_probe_anchor_sec",
        "drift",
        "duckdb_drift",
    ):
        assert k in cal, k
    assert cal["drift"] > 0
    # normalized wall = nominal / drift, to 1e-3 (both fields rounded)
    assert doc["value_drift_normalized"] == pytest.approx(
        doc["value"] / cal["drift"], abs=1e-3
    )


@pytest.mark.slow  # r9 tier rebalance: runs real bench queries (~13 s each)
def test_forced_query_exception_sets_anomaly_and_rc(
    monkeypatch, capsys, spark
):
    doc, rc = _run_bench(
        monkeypatch,
        capsys,
        spark,
        SPARK_GRAFT_BENCH_QUERIES="text_stats,q18_large_orders",
        SPARK_GRAFT_BENCH_FORCE_ERROR="text_stats",
    )
    assert rc == 1  # the dry run proving rc≠0 propagates
    assert [a["query"] for a in doc["anomalies"]] == ["text_stats"]
    assert doc["anomalies"][0]["stage"] == "timed"
    assert "forced test error" in doc["anomalies"][0]["error"]
    # the healthy query still reports — one bad query doesn't erase
    # the round's other measurements — but the FAILED query stays
    # visible as null and the totals are withheld, so a partial total
    # can never be read as a speedup by rc-blind tooling (ADVICE r9)
    assert doc["queries"]["q18_large_orders"] > 0
    assert doc["queries"]["text_stats"] is None
    assert doc["value"] is None
    assert doc["value_drift_normalized"] is None


def test_unknown_requested_query_aborts(monkeypatch, capsys, spark):
    with pytest.raises(SystemExit, match="not in registry"):
        _run_bench(
            monkeypatch,
            capsys,
            spark,
            SPARK_GRAFT_BENCH_QUERIES="no_such_query_xyz",
        )


def test_missing_headline_name_aborts(monkeypatch, capsys, spark):
    monkeypatch.setattr(
        bench, "HEADLINE", bench.HEADLINE + ["renamed_away_query"]
    )
    with pytest.raises(SystemExit, match="missing from registry"):
        _run_bench(monkeypatch, capsys, spark)
