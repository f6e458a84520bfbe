"""The packaged CLI runner (python -m sports_betting_data_pipeline_spark
/ sbdp-query): list, run-and-show, run-and-write, and the error paths a
user actually hits."""

from __future__ import annotations

import pytest

from sports_betting_data_pipeline_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary  [hash-oracle]" in out
    assert "l09" in out and "rows-only" in out


def test_cli_show_and_write(spark, sf_dir, tmp_path, capsys):
    # reuses the active test session (get_spark returns it), so this
    # exercises exactly the spark-submit path: session not owned by us
    assert main(["q01_pricing_summary", "--sf-dir", sf_dir, "--show", "2"]) == 0
    assert "l_returnflag" in capsys.readouterr().out
    out = str(tmp_path / "cli_out.parquet")
    assert main(["c09_string_functions", "--sf-dir", sf_dir, "--out", out]) == 0
    assert spark.read.parquet(out).count() > 0


@pytest.mark.parametrize(
    "argv,msg",
    [
        (["definitely_not_a_query", "--sf-dir", "/tmp"], "unknown query"),
        (["q01_pricing_summar", "--sf-dir", "/tmp"], "did you mean"),
        ([], "query id is required"),
        (["q01_pricing_summary", "--sf-dir", "/nonexistent_dir_xyz"], "not a directory"),
    ],
)
def test_cli_error_paths(argv, msg, capsys, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    with pytest.raises(SystemExit) as exc:
        main(argv)
    assert exc.value.code == 2
    assert msg in capsys.readouterr().err
