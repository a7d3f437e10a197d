"""CLI modes drive the full lifecycles in-process (main.py analog)."""

from __future__ import annotations

import json

import pytest

from instagram_data_pipeline_spark.cli import main
from instagram_data_pipeline_spark.testing import fixture_edges, fixture_users


@pytest.fixture()
def landed(spark, tmp_path):
    fixture_users(spark).write.parquet(str(tmp_path / "profiles"))
    f1, f2 = fixture_edges(spark)
    f1.write.parquet(str(tmp_path / "followers"))
    f2.write.parquet(str(tmp_path / "following"))
    return tmp_path


def test_cli_three_modes_chain(landed, capsys):
    wh = str(landed / "wh")
    assert main([
        "--mode", "manual", "--warehouse", wh,
        "--profile", str(landed / "profiles"),
        "--followers", str(landed / "followers"),
        "--following", str(landed / "following"),
        "--now", "2024-01-20T12:00:00",
    ]) == 0
    manual = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manual["mutuals"] == 2

    assert main([
        "--mode", "scheduled", "--warehouse", wh,
        "--usernames", "instagram,lurker", "--now", "2024-01-20T12:00:00",
    ]) == 0
    sched = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sched["enqueued"] == 6 and sched["failed"] == 0

    assert main([
        "--mode", "analysis", "--warehouse", wh, "--now", "2024-01-21T12:00:00",
    ]) == 0
    ana = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ana["interests_total"] >= 3


def test_cli_manual_requires_inputs(landed):
    with pytest.raises(SystemExit):
        main(["--mode", "manual", "--warehouse", str(landed / "wh2")])
