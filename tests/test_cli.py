"""CLI surface (python -m flinkstreametl_spark): list and oracle paths
are Spark-free; run/explain are covered by the registry tests (same
fns), so only argument handling is exercised here."""

from __future__ import annotations

import pytest

from flinkstreametl_spark.__main__ import main


def test_list_prints_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from flinkstreametl_spark.plans import REGISTRY

    for name in list(REGISTRY)[:5]:
        assert name in out
    assert "flagship_enrich" in out


def test_list_tag_filter(capsys):
    assert main(["list", "--tag", "warehouse"]) == 0
    out = capsys.readouterr().out
    assert "scd2_order_status_history" in out
    assert "flagship_enrich" not in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out and "SELECT" in out


def test_oracle_rows_only_fails_cleanly(capsys):
    assert main(["oracle", "approx_distinct_users"]) == 1


def test_unknown_query_exit_code():
    assert main(["run", "no_such_query"]) == 2


def test_missing_subcommand_is_usage_error():
    with pytest.raises(SystemExit):
        main([])
