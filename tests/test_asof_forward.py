"""Edge-case semantics of operators/windows.py asof_join_forward
(the oracle-parity harness covers the composed attribution query; these
pin the primitive's corner cases on a hand-built frame)."""

from __future__ import annotations

import datetime as dt

from flinkstreametl_spark.operators.windows import asof_join_forward


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _run(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "lid: long, k: long, lts: timestamp")
    right = spark.createDataFrame(right_rows, "k: long, rts: timestamp, rid: long")
    out = asof_join_forward(
        left,
        right,
        key="k",
        right_key="k",
        left_ts="lts",
        right_ts="rts",
        right_cols=["rts", "rid"],
        tie_break="rid",
        **kw,
    )
    return {r.lid: (r.rts, r.rid) for r in out.collect()}


def test_forward_picks_earliest_following(spark):
    got = _run(
        spark,
        [(1, 10, _ts(100))],
        [(10, _ts(50), 1), (10, _ts(150), 2), (10, _ts(200), 3)],
    )
    assert got[1] == (_ts(150), 2)


def test_exact_match_excluded_when_strict(spark):
    rows_r = [(10, _ts(100), 1), (10, _ts(150), 2)]
    strict = _run(spark, [(1, 10, _ts(100))], rows_r, allow_exact_matches=False)
    loose = _run(spark, [(1, 10, _ts(100))], rows_r, allow_exact_matches=True)
    assert strict[1] == (_ts(150), 2)
    assert loose[1] == (_ts(100), 1)


def test_tie_broken_to_lowest_id(spark):
    got = _run(
        spark,
        [(1, 10, _ts(100))],
        [(10, _ts(150), 7), (10, _ts(150), 3), (10, _ts(150), 5)],
    )
    assert got[1] == (_ts(150), 3)


def test_no_following_row_yields_nulls(spark):
    got = _run(
        spark,
        [(1, 10, _ts(100)), (2, 99, _ts(100))],
        [(10, _ts(50), 1)],
    )
    assert got[1] == (None, None)
    assert got[2] == (None, None)


def test_keys_do_not_cross(spark):
    got = _run(
        spark,
        [(1, 10, _ts(100)), (2, 20, _ts(100))],
        [(10, _ts(110), 1), (20, _ts(120), 2)],
    )
    assert got[1] == (_ts(110), 1)
    assert got[2] == (_ts(120), 2)
