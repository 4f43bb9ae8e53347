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


def test_forward_asof_matches_pandas_merge_asof(spark):
    """Property: asof_join_forward == pandas merge_asof(
    direction='forward') on random frames. pandas breaks right-ts ties
    by taking the first row of the sorted right frame, so pre-sorting
    the right side by (rts, rid) aligns its tie-break with the
    operator's lowest-rid contract."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(  # left: (key, ts-seconds)
            st.tuples(st.integers(0, 2), st.integers(0, 50)),
            min_size=1,
            max_size=12,
        ),
        st.lists(  # right: (key, ts-seconds)
            st.tuples(st.integers(0, 2), st.integers(0, 50)),
            min_size=0,
            max_size=12,
        ),
        st.booleans(),
    )
    def run(lrows, rrows, exact_ok):
        left = [(i, k, _ts(s)) for i, (k, s) in enumerate(lrows)]
        right = [(k, _ts(s), 100 + i) for i, (k, s) in enumerate(rrows)]
        got = _run(spark, left, right, allow_exact_matches=exact_ok)

        lpdf = pd.DataFrame(left, columns=["lid", "k", "lts"]).sort_values("lts", kind="mergesort")
        rpdf = pd.DataFrame(right, columns=["k", "rts", "rid"]).sort_values(
            ["rts", "rid"], kind="mergesort"
        )
        if rpdf.empty:
            expected = {lid: (None, None) for lid, _, _ in left}
        else:
            m = pd.merge_asof(
                lpdf,
                rpdf,
                left_on="lts",
                right_on="rts",
                by="k",
                direction="forward",
                allow_exact_matches=exact_ok,
            )
            expected = {
                int(r.lid): (
                    None if pd.isna(r.rts) else r.rts.to_pydatetime(),
                    None if pd.isna(r.rid) else int(r.rid),
                )
                for r in m.itertuples()
            }
        assert got == expected

    run()
