"""Rotation-completeness guard (VERDICT r9 item 1).

The driver grades only the first 50 registry entries per round, so
every registered oracle-backed query must be either (a) already
driver-checked in some CORRECTNESS_r*.json artifact, or (b) queued —
in the current window or a _NEW_R* queue. Round 8 violated this
silently: two queries landed when the round's queue was pinned at 40
names and fell out of the bookkeeping, so they would never have
received a driver verdict. This test recomputes the invariant from
the artifacts themselves each round, so a future orphan fails CI the
day it is created rather than being found by a judge.

No Spark session needed — pure registry + JSON inspection.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from flinkstreametl_spark.plans import QUEUED_FOR_DRIVER, REGISTRY

REPO_ROOT = Path(__file__).resolve().parents[1]

# Names that appear in CORRECTNESS_r01 only, with err=no_oracle, and
# were later moved OUT of the driver registry into AUDIT_REGISTRY
# (ADVICE r7) — artifact-only history, not registry members.
_ARTIFACT_ONLY = {"approx_distinct_users", "stats_builtin_moments"}


def _ever_checked() -> set[str]:
    names: set[str] = set()
    for path in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        if not re.fullmatch(r"CORRECTNESS_r\d+\.json", path.name):
            continue
        data = json.loads(path.read_text())
        queries = data.get("queries", data)
        if isinstance(queries, dict):
            names.update(queries.keys())
        elif isinstance(queries, list):
            names.update(q["name"] for q in queries if isinstance(q, dict) and "name" in q)
    return names


def test_no_artifacts_is_round1_only() -> None:
    # If the driver has never run, there is nothing to reconcile; any
    # later round must have at least one artifact for the guard below
    # to be meaningful.
    artifacts = list(REPO_ROOT.glob("CORRECTNESS_r*.json"))
    if not artifacts:
        pytest.skip("no driver artifacts yet (round 1)")
    assert artifacts


def test_every_registered_query_is_checked_or_queued() -> None:
    checked = _ever_checked()
    if not checked:
        pytest.skip("no driver artifacts yet (round 1)")
    queued = set(QUEUED_FOR_DRIVER)
    orphans = sorted(set(REGISTRY) - checked - queued)
    assert not orphans, (
        "registered queries with no driver verdict and no queue slot "
        f"(they will silently never be graded): {orphans}"
    )


def test_artifact_names_reconcile_with_registry() -> None:
    checked = _ever_checked()
    if not checked:
        pytest.skip("no driver artifacts yet (round 1)")
    # Every historically checked name either still exists in the
    # registry or is one of the two documented AUDIT_REGISTRY moves.
    ghosts = sorted(checked - set(REGISTRY) - _ARTIFACT_ONLY)
    assert not ghosts, f"artifact names missing from registry (renamed without a trail?): {ghosts}"


def test_queue_names_are_registered_and_oracle_backed() -> None:
    missing = [n for n in QUEUED_FOR_DRIVER if n not in REGISTRY]
    assert not missing, f"queued but not registered: {missing}"
    rows_only = [n for n in QUEUED_FOR_DRIVER if REGISTRY[n].oracle is None]
    assert not rows_only, f"rows-only queries may not be queued for the driver window: {rows_only}"
