"""The examples/ scripts must stay runnable — they are the switching
user's first contact with the engine."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_cdc_quickstart_runs(tmp_path):
    import cdc_quickstart

    assert cdc_quickstart.main(str(tmp_path)) == 0


def test_corpus_pipeline_runs(sf_dir):
    import corpus_pipeline

    assert corpus_pipeline.main(sf_dir) == 0
