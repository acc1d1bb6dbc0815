"""The end-to-end curation example is a real artifact (it caught the
lazy-chained plan-growth OOM in round 6) — run it as part of the suite so
its invariants stay load-bearing. Subprocess: the example builds its own
session with its own lifecycle."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_llm_curation_pipeline_example_runs_green():
    proc = subprocess.run(
        [sys.executable, "llm_curation_pipeline.py"],
        cwd=REPO / "examples",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # the example's own asserts ran; spot-check the report lines exist
    assert "documents: " in out and "decontaminated" in out, out
    assert "train shards: " in out and "verified" in out, out
    assert "hybrid retrieval" in out, out
