"""The end-to-end curation example is a real artifact (it caught the
lazy-chained plan-growth OOM in round 6) — run it as part of the suite so
its invariants stay load-bearing. Subprocess: the example builds its own
session with its own lifecycle.

r15: the examples run CONCURRENTLY (4 subprocesses in flight) instead of
serially. Each example is an independent fresh-JVM job whose cost is
dominated by session startup + tiny sf0.001 work, so overlapping them is
the guide §2.6 back-fill pattern applied to the test lane: the serial lane
was ~12 min and pushed the full suite past the driver's verify window
(VERIFY_r14 tests_ok=false was a timeout at ~90%, not a failure). Every
example still runs and every per-example assertion is unchanged — only the
scheduling moved. Results are launched once per module via a fixture;
individual tests keep their own failure attribution.
"""

from __future__ import annotations

import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import pytest

# the examples tier is fresh-JVM subprocesses — full suite (the default;
# what CI/the driver runs) keeps it, the inner dev loop skips it with
# `-m "not examples"` (marker registered in pytest.ini)
pytestmark = pytest.mark.examples

REPO = Path(__file__).resolve().parent.parent

SMOKE_EXAMPLES = [
    # every runnable example is suite-guarded (r9): each is self-
    # contained (in-process HTTP servers, local object-store fakes,
    # /root/testdata parquet) and asserts its own invariants — the
    # suite only demands a clean exit so examples cannot rot unseen
    "ann_retrieval.py",
    # r11: the profile -> suggested_salt -> salted_join loop the skew
    # profiler's docs describe (SURVEY §2B "joins ... salted"), with the
    # plain-vs-salted equality asserted at the profiler-suggested salt
    "skew_profile.py",
    "database_simple.py",
    "database_generalized.py",
    "rest_simple.py",
    "rest_basic_auth.py",
    "rest_custom_auth.py",
    "rest_dynamic_data.py",
    "s3_simple.py",
    "s3_generalized.py",
    "oci_object_storage_simple.py",
]

ALL_EXAMPLES = [
    "llm_curation_pipeline.py",
    "incremental_curation_epochs.py",
    *SMOKE_EXAMPLES,
]


def _run_example(name: str, timeout: int = 900) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, name],
        cwd=REPO / "examples",
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def example_runs() -> dict[str, subprocess.CompletedProcess]:
    # 4 in flight: enough to hide the ~15 s JVM startup tail of each
    # example behind its neighbours' work, few enough that the local[32]
    # sessions don't fight for cores (each example's sf0.001 jobs are
    # milliseconds of executor time; the contention is startup CPU only)
    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(zip(ALL_EXAMPLES, pool.map(_run_example, ALL_EXAMPLES)))


def test_llm_curation_pipeline_example_runs_green(example_runs):
    proc = example_runs["llm_curation_pipeline.py"]
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # the example's own asserts ran; spot-check the report lines exist
    assert "documents: " in out and "decontaminated" in out, out
    assert "train shards: " in out and "verified" in out, out
    assert "hybrid retrieval" in out, out


def test_incremental_curation_epochs_example_runs_green(example_runs):
    # the r7 rot case: this example broke silently because nothing executed
    # it — its manifest-diff invariant is load-bearing for the incremental
    # publish story, so it runs INSIDE the suite from r9 on
    proc = example_runs["incremental_curation_epochs.py"]
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "manifest-diff invariant holds" in proc.stdout, proc.stdout


@pytest.mark.parametrize("name", SMOKE_EXAMPLES)
def test_example_smoke(name, example_runs):
    proc = example_runs[name]
    assert proc.returncode == 0, f"{name}:\n{proc.stderr[-2000:]}"
