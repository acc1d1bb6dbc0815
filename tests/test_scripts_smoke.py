"""Import-smoke guard for scripts/*.py (r10, VERDICT item 3).

The r7 lesson (examples rotting silently when queries.py internals moved)
applies equally to the probe scripts: cc_ab_probe.py imports private
queries.py names (``Q._t``/``_K``/``_BANDS``/``_N``/``_MAX_BUCKET``) and
would be the first casualty of any refactor. Importing each script (they
all gate ``main()`` behind ``__main__``) executes every top-level import
and def, so a renamed private symbol fails HERE, in seconds, instead of at
the next quiet-host probe run.

Deliberately NOT running the scripts' main() — the probes are multi-minute
benchmark harnesses; rot protection only needs the import to bind.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

SCRIPTS = sorted((Path(__file__).resolve().parent.parent / "scripts").glob("*.py"))


def test_scripts_dir_is_nonempty():
    assert SCRIPTS, "scripts/ vanished — update this guard"


def test_scale_probe_rejects_unknown_watch_ops():
    # session-free validation path: a typo'd op name must die fast with the
    # valid choices listed, before any Spark session spins up
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_scale_probe_smoke", SCRIPTS[0].parent / "scale_probe.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.select_watch_ops([]) == []
    assert mod.select_watch_ops(["dedup_exact"]) == ["dedup_exact"]
    with pytest.raises(SystemExit, match="unknown ops.*nonsense_op"):
        mod.select_watch_ops(["dedup_exact", "nonsense_op"])


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.name)
def test_script_imports_clean(script):
    # unique module name per script; import executes top-level code only
    # (every script guards main() behind __main__)
    name = f"_script_smoke_{script.stem}"
    spec = importlib.util.spec_from_file_location(name, script)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main"), f"{script.name} has no main() entry point"
    finally:
        sys.modules.pop(name, None)
