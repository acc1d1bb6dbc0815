"""bench.py CLI guards — session-free, so they run in milliseconds."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_select_groups_default_is_all():
    assert bench.select_groups(None) == bench.GROUPS
    assert bench.select_groups("") == bench.GROUPS


def test_select_groups_subset_preserves_order():
    names = [g for g, _ in bench.GROUPS]
    pick = {names[0], names[-1]}
    got = bench.select_groups(",".join(sorted(pick, reverse=True)))
    assert [g for g, _ in got] == [g for g in names if g in pick]


def test_select_groups_typo_exits_naming_the_bad_group():
    # a silently-empty run list would emit a plausible but empty bench
    # result — the knob must fail loudly, naming the unknown group
    with pytest.raises(SystemExit, match=r"unknown group\(s\) \['sematic'\]"):
        bench.select_groups("sematic")
    # whitespace-only is a typo too, not "all groups"
    with pytest.raises(SystemExit):
        bench.select_groups(" , ")
