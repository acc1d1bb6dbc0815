"""State-store semantics: init/resume/fingerprint-fork (reference
Tamer.scala:108-148 startup decision table)."""

from __future__ import annotations

import pytest

from tamer_spark.errors import StateForkError
from tamer_spark.state import StateDoc, StateStore, fingerprint


def test_fingerprint_stable_and_sensitive():
    a = fingerprint("SELECT 1", {"from": "2020-01-01"})
    assert a == fingerprint("SELECT 1", {"from": "2020-01-01"})
    assert a != fingerprint("SELECT 2", {"from": "2020-01-01"})
    assert a != fingerprint("SELECT 1", {"from": "2020-01-02"})


def test_initialize_then_resume(tmp_path):
    st = StateStore(str(tmp_path / "cp"), "fp1")
    assert st.load() is None
    doc = st.initialize({"cursor": 0})
    assert (doc.epoch, doc.state) == (0, {"cursor": 0})
    # initialize is idempotent
    assert st.initialize({"cursor": 999}).state == {"cursor": 0}
    st.commit(1, {"cursor": 10})
    # a fresh store instance (process restart) resumes the committed state
    st2 = StateStore(str(tmp_path / "cp"), "fp1")
    doc2 = st2.load()
    assert (doc2.epoch, doc2.state) == (1, {"cursor": 10})


def test_foreign_fingerprint_is_hard_error(tmp_path):
    st = StateStore(str(tmp_path / "cp"), "fp1")
    st.initialize(0)
    other = StateStore(str(tmp_path / "cp"), "fp2")
    with pytest.raises(StateForkError):
        other.load()


def test_state_doc_roundtrip():
    doc = StateDoc("fp", "g", 3, {"window": ["2020-01-01", "2020-01-06"]}, 123.0)
    assert StateDoc.from_json(doc.to_json()) == doc
