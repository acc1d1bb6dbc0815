"""Topic preflight semantics (reference Tamer.scala:252-327) against a fake
admin client: create-if-missing, compaction config for state topics,
validate-and-fail on partition/replica mismatch."""

from __future__ import annotations

import pytest

from tamer_spark.errors import TamerError
from tamer_spark.sinks.kafka_admin import TopicSpec, verify_or_create_topics


class _Future:
    def __init__(self, err=None):
        self.err = err

    def result(self, timeout=None):
        if self.err:
            raise self.err


class _PartMeta:
    def __init__(self, replicas):
        self.replicas = list(range(replicas))


class _TopicMeta:
    def __init__(self, partitions, replicas):
        self.partitions = {i: _PartMeta(replicas) for i in range(partitions)}


class _Meta:
    def __init__(self, topics):
        self.topics = topics


class FakeAdmin:
    def __init__(self, topics=None):
        self.topics = topics or {}
        self.created = []

    def list_topics(self, timeout=None):
        return _Meta(self.topics)

    def create_topics(self, new_topics):
        self.created.extend(new_topics)
        return {getattr(t, "name", getattr(t, "topic", None)): _Future() for t in new_topics}


def test_creates_missing_topics_with_compaction():
    admin = FakeAdmin()
    specs = [TopicSpec("sink", 4, 1), TopicSpec("state", 1, 1, compacted=True)]
    verify_or_create_topics(specs, admin=admin)
    names = [t.name for t in admin.created]
    assert names == ["sink", "state"]
    assert admin.created[1].config == {"cleanup.policy": "compact"}
    assert admin.created[0].config == {}


def test_missing_without_autocreate_fails():
    with pytest.raises(TamerError, match="missing topics"):
        verify_or_create_topics([TopicSpec("sink")], admin=FakeAdmin(), auto_create=False)


def test_partition_mismatch_fails():
    admin = FakeAdmin({"sink": _TopicMeta(partitions=2, replicas=1)})
    with pytest.raises(TamerError, match="partitions"):
        verify_or_create_topics([TopicSpec("sink", partitions=4)], admin=admin)


def test_replica_mismatch_fails():
    admin = FakeAdmin({"sink": _TopicMeta(partitions=1, replicas=1)})
    with pytest.raises(TamerError, match="replication"):
        verify_or_create_topics([TopicSpec("sink", partitions=1, replicas=3)], admin=admin)


def test_matching_topics_pass():
    admin = FakeAdmin({"sink": _TopicMeta(partitions=4, replicas=1)})
    verify_or_create_topics([TopicSpec("sink", partitions=4, replicas=1)], admin=admin)
    assert admin.created == []
