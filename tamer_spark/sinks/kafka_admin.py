"""Kafka topic preflight: verify-or-create sink and state topics.

Mirrors the reference's ``initTopics`` (core/src/main/scala/tamer/
Tamer.scala:252-327): list/describe topics; auto-create missing ones (state
topics get ``cleanup.policy=compact``) or validate partition/replica counts
and fail loudly on mismatch — a misconfigured state topic silently breaks
exactly-once.

Driver-side, gated on ``confluent_kafka`` being installed (it is not in this
test environment; the logic is pure and unit-testable through the
``admin_factory`` seam).
"""

from __future__ import annotations

from dataclasses import dataclass

from tamer_spark.errors import TamerError


@dataclass
class TopicSpec:
    """TopicConfig + TopicOptions (reference config.scala:105-135)."""

    name: str
    partitions: int = 1
    replicas: int = 1
    compacted: bool = False  # state topics must compact (Tamer.scala:281)

    @property
    def config(self) -> dict[str, str]:
        return {"cleanup.policy": "compact"} if self.compacted else {}


def verify_or_create_topics(specs: list[TopicSpec], admin=None, bootstrap: str | None = None, auto_create: bool = True) -> None:
    """Preflight each topic: create if absent (when ``auto_create``), else
    validate partitions/replication; raise TamerError on any mismatch.

    ``admin``: a confluent_kafka.admin.AdminClient-compatible object (seam
    for tests); built from ``bootstrap`` when omitted.
    """
    if admin is None:
        try:
            from confluent_kafka.admin import AdminClient  # gated
        except ImportError as e:  # pragma: no cover
            raise TamerError(
                "topic preflight needs confluent_kafka (pip install confluent-kafka) "
                "or an injected admin client"
            ) from e
        admin = AdminClient({"bootstrap.servers": bootstrap or "localhost:9092"})

    existing = admin.list_topics(timeout=30).topics
    missing = [s for s in specs if s.name not in existing]
    present = [s for s in specs if s.name in existing]

    if missing:
        if not auto_create:
            raise TamerError(f"missing topics: {[s.name for s in missing]} (auto-create disabled)")
        from_new = _new_topics(missing)
        futures = admin.create_topics(from_new)
        for name, fut in futures.items():
            try:
                fut.result(timeout=30)
            except Exception as e:  # noqa: BLE001
                raise TamerError(f"failed to create topic {name}: {e}") from e

    for spec in present:
        meta = existing[spec.name]
        nparts = len(meta.partitions)
        if nparts != spec.partitions:
            raise TamerError(
                f"topic {spec.name}: {nparts} partitions, expected {spec.partitions}"
            )
        replicas = {len(p.replicas) for p in meta.partitions.values()} if hasattr(
            meta.partitions, "values"
        ) else {len(p.replicas) for p in meta.partitions}
        if replicas and replicas != {spec.replicas}:
            raise TamerError(
                f"topic {spec.name}: replication {replicas}, expected {spec.replicas}"
            )


def _new_topics(specs: list[TopicSpec]):
    try:
        from confluent_kafka.admin import NewTopic
    except ImportError:
        # injected fake admin (tests / alternative clients): hand it the specs
        return list(specs)
    return [
        NewTopic(
            s.name,
            num_partitions=s.partitions,
            replication_factor=s.replicas,
            config=s.config,
        )
        for s in specs
    ]
