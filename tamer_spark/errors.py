"""Error model.

The reference wraps every failure in a single ``TamerError(msg, cause)``
(/root/reference core/src/main/scala/tamer/errors.scala:24-27). We keep the
same single-type contract; ``cause`` rides along via ``raise ... from``.
"""

from __future__ import annotations


class TamerError(Exception):
    """Engine-level failure (config, state-store corruption, sink failure)."""


class StateForkError(TamerError):
    """The persisted state belongs to a different pipeline fingerprint.

    Mirrors the reference's hard "Tamer is stuck" failure when the compacted
    state topic holds offsets that our group never committed
    (core/src/main/scala/tamer/Tamer.scala:119-134): resuming someone else's
    state silently corrupts exactly-once guarantees, so we fail loudly.
    """
