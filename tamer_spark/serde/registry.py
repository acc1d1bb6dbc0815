"""Confluent-compatible schema-registry client (driver-side, stdlib HTTP).

Mirrors core/src/main/scala/tamer/Registry.scala:

- ``get_or_register_id(subject, schema)``: try lookup (``POST /subjects/{s}``),
  fall back to register (``POST /subjects/{s}/versions``) — the ``<>``
  fallback at Registry.scala:127,
- ``verify_schema(id, schema)``: fetch by id (``GET /schemas/ids/{id}``) and
  check reader/writer compatibility (Registry.scala:131-143),
- two TTL caches (ids and verifications) sized/expired like the reference's
  zio-cache pair (default size 4, 1 h — config.scala:57-72),
- subject naming ``{topic}-key`` / ``{topic}-value`` (Serde.scala:41),
- Basic/Bearer auth headers (config.scala:31-55),
- ``FakeRegistry``: no-op for registry-less operation (Registry.scala:152-157).

Compatibility checking implements the core Avro reader/writer rules
structurally (field added without default / field type changed / name
mismatch ⇒ incompatible), rendering human-readable messages like
Codec.scala:41-74. The full Avro resolution matrix belongs to the `avro`
package when present; this covers the record-evolution cases the reference
exercises.
"""

from __future__ import annotations

import json
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Any

from tamer_spark.errors import TamerError


class TTLCache:
    """Tiny LRU+TTL cache (reference: zio-cache size 4 / 1 h, config.scala:61-68)."""

    def __init__(self, size: int = 4, ttl_s: float = 3600.0):
        self.size, self.ttl_s = size, ttl_s
        self._d: dict[Any, tuple[float, Any]] = {}

    def get(self, key):
        hit = self._d.get(key)
        if hit is None:
            return None
        ts, val = hit
        if time.monotonic() - ts > self.ttl_s:
            del self._d[key]
            return None
        return val

    def put(self, key, val):
        if len(self._d) >= self.size and key not in self._d:
            oldest = min(self._d, key=lambda k: self._d[k][0])
            del self._d[oldest]
        self._d[key] = (time.monotonic(), val)


def _field_map(schema: dict) -> dict[str, dict]:
    return {f["name"]: f for f in schema.get("fields", [])}


def check_compat(reader: dict | str, writer: dict | str) -> list[str]:
    """Reader/writer compatibility errors ([] = compatible).

    Avro record-resolution rules (public spec): reader field missing from
    writer needs a default; matching fields need compatible types; record
    names must match. Messages mirror Codec.scala:65-74's rendering.
    """
    r = json.loads(reader) if isinstance(reader, str) else reader
    w = json.loads(writer) if isinstance(writer, str) else writer
    errs: list[str] = []
    if r.get("type") != w.get("type"):
        return [f"type mismatch: reader {r.get('type')} vs writer {w.get('type')}"]
    if r.get("type") == "record":
        if r.get("name") != w.get("name"):
            errs.append(f"record name mismatch: {r.get('name')} vs {w.get('name')}")
        wf = _field_map(w)
        for name, rf in _field_map(r).items():
            if name not in wf:
                if "default" not in rf:
                    errs.append(f"READER_FIELD_MISSING_DEFAULT_VALUE: {name}")
            else:
                rt, wt = rf["type"], wf[name]["type"]
                if not _types_compatible(rt, wt):
                    errs.append(f"TYPE_MISMATCH for field {name}: reader {rt} vs writer {wt}")
    return errs


_PROMOTIONS = {
    ("long", "int"),
    ("float", "int"),
    ("float", "long"),
    ("double", "int"),
    ("double", "long"),
    ("double", "float"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def _types_compatible(rt, wt) -> bool:
    if rt == wt:
        return True
    if isinstance(rt, list):  # reader union accepts writer member
        return any(_types_compatible(t, wt) for t in rt)
    if isinstance(wt, list):
        return all(_types_compatible(rt, t) for t in wt)
    if isinstance(rt, str) and isinstance(wt, str):
        return (rt, wt) in _PROMOTIONS
    if isinstance(rt, dict) and isinstance(wt, dict):
        if rt.get("type") == wt.get("type") == "array":
            return _types_compatible(rt["items"], wt["items"])
        if rt.get("type") == wt.get("type") == "map":
            return _types_compatible(rt["values"], wt["values"])
        if rt.get("type") == wt.get("type") == "record":
            return not check_compat(rt, wt)
    return False


@dataclass
class RegistryClient:
    """HTTP client for a Confluent-compatible registry."""

    base_url: str
    auth_header: str | None = None  # "Basic xxx" / "Bearer yyy" (config.scala:31-55)
    cache_size: int = 4
    cache_ttl_s: float = 3600.0
    _id_cache: TTLCache = field(init=False, repr=False)
    _verify_cache: TTLCache = field(init=False, repr=False)

    def __post_init__(self):
        self._id_cache = TTLCache(self.cache_size, self.cache_ttl_s)
        self._verify_cache = TTLCache(self.cache_size, self.cache_ttl_s)

    def _req(self, method: str, path: str, body: dict | None = None) -> dict:
        url = self.base_url.rstrip("/") + path
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        if self.auth_header:
            req.add_header("Authorization", self.auth_header)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:  # type: ignore[attr-defined]
            raise TamerError(f"registry {method} {path} failed: HTTP {e.code}") from e

    def get_or_register_id(self, subject: str, schema_json: str) -> int:
        """Lookup-else-register (Registry.scala:113-127)."""
        key = (subject, schema_json)
        cached = self._id_cache.get(key)
        if cached is not None:
            return cached
        try:
            sid = int(self._req("POST", f"/subjects/{subject}", {"schema": schema_json})["id"])
        except TamerError:
            sid = int(
                self._req("POST", f"/subjects/{subject}/versions", {"schema": schema_json})["id"]
            )
        self._id_cache.put(key, sid)
        return sid

    def verify_schema(self, schema_id: int, reader_schema_json: str) -> None:
        """Fetch writer schema by id; raise on incompatibility
        (Registry.scala:131-143)."""
        key = (schema_id, reader_schema_json)
        if self._verify_cache.get(key):
            return
        writer = self._req("GET", f"/schemas/ids/{schema_id}")["schema"]
        errs = check_compat(reader_schema_json, writer)
        if errs:
            raise TamerError(
                f"schema id {schema_id} incompatible with reader: " + "; ".join(errs)
            )
        self._verify_cache.put(key, True)


class FakeRegistry:
    """In-memory no-op-ish registry (Registry.scala:152-157) — also the test
    double: assigns ids, stores schemas, does real compat checks."""

    def __init__(self):
        self._by_subject: dict[tuple[str, str], int] = {}
        self._by_id: dict[int, str] = {}
        self._next = 1

    def get_or_register_id(self, subject: str, schema_json: str) -> int:
        key = (subject, schema_json)
        if key not in self._by_subject:
            self._by_subject[key] = self._next
            self._by_id[self._next] = schema_json
            self._next += 1
        return self._by_subject[key]

    def verify_schema(self, schema_id: int, reader_schema_json: str) -> None:
        writer = self._by_id.get(schema_id)
        if writer is None:
            raise TamerError(f"unknown schema id {schema_id}")
        errs = check_compat(reader_schema_json, writer)
        if errs:
            raise TamerError(
                f"schema id {schema_id} incompatible with reader: " + "; ".join(errs)
            )


def subjects(topic: str) -> tuple[str, str]:
    """Subject naming convention (Serde.scala:41)."""
    return f"{topic}-key", f"{topic}-value"
