"""Avro binary codec: golden bytes from the public spec, round-trip
properties, and the framed DataFrame encode path."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tamer_spark.serde.avro import AvroCodec, encode_df
from tamer_spark.serde import FakeRegistry, extract_schema_id, unframe_confluent


# --- golden bytes straight from the Avro spec's encoding examples ----------

def test_golden_long_zigzag_varints():
    c = AvroCodec("\"long\"")
    # spec table: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    assert c.encode(0) == b"\x00"
    assert c.encode(-1) == b"\x01"
    assert c.encode(1) == b"\x02"
    assert c.encode(-2) == b"\x03"
    assert c.encode(2) == b"\x04"
    assert c.encode(-64) == b"\x7f"
    assert c.encode(64) == b"\x80\x01"


def test_golden_string_and_record():
    # spec example: "foo" → 06 66 6f 6f
    assert AvroCodec('"string"').encode("foo") == b"\x06foo"
    # spec example record {"a": 27, "b": "foo"} → 36 06 66 6f 6f
    schema = {
        "type": "record",
        "name": "test",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    assert AvroCodec(schema).encode({"a": 27, "b": "foo"}) == b"\x36\x06foo"


def test_golden_array_of_longs():
    # spec example: [3, 27] → 04 06 36 00
    assert AvroCodec({"type": "array", "items": "long"}).encode([3, 27]) == b"\x04\x06\x36\x00"


def test_nullable_union():
    c = AvroCodec(["null", "string"])
    assert c.encode(None) == b"\x00"           # branch 0
    assert c.encode("hi") == b"\x02\x04hi"     # branch 1 + string
    assert c.decode(c.encode(None)) is None
    assert c.decode(c.encode("hi")) == "hi"


# --- round-trip properties --------------------------------------------------

_SCHEMA = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "desc", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
    ],
}


@settings(max_examples=150, deadline=None)
@given(
    id_=st.integers(min_value=-(2**62), max_value=2**62),
    name=st.text(max_size=30),
    desc=st.none() | st.text(max_size=20),
    score=st.floats(allow_nan=False, allow_infinity=False),
    flag=st.booleans(),
    tags=st.lists(st.text(max_size=8), max_size=4),
    props=st.dictionaries(st.text(max_size=6), st.integers(min_value=-1000, max_value=1000), max_size=4),
)
def test_roundtrip_property(id_, name, desc, score, flag, tags, props):
    c = AvroCodec(_SCHEMA)
    rec = {"id": id_, "name": name, "desc": desc, "score": score, "flag": flag, "tags": tags, "props": props}
    assert c.decode(c.encode(rec)) == rec


# --- framed DataFrame path ---------------------------------------------------

def test_encode_df_with_confluent_framing(spark):
    from pyspark.sql import functions as F

    reg = FakeRegistry()
    schema = {
        "type": "record",
        "name": "Row",
        "fields": [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}],
    }
    import json

    sid = reg.get_or_register_id("t-value", json.dumps(schema))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    framed = encode_df(df, ["id", "name"], schema, schema_id=sid)
    rows = framed.select(
        extract_schema_id(F.col("value")).alias("sid"), unframe_confluent(F.col("value")).alias("payload")
    ).collect()
    codec = AvroCodec(schema)
    decoded = sorted(codec.decode(bytes(r.payload))["id"] for r in rows)
    assert decoded == [1, 2]
    assert all(r.sid == sid for r in rows)


def test_decode_df_roundtrip(spark):
    from tamer_spark.serde.avro import decode_df

    schema = {
        "type": "record",
        "name": "Row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "note", "type": ["null", "string"]},
        ],
    }
    df = spark.createDataFrame([(1, "a", None), (2, "b", "x")], "id long, name string, note string")
    framed = encode_df(df, ["id", "name", "note"], schema, schema_id=3)
    back = decode_df(framed, "value", schema, framed=True)
    got = sorted((r.id, r.name, r.note) for r in back.collect())
    assert got == [(1, "a", None), (2, "b", "x")]


def test_jvm_to_avro_parity_with_python_codec(spark):
    """Golden-byte parity: spark-avro's to_avro must emit the same Avro
    binary as the pure-Python codec (both implement the Avro 1.x binary
    spec). Skips when the spark-avro package cannot load in this
    environment — the pure-Python codec remains the exercised path.

    Load attempts on record (2026-08-13, re-attempted rounds 4, 5, and 6
    [2026-08-14] — unchanged): no spark-avro_2.13 jar anywhere on
    the machine (bundled pyspark jars carry avro/avro-ipc/avro-mapred 1.12.1
    but not the spark-avro connector module), and Maven Central is
    unreachable (curl rc=6, DNS resolution failure), so neither a vendored
    jar nor ``--packages org.apache.spark:spark-avro_2.13:4.1.2`` can
    succeed; to_avro raises AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE.
    """
    import pytest
    from pyspark.sql import functions as F

    from tamer_spark.serde.avro import AvroCodec

    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "a", "type": "long"}, {"name": "s", "type": "string"}],
    }
    try:
        from pyspark.sql.avro.functions import to_avro

        df = spark.createDataFrame([(3, "xy")], "a long, s string")
        jvm_bytes = df.select(
            to_avro(F.struct("a", "s"), __import__("json").dumps(schema)).alias("b")
        ).collect()[0].b
    except Exception as e:  # AnalysisException: AVRO_NOT_LOADED...
        pytest.skip(f"spark-avro package not loadable in this environment: {type(e).__name__}")
    py_bytes = AvroCodec(schema).encode({"a": 3, "s": "xy"})
    assert bytes(jvm_bytes) == py_bytes
