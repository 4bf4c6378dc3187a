"""Stdlib-only Avro Object Container codec (round 14).

The environment ships no spark-avro connector jar (re-checked every
round), so the Avro surface is a spec-built codec
(sources/avro.py) behind Arrow-batched Spark plumbing — the same
pattern as the BMP/PNG/GIF/WAV codecs. These tests pin the container
walk, the binary encoding (zigzag varints, unions, blocks), hypothesis
round-trips over the full type surface, the fail-loud contract on
malformed inputs, and the Spark write→binaryFile-read cycle.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from new_kafka_consumer_to_hadoop_hdfs_spark.sources.avro import (
    MAGIC,
    decode_container,
    encode_container,
    read_avro,
    spark_to_avro_schema,
    write_avro,
    zigzag_decode,
    zigzag_encode,
)

SYNC = b"0123456789abcdef"


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip(n):
    b = zigzag_encode(n)
    m, pos = zigzag_decode(b, 0)
    assert m == n and pos == len(b)


def test_zigzag_known_vectors():
    """The spec's own examples: 0→00, -1→01, 1→02, -2→03, 2→04."""
    assert [zigzag_encode(n) for n in (0, -1, 1, -2, 2)] == [
        b"\x00", b"\x01", b"\x02", b"\x03", b"\x04",
    ]
    assert zigzag_encode(64) == b"\x80\x01"  # multi-byte varint
    with pytest.raises(ValueError, match="64-bit"):
        zigzag_encode(1 << 63)


_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": {"type": "array", "items": "long"}},
        {"name": "e", "type": ["null", "bytes"]},
        {"name": "f", "type": "boolean"},
    ],
}

_row = st.fixed_dictionaries(
    {
        "a": st.integers(min_value=-(1 << 62), max_value=1 << 62),
        "b": st.one_of(st.none(), st.text(max_size=40)),
        "c": st.floats(allow_nan=False, width=64),
        "d": st.lists(
            st.integers(min_value=-(1 << 31), max_value=1 << 31),
            max_size=6,
        ),
        "e": st.one_of(st.none(), st.binary(max_size=32)),
        "f": st.booleans(),
    }
)


@given(st.lists(_row, max_size=25), st.sampled_from(["null", "deflate"]))
@settings(max_examples=80, deadline=None)
def test_container_roundtrip_property(rows, codec):
    data = encode_container(rows, _SCHEMA, codec=codec, sync=SYNC)
    schema, back = decode_container(data)
    assert schema == _SCHEMA
    assert back == rows


def test_container_structure():
    """The container layout is real: magic, metadata map carrying the
    schema JSON and codec, the sync marker closing header AND block,
    and a raw-deflate payload (no zlib header byte 0x78)."""
    import json

    rows = [{"a": 1, "b": "x", "c": 0.5, "d": [1], "e": b"z", "f": True}]
    data = encode_container(rows, _SCHEMA, codec="deflate", sync=SYNC)
    assert data[:4] == MAGIC
    assert b"avro.schema" in data and b"avro.codec" in data
    assert data.count(SYNC) == 2  # header + one block
    assert data.endswith(SYNC)
    schema, back = decode_container(data)
    assert json.dumps(schema)  # schema survived as valid JSON
    assert back == rows
    # empty row set: header only, no data block
    empty = encode_container([], _SCHEMA, codec="deflate", sync=SYNC)
    assert empty.count(SYNC) == 1
    assert decode_container(empty) == (_SCHEMA, [])


def test_malformed_containers_raise():
    rows = [{"a": 1, "b": None, "c": 1.0, "d": [], "e": None, "f": False}]
    data = encode_container(rows, _SCHEMA, sync=SYNC)
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"NOTA" + data[4:])
    with pytest.raises(ValueError):
        decode_container(data[:-10])  # truncated block
    with pytest.raises(ValueError, match="sync"):
        # corrupt the trailing sync marker
        decode_container(data[:-16] + b"X" * 16)
    with pytest.raises(ValueError, match="codec"):
        encode_container(rows, _SCHEMA, codec="snappy")


def test_spark_schema_mapping(spark):
    df = spark.createDataFrame(
        [], "a long, b string, c double, d array<float>, e binary, "
            "f boolean, g timestamp",
    )
    got = spark_to_avro_schema(df.schema)
    types = {f["name"]: f["type"] for f in got["fields"]}
    assert types["a"] == ["null", "long"]
    assert types["d"] == ["null", {"type": "array", "items": "float"}]
    assert types["g"] == [
        "null", {"type": "long", "logicalType": "timestamp-micros"}
    ]
    with pytest.raises(ValueError, match="unsupported"):
        spark_to_avro_schema(
            spark.createDataFrame([], "m map<string,long>").schema
        )


def test_spark_write_read_roundtrip(spark, tmp_path, sf_dir):
    """The full cycle on the real tables: documents (strings + longs),
    embeddings (array<float> — float32 exactness), events (NTZ
    timestamps at microsecond precision)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    n = write_avro(docs.repartition(3), str(tmp_path / "docs"))
    assert n >= 3
    back = read_avro(
        spark, str(tmp_path / "docs"),
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in docs.collect()
    }

    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    write_avro(emb.repartition(2), str(tmp_path / "emb"))
    back2 = read_avro(spark, str(tmp_path / "emb"), emb.schema)
    a = {r[0]: [float(x) for x in r[1]] for r in emb.collect()}
    b = {r[0]: [float(x) for x in r[1]] for r in back2.collect()}
    assert a == b  # float32 payloads byte-exact through "float"

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).limit(100)
    write_avro(ev.repartition(2), str(tmp_path / "ev"))
    back3 = read_avro(spark, str(tmp_path / "ev"), ev.schema)
    assert {tuple(r) for r in back3.collect()} == {
        tuple(r) for r in ev.collect()
    }


def test_spark_write_is_overwrite_and_null_safe(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c")], "k long, v string"
    )
    write_avro(df1.coalesce(1), path)
    df2 = spark.createDataFrame([(9, "z")], "k long, v string")
    write_avro(df2.coalesce(1), path)  # overwrite replaces, not appends
    back = read_avro(spark, path, "k long, v string")
    assert [tuple(r) for r in back.collect()] == [(9, "z")]
    write_avro(df1.coalesce(1), path)
    back2 = read_avro(spark, path, "k long, v string")
    assert {tuple(r) for r in back2.collect()} == {
        (1, "a"), (2, None), (None, "c")
    }
