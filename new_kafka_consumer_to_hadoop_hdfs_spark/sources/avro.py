"""Stdlib-only Apache Avro Object Container File codec + Spark plumbing.

The environment ships no ``spark-avro`` connector jar (re-checked every
round), so the Avro surface is built the way the image/audio codecs
were (operators/multimodal.py): a REAL codec implemented from the
PUBLIC specification — Apache Avro 1.11.x, "Object Container Files" +
"Binary Encoding" sections — with the Spark side as Arrow-batched
``mapInPandas`` plumbing over built-in sources (``binaryFile`` scan for
reads, per-batch container files for writes). The reference repo has
no Avro at all (650-line Kafka→HDFS relay); this closes the
environment-blocked row of the extension surface.

Spec facts this file implements (all public):

- container layout: magic ``Obj\\x01`` · file-metadata map
  (``avro.schema`` JSON, ``avro.codec``) · random 16-byte sync marker,
  then data blocks of (record count, byte size, records, sync marker);
- ``deflate`` codec is RAW RFC-1951 deflate (no zlib header/trailer:
  ``zlib.compressobj(wbits=-15)``);
- binary encoding: int/long = ZIGZAG VARINT, string/bytes =
  length-prefixed, float/double = IEEE little-endian, boolean = 1
  byte, null = 0 bytes, unions = branch index then value, arrays and
  maps = count-prefixed blocks with a 0 terminator;
- records encode their fields in declared order.

Type surface (maps 1:1 onto the testdata tables): long, int, double,
float, string, boolean, binary, timestamp (as Avro's
``timestamp-micros`` logical long), and arrays of those — enough for
``documents``, ``events``, and ``embeddings`` (``array<float>``).
Caveat shared with every pandas bridge: Spark nulls arrive as NaN/NaT
in numeric/timestamp batches, so a literal NaN double in a NULLABLE
column writes as null (document corpora don't carry NaN payloads; pin
non-null schemas where it matters).

Scale shape: one container file per Arrow batch per partition —
writers never shuffle, readers get one task per file (Avro blocks are
splittable in principle; a corpus sink controls file size with
``maxRecordsPerBatch``/repartition exactly like the text sinks).
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# The mapInPandas closures below call back into this module from the
# PYTHON WORKERS, which do not inherit the driver's sys.path edits.
# The driver captures the package's parent directory into the closure
# (a plain string — pickles anywhere) and the worker prepends it
# before importing. Same-machine local mode always works; on a real
# cluster ship the package (`--py-files` / pex) and the bootstrap is a
# no-op because the import already resolves.
_PKG_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


# --- zigzag varints ---------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"long out of 64-bit range: {n}")
    u = (n << 1) ^ (n >> 63)  # arithmetic shift: -1 mask for negatives
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated avro: varint ran off the end")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("malformed avro: varint too long")
    return (u >> 1) ^ -(u & 1), pos


# --- schema mapping ---------------------------------------------------

_PRIM = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_type(dt: T.DataType) -> object:
    for cls, name in _PRIM.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _avro_type(dt.elementType)}
    raise ValueError(f"unsupported Spark type for avro: {dt}")


def spark_to_avro_schema(schema: T.StructType, name: str = "row") -> dict:
    """The Avro record schema of a Spark StructType: nullable fields
    become ``["null", T]`` unions (null branch FIRST — the convention
    every Avro writer uses, so a null encodes as index 0)."""
    fields = []
    for f in schema.fields:
        at = _avro_type(f.dataType)
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": name, "fields": fields}


# --- value encoding ---------------------------------------------------


def _is_null(v) -> bool:
    if v is None:
        return True
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False  # arrays/lists: pd.isna is elementwise


def _encode_value(v, typ, out: bytearray) -> None:
    if isinstance(typ, list):  # union: branch index, then value
        if _is_null(v):
            out += zigzag_encode(typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        out += zigzag_encode(branch)
        _encode_value(v, typ[branch], out)
        return
    if isinstance(typ, dict):
        t = typ["type"]
        if t == "array":
            items = list(v)
            if items:
                out += zigzag_encode(len(items))
                for it in items:
                    _encode_value(it, typ["items"], out)
            out += zigzag_encode(0)
            return
        if t == "record":
            for f in typ["fields"]:
                _encode_value(v[f["name"]], f["type"], out)
            return
        if t == "long" and typ.get("logicalType") in (
            "timestamp-micros", "local-timestamp-micros"
        ):
            ts = pd.Timestamp(v)
            out += zigzag_encode(ts.value // 1000)  # ns -> µs
            return
        typ = t  # annotated primitive, e.g. {"type": "long"}
    if typ in ("long", "int"):
        out += zigzag_encode(int(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "string":
        b = str(v).encode("utf-8")
        out += zigzag_encode(len(b))
        out += b
    elif typ == "bytes":
        b = bytes(v)
        out += zigzag_encode(len(b))
        out += b
    elif typ == "boolean":
        out.append(1 if v else 0)
    elif typ == "null":
        pass
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _decode_value(buf: bytes, pos: int, typ) -> tuple[object, int]:
    if isinstance(typ, list):
        idx, pos = zigzag_decode(buf, pos)
        if not 0 <= idx < len(typ):
            raise ValueError(f"union branch {idx} out of range")
        return _decode_value(buf, pos, typ[idx])
    if isinstance(typ, dict):
        t = typ["type"]
        if t == "array":
            items = []
            while True:
                n, pos = zigzag_decode(buf, pos)
                if n == 0:
                    break
                if n < 0:  # block with byte size (spec-legal): skip size
                    n = -n
                    _, pos = zigzag_decode(buf, pos)
                for _ in range(n):
                    it, pos = _decode_value(buf, pos, typ["items"])
                    items.append(it)
            return items, pos
        if t == "record":
            rec = {}
            for f in typ["fields"]:
                rec[f["name"]], pos = _decode_value(buf, pos, f["type"])
            return rec, pos
        if t == "long" and typ.get("logicalType") in (
            "timestamp-micros", "local-timestamp-micros"
        ):
            n, pos = zigzag_decode(buf, pos)
            return pd.Timestamp(n * 1000), pos  # µs -> ns
        typ = t
    if typ in ("long", "int"):
        return zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ in ("string", "bytes"):
        n, pos = zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated avro: length runs past the end")
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    if typ == "boolean":
        if pos >= len(buf):
            raise ValueError("truncated avro: missing boolean byte")
        return buf[pos] != 0, pos + 1
    if typ == "null":
        return None, pos
    raise ValueError(f"unsupported avro type {typ!r}")


# --- container files --------------------------------------------------


def encode_container(
    rows: list[dict],
    avro_schema: dict,
    *,
    codec: str = "deflate",
    sync: bytes | None = None,
) -> bytes:
    """One Object Container File: header (magic, metadata map, sync),
    one data block, trailing sync. ``sync`` overrides the random
    marker for deterministic fixtures."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    if sync is None:
        sync = os.urandom(16)
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    out += zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += zigzag_encode(len(kb))
        out += kb
        out += zigzag_encode(len(v))
        out += v
    out += zigzag_encode(0)  # map terminator
    out += sync
    body = bytearray()
    for r in rows:
        _encode_value(r, avro_schema, body)
    payload = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(6, zlib.DEFLATED, -15)  # RAW deflate
        payload = c.compress(payload) + c.flush()
    if rows:
        out += zigzag_encode(len(rows))
        out += zigzag_encode(len(payload))
        out += payload
        out += sync
    return bytes(out)


def decode_container(data: bytes) -> tuple[dict, list[dict]]:
    """Parse one Object Container File back to (schema, rows). A real
    chunk walk: magic check, metadata map blocks, codec dispatch,
    per-block sync-marker verification — every malformed input raises
    ValueError (the same fail-loud seam contract as the image codecs)."""
    if data[:4] != MAGIC:
        raise ValueError(f"not an avro container: magic {data[:4]!r}")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count -> block byte size follows
            n = -n
            _, pos = zigzag_decode(data, pos)
        for _ in range(n):
            kl, pos = zigzag_decode(data, pos)
            key = data[pos : pos + kl].decode()
            pos += kl
            vl, pos = zigzag_decode(data, pos)
            meta[key] = bytes(data[pos : pos + vl])
            pos += vl
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise ValueError("avro container lacks avro.schema") from None
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    if len(data) < pos + 16:
        raise ValueError("truncated avro: header sync cut short")
    sync = data[pos : pos + 16]
    pos += 16
    rows: list[dict] = []
    while pos < len(data):
        count, pos = zigzag_decode(data, pos)
        size, pos = zigzag_decode(data, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(data):
            raise ValueError("truncated avro: data block cut short")
        block = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("avro sync marker mismatch after block")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bp = 0
        for _ in range(count):
            rec, bp = _decode_value(block, bp, schema)
            rows.append(rec)
        if bp != len(block):
            raise ValueError(
                f"avro block has {len(block) - bp} trailing bytes"
            )
    return schema, rows


# --- Spark plumbing ---------------------------------------------------


def write_avro(df: DataFrame, path: str, *, codec: str = "deflate") -> int:
    """Write ``df`` as Avro container files, one per Arrow batch per
    partition (``part-{partition:05d}-{batch:04d}.avro``) — the write
    tasks encode their own batches (Arrow transfer, no shuffle, no
    driver collection of data; only the file/row-count manifest comes
    back). ``mode`` is overwrite, like every sink here: the target
    directory is replaced. Returns the number of files written."""
    schema = df.schema
    avro_schema = spark_to_avro_schema(schema)
    fields = [(f.name, f.dataType) for f in schema.fields]
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    pkg_root = _PKG_ROOT

    def gen(batches):
        import sys as _sys  # noqa: PLC0415 — worker-side

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from pyspark import TaskContext  # noqa: PLC0415 — worker-side

        from new_kafka_consumer_to_hadoop_hdfs_spark.sources.avro import (  # noqa: PLC0415
            encode_container,
        )

        pid = TaskContext.get().partitionId()
        wrote = 0
        for bi, pdf in enumerate(batches):
            rows = [
                {name: pdf[name].iloc[i] for name, _ in fields}
                for i in range(len(pdf))
            ]
            data = encode_container(rows, avro_schema, codec=codec)
            fname = f"part-{pid:05d}-{bi:04d}.avro"
            tmp = os.path.join(path, f".{fname}.tmp.{os.getpid()}")
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, os.path.join(path, fname))
            wrote += 1
            yield pd.DataFrame({"file": [fname], "n_rows": [len(pdf)]})
        # empty partitions simply yield nothing: no file, no manifest row

    manifest = df.mapInPandas(gen, "file string, n_rows long").collect()
    return len(manifest)


def read_avro(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read a directory of Avro container files through Spark's
    built-in ``binaryFile`` source + an Arrow-batched decode — one
    task per file, schema supplied EXPLICITLY (same
    no-inference-scan discipline as the text sinks). ``schema`` is the
    expected Spark schema (DDL string or StructType); fields are
    matched by name against the container's own embedded schema."""
    full = (
        spark.createDataFrame([], schema).schema
        if isinstance(schema, str)
        else schema
    )
    names = [f.name for f in full.fields]
    ts_cols = {
        f.name for f in full.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    }
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro")
    ).select("content")

    pkg_root = _PKG_ROOT

    def gen(batches):
        import sys as _sys  # noqa: PLC0415 — worker-side

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from new_kafka_consumer_to_hadoop_hdfs_spark.sources.avro import (  # noqa: PLC0415
            decode_container,
        )

        for pdf in batches:
            for data in pdf["content"]:
                _, rows = decode_container(bytes(data))
                cols = {}
                for n in names:
                    vals = [r.get(n) for r in rows]
                    if n in ts_cols:
                        cols[n] = pd.to_datetime(pd.Series(vals))
                    else:
                        cols[n] = pd.Series(vals, dtype=object)
                yield pd.DataFrame(cols, columns=names)

    return files.mapInPandas(gen, full)
