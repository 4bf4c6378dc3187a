"""Multimodal column handling: opaque binary payloads + typed metadata.

SURVEY.md §2.5 mandates multimodal columns for the LLM-data pipeline:
image/audio/video stored as ``binary`` columns with structured
metadata, processed by Arrow-batched Python (`mapInPandas`) because
media decoding cannot be expressed in SQL expressions.

Design for 100 TB:
- The binary payload travels as a normal DataFrame column: parquet
  stores it page-compressed, scans prune it unless selected, and
  shuffles move it only when a plan actually requires it. Metadata
  (dims, codec, byte size, hashes) lives in plain typed columns so
  filters/joins touch ONLY metadata — never decode on the filter path.
- Decode/feature-extraction runs in ``mapInPandas``: one Arrow batch
  per invocation (bounded memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``), embarrassingly
  parallel, no shuffle. Output is a fresh schema — columnar features,
  not decoded frames, to keep the post-decode data small.
- The actual media decoder is STUBBED in this environment (no
  PIL/ffmpeg in the container): :func:`decode_stub` raises
  ``NotImplementedError`` where a real decoder would plug in, and the
  pipeline substitutes :func:`fake_decode_features` — a deterministic
  byte-level featurizer — so the Spark-side plumbing (schema, batch
  iteration, partitioning) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of a multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)



def _ship_module_by_value() -> None:
    """UDF bodies in this module run inside Spark tasks — ship the
    module by value (shared impl: new_kafka_consumer_to_hadoop_hdfs_spark/shipping.py)."""
    from ..shipping import ship_module_by_value

    ship_module_by_value(__name__)


def decode_stub(payload: bytes, media_type: str):  # pragma: no cover
    """Plug point for a real media decoder (PIL / soundfile / pyav).

    The execution container ships no media libraries, so this raises;
    production deployments replace it (or install the libs and branch
    here). Kept as a function — NOT dead code — so the pipeline shape
    is honest about where decoding happens.
    """
    raise NotImplementedError(
        "media decoding requires PIL/soundfile/pyav, not available in "
        "this environment; fake_decode_features provides the "
        "deterministic stand-in"
    )


def fake_decode_features(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decoder: derives pseudo dimensions and a
    16-bin byte histogram 'embedding' from the raw bytes. Exercises the
    exact batch shapes a real decoder produces."""
    n = len(payload)
    hist = [0] * 16
    for b in payload:
        hist[b >> 4] += 1
    total = float(n) or 1.0
    return {
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "n_frames": 1 if media_type != "video/fake" else (n % 24) + 1,
        "feature": [c / total for c in hist],
    }


def extract_features(assets: DataFrame, *, use_real_decoder: bool = False) -> DataFrame:
    """Decode + featurize multimodal payloads via Arrow-batched Python.

    ``mapInPandas`` streams Arrow record batches through the featurizer
    partition-parallel (no shuffle); output rows carry compact features
    only. This is the ONE sanctioned Python hot path in the engine
    (media decode is not SQL-expressible); everything around it —
    filtering, joins, dedup on the sha256 — stays in JVM expressions.
    """

    _ship_module_by_value()

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = decode_stub if use_real_decoder else fake_decode_features
        for pdf in batches:
            feats = [
                decoder(payload if payload is not None else b"", mt)
                for payload, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return assets.mapInPandas(featurize, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("out_bytes", LongType()),
        StructField("resized_sha", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def resize_assets(assets: DataFrame, *, target: int = 64) -> DataFrame:
    """Nearest-neighbor resample of each payload to ``target`` bytes via
    Arrow-batched Python — the resize stage of a media pipeline, with
    byte-level sampling standing in for 2-D pixel resampling (the index
    arithmetic ``out[j] = in[floor(j·L/target)]`` IS nearest-neighbor;
    a real image resize applies it per axis after decode_stub).

    1 row in → 1 row out, no shuffle; emits the resampled content's
    sha256 plus sizes, so the whole Python path is content-hash
    verifiable against an engine-independent oracle.
    """
    _ship_module_by_value()

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b)
                out = bytes(b[(j * n) // target] for j in range(target)) if n else b""
                rows.append(
                    (asset_id, n, len(out), hashlib.sha256(out).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "orig_bytes", "out_bytes", "resized_sha"]
            )

    return assets.mapInPandas(do_resize, schema=RESIZE_SCHEMA)


def sample_frames(
    assets: DataFrame, *, frame_len: int = 256, step: int = 2
) -> DataFrame:
    """Frame sampling via Arrow-batched Python: treat each payload as
    fixed-size frames of ``frame_len`` bytes and keep every ``step``-th
    frame — the 1-row-in → N-rows-out batch shape of a video
    frame-sampler (mapInPandas output need not be 1:1 with input).

    Emits per-frame byte counts and content sha256, so frame
    boundaries, the sampling stride, AND the sliced content are all
    verifiable against an engine-independent oracle.
    """
    _ship_module_by_value()

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = -(-len(b) // frame_len)  # ceil
                for i in range(0, n_frames, step):
                    frame = b[i * frame_len : (i + 1) * frame_len]
                    rows.append(
                        (asset_id, i, len(frame), hashlib.sha256(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_bytes", "frame_sha"]
            )

    return assets.mapInPandas(do_sample, schema=FRAME_SCHEMA)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adapt the documents table into multimodal asset rows: the UTF-8
    bytes of ``text`` stand in for media payloads (deterministic, so
    oracle-checkable), with metadata computed JVM-side."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/fake-image").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )
