"""JSON-lines sink — the reference's HDFS TextOutputFormat output.

Reference: one compact JSON object per line, key suppressed, output dir
deleted before the job runs so re-runs are idempotent
(HadoopKafkaConsumer.java:96-97,138-147,152-155).

Spark: ``mode("overwrite")`` replaces the delete-then-write dance
atomically (per-job, via the commit protocol — strictly safer than the
reference's manual delete, which can destroy data if the job then
fails). For streams, the checkpointed file sink gives exactly-once,
replacing the reference's 1 s offset auto-commit (at-least-once with a
lossy queue — SURVEY.md §1.3).

At scale: a text sink writes one file per partition; callers control
file count/size with ``target_files`` (coalesce — no shuffle) rather
than letting 10k tasks write 10k small files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_json_lines(
    df: DataFrame,
    path: str,
    *,
    line: Column | None = None,
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    """Write one compact JSON object per row to text files.

    ``line`` defaults to serializing all columns; pass an explicit
    column (e.g. ``serialize_message(...)``) for reference-exact output.
    """
    if line is None:
        line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    out = df.select(line.alias("value"))
    if target_files:
        out = out.coalesce(target_files)
    out.write.mode(mode).text(path)


def stream_json_lines(df: DataFrame, path: str, checkpoint: str, *, available_now: bool = True):
    """Streaming twin: checkpointed text sink, exactly-once.

    ``available_now=True`` reproduces the reference's "consume all
    that's there, then stop" (KafkaContext.java:145-150) with replayable
    delivery instead of the reference's racy auto-commit.
    """
    out = df
    if "value" not in df.columns or len(df.columns) > 1:
        out = df.select(F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"))
    writer = (
        out.writeStream.format("text")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
