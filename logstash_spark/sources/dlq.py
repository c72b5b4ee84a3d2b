"""dead_letter_queue input: re-ingest events the pipeline dead-lettered.

Reference: `logstash-input-dead_letter_queue` + logstash-core
`DeadLetterQueueReader.java` (SURVEY.md §2.1). The runner's DLQ sink
(plans/runner.py §dlq_sink) stores each failed event with a
`_dlq_reason` column = the comma-joined failure tags that routed it
there (the analog of `[@metadata][dead_letter_queue][reason]`). This
source closes the loop: read the DLQ table back, select by reason, and
strip the DLQ metadata (and optionally the failure tags) so the events
re-enter a pipeline clean.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.sources.tableio import SnapshotTable


def dlq_replay_frame(
    df: DataFrame,
    *,
    reason_filter: str | None = None,
    strip_metadata: bool = True,
    clear_tags: Sequence[str] | None = None,
) -> DataFrame:
    """Pure replay transformation over a DLQ-shaped DataFrame.

    * `reason_filter` — keep only events whose `_dlq_reason` contains the
      given tag (exact member of the comma-joined list, not substring —
      `_grokparsefailure` must not also select `_grokparsefailure_x`).
    * `strip_metadata` — drop `_dlq_reason` (the reference strips
      `[@metadata][dead_letter_queue]` unless the user opts to keep it).
    * `clear_tags` — remove these failure tags from `tags` so downstream
      filters re-run cleanly (the reference leaves this to a mutate;
      offered here because replay-through-a-fixed-parser is THE use).
    """
    if reason_filter is not None and "_dlq_reason" in df.columns:
        df = df.where(
            F.array_contains(F.split(F.col("_dlq_reason"), ","), reason_filter)
        )
    if strip_metadata and "_dlq_reason" in df.columns:
        df = df.drop("_dlq_reason")
    if clear_tags and "tags" in df.columns:
        df = df.withColumn(
            "tags",
            F.array_except(F.col("tags"), F.array(*[F.lit(t) for t in clear_tags])),
        )
    return df


def dead_letter_queue(
    spark: SparkSession,
    path: str,
    *,
    reason_filter: str | None = None,
    strip_metadata: bool = True,
    clear_tags: Sequence[str] | None = None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a pipeline's DLQ SnapshotTable back as an input source.

    `path` is the DLQ sink directory (`<sinks_root>/<dlq_sink>`); reads
    the latest committed snapshot by default (DeadLetterQueueReader
    reads committed segments only — uncommitted writes are invisible
    here by construction, since SnapshotTable manifests are atomic).
    """
    df = SnapshotTable(path).read(spark, snapshot_id=snapshot_id)
    return dlq_replay_frame(
        df,
        reason_filter=reason_filter,
        strip_metadata=strip_metadata,
        clear_tags=clear_tags,
    )
