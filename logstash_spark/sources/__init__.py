"""Sources: readers + codec-equivalents (SURVEY.md §2.1–2.2).

Logstash inputs are transport; in Spark the equivalent ingress is a
table/file read whose codec becomes a parse expression. The `multiline`
codec — the only codec with cross-row state — is re-expressed as a
sessionization window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """input { file { codec => line } } — one row per line, `message` col,
    file provenance + line offset for ordered codecs."""
    return (
        spark.read.text(path)
        .withColumn("message", F.col("value"))
        .withColumn("path", F.input_file_name())
        .drop("value")
    )


def generator(spark: SparkSession, count: int, message: str = "Hello world!") -> DataFrame:
    """logstash-input-generator (org/logstash/plugins/inputs/Generator.java):
    synthetic events at max rate — spark.range + column synthesis."""
    return (
        spark.range(count)
        .withColumn("message", F.lit(message))
        .withColumn("sequence", F.col("id"))
        .drop("id")
    )


def multiline_assemble(
    df: DataFrame,
    *,
    pattern: str,
    negate: bool = True,
    group_col: str = "path",
    order_col: str = "offset",
    message_col: str = "message",
) -> DataFrame:
    """logstash-codec-multiline: join continuation lines into one event.

    `pattern`+`negate=True, what=previous` (the common stack-trace config):
    a line MATCHING starts a new event when negate=False... Logstash
    semantics: if negate is false, lines matching `pattern` belong to the
    previous line; if true, lines NOT matching belong to the previous.

    Sessionization: flag event-start lines, running sum over an ordered
    window per file → session id → groupBy + concat_ws (SURVEY.md §2.2).
    At scale the window partitions by file, so parallelism = #files.
    """
    is_continuation = F.col(message_col).rlike(pattern)
    if negate:
        is_continuation = ~is_continuation
    starts = (~is_continuation).cast("int")
    w = Window.partitionBy(group_col).orderBy(order_col)
    df = df.withColumn("_session", F.sum(starts).over(w))
    return (
        df.groupBy(group_col, "_session")
        .agg(
            F.concat_ws("\n", F.collect_list(message_col)).alias(message_col),
            F.min(order_col).alias(order_col),
        )
        .drop("_session")
    )
