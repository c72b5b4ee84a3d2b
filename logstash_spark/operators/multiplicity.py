"""Event-multiplicity operators: clone, split, drop, dedupe.

Reference (SURVEY.md §2.6): Logstash mutates the event stream in place
(spawn/cancel); relationally these are explode / union / filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.operators import op


@op("clone")
def clone(df: DataFrame, types: Sequence[str], type_field: str = "type") -> DataFrame:
    """logstash-filter-clone: original passes with its type untouched; one
    copy per entry in `types` with `type` set. N_out = N_in * (1+len)."""
    orig = F.array(F.col(type_field).cast("string")) if type_field in df.columns else F.array(F.lit(None).cast("string"))
    variants = F.concat(orig, F.array(*[F.lit(t) for t in types]))
    return (
        df.withColumn("_clone_type", F.explode(variants))
        .withColumn(type_field, F.col("_clone_type"))
        .drop("_clone_type")
    )


@op("split")
def split_events(
    df: DataFrame, field: str, *, target: str | None = None, keep_empty: bool = False
) -> DataFrame:
    """logstash-filter-split: one event per element of an array field.
    Rows where the field is null/empty are dropped (logstash cancels the
    original), matching explode (use explode_outer via keep_empty)."""
    ex = F.explode_outer(F.col(field)) if keep_empty else F.explode(F.col(field))
    out = target or field
    return df.withColumn(out, ex) if out != field else df.withColumn(field, ex)


@op("drop")
def drop_events(
    df: DataFrame,
    condition: Column | None = None,
    *,
    percentage: float | None = None,
    key: str | None = None,
    hash_fn=None,
) -> DataFrame:
    """logstash-filter-drop: cancel matching events; optional `percentage`
    sampling. Sampling is DETERMINISTIC — pmod(hash(key), 100) — so
    reruns and the duckdb oracle agree (never rand(); SURVEY.md §7.3).
    Default hash is xxhash64 (cheapest JVM-side); pass
    dataprep.portable_hash32 as hash_fn for cross-engine reproducibility."""
    keep = F.lit(True)
    if condition is not None:
        keep = keep & ~F.coalesce(condition, F.lit(False))
    if percentage is not None:
        assert key is not None, "deterministic sampling needs a key column"
        h = (hash_fn or F.xxhash64)(F.col(key))
        sampled = F.pmod(h, F.lit(100)) < F.lit(int(percentage))
        # drop `percentage`% of the rows that matched the condition
        if condition is not None:
            keep = ~(F.coalesce(condition, F.lit(False)) & sampled)
        else:
            keep = ~sampled
    return df.where(keep)


@op("dedupe")
def dedupe(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """fingerprint+conditional dedupe pattern → dropDuplicates (map-side
    partial aggregation keeps the shuffle small at scale)."""
    return df.dropDuplicates(list(keys))


@op("metricize")
def metricize(
    df: DataFrame,
    metrics: Sequence[str],
    *,
    metric_field: str = "metric",
    value_field: str = "value",
    drop_null: bool = True,
) -> DataFrame:
    """logstash-filter-metricize: split one event carrying N metric
    fields into N single-metric events.

    The reference clones the event once per metric field, keeps only
    that metric, and cancels the original. Relationally: build an
    array<struct<metric,value>> literal-keyed from the metric columns
    and explode it — a 1→N generator in one narrow stage, zero shuffle.
    `drop_null` mirrors the plugin's skip of absent metric fields."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(m).alias(metric_field),
                F.col(m).cast("double").alias(value_field),
            )
            for m in metrics
        ]
    )
    if drop_null:
        pairs = F.filter(pairs, lambda p: p[value_field].isNotNull())
    keep = [c for c in df.columns if c not in set(metrics)]
    return df.select(*keep, F.explode(pairs).alias("_m")).select(
        *keep, f"_m.{metric_field}", f"_m.{value_field}"
    )
