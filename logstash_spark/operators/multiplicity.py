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
