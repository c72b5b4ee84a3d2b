"""Mergeable cardinality sketches: HyperLogLog re-expressed relationally.

Reference parity: Logstash itself counts events with exact counters, but
its downstream (elasticsearch `cardinality` agg) and every log-analytics
engine at scale use HLL-family sketches; SURVEY.md §2.7 lists "approx
distinct" as an in-scope aggregate. Spark's built-in
`approx_count_distinct` is HLL++ but its register layout is opaque and
not reproducible in an external oracle, so this module re-derives the
classic Flajolet et al. 2007 HLL estimator from first principles as
PURE relational algebra over the md5-derived `portable_hash32`:

    bucket = h mod m          (m = 2^p registers)
    rem    = h div m          ((32-p)-bit remainder)
    rho    = (32-p) + 1 - bitlen(rem)      [bitlen via length(bin(x))]
    register[bucket] = max(rho)            -- ONE groupBy, map-side partial

The sketch IS a tiny table (m rows per group) — mergeable by
construction (`hll_merge` = union + max), which is the whole point at
100 TB: shards sketch independently (one narrow shuffle of m-row
partials each), and a driver-side union of sketch tables answers
"distinct users across the whole corpus" without ever re-scanning.

Cross-engine determinism: every step is integer arithmetic
(`length(bin(x))` = floor(log2 x)+1 in both Spark and DuckDB), and the
harmonic sum is kept in scaled-integer form (terms 2^(SCALE-rho) are
exact bigints), so sketch AND estimate are bit-identical in any SQL
engine. The only division is one integer `div` of two exact bigints
with a Python-precomputed exact numerator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.operators.dataprep import portable_hash32


def _alpha_micro(m: int) -> int:
    """floor(1e6 * alpha_m), the standard HLL bias constant (m >= 128)."""
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return int(alpha * 1_000_000)


def hll_sketch(
    df: DataFrame,
    key: Column | str,
    groups: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Build the HLL register table: one row per (groups…, bucket) with
    the max leading-zero rank `rho`. ONE keyed shuffle with map-side
    partial max; output is m=2^p rows per group regardless of input
    size — the 100 TB-friendly shape."""
    m = 1 << p
    key_col = F.col(key) if isinstance(key, str) else key
    h = portable_hash32(key_col)
    bucket = (h % m).cast("int").alias("bucket")
    rem = F.shiftright(h, p)  # (32-p)-bit remainder, integer-exact
    width = 32 - p
    rho = (
        F.when(rem == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(rem)))
        .cast("int")
        .alias("rho")
    )
    return (
        df.select(*groups, bucket, rho)
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketch tables built by `hll_sketch` over the same key/groups:
    union + max. Registers are max-mergeable, so shard-local sketches
    combine into the global sketch without touching the raw data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame,
    groups: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Collapse a sketch table to the raw HLL estimate per group.

    Emits exact integers only: `est_x1e6` = floor(1e6 * alpha * m^2 *
    2^SCALE / S) where S is the scaled harmonic sum (empty registers
    contribute 2^SCALE), plus `v_empty` so a consumer can apply the
    standard linear-counting small-range correction (m*ln(m/v) — kept
    OUT of the sketch because ln is not bit-reproducible across
    engines; the ingredients are)."""
    m = 1 << p
    scale = 32 - p + 1  # max rho, so 2^(scale - rho) >= 1 stays integral
    num = _alpha_micro(m) * m * m * (1 << scale)  # exact Python int
    if num >= (1 << 63):  # pragma: no cover - guard for exotic p
        raise ValueError(f"p={p} overflows the scaled-integer estimator")
    agg = sketch.groupBy(*groups).agg(
        F.count("*").cast("long").alias("_n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - rho)"))
        .cast("long")
        .alias("_s_present"),
    )
    s_scaled = (
        F.col("_s_present")
        + (F.lit(m) - F.col("_n_present")) * F.lit(1 << scale).cast("long")
    ).alias("s_scaled")
    out = agg.select(
        *groups,
        (F.lit(m) - F.col("_n_present")).cast("int").alias("v_empty"),
        s_scaled,
    )
    return out.select(
        *groups,
        "v_empty",
        "s_scaled",
        F.expr(f"{num} div s_scaled").cast("long").alias("est_x1e6"),
    )


def hll_oracle_sql(
    key_sql: str,
    from_sql: str,
    groups: Sequence[str] = (),
    p: int = 8,
) -> str:
    """The DuckDB rendering of sketch→estimate over `key_sql` drawn from
    `from_sql` — the same integer algebra, for correctness gates."""
    m = 1 << p
    scale = 32 - p + 1
    num = _alpha_micro(m) * m * m * (1 << scale)
    gcols = ", ".join(groups)
    gpre = f"{gcols}, " if groups else ""
    return f"""
    WITH hx AS (
      SELECT {gpre}CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 8) AS BIGINT) AS h
      FROM {from_sql}
    ),
    reg AS (
      SELECT {gpre}CAST(h % {m} AS INTEGER) AS bucket,
             CAST(CASE WHEN h // {m} = 0 THEN {scale}
                  ELSE {scale} - length(bin(h // {m})) END AS INTEGER) AS rho
      FROM hx
    ),
    sk AS (
      SELECT {gpre}bucket, max(rho) AS rho FROM reg GROUP BY {gpre}bucket
    ),
    est AS (
      SELECT {gpre}count(*) AS n_present,
             sum(CAST(1 AS BIGINT) << ({scale} - rho)) AS s_present
      FROM sk {"GROUP BY " + gcols if groups else ""}
    )
    SELECT {gpre}CAST({m} - n_present AS INTEGER) AS v_empty,
           CAST(s_present + ({m} - n_present) * (CAST(1 AS BIGINT) << {scale}) AS BIGINT) AS s_scaled,
           CAST({num} // (s_present + ({m} - n_present) * (CAST(1 AS BIGINT) << {scale})) AS BIGINT) AS est_x1e6
    FROM est
    """
