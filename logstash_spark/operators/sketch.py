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


# ---------------------------------------------------------------------------
# Count-Min frequency sketch
# ---------------------------------------------------------------------------

# Fixed universal-hash parameters (a*h + b mod P mod w), small enough that
# a * h never leaves 2^52 for a 32-bit h — exact in int64 AND in IEEE
# doubles, so any engine agrees.
CMS_P = 2_147_483_647  # 2^31 - 1 (Mersenne)
CMS_AB = [
    (999_331, 101_273),
    (824_633, 390_041),
    (604_171, 752_809),
    (492_113, 217_645),
    (377_011, 564_377),
    (263_167, 908_111),
    (151_121, 433_459),
    (77_023, 660_887),
]


def _cms_cells(key_col: Column, d: int, w: int) -> Column:
    """array<struct<row,col>> of the d Count-Min cells for a key."""
    h = portable_hash32(key_col)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (((h * F.lit(a) + F.lit(b)) % CMS_P) % w)
                .cast("int")
                .alias("col"),
            )
            for i, (a, b) in enumerate(CMS_AB[:d])
        ]
    )


def cms_sketch(
    df: DataFrame,
    key: Column | str,
    groups: Sequence[str] = (),
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a relational
    op: each key increments d cells (row=i, col=h_i(key)); the sketch
    table is at most d*w rows per group REGARDLESS of input size — the
    bounded-memory frequency structure for hot-key detection at 100 TB.
    ONE keyed shuffle with map-side partial counts; merge = union + sum
    (`cms_merge`). Point estimate = min over the d cells, an upper
    bound that over-counts only by collisions (never under-counts)."""
    if d > len(CMS_AB):
        raise ValueError(f"d={d} exceeds the fixed hash family ({len(CMS_AB)})")
    key_col = F.col(key) if isinstance(key, str) else key
    e = df.select(*groups, F.explode(_cms_cells(key_col, d, w)).alias("rc"))
    return e.groupBy(*groups, "rc.row", "rc.col").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches over the same key/groups/(d,w):
    union + per-cell sum. Counters are additive, so shard-local
    sketches combine exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key: str = "key",
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Frequency upper bounds for `probes[key]`: min over the d cells,
    absent cells counting 0. The SKETCH side broadcasts — it is ≤ d*w
    rows by construction — so probing any stream of keys is a map-side
    hash join, never a shuffle of the probe side."""
    pc = probes.select(
        key, F.explode(_cms_cells(F.col(key), d, w)).alias("rc")
    ).select(key, "rc.row", "rc.col")
    j = pc.join(F.broadcast(sketch), ["row", "col"], "left")
    return j.groupBy(key).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
    )


# HDR-histogram bucketing: unit-exact below 2^(sub_bits+1), then
# 2^sub_bits log-spaced sub-buckets per octave (relative error
# <= 2^-sub_bits). Pure integer algebra — bitlen via length(bin(x)),
# truncation via shiftright — so any SQL engine agrees bit-for-bit.
# (Spark's python shiftleft/shiftright helpers take literal bit counts
# only, so column-width shifts go through F.expr.)


def _q_bucket_expr(sub_bits: int) -> Column:
    """Bucket index over a column named `_qv` (non-negative bigint)."""
    sb = sub_bits
    shift = f"greatest(length(bin(_qv)) - {sb + 1}, 0)"
    return F.expr(
        f"CAST(CASE WHEN _qv <= 0 THEN 0 ELSE "
        f"{shift} * {1 << sb} + shiftright(_qv, CAST({shift} AS INT)) "
        f"END AS BIGINT)"
    ).alias("bucket")


def _q_bounds_expr(sub_bits: int) -> tuple[Column, Column]:
    """[lb, ub] value range covered by a column named `bucket`."""
    sb = sub_bits
    s = f"CAST(greatest((bucket div {1 << sb}) - 1, 0) AS INT)"
    lb = f"shiftleft(bucket - {s} * {1 << sb}, {s})"
    ub = f"{lb} + shiftleft(CAST(1 AS BIGINT), {s}) - 1"
    return (
        F.expr(f"CAST({lb} AS BIGINT)"),
        F.expr(f"CAST({ub} AS BIGINT)"),
    )


def quantile_sketch(
    df: DataFrame,
    value: Column | str,
    groups: Sequence[str] = (),
    sub_bits: int = 4,
) -> DataFrame:
    """Mergeable quantile sketch (HDR-histogram / DDSketch-family:
    log-spaced buckets with bounded RELATIVE error, here 2^-sub_bits).
    Values must be non-negative bigints (quantize floats first, e.g.
    floor(ms*100)). ONE keyed shuffle with map-side partial counts; the
    sketch is at most ~(64-sub_bits)*2^sub_bits rows per group
    REGARDLESS of input size, and `quantile_merge` = union + sum — so
    p99 latency across a 100 TB corpus is a union of shard sketches,
    never a global sort. Contrast Spark's built-in percentile_approx
    (Greenwald-Khanna): accurate but with an opaque binary state that
    no external oracle can replay; this sketch is pure relational
    algebra, bit-identical in DuckDB."""
    v = (F.col(value) if isinstance(value, str) else value).cast("long")
    return (
        df.select(*groups, v.alias("_qv"))
        .select(*groups, _q_bucket_expr(sub_bits))
        .groupBy(*groups, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantile_merge(*sketches: DataFrame) -> DataFrame:
    """Merge quantile sketches over the same groups/sub_bits:
    union + per-bucket sum (counters are additive)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def quantile_estimate(
    sketch: DataFrame,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
    groups: Sequence[str] = (),
    sub_bits: int = 4,
) -> DataFrame:
    """Collapse a sketch to nearest-rank quantile BOUNDS per group: for
    each (label, num, den) the bucket holding rank r = ceil(num*n/den)
    yields [est_lb, est_ub], guaranteed to bracket the exact
    nearest-rank value with est_ub/est_lb <= 1 + 2^-sub_bits. Integer
    ranks and integer bounds — no floats anywhere. The cumsum window
    runs over the TINY sketch table (<=~1k rows/group), not the data."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*groups)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.select(
        *groups,
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*groups)).alias("n"),
    )
    qlit = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(label).alias("q_label"),
                    F.lit(num).cast("long").alias("q_num"),
                    F.lit(den).cast("long").alias("q_den"),
                )
                for label, num, den in quantiles
            ]
        )
    ).alias("q")
    expanded = cum.select(*cum.columns, qlit).select(
        *cum.columns, "q.q_label", "q.q_num", "q.q_den"
    )
    r = F.expr("(q_num * n + q_den - 1) div q_den")
    hit = expanded.filter((F.col("cum") >= r) & (F.col("cum") - F.col("cnt") < r))
    lb, ub = _q_bounds_expr(sub_bits)
    return hit.select(
        *groups,
        "q_label",
        lb.alias("est_lb"),
        ub.alias("est_ub"),
        F.col("n").cast("long").alias("n"),
    )


def quantile_oracle_sql(
    value_sql: str,
    from_sql: str,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
    groups: Sequence[str] = (),
    sub_bits: int = 4,
) -> str:
    """DuckDB rendering of sketch -> estimate: the same integer bucket
    algebra, for correctness gates."""
    sb = sub_bits
    gcols = ", ".join(groups)
    gpre = f"{gcols}, " if groups else ""
    qrows = " UNION ALL ".join(
        f"SELECT '{label}' AS q_label, CAST({num} AS BIGINT) AS q_num, "
        f"CAST({den} AS BIGINT) AS q_den"
        for label, num, den in quantiles
    )
    return f"""
    WITH vals AS (
      SELECT {gpre}CAST({value_sql} AS BIGINT) AS v FROM {from_sql}
    ),
    bx AS (
      SELECT {gpre}
             CASE WHEN v <= 0 THEN 0
                  ELSE greatest(length(bin(v)) - {sb + 1}, 0) END AS s,
             v
      FROM vals
    ),
    sk AS (
      SELECT {gpre}CAST(s * {1 << sb} + (v >> s) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM bx GROUP BY {gpre}s * {1 << sb} + (v >> s)
    ),
    cum AS (
      SELECT {gpre}bucket, cnt,
             sum(cnt) OVER (PARTITION BY {gcols or '1'} ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY {gcols or '1'}) AS n
      FROM sk
    ),
    q AS ({qrows}),
    hit AS (
      SELECT {gpre}q_label, bucket, n,
             (q_num * n + q_den - 1) // q_den AS r
      FROM cum, q
      WHERE cum >= (q_num * n + q_den - 1) // q_den
        AND cum - cnt < (q_num * n + q_den - 1) // q_den
    ),
    inv AS (
      SELECT {gpre}q_label, n, bucket,
             greatest((bucket >> {sb}) - 1, 0) AS s2
      FROM hit
    )
    SELECT {gpre}q_label,
           CAST((bucket - s2 * {1 << sb}) << s2 AS BIGINT) AS est_lb,
           CAST(((bucket - s2 * {1 << sb}) << s2) + (CAST(1 AS BIGINT) << s2) - 1
                AS BIGINT) AS est_ub,
           CAST(n AS BIGINT) AS n
    FROM inv
    """


def cms_oracle_sql(
    key_sql: str,
    from_sql: str,
    probes_sql: str,
    d: int = 4,
    w: int = 256,
) -> str:
    """DuckDB rendering of sketch+lookup: same hash family, same integer
    algebra. `probes_sql` must yield a relation with a `key` column."""
    h32 = f"CAST('0x' || substr(md5(CAST({{x}} AS VARCHAR)), 1, 8) AS BIGINT)"
    cell = "((hh * {a} + {b}) % " + str(CMS_P) + ") % " + str(w)
    rows = " UNION ALL ".join(
        f"SELECT k, hh, {i} AS row, CAST({cell.format(a=a, b=b)} AS INTEGER) AS col FROM hx"
        for i, (a, b) in enumerate(CMS_AB[:d])
    )
    return f"""
    WITH hx AS (
      SELECT {key_sql} AS k, {h32.format(x=key_sql)} AS hh FROM {from_sql}
    ),
    cells AS (
      SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
      FROM ({rows}) GROUP BY row, col
    ),
    px AS (
      SELECT key AS k, {h32.format(x='key')} AS hh FROM ({probes_sql})
    ),
    pc AS (
      {rows.replace('FROM hx', 'FROM px')}
    )
    SELECT pc.k AS key, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
    FROM pc LEFT JOIN cells USING (row, col)
    GROUP BY pc.k
    """
