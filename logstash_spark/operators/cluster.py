"""Distributed Lloyd k-means over embedding columns, integer-exact.

The missing trainer for this repo's IVF family: `ann_ivf` /
`semantic_dedup` assign vectors to coarse centroids that were so far
derived from deterministic hashes; `kmeans_lloyd` learns real centroids
with the classic Lloyd iteration, shaped for Spark:

  assignment — centroids are a plan-time LITERAL (k·dim ints), so the
      assign pass is pure column algebra over the corpus: zero shuffle,
      whole-stage codegen, no UDF.
  update     — ONE groupBy(cluster) per iteration with per-dimension
      integer sums + count (map-side partial aggregation); the k
      result rows are collected to the driver (k·dim values — the same
      tiny driver round-trip every Lloyd implementation incl. Spark
      MLlib does) and re-literalized for the next pass.

So an I-iteration fit costs I corpus scans and I tiny shuffles — at
100 TB you train on a deterministic sample (compose
`dataprep.stratified_sample` / `reservoir_sample_k` upstream, exactly
like faiss trains its quantizer on a slice) and run ONE full-corpus
assignment pass at the end.

Cross-engine exactness (what makes the DuckDB oracle gate possible):
floats are quantized ONCE up front — q_i = floor(double(v_i)·scale) +
offset — and everything after is int64: squared-distance sums are
order-independent, centroid updates are integer floor divisions, and
the uniform offset keeps every sum non-negative so Spark's `div` and
DuckDB's `//` agree (they differ on negatives). Distances are
offset-invariant, so the quantized fit is exactly k-means on the
quantized vectors. Ties (equal distance) break on the lowest centroid
index; empty clusters keep their previous centroid.

Reference parity: the reference pipeline's elasticsearch destination
clusters/aggregates downstream; in-pipeline k-means is the analog of
its centroid-based anomaly groupings and the trainer `ann_ivf`
(operators/dataprep.py §ann_ivf) documents as out-of-band.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: quantization defaults: scale 1000 keeps 3 decimal digits; offset
#: 8192 keeps components of any |v| < 8.192 embedding non-negative.
KM_SCALE = 1000
KM_OFFSET = 8192


def quantize_vec(vec: Column | str, scale: int = KM_SCALE, offset: int = KM_OFFSET) -> Column:
    """array<float> -> array<bigint>: floor(double(x)*scale) + offset.
    float32→double is exact, double·scale and floor are IEEE-defined, so
    every engine produces the identical integers."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        v,
        lambda x: (F.floor(x.cast("double") * scale) + offset).cast("long"),
    )


def _sqdist(qvec: Column, centroid: Column) -> Column:
    """Integer squared L2 distance between two array<bigint>."""
    return F.aggregate(
        F.zip_with(qvec, centroid, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(df: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Add (cluster, dist) vs literal centroids — zero shuffle."""
    lit_c = F.array(
        *[F.array(*[F.lit(int(x)) for x in c]).cast("array<bigint>") for c in centroids]
    )
    dists = F.transform(lit_c, lambda c: _sqdist(F.col("qvec"), c))
    # array_position finds the FIRST minimum -> ties break on lowest cid
    return df.withColumn("_d", dists).select(
        *df.columns,
        (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(F.col("_d")).alias("dist"),
    )


def kmeans_seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", seed: str = "km"
) -> list[list[int]]:
    """Deterministic init: the k rows with the smallest
    portable_hash32(id ':' seed) (ties on id) — a uniform, engine-
    reproducible sample, same convention as the sampling operators."""
    from logstash_spark.operators.dataprep import portable_hash32

    h = portable_hash32(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
    )
    rows = (
        df.select(F.col(id_col).alias("_id"), "qvec", h.alias("_h"))
        .orderBy(F.col("_h").asc(), F.col("_id").asc())
        .limit(k)
        .collect()
    )
    return [list(r["qvec"]) for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int,
    dim: int,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KM_SCALE,
    offset: int = KM_OFFSET,
    seed: str = "km",
) -> list[list[int]]:
    """Run `iters` Lloyd rounds and return the quantized centroids
    (k lists of dim int64s, offset space). Feed them to `_assign` /
    `kmeans_lloyd` for labeling, or through `centroids_df` into
    `dataprep.ann_ivf` / `semantic_dedup` as the trained coarse
    quantizer those operators document as out-of-band."""
    q = df.select(
        F.col(id_col), quantize_vec(vec_col, scale, offset).alias("qvec")
    )
    centroids = kmeans_seed_centroids(q, k, id_col=id_col, seed=seed)
    for _ in range(iters):
        assigned = _assign(q, centroids)
        sums = assigned.groupBy("cluster").agg(
            F.count("*").cast("long").alias("n"),
            *[
                F.sum(F.element_at("qvec", j + 1)).cast("long").alias(f"s{j}")
                for j in range(dim)
            ],
        )
        new = {
            int(r["cluster"]): [int(r[f"s{j}"]) // int(r["n"]) for j in range(dim)]
            for r in sums.collect()
        }
        # empty clusters keep their previous centroid
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return centroids


def centroids_df(
    spark,
    centroids: list[list[int]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KM_SCALE,
    offset: int = KM_OFFSET,
) -> DataFrame:
    """Quantized centroids -> (id_col, vec_col array<float>) in the
    original vector space — the exact shape `dataprep.ann_ivf` /
    `ivf_assign` / `semantic_dedup` take for their coarse quantizer
    (same column names as the corpus, centroid index as the id)."""
    rows = [
        (cid, [(x - offset) / scale for x in c]) for cid, c in enumerate(centroids)
    ]
    return spark.createDataFrame(
        rows, f"{id_col} int, {vec_col} array<float>"
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int,
    dim: int,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KM_SCALE,
    offset: int = KM_OFFSET,
    seed: str = "km",
) -> DataFrame:
    """Fit k-means for `iters` Lloyd rounds and return the final
    assignment: (id_col, cluster, dist) — dist is the integer squared
    L2 distance in quantized (offset) space. See module docstring for
    the shuffle budget and the exactness contract."""
    q = df.select(
        F.col(id_col), quantize_vec(vec_col, scale, offset).alias("qvec")
    )
    centroids = kmeans_fit(
        df, k, dim, iters=iters, id_col=id_col, vec_col=vec_col,
        scale=scale, offset=offset, seed=seed,
    )
    return _assign(q, centroids).select(id_col, "cluster", "dist")


def kmeans_oracle_sql(
    vectors_sql: str,
    k: int,
    dim: int,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KM_SCALE,
    offset: int = KM_OFFSET,
    seed: str = "km",
) -> str:
    """DuckDB rendering of kmeans_lloyd: same quantization, same init,
    `iters` unrolled Lloyd rounds, same tie/empty-cluster rules. All
    arithmetic in non-negative int64, so `//` here ≡ Spark's `div`."""
    dist = (
        "list_aggregate(list_transform(range(1, {d} + 1), "
        "i -> (qv[i] - cqv[i]) * (qv[i] - cqv[i])), 'sum')".format(d=dim)
    )
    centroid_rebuild = f"""
      SELECT cluster AS cid, list(CAST(sv AS BIGINT) ORDER BY i) AS cqv
      FROM (
        SELECT a.cluster, gs.i,
               sum(q.qv[gs.i]) // count(*) AS sv
        FROM __ASSIGN__ a
        JOIN q ON a.{id_col} = q.{id_col},
             generate_series(1, {dim}) gs(i)
        GROUP BY a.cluster, gs.i
      ) GROUP BY cluster
    """
    assign_tpl = f"""
      SELECT {id_col}, CAST(cid AS INTEGER) AS cluster,
             CAST(dist AS BIGINT) AS dist
      FROM (
        SELECT q.{id_col}, c.cid, {dist} AS dist,
               row_number() OVER (PARTITION BY q.{id_col}
                                  ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM q CROSS JOIN __CENT__ c
      ) WHERE rn = 1
    """
    sql = f"""
    WITH q AS (
      SELECT {id_col},
             list_transform({vec_col},
               x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT) + {offset}) AS qv
      FROM ({vectors_sql})
    ),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY h ASC, {id_col} ASC) - 1 AS INTEGER) AS cid,
             qv AS cqv
      FROM (
        SELECT {id_col}, qv,
               CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR) || ':{seed}'), 1, 8)
                    AS BIGINT) AS h
        FROM q
      ) QUALIFY row_number() OVER (ORDER BY h ASC, {id_col} ASC) <= {k}
    )"""
    prev = "c0"
    for it in range(iters):
        a, c = f"a{it}", f"c{it + 1}"
        sql += f""",
    {a} AS ({assign_tpl.replace('__CENT__', prev)}),
    {c}_new AS ({centroid_rebuild.replace('__ASSIGN__', a)}),
    {c} AS (
      SELECT p.cid, COALESCE(n.cqv, p.cqv) AS cqv
      FROM {prev} p LEFT JOIN {c}_new n USING (cid)
    )"""
        prev = c
    sql += f"""
    {assign_tpl.replace('__CENT__', prev)}
    """
    return sql
