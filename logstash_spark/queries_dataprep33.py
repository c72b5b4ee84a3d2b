"""Correctness-gate queries, dataprep batch 33 (round 3): cross-source
budget water-filling and cross-source quantile normalization — the two
mix-layer decisions upstream of `token_budget_mix` (how much budget each
source gets, and how to make heterogeneous per-source scores comparable
before a single corpus-wide threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_BUDGET = 300


@query(
    "waterfill_budget",
    f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    ),
    idx AS (
      SELECT *,
             row_number() OVER (ORDER BY n, source) AS i,
             sum(n) OVER (ORDER BY n, source) - n AS pfx,
             count(*) OVER () AS s,
             sum(n) OVER () AS tot,
             lag(n, 1, 0) OVER (ORDER BY n, source) AS prev_n
      FROM counts
    ),
    lvl AS (
      SELECT CAST(({_BUDGET} - pfx) // (s - i + 1) AS BIGINT) AS level,
             CAST({_BUDGET} - pfx
                  - (({_BUDGET} - pfx) // (s - i + 1)) * (s - i + 1)
               AS BIGINT) AS rem
      FROM idx
      WHERE tot > {_BUDGET}
        AND ({_BUDGET} - pfx) // (s - i + 1) >= prev_n
        AND ({_BUDGET} - pfx) // (s - i + 1) < n
      UNION ALL
      SELECT CAST(max(n) AS BIGINT), CAST(0 AS BIGINT)
      FROM idx HAVING sum(n) <= {_BUDGET}
    ),
    out AS (
      SELECT c.source, c.n, lvl.level, lvl.rem,
             CASE WHEN c.n > lvl.level THEN 1 ELSE 0 END AS capped,
             sum(CASE WHEN c.n > lvl.level THEN 1 ELSE 0 END)
               OVER (ORDER BY c.source) AS capped_rank
      FROM counts c CROSS JOIN lvl
    )
    SELECT source, n AS n_avail,
           CAST(least(n, level)
                + CASE WHEN capped = 1 AND capped_rank <= rem
                       THEN 1 ELSE 0 END AS BIGINT) AS alloc,
           CAST(level AS BIGINT) AS water_level
    FROM out
    """,
)
def waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling gate (`dataprep.waterfill_budget`): a global
    300-doc budget split across the per-source doc counts — binding at
    every sf (20 sources × 25+ docs). The oracle replays the sorted-
    prefix level search and the deterministic remainder distribution;
    Σ alloc == min(budget, total) exactly."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_avail")
    )
    return D.waterfill_budget(counts, _BUDGET)


@query(
    "quantile_normalize",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS ng
      FROM documents
    ),
    q AS (
      SELECT doc_id, source, n_chars,
             CAST(CASE WHEN ng > 1 THEN (r - 1) * 1000000 // (ng - 1)
                       ELSE 500000 END AS BIGINT) AS q_ppm
      FROM ranked
    ),
    grid AS (
      SELECT n_chars AS gv, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1
    ),
    g2 AS (
      SELECT gv, sum(c) OVER (ORDER BY gv) AS cum,
             sum(c) OVER (ORDER BY gv) - c AS cum_prev
      FROM grid
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
    SELECT q.doc_id, q.source, q.n_chars, q.q_ppm, g2.gv AS norm_value
    FROM q CROSS JOIN nn
    JOIN g2 ON 1 + (q.q_ppm * (nn.n - 1) + 500000) // 1000000 > g2.cum_prev
           AND 1 + (q.q_ppm * (nn.n - 1) + 500000) // 1000000 <= g2.cum
    """,
)
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalization gate (`dataprep.quantile_normalize`):
    per-source n_chars ranks mapped to the global length distribution.
    Every step is an integer order statistic (the `mad_outliers` lower-
    rank rule), so both engines must agree on every normalized value."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.quantile_normalize(
        docs.select("doc_id", "source", "n_chars")
    )


_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


@query(
    "rank_correlation",
    f"""
    WITH base AS (
      SELECT doc_id // 10 AS qid, doc_id % 10 AS item,
             {_H32.format(s="doc_id || ':sa'")} % 1000 AS score_a,
             {_H32.format(s="doc_id || ':sa'")} % 1000
               + {_H32.format(s="doc_id || ':sb'")} % 400 - 200 AS score_b
      FROM documents
    ),
    ranked AS (
      SELECT qid, item,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score_a DESC, item ASC) AS ra,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score_b DESC, item ASC) AS rb
      FROM base
    ),
    agg AS (
      SELECT qid, CAST(count(*) AS BIGINT) AS n,
             CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
      FROM ranked GROUP BY 1
    ),
    disc AS (
      SELECT x.qid, CAST(count(*) AS BIGINT) AS d
      FROM ranked x JOIN ranked y
        ON x.qid = y.qid AND x.ra < y.ra AND x.rb > y.rb
      GROUP BY 1
    )
    SELECT a.qid, a.n, a.sum_d2,
           CASE WHEN a.n > 1 THEN CAST(floor(
             CAST(a.n * (a.n - 1) - 4 * coalesce(d.d, 0) AS DOUBLE)
             / (a.n * (a.n - 1)) * 1000000) AS BIGINT) END AS tau_ppm,
           CASE WHEN a.n > 1 THEN CAST(floor(
             CAST(a.n * (a.n * a.n - 1) - 6 * a.sum_d2 AS DOUBLE)
             / (a.n * (a.n * a.n - 1)) * 1000000) AS BIGINT) END AS rho_ppm
    FROM agg a LEFT JOIN disc d USING (qid)
    """,
)
def rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-correlation gate (`dataprep.rank_correlation`): 10-item
    query groups with a hash ranker and a noisy-correlated second
    ranker; Kendall tau-a and Spearman rho per group. The oracle counts
    discordant pairs RELATIONALLY (a rank self-join) while the operator
    counts array-local inversions — two different algorithms, one exact
    answer."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("string")
    sa = D.portable_hash32(F.concat(i, F.lit(":sa"))) % 1000
    sb = sa + D.portable_hash32(F.concat(i, F.lit(":sb"))) % 400 - 200
    base = docs.select(
        F.expr("doc_id DIV 10").alias("qid"),
        (F.col("doc_id") % 10).alias("item"),
        sa.alias("score_a"),
        sb.alias("score_b"),
    )
    return D.rank_correlation(base)


@query(
    "mix_divergence",
    """
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    base AS (
      SELECT source, n,
             CAST((CAST(substr(source, 4) AS INT) % 5) + 1 AS BIGINT) AS w,
             CAST(sum(n) OVER () AS BIGINT) AS nn
      FROM counts
    ),
    scored AS (
      SELECT source, n, TRUE AS in_target,
             n * (CAST(floor(ln(n) * 1000000) AS BIGINT)
                  - CAST(floor(ln(nn) * 1000000) AS BIGINT)
                  - CAST(floor(ln(w) * 1000000) AS BIGINT)
                  + CAST(floor(ln(120) * 1000000) AS BIGINT))
               AS kl_contrib_micro,
             nn
      FROM base
    )
    SELECT source, n, in_target, kl_contrib_micro,
           CAST((SELECT sum(kl_contrib_micro) FROM scored)
                // (SELECT any_value(nn) FROM scored) AS BIGINT)
             AS kl_micro_total
    FROM scored
    """,
)
def mix_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-drift gate (`dataprep.mix_divergence`): realized per-source
    doc counts vs a formula target mix (w(src_k) = k%5+1 over the
    src0..src39 superset, W = 120). Every KL term is exact int64 via
    the shared L(k) = floor(10⁶·ln k) quantization; the oracle replays
    the arithmetic from the same weight formula."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    weights = {f"src{k}": (k % 5) + 1 for k in range(40)}
    return D.mix_divergence(counts, weights)


@query(
    "mix_pipeline_e2e",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS ng
      FROM documents
    ),
    q AS (
      SELECT doc_id, source,
             CAST(CASE WHEN ng > 1 THEN (r - 1) * 1000000 // (ng - 1)
                       ELSE 500000 END AS BIGINT) AS q_ppm
      FROM ranked
    ),
    eligible AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM q WHERE q_ppm >= 500000 GROUP BY 1
    ),
    idx AS (
      SELECT *,
             row_number() OVER (ORDER BY n, source) AS i,
             sum(n) OVER (ORDER BY n, source) - n AS pfx,
             count(*) OVER () AS s,
             sum(n) OVER () AS tot,
             lag(n, 1, 0) OVER (ORDER BY n, source) AS prev_n
      FROM eligible
    ),
    lvl AS (
      SELECT CAST((100 - pfx) // (s - i + 1) AS BIGINT) AS level,
             CAST(100 - pfx
                  - ((100 - pfx) // (s - i + 1)) * (s - i + 1)
               AS BIGINT) AS rem
      FROM idx
      WHERE tot > 100
        AND (100 - pfx) // (s - i + 1) >= prev_n
        AND (100 - pfx) // (s - i + 1) < n
      UNION ALL
      SELECT CAST(max(n) AS BIGINT), CAST(0 AS BIGINT)
      FROM idx HAVING sum(n) <= 100
    ),
    out AS (
      SELECT c.source, c.n, lvl.level, lvl.rem,
             CASE WHEN c.n > lvl.level THEN 1 ELSE 0 END AS capped,
             sum(CASE WHEN c.n > lvl.level THEN 1 ELSE 0 END)
               OVER (ORDER BY c.source) AS capped_rank
      FROM eligible c CROSS JOIN lvl
    )
    SELECT source, n AS n_avail,
           CAST(least(n, level)
                + CASE WHEN capped = 1 AND capped_rank <= rem
                       THEN 1 ELSE 0 END AS BIGINT) AS alloc,
           CAST(level AS BIGINT) AS water_level
    FROM out
    """,
)
def mix_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed mix-pipeline gate: quantile-normalize per-source length
    ranks (`quantile_normalize`), keep each source's upper half (a
    NORMALIZED threshold means the same thing in every source), count
    eligibles, then water-fill a global 100-doc budget across the
    eligible pools (`waterfill_budget`). The oracle replays the whole
    chain — proves the two operators compose on real ranks, not just in
    isolation."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    normed = D.quantile_normalize(docs.select("doc_id", "source", "n_chars"))
    eligible = (
        normed.where(F.col("q_ppm") >= 500_000)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_avail"))
    )
    return D.waterfill_budget(eligible, 100)


@query(
    "rendezvous_sharding",
    f"""
    WITH shards AS (
      SELECT unnest(['s0','s1','s2','s3','s4','s5','s6','s7']) AS shard
    ),
    scored AS (
      SELECT d.doc_id, s.shard,
             {_H32.format(s="CAST(d.doc_id AS VARCHAR) || ':hrw:' || s.shard")}
               AS h
      FROM documents d CROSS JOIN shards s
    ),
    ranked AS (
      SELECT doc_id, shard,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY h DESC, shard ASC) AS rn
      FROM scored
    )
    SELECT doc_id, shard FROM ranked WHERE rn = 1
    """,
)
def rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HRW-sharding gate (`dataprep.rendezvous_shard`): 8 named shards
    over the documents table. The operator evaluates the argmax
    ARRAY-LOCALLY (zero shuffle); the oracle re-derives it RELATIONALLY
    (cross join + window argmax) — different topologies, identical
    assignment."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.rendezvous_shard(
        docs.select("doc_id"), [f"s{i}" for i in range(8)]
    ).select("doc_id", "shard")


@query(
    "winsorize_clip",
    """
    WITH grid AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    cum AS (
      SELECT source, v, c,
             sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
      FROM grid
    ),
    lo AS (
      SELECT source, CAST(min(v) AS BIGINT) AS lo
      FROM cum WHERE cum >= 1 + ((n - 1) * 50000) // 1000000
      GROUP BY 1
    ),
    hi AS (
      SELECT source, CAST(min(v) AS BIGINT) AS hi
      FROM cum WHERE cum >= 1 + ((n - 1) * 950000) // 1000000
      GROUP BY 1
    )
    SELECT d.doc_id, d.source, d.n_chars, lo.lo, hi.hi,
           CAST(greatest(lo.lo, least(hi.hi, d.n_chars)) AS BIGINT)
             AS clipped,
           greatest(lo.lo, least(hi.hi, d.n_chars)) <> d.n_chars
             AS was_clipped
    FROM documents d JOIN lo USING (source) JOIN hi USING (source)
    """,
)
def winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization gate (`dataprep.winsorize`): per-source 5th/95th
    percentile clipping of document length. The oracle replays the
    integer rank rule over the same value grid — the ppm rank is the
    portable definition (engine-native 0.95 quantiles drift one rank
    whenever (n−1) is a multiple of 20)."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.winsorize(docs.select("doc_id", "source", "n_chars")).select(
        "doc_id", "source", "n_chars", "lo", "hi", "clipped", "was_clipped"
    )


_RBO_WEIGHTS = [0.09999999999999998, 0.04499999999999999, 0.026999999999999996, 0.018224999999999998, 0.013121999999999998, 0.0098415, 0.007592014285714285, 0.005978711249999999, 0.004782969000000001, 0.00387420489]


@query(
    "rbo_topk_overlap",
    f"""
    WITH base AS (
      SELECT doc_id, doc_id % 3 AS mode, unnest(generate_series(0, 9)) AS it
      FROM documents
    ),
    scored AS (
      SELECT doc_id, mode, it,
             {_H32.format(s="doc_id || ':it' || CAST(it AS VARCHAR) || ':a'")} AS ha,
             {_H32.format(s="doc_id || ':it' || CAST(it AS VARCHAR) || ':b'")} AS hb
      FROM base
    ),
    ranked AS (
      SELECT doc_id, mode, it,
             row_number() OVER (PARTITION BY doc_id ORDER BY ha, it) AS ra0,
             row_number() OVER (PARTITION BY doc_id ORDER BY hb, it) AS rb0
      FROM scored
    ),
    adj AS (
      SELECT doc_id, it, ra0 AS ra,
             CASE WHEN mode = 0 THEN ra0
                  WHEN mode = 1 THEN CASE ra0 WHEN 1 THEN 2 WHEN 2 THEN 1
                                              ELSE ra0 END
                  ELSE rb0 END AS rb
      FROM ranked
    ),
    x AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN ra <= 1 AND rb <= 1 THEN 1 ELSE 0 END) AS DOUBLE) AS x1,
             CAST(sum(CASE WHEN ra <= 2 AND rb <= 2 THEN 1 ELSE 0 END) AS DOUBLE) AS x2,
             CAST(sum(CASE WHEN ra <= 3 AND rb <= 3 THEN 1 ELSE 0 END) AS DOUBLE) AS x3,
             CAST(sum(CASE WHEN ra <= 4 AND rb <= 4 THEN 1 ELSE 0 END) AS DOUBLE) AS x4,
             CAST(sum(CASE WHEN ra <= 5 AND rb <= 5 THEN 1 ELSE 0 END) AS DOUBLE) AS x5,
             CAST(sum(CASE WHEN ra <= 6 AND rb <= 6 THEN 1 ELSE 0 END) AS DOUBLE) AS x6,
             CAST(sum(CASE WHEN ra <= 7 AND rb <= 7 THEN 1 ELSE 0 END) AS DOUBLE) AS x7,
             CAST(sum(CASE WHEN ra <= 8 AND rb <= 8 THEN 1 ELSE 0 END) AS DOUBLE) AS x8,
             CAST(sum(CASE WHEN ra <= 9 AND rb <= 9 THEN 1 ELSE 0 END) AS DOUBLE) AS x9,
             CAST(sum(CASE WHEN ra <= 10 AND rb <= 10 THEN 1 ELSE 0 END) AS DOUBLE) AS x10
      FROM adj GROUP BY 1
    )
    SELECT doc_id,
           CAST(floor((x1 * 0.09999999999999998 + x2 * 0.04499999999999999 + x3 * 0.026999999999999996 + x4 * 0.018224999999999998 + x5 * 0.013121999999999998 + x6 * 0.0098415 + x7 * 0.007592014285714285 + x8 * 0.005978711249999999 + x9 * 0.004782969000000001 + x10 * 0.00387420489) * 1000000.0) AS BIGINT) AS rbo_ppm
    FROM x
    """,
)
def rbo_topk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO gate (`dataprep.rbo_overlap`): 10-item rankings per doc —
    identical lists (rbo = 1·truncation mass), a top-2 swap (the
    top-weighted penalty), and an independent second order. The oracle
    computes the prefix overlaps RELATIONALLY and evaluates the SAME
    left-to-right unrolled weight expression with the SAME double
    literals, so the single floor agrees bit-for-bit."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("string")
    items = F.sequence(F.lit(0), F.lit(9))

    def order_by(tag):
        return F.transform(
            F.sort_array(
                F.transform(
                    items,
                    lambda it: F.struct(
                        D.portable_hash32(
                            F.concat(d, F.lit(":it"), it.cast("string"),
                                     F.lit(":" + tag))
                        ).alias("h"),
                        it.alias("it"),
                    ),
                )
            ),
            lambda s: s["it"],
        )

    la = order_by("a")
    lb_ind = order_by("b")
    mode = F.col("doc_id") % 3
    swapped = F.concat(
        F.slice(la, 2, 1), F.slice(la, 1, 1), F.slice(la, 3, 8)
    )
    base = docs.select(
        "doc_id",
        la.alias("list_a"),
        F.when(mode == 0, la)
        .when(mode == 1, swapped)
        .otherwise(lb_ind)
        .alias("list_b"),
    )
    return D.rbo_overlap(base).select("doc_id", "rbo_ppm")
