"""Correctness-gate queries, dataprep batch 31 (round 3): chat-tree
flattening (conversation_paths) and Bradley-Terry leaderboard ratings
(bradley_terry). The tree oracle is a genuine recursive CTE walking
parent pointers up — a fully independent derivation from the Spark
side's pointer-doubling; the BT oracle unrolls the three MM rounds as
CTEs with the same order-pinned list folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"

# depth of node idx (0-based) in the binary tree parent=(idx-1)//2
_DEPTH_SQL = (
    "CASE WHEN {i} = 0 THEN 0 WHEN {i} <= 2 THEN 1 "
    "WHEN {i} <= 6 THEN 2 ELSE 3 END"
)


@query(
    "conversation_tree_sft",
    f"""
    WITH RECURSIVE base AS (
      SELECT doc_id AS msg_id, doc_id // 16 AS conv_id,
             CASE WHEN doc_id % 16 = 0 THEN NULL
                  ELSE (doc_id // 16) * 16 + (doc_id % 16 - 1) // 2
             END AS parent_id,
             CASE WHEN ({_DEPTH_SQL.format(i="doc_id % 16")}) % 2 = 0
                  THEN 'prompter' ELSE 'assistant' END AS role,
             substr(text, 1, 24) AS text
      FROM documents
    ),
    walk AS (
      SELECT msg_id, conv_id, role, parent_id AS cur,
             role || ': ' || text AS ctx, 1 AS d
      FROM base
      UNION ALL
      SELECT w.msg_id, w.conv_id, w.role, b.parent_id,
             b.role || ': ' || b.text || chr(10) || w.ctx, w.d + 1
      FROM walk w JOIN base b ON w.cur = b.msg_id
    )
    SELECT conv_id, msg_id, CAST(d AS INT) AS depth,
           false AS truncated, ctx AS context
    FROM walk WHERE cur IS NULL AND role = 'assistant'
    """,
)
def conversation_tree_sft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-tree gate (`dataprep.conversation_paths`): each run of 16
    doc ids forms one OpenAssistant-style binary conversation tree
    (parent = (idx−1)//2, roles alternating by tree depth). The
    operator assembles root→message transcripts by pointer DOUBLING
    (4 rounds ⇒ depth ≤ 16); the oracle walks the same tree with a
    recursive CTE — two independent derivations of every transcript."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = F.col("doc_id") % 16
    depth = (
        F.when(idx == 0, F.lit(0))
        .when(idx <= 2, F.lit(1))
        .when(idx <= 6, F.lit(2))
        .otherwise(F.lit(3))
    )
    msgs = docs.select(
        F.col("doc_id").alias("msg_id"),
        F.expr("doc_id DIV 16").alias("conv_id"),
        F.when(
            idx == 0, F.lit(None).cast("long")
        ).otherwise(F.expr("(doc_id DIV 16) * 16 + (doc_id % 16 - 1) DIV 2"))
        .alias("parent_id"),
        F.when(depth % 2 == 0, F.lit("prompter"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.substring("text", 1, 24).alias("text"),
    )
    out = D.conversation_paths(msgs, rounds=4)
    return out.where(F.col("role") == "assistant").select(
        "conv_id", "msg_id", F.col("depth").cast("int"), "truncated", "context"
    )


def _bt_mm_round(prev: str, k: int) -> str:
    """One unrolled Bradley-Terry MM round as a pair of CTEs."""
    return f"""
    d{k} AS (
      SELECT pr.i AS m,
             list_sum(list_transform(
               list(struct_pack(j := pr.j,
                                t := CAST(pr.n AS DOUBLE) / (ri.p + rj.p))
                    ORDER BY pr.j),
               x -> x.t)) AS den
      FROM pairs pr
      JOIN {prev} ri ON pr.i = ri.m
      JOIN {prev} rj ON pr.j = rj.m
      GROUP BY pr.i
    ),
    r{k} AS (
      SELECT d{k}.m, CAST(w.W2 AS DOUBLE) / (2.0 * d{k}.den) AS p
      FROM d{k} JOIN wsum w ON d{k}.m = w.i
    )"""


@query(
    "bradley_terry_ratings",
    f"""
    WITH lab AS (
      SELECT doc_id % 20 AS a, (doc_id * 7 + 3) % 20 AS b,
             {_H32.format(s="doc_id || ':bt'")} AS h
      FROM documents
      WHERE doc_id % 20 <> (doc_id * 7 + 3) % 20
    ),
    battles AS (
      SELECT a, b,
             CASE WHEN h % 20 = 19 THEN 'tie'
                  WHEN (h // 20) % (a + b + 2) < a + 1 THEN 'a'
                  ELSE 'b' END AS winner
      FROM lab
    ),
    directed AS (
      SELECT a AS i, b AS j,
             CASE winner WHEN 'a' THEN 2 WHEN 'tie' THEN 1 ELSE 0 END AS w2
      FROM battles
      UNION ALL
      SELECT b, a,
             CASE winner WHEN 'b' THEN 2 WHEN 'tie' THEN 1 ELSE 0 END
      FROM battles
    ),
    pairs AS (
      SELECT i, j, CAST(count(*) AS BIGINT) AS n, CAST(sum(w2) AS BIGINT) AS w2
      FROM directed GROUP BY i, j
    ),
    wsum AS (
      SELECT i, CAST(sum(w2) AS BIGINT) AS W2, CAST(sum(n) AS BIGINT) AS nb
      FROM pairs GROUP BY i
    ),
    r0 AS (SELECT i AS m, 1.0 AS p FROM wsum),
    {_bt_mm_round("r0", 1)},
    {_bt_mm_round("r1", 2)},
    {_bt_mm_round("r2", 3)}
    SELECT r3.m AS model,
           CAST(floor(r3.p
                      / (SELECT p FROM r3 WHERE m = (SELECT min(m) FROM r3))
                      * 1000000.0) AS BIGINT) AS rating_ppm,
           w.nb AS n_battles, w.W2 AS wins2
    FROM r3 JOIN wsum w ON r3.m = w.i
    """,
)
def bradley_terry_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard gate (`dataprep.bradley_terry`): 20 models with true
    strength i+1 battle on hash-assigned matchups (5% ties); three MM
    rounds recover the strength ordering. Every double in both engines
    comes from the same j-sorted left-to-right fold; the single floor
    is the anchored ppm at the end."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    h = D.portable_hash32(F.concat(i.cast("string"), F.lit(":bt")))
    battles = (
        docs.select(
            (i % 20).alias("model_a"),
            ((i * 7 + 3) % 20).alias("model_b"),
            h.alias("_h"),
        )
        .where(F.col("model_a") != F.col("model_b"))
        .select(
            "model_a",
            "model_b",
            F.when(F.col("_h") % 20 == 19, F.lit("tie"))
            .when(
                F.expr("(_h div 20) % (model_a + model_b + 2)")
                < F.col("model_a") + 1,
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("winner"),
        )
    )
    return D.bradley_terry(battles, iters=3)
