"""Correctness-gate queries, dataprep batch 12 (round 3): DPO
preference-pair construction, hard-negative mining for retrieval
training, in-context-pretraining cluster-ordered packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logstash_spark.queries import query

_TOK_N = "(doc_id % 37) + 3"
_TOK_SQL = (
    f"list_transform(range(0, {_TOK_N}), "
    "i -> CAST((doc_id * 7 + i * 13) % 50000 AS INTEGER))"
)


@query(
    "dpo_pairs",
    f"""
    WITH c AS (
      SELECT doc_id % 61 AS prompt_id, doc_id,
             CAST((doc_id * 7919) % 1000 AS INT) AS score,
             {_TOK_SQL} AS t
      FROM documents
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY prompt_id
                                ORDER BY score DESC, doc_id ASC) AS rh,
             row_number() OVER (PARTITION BY prompt_id
                                ORDER BY score ASC, doc_id DESC) AS rl,
             count(*) OVER (PARTITION BY prompt_id) AS n
      FROM c
    ),
    p AS (
      SELECT prompt_id,
             max(CASE WHEN rh = 1 THEN doc_id END) AS chosen_id,
             max(CASE WHEN rl = 1 THEN doc_id END) AS rejected_id,
             CAST(max(CASE WHEN rh = 1 THEN score END)
                  - max(CASE WHEN rl = 1 THEN score END) AS INT) AS margin,
             max(CASE WHEN rh = 1
                      THEN md5(array_to_string(t, ',')) END) AS chosen_md5,
             max(CASE WHEN rl = 1
                      THEN md5(array_to_string(t, ',')) END) AS rejected_md5,
             CAST(max(n) AS BIGINT) AS n_candidates
      FROM r GROUP BY prompt_id
    )
    SELECT * FROM p WHERE n_candidates >= 2 AND margin >= 2
    """,
)
def dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair gate (`dataprep.dpo_pairs`, Rafailov et al.
    2023): per prompt (doc_id % 61 → ~8 candidates at sf0.01), chosen =
    highest deterministic score, rejected = lowest, margin >= 2; ties
    broken by id on both ends. md5-canonicalized token payloads (driver
    convention). One shuffle: two same-key windows + the groupBy."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (FN.col("doc_id") % 37 + 3).cast("int")
    toks = FN.transform(
        FN.sequence(FN.lit(0), n - 1),
        lambda i: ((FN.col("doc_id") * 7 + i * 13) % 50000).cast("int"),
    )
    src = docs.select(
        (FN.col("doc_id") % 61).alias("prompt_id"),
        "doc_id",
        ((FN.col("doc_id") * 7919) % 1000).cast("int").alias("score"),
        toks.alias("tokens"),
    )
    out = D.dpo_pairs(src, min_margin=2)
    md5 = lambda c: FN.md5(  # noqa: E731
        FN.concat_ws(",", FN.col(c).cast("array<string>"))
    )
    return out.select(
        "prompt_id",
        "chosen_id",
        "rejected_id",
        FN.col("margin").cast("int").alias("margin"),
        md5("chosen_tokens").alias("chosen_md5"),
        md5("rejected_tokens").alias("rejected_md5"),
        "n_candidates",
    )


@query(
    "hard_negative_mining",
    """
    WITH c AS (
      SELECT doc_id % 47 AS query_id, doc_id,
             CAST((doc_id * 104729) % 100000 AS INT) AS score
      FROM documents
    ),
    g AS (SELECT query_id, doc_id FROM c WHERE doc_id % 17 = 0),
    n AS (
      SELECT c.* FROM c
      WHERE NOT EXISTS (
        SELECT 1 FROM g
        WHERE g.query_id = c.query_id AND g.doc_id = c.doc_id)
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS neg_rank
      FROM n
    )
    SELECT query_id, doc_id, score, CAST(neg_rank AS INT) AS neg_rank
    FROM r WHERE neg_rank <= 3
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining gate (`dataprep.hard_negatives`, DPR §3.2):
    candidates = every doc scored per query (doc_id % 47), gold pairs =
    docs with doc_id % 17 == 0; top-3 non-gold per query by (score
    desc, id). ONE anti-join + ONE bounded window."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = docs.select(
        (FN.col("doc_id") % 47).alias("query_id"),
        "doc_id",
        ((FN.col("doc_id") * 104729) % 100000).cast("int").alias("score"),
    )
    gold = cand.where(FN.col("doc_id") % 17 == 0).select("query_id", "doc_id")
    return D.hard_negatives(cand, gold, k=3)


@query(
    "incontext_pack",
    """
    WITH d AS (
      SELECT doc_id % 13 AS cluster, doc_id,
             CAST((doc_id % 37) + 3 AS INT) AS n_tok
      FROM documents
    ),
    o AS (
      SELECT *,
             CAST(sum(n_tok) OVER (PARTITION BY cluster ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tok AS BIGINT) AS "offset",
             CAST(row_number() OVER (PARTITION BY cluster
                                     ORDER BY doc_id) AS INT) AS pack_order
      FROM d
    )
    SELECT cluster, doc_id, n_tok, pack_order, "offset",
           CAST("offset" // 64 AS BIGINT) AS window_id,
           (("offset" % 64) + n_tok) > 64 AS straddles
    FROM o
    """,
)
def incontext_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-context-pretraining packing gate (`dataprep.incontext_pack`,
    Shi et al. ICLR 2024): docs keyed by similarity cluster (doc_id %
    13 here), laid end-to-end per cluster in deterministic id order and
    cut into 64-token context windows; the gate pins the full layout
    (pack_order, offset, window_id, straddle set). ONE shuffle — the
    per-cluster running-sum window."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = docs.select(
        (FN.col("doc_id") % 13).alias("cluster"),
        "doc_id",
        ((FN.col("doc_id") % 37) + 3).cast("int").alias("n_tok"),
    )
    out = D.incontext_pack(src, seq_len=64)
    return out.select(
        "cluster", "doc_id", "n_tok", "pack_order", "offset",
        "window_id", "straddles",
    )


@query(
    "snapshot_cdc_diff",
    """
    WITH v1 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
    ),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '!' ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 0
    ),
    j AS (
      SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             v1.text AS t1, v2.text AS t2,
             v1.doc_id IS NULL AS ins, v2.doc_id IS NULL AS del
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    ),
    c AS (
      SELECT doc_id,
             CASE WHEN ins THEN 'insert' WHEN del THEN 'delete'
                  WHEN t1 <> t2 THEN 'update'
                  ELSE 'unchanged' END AS change,
             md5(coalesce(t2, '')) AS text_md5
      FROM j
    )
    SELECT doc_id, change, text_md5 FROM c WHERE change <> 'unchanged'
    """,
)
def snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CDC gate (`sources.tableio.snapshot_diff`): v1 drops
    every 5th doc, v2 drops every 7th and rewrites every 3rd — the diff
    must emit exactly the insert/delete/update sets with new-side
    payload (null for deletes, md5-canonicalized). ONE full-outer join
    on the id; fingerprints computed map-side."""
    from pyspark.sql import functions as FN

    from logstash_spark.sources.tableio import snapshot_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v1 = docs.where(FN.col("doc_id") % 5 != 0).select("doc_id", "text")
    v2 = docs.where(FN.col("doc_id") % 7 != 0).select(
        "doc_id",
        FN.when(
            FN.col("doc_id") % 3 == 0, FN.concat(FN.col("text"), FN.lit("!"))
        )
        .otherwise(FN.col("text"))
        .alias("text"),
    )
    out = snapshot_diff(v1, v2, id_col="doc_id", compare_cols=["text"])
    return out.select(
        "doc_id",
        "change",
        FN.md5(FN.coalesce(FN.col("text"), FN.lit(""))).alias("text_md5"),
    )


@query(
    "packing_position_ids",
    f"""
    WITH docs AS (
      SELECT doc_id, source, {_TOK_N} AS n, {_TOK_SQL} AS t FROM documents
    ),
    offs AS (
      SELECT *, CAST(sum(n) OVER (PARTITION BY source ORDER BY doc_id)
                     - n AS BIGINT) AS off
      FROM docs
    ),
    pieces AS (
      SELECT source, cs.seq_id, off,
             greatest(cs.seq_id * 64 - off, 0) AS pstart,
             CASE WHEN off >= cs.seq_id * 64
                  THEN off - cs.seq_id * 64 END AS cstart,
             t[CAST(greatest(cs.seq_id * 64 - off, 0) + 1 AS BIGINT) :
               CAST(least((cs.seq_id + 1) * 64, off + n) - off AS BIGINT)]
               AS piece
      FROM offs,
           LATERAL (SELECT unnest(range(off // 64, (off + n - 1) // 64 + 1))
                    AS seq_id) cs
    )
    SELECT source, seq_id,
           md5(array_to_string(flatten(list(piece ORDER BY off)), ','))
             AS tokens_md5,
           md5(array_to_string(flatten(
               list(range(pstart, pstart + len(piece)) ORDER BY off)), ','))
             AS pos_md5,
           md5(coalesce(array_to_string(
               list(cstart ORDER BY off) FILTER (WHERE cstart IS NOT NULL),
               ','), '')) AS starts_md5,
           CAST(count(*) AS INT) AS n_segments,
           CAST(len(flatten(list(piece ORDER BY off))) AS INTEGER) AS n_tok
    FROM pieces GROUP BY source, seq_id
    """,
)
def packing_position_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-aware packing gate (`dataprep.pack_concat_chunks`
    `with_boundaries=True`): per packed chunk, doc-relative
    position_ids (RoPE-faithful continuation across chunk boundaries),
    the within-chunk doc-start cut points (cu_seqlens), and segment
    counts — the flash-attn varlen training layout. Same ONE shuffle as
    plain packing; md5-canonicalized arrays (driver convention)."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (FN.col("doc_id") % 37 + 3).cast("int")
    toks = FN.transform(
        FN.sequence(FN.lit(0), n - 1),
        lambda i: ((FN.col("doc_id") * 7 + i * 13) % 50000).cast("int"),
    )
    src = docs.select(
        "doc_id", "source", n.alias("n_tok"), toks.alias("tokens")
    )
    out = D.pack_concat_chunks(
        src, group_col="source", seq_len=64, with_boundaries=True
    )
    md5 = lambda c: FN.md5(  # noqa: E731
        FN.concat_ws(",", FN.col(c).cast("array<string>"))
    )
    return out.select(
        "source",
        "seq_id",
        md5("tokens").alias("tokens_md5"),
        md5("position_ids").alias("pos_md5"),
        md5("doc_starts").alias("starts_md5"),
        "n_segments",
        "n_tok",
    )


@query(
    "chat_loss_mask",
    f"""
    WITH d AS (
      SELECT doc_id, CAST({_TOK_N} AS INT) AS n, {_TOK_SQL} AS t,
             CAST(doc_id % 5 AS INT) AS s1,
             CAST(20 + doc_id % 9 AS INT) AS s2
      FROM documents
    ),
    m AS (
      SELECT doc_id, s1, s2,
             list_transform(range(1, n + 1), i ->
               CASE WHEN ((i - 1) >= s1 AND (i - 1) < s1 + 7)
                      OR ((i - 1) >= s2 AND (i - 1) < s2 + 4)
                    THEN t[i] ELSE -100 END) AS labels
      FROM d
    )
    SELECT doc_id, s1, s2,
           md5(coalesce(array_to_string(labels, ','), '')) AS labels_md5,
           CAST(len(list_filter(labels, x -> x <> -100)) AS INT)
             AS n_trainable
    FROM m
    """,
)
def chat_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-turn chat masking gate (`dataprep.chat_loss_mask`): two
    assistant spans per doc ([s1, s1+7) and [20+k, 20+k+4)), the second
    deliberately beyond many docs' length to pin the clip behavior.
    md5-canonicalized labels (driver convention)."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (FN.col("doc_id") % 37 + 3).cast("int")
    toks = FN.transform(
        FN.sequence(FN.lit(0), n - 1),
        lambda i: ((FN.col("doc_id") * 7 + i * 13) % 50000).cast("int"),
    )
    s1 = (FN.col("doc_id") % 5).cast("int")
    s2 = (FN.col("doc_id") % 9 + 20).cast("int")
    spans = FN.array(
        FN.struct(s1.alias("s"), (s1 + 7).alias("e")),
        FN.struct(s2.alias("s"), (s2 + 4).alias("e")),
    )
    src = docs.select(
        "doc_id",
        toks.alias("tokens"),
        spans.alias("train_spans"),
        s1.alias("s1"),
        s2.alias("s2"),
    )
    out = D.chat_loss_mask(src)
    return out.select(
        "doc_id",
        "s1",
        "s2",
        FN.md5(
            FN.concat_ws(",", FN.col("labels").cast("array<string>"))
        ).alias("labels_md5"),
        "n_trainable",
    )
