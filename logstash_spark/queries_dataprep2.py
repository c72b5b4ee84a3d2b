"""Correctness-gate queries, dataprep batch 2: unigram LM quality
(CCNet-style), SemDeDup semantic dedup, Bloom-filter decontamination,
and IVF-PQ ANN. Same parity discipline as queries_dataprep: every hash
and float path is engine-reproducible (md5-derived hashes, integer
log2 quantization, dyadic-rational PQ codebooks, fixed fold order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D
from logstash_spark.queries import query
from logstash_spark.queries_dataprep import _cos_sql, _docs, _embs

# ---------------------------------------------------------------------------
# Unigram LM quality
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 64
_OOV_LOGP2 = -30


@query(
    "unigram_lm_quality",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    nz AS (SELECT doc_id, word FROM w WHERE word != ''),
    counts AS (SELECT word, count(*) AS cnt FROM nz GROUP BY word),
    tot AS (SELECT sum(cnt) AS total FROM counts),
    vocab AS (
      SELECT word,
             CAST(floor(log2(cnt)) - floor(log2(total)) AS INT) AS logp2
      FROM counts, tot
      ORDER BY cnt DESC, word LIMIT {_VOCAB_SIZE}
    ),
    s AS (
      SELECT doc_id, count(*) AS n_words,
             sum(coalesce(v.logp2, {_OOV_LOGP2})) AS logp2_sum
      FROM nz LEFT JOIN vocab v USING (word)
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(logp2_sum AS BIGINT) AS logp2_sum,
           round(CAST(logp2_sum AS DOUBLE) / n_words, 4) AS avg_logp2
    FROM s
    """,
)
def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM filter (`dataprep.unigram_vocab_logp` +
    `unigram_logprob_score`): top-64 corpus vocabulary with integer
    log2-quantized probabilities, then per-doc average log-likelihood
    (OOV floor -30). All arithmetic before the final division is exact
    integers — bit-for-bit reproducible across engines."""
    docs = _docs(spark, sf_dir)
    vocab = D.unigram_vocab_logp(docs, vocab_size=_VOCAB_SIZE)
    return D.unigram_logprob_score(docs, vocab, oov_logp2=_OOV_LOGP2)


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup
# ---------------------------------------------------------------------------

_SEM_THRESHOLD = 0.92


@query(
    "semantic_dedup_flags",
    f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, embedding FROM embeddings
    ),
    cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec
             FROM embeddings WHERE vec_id < 4),
    a AS (
      SELECT c.vec_id, c.embedding, t.cent_id,
             round({_cos_sql('c.embedding', 't.cent_vec')}, 6) AS ccos
      FROM corpus c, cent t
    ),
    asg AS (
      SELECT vec_id, embedding, cent_id AS cluster
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, cent_id) AS pr
            FROM a)
      WHERE pr = 1
    ),
    dup AS (
      SELECT DISTINCT r.vec_id
      FROM asg l JOIN asg r ON l.cluster = r.cluster AND l.vec_id < r.vec_id
      WHERE round({_cos_sql('l.embedding', 'r.embedding')}, 6) >= {_SEM_THRESHOLD}
    )
    SELECT g.vec_id, g.cluster, (d.vec_id IS NOT NULL) AS semantic_dup
    FROM asg g LEFT JOIN dup d USING (vec_id)
    """,
)
def semantic_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (`dataprep.semantic_dedup`, arXiv:2303.09540): coarse
    4-centroid clustering, within-cluster cosine >= 0.92 marks the
    larger id a semantic duplicate, over embeddings + injected
    identical-vector copies (vec_id+100000). Star guard disabled HERE
    (max_bucket=10^9) so the exact pairwise oracle stays valid; the
    guard is pinned by unit tests like the minhash/simhash gates."""
    em = _embs(spark, sf_dir)
    corpus = em.select("vec_id", "embedding").unionByName(
        em.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    cent = em.select("vec_id", "embedding").where(F.col("vec_id") < 4)
    out = D.semantic_dedup(
        corpus, cent, threshold=_SEM_THRESHOLD, max_bucket=10**9, mode="flag"
    )
    return out.select("vec_id", "cluster", "semantic_dup")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

_BLOOM_M = 65536
_BLOOM_N_BENCH = 25

# per-doc DISTINCT hashed 5-gram shingles (mirror of shingle_hashes n=5)
_H32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"
_GRAM5 = f"""
  SELECT doc_id,
         CASE WHEN len(w) >= 5
              THEN list_distinct(list_transform(
                     range(1, len(w) - 3),
                     i -> {_H32.format(x="w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]")}))
              ELSE [] END AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {{src}})
"""

_POS3 = f"[(3*h + 7) % {_BLOOM_M}, (5*h + 11) % {_BLOOM_M}, (7*h + 17) % {_BLOOM_M}]"


@query(
    "bloom_decontam",
    f"""
    WITH bench AS (SELECT doc_id, text FROM documents
                   WHERE doc_id < {_BLOOM_N_BENCH}),
    bg AS (SELECT DISTINCT unnest(sh) AS h FROM ({_GRAM5.format(src='bench')})),
    pos AS (SELECT DISTINCT unnest({_POS3}) AS p FROM bg),
    bm AS (SELECT p // 32 AS wi, bit_or(1::BIGINT << (p % 32)) AS wv
           FROM pos GROUP BY 1),
    dg AS (SELECT doc_id, unnest(sh) AS h FROM ({_GRAM5.format(src='documents')})),
    gp AS (SELECT doc_id, h, unnest({_POS3}) AS p FROM dg),
    hitbits AS (
      SELECT doc_id, h, count(*) AS nb
      FROM gp JOIN bm ON bm.wi = p // 32
                     AND (bm.wv & (1::BIGINT << (p % 32))) != 0
      GROUP BY doc_id, h
    ),
    hits AS (SELECT doc_id, count(*) AS n FROM hitbits WHERE nb = 3
             GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(h.n, 0) > 0 AS might_contaminated,
           CAST(coalesce(h.n, 0) AS INT) AS n_bloom_hits
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
)
def bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (`dataprep.build_gram_bloom` +
    `bloom_decontaminate`): the eval slice's 5-gram hashes are folded
    into a fixed 64 Kbit bitmap (k=3 deterministic double hashing);
    every corpus doc with a gram whose 3 bits are all set is flagged.
    Deterministic false positives, zero false negatives — the broadcast
    stays fixed-size no matter how the eval set grows (the scale
    rationale vs `decontaminate`'s exact broadcast set)."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") < _BLOOM_N_BENCH)
    words = D.build_gram_bloom(bench, n=5, m_bits=_BLOOM_M, k=3)
    out = D.bloom_decontaminate(docs, words, n=5, m_bits=_BLOOM_M, k=3)
    return out.select("doc_id", "might_contaminated", "n_bloom_hits")


# ---------------------------------------------------------------------------
# IVF-PQ ANN
# ---------------------------------------------------------------------------

_PQ_DIM, _PQ_M, _PQ_K, _PQ_SUB = 64, 4, 16, 16
_CB = D.pq_codebook(_PQ_M, _PQ_K, _PQ_SUB)

_FOLD = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "z -> {term})), (p, q) -> p + q)"
)


def _sql_list(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]"


def _pq_dist_sql(vec: str, m: int, j: int) -> str:
    sub = f"{vec}[{m * _PQ_SUB + 1}:{(m + 1) * _PQ_SUB}]"
    body = _FOLD.format(
        a=sub,
        b=_sql_list(_CB[m][j]),
        term="(CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])",
    )
    return f"round({body}, 6)"


def _pq_code_sql(vec: str, m: int) -> str:
    dists = "[" + ", ".join(_pq_dist_sql(vec, m, j) for j in range(_PQ_K)) + "]"
    return f"CAST(list_position({dists}, list_min({dists})) - 1 AS INT)"


def _pq_adc_sql(qvec: str, m: int) -> str:
    """ADC term m: dot(query slice m, codebook[m][codes[m]])."""
    sub = f"{qvec}[{m * _PQ_SUB + 1}:{(m + 1) * _PQ_SUB}]"
    cbm = "[" + ", ".join(_sql_list(_CB[m][j]) for j in range(_PQ_K)) + "]"
    body = _FOLD.format(
        a=sub,
        b=f"({cbm})[codes[{m + 1}] + 1]",
        term="CAST(z[1] AS DOUBLE) * z[2]",
    )
    return f"round({body}, 6)"


_PQ_SCORE = "round(" + " + ".join(_pq_adc_sql("q_vec", m) for m in range(_PQ_M)) + ", 6)"
_PQ_CODES = "[" + ", ".join(_pq_code_sql("embedding", m) for m in range(_PQ_M)) + "]"


@query(
    "ann_ivf_pq",
    f"""
    WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec
                  FROM embeddings WHERE vec_id < 8),
    a AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             round({_cos_sql('e.embedding', 'c.cent_vec')}, 6) AS ccos
      FROM embeddings e, cent c
    ),
    cb AS (
      SELECT vec_id AS c_id, cent_id AS bucket
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, cent_id) AS pr FROM a)
      WHERE pr = 1
    ),
    codes AS (SELECT vec_id AS c_id, {_PQ_CODES} AS codes FROM embeddings),
    cside AS (SELECT cb.c_id, bucket, codes FROM cb JOIN codes USING (c_id)),
    qb AS (
      SELECT vec_id AS q_id, embedding AS q_vec, cent_id AS bucket
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, cent_id) AS pr
            FROM a WHERE vec_id < 6)
      WHERE pr <= 2
    ),
    s AS (
      SELECT q_id, c_id, {_PQ_SCORE} AS score_pq
      FROM qb JOIN cside USING (bucket) WHERE q_id != c_id
    )
    SELECT q_id, c_id, score_pq, CAST(rank AS INTEGER) AS rank
    FROM (SELECT q_id, c_id, score_pq,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY score_pq DESC, c_id) AS rank
          FROM s)
    WHERE rank <= 5
    """,
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (`dataprep.ann_ivf_pq`, Jégou et al. TPAMI 2011):
    8-centroid IVF lists bound candidates, 4x16 product-quantization
    codes replace corpus vectors in the scoring join (64x fewer shuffle
    bytes), asymmetric-distance top-5 per query (vec_id < 6, nprobe 2).
    Codebooks are a deterministic dyadic-rational lattice so both
    engines agree bit-for-bit."""
    em = _embs(spark, sf_dir)
    return D.ann_ivf_pq(
        em,
        em.where(F.col("vec_id") < 6),
        em.where(F.col("vec_id") < 8),
        dim=_PQ_DIM,
        m_sub=_PQ_M,
        k_codes=_PQ_K,
        k=5,
        nprobe=2,
    )
