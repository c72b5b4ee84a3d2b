"""DSIR-style importance resampling for training-data selection.

Public method (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): featurize documents as hashed
n-gram counts, fit bag-of-words distributions over a TARGET corpus (the
distribution you want more of) and the RAW corpus, score every raw
document by the importance log-ratio Σ count_b·(log p_target[b] −
log p_raw[b]), then resample proportionally to the weight.

Scale-first topology (the point of the hashing trick is that the model
is a FIXED-SIZE vector, so scoring never shuffles):
  - `dsir_fit`: one explode + groupBy(bucket) per corpus (map-side
    partial aggregation; the raw side is typically a SAMPLE — the model
    only needs distribution estimates). Output is DENSE: exactly
    `buckets` rows, add-one smoothed, so scoring needs no null handling.
  - `dsir_score`: the bucket→log-ratio table is collected to `buckets`
    integers (bounded by construction, e.g. 1k-100k) and embedded as a
    LITERAL array; per-doc score is a pure column fold over the doc's
    bucket array — map-only, ZERO shuffle, zero joins. At 100 TB the
    corpus is touched exactly once, in place.
  - `dsir_resample`: deterministic Bernoulli thinning with keep
    probability min(1, 2^(logw2−threshold)) evaluated with INTEGER
    shift arithmetic over a md5-derived uniform — bit-identical on any
    engine, independent per seed. `dsir_gumbel_topk` is the paper's
    exact without-replacement top-k form (double Gumbel keys; fine on
    one engine, kept out of the cross-engine gate).

Log-probabilities are integer-quantized (floor(log2(n)) — see
`dataprep.unigram_vocab_logp` for why this is exact cross-engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.operators.dataprep import portable_hash32


def dsir_grams(text: Column) -> Column:
    """Unigrams + bigrams over space-split words (empties filtered),
    array-local: no explode, no shuffle. array<string>."""
    # null text scores as empty (n_grams 0, weight 0), never null-poisons
    w = F.filter(F.split(F.coalesce(text, F.lit("")), " "), lambda x: x != "")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(w, bigrams)


def gram_buckets(text: Column, buckets: int) -> Column:
    """Hashed-feature bucket per gram: portable md5-derived 32-bit hash
    mod `buckets` (non-negative on both engines). array<int>."""
    return F.transform(
        dsir_grams(text), lambda g: (portable_hash32(g) % buckets).cast("int")
    )


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    *,
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Fit the hashed bag-of-words importance model. Output: exactly
    `buckets` rows (bucket, t_cnt, r_cnt, logr2) where
    logr2 = [floor(log2(t_cnt+1)) − floor(log2(t_total+B))]
          − [floor(log2(r_cnt+1)) − floor(log2(r_total+B))]
    (add-one smoothing; all-integer, exact cross-engine).

    `raw` may be a sample of the corpus — the fit only estimates a
    distribution; scoring runs over the full corpus regardless.
    """
    spark = target.sparkSession

    def bucket_counts(df: DataFrame, name: str) -> DataFrame:
        b = df.select(
            F.explode(gram_buckets(F.col(text_col), buckets)).alias("bucket")
        )
        return b.groupBy("bucket").agg(F.count(F.lit(1)).alias(name))

    t = bucket_counts(target, "t_cnt")
    r = bucket_counts(raw, "r_cnt")
    dense = spark.range(buckets).select(F.col("id").cast("int").alias("bucket"))
    joined = (
        dense.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    totals = joined.agg(
        F.sum("t_cnt").alias("_tt"), F.sum("r_cnt").alias("_rt")
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .withColumn(
            "logr2",
            (
                (F.floor(F.log2(F.col("t_cnt") + 1)) - F.floor(F.log2(F.col("_tt") + buckets)))
                - (F.floor(F.log2(F.col("r_cnt") + 1)) - F.floor(F.log2(F.col("_rt") + buckets)))
            ).cast("int"),
        )
        .drop("_tt", "_rt")
    )


def dsir_score(
    corpus: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Per-document importance log-weight under a `dsir_fit` model:
    (id_col, n_grams, logw2) with logw2 = Σ_grams logr2[bucket(gram)].

    The model is collected to `buckets` integers (bounded, driver-safe
    by construction) and embedded as one literal array — scoring is a
    map-only column fold: the corpus NEVER shuffles.
    """
    rows = model.select("bucket", "logr2").collect()
    table = [0] * buckets
    for row in rows:
        table[row["bucket"]] = row["logr2"]
    lit_table = F.array(*[F.lit(v) for v in table])
    bks = gram_buckets(F.col(text_col), buckets)
    return corpus.select(
        F.col(id_col),
        F.size(bks).alias("n_grams"),
        F.aggregate(
            bks,
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(lit_table, b + 1),
        ).alias("logw2"),
    )


def dsir_resample(
    scored: DataFrame,
    *,
    id_col: str = "doc_id",
    logw2_col: str = "logw2",
    threshold: int = 0,
    seed: int = 7,
) -> DataFrame:
    """Deterministic Bernoulli importance thinning: keep probability
    min(1, 2^(logw2 − threshold)). The uniform is an md5-derived 32-bit
    integer of (id, seed); the comparison is a pure integer shift —
    bit-identical across engines, no floating point anywhere. Deficits
    ≥ 32 bits (keep probability < 2^-32) drop deterministically.

    Adds (u32, keep) — filter on `keep` downstream. Zero shuffle.
    """
    u32 = portable_hash32(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    )
    d = F.lit(threshold) - F.col(logw2_col)
    # 2^(32-d) for d in (0,32): exactly representable in a double, so the
    # pow→long cast is exact (F.shiftleft only takes a literal bit count)
    keep = F.when(d <= 0, F.lit(True)).otherwise(
        (d < 32) & (u32 < F.pow(F.lit(2.0), (F.lit(32) - d)).cast("long"))
    )
    return scored.withColumn("u32", u32).withColumn("keep", keep)


def dsir_gumbel_topk(
    scored: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    logw2_col: str = "logw2",
    seed: int = 7,
) -> DataFrame:
    """The paper's exact resampling: top-k by Gumbel-perturbed log
    weight (sampling WITHOUT replacement proportional to 2^logw2).
    u ∈ (0,1) from the same md5 uniform; key = logw2·ln2 − ln(−ln u).
    Double-precision — deterministic on one engine, kept out of the
    cross-engine oracle gate (ties near the kth boundary could order
    differently under last-ulp libm differences).

    Scale: global top-k = TakeOrderedAndProject (map-side partial
    top-k), never a full sort.
    """
    u = (
        portable_hash32(F.concat(F.col(id_col).cast("string"), F.lit(f":g{seed}")))
        + 0.5
    ) / F.lit(float(2**32))
    key = F.col(logw2_col) * F.lit(0.6931471805599453) - F.log(-F.log(u))
    return (
        scored.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
    )
