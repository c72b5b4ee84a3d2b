"""Correctness-gate queries, dataprep batch 32 (round 3): the in-cluster
Naive-Bayes quality-classifier train→apply loop. The oracle retrains the
ENTIRE model in DuckDB SQL — token counts, class stats, vocabulary,
quantized log-space scoring and the argmax — so the gate certifies the
trained model end to end, not just the apply pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"

# floor(1e6 · ln(k)) — the quantized log term; k is always an exact integer
_LQ = "CAST(floor(ln({k}) * 1000000) AS BIGINT)"

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


@query(
    "nb_classifier_train",
    f"""
    WITH lab AS (
      SELECT doc_id, text,
             CASE WHEN {_H32.format(s="source || ':nb'")} % 2 = 0
                  THEN 'pos' ELSE 'neg' END AS label,
             doc_id % 5 = 4 AS is_test
      FROM documents
    ),
    tr AS (SELECT * FROM lab WHERE NOT is_test),
    trtok AS (
      SELECT label, unnest({_TOKS}) AS token FROM tr
    ),
    tc AS (
      SELECT label, token, CAST(count(*) AS BIGINT) AS cnt
      FROM trtok GROUP BY 1, 2
    ),
    cs AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs FROM tr GROUP BY 1),
    ct AS (SELECT label, CAST(count(*) AS BIGINT) AS n_tokens FROM trtok GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS vs FROM trtok),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM tr),
    te AS (
      SELECT doc_id, {_TOKS} AS toks FROM lab WHERE is_test
    ),
    ex AS (SELECT doc_id, unnest(toks) AS token FROM te),
    ms AS (
      SELECT e.doc_id,
        CAST(coalesce(sum(CASE WHEN t.label = 'pos'
          THEN {_LQ.format(k="t.cnt + 1")} END), 0) AS BIGINT) AS ms_pos,
        CAST(coalesce(sum(CASE WHEN t.label = 'neg'
          THEN {_LQ.format(k="t.cnt + 1")} END), 0) AS BIGINT) AS ms_neg
      FROM ex e LEFT JOIN tc t USING (token) GROUP BY 1
    ),
    scored AS (
      SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
        {_LQ.format(k="(SELECT n_docs FROM cs WHERE label = 'pos')")}
          - {_LQ.format(k="(SELECT nd FROM nn)")}
          + coalesce(m.ms_pos, 0)
          - CAST(len(t.toks) AS BIGINT)
            * {_LQ.format(k="(SELECT n_tokens FROM ct WHERE label = 'pos') + (SELECT vs FROM v)")}
          AS nb_score_pos_q,
        {_LQ.format(k="(SELECT n_docs FROM cs WHERE label = 'neg')")}
          - {_LQ.format(k="(SELECT nd FROM nn)")}
          + coalesce(m.ms_neg, 0)
          - CAST(len(t.toks) AS BIGINT)
            * {_LQ.format(k="(SELECT n_tokens FROM ct WHERE label = 'neg') + (SELECT vs FROM v)")}
          AS nb_score_neg_q
      FROM te t LEFT JOIN ms m USING (doc_id)
    )
    SELECT doc_id, n_tok, nb_score_pos_q, nb_score_neg_q,
           CASE WHEN nb_score_pos_q > nb_score_neg_q THEN 'pos'
                ELSE 'neg' END AS nb_label
    FROM scored
    """,
)
def nb_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply gate for `dataprep.nb_train`/`nb_classify`: an 80%
    doc_id-split training slice labeled by a source-hash rule, the
    multinomial model counted in-cluster, the held-out 20% scored in
    quantized log space (every term floor(10⁶·ln k) of an exact
    integer) with the lexicographic tie rule. The oracle retrains and
    rescores everything independently in DuckDB."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lab = docs.select(
        "doc_id",
        "text",
        F.when(
            D.portable_hash32(F.concat(F.col("source"), F.lit(":nb"))) % 2 == 0,
            F.lit("pos"),
        ).otherwise(F.lit("neg")).alias("label"),
        (F.col("doc_id") % 5 == 4).alias("is_test"),
    )
    token_counts, class_stats, vocab = D.nb_train(lab.filter(~F.col("is_test")))
    test = lab.filter(F.col("is_test")).select("doc_id", "text")
    return D.nb_classify(
        test, token_counts, class_stats, vocab, ["neg", "pos"]
    ).select("doc_id", "n_tok", "nb_score_pos_q", "nb_score_neg_q", "nb_label")


@query(
    "calibration_report",
    f"""
    WITH base AS (
      SELECT {_H32.format(s="doc_id || ':cf'")} % 1000001 AS conf_ppm,
             CASE WHEN {_H32.format(s="doc_id || ':lb'")} % 1000000
                       < {_H32.format(s="doc_id || ':cf'")} % 1000001
                  THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    binned AS (
      SELECT least(9, (conf_ppm * 10) // 1000000) AS bin, conf_ppm, label,
             (conf_ppm - label * 1000000) AS d
      FROM base
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             sum(conf_ppm) AS sc, sum(label) AS sl,
             sum(CAST(d AS HUGEINT) * d) AS sd2
      FROM binned GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             sum(abs(CAST(sl AS HUGEINT) * 1000000 - sc)) AS ece_num,
             sum(sd2) AS bri_num
      FROM bins
    )
    SELECT CAST(bin AS INT) AS bin, n,
           CAST(sl * 1000000 // n AS BIGINT) AS acc_ppm,
           CAST(sc // n AS BIGINT) AS avg_conf_ppm,
           CAST(abs(CAST(sl AS HUGEINT) * 1000000 - sc) // n AS BIGINT)
             AS gap_ppm,
           CAST(ece_num // nn AS BIGINT) AS ece_ppm,
           CAST(bri_num // (CAST(1000000 AS HUGEINT) * nn) AS BIGINT)
             AS brier_ppm
    FROM bins, tot
    """,
)
def calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration gate (`dataprep.calibration_report`): hash-derived
    ppm confidences with labels drawn so P(label=1) = conf (a
    near-calibrated model — bins land close to the diagonal but the
    finite-sample gaps are nonzero and exact). ECE, Brier, and every
    per-bin statistic are integer arithmetic on both engines."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("string")
    conf = D.portable_hash32(F.concat(i, F.lit(":cf"))) % 1000001
    lab = (
        D.portable_hash32(F.concat(i, F.lit(":lb"))) % 1000000 < conf
    ).cast("long")
    base = docs.select(conf.alias("conf_ppm"), lab.alias("label"))
    return D.calibration_report(base, n_bins=10)


@query(
    "rouge_l_eval",
    f"""
    WITH base AS (
      SELECT doc_id,
             8 + doc_id % 9 AS n,
             doc_id % 4 AS mode
      FROM documents
    ),
    derived AS (
      SELECT doc_id, n, mode,
             CASE mode WHEN 2 THEN n - n // 4 ELSE n END AS np,
             CASE mode
               WHEN 0 THEN n
               WHEN 1 THEN n - n // 3
               WHEN 2 THEN n - n // 4
               ELSE n - n // 2 END AS lcs
      FROM base
    )
    SELECT doc_id, CAST(lcs AS BIGINT) AS lcs,
           CAST(np AS BIGINT) AS np, CAST(n AS BIGINT) AS nr,
           CAST(lcs * 1000000 // np AS BIGINT) AS rouge_l_p_ppm,
           CAST(lcs * 1000000 // n AS BIGINT) AS rouge_l_r_ppm,
           CAST(2 * lcs * 1000000 // (np + n) AS BIGINT) AS rouge_l_f_ppm
    FROM derived
    """,
)
def rouge_l_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L gate (`dataprep.rouge_l`): references are n distinct
    synthetic tokens (n = 8 + doc_id%9); predictions are hash-free
    deterministic corruptions whose LCS is known in CLOSED FORM —
    identical copy (lcs=n), every-3rd token replaced by unique junk
    (lcs=n−⌊n/3⌋), every-4th dropped (lcs=n−⌊n/4⌋), and a half
    rotation (lcs=n−⌊n/2⌋ — the case that separates true LCS from
    order-blind token overlap, which would score n). The oracle states
    the outcome arithmetically and never runs the DP, so the two
    derivations are fully independent."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (F.lit(8) + F.col("doc_id") % 9).cast("int")
    mode = F.col("doc_id") % 4
    seq = F.sequence(F.lit(1), n)
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.col("doc_id").cast("string"), F.lit("_"), i.cast("string")
    )
    toks = F.transform(seq, tok)
    junked = F.transform(
        seq,
        lambda i: F.when(
            i % 3 == 0,
            F.concat(F.lit("j"), F.col("doc_id").cast("string"), F.lit("_"), i.cast("string")),
        ).otherwise(tok(i)),
    )
    dropped = F.filter(toks, lambda x, i: (i + 1) % 4 != 0)
    h = (n / 2).cast("int")
    rotated = F.concat(F.slice(toks, h + 1, n - h), F.slice(toks, F.lit(1), h))
    base = docs.select(
        "doc_id",
        toks.alias("ref_toks"),
        F.when(mode == 0, toks)
        .when(mode == 1, junked)
        .when(mode == 2, dropped)
        .otherwise(rotated)
        .alias("pred_toks"),
    )
    return D.rouge_l(base).select(
        "doc_id", "lcs", "np", "nr",
        "rouge_l_p_ppm", "rouge_l_r_ppm", "rouge_l_f_ppm",
    )


@query(
    "mad_outlier_flags",
    """
    WITH med AS (
      SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
      FROM documents GROUP BY source
    ),
    dev AS (
      SELECT d.doc_id, d.source, d.n_chars, m.med,
             abs(d.n_chars - m.med) AS abs_dev
      FROM documents d JOIN med m USING (source)
    ),
    mad AS (
      SELECT source, CAST(quantile_disc(abs_dev, 0.5) AS BIGINT) AS mad
      FROM dev GROUP BY source
    )
    SELECT dev.doc_id, dev.source, dev.n_chars, dev.med,
           CAST(dev.abs_dev AS BIGINT) AS abs_dev, mad.mad,
           dev.abs_dev > 3 * mad.mad AS is_outlier
    FROM dev JOIN mad USING (source)
    """,
)
def mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-outlier gate (`dataprep.mad_outliers`): per-source lower
    median and MAD of document length, k=3 flags. The oracle uses
    DuckDB's NATIVE quantile_disc aggregate — an independent order-
    statistic implementation that must agree with the grid-window
    derivation exactly."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.mad_outliers(
        docs.select("doc_id", "source", "n_chars"),
        value_col="n_chars",
        group_col="source",
        k=3,
    ).select("doc_id", "source", "n_chars", "med", "abs_dev", "mad", "is_outlier")


@query(
    "gale_church_align",
    """
    WITH base AS (
      SELECT doc_id, 6 + doc_id % 5 AS n, doc_id % 4 AS mode
      FROM documents
    ),
    ops AS (
      SELECT doc_id, n, mode, unnest(generate_series(0, n - 1)) AS si
      FROM base
    ),
    kept AS (
      SELECT doc_id, n, mode, si
      FROM ops
      WHERE NOT (mode = 1 AND si = 2)
        AND NOT (mode = 2 AND si IN (2, 4))
    )
    SELECT doc_id,
           CASE WHEN mode IN (1, 2) AND si IN (1, 3)
                     AND NOT (mode = 1 AND si = 3) THEN '21'
                WHEN mode = 3 AND si = 1 THEN '12'
                ELSE '11' END AS op,
           CAST(si AS INT) AS si,
           CAST(CASE
             WHEN mode = 0 THEN si
             WHEN mode = 1 THEN CASE WHEN si <= 1 THEN si ELSE si - 1 END
             WHEN mode = 2 THEN CASE WHEN si <= 1 THEN si
                                     WHEN si <= 3 THEN si - 1
                                     ELSE si - 2 END
             ELSE CASE WHEN si <= 1 THEN si ELSE si + 1 END
           END AS INT) AS ti,
           CAST(CASE mode WHEN 0 THEN 0 WHEN 1 THEN 5 WHEN 2 THEN 10
                          ELSE 5 END AS BIGINT) AS align_cost,
           CAST(n AS BIGINT) AS n_src,
           CAST(n + CASE mode WHEN 0 THEN 0 WHEN 1 THEN -1 WHEN 2 THEN -2
                              ELSE 1 END AS BIGINT) AS n_tgt
    FROM kept
    """,
)
def gale_church_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-alignment gate (`dataprep.gale_church_align`): source
    docs get n = 6+doc_id%5 sentences with lengths 20+((7·doc_id+13·i)
    mod 40); targets are built by mode — identical (all 1-1, cost 0),
    one merge of sentences 1-2 (a 2-1, cost = merge penalty), two
    merges at 1-2 and 3-4 (two 2-1s), or a split of sentence 1 (a
    1-2). Each construction's optimal alignment is unique by a ≥8-cost
    margin (every alternative op chain pays ≥ one |13|-length mismatch
    or a 20+-length gap), so the oracle can state the FULL alignment —
    every op row and the total cost — in closed form without running
    the DP."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    n = (F.lit(6) + d % 5).cast("int")
    mode = d % 4
    lens = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: (F.lit(20) + F.pmod(d * 7 + i.cast("long") * 13, F.lit(40)))
        .cast("long"),
    )
    a = lambda k0: F.element_at(F.col("src_lens"), k0 + 1)  # noqa: E731
    base = docs.select("doc_id", lens.alias("src_lens"), n.alias("n"), mode.alias("mode"))
    tgt = (
        F.when(F.col("mode") == 0, F.col("src_lens"))
        .when(
            F.col("mode") == 1,
            F.concat(
                F.slice(F.col("src_lens"), 1, 1),
                F.array(a(1) + a(2)),
                F.slice(F.col("src_lens"), 4, F.col("n") - 3),
            ),
        )
        .when(
            F.col("mode") == 2,
            F.concat(
                F.slice(F.col("src_lens"), 1, 1),
                F.array(a(1) + a(2)),
                F.array(a(3) + a(4)),
                F.slice(F.col("src_lens"), 6, F.col("n") - 5),
            ),
        )
        .otherwise(
            F.concat(
                F.slice(F.col("src_lens"), 1, 1),
                F.array(F.expr("src_lens[1] div 2")),
                F.array(a(1) - F.expr("src_lens[1] div 2")),
                F.slice(F.col("src_lens"), 3, F.col("n") - 2),
            )
        )
    )
    paired = base.withColumn("tgt_lens", tgt)
    aligned = D.gale_church_align(
        paired, gap_penalty=50, merge_penalty=5
    )
    return aligned.select(
        "doc_id",
        F.explode("alignment").alias("_a"),
        "align_cost",
        F.size("src_lens").cast("long").alias("n_src"),
        F.size("tgt_lens").cast("long").alias("n_tgt"),
    ).select(
        "doc_id",
        F.col("_a.op").alias("op"),
        F.col("_a.si").alias("si"),
        F.col("_a.ti").alias("ti"),
        "align_cost",
        "n_src",
        "n_tgt",
    )


@query(
    "weighted_sample_k",
    f"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             CAST(floor(
               CAST(CAST(floor(ln({_H32.format(s="doc_id || ':wres'")}
                                  % 1000000 + 1) * 1000000) AS BIGINT)
                    - 13815510 AS DOUBLE)
               / greatest(n_chars, 1)
             ) AS BIGINT) AS wres_key_q
      FROM documents
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY wres_key_q DESC, doc_id ASC) AS INT) AS sample_rank
      FROM scored
    )
    SELECT doc_id, source, n_chars, wres_key_q, sample_rank
    FROM ranked WHERE sample_rank <= 10
    """,
)
def weighted_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-sampling gate (`dataprep.weighted_sample_k`): 10 docs
    per source with inclusion odds ∝ n_chars (the A-Res key with a
    hash uniform). The oracle replays the quantized key formula —
    L(10⁶) = 13815510 stated as the literal both engines must agree
    on — and the full rank."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.weighted_sample_k(
        docs.select("doc_id", "source", "n_chars"),
        10,
        weight_col="n_chars",
        groups=("source",),
    ).select("doc_id", "source", "n_chars", "wres_key_q", "sample_rank")


@query(
    "isotonic_calibration",
    f"""
    WITH base AS (
      SELECT {_H32.format(s="doc_id || ':sc'")} % 50 AS score,
             CASE WHEN {_H32.format(s="doc_id || ':lb'")} % 50
                       < {_H32.format(s="doc_id || ':sc'")} % 50
                  THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    grid AS (
      SELECT score, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(label) AS BIGINT) AS pos
      FROM base GROUP BY 1
    ),
    idx AS (
      SELECT *, row_number() OVER (ORDER BY score) AS i,
             sum(pos) OVER (ORDER BY score) AS ps,
             sum(n) OVER (ORDER BY score) AS pn
      FROM grid
    ),
    pairs AS (
      SELECT a.i AS ai, b.i AS bi,
             (b.ps - a.ps + a.pos) * 1000000
               // (b.pn - a.pn + a.n) AS q
      FROM idx a JOIN idx b ON b.i >= a.i
    ),
    mn AS (
      SELECT p.ai, g.i, min(p.q) AS mn_q
      FROM pairs p JOIN idx g ON p.bi >= g.i AND p.ai <= g.i
      GROUP BY 1, 2
    ),
    iso AS (SELECT i, CAST(max(mn_q) AS BIGINT) AS cal_ppm FROM mn GROUP BY i)
    SELECT g.score, g.n, g.pos, iso.cal_ppm
    FROM idx g JOIN iso ON g.i = iso.i
    """,
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic-fit gate (`dataprep.isotonic_calibrate`): a 50-point
    score grid with labels drawn at rate score/50 (monotone signal,
    finite-sample violations to pool). The oracle never runs PAV — it
    evaluates the max-min-average characterization of the unique
    isotonic L2 solution, entirely in BIGINT (floor commutes with
    min/max, so per-pair integer division IS the exact answer). Two
    independent algorithms, one exact table."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("string")
    score = D.portable_hash32(F.concat(i, F.lit(":sc"))) % 50
    lab = (
        D.portable_hash32(F.concat(i, F.lit(":lb"))) % 50 < score
    ).cast("long")
    base = docs.select(score.alias("score"), lab.alias("label"))
    return D.isotonic_calibrate(base)


@query(
    "edit_distance_join",
    """
    WITH strings AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN b
                  WHEN (doc_id // 2) % 4 = 0 THEN b
                  WHEN (doc_id // 2) % 4 = 1
                    THEN substr(b,1,4) || 'z' || substr(b,6,7)
                  WHEN (doc_id // 2) % 4 = 2
                    THEN substr(b,1,2) || 'z' || substr(b,4,5) || 'z'
                         || substr(b,10,3)
                  ELSE substr(b,1,1) || 'z' || substr(b,3,3) || 'z'
                       || substr(b,7,3) || 'z' || substr(b,11,2) END AS s
      FROM (SELECT doc_id,
                   substr(md5(CAST(doc_id // 2 AS VARCHAR) || ':ed'), 1, 12)
                     AS b
            FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM strings a JOIN strings b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-join gate (`dataprep.edit_distance_join`): 12-char hash
    strings in planted pairs — identical, 1-sub, 2-sub (all ≤ k=2,
    must match) and 3-sub (must NOT match). Spark runs the REAL q-gram
    count-filtered plan; the oracle brute-forces every pair with
    DuckDB's levenshtein, so any filter false-negative shows up as a
    missing row."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    b = F.substring(
        F.md5(F.concat(F.expr("CAST(doc_id DIV 2 AS STRING)"), F.lit(":ed"))),
        1, 12,
    )
    m = F.expr("(doc_id DIV 2) % 4")
    s = (
        F.when((d % 2 == 0) | (m == 0), b)
        .when(m == 1, F.concat(F.substring(b, 1, 4), F.lit("z"), F.substring(b, 6, 7)))
        .when(
            m == 2,
            F.concat(
                F.substring(b, 1, 2), F.lit("z"), F.substring(b, 4, 5),
                F.lit("z"), F.substring(b, 10, 3),
            ),
        )
        .otherwise(
            F.concat(
                F.substring(b, 1, 1), F.lit("z"), F.substring(b, 3, 3),
                F.lit("z"), F.substring(b, 7, 3), F.lit("z"),
                F.substring(b, 11, 2),
            )
        )
    )
    strings = docs.select("doc_id", s.alias("s"))
    return D.edit_distance_join(strings, text_col="s", k=2, q=2)
