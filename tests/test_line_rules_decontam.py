"""C4/FineWeb line rules and embedding decontamination
(operators/dataprep.py): per-line classification, document kill-rules,
literal-direction cosine flags, and the bounded-eval guard. Cross-engine
value parity is covered by the `c4_fineweb_line_rules` /
`embed_decontam_flags` oracle gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from logstash_spark.operators import dataprep as D

_TEXT = "Good sentence one here today.\n- bullet item\nshort\nno punct line at all\nAnother keeper sentence right here."


def _docs(spark):
    rows = [
        Row(doc_id=1, text=_TEXT),
        Row(doc_id=2, text="lorem ipsum dolor sit amet.\nKeeper line is here today."),
        Row(doc_id=3, text="code { brace\nKeeper line is here today."),
        Row(doc_id=4, text=""),
        Row(doc_id=5, text=None),
    ]
    return spark.createDataFrame(rows)


def test_line_quality_rules(spark):
    out = {r["doc_id"]: r for r in D.line_quality_rules(_docs(spark)).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 5
    # lines ending . : two sentences; 'short'/'no punct'/'- bullet' don't
    assert r1["frac_term_punct"] == pytest.approx(0.4)
    assert r1["frac_bullet"] == pytest.approx(0.2)
    assert r1["frac_short"] == pytest.approx(0.2)  # 'short' (1 word)
    assert not r1["has_lorem"] and not r1["has_curly"]
    assert out[2]["has_lorem"] and out[3]["has_curly"]
    # empty/null text: zero lines, ratios 0, no crash
    for did in (4, 5):
        assert out[did]["n_lines"] == 0
        assert out[did]["frac_term_punct"] == 0.0


def test_c4_line_filter(spark):
    out = {r["doc_id"]: r for r in D.c4_line_filter(_docs(spark), min_lines=2).collect()}
    r1 = out[1]
    # keeps only >=5-word terminal-punct lines, original order
    assert r1["text_clean"] == (
        "Good sentence one here today.\nAnother keeper sentence right here."
    )
    assert r1["n_kept"] == 2 and r1["doc_keep"]
    # lorem / curly kill the document even though lines survive
    assert out[2]["n_kept"] >= 1 and not out[2]["doc_keep"]
    assert out[3]["n_kept"] >= 1 and not out[3]["doc_keep"]
    assert out[4]["n_kept"] == 0 and not out[4]["doc_keep"]


def _vecs(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=10, embedding=[1.0, 0.0, 0.0]),     # exact copy of eval 0
        Row(vec_id=11, embedding=[0.9, 0.1, 0.0]),     # near eval 0
        Row(vec_id=12, embedding=[0.0, 0.0, 1.0]),     # orthogonal
    ]
    return spark.createDataFrame(rows)


def test_embed_decontam_flags(spark):
    em = _vecs(spark)
    eval_df = em.filter("vec_id < 2")
    corpus = em.filter("vec_id >= 10")
    out = {
        r["vec_id"]: r
        for r in D.embed_decontam(corpus, eval_df, threshold=0.99).collect()
    }
    assert out[10]["contaminated"] and out[10]["max_eval_cos"] >= 0.999999
    assert out[10]["n_contam_hits"] == 1
    assert not out[12]["contaminated"] and out[12]["max_eval_cos"] == 0.0
    # near-dup: cos([0.9,0.1,0], e0) ≈ 0.9939 ≥ 0.99 → also flagged
    assert out[11]["max_eval_cos"] == pytest.approx(0.9939, abs=1e-3)
    assert out[11]["contaminated"]


def test_embed_decontam_eval_bound(spark):
    em = _vecs(spark)
    with pytest.raises(ValueError, match="max_eval"):
        D.embed_decontam(em, em, max_eval=2)
