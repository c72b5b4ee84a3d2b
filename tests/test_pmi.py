"""pmi_phrases: hand-checked word2phrase scores on a toy corpus."""

from __future__ import annotations

from logstash_spark.operators.dataprep import pmi_phrases


def test_pmi_toy_corpus(spark):
    # "new york" always collocates; "the" is everywhere (low PMI).
    docs = spark.createDataFrame(
        [
            (1, "new york is the best"),
            (2, "new york and the rest"),
            (3, "new york beats the heat"),
            (4, "the cat saw the dog"),
        ],
        "doc_id int, text string",
    )
    out = pmi_phrases(docs, min_count=3, delta=1, top_k=10).collect()
    rows = {(r.w1, r.w2): r for r in out}
    assert ("new", "york") in rows
    ny = rows[("new", "york")]
    # corpus: 20 tokens; cnt(new)=3, cnt(york)=3, cnt(new york)=3
    assert ny.cnt_ab == 3 and ny.cnt_a == 3 and ny.cnt_b == 3
    assert ny.score == round((3 - 1) * 20 / (3 * 3), 4)
    # pmi_q = floor(log2(2)) + floor(log2(20)) - floor(log2(3))*2
    assert ny.pmi_q == 1 + 4 - 1 - 1
    # "new york" must outrank any pair involving "the" (cnt=6)
    the_pairs = [r for (a, b), r in rows.items() if a == "the" or b == "the"]
    for r in the_pairs:
        assert (ny.pmi_q, ny.cnt_ab) >= (r.pmi_q, r.cnt_ab)


def test_min_count_cut(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d")], "doc_id int, text string"
    )
    out = pmi_phrases(docs, min_count=2, delta=0, top_k=10).collect()
    pairs = {(r.w1, r.w2) for r in out}
    assert ("c", "d") not in pairs  # cnt 1 < min_count
    assert ("a", "b") in pairs
