"""bitext_mine unit goldens (margin-based mining, Artetxe & Schwenk
2019 ratio margin; cross-engine value parity is the `bitext_mining`
oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators.dataprep import bitext_mine


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_forward_best_and_margin(spark):
    # src 0 is exactly tgt 10; src 1 is closest to tgt 11 but barely
    # beats its neighbourhood (low margin).
    src = _vecs(spark, [(0, [1.0, 0.0]), (1, [0.6, 0.8])])
    tgt = _vecs(
        spark,
        [
            (10, [1.0, 0.0]),
            (11, [0.7, 0.714]),
            (12, [0.6, 0.8]),
            (13, [-1.0, 0.0]),
        ],
    )
    out = bitext_mine(
        src, tgt, k=2, margin_threshold_ppm=0, mutual=False
    ).collect()
    best = {r.s_id: r for r in out}
    assert best[0].t_id == 10
    assert best[0].sim_u == 2_000_000  # cos=1 on the integer grid
    # src 1 == tgt 12 exactly
    assert best[1].t_id == 12
    # identical-vector matches are mutual bests
    assert best[0].mutual == 1 and best[1].mutual == 1
    # margin > 1.0 (ppm) for a perfect match vs an imperfect neighbourhood
    assert best[0].margin_ppm > 1_000_000


def test_mutual_intersection_filters_hubs(spark):
    # tgt 20 is a hub: nearest target for BOTH sources, but it can only
    # reciprocate one of them — the other pair must vanish under
    # mutual=True while surviving mutual=False.
    src = _vecs(spark, [(0, [1.0, 0.1]), (1, [1.0, 0.2])])
    tgt = _vecs(spark, [(20, [1.0, 0.15]), (21, [0.0, 1.0])])
    fwd = bitext_mine(src, tgt, k=2, margin_threshold_ppm=0, mutual=False)
    rows = fwd.collect()
    assert {r.t_id for r in rows} == {20}
    assert sorted(r.mutual for r in rows) == [0, 1]
    kept = bitext_mine(
        src, tgt, k=2, margin_threshold_ppm=0, mutual=True
    ).collect()
    assert len(kept) == 1 and kept[0].mutual == 1


def test_candidates_shortlist_path(spark):
    # Restrict scoring to an explicit shortlist: src 0 may only see tgt
    # 11/13, so its true nearest (10) cannot win.
    src = _vecs(spark, [(0, [1.0, 0.0])])
    tgt = _vecs(
        spark,
        [(10, [1.0, 0.0]), (11, [0.9, 0.436]), (13, [0.0, 1.0])],
    )
    cand = spark.createDataFrame(
        [(0, 11), (0, 13)], "s_id long, t_id long"
    )
    out = bitext_mine(
        src,
        tgt,
        k=2,
        margin_threshold_ppm=0,
        mutual=False,
        candidates=cand,
    ).collect()
    assert len(out) == 1 and out[0].t_id == 11


def test_threshold_drops_low_margin_pairs(spark):
    # Uniform similarities -> margin == 1.0 exactly; a threshold just
    # above 1.0 ppm-grid drops everything.
    src = _vecs(spark, [(0, [1.0, 0.0])])
    tgt = _vecs(spark, [(10, [1.0, 0.0]), (11, [1.0, 0.0])])
    out = bitext_mine(
        src, tgt, k=2, margin_threshold_ppm=1_000_001, mutual=False
    )
    assert out.count() == 0
    kept = bitext_mine(
        src, tgt, k=2, margin_threshold_ppm=1_000_000, mutual=False
    ).collect()
    assert len(kept) == 1 and kept[0].margin_ppm == 1_000_000
