"""Invariant tests for the text normalizers over a seeded adversarial
corpus: idempotence and output-charset guarantees, checked in one Spark
batch (hypothesis-per-example round trips through the JVM would be
prohibitively slow — seeded random generation keeps the corpus fixed
and the failures reproducible)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D
from logstash_spark.operators import webtext as W

_NASTY = (
    "‘’“”–—…«»‹›"
    "     　​‌‍⁠﻿"
    "­  \x0b\x0c\x01\x1f\x7f\r\n\t "
    "abcXYZ019.!?,;<>|[]()'\"-"
)


def _corpus(n: int = 300) -> list[str]:
    rng = random.Random(20260819)
    out = []
    for _ in range(n):
        k = rng.randint(0, 60)
        out.append("".join(rng.choice(_NASTY) for _ in range(k)))
    return out


def test_clean_text_idempotent_and_charset(spark):
    rows = [(i, s) for i, s in enumerate(_corpus())]
    df = spark.createDataFrame(rows, "i long, t string")
    got = df.select(
        "i",
        W.clean_text(F.col("t")).alias("c1"),
        W.clean_text(W.clean_text(F.col("t"))).alias("c2"),
    ).collect()
    dropped = set("​‌‍⁠﻿­\x01\x1f\x7f")
    spaced = set("     　")
    folded = set("‘’“”–—…«»")
    for r in got:
        assert r.c1 == r.c2, (r.i, repr(r.c1), repr(r.c2))
        chars = set(r.c1)
        assert not (chars & dropped), r.i
        assert not (chars & spaced), r.i
        assert not (chars & folded), r.i
        assert "\r" not in r.c1 and "\x0b" not in r.c1
        assert "  " not in r.c1  # collapsed
        assert not r.c1.startswith((" ", "\n")) and not r.c1.endswith(
            (" ", "\n")
        )


def test_dedup_key_idempotent_and_charset(spark):
    rows = [(i, s) for i, s in enumerate(_corpus())]
    df = spark.createDataFrame(rows, "i long, t string")
    got = df.select(
        "i",
        D.dedup_key_text(F.col("t")).alias("k1"),
        D.dedup_key_text(D.dedup_key_text(F.col("t"))).alias("k2"),
    ).collect()
    pat = re.compile(r"^$|^[a-z0-9]+( [a-z0-9]+)*$")
    for r in got:
        assert r.k1 == r.k2, r.i
        assert pat.match(r.k1), (r.i, repr(r.k1))


def test_sentence_count_matches_boundaries(spark):
    texts = [
        "One. Two. Three!",
        "No boundary",
        "Trailing. lowercase stays. Upper starts.",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = df.select(
        "i",
        F.size(D.sentence_split("t")).alias("n"),
        F.regexp_count(
            F.col("t"), F.lit("([.!?][\"')\\]]*) +([A-Z0-9])")
        ).alias("b"),
    ).collect()
    for r in got:
        assert r.n == r.b + 1, r.i
