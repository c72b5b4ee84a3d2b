"""extractnumbers / math / i18n-transliterate option surfaces beyond
what the driver gate covers: missing-number nulls, field budget,
chained + unknown math ops, round digits, in-place transliteration."""

from __future__ import annotations

import pytest

from logstash_spark.functions import extractnumbers, math_ops, transliterate


class TestExtractNumbers:
    def test_no_numbers_yields_nulls_and_empty_arrays(self, spark):
        df = spark.createDataFrame([(1, "no digits here")], "id long, message string")
        r = extractnumbers(df, "message", max_fields=2).first()
        assert r["_ints"] == [] and r["_floats"] == []
        assert r["int0"] is None and r["float0"] is None

    def test_signed_and_decimal_split(self, spark):
        df = spark.createDataFrame(
            [(1, "a=-3 b=+4 c=2.5 d=-0.75 e=10")], "id long, message string"
        )
        r = extractnumbers(df, "message", max_fields=3).first()
        assert r["_ints"] == [-3, 4, 10]
        assert r["_floats"] == [2.5, -0.75]
        assert r["int2"] == 10 and r["float2"] is None

    def test_max_fields_budget(self, spark):
        df = spark.createDataFrame([(1, "1 2 3 4 5")], "id long, message string")
        out = extractnumbers(df, "message", max_fields=2)
        assert "int1" in out.columns and "int2" not in out.columns
        assert out.first()["_ints"] == [1, 2, 3, 4, 5]  # full array still there


class TestMath:
    def test_chained_targets_in_order(self, spark):
        df = spark.createDataFrame([(10, 4)], "a long, b long")
        r = math_ops(
            df,
            [("add", "a", "b", "s"), ("mul", "s", 2, "d"), ("sub", "d", 1, "e")],
        ).first()
        assert (r["s"], r["d"], r["e"]) == (14, 28, 27)

    def test_round_digits_and_fdiv_mod(self, spark):
        df = spark.createDataFrame([(22,)], "a long")
        r = math_ops(
            df,
            [
                ("div", "a", 8.0, "q"),        # 2.75
                ("round", "q", 1, "q1"),       # 2.8
                ("fdiv", "a", 7, "f"),         # 3
                ("mod", "a", 5, "m"),          # 2
            ],
        ).first()
        assert r["q"] == 2.75 and abs(r["q1"] - 2.8) < 1e-9
        assert r["f"] == 3 and r["m"] == 2

    def test_unknown_operation_raises(self, spark):
        df = spark.createDataFrame([(1,)], "a long")
        with pytest.raises(ValueError, match="unknown math operation"):
            math_ops(df, [("pow", "a", 2, "x")])


class TestTransliterate:
    def test_in_place_default_target(self, spark):
        df = spark.createDataFrame([("Crème brûlée à Ñoño",)], "t string")
        r = transliterate(df, "t").first()
        assert r["t"] == "Creme brulee a Nono"

    def test_multichar_expansions(self, spark):
        df = spark.createDataFrame([("Straße Æon œuvre",)], "t string")
        r = transliterate(df, "t", target="out").first()
        assert r["out"] == "Strasse AEon oeuvre"
