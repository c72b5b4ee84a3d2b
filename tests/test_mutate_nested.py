"""Nested-field WRITE surface (Event.java §setField, FieldReference.java):
mutate rename/copy/add_field/remove_field with `[a][b]` targets."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import mutate as M
from logstash_spark.operators.common import ref_exists, set_field, unset_field


def _df(spark):
    return spark.createDataFrame(
        [("web-1", "prod", 7)], ["host", "env", "n"]
    )


def test_rename_into_struct_creates_nested(spark):
    """rename => {"host" => "[host][name]"} converts the scalar into a
    one-field struct holding the old value."""
    out = M.rename(_df(spark), {"host": "[host][name]"})
    row = out.collect()[0]
    assert row["host"]["name"] == "web-1"
    assert out.schema["host"].dataType.typeName() == "struct"


def test_rename_out_of_struct(spark):
    df = _df(spark).withColumn(
        "agent", F.struct(F.lit("curl").alias("name"), F.lit("8.1").alias("ver"))
    )
    out = M.rename(df, {"[agent][name]": "agent_name"})
    row = out.collect()[0]
    assert row["agent_name"] == "curl"
    assert "name" not in out.schema["agent"].dataType.fieldNames()
    assert row["agent"]["ver"] == "8.1"


def test_rename_within_struct(spark):
    df = _df(spark).withColumn(
        "agent", F.struct(F.lit("curl").alias("name"), F.lit("8.1").alias("ver"))
    )
    out = M.rename(df, {"[agent][ver]": "[agent][version]"})
    row = out.collect()[0]
    assert row["agent"]["version"] == "8.1" and row["agent"]["name"] == "curl"
    assert "ver" not in out.schema["agent"].dataType.fieldNames()


def test_copy_and_add_field_nested_targets(spark):
    out = M.copy(_df(spark), {"env": "[meta][env]"})
    out = M.add_field(out, {"[meta][src]": "host=%{host}"})
    row = out.collect()[0]
    assert row["meta"]["env"] == "prod" and row["meta"]["src"] == "host=web-1"


def test_deep_create_and_overwrite_non_struct(spark):
    """Setting [a][b][c] with no `a` column creates the chain; setting a
    path through an existing scalar overwrites it with a struct
    (reference converts to a map)."""
    df = set_field(_df(spark), "[a][b][c]", F.lit(1))
    assert df.collect()[0]["a"]["b"]["c"] == 1
    df2 = set_field(_df(spark), "[env][tier]", F.lit("gold"))
    assert df2.collect()[0]["env"]["tier"] == "gold"


def test_set_preserves_struct_siblings(spark):
    df = _df(spark).withColumn(
        "geo", F.struct(F.lit(1.0).alias("lat"), F.lit(2.0).alias("lon"))
    )
    out = set_field(df, "[geo][lat]", F.lit(9.5))
    row = out.collect()[0]
    assert row["geo"]["lat"] == 9.5 and row["geo"]["lon"] == 2.0


def test_remove_field_nested_and_last_field_drops_column(spark):
    df = _df(spark).withColumn(
        "geo", F.struct(F.lit(1.0).alias("lat"), F.lit(2.0).alias("lon"))
    )
    out = M.remove_field(df, ["[geo][lat]"])
    assert out.schema["geo"].dataType.fieldNames() == ["lon"]
    out2 = M.remove_field(out, ["[geo][lon]"])
    assert "geo" not in out2.columns  # zero-field structs are unwritable
    # missing path is a no-op
    assert unset_field(df, "[geo][nope]").columns == df.columns


def test_ref_exists(spark):
    df = _df(spark).withColumn("geo", F.struct(F.lit(1.0).alias("lat")))
    assert ref_exists(df, "[geo][lat]") and ref_exists(df, "host")
    assert not ref_exists(df, "[geo][lon]") and not ref_exists(df, "[nope][x]")
