"""logstash-filter-mutate re-expressed as Catalyst column expressions.

Reference: `logstash-filter-mutate` [plugin gem] (SURVEY.md §2.4). Every
op is a native Spark expression — no UDFs anywhere in this module.

Ops execute in Logstash's documented fixed order:
coerce → rename → update → replace → convert → gsub → uppercase →
capitalize → lowercase → strip → split → join → merge → copy,
then the common decorators add_field/add_tag/remove_field/remove_tag
(applied only on success — trivially always here, since mutate never
fails; parse filters gate their decorators on the match flag).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.operators import op
from logstash_spark.operators.common import (
    ensure_tags,
    field_ref_to_col,
    ref_exists,
    remove_tag,
    set_field,
    sprintf,
    unset_field,
)

# Logstash convert-to-boolean truth tables (mutate.rb §convert_boolean)
_TRUE = ["true", "t", "yes", "y", "1", "1.0"]
_FALSE = ["false", "f", "no", "n", "0", "0.0"]

_CONVERT_TYPES = {
    "integer": "long",
    "integer_eu": "long",
    "float": "double",
    "float_eu": "double",
    "string": "string",
    "boolean": "boolean",
}


def _convert_scalar(c: Column, typ: str) -> Column:
    if typ == "boolean":
        s = F.lower(c.cast("string"))
        return (
            F.when(s.isin(_TRUE), F.lit(True))
            .when(s.isin(_FALSE), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    if typ in ("integer_eu", "float_eu"):
        c = F.regexp_replace(F.regexp_replace(c.cast("string"), r"\.", ""), ",", ".")
    if typ == "integer":
        # logstash truncates "1.5" → 1 (Ruby to_i on float-looking strings)
        return c.cast("double").cast("long")
    return c.cast(_CONVERT_TYPES[typ])


def convert(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """mutate.convert — arrays convert element-wise (mutate.rb §convert).
    Like all mutate ops, a missing field is a no-op (mutate.rb guards
    each op with event.include?)."""
    out: dict[str, Column] = {}
    for name, typ in fields.items():
        if name not in df.columns:
            continue
        dt = dict(df.dtypes).get(name, "")
        c = F.col(name)
        if dt.startswith("array"):
            out[name] = F.transform(c, lambda x: _convert_scalar(x, typ))
        else:
            out[name] = _convert_scalar(c, typ)
    return df.withColumns(out)


def gsub(df: DataFrame, triples: Sequence[tuple[str, str, str]]) -> DataFrame:
    """mutate.gsub — (field, pattern, replacement) regex replace triples."""
    for field, pattern, repl in triples:
        if field not in df.columns:
            continue
        df = df.withColumn(field, F.regexp_replace(F.col(field), pattern, repl))
    return df


def split_field(df: DataFrame, field: str, separator: str) -> DataFrame:
    # mutate.split uses a literal separator (Ruby String#split with string)
    import re as _re

    if field not in df.columns:
        return df
    return df.withColumn(field, F.split(F.col(field), _re.escape(separator)))


def join_field(df: DataFrame, field: str, separator: str) -> DataFrame:
    if field not in df.columns:
        return df
    return df.withColumn(field, F.concat_ws(separator, F.col(field)))


def merge(df: DataFrame, dest: str, src: str) -> DataFrame:
    dt = dict(df.dtypes)
    if dt.get(dest, "").startswith("map"):
        return df.withColumn(dest, F.map_concat(F.col(dest), F.col(src)))
    return df.withColumn(dest, F.array_union(F.col(dest), F.col(src)))


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """mutate.rename — accepts `[a][b]` FieldReference paths on either
    side (Event.java §setField semantics: rename into a struct creates /
    overwrites the nested entry; rename out of a struct reads the nested
    value and drops it). Plain→plain pairs stay a zero-cost
    withColumnsRenamed."""
    plain = {
        k: v
        for k, v in mapping.items()
        if "[" not in k and "[" not in v and k in df.columns
    }
    df = df.withColumnsRenamed(plain)
    from logstash_spark.operators.common import ref_parts

    for src, dst in mapping.items():
        if src in plain or not ref_exists(df, src):
            continue
        val = field_ref_to_col(src)
        df = set_field(df, dst, val)
        sp, dp = ref_parts(src), ref_parts(dst)
        if dp[: len(sp)] == sp:
            # src is an ancestor of dst (e.g. host → [host][name]): the
            # set already replaced the source value with the new struct
            continue
        df = unset_field(df, src)
    return df


def replace(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """mutate.replace — set field to sprintf-templated value (always)."""
    return df.withColumns({k: sprintf(v) for k, v in fields.items()})


def update(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """mutate.update — like replace but only if the field exists/non-null."""
    out: dict[str, Column] = {}
    for k, v in fields.items():
        if k not in df.columns:
            continue
        out[k] = F.when(F.col(k).isNotNull(), sprintf(v)).otherwise(F.col(k))
    return df.withColumns(out)


def uppercase(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    fields = [f_ for f_ in fields if f_ in df.columns]
    return df.withColumns({f_: F.upper(F.col(f_)) for f_ in fields})


def lowercase(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    fields = [f_ for f_ in fields if f_ in df.columns]
    return df.withColumns({f_: F.lower(F.col(f_)) for f_ in fields})


def capitalize(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    # Ruby String#capitalize: first char upper, REST lower (≠ initcap)
    fields = [f_ for f_ in fields if f_ in df.columns]
    return df.withColumns(
        {
            f_: F.concat(
                F.upper(F.substring(F.col(f_), 1, 1)),
                F.lower(F.expr(f"substring(`{f_}`, 2)")),
            )
            for f_ in fields
        }
    )


def strip(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    fields = [f_ for f_ in fields if f_ in df.columns]
    return df.withColumns({f_: F.trim(F.col(f_)) for f_ in fields})


def copy(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """mutate.copy — `[a][b]` paths supported on both sides."""
    plain = {
        dst: F.col(src)
        for src, dst in mapping.items()
        if "[" not in src and "[" not in dst and src in df.columns
    }
    df = df.withColumns(plain)
    for src, dst in mapping.items():
        if dst in plain or not ref_exists(df, src):
            continue
        df = set_field(df, dst, field_ref_to_col(src))
    return df


def coerce(df: DataFrame, fields: dict[str, object]) -> DataFrame:
    """mutate.coerce — default value for existing-but-null fields."""
    return df.withColumns(
        {k: F.coalesce(F.col(k), F.lit(v)) for k, v in fields.items() if k in df.columns}
    )


def add_field(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Decorator add_field — sprintf-templated values, `[a][b]` targets."""
    df = df.withColumns(
        {k: sprintf(v) for k, v in fields.items() if "[" not in k}
    )
    for k, v in fields.items():
        if "[" in k:
            df = set_field(df, k, sprintf(v))
    return df


def remove_field(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    df = df.drop(*[f_ for f_ in fields if "[" not in f_])
    for f_ in fields:
        if "[" in f_:
            df = unset_field(df, f_)
    return df


def add_tag(df: DataFrame, tags: Sequence[str]) -> DataFrame:
    df = ensure_tags(df)
    return df.withColumn(
        "tags", F.array_union(F.col("tags"), F.array(*[F.lit(t) for t in tags]))
    )


@op("mutate")
def mutate(df: DataFrame, **conf: object) -> DataFrame:
    """Umbrella mutate with Logstash's fixed execution order."""
    order = [
        ("coerce", coerce),
        ("rename", rename),
        ("update", update),
        ("replace", replace),
        ("convert", convert),
        ("gsub", gsub),
        ("uppercase", uppercase),
        ("capitalize", capitalize),
        ("lowercase", lowercase),
        ("strip", strip),
    ]
    for key, fn in order:
        if key in conf:
            df = fn(df, conf[key])  # type: ignore[arg-type]
    if "split" in conf:
        for field, sep in conf["split"].items():  # type: ignore[union-attr]
            df = split_field(df, field, sep)
    if "join" in conf:
        for field, sep in conf["join"].items():  # type: ignore[union-attr]
            df = join_field(df, field, sep)
    if "merge" in conf:
        for dest, src in conf["merge"].items():  # type: ignore[union-attr]
            df = merge(df, dest, src)
    if "copy" in conf:
        df = copy(df, conf["copy"])  # type: ignore[arg-type]
    # common decorators
    if "add_field" in conf:
        df = add_field(df, conf["add_field"])  # type: ignore[arg-type]
    if "remove_field" in conf:
        df = remove_field(df, conf["remove_field"])  # type: ignore[arg-type]
    if "add_tag" in conf:
        df = add_tag(df, conf["add_tag"])  # type: ignore[arg-type]
    if "remove_tag" in conf:
        df = remove_tag(df, *conf["remove_tag"])  # type: ignore[misc]
    return df
