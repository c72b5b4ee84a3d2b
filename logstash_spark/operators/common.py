"""Shared event-model helpers: tags, sprintf templating, field refs.

Reference semantics: Event.tag (logstash-core Event.java §tag) appends to
the `tags` array without duplicating; sprintf `%{[field]}` / `%{+fmt}`
interpolation (org/logstash/StringInterpolation.java, Event.java §sprintf).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TAGS = "tags"


def ensure_tags(df: DataFrame) -> DataFrame:
    """Guarantee a non-null `tags` array<string> column."""
    if TAGS not in df.columns:
        return df.withColumn(TAGS, F.array().cast(T.ArrayType(T.StringType())))
    return df.withColumn(TAGS, F.coalesce(F.col(TAGS), F.array().cast("array<string>")))


def add_tag_when(df: DataFrame, cond: Column, *tag_values: str) -> DataFrame:
    """Append tags where `cond` holds (dedup like Event§tag)."""
    df = ensure_tags(df)
    tagged = F.array_union(F.col(TAGS), F.array(*[F.lit(t) for t in tag_values]))
    return df.withColumn(TAGS, F.when(cond, tagged).otherwise(F.col(TAGS)))


def remove_tag(df: DataFrame, *tag_values: str) -> DataFrame:
    df = ensure_tags(df)
    return df.withColumn(
        TAGS, F.array_except(F.col(TAGS), F.array(*[F.lit(t) for t in tag_values]))
    )


def has_tag(tag: str) -> Column:
    return F.coalesce(F.array_contains(F.col(TAGS), tag), F.lit(False))


_FIELD_REF = re.compile(r"%\{(\+[^}]+|\[[^}]*\]|[A-Za-z0-9_.@-]+)\}")


def field_ref_to_col(ref: str) -> Column:
    """`[a][b]` / `a.b` field-reference path → Column (FieldReference.java)."""
    parts = re.findall(r"\[([^\]]+)\]", ref) or ref.split(".")
    c = F.col(parts[0] if "." not in parts[0] else f"`{parts[0]}`")
    if len(parts) == 1 and "[" not in ref and "." in ref:
        # dotted path: a.b.c
        parts = ref.split(".")
        c = F.col(parts[0])
    for p in parts[1:]:
        c = c.getItem(int(p)) if p.isdigit() else c.getField(p)
    return c


def sprintf(template: str, ts_col: str = "@timestamp") -> Column:
    """Logstash sprintf: `%{[field]}` → field value, `%{+fmt}` → formatted
    event timestamp. Compiles to concat() of literals/columns — pure Catalyst.
    """
    pieces: list[Column] = []
    pos = 0
    for m in _FIELD_REF.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        ref = m.group(1)
        if ref.startswith("+"):
            pieces.append(F.date_format(F.col(f"`{ts_col}`"), _joda_dateformat(ref[1:])))
        else:
            pieces.append(field_ref_to_col(ref).cast("string"))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)


def _joda_dateformat(fmt: str) -> str:
    # Joda `%{+yyyy.MM.dd}` tokens are already valid for date_format except
    # a couple of zone tokens.
    return fmt.replace("ZZ", "XXX")
