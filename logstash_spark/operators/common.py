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
            pieces.append(_joda_format_col(F.col(f"`{ts_col}`"), ref[1:]))
        else:
            pieces.append(field_ref_to_col(ref).cast("string"))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)


def _joda_format_col(ts: Column, fmt: str) -> Column:
    """Format a timestamp with a Joda pattern (sprintf `%{+fmt}`,
    Event.java §sprintf) — the FULL run-tokenized Joda→JDK translation
    shared with the date filter, not a string shim.

    Spark's date_format rejects week-based letters (Y/x/w/e throw
    DATETIME_PATTERN_RECOGNITION), yet `%{+xxxx.ww}` weekyear.week is a
    real Logstash index-naming pattern — those runs compile to dedicated
    expressions (extract(YEAROFWEEK), weekofyear, ISO day-of-week) and the
    remaining runs/literals stay inside date_format segments, all
    concat()ed — pure Catalyst, no UDF."""
    from logstash_spark.operators.parse import _JODA_RUNS, _tokenize_fmt

    def padded(c: Column, width: int) -> Column:
        s = c.cast("string")
        return F.lpad(s, width, "0") if width > 1 else s

    pieces: list[Column] = []
    seg: list[str] = []

    def flush() -> None:
        if seg:
            pieces.append(F.date_format(ts, "".join(seg)))
            seg.clear()

    for kind, tok in _tokenize_fmt(fmt):
        if kind == "qlit":
            seg.append("'" + tok.replace("'", "''") + "'")
        elif kind == "lit":
            seg.append(tok)
        elif tok[0] == "x":  # Joda weekyear → ISO week-based year
            flush()
            pieces.append(padded(_iso_weekyear(ts), len(tok)))
        elif tok[0] == "w":  # week of weekyear
            flush()
            pieces.append(padded(F.weekofyear(ts), len(tok)))
        elif tok[0] == "e":  # ISO day-of-week number (1=Monday)
            flush()
            pieces.append(padded((F.dayofweek(ts) + 5) % 7 + 1, len(tok)))
        elif tok in _JODA_RUNS:
            seg.append(_JODA_RUNS[tok])
        elif tok[0] == "Y":  # Joda year-of-era → JDK y
            seg.append("y" * len(tok))
        else:
            seg.append(tok)
    flush()
    if not pieces:
        return F.lit("")
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)


def _iso_weekyear(ts: Column) -> Column:
    """ISO week-based year = calendar year of the Thursday of the ISO week
    containing ts (2021-01-01 → 2020, 2019-12-30 → 2020). Pure date
    arithmetic — extract(YEAROFWEEK) has no Column-API helper and F.expr
    can't reference an arbitrary Column expression."""
    iso_dow = (F.dayofweek(ts) + F.lit(5)) % 7 + 1  # 1=Mon .. 7=Sun
    return F.year(F.date_add(ts.cast("date"), (F.lit(4) - iso_dow).cast("int")))
