"""robots.txt parsing + URL compliance filtering (RFC 9309).

The opt-out layer of an ethical crawl corpus: before any text leaves the
pipeline, URLs are checked against each host's robots policy. The
reference stack has no robots plugin (crawlers enforce it upstream);
re-ingesting raw archives at 100 TB puts the check back in the engine.

Semantics follow RFC 9309 / the Googlebot reference implementation:

* records are user-agent groups; consecutive ``User-agent`` lines stack
  onto one group; ``Allow``/``Disallow`` lines attach to the current
  group; comments (``#`` to end of line) and blank lines are ignored.
* a crawler obeys the MOST SPECIFIC matching group per host: its own
  product token if any group names it, else the ``*`` groups. Groups
  never combine across that choice.
* rule matching is longest-match-wins over the URL path, with ``*`` as
  any-sequence wildcard and a trailing ``$`` anchoring end-of-path; on
  equal length ``Allow`` wins. No matching rule ⇒ allowed. An empty
  ``Disallow:`` value is a no-op (allow-all), per spec.

Scale design: parsing is ONE posexplode over the robots blob (a few KB
per host) + two windows keyed by host — the work is proportional to the
robots corpus, which is ~#hosts, millions of rows at web scale, not
trillions. `robots_filter` joins the URL corpus to the rules table on
host; the rules side is dimension-sized, so it broadcasts by default
(``broadcast=False`` switches to a keyed shuffle join for pathological
rule corpora). Matching is pure column algebra — the robots pattern is
translated to a SQL ``LIKE`` pattern per row (escape + ``*``→``%`` +
``$`` anchor), so the match runs inside whole-stage codegen on every
engine with column-pattern LIKE; no regex compilation per row, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_KEY_RX = r"^([A-Za-z][A-Za-z-]*)\s*:"
_VAL_RX = r"^[A-Za-z][A-Za-z-]*\s*:\s*(.*)$"


def parse_robots(
    df: DataFrame, field: str = "robots_txt", host: str = "host"
) -> DataFrame:
    """robots.txt blobs → one row per (host, agent, rule):
    (host, group_id, agent, rule allow|disallow, path, line_no).

    Group structure is sessionization, same shape as the multiline
    codec: a ``User-agent`` line whose predecessor is not one starts a
    new group (consecutive UA lines stack); rules join to every agent
    of their group."""
    w = Window.partitionBy(host).orderBy("line_no")
    lines = df.select(
        F.col(host),
        F.posexplode(F.split(F.col(field), r"\r?\n")).alias("line_no", "_l"),
    )
    cleaned = F.trim(F.regexp_replace(F.col("_l"), "#.*$", ""))
    keyed = lines.select(
        host,
        "line_no",
        F.lower(F.regexp_extract(cleaned, _KEY_RX, 1)).alias("_k"),
        F.trim(F.regexp_extract(cleaned, _VAL_RX, 1)).alias("_v"),
    ).filter(F.col("_k") != "")
    is_ua = F.col("_k") == "user-agent"
    grouped = keyed.withColumn(
        "group_id",
        F.sum(
            (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))).cast(
                "int"
            )
        ).over(w),
    )
    agents = grouped.filter(is_ua).select(
        host, "group_id", F.lower(F.col("_v")).alias("agent")
    )
    # empty Disallow: is the spec's allow-all no-op — drop it
    rules = grouped.filter(
        F.col("_k").isin("allow", "disallow") & (F.col("_v") != "")
    ).select(
        host,
        "group_id",
        F.col("_k").alias("rule"),
        F.col("_v").alias("path"),
        "line_no",
    )
    return rules.join(agents, [host, "group_id"])


def robots_like_pattern(path: Column | str) -> Column:
    """robots path pattern → SQL LIKE pattern (ESCAPE ``\\``):
    escape ``\\``/``%``/``_``, ``*`` → ``%``, trailing ``$`` anchors
    (no trailing ``%``), otherwise prefix match (append ``%``)."""
    p = F.col(path) if isinstance(path, str) else path
    esc = F.replace(p, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    anchored = p.endswith("$")
    return F.when(
        anchored, F.substring(esc, 1, F.length(esc) - 1)
    ).otherwise(F.concat(esc, F.lit("%")))


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    host: str = "host",
    path: str = "path",
    broadcast: bool = True,
) -> DataFrame:
    """Annotate a URL corpus with robots compliance for `agent`:
    adds ``allowed`` (boolean), ``matched_rule``, ``matched_path``.

    Per RFC 9309 the specific agent's groups win outright over ``*``
    when present for that host; longest rule path wins per URL, Allow
    breaks ties. URLs with no applicable rule are allowed."""
    a = agent.lower()
    spec = F.when(F.col("agent") == a, F.lit(1)).otherwise(F.lit(0))
    scoped = (
        rules.filter(F.col("agent").isin(a, "*"))
        .withColumn("_spec", spec)
        .withColumn("_best", F.max("_spec").over(Window.partitionBy(host)))
        .filter(F.col("_spec") == F.col("_best"))
        .select(
            host,
            "rule",
            "path",
            "line_no",
            robots_like_pattern("path").alias("_pat"),
            F.length("path").alias("_plen"),
        )
    )
    scoped = scoped.withColumnsRenamed(
        {"path": "_rpath", host: "_rhost"}
    )
    if broadcast:
        scoped = F.broadcast(scoped)
    u = urls.withColumn("_uid", F.monotonically_increasing_id())
    j = u.join(
        scoped,
        on=(F.col(host) == F.col("_rhost"))
        & F.expr(f"`{path}` LIKE _pat ESCAPE '\\\\'"),
        how="left",
    ).drop("_rhost")
    w = Window.partitionBy("_uid").orderBy(
        F.col("_plen").desc(),
        F.when(F.col("rule") == "allow", 0).otherwise(1).asc(),
        F.col("line_no").asc(),
    )
    best = (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pat", "_plen", "_spec", "_best", "_uid")
    )
    return (
        best.withColumn(
            "allowed",
            (F.col("rule").isNull() | (F.col("rule") == "allow")).cast(
                "boolean"
            ),
        )
        .withColumnRenamed("rule", "matched_rule")
        .withColumnRenamed("_rpath", "matched_path")
        .drop("line_no")
    )


__all__ = [
    "parse_robots",
    "robots_filter",
    "robots_like_pattern",
    "sitemap_urls",
]


# ---------------------------------------------------------------------------
# Sitemaps (sitemaps.org XML) — crawl discovery, the flip side of robots
# ---------------------------------------------------------------------------

_URL_BLOCK_RX = r"(?is)<url\s*>(.*?)</url\s*>"
_SITEMAP_BLOCK_RX = r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"


def _xml_field(block: Column, tag: str) -> Column:
    return F.trim(
        F.regexp_extract(block, rf"(?is)<{tag}[^>]*>(.*?)</{tag}\s*>", 1)
    )


def sitemap_urls(
    df: DataFrame, field: str = "sitemap_xml", entry_no: str = "entry_no"
) -> DataFrame:
    """sitemaps.org parsing: one row per ``<url>`` entry (or per child
    ``<sitemap>`` of an index file) with loc / lastmod / changefreq /
    priority and ``is_index``. Regex-based on purpose — the sitemap
    subset of XML is flat and RE2-safe, so the parse replays on any
    engine and never needs a DOM (the xml filter's xpath route exists
    for documents that do). ONE posexplode per file, zero shuffle.

    lastmod stays a raw string (sitemaps mix date-only and full
    ISO-8601); feed it to the `date` op for typed parsing. priority is
    parsed to double when present (try_cast keeps junk null)."""
    urls = F.regexp_extract_all(F.col(field), F.lit(_URL_BLOCK_RX), 1)
    subs = F.regexp_extract_all(F.col(field), F.lit(_SITEMAP_BLOCK_RX), 1)
    is_index = F.size(urls) == 0
    blocks = F.when(is_index, subs).otherwise(urls)
    out = df.select(
        *[c for c in df.columns if c != field],
        is_index.alias("is_index"),
        F.posexplode(blocks).alias(entry_no, "_b"),
    )
    b = F.col("_b")
    return out.select(
        *[c for c in out.columns if c != "_b"],
        _xml_field(b, "loc").alias("loc"),
        _xml_field(b, "lastmod").alias("lastmod"),
        _xml_field(b, "changefreq").alias("changefreq"),
        _xml_field(b, "priority").try_cast("double").alias("priority"),
    )
