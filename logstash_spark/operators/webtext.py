"""Web-corpus text extraction: HTML → visible text, and mojibake repair.

The step every web-scale training pipeline runs before any quality /
dedup operator: raw crawl payloads are markup, not text (trafilatura /
resiliparse / jusText fill this slot in CommonCrawl pipelines; the
reference stack's analog is the logstash `xml` filter + mutate gsub
chains users hand-roll for HTML, reference logstash-filter-xml §filter +
grok/gsub recipes).

Scale design — both operators are PURE column algebra:

* zero shuffle, zero UDF, whole-stage codegen end to end. The extract
  chain is a fixed sequence of `regexp_replace`/`replace` calls, so at
  100 TB it fuses into the scan stage like any map-only filter; filters
  and projections still push down past it.
* every step is expressible in both Java regex and RE2 (no lookaround,
  no backreferences), which is what makes the DuckDB oracle gate — and
  any cross-engine replay — bit-exact. `markup_ratio_bp` is integer
  basis points (floor div), not a float, for the same reason.

What the extractor is NOT: a browser. It is the deterministic 95% —
script/style/comment removal, block-tag line breaks, tag strip, the
high-frequency entity set, whitespace normalization. A DOM-accurate
extraction (tables, rendered CSS visibility) is documented as a
mapInPandas escape hatch, same seam as `binary_meta_decode`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HTML → text
# ---------------------------------------------------------------------------

#: invisible containers removed wholesale (content AND tags). RE2 has no
#: backreferences, so each close tag is spelled out instead of \1.
_INVISIBLE_RX = (
    r"(?is)<script\b[^>]*>.*?</script\s*>"
    r"|<style\b[^>]*>.*?</style\s*>"
    r"|<noscript\b[^>]*>.*?</noscript\s*>"
    r"|<template\b[^>]*>.*?</template\s*>"
)
_COMMENT_RX = r"(?s)<!--.*?-->"
_DECL_RX = r"(?is)<!doctype\b[^>]*>|<\?[^>]*>"

#: open or close of a block-level element becomes a line break, so the
#: extracted text keeps line structure for `line_quality_rules` /
#: `c4_line_filter` downstream.
_BLOCK_RX = (
    r"(?i)</?(p|div|br|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|table"
    r"|thead|tbody|blockquote|pre|section|article|header|footer|nav"
    r"|form|figure|figcaption|hr|title)\b[^>]*>"
)
_TAG_RX = r"(?s)</?[a-zA-Z][^>]*>"

#: the high-frequency entity set, decoded as literal replaces IN ORDER —
#: `&amp;` last, so `&amp;lt;` correctly becomes the text `&lt;` and
#: stops (standard single-pass decode).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&#8217;", "’"),
    ("&#8216;", "‘"),
    ("&#8220;", "“"),
    ("&#8221;", "”"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&amp;", "&"),
)

#: whitespace normalization: horizontal runs → one space, trim around
#: line breaks, ≥3 breaks → paragraph break, strip edge breaks (plain
#: trim() only eats spaces in both engines). Applied in this order.
_WS_STEPS: tuple[tuple[str, str], ...] = (
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    (r"^\n+|\n+$", ""),
)


def _chain_replace(col: Column, pairs) -> Column:
    for search, rep in pairs:
        col = F.replace(col, F.lit(search), F.lit(rep))
    return col


def strip_invisible(col: Column | str) -> Column:
    """Remove script/style/noscript/template blocks, comments, decls."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _INVISIBLE_RX, "")
    c = F.regexp_replace(c, _COMMENT_RX, "")
    return F.regexp_replace(c, _DECL_RX, "")


def decode_entities(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _chain_replace(c, HTML_ENTITIES)


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML payload (see module docstring for scope).

    Chain: strip invisible blocks → block tags to line breaks → strip
    remaining tags → decode entities → normalize whitespace → trim.
    """
    c = strip_invisible(col)
    c = F.regexp_replace(c, _BLOCK_RX, "\n")
    c = F.regexp_replace(c, _TAG_RX, "")
    c = decode_entities(c)
    for pat, rep in _WS_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


_TITLE_RX = r"(?is)<title[^>]*>(.*?)</title\s*>"


def extract_title(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(decode_entities(F.regexp_extract(c, _TITLE_RX, 1)))


def extract_links(col: Column | str) -> Column:
    """href values of double-quoted anchors, document order."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r'(?i)<a\b[^>]*\bhref="([^"]*)"'), 1)


def markup_ratio_bp(html: Column | str, text: Column | str) -> Column:
    """Markup overhead in integer basis points: (|html|−|text|)·10000 div
    |html|. All terms non-negative int64, so Spark `div` ≡ DuckDB `//`
    (same discipline as operators/cluster.py) — no float rounding to
    disagree across engines."""
    h = F.length(F.col(html) if isinstance(html, str) else html).cast("long")
    t = F.length(F.col(text) if isinstance(text, str) else text).cast("long")
    num = (h - t) * F.lit(10000).cast("long")
    den = F.greatest(h, F.lit(1).cast("long"))
    # exact int division: subtract the (int64-exact) remainder first, so
    # the one double division is of a multiple of den — its result is an
    # integer below 2^53, represented exactly.
    return ((num - F.pmod(num, den)) / den).cast("long")


def html_extract(
    df: DataFrame,
    field: str = "html",
    target: str = "text",
    title: str | None = "title",
    links: str | None = "links",
    ratio: str | None = "markup_bp",
) -> DataFrame:
    """Operator form: adds visible-text / title / links / markup-ratio
    columns. Map-only; Catalyst prunes any output column downstream
    plans don't use, so asking for all four costs nothing extra when a
    query keeps only `target`."""
    out = df.withColumn(target, html_to_text(field))
    if title:
        out = out.withColumn(title, extract_title(field))
    if links:
        out = out.withColumn(links, extract_links(field))
    if ratio:
        out = out.withColumn(ratio, markup_ratio_bp(field, target))
    return out


# ---------------------------------------------------------------------------
# Mojibake (UTF-8 read as cp1252) detection + repair
# ---------------------------------------------------------------------------

#: code points whose UTF-8 encodings are repaired. Two families:
#:   3-byte E2 80 XX punctuation → "â€?" sequences,
#:   2-byte C3 XX Latin letters → "Ã?" sequences,
#:   2-byte C2 XX punctuation   → "Â?" sequences (handled generically).
#: The table is GENERATED (char → char.encode('utf-8').decode('cp1252'))
#: so the mapping cannot drift from the real byte algebra. Longest
#: sequences first: every 3-byte form starts with 'â' (U+00E2), every
#: 2-byte form with 'Ã'/'Â', so the families never overlap.
_MOJIBAKE_CHARS = (
    "’‘“”–—…•™€"  # ’‘“”–—…•™€
    "éèêëáàâäãå"  # éèêëáàâäãå
    "íìîïóòôöõú"  # íìîïóòôöõú
    "ùûüñçßæø"              # ùûüñçßæø
    "ÉÄÖÜÇ"                                # ÉÄÖÜÇ
)


def _mojibake_table() -> tuple[tuple[str, str], ...]:
    pairs = []
    for ch in _MOJIBAKE_CHARS:
        try:
            bad = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            # UTF-8 bytes 0x81/0x8D/0x8F/0x90/0x9D have no cp1252
            # mapping; lenient decoders pass them through as C1
            # controls — mirror that so e.g. ” (E2 80 9D) repairs.
            bad = "".join(
                bytes([b]).decode("cp1252", "ignore") or chr(b)
                for b in ch.encode("utf-8")
            )
        pairs.append((bad, ch))
    # longest first so 3-byte sequences never lose to a 2-byte prefix
    pairs.sort(key=lambda p: -len(p[0]))
    return tuple(pairs)


MOJIBAKE_PAIRS: tuple[tuple[str, str], ...] = _mojibake_table()

#: detector: any repairable sequence, plus the generic Â+punct artifact
#: (C2 A0..BF read as cp1252 = 'Â' followed by the intended char itself,
#: so the repair is just dropping the 'Â'; C2 80..9F are C1 controls,
#: too rare to special-case).
_MOJIBAKE_A_RX = "Â([\u00a0-\u00bf])"
_SUSPECT_RX = (
    "(" + "|".join(bad for bad, _ in MOJIBAKE_PAIRS)
    + "|Â[\u00a0-\u00bf])"
)


def mojibake_count(col: Column | str) -> Column:
    """Number of suspicious byte-salad sequences in the text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(_SUSPECT_RX)).cast("long")


def fix_mojibake(col: Column | str) -> Column:
    """Repair UTF-8-read-as-cp1252 text: literal replaces for the
    punctuation + Western-letter families (generated table), then the
    generic `Â + A0..BF` artifact (C2-prefix family) via one capture
    regex. Clean text is untouched — the mojibake sequences do not occur
    in well-formed prose (unit-pinned); for surgical use gate on
    `mojibake_count(col) > 0`."""
    c = F.col(col) if isinstance(col, str) else col
    c = _chain_replace(c, MOJIBAKE_PAIRS)
    return F.regexp_replace(c, _MOJIBAKE_A_RX, r"$1")


# ---------------------------------------------------------------------------
# DuckDB renderings — generated from the SAME constants as the Spark
# side, so the oracle chain cannot drift from the operator chain.
# ---------------------------------------------------------------------------


def _sq(s: str) -> str:
    """Single-quote-escape for a DuckDB string literal. Standard-quoted
    literals keep backslashes verbatim, so regexes cross unmodified."""
    return s.replace("'", "''")


def _sql_regexp_chain(expr: str, steps) -> str:
    for pat, rep in steps:
        rp = "chr(10)" if rep == "\n" else f"'{_sq(rep)}'"
        expr = f"regexp_replace({expr}, '{_sq(pat)}', {rp}, 'g')"
    return expr


def _sql_replace_chain(expr: str, pairs) -> str:
    for search, rep in pairs:
        expr = f"replace({expr}, '{_sq(search)}', '{_sq(rep)}')"
    return expr


def entities_sql(expr: str) -> str:
    return _sql_replace_chain(expr, HTML_ENTITIES)


def html_to_text_sql(expr: str) -> str:
    """DuckDB expression replaying `html_to_text(expr)` exactly."""
    e = _sql_regexp_chain(
        expr,
        [
            (_INVISIBLE_RX, ""),
            (_COMMENT_RX, ""),
            (_DECL_RX, ""),
            (_BLOCK_RX, "\n"),
            (_TAG_RX, ""),
        ],
    )
    e = entities_sql(e)
    e = _sql_regexp_chain(e, _WS_STEPS)
    return f"trim({e})"


def extract_title_sql(expr: str) -> str:
    inner = f"regexp_extract({expr}, '{_sq(_TITLE_RX)}', 1)"
    return f"trim({entities_sql(inner)})"


def fix_mojibake_sql(expr: str) -> str:
    """DuckDB expression replaying `fix_mojibake(expr)` exactly (RE2
    rewrite syntax uses \\1 where Java uses $1)."""
    e = _sql_replace_chain(expr, MOJIBAKE_PAIRS)
    return f"regexp_replace({e}, '{_sq(_MOJIBAKE_A_RX)}', '\\1', 'g')"


def mojibake_count_sql(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, '{_sq(_SUSPECT_RX)}')) AS BIGINT)"
    )


__all__ = [
    "HTML_ENTITIES",
    "MOJIBAKE_PAIRS",
    "decode_entities",
    "entities_sql",
    "extract_links",
    "extract_title",
    "extract_title_sql",
    "fix_mojibake",
    "fix_mojibake_sql",
    "html_extract",
    "html_to_text",
    "html_to_text_sql",
    "markup_ratio_bp",
    "mojibake_count",
    "mojibake_count_sql",
    "strip_invisible",
]


# ---------------------------------------------------------------------------
# Page-level metadata: robots directives, canonical URL, declared lang
# ---------------------------------------------------------------------------

#: attribute order in real pages varies; each extractor tries both
#: (name-then-content and content-then-name) since RE2 has no lookahead.
_META_ROBOTS_RX_1 = (
    r'(?is)<meta\b[^>]*\bname\s*=\s*"robots"[^>]*\bcontent\s*=\s*"([^"]*)"'
)
_META_ROBOTS_RX_2 = (
    r'(?is)<meta\b[^>]*\bcontent\s*=\s*"([^"]*)"[^>]*\bname\s*=\s*"robots"'
)
_CANONICAL_RX_1 = (
    r'(?is)<link\b[^>]*\brel\s*=\s*"canonical"[^>]*\bhref\s*=\s*"([^"]*)"'
)
_CANONICAL_RX_2 = (
    r'(?is)<link\b[^>]*\bhref\s*=\s*"([^"]*)"[^>]*\brel\s*=\s*"canonical"'
)
_HTML_LANG_RX = r'(?is)<html\b[^>]*\blang\s*=\s*"([^"]*)"'


def _first_of(c: Column, rx1: str, rx2: str) -> Column:
    a = F.regexp_extract(c, rx1, 1)
    return F.when(a != "", a).otherwise(F.regexp_extract(c, rx2, 1))


def meta_robots(col: Column | str) -> Column:
    """content of <meta name="robots"> (lowercased), '' when absent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(_first_of(c, _META_ROBOTS_RX_1, _META_ROBOTS_RX_2))


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _first_of(c, _CANONICAL_RX_1, _CANONICAL_RX_2)


def declared_lang(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _HTML_LANG_RX, 1))


def html_meta(df: DataFrame, field: str = "html") -> DataFrame:
    """Page-policy metadata a crawl pipeline filters on BEFORE spending
    any further compute: `noindex` / `nofollow` flags (a corpus that
    honors opt-outs drops noindex pages here), the canonical URL (the
    cheap pre-dedup key: pages sharing rel=canonical are declared dups
    by the site itself), and the declared document language (cheap prior
    for `lang_id` disagreement scoring). Pure column algebra — zero
    shuffle, zero UDF."""
    robots = meta_robots(field)
    return df.withColumns(
        {
            "meta_robots": robots,
            "noindex": robots.contains("noindex").cast("boolean"),
            "nofollow": robots.contains("nofollow").cast("boolean"),
            "canonical_url": canonical_url(field),
            "declared_lang": declared_lang(field),
        }
    )


def meta_robots_sql(expr: str) -> str:
    a = f"regexp_extract({expr}, '{_sq(_META_ROBOTS_RX_1)}', 1)"
    b = f"regexp_extract({expr}, '{_sq(_META_ROBOTS_RX_2)}', 1)"
    return f"lower(CASE WHEN {a} != '' THEN {a} ELSE {b} END)"


def canonical_url_sql(expr: str) -> str:
    a = f"regexp_extract({expr}, '{_sq(_CANONICAL_RX_1)}', 1)"
    b = f"regexp_extract({expr}, '{_sq(_CANONICAL_RX_2)}', 1)"
    return f"CASE WHEN {a} != '' THEN {a} ELSE {b} END"


def declared_lang_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{_sq(_HTML_LANG_RX)}', 1))"


# ---------------------------------------------------------------------------
# Anchor text: the inter-document description signal
# ---------------------------------------------------------------------------

_ANCHOR_RX = r'(?is)<a\b[^>]*\bhref="([^"]*)"[^>]*>(.*?)</a\s*>'


def extract_anchors(col: Column | str) -> Column:
    """array<struct<href,text>> of double-quoted anchors, document
    order. Both fields come from the SAME regex (groups 1 and 2), so
    the two extract_all lists are aligned by construction and zip
    losslessly; anchor text is tag-stripped and whitespace-normalized
    (an anchor wrapping <b>bold</b> keeps its words)."""
    c = F.col(col) if isinstance(col, str) else col
    hrefs = F.regexp_extract_all(c, F.lit(_ANCHOR_RX), 1)
    texts = F.transform(
        F.regexp_extract_all(c, F.lit(_ANCHOR_RX), 2),
        lambda t: F.trim(
            F.regexp_replace(
                F.regexp_replace(t, _TAG_RX, ""), r"\s+", " "
            )
        ),
    )
    return F.arrays_zip(hrefs.alias("href"), texts.alias("text"))


def anchor_stats(
    pages: DataFrame, field: str = "html", source: str | None = None
) -> DataFrame:
    """Per-target anchor census over a page corpus: how often each href
    is linked (`n_refs`) and its most common anchor text (`top_text`,
    ties broken lexicographically) — the classic web signal: anchor
    text is how OTHER documents describe a target (retrieval boosts,
    quality priors), in-link count is a cheap authority proxy feeding
    `graph.pagerank`.

    Shape: one explode (∝ total anchors — link tuples, never page
    payloads) → groupBy(href, text) with map-side partials → one window
    on href for the total and the top-1. The (href, text) exchange is
    reused by the window (same leading key), so the whole census costs
    ONE real shuffle of (href, text, count) rows."""
    a = pages.select(F.explode(extract_anchors(field)).alias("an"))
    pairs = a.select(F.col("an.href").alias("href"), F.col("an.text").alias("text"))
    counted = pairs.groupBy("href", "text").agg(
        F.count("*").cast("long").alias("cnt")
    )
    from pyspark.sql.window import Window

    wh = Window.partitionBy("href")
    rank = Window.partitionBy("href").orderBy(
        F.col("cnt").desc(), F.col("text").asc()
    )
    return (
        counted.withColumn("n_refs", F.sum("cnt").over(wh))
        .withColumn("_rn", F.row_number().over(rank))
        .filter(F.col("_rn") == 1)
        .select("href", "n_refs", F.col("text").alias("top_text"))
    )


# ---------------------------------------------------------------------------
# Unicode text cleanup (the corpus normalizer)
# ---------------------------------------------------------------------------

#: Exotic line separators -> \n. Applied FIRST so VT/FF survive as
#: structure instead of being dropped with the other controls.
#: (NEL U+0085, LS U+2028, PS U+2029 as literal chars; VT/FF via \x
#: escapes -- two-digit \xhh parses identically in Java regex and RE2.)
_CLEAN_NL_RX = "[\\x0b\\x0c\u0085\u2028\u2029]"

#: Dropped outright: C0 controls except \t\n (VT/FF already converted),
#: DEL, zero-width space/non-joiner/joiner, word joiner, BOM/ZWNBSP,
#: soft hyphen. The classic invisible-junk set that breaks exact dedup,
#: token counting, and downstream regexes.
_CLEAN_DROP_RX = (
    "[\\x00-\\x08\\x0e-\\x1f\\x7f"
    "\u200b\u200c\u200d\u2060\ufeff\u00ad]"
)

#: Unicode space variants -> ASCII space: NBSP, OGHAM SPACE MARK, EN
#: QUAD..HAIR SPACE (U+2000-200A as a literal-char range), NNBSP, MMSP,
#: IDEOGRAPHIC SPACE.
_CLEAN_SPACE_RX = "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]"

#: Typographic punctuation -> ASCII canonical forms (literal replaces,
#: order-free). The quote/dash folding CCNet-family pipelines apply
#: before hashing, so smart-quote re-renderings of the same sentence
#: dedup together.
CLEAN_PUNCT: tuple[tuple[str, str], ...] = (
    ("\u2018", "'"), ("\u2019", "'"), ("\u201a", "'"), ("\u201b", "'"),
    ("\u2039", "'"), ("\u203a", "'"),
    ("\u201c", '"'), ("\u201d", '"'), ("\u201e", '"'), ("\u201f", '"'),
    ("\u00ab", '"'), ("\u00bb", '"'),
    ("\u2010", "-"), ("\u2011", "-"), ("\u2012", "-"), ("\u2013", "-"),
    ("\u2014", "-"), ("\u2015", "-"), ("\u2212", "-"),
    ("\u2026", "..."),
)

#: Whitespace collapse, applied LAST (all exotic spaces are ASCII by
#: now, so plain ASCII classes are exact in both engines).
_CLEAN_COLLAPSE_STEPS: tuple[tuple[str, str], ...] = (
    ("[ \\t]+", " "),
    (" ?\\n ?", "\n"),
    ("\\n{3,}", "\n\n"),
    ("^[ \\n]+|[ \\n]+$", ""),
)


def clean_text(col: Column | str, *, collapse: bool = True) -> Column:
    """Unicode text cleanup -- the normalizer every web-corpus pipeline
    runs between extraction and quality/dedup (CCNet/C4/Dolma all ship
    one; the reference stack's analog is the mutate-gsub chains users
    hand-roll, reference logstash-filter-mutate §gsub):

    1. exotic line separators (NEL/LS/PS/VT/FF) and CRLF/CR -> ``\\n``;
    2. C0 controls (except tab/newline), DEL, zero-width characters,
       BOM, soft hyphen -> dropped;
    3. Unicode space variants (NBSP .. IDEOGRAPHIC SPACE) -> ASCII space;
    4. curly quotes/guillemets -> ``'``/``"``, the dash family -> ``-``,
       ellipsis -> ``...``;
    5. (``collapse=True``) horizontal runs -> one space, spaces trimmed
       around line breaks, >=3 breaks -> paragraph break, edges stripped.

    Pure fixed-chain column algebra: zero shuffle, zero UDF, fuses into
    the scan at 100 TB. Every pattern is RE2+Java-common (literal chars
    / two-digit ``\\x`` escapes only), so `clean_text_sql` replays it
    bit-for-bit in the DuckDB oracle -- which is exactly the property
    that makes the cleaned text safe to HASH for dedup.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = _chain_replace(c, (("\r\n", "\n"), ("\r", "\n")))
    c = F.regexp_replace(c, _CLEAN_NL_RX, "\n")
    c = F.regexp_replace(c, _CLEAN_DROP_RX, "")
    c = F.regexp_replace(c, _CLEAN_SPACE_RX, " ")
    c = _chain_replace(c, CLEAN_PUNCT)
    if collapse:
        for pat, rep in _CLEAN_COLLAPSE_STEPS:
            c = F.regexp_replace(c, pat, rep)
    return c


def clean_text_sql(expr: str, *, collapse: bool = True) -> str:
    """DuckDB expression replaying `clean_text(expr)` exactly."""
    e = _sql_replace_chain(expr, (("\r\n", "\n"), ("\r", "\n")))
    e = _sql_regexp_chain(
        e,
        [
            (_CLEAN_NL_RX, "\n"),
            (_CLEAN_DROP_RX, ""),
            (_CLEAN_SPACE_RX, " "),
        ],
    )
    e = _sql_replace_chain(e, CLEAN_PUNCT)
    if collapse:
        e = _sql_regexp_chain(e, _CLEAN_COLLAPSE_STEPS)
    return e
