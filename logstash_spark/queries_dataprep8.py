"""Registry gates for `operators/webtext.py` — HTML→text extraction and
mojibake repair, the raw-crawl cleanup stage of a web-scale pipeline.

Both gates synthesize their dirty input deterministically from the
`documents` table ON BOTH ENGINES (same concatenation of the same
literals), then the Spark side runs the operator while the oracle
replays the module's own SQL rendering (`html_to_text_sql` /
`fix_mojibake_sql` — generated from the same constant tables, so the
chains cannot drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators import webtext as W
from logstash_spark.queries import query

# ---------------------------------------------------------------------------
# HTML → text
# ---------------------------------------------------------------------------

# Deterministic page build: title (with an entity), invisible
# style/script (script body contains tag-lookalikes), a comment, block
# structure, entities in text, single- and double-quoted anchors (only
# double-quoted ones count as links), and a third link on every 3rd doc.
_H1 = (
    '<!DOCTYPE html><html><head><title>Doc '
)
_H2 = (
    " &amp; co</title><style>p{color:red}</style>"
    '<script type="text/javascript">var a = "<p>not text</p>";</script>'
    "</head><body><!-- hidden --><h1>"
)
_H3 = "</h1><p>"
_H4 = (
    ' &lt;tag&gt;&nbsp;tail</p><div><a href="https://ex.com/'
)
_H5 = '">one</a> <a href=\'skip.html\'>s</a> <a href="/p/'
_H6 = '.html">two</a></div><ul><li>item '
_H7 = "</li><li>other</li></ul><table><tr><td>cell</td></tr></table>"
_H8 = '<a href="extra.htm">three</a>'
_H9 = "<br><br><br>fin</body></html>"


def _html_spark(doc_id, lang, text) -> F.Column:
    return F.concat(
        F.lit(_H1), doc_id.cast("string"), F.lit(_H2), F.upper(lang),
        F.lit(_H3), F.substring(text, 1, 120), F.lit(_H4),
        doc_id.cast("string"), F.lit(_H5), (doc_id % 7).cast("string"),
        F.lit(_H6), (doc_id % 5).cast("string"), F.lit(_H7),
        F.when(doc_id % 3 == 0, F.lit(_H8)).otherwise(F.lit("")),
        F.lit(_H9),
    )


_HTML_SQL = (
    "SELECT doc_id, "
    f"'{W._sq(_H1)}' || CAST(doc_id AS VARCHAR) || '{W._sq(_H2)}' || upper(lang) || "
    f"'{W._sq(_H3)}' || substr(text, 1, 120) || '{W._sq(_H4)}' || "
    f"CAST(doc_id AS VARCHAR) || '{W._sq(_H5)}' || CAST(doc_id % 7 AS VARCHAR) || "
    f"'{W._sq(_H6)}' || CAST(doc_id % 5 AS VARCHAR) || '{W._sq(_H7)}' || "
    f"CASE WHEN doc_id % 3 = 0 THEN '{W._sq(_H8)}' ELSE '' END || "
    f"'{W._sq(_H9)}' AS html "
    "FROM documents"
)

_LINKS_RX_SQL = W._sq(r'(?i)<a\b[^>]*\bhref="([^"]*)"')


@query(
    "html_text_extract",
    f"""
    WITH pages AS ({_HTML_SQL})
    SELECT doc_id,
           {W.extract_title_sql('html')} AS title,
           CAST(len(regexp_extract_all(html, '{_LINKS_RX_SQL}', 1)) AS INT)
             AS n_links,
           (length(html) - length({W.html_to_text_sql('html')})) * 10000
             // greatest(length(html), 1) AS markup_bp,
           CAST(len(string_split({W.html_to_text_sql('html')}, chr(10)))
             AS INT) AS n_lines,
           md5({W.html_to_text_sql('html')}) AS text_md5
    FROM pages
    """,
)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-crawl HTML → visible text (`webtext.html_extract`): pages are
    synthesized per document (markup, entities, invisible script/style,
    quoted-tag traps, varying link counts), then extracted. Title, link
    count, integer markup ratio, line count and the md5 of the full
    extracted text must replay bit-for-bit in DuckDB. Zero shuffle —
    the whole chain is codegen'd column algebra over the scan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        "doc_id",
        _html_spark(F.col("doc_id"), F.col("lang"), F.col("text")).alias("html"),
    )
    out = W.html_extract(pages, "html")
    return out.select(
        "doc_id",
        "title",
        F.size("links").cast("int").alias("n_links"),
        F.col("markup_bp"),
        F.size(F.split("text", "\n", -1)).cast("int").alias("n_lines"),
        F.md5("text").alias("text_md5"),
    )


# ---------------------------------------------------------------------------
# Mojibake repair
# ---------------------------------------------------------------------------

# Clean fragments and their UTF-8-read-as-cp1252 corruptions. The
# corrupt form is computed ONCE here with a single-pass regex (sequential
# replacement would cascade: corrupting ’ yields â€™ whose € would then
# corrupt again), and both engines splice the corrupt LITERAL into the
# row text — no replacement happens at query time.
_CLEAN_FRAGS = (
    "It’s fine",
    "a “café” story",
    "naïve — reading…",
    "«über» façade",
    "€50 bid ™ mark",
    "señora’s piñata",
)


def _corrupt(s: str) -> str:
    import re

    table = dict(W.MOJIBAKE_PAIRS)
    inv = {ch: bad for bad, ch in W.MOJIBAKE_PAIRS}
    for ch in "«»":  # Â-family examples (C2 A0..BF)
        inv[ch] = "Â" + ch
    rx = re.compile("|".join(re.escape(c) for c in sorted(inv, key=len, reverse=True)))
    out = rx.sub(lambda m: inv[m.group(0)], s)
    assert all(bad not in s for bad in table), "clean frag already dirty"
    return out


_DIRTY_FRAGS = tuple(_corrupt(s) for s in _CLEAN_FRAGS)
_NF = len(_CLEAN_FRAGS)


def _frag_array_sql(frags) -> str:
    return "[" + ", ".join(f"'{W._sq(s)}'" for s in frags) + "]"


@query(
    "mojibake_fix",
    f"""
    WITH corrupted AS (
      SELECT doc_id,
             substr(text, 1, 60) || ' '
               || ({_frag_array_sql(_DIRTY_FRAGS)})[CAST(doc_id % {_NF} AS INT) + 1]
               || ' end' AS t,
             substr(text, 1, 60) || ' '
               || ({_frag_array_sql(_CLEAN_FRAGS)})[CAST(doc_id % {_NF} AS INT) + 1]
               || ' end' AS clean
      FROM documents
    )
    SELECT doc_id,
           {W.mojibake_count_sql('t')} AS n_suspects,
           md5({W.fix_mojibake_sql('t')}) AS fixed_md5,
           CASE WHEN md5({W.fix_mojibake_sql('t')}) = md5(clean)
                THEN 1 ELSE 0 END AS repaired_ok
    FROM corrupted
    """,
)
def mojibake_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair gate (`webtext.fix_mojibake`): every document gets
    a deterministically chosen corrupted fragment spliced in (UTF-8 read
    as cp1252 — the single most common crawl encoding defect); the op
    must detect (`mojibake_count`) and repair it such that the fixed
    text md5-matches the never-corrupted ground truth the oracle builds
    independently. `repaired_ok` is asserted to be 1 for every row by
    construction on BOTH engines. Zero shuffle, pure column algebra."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = (F.col("doc_id") % _NF).cast("int") + 1
    dirty = F.element_at(F.array(*[F.lit(s) for s in _DIRTY_FRAGS]), idx)
    clean = F.element_at(F.array(*[F.lit(s) for s in _CLEAN_FRAGS]), idx)
    base = F.concat(F.substring("text", 1, 60), F.lit(" "))
    rows = docs.select(
        "doc_id",
        F.concat(base, dirty, F.lit(" end")).alias("t"),
        F.concat(base, clean, F.lit(" end")).alias("clean"),
    )
    fixed = W.fix_mojibake("t")
    return rows.select(
        "doc_id",
        W.mojibake_count("t").alias("n_suspects"),
        F.md5(fixed).alias("fixed_md5"),
        F.when(F.md5(fixed) == F.md5("clean"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("repaired_ok"),
    )


# ---------------------------------------------------------------------------
# WARC ingestion (operators/codec.py warc_decode)
# ---------------------------------------------------------------------------

# One synthetic WARC file per document: warcinfo + request + response
# (HTTP payload whose body is a text slice; every 5th doc is a 404).
# The blob is a shared segment template rendered into BOTH engines, so
# the input bytes are identical by construction.
_WARC_DATE = "2026-01-17T12:34:56Z"
_WARC_SEGS = (
    ("lit",
     "WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: " + _WARC_DATE
     + "\r\nContent-Type: application/warc-fields\r\nContent-Length: 18"
     + "\r\n\r\nsoftware: graft/1\n\r\n\r\n"
     + "WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://ex.com/doc/"),
    ("id",),
    ("lit",
     "\r\nWARC-Date: " + _WARC_DATE
     + "\r\nContent-Type: application/http;msgtype=request"
     + "\r\n\r\nGET /doc HTTP/1.1\r\nHost: ex.com\r\n\r\n\r\n\r\n"
     + "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://ex.com/doc/"),
    ("id",),
    ("lit", "\r\nWARC-Date: " + _WARC_DATE + "\r\nWARC-Record-ID: <urn:uuid:"),
    ("id",),
    ("lit",
     ">\r\nContent-Type: application/http;msgtype=response"
     + "\r\nContent-Length: "),
    ("len",),
    ("lit", "\r\n\r\nHTTP/1.1 "),
    ("status",),
    ("lit", "\r\nContent-Type: text/plain\r\n\r\n"),
    ("body",),
    ("lit", "\r\n\r\n"),
)


def _warc_blob_spark(doc_id, body) -> F.Column:
    parts = []
    status = F.when(doc_id % 5 == 0, F.lit("404 Not Found")).otherwise(
        F.lit("200 OK")
    )
    for seg in _WARC_SEGS:
        if seg[0] == "lit":
            parts.append(F.lit(seg[1]))
        elif seg[0] == "id":
            parts.append(doc_id.cast("string"))
        elif seg[0] == "len":
            parts.append(F.length(body).cast("string"))
        elif seg[0] == "status":
            parts.append(status)
        elif seg[0] == "body":
            parts.append(body)
    return F.concat(*parts)


def _warc_blob_sql() -> str:
    status = "CASE WHEN doc_id % 5 = 0 THEN '404 Not Found' ELSE '200 OK' END"
    body = "substr(text, 1, 50)"
    parts = []
    for seg in _WARC_SEGS:
        if seg[0] == "lit":
            parts.append(f"'{W._sq(seg[1])}'")
        elif seg[0] == "id":
            parts.append("CAST(doc_id AS VARCHAR)")
        elif seg[0] == "len":
            parts.append(f"CAST(length({body}) AS VARCHAR)")
        elif seg[0] == "status":
            parts.append(status)
        elif seg[0] == "body":
            parts.append(body)
    return " || ".join(parts)


_WARC_BOUNDARY_SQL = W._sq(r"(?m)^WARC/1\.[01]\r?\n")
_WARC_HDR_STRIP_SQL = W._sq(r"(?s)^(.*?)\r?\n\r?\n")
_WARC_TAIL_SQL = W._sq(r"(\r?\n)+$")


def _warc_hdr_sql(name: str) -> str:
    return f"regexp_extract(piece, '(?im)^{name}:[ \\t]*([^\\r\\n]*)', 1)"


@query(
    "warc_ingest",
    f"""
    WITH files AS (
      SELECT doc_id, {_warc_blob_sql()} AS blob FROM documents
    ),
    parts AS (
      SELECT doc_id, string_split_regex(blob, '{_WARC_BOUNDARY_SQL}') AS ps
      FROM files
    ),
    recs AS (
      -- every synthesized file holds exactly 3 records (pieces 2..4;
      -- piece 1 is the empty prefix before the first boundary)
      SELECT doc_id, CAST(gs.i - 1 AS INT) AS record_no, ps[gs.i] AS piece
      FROM parts, generate_series(2, 4) gs(i)
    ),
    parsed AS (
      SELECT doc_id, record_no,
             {_warc_hdr_sql("WARC-Type")} AS warc_type,
             {_warc_hdr_sql("WARC-Target-URI")} AS target_uri,
             {_warc_hdr_sql("WARC-Date")} AS warc_date,
             CAST(NULLIF({_warc_hdr_sql("Content-Length")}, '') AS BIGINT)
               AS content_length,
             regexp_replace(regexp_replace(piece, '{_WARC_HDR_STRIP_SQL}', ''),
                            '{_WARC_TAIL_SQL}', '') AS content
      FROM recs
    )
    SELECT doc_id, record_no, warc_type, target_uri, warc_date,
           content_length,
           CAST(NULLIF(regexp_extract(content, '^HTTP/1\\.[01] (\\d{{3}})', 1),
                       '') AS INT) AS http_status,
           md5(CASE WHEN regexp_matches(content, '^HTTP/1\\.[01] \\d{{3}}')
                    THEN regexp_replace(content, '{_WARC_HDR_STRIP_SQL}', '')
                    ELSE content END) AS payload_md5
    FROM parsed
    """,
)
def warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CommonCrawl-style WARC ingestion gate (`codec.warc_decode`): each
    document becomes a 3-record WARC file (warcinfo, request, response
    with an HTTP payload; every 5th response is a 404). Record
    boundaries, header extraction, declared Content-Length, HTTP status
    and the md5 of each record payload must replay bit-for-bit in
    DuckDB. ONE posexplode per file, zero shuffle."""
    from logstash_spark.operators.codec import warc_decode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    files = docs.select(
        "doc_id",
        _warc_blob_spark(F.col("doc_id"), F.substring("text", 1, 50)).alias(
            "blob"
        ),
    )
    out = warc_decode(files, "blob")
    return out.select(
        "doc_id",
        F.col("record_no").cast("int"),
        "warc_type",
        "target_uri",
        "warc_date",
        "content_length",
        "http_status",
        F.md5("payload").alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# Page-policy metadata (webtext.html_meta)
# ---------------------------------------------------------------------------

# head synthesis: robots meta present on every 2nd doc (noindex on every
# 4th), with ATTRIBUTE ORDER flipped on odd docs; canonical link on docs
# not ≡1 (mod 3), order also flipped; lang attr from the lang column.
_M1 = '<html lang="'
_M2 = '"><head><title>t</title>'
_M_ROBOTS_A = '<meta name="robots" content="'
_M_ROBOTS_B = '<meta content="'
_M_ROBOTS_B2 = '" name="robots">'
_M_CANON_A = '<link rel="canonical" href="https://ex.com/c/'
_M_CANON_B = '<link href="https://ex.com/c/'
_M_CANON_B2 = '" rel="canonical">'
_M_TAIL = '</head><body><p>x</p></body></html>'


def _meta_page_spark(doc_id, lang) -> F.Column:
    robots_val = F.when(doc_id % 4 == 0, F.lit("noindex, nofollow")).otherwise(
        F.lit("index, follow")
    )
    robots = F.when(
        doc_id % 2 == 0, F.concat(F.lit(_M_ROBOTS_A), robots_val, F.lit('">'))
    ).otherwise(F.concat(F.lit(_M_ROBOTS_B), robots_val, F.lit(_M_ROBOTS_B2)))
    canon = (
        F.when(doc_id % 3 == 1, F.lit(""))
        .when(
            doc_id % 2 == 0,
            F.concat(F.lit(_M_CANON_A), doc_id.cast("string"), F.lit('">')),
        )
        .otherwise(
            F.concat(
                F.lit(_M_CANON_B), doc_id.cast("string"), F.lit(_M_CANON_B2)
            )
        )
    )
    return F.concat(
        F.lit(_M1), F.upper(lang), F.lit(_M2), robots, canon, F.lit(_M_TAIL)
    )


_META_PAGE_SQL = f"""
      SELECT doc_id,
             '{W._sq(_M1)}' || upper(lang) || '{W._sq(_M2)}'
             || CASE WHEN doc_id % 2 = 0
                     THEN '{W._sq(_M_ROBOTS_A)}' ||
                          CASE WHEN doc_id % 4 = 0 THEN 'noindex, nofollow'
                               ELSE 'index, follow' END || '">'
                     ELSE '{W._sq(_M_ROBOTS_B)}' ||
                          CASE WHEN doc_id % 4 = 0 THEN 'noindex, nofollow'
                               ELSE 'index, follow' END || '{W._sq(_M_ROBOTS_B2)}'
                END
             || CASE WHEN doc_id % 3 = 1 THEN ''
                     WHEN doc_id % 2 = 0
                     THEN '{W._sq(_M_CANON_A)}' || CAST(doc_id AS VARCHAR) || '">'
                     ELSE '{W._sq(_M_CANON_B)}' || CAST(doc_id AS VARCHAR)
                          || '{W._sq(_M_CANON_B2)}'
                END
             || '{W._sq(_M_TAIL)}' AS html
      FROM documents
"""


@query(
    "html_meta_policy",
    f"""
    WITH pages AS ({_META_PAGE_SQL})
    SELECT doc_id,
           {W.meta_robots_sql('html')} AS meta_robots,
           CASE WHEN {W.meta_robots_sql('html')} LIKE '%noindex%'
                THEN 1 ELSE 0 END AS noindex,
           {W.canonical_url_sql('html')} AS canonical_url,
           {W.declared_lang_sql('html')} AS declared_lang
    FROM pages
    """,
)
def html_meta_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-policy gate (`webtext.html_meta`): robots directives (both
    attribute orders), canonical URL (the site-declared dedup key) and
    the declared lang attr must extract identically in DuckDB. The
    noindex flag is the opt-out filter a compliant corpus applies before
    spending any further compute. Zero shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        "doc_id",
        _meta_page_spark(F.col("doc_id"), F.col("lang")).alias("html"),
    )
    out = W.html_meta(pages, "html")
    return out.select(
        "doc_id",
        "meta_robots",
        F.col("noindex").cast("int").alias("noindex"),
        "canonical_url",
        "declared_lang",
    )


# ---------------------------------------------------------------------------
# robots.txt compliance (operators/robots.py)
# ---------------------------------------------------------------------------

# 20 synthetic hosts; every 2nd gets a wildcard rule, every 3rd a
# dedicated graftbot group (which must then WIN outright over *), all
# get a $-anchored rule and a stacked two-agent group that must never
# apply to graftbot.
_RB1 = (
    "# policy\nUser-agent: *\nDisallow: /private/\nAllow: /private/ok/\n"
    "Disallow: /exact$\n"
)
_RB2 = "Disallow: /tmp*\n"
_RB3 = "\n"
_RB4 = "User-agent: graftbot\nDisallow: /bot-only/\nAllow: /\n\n"
_RB5 = "User-agent: legacybot\nUser-agent: oldbot\nDisallow: /\n"

_RPATHS = ("/private/p", "/private/ok/p", "/tmp", "/bot-only/p", "/public/p",
           "/exact")


def _robots_blob_spark(hid) -> F.Column:
    return F.concat(
        F.lit(_RB1),
        F.when(hid % 2 == 0, F.lit(_RB2)).otherwise(F.lit("")),
        F.lit(_RB3),
        F.when(hid % 3 == 0, F.lit(_RB4)).otherwise(F.lit("")),
        F.lit(_RB5),
    )


_ROBOTS_BLOB_SQL = (
    f"'{W._sq(_RB1)}'"
    f" || CASE WHEN hid % 2 = 0 THEN '{W._sq(_RB2)}' ELSE '' END"
    f" || '{W._sq(_RB3)}'"
    f" || CASE WHEN hid % 3 = 0 THEN '{W._sq(_RB4)}' ELSE '' END"
    f" || '{W._sq(_RB5)}'"
)

_RPATH_ARR_SQL = "[" + ", ".join(f"'{p}'" for p in _RPATHS) + "]"

_ROBOTS_ORACLE = f"""
    WITH hosts AS (SELECT DISTINCT doc_id % 20 AS hid FROM documents),
    blobs AS (
      SELECT 'h' || CAST(hid AS VARCHAR) AS host,
             string_split({_ROBOTS_BLOB_SQL}, chr(10)) AS ls
      FROM hosts
    ),
    lines AS (
      SELECT host, CAST(gs.i AS INT) AS line_no, ls[gs.i] AS l
      FROM blobs, generate_series(1, 16) gs(i)
      WHERE ls[gs.i] IS NOT NULL
    ),
    keyed AS (
      SELECT host, line_no,
             lower(regexp_extract(trim(regexp_replace(l, '#.*$', '')),
                                  '^([A-Za-z][A-Za-z-]*)\\s*:', 1)) AS k,
             trim(regexp_extract(trim(regexp_replace(l, '#.*$', '')),
                                 '^[A-Za-z][A-Za-z-]*\\s*:\\s*(.*)$', 1)) AS v
      FROM lines
    ),
    keyed2 AS (SELECT * FROM keyed WHERE k != ''),
    flagged AS (
      SELECT *, CASE WHEN k = 'user-agent' AND NOT
                  coalesce(lag(k = 'user-agent') OVER
                           (PARTITION BY host ORDER BY line_no), FALSE)
                THEN 1 ELSE 0 END AS ng
      FROM keyed2
    ),
    grouped AS (
      SELECT *, sum(ng) OVER (PARTITION BY host ORDER BY line_no) AS group_id
      FROM flagged
    ),
    agents AS (
      SELECT host, group_id, lower(v) AS agent FROM grouped
      WHERE k = 'user-agent'
    ),
    rules AS (
      SELECT host, group_id, k AS rule, v AS rpath, line_no FROM grouped
      WHERE k IN ('allow', 'disallow') AND v != ''
    ),
    joined AS (
      SELECT r.host, r.rule, r.rpath, r.line_no, a.agent
      FROM rules r JOIN agents a USING (host, group_id)
    ),
    scoped AS (
      SELECT host, rule, rpath, line_no,
             CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END AS spec
      FROM joined WHERE agent IN ('graftbot', '*')
    ),
    scoped2 AS (
      SELECT * FROM (
        SELECT *, max(spec) OVER (PARTITION BY host) AS best FROM scoped
      ) WHERE spec = best
    ),
    pats AS (
      SELECT host, rule, rpath, line_no,
             CAST(length(rpath) AS BIGINT) AS plen,
             CASE WHEN right(rpath, 1) = '$'
                  THEN substr(e, 1, length(e) - 1) ELSE e || '%' END AS pat
      FROM (
        SELECT *, replace(replace(replace(replace(rpath,
                 '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%') AS e
        FROM scoped2
      )
    ),
    urls AS (
      SELECT doc_id, 'h' || CAST(doc_id % 20 AS VARCHAR) AS host,
             ({_RPATH_ARR_SQL})[CAST(doc_id % 6 AS INT) + 1]
               || CASE WHEN doc_id % 6 = 5 THEN ''
                       ELSE CAST(doc_id AS VARCHAR) END AS path
      FROM documents
    ),
    matched AS (
      SELECT u.doc_id, u.host, u.path, p.rule, p.rpath, p.plen, p.line_no
      FROM urls u LEFT JOIN pats p
        ON u.host = p.host AND u.path LIKE p.pat ESCAPE '\\'
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id
        ORDER BY plen DESC,
                 CASE WHEN rule = 'allow' THEN 0 ELSE 1 END ASC,
                 line_no ASC) AS rn
      FROM matched
    )
    SELECT doc_id, host, path,
           CASE WHEN rule IS NULL OR rule = 'allow' THEN 1 ELSE 0 END
             AS allowed,
           rule AS matched_rule, rpath AS matched_path
    FROM ranked WHERE rn = 1
"""


@query("robots_compliance", _ROBOTS_ORACLE)
def robots_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance gate (`operators/robots.py`): 20 synthetic
    hosts with layered policies (wildcard rules, $-anchored rules, a
    dedicated graftbot group on every 3rd host that must win outright
    over *, a stacked two-agent group that must never apply) against a
    URL per document. The full RFC 9309 pipeline — group sessionization,
    agent scoping, LIKE-translated longest-match with Allow tie-break —
    must replay bit-for-bit in DuckDB."""
    from logstash_spark.operators.robots import parse_robots, robots_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hosts = (
        docs.select((F.col("doc_id") % 20).alias("hid"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("hid").cast("string")).alias("host"),
            _robots_blob_spark(F.col("hid")).alias("robots_txt"),
        )
    )
    rules = parse_robots(hosts)
    idx = (F.col("doc_id") % 6).cast("int") + 1
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias(
            "host"
        ),
        F.concat(
            F.element_at(F.array(*[F.lit(p) for p in _RPATHS]), idx),
            F.when(F.col("doc_id") % 6 == 5, F.lit("")).otherwise(
                F.col("doc_id").cast("string")
            ),
        ).alias("path"),
    )
    out = robots_filter(urls, rules, "graftbot")
    return out.select(
        "doc_id",
        "host",
        "path",
        F.col("allowed").cast("int").alias("allowed"),
        "matched_rule",
        "matched_path",
    )


# ---------------------------------------------------------------------------
# Host-graph authority (operators/graph.py pagerank)
# ---------------------------------------------------------------------------

_PR_EDGES_SQL = """
      SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) AS src,
             'h' || CAST((doc_id * 7 + 3) % 50 AS VARCHAR) AS dst
      FROM documents
      UNION ALL
      SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) AS src,
             'h' || CAST((doc_id * 13 + 1) % 23 AS VARCHAR) AS dst
      FROM documents
"""


def _pr_edges_spark(docs: DataFrame) -> DataFrame:
    i = F.col("doc_id")
    a = docs.select(
        F.concat(F.lit("h"), (i % 50).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((i * 7 + 3) % 50).cast("string")).alias("dst"),
    )
    b = docs.select(
        F.concat(F.lit("h"), (i % 50).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((i * 13 + 1) % 23).cast("string")).alias("dst"),
    )
    return a.unionByName(b)


def _pagerank_oracle() -> str:
    from logstash_spark.operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_PR_EDGES_SQL, iters=2)


@query("host_pagerank", _pagerank_oracle())
def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-authority gate (`graph.pagerank`): a 50-host link graph is
    derived from the documents table (a second edge family lands on a
    23-host subset, so in-degrees — and therefore ranks — genuinely
    differ), then two damped PageRank rounds run in scaled-int64 space.
    The unrolled DuckDB replay must agree bit-for-bit — every share and
    update is non-negative integer div. The rank is the document
    quality PRIOR a curation pipeline joins back on host (Common Crawl
    publishes host-level webgraph ranks for exactly this use)."""
    from logstash_spark.operators.graph import pagerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pagerank(_pr_edges_spark(docs), iters=2)


# ---------------------------------------------------------------------------
# Sitemap discovery (robots.sitemap_urls)
# ---------------------------------------------------------------------------

_SM_URLSET_A = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://ex.com/a/"
)
_SM_URLSET_B = (
    "</loc><lastmod>2026-01-15</lastmod><changefreq>daily</changefreq>"
    "<priority>0.8</priority></url>"
    "<url> <loc> https://ex.com/b/"
)
_SM_URLSET_C = " </loc><lastmod>2026-01-17T12:00:00Z</lastmod></url></urlset>"
_SM_INDEX_A = (
    '<?xml version="1.0"?><sitemapindex><sitemap><loc>https://ex.com/sm1-'
)
_SM_INDEX_B = ".xml</loc><lastmod>2026-01-17</lastmod></sitemap><sitemap><loc>https://ex.com/sm2-"
_SM_INDEX_C = ".xml</loc></sitemap></sitemapindex>"


def _sitemap_spark(doc_id) -> F.Column:
    i = doc_id.cast("string")
    urlset = F.concat(
        F.lit(_SM_URLSET_A), i, F.lit(_SM_URLSET_B), i, F.lit(_SM_URLSET_C)
    )
    index = F.concat(
        F.lit(_SM_INDEX_A), i, F.lit(_SM_INDEX_B), i, F.lit(_SM_INDEX_C)
    )
    return F.when(doc_id % 4 == 0, index).otherwise(urlset)


_SITEMAP_SQL = f"""
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                  THEN '{W._sq(_SM_INDEX_A)}' || CAST(doc_id AS VARCHAR)
                       || '{W._sq(_SM_INDEX_B)}' || CAST(doc_id AS VARCHAR)
                       || '{W._sq(_SM_INDEX_C)}'
                  ELSE '{W._sq(_SM_URLSET_A)}' || CAST(doc_id AS VARCHAR)
                       || '{W._sq(_SM_URLSET_B)}' || CAST(doc_id AS VARCHAR)
                       || '{W._sq(_SM_URLSET_C)}'
             END AS xml
      FROM documents
"""


def _sm_field_sql(tag: str) -> str:
    return f"trim(regexp_extract(b, '(?is)<{tag}[^>]*>(.*?)</{tag}\\s*>', 1))"


@query(
    "sitemap_discovery",
    f"""
    WITH files AS ({_SITEMAP_SQL}),
    parts AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS is_index,
             CASE WHEN doc_id % 4 = 0
                  THEN regexp_extract_all(xml,
                         '(?is)<sitemap\\s*>(.*?)</sitemap\\s*>', 1)
                  ELSE regexp_extract_all(xml,
                         '(?is)<url\\s*>(.*?)</url\\s*>', 1)
             END AS bs
      FROM files
    ),
    recs AS (
      -- both file kinds carry exactly 2 entries by construction
      SELECT doc_id, is_index, CAST(gs.i - 1 AS INT) AS entry_no,
             bs[gs.i] AS b
      FROM parts, generate_series(1, 2) gs(i)
    )
    SELECT doc_id, is_index, entry_no,
           {_sm_field_sql("loc")} AS loc,
           {_sm_field_sql("lastmod")} AS lastmod,
           {_sm_field_sql("changefreq")} AS changefreq,
           CAST(TRY_CAST({_sm_field_sql("priority")} AS DOUBLE) * 10 AS INT)
             AS priority_x10
    FROM recs
    """,
)
def sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing gate (`robots.sitemap_urls`): per document a
    urlset file (two entries — full and sparse fields, whitespace-padded
    tags) or, on every 4th doc, a sitemapindex with two children. Entry
    splitting, loc/lastmod/changefreq extraction and priority parsing
    must replay bit-for-bit in DuckDB (priority ×10 as int — the gate
    values are exact in binary so both engines agree)."""
    from logstash_spark.operators.robots import sitemap_urls

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    files = docs.select(
        "doc_id", _sitemap_spark(F.col("doc_id")).alias("sitemap_xml")
    )
    out = sitemap_urls(files, "sitemap_xml")
    return out.select(
        "doc_id",
        F.col("is_index").cast("int").alias("is_index"),
        F.col("entry_no").cast("int").alias("entry_no"),
        "loc",
        "lastmod",
        "changefreq",
        (F.col("priority") * 10).cast("int").alias("priority_x10"),
    )


# ---------------------------------------------------------------------------
# Anchor-text census (webtext.anchor_stats)
# ---------------------------------------------------------------------------

# 3 anchors per document onto 101 shared targets; anchor text comes from
# a 5-word vocabulary keyed by target (so each target has a dominant
# description) with a minority variant every 11th (doc+slot); even docs
# wrap the text in <b> and pad whitespace — extraction must strip both.
_AN_VOCAB = ("click here", "read more", "project docs", "home page",
             "next post")
_AN_VOCAB_SQL = "[" + ", ".join(f"'{t}'" for t in _AN_VOCAB) + "]"


def _anchor_page_spark(doc_id) -> F.Column:
    segs = []
    for j in range(3):
        n = (doc_id * 3 + F.lit(j)) % 101
        base = F.element_at(
            F.array(*[F.lit(t) for t in _AN_VOCAB]), (n % 5).cast("int") + 1
        )
        text = F.when((doc_id + j) % 11 == 0, F.lit("rare link")).otherwise(
            base
        )
        shown = F.when(
            doc_id % 2 == 0, F.concat(F.lit(" <b>"), text, F.lit("</b> "))
        ).otherwise(text)
        segs += [
            F.lit('<a href="/t/'),
            n.cast("string"),
            F.lit('">'),
            shown,
            F.lit("</a> and "),
        ]
    return F.concat(F.lit("<html><body>"), *segs, F.lit("</body></html>"))


@query(
    "anchor_text_stats",
    f"""
    WITH anchors AS (
      SELECT '/t/' || CAST((doc_id * 3 + gs.j) % 101 AS VARCHAR) AS href,
             CASE WHEN (doc_id + gs.j) % 11 = 0 THEN 'rare link'
                  ELSE ({_AN_VOCAB_SQL})
                       [CAST((doc_id * 3 + gs.j) % 101 % 5 AS INT) + 1]
             END AS text
      FROM documents, generate_series(0, 2) gs(j)
    ),
    counted AS (
      SELECT href, text, CAST(count(*) AS BIGINT) AS cnt
      FROM anchors GROUP BY href, text
    ),
    ranked AS (
      SELECT href, text, cnt,
             sum(cnt) OVER (PARTITION BY href) AS n_refs,
             row_number() OVER (PARTITION BY href
                                ORDER BY cnt DESC, text ASC) AS rn
      FROM counted
    )
    SELECT href, CAST(n_refs AS BIGINT) AS n_refs, text AS top_text
    FROM ranked WHERE rn = 1
    """,
)
def anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text census gate (`webtext.anchor_stats`): pages with 3
    anchors onto 101 shared targets are synthesized per document (bold
    markup + whitespace padding on even docs); the Spark side EXTRACTS
    from the markup while the oracle computes the ground-truth pairs
    directly — per-target reference counts and the dominant anchor text
    (count-desc, text-asc tie-break) must agree exactly. One real
    shuffle: (href, text) partials; the href window reuses the same
    exchange prefix."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        _anchor_page_spark(F.col("doc_id")).alias("html")
    )
    return W.anchor_stats(pages, "html")
