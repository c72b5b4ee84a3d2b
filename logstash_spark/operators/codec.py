"""Edge codecs (SURVEY.md §2.2) — the non-trivial one is multiline.

logstash-codec-multiline joins continuation lines into one event by
regex `pattern` / `what` / `negate`. Relationally this is
sessionization: flag event-start lines, running-sum them into a session
id over (partition, order), then group-concat. Two window passes + one
keyed shuffle — scales with partition count, unlike the reference's
inherently sequential per-stream buffer.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logstash_spark.operators import op


@op("line")
def line_codec(
    df: DataFrame,
    field: str,
    *,
    delimiter: str = "\n",
    target: str = "message",
    keep_empty: bool = False,
    line_no: str = "line_no",
) -> DataFrame:
    """logstash-codec-line / plain: one event per delimiter-separated line
    of a blob field (the decode direction; encode is just concat_ws).
    posexplode keeps the 0-based line number for downstream ordering —
    a narrow explode, no shuffle. The delimiter is a LITERAL string
    (reference semantics), so it is regex-escaped before F.split."""
    parts = F.split(F.col(field), re.escape(delimiter))
    # target (and line_no) overwrite any existing column of the same name
    # (reference codec semantics: the decoded line IS the message field) —
    # keeping both would make every downstream reference ambiguous.
    out = df.select(
        *[c for c in df.columns if c not in (field, target, line_no)],
        F.posexplode(parts).alias(line_no, target),
    )
    if not keep_empty:
        out = out.where(F.col(target) != "")
    return out


@op("multiline")
def multiline(
    df: DataFrame,
    field: str,
    pattern: str,
    *,
    what: str = "previous",
    negate: bool = False,
    group_by: Sequence[str] = ("source_file",),
    order_by: str = "line_no",
    max_lines: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """logstash-codec-multiline as sessionization.

    what='previous': a line matching `pattern` belongs WITH the previous
    line (so a NON-matching line starts a new event). `negate` inverts the
    match. what='next': a matching line belongs with the NEXT line (the
    event boundary is after the last non-matching line).

    Output: one row per joined event — group keys, event_start (first
    order_by value), n_lines, and `field` = lines joined with \\n.

    `max_lines` / `max_bytes` mirror the reference codec's buffer caps
    (logstash-codec-multiline `max_lines`/`max_bytes`, default 500 /
    10 MiB there; opt-in here): an event exceeding a cap is force-flushed
    and the remainder starts a new event, so one never-terminated stream
    can NOT become one unbounded group-concat row. Every force-flushed
    chunk (all but the last chunk of a split event) carries the
    `_multiline_toolong` tag in a `tags` column, the analog of the
    reference's `multiline_codec_max_{lines,bytes}_reached` tags. The
    `tags` column is only added when a cap is set (schema stability for
    cap-less callers). `auto_flush_interval` is inherently a streaming
    concern — the structured-streaming path bounds it via watermarks.
    """
    keys = list(group_by)
    matches = F.col(field).rlike(pattern)
    if negate:
        matches = ~matches

    w = Window.partitionBy(*keys).orderBy(order_by)
    if what == "previous":
        # matching line continues previous -> new event where NOT matching
        starts = (~matches).cast("int")
        sess = F.sum(starts).over(w)
    elif what == "next":
        # matching line glues to the following line -> a new event starts
        # right after any non-matching line; lag the inverse flag.
        prev_matches = F.lag(matches.cast("int"), 1, 1).over(w)
        starts = (prev_matches == 0).cast("int")
        sess = F.sum(starts).over(w)
    else:
        raise ValueError(f"what must be previous|next, got {what}")

    df = df.withColumn("_sess", sess)

    grp = [*keys, "_sess"]
    if max_lines is not None or max_bytes is not None:
        # Cap oversized events: sub-chunk each session so every chunk holds
        # <= max_lines lines / ~max_bytes bytes. Both counters are monotone
        # within the session, so their sum is a valid monotone chunk id
        # that advances whenever EITHER cap is crossed.
        ws = Window.partitionBy(*grp).orderBy(order_by)
        chunk = F.lit(0)
        if max_lines is not None:
            if max_lines < 1:
                raise ValueError("max_lines must be >= 1")
            chunk = chunk + F.floor((F.row_number().over(ws) - 1) / max_lines)
        if max_bytes is not None:
            if max_bytes < 1:
                raise ValueError("max_bytes must be >= 1")
            cum_before = (
                F.sum(F.octet_length(field)).over(ws) - F.octet_length(field)
            )
            chunk = chunk + F.floor(cum_before / max_bytes)
        df = df.withColumn("_chunk", chunk.cast("long"))
        grp = [*grp, "_chunk"]

    ordered_lines = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_by).alias("o"), F.col(field).alias("v")))
        ),
        lambda s: s.getField("v"),
    )
    out = df.groupBy(*grp).agg(
        F.min(order_by).alias("event_start"),
        F.count("*").alias("n_lines"),
        F.concat_ws("\n", ordered_lines).alias(field),
    )
    if "_chunk" in grp:
        # force-flushed chunks = every chunk but the session's last one
        wl = Window.partitionBy(*keys, "_sess")
        toolong = F.col("_chunk") < F.max("_chunk").over(wl)
        out = out.withColumn(
            "tags",
            F.when(toolong, F.array(F.lit("_multiline_toolong"))).otherwise(
                F.array().cast("array<string>")
            ),
        ).drop("_chunk")
    return out.drop("_sess")


@op("cef")
def cef_decode(
    df: DataFrame,
    field: str,
    *,
    ext_target: str = "cef_ext",
    keep_field: bool = False,
) -> DataFrame:
    """logstash-codec-cef (decode direction): parse an ArcSight Common
    Event Format line
    ``CEF:v|Vendor|Product|DevVersion|SigID|Name|Severity|k=v k2=v2 ...``
    into typed header columns + an extension map.

    Reference semantics (logstash-codec-cef README + CEF spec rev 25):
      * the 7 header fields split on UNESCAPED ``|`` (``\\|`` is a
        literal pipe inside a header value; ``\\\\`` a literal
        backslash) — handled with a lookbehind split, then unescape;
      * the trailing 8th segment is the extension: space-separated
        ``key=value`` pairs where VALUES may contain spaces (the next
        key starts at the next unescaped ``token=``), and ``\\=`` is a
        literal equals inside a value.

    All-Catalyst: one lookbehind split for headers, one lookahead split
    for extension pair boundaries, HOF map build. Zero shuffle, zero
    UDF; rows that don't start with ``CEF:`` tag ``_cefparsefailure``
    and keep null headers (reference tags instead of throwing).
    """
    hdr = F.split(F.col(field), r"(?<!\\)\|", 8)

    def unesc_hdr(c: Column) -> Column:
        # \| -> | and \\ -> \  (single pass: any escaped char -> itself)
        return F.regexp_replace(c, r"\\([\\|])", r"$1")

    def seg(i: int) -> Column:
        return F.when(F.size(hdr) >= i + 1, unesc_hdr(hdr[i]))

    ok = F.col(field).rlike(r"^CEF:\d+\|")
    version = F.when(ok, F.regexp_extract(hdr[0], r"^CEF:(\d+)$", 1).cast("int"))

    # extension: pair boundaries are whitespace runs followed by a key=
    # (keys are alnum/dot/bracket tokens per the CEF dictionary), '='
    # inside values is escaped as \=
    ext_raw = F.when(F.size(hdr) >= 8, hdr[7])
    pairs = F.filter(
        F.split(ext_raw, r"\s+(?=[A-Za-z0-9.\[\]_]+=)"),
        lambda p: p.rlike(r"^[A-Za-z0-9.\[\]_]+="),
    )
    unesc_val = lambda c: F.regexp_replace(c, r"\\([\\=nr])", r"$1")  # noqa: E731
    entries = F.transform(
        pairs,
        lambda p: F.struct(
            F.split(p, r"(?<!\\)=", 2).getItem(0).alias("key"),
            unesc_val(F.split(p, r"(?<!\\)=", 2).getItem(1)).alias("value"),
        ),
    )
    ext_map = F.when(ok & ext_raw.isNotNull(), F.map_from_entries(entries))

    out = df.select(
        *[c for c in df.columns if keep_field or c != field],
        F.when(ok, version).alias("cef_version"),
        F.when(ok, seg(1)).alias("device_vendor"),
        F.when(ok, seg(2)).alias("device_product"),
        F.when(ok, seg(3)).alias("device_version"),
        F.when(ok, seg(4)).alias("signature_id"),
        F.when(ok, seg(5)).alias("cef_name"),
        F.when(ok, seg(6)).alias("severity"),
        ext_map.alias(ext_target),
        F.when(~ok, F.array(F.lit("_cefparsefailure")))
        .otherwise(F.array().cast("array<string>"))
        .alias("tags"),
    )
    return out


@op("json_lines")
def json_lines_decode(
    df: DataFrame,
    field: str,
    schema: str,
    *,
    delimiter: str = "\n",
    line_no: str = "line_no",
    keep_field: bool = False,
) -> DataFrame:
    """logstash-codec-json_lines (decode direction): split a blob on
    `delimiter`, JSON-parse each line into top-level columns of
    `schema` (a DDL string, e.g. ``"a INT, b STRING"``).

    Reference semantics (logstash-codec-json_lines decode): an
    unparsable line still becomes an event — raw text preserved in
    `raw_line` — tagged ``_jsonparsefailure``; empty lines are skipped.
    All-Catalyst: one narrow posexplode + from_json, zero shuffle, zero
    UDF. Corrupt-line detection uses the PERMISSIVE-mode
    columnNameOfCorruptRecord channel (same machinery as
    parse.json_filter — from_json yields an all-null struct, never a
    NULL struct, so struct-nullness alone can't signal failure).
    """
    from pyspark.sql import types as T

    st = T._parse_datatype_string(schema)
    corrupt = "_corrupt_record"
    while corrupt in set(st.fieldNames()):
        corrupt = "_" + corrupt
    st_c = T.StructType(list(st.fields) + [T.StructField(corrupt, T.StringType())])

    lines = F.filter(
        F.split(F.col(field), re.escape(delimiter)), lambda s: s != ""
    )
    out = df.select(
        *[c for c in df.columns if keep_field or c != field],
        F.posexplode(lines).alias(line_no, "_raw"),
    )
    parsed = F.from_json(
        F.col("_raw"), st_c,
        {"columnNameOfCorruptRecord": corrupt, "mode": "PERMISSIVE"},
    )
    out = out.withColumn("_p", parsed)
    ok = F.col("_p").isNotNull() & F.col(f"_p.`{corrupt}`").isNull()
    return out.select(
        *[c for c in out.columns if c not in ("_raw", "_p")],
        *[F.when(ok, F.col(f"_p.`{f}`")).alias(f) for f in st.fieldNames()],
        F.when(~ok, F.array(F.lit("_jsonparsefailure")))
        .otherwise(F.array().cast("array<string>"))
        .alias("tags"),
        F.when(~ok, F.col("_raw")).alias("raw_line"),
    )


@op("graphite")
def graphite_decode(
    df: DataFrame,
    field: str,
    *,
    keep_field: bool = False,
) -> DataFrame:
    """logstash-codec-graphite (decode direction): parse plaintext
    graphite protocol lines ``metric.path value timestamp`` into
    (metric string, value double, ts timestamp). Malformed lines keep
    null columns and tag ``_graphiteparsefailure`` (the reference codec
    raises per-line; tagging is the batch-engine analog, consistent
    with every other parse op here). Zero shuffle, zero UDF."""
    m = F.regexp_extract(F.col(field), r"^(\S+) (-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?) (\d+)$", 0)
    ok = m != ""
    metric = F.regexp_extract(F.col(field), r"^(\S+) ", 1)
    value = F.regexp_extract(F.col(field), r"^\S+ (-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?) ", 1)
    ts = F.regexp_extract(F.col(field), r" (\d+)$", 1)
    return df.select(
        *[c for c in df.columns if keep_field or c != field],
        F.when(ok, metric).alias("metric"),
        F.when(ok, value.cast("double")).alias("value"),
        F.when(ok, F.timestamp_seconds(ts.cast("long"))).alias("ts"),
        F.when(~ok, F.array(F.lit("_graphiteparsefailure")))
        .otherwise(F.array().cast("array<string>"))
        .alias("tags"),
    )


def graphite_encode(
    df: DataFrame,
    *,
    metric_col: str = "metric",
    value_col: str = "value",
    ts_col: str = "ts",
    target: str = "message",
) -> DataFrame:
    """logstash-codec-graphite / logstash-output-graphite (encode
    direction): render ``metric value epoch_seconds`` lines. Integral
    values print without a trailing ``.0`` (graphite servers parse
    either; the compact form matches the reference's Ruby Float#to_s
    only for non-integral values — stated substitution). Pure concat."""
    v = F.col(value_col).cast("double")
    v_str = F.when(
        v == F.floor(v), v.cast("long").cast("string")
    ).otherwise(v.cast("string"))
    return df.withColumn(
        target,
        F.concat_ws(
            " ",
            F.col(metric_col),
            v_str,
            F.unix_timestamp(F.col(ts_col)).cast("string"),
        ),
    )


@op("es_bulk")
def es_bulk_decode(
    df: DataFrame,
    field: str,
    *,
    group_by: Sequence[str],
    keep_field: bool = False,
) -> DataFrame:
    """logstash-codec-es_bulk (decode direction): parse an Elasticsearch
    bulk-API NDJSON body — alternating action/metadata lines
    (``{"index":{"_index":"logs","_id":"7"}}``) and source-document
    lines; ``delete`` actions carry no source line.

    Relational pairing: posexplode lines, classify each line as an
    action line (exactly one of the four action keys present at the top
    level), then ``lead(1)`` over (group_by, line_no) attaches the
    following line as the candidate source; a candidate that is itself
    an action line (the ``delete`` case, or a malformed body) yields a
    null source. ONE window shuffle keyed on `group_by` (the enclosing
    request/blob id — bulk bodies are independent, so this parallelizes
    across requests; lines within one body must be ordered, which is
    inherent to the format, not a design choice). Non-action,
    non-source lines are dropped exactly like the reference codec's
    state machine consumes them.

    Output: group keys + action, bulk_index, bulk_id, source (raw JSON
    string — downstream json_filter applies a schema).
    """
    keys = list(group_by)
    lines = F.filter(F.split(F.col(field), "\n"), lambda s: s != "")
    ex = df.select(*keys, F.posexplode(lines).alias("_ln", "_raw"))

    def meta(action: str, k: str) -> Column:
        return F.get_json_object(F.col("_raw"), f"$.{action}.{k}")

    action = (
        F.when(F.get_json_object("_raw", "$.index").isNotNull(), F.lit("index"))
        .when(F.get_json_object("_raw", "$.create").isNotNull(), F.lit("create"))
        .when(F.get_json_object("_raw", "$.update").isNotNull(), F.lit("update"))
        .when(F.get_json_object("_raw", "$.delete").isNotNull(), F.lit("delete"))
    )
    ex = ex.withColumn("_action", action)
    w = Window.partitionBy(*keys).orderBy("_ln")
    nxt_raw = F.lead("_raw", 1).over(w)
    nxt_action = F.lead("_action", 1).over(w)
    # lead() must see the source lines too — attach the candidate source
    # BEFORE filtering down to action lines (filtering first would make
    # lead() skip straight to the next action line).
    out = ex.withColumn(
        "source",
        F.when((F.col("_action") != "delete") & nxt_action.isNull(), nxt_raw),
    ).where(F.col("_action").isNotNull())
    idx = F.coalesce(*[meta(a, "_index") for a in ("index", "create", "update", "delete")])
    did = F.coalesce(*[meta(a, "_id") for a in ("index", "create", "update", "delete")])
    return out.select(
        *keys,
        F.col("_ln").alias("line_no"),
        F.col("_action").alias("action"),
        idx.alias("bulk_index"),
        did.alias("bulk_id"),
        "source",
    )


def es_bulk_encode(
    df: DataFrame,
    *,
    index: str | Column,
    id_col: str,
    source_cols: Sequence[str],
    action: str = "index",
    target: str = "message",
) -> DataFrame:
    """logstash-output-elasticsearch bulk serialization (the transport
    itself is out of scope per SURVEY §7.4 — the Spark runtime replaces
    it; what remains is the wire FORMAT): two NDJSON lines per event,
    action/metadata then source. `index` may be a literal or a Column
    (sprintf-style dynamic index names compose via operators.common).
    Zero shuffle — pure to_json concat."""
    idx = F.lit(index) if isinstance(index, str) else index
    meta_line = F.to_json(
        F.create_map(
            F.lit(action),
            F.struct(
                idx.alias("_index"), F.col(id_col).cast("string").alias("_id")
            ),
        )
    )
    src_line = F.to_json(F.struct(*[F.col(c) for c in source_cols]))
    body = (
        meta_line
        if action == "delete"
        else F.concat(meta_line, F.lit("\n"), src_line)
    )
    return df.withColumn(target, body)


def csv_encode(
    df: DataFrame,
    fields: Sequence[str],
    *,
    separator: str = ",",
    target: str = "message",
) -> DataFrame:
    """logstash-output-csv serialization: render the named fields as one
    CSV line. Native `to_csv` over a struct — univocity writer, JVM
    codegen, RFC-4180 quoting (a value containing the separator, a
    quote, or a newline is double-quoted). Zero shuffle."""
    return df.withColumn(
        target,
        F.to_csv(
            F.struct(*[F.col(c) for c in fields]),
            {"sep": separator, "escape": '"'},
        ),
    )


def syslog_encode(
    df: DataFrame,
    *,
    facility: int = 1,
    severity_col: str | None = None,
    severity: int = 5,
    ts_col: str = "ts",
    host_col: str = "host",
    program: str = "logstash",
    pid_col: str | None = None,
    message_col: str = "message",
    target: str = "syslog_line",
) -> DataFrame:
    """logstash-output-syslog (RFC3164 line rendering; the UDP/TCP
    transport is out of scope per SURVEY §7.4): ``<PRI>MMM dd HH:mm:ss
    host program[pid]: message`` with PRI = facility*8 + severity.
    Severity may be a column (numeric) or a literal. Pure concat —
    zero shuffle. NOTE: RFC3164 day-of-month is space-padded; this
    emits zero-padded `dd` (the format every modern syslogd also
    accepts) — stated substitution, matching e.g. rsyslog's
    RSYSLOG_ForwardFormat tolerance."""
    sev = F.col(severity_col).cast("int") if severity_col else F.lit(severity)
    pri = F.concat(F.lit("<"), (F.lit(facility * 8) + sev).cast("string"), F.lit(">"))
    prog = F.lit(program)
    tag = (
        F.concat(prog, F.lit("["), F.col(pid_col).cast("string"), F.lit("]"))
        if pid_col
        else prog
    )
    return df.withColumn(
        target,
        F.concat(
            pri,
            F.date_format(F.col(ts_col), "MMM dd HH:mm:ss"),
            F.lit(" "),
            F.col(host_col),
            F.lit(" "),
            tag,
            F.lit(": "),
            F.col(message_col),
        ),
    )


def statsd_encode(
    df: DataFrame,
    *,
    namespace: str = "logstash",
    sender_col: str | None = None,
    metric_col: str = "metric",
    value_col: str = "value",
    metric_type: str = "c",
    sample_rate: float | None = None,
    target: str = "statsd_line",
) -> DataFrame:
    """logstash-output-statsd wire format: ``namespace.sender.metric:
    value|type[|@rate]`` (type c/g/ms/s). Integral values print without
    a trailing .0 like the graphite encoder. Pure concat, zero
    shuffle."""
    v = F.col(value_col).cast("double")
    v_str = F.when(v == F.floor(v), v.cast("long").cast("string")).otherwise(
        v.cast("string")
    )
    path_parts = [F.lit(namespace)]
    if sender_col:
        path_parts.append(F.col(sender_col))
    path_parts.append(F.col(metric_col))
    line = F.concat(
        F.concat_ws(".", *path_parts), F.lit(":"), v_str, F.lit("|"), F.lit(metric_type)
    )
    if sample_rate is not None:
        line = F.concat(line, F.lit(f"|@{sample_rate}"))
    return df.withColumn(target, line)


def cef_encode(
    df: DataFrame,
    *,
    vendor: str,
    product: str,
    device_version: str,
    sig_id: str,
    name: str,
    severity: str,
    ext_fields: Sequence[str],
    target: str = "message",
    cef_version: int = 0,
) -> DataFrame:
    """logstash-codec-cef (encode direction): render columns back into a
    CEF line. Header COLUMNS (sig_id/name/severity name columns; vendor/
    product/device_version are literals, matching the codec's config
    knobs) are escaped (``\\`` then ``|``); extension values escape
    ``\\`` then ``=``. Pure concat — zero shuffle."""
    esc_hdr = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(c, r"\\", r"\\\\"), r"\|", r"\\|"
    )
    esc_val = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(c, r"\\", r"\\\\"), "=", r"\\="
    )
    esc_lit = lambda s: s.replace("\\", "\\\\").replace("|", "\\|")  # noqa: E731
    ext = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"{k}="), esc_val(F.col(k).cast("string")))
            for k in ext_fields
        ],
    )
    line = F.concat_ws(
        "|",
        F.lit(f"CEF:{cef_version}"),
        F.lit(esc_lit(vendor)),
        F.lit(esc_lit(product)),
        F.lit(esc_lit(device_version)),
        esc_hdr(F.col(sig_id).cast("string")),
        esc_hdr(F.col(name).cast("string")),
        esc_hdr(F.col(severity).cast("string")),
        ext,
    )
    return df.withColumn(target, line)


@op("gzip_lines")
def gzip_lines(
    df: DataFrame,
    field: str,
    *,
    target: str = "message",
    line_no: str = "line_no",
    keep_empty: bool = False,
    encoding: str = "utf-8",
) -> DataFrame:
    """logstash-codec-gzip_lines: each input blob is one gzip stream whose
    decompressed payload is newline-separated events (reference:
    logstash-codec-gzip_lines lib/logstash/codecs/gzip_lines.rb §decode —
    Zlib::GzipReader over the IO, then the line codec). The inflate is one
    Arrow-batched pandas UDF over the binary column — CPU-bound,
    embarrassingly parallel, zero shuffle — followed by line_codec's
    posexplode. A null/corrupt blob yields a null text → zero events for
    that row (the reference raises per-stream; here the row simply
    produces nothing, and callers wanting a failure channel can test
    isnull before the explode)."""
    # annotation-free body: pandas_udf's hint inference can't resolve
    # function-local 'pd.Series' strings (PEP 563) — see script_field.
    def _gunzip(s):
        import gzip  # noqa: PLC0415

        def one(b):  # noqa: ANN001
            if b is None:
                return None
            try:
                return gzip.decompress(bytes(b)).decode(encoding)
            except (OSError, EOFError, UnicodeDecodeError):
                return None

        return s.map(one)

    udf = F.pandas_udf(_gunzip, "string")
    tmp = "_gz_inflated"
    out = df.withColumn(tmp, udf(F.col(field)))
    return line_codec(
        out, tmp, target=target, line_no=line_no, keep_empty=keep_empty
    )


def gzip_encode(
    df: DataFrame,
    field: str,
    *,
    target: str = "gz_blob",
    compresslevel: int = 6,
    encoding: str = "utf-8",
) -> DataFrame:
    """Deterministic gzip of a string column (the file output's
    `gzip => true` option; reference: logstash-output-file §flush with
    Zlib::GzipWriter). mtime is pinned to 0 so the emitted bytes are
    REPRODUCIBLE across workers, retries, and runs — without it every
    task attempt would embed its own wall-clock in the 10-byte header
    and break exactly-once re-write comparisons. One Arrow-batched
    pandas UDF, zero shuffle."""
    def _gz(s):
        import gzip  # noqa: PLC0415

        return s.map(
            lambda t: None
            if t is None
            else gzip.compress(t.encode(encoding), compresslevel, mtime=0)
        )

    udf = F.pandas_udf(_gz, "binary")
    return df.withColumn(target, udf(F.col(field)))


# ---------------------------------------------------------------------------
# WARC (CommonCrawl / ISO 28500) — the canonical web-archive ingest format
# ---------------------------------------------------------------------------

#: record boundary: the version line at start-of-line. Boundary-based
#: parsing (vs the spec's Content-Length-delimited framing) is exact for
#: text records (WET extracts, headers, metadata) where the payload
#: cannot contain a bare version line; byte-accurate framing for binary
#: payloads goes through the mapInPandas seam like binary_meta_decode.
_WARC_BOUNDARY_RX = r"(?m)^WARC/1\.[01]\r?\n"
#: WARC header block = everything before the first blank line
_WARC_HEADER_RX = r"(?s)^(.*?)\r?\n\r?\n"
_HTTP_STATUS_RX = r"^HTTP/1\.[01] (\d{3})"


def _warc_header(block: Column, name: str) -> Column:
    """One named header value out of the raw header block. Case matters
    in practice exactly as CommonCrawl emits them; (?im) relaxes it."""
    return F.regexp_extract(block, rf"(?im)^{name}:[ \t]*([^\r\n]*)", 1)


@op("warc")
def warc_decode(
    df: DataFrame,
    field: str,
    *,
    record_no: str = "record_no",
    keep_field: bool = False,
) -> DataFrame:
    """logstash has no WARC codec — web users front it with scripts; a
    100 TB training pipeline starts here (CommonCrawl WARC/WET). Decode
    a column holding WARC file TEXT into one row per record:

      record_no     1-based position in the file
      warc_type     warcinfo | request | response | conversion | ...
      target_uri    WARC-Target-URI
      warc_date     raw header string
      warc_ts       parsed timestamp (ISO-8601)
      record_id     WARC-Record-ID
      content_type  record Content-Type header
      content_length declared Content-Length (bigint)
      http_status   status code when the payload is an HTTP message
      payload       record body; for HTTP messages the entity body
                    (status line + headers stripped)
      tags          _warcparsefailure when a piece has no WARC-Type

    All-Catalyst: ONE narrow posexplode per file blob, regexp header
    extraction — zero shuffle, zero UDF. At scale each input row is one
    (or one chunk of a) .warc file read via text/binaryFile, so
    parallelism is file-granular exactly like CommonCrawl's own layout.
    """
    pieces = F.split(F.col(field), _WARC_BOUNDARY_RX)
    out = df.select(
        *[c for c in df.columns if keep_field or c != field],
        F.posexplode(pieces).alias(record_no, "_rec"),
    ).filter(F.col(record_no) >= 1)  # pos 0 = prefix before first record

    hdr = F.regexp_extract(F.col("_rec"), _WARC_HEADER_RX, 1)
    content = F.regexp_replace(F.col("_rec"), _WARC_HEADER_RX, "")
    # trailing record separator (\r\n\r\n) belongs to the framing
    content = F.regexp_replace(content, r"(\r?\n)+$", "")
    http_status = F.regexp_extract(content, _HTTP_STATUS_RX, 1)
    is_http = http_status != ""
    body = F.when(
        is_http, F.regexp_replace(content, _WARC_HEADER_RX, "")
    ).otherwise(content)
    wtype = _warc_header(hdr, "WARC-Type")

    return (
        out.withColumn("_hdr", hdr)
        .select(
            *[c for c in out.columns if c != "_rec"],
            wtype.alias("warc_type"),
            _warc_header(F.col("_hdr"), "WARC-Target-URI").alias("target_uri"),
            _warc_header(F.col("_hdr"), "WARC-Date").alias("warc_date"),
            F.to_timestamp(
                _warc_header(F.col("_hdr"), "WARC-Date"),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("warc_ts"),
            _warc_header(F.col("_hdr"), "WARC-Record-ID").alias("record_id"),
            _warc_header(F.col("_hdr"), "Content-Type").alias("content_type"),
            _warc_header(F.col("_hdr"), "Content-Length")
            .try_cast("long")
            .alias("content_length"),
            F.when(is_http, http_status.try_cast("int")).alias("http_status"),
            body.alias("payload"),
            F.when(wtype == "", F.array(F.lit("_warcparsefailure")))
            .otherwise(F.array().cast("array<string>"))
            .alias("tags"),
        )
        .drop("_hdr")
    )


@op("cloudtrail")
def cloudtrail_decode(
    df: DataFrame,
    field: str,
    record_schema: str,
    *,
    record_no: str = "record_no",
) -> DataFrame:
    """logstash-codec-cloudtrail (decode): an AWS CloudTrail delivery
    blob is one JSON object ``{"Records": [event, ...]}``; the codec
    splits it into one event per Records element (reference:
    logstash-codec-cloudtrail lib/logstash/codecs/cloudtrail.rb §decode
    — JSON parse, then `.each` over `Records`). `record_schema` is the
    DDL of the per-record fields to surface (nested structs allowed —
    e.g. ``"eventName STRING, userIdentity STRUCT<type:STRING>"``);
    schema-on-read keeps the DataFrame schema static like every parse
    op here.

    All-Catalyst: ONE from_json over an array<struct> + posexplode,
    zero UDF, zero shuffle. A blob that isn't valid JSON or has no
    Records array yields zero events, tagged upstream via the isNull
    check callers can apply before the explode."""
    from pyspark.sql import types as T

    rec_t = T._parse_datatype_string(record_schema)
    wrap = T.StructType([T.StructField("Records", T.ArrayType(rec_t))])
    parsed = F.from_json(F.col(field), wrap)
    out = df.select(
        *[c for c in df.columns if c != field],
        F.posexplode(parsed["Records"]).alias(record_no, "_rec"),
    )
    return out.select(
        *[c for c in out.columns if c != "_rec"],
        *[F.col(f"_rec.`{f}`").alias(f) for f in rec_t.fieldNames()],
    )
