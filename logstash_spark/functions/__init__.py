"""Scalar-function filters as Column builders (SURVEY.md §2.4 table 2).

All pure Catalyst expressions — fingerprint, uuid, bytes, truncate,
urldecode, de_dot, prune, range tagging, environment.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.operators import op
from logstash_spark.operators.common import add_tag_when


_HMAC_DIGESTS = {
    "MD5": (lambda c: F.md5(c), 16),
    "SHA1": (lambda c: F.sha1(c), 20),
    "SHA256": (lambda c: F.sha2(c, 256), 32),
}


def hmac_hex(data: Column, key: str | bytes, method: str = "SHA256") -> Column:
    """True RFC-2104 HMAC as a pure Catalyst expression.

    The key is a config literal, so both pad blocks are computed driver-
    side and embedded as binary literals: HMAC(k, m) = H(opad ‖ H(ipad ‖
    m)). MD5/SHA1/SHA256 all use a 64-byte block; a key longer than the
    block is first digested (RFC 2104 §2). The inner digest round-trips
    hex→raw via unhex so the outer hash sees RAW digest bytes, exactly
    like OpenSSL::HMAC in logstash-filter-fingerprint/anonymize. Zero
    UDF, zero shuffle; verified bit-for-bit against Python's hmac module
    in tests."""
    import hashlib

    m = method.upper().replace("-", "")
    if m not in _HMAC_DIGESTS:
        raise ValueError(f"hmac method must be one of {sorted(_HMAC_DIGESTS)}")
    digest_fn, _ = _HMAC_DIGESTS[m]
    kb = key.encode() if isinstance(key, str) else bytes(key)
    if len(kb) > 64:
        kb = hashlib.new(m.lower(), kb).digest()
    blk = kb.ljust(64, b"\0")
    ipad = bytearray(b ^ 0x36 for b in blk)
    opad = bytearray(b ^ 0x5C for b in blk)
    inner = digest_fn(F.concat(F.lit(ipad), data.cast("binary")))
    return digest_fn(F.concat(F.lit(opad), F.unhex(inner)))


@op("anonymize")
def anonymize(
    df: DataFrame,
    fields: str | Sequence[str],
    *,
    algorithm: str = "SHA256",
    key: str | None = None,
) -> DataFrame:
    """logstash-filter-anonymize: overwrite each field IN PLACE with its
    hex digest (key=None) or keyed HMAC hexdigest (the reference uses
    OpenSSL::HMAC when a key is configured — reproduced exactly by
    `hmac_hex`, not a key-concat approximation). Null fields stay null
    (the reference skips absent fields). Pure column rewrite, zero
    shuffle."""
    names = [fields] if isinstance(fields, str) else list(fields)
    m = algorithm.upper().replace("-", "")
    if key is not None:
        mk = lambda c: hmac_hex(c, key, m)  # noqa: E731
    elif m in _HMAC_DIGESTS:
        fn, _ = _HMAC_DIGESTS[m]
        mk = lambda c: fn(c.cast("string"))  # noqa: E731
    else:
        raise ValueError(f"anonymize algorithm must be one of {sorted(_HMAC_DIGESTS)}")
    return df.withColumns(
        {n: F.when(F.col(n).isNotNull(), mk(F.col(n).cast("string"))) for n in names}
    )


@op("fingerprint")
def fingerprint(
    df: DataFrame,
    source: str | Sequence[str],
    *,
    target: str = "fingerprint",
    method: str = "SHA256",
    key: str | None = None,
    concatenate_sources: bool = True,
) -> DataFrame:
    """logstash-filter-fingerprint: hash of field(s).

    MURMUR3→xxhash64 (both 64-bit non-crypto; stated substitution),
    MD5/SHA1/SHA256 exact, UUID→uuid(). A key engages true RFC-2104
    HMAC via `hmac_hex` (exactly OpenSSL::HMAC in fingerprint.rb; the
    pre-round-3 key-concat approximation is gone).
    concatenate_sources=False mirrors the reference's per-source loop
    where each source overwrites `target` — i.e. the LAST source's hash
    wins (fingerprint.rb sets the event field once per source).
    """
    sources = [source] if isinstance(source, str) else list(source)
    cols = [F.col(s).cast("string") for s in sources]
    data = F.concat_ws("|", *cols) if concatenate_sources else cols[-1]
    m = method.upper()
    if key:
        if m.replace("-", "") not in _HMAC_DIGESTS:
            raise ValueError(f"fingerprint key= requires an HMAC-able method, got {method}")
        return df.withColumn(target, hmac_hex(data, key, m))
    if m == "MURMUR3":
        out: Column = F.xxhash64(data)
    elif m == "MD5":
        out = F.md5(data)
    elif m == "SHA1":
        out = F.sha1(data)
    elif m in ("SHA256", "SHA-256"):
        out = F.sha2(data, 256)
    elif m == "CRC32":
        out = F.crc32(data)
    elif m == "UUID":
        out = F.expr("uuid()")
    else:
        raise ValueError(f"unknown fingerprint method {method}")
    return df.withColumn(target, out)


@op("uuid")
def uuid(df: DataFrame, target: str = "uuid") -> DataFrame:
    """logstash-filter-uuid (ref Java demo org/logstash/plugins/filters/Uuid.java)."""
    return df.withColumn(target, F.expr("uuid()"))


_BYTE_UNITS = {
    "b": 1, "kb": 1024, "k": 1024, "mb": 1024**2, "m": 1024**2,
    "gb": 1024**3, "g": 1024**3, "tb": 1024**4, "t": 1024**4,
    "pb": 1024**5,
}


@op("bytes")
def bytes_filter(df: DataFrame, source: str, *, target: str = "bytes") -> DataFrame:
    """logstash-filter-bytes: '10 MB' → 10485760 (when-chain unit table)."""
    num = F.regexp_extract(F.col(source), r"([0-9.]+)", 1).cast("double")
    unit = F.lower(F.trim(F.regexp_extract(F.col(source), r"[0-9.]+\s*([A-Za-z]+)", 1)))
    mult: Column = F.lit(1.0)
    for u, f_ in _BYTE_UNITS.items():
        mult = F.when(unit == u, F.lit(float(f_))).otherwise(mult)
    return df.withColumn(target, (num * mult).cast("long"))


@op("truncate")
def truncate(df: DataFrame, fields: Sequence[str], length_bytes: int) -> DataFrame:
    """logstash-filter-truncate: cap each field at `length_bytes` BYTES
    (the reference truncates the byte representation — Ruby byteslice —
    not characters). Columnar analog: encode → byte substring → decode,
    then strip the U+FFFD replacement a mid-sequence cut leaves, so the
    cut snaps to the last complete character within the byte budget
    (raw invalid UTF-8 is unrepresentable in a Spark string; boundary
    snap is the faithful relational reading). ASCII input behaves
    exactly like a char cap. Pure column exprs, zero UDF."""

    def _cut(c: Column) -> Column:
        b = F.substring(F.encode(c, "UTF-8"), 1, length_bytes)
        hexs = F.hex(b)
        nb = F.length(hexs) / 2

        def byte_from_end(i: int) -> Column:
            # i-th byte counting from the END of the prefix (1-based);
            # 0 when the prefix is shorter than i bytes
            return F.when(
                nb >= i,
                F.conv(F.substring(hexs, -2 * i, 2), 16, 10).cast("int"),
            ).otherwise(F.lit(0))

        def is_cont(i: int) -> Column:
            return byte_from_end(i).between(0x80, 0xBF)

        # trailing continuation-byte run length k ∈ 0..3, then the lead
        # byte right before it decides whether the final char is whole
        k = (
            F.when(~is_cont(1), F.lit(0))
            .when(~is_cont(2), F.lit(1))
            .when(~is_cont(3), F.lit(2))
            .otherwise(F.lit(3))
        )
        lead = (
            F.when(k == 0, byte_from_end(1))
            .when(k == 1, byte_from_end(2))
            .when(k == 2, byte_from_end(3))
            .otherwise(byte_from_end(4))
        )
        expect = (
            F.when(lead < 0x80, F.lit(1))
            .when(lead.between(0xC0, 0xDF), F.lit(2))
            .when(lead.between(0xE0, 0xEF), F.lit(3))
            .otherwise(F.lit(4))
        )
        # the source string is valid UTF-8, so the only possible defect
        # after a byte cut is ONE truncated final char: drop it unless
        # its expected length matches what actually fits
        valid_len = F.when(expect == k + 1, nb).otherwise(nb - (k + 1))
        return F.decode(
            F.substring(b, 1, F.greatest(valid_len, F.lit(0)).cast("int")),
            "UTF-8",
        )

    return df.withColumns({f_: _cut(F.col(f_)) for f_ in fields})


@op("urldecode")
def urldecode(df: DataFrame, field: str) -> DataFrame:
    """logstash-filter-urldecode via native url_decode (Spark 3.5+)."""
    return df.withColumn(field, F.url_decode(F.col(field)))


@op("punct")
def punct(
    df: DataFrame, source: str = "message", *, target: str = "punct"
) -> DataFrame:
    """logstash-filter-punct (lib/logstash/filters/punct.rb §filter):
    strip everything alphanumeric-or-space from `source`, leaving the
    punctuation skeleton — the classic cheap log-template signature
    (events from the same printf site share a skeleton regardless of the
    variable values). One regexp_replace, zero shuffle; pair with a
    groupBy over the skeleton for template mining at any scale."""
    return df.withColumn(
        target, F.regexp_replace(F.col(source), "[a-zA-Z0-9 ]", "")
    )


@op("de_dot")
def de_dot(df: DataFrame, separator: str = "_") -> DataFrame:
    """logstash-filter-de_dot: driver-side schema rename (no data movement)."""
    return df.withColumnsRenamed(
        {c: c.replace(".", separator) for c in df.columns if "." in c}
    )


@op("prune")
def prune(
    df: DataFrame,
    *,
    whitelist: str | None = None,
    blacklist: str | None = None,
) -> DataFrame:
    """logstash-filter-prune: regex column whitelist/blacklist — a driver-
    side select, so Catalyst prunes the parquet scan to the kept columns."""
    cols = df.columns
    if whitelist:
        rx = re.compile(whitelist)
        cols = [c for c in cols if rx.search(c)]
    if blacklist:
        rx = re.compile(blacklist)
        cols = [c for c in cols if not rx.search(c)]
    return df.select(*cols)


@op("range")
def range_tag(
    df: DataFrame, field: str, lo: float, hi: float, *, tag: str = "_rangefailure"
) -> DataFrame:
    """logstash-filter-range: tag rows whose value falls outside [lo, hi]."""
    c = F.col(field).cast("double")
    return add_tag_when(df, ~c.between(lo, hi), tag)


@op("environment")
def environment(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """logstash-filter-environment: env var → literal column at PLAN time.
    Unset vars yield a typed (string) null — a bare lit(None) is a void
    column Parquet sinks reject."""
    return df.withColumns(
        {
            target: F.lit(os.environ.get(var)).cast("string")
            for target, var in fields.items()
        }
    )


# ---------------------------------------------------------------------------
# tld — registered-domain decomposition (logstash-filter-tld)
# ---------------------------------------------------------------------------

# Bounded subset of the public-suffix list: the multi-label suffixes a
# log pipeline actually meets. The reference filter ships the full
# Mozilla PSL via the `public_suffix` gem; at Spark scale the list is a
# plan-time constant folded into one CASE expression, so extending it to
# the full PSL is a data change, not a code change (generate the same
# chain from the published file). Single-label TLDs need no listing —
# they are the fallback branch.
PUBLIC_SUFFIX_2LD = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "go.kr",
    "com.mx", "org.mx",
    "co.za", "org.za",
    "com.tr", "org.tr",
    "com.ar", "com.sg", "com.hk", "com.tw",
    "co.nz", "net.nz", "org.nz",
)


def domain_parts(host: Column) -> dict[str, Column]:
    """Decompose a hostname into public-suffix parts as pure Catalyst
    expressions (zero shuffle, plan-time suffix table).

    Returns {tld, sld, trd, domain} mirroring logstash-filter-tld's
    output fields ([tld][tld]/[sld]/[trd]/[domain], which it takes from
    the public_suffix gem): `tld` is the (possibly multi-label) public
    suffix, `sld` the registrable label, `trd` the subdomain prefix
    (null when absent), `domain` = sld + "." + tld.
    """
    h = F.lower(F.trim(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    is2 = F.lit(False)
    for s in PUBLIC_SUFFIX_2LD:
        is2 = is2 | h.endswith("." + s)
    k = F.when(is2, F.lit(2)).otherwise(F.lit(1))  # labels in the suffix
    tld = F.array_join(F.slice(labels, n - k + 1, k), ".")
    sld = F.when(n >= k + 1, F.element_at(labels, (n - k).cast("int")))
    trd = F.when(
        n >= k + 2, F.array_join(F.slice(labels, F.lit(1), n - k - 1), ".")
    )
    domain = F.when(sld.isNotNull(), F.concat_ws(".", sld, tld))
    return {"tld": tld, "sld": sld, "trd": trd, "domain": domain}


@op("tld")
def tld(df: DataFrame, source: str = "message", *, prefix: str = "") -> DataFrame:
    """logstash-filter-tld: split a hostname into tld/sld/trd/domain
    columns (reference plugin writes [tld][tld] etc.; flat columns here,
    `prefix` for collision control)."""
    parts = domain_parts(F.col(source))
    return df.withColumns({prefix + k: v for k, v in parts.items()})


@op("age")
def age(
    df: DataFrame,
    *,
    source: str = "ts",
    target: str = "age",
    now: str | None = None,
    max_age: float | None = None,
    tag: str = "_agefilter",
) -> DataFrame:
    """logstash-filter-age: event age in (fractional) seconds.

    The reference computes `Time.now - event.timestamp` per event; a
    distributed batch needs ONE reference instant for the whole job or
    the answer depends on task scheduling — `now` (ISO string) pins it
    (defaults to the wall clock via current_timestamp(), which Spark
    also evaluates once per query). `max_age` tags rows older than the
    cutoff, the plugin's documented drop-old-events idiom."""
    now_c = F.lit(now).cast("timestamp") if now else F.current_timestamp()
    a = now_c.cast("double") - F.col(source).cast("timestamp").cast("double")
    out = df.withColumn(target, a)
    if max_age is not None:
        out = add_tag_when(out, F.col(target) > F.lit(max_age), tag)
    return out


@op("alter")
def alter(
    df: DataFrame,
    *,
    condrewrite: Sequence[tuple[str, str, str]] = (),
    condrewriteother: Sequence[tuple[str, str, str, str]] = (),
    coalesce: Sequence[tuple[str, Sequence[str]]] = (),
) -> DataFrame:
    """logstash-filter-alter: conditional field rewrites.

    condrewrite [(field, expected, new)]: field := new where field ==
    expected. condrewriteother [(cond_field, expected, target, new)]:
    target := new where cond_field == expected. coalesce [(target,
    [sources...])]: target := first non-null source (string-cast, like
    the Ruby filter's to_s). All pure CASE expressions, zero shuffle."""
    for field, expected, new in condrewrite:
        df = df.withColumn(
            field,
            F.when(F.col(field) == F.lit(expected), F.lit(new)).otherwise(
                F.col(field)
            ),
        )
    for cond_field, expected, target_f, new in condrewriteother:
        base = F.col(target_f) if target_f in df.columns else F.lit(None).cast("string")
        df = df.withColumn(
            target_f,
            F.when(F.col(cond_field) == F.lit(expected), F.lit(new)).otherwise(base),
        )
    for target_f, sources in coalesce:
        df = df.withColumn(
            target_f, F.coalesce(*[F.col(s).cast("string") for s in sources])
        )
    return df


@op("cipher")
def cipher(
    df: DataFrame,
    source: str,
    *,
    key: str,
    mode: str = "encrypt",
    algorithm: str = "AES-ECB-PKCS",
    target: str = "cipher_out",
    iv: str | None = None,
    base64_output: bool = True,
) -> DataFrame:
    """logstash-filter-cipher analog on Spark's built-in AES exprs.

    The reference filter encrypts/decrypts one event field with a static
    key (modes like aes-128-cbc / aes-256-ecb) and base64-wraps the
    result. Spark ships `aes_encrypt`/`aes_decrypt` as JVM expressions —
    whole-stage-codegen'd, zero UDF, zero shuffle — supporting
    ECB/CBC/GCM with PKCS/NONE padding, so this stays entirely on the
    fast path. `algorithm` is "AES-<MODE>-<PADDING>"; key length picks
    AES-128/192/256 (16/24/32 bytes, reference `key_size`).

    ECB+PKCS is DETERMINISTIC (no IV) — the mode the correctness gate
    uses; CBC/GCM draw a random IV per row unless `iv` pins one (pinning
    an IV is only sane for tests — the reference's random-IV-per-event
    default is the secure choice).
    """
    parts = algorithm.upper().split("-")
    if parts[0] != "AES" or len(parts) not in (2, 3):
        raise ValueError(f"algorithm must be AES-<MODE>[-<PADDING>], got {algorithm!r}")
    aes_mode = parts[1]
    padding = parts[2] if len(parts) == 3 else "DEFAULT"
    if len(key.encode()) not in (16, 24, 32):
        raise ValueError("AES key must be 16/24/32 bytes")
    k, m, p = F.lit(key), F.lit(aes_mode), F.lit(padding)
    if mode == "encrypt":
        ivc = F.unbase64(F.lit(iv)) if iv else F.lit(b"")
        ct = F.aes_encrypt(F.col(source).cast("string"), k, m, p, ivc)
        out = F.base64(ct) if base64_output else ct
    elif mode == "decrypt":
        src = F.unbase64(F.col(source)) if base64_output else F.col(source)
        out = F.aes_decrypt(src, k, m, p).cast("string")
    else:
        raise ValueError(f"mode must be encrypt|decrypt, got {mode!r}")
    return df.withColumn(target, out)


_NUM_PATTERN = r"[-+]?\d*\.\d+|[-+]?\d+"


@op("extractnumbers")
def extractnumbers(
    df: DataFrame,
    source: str = "message",
    *,
    max_fields: int = 10,
    prefix_int: str = "int",
    prefix_float: str = "float",
) -> DataFrame:
    """logstash-filter-extractnumbers: pull every number out of a string
    field into typed `int{i}` / `float{i}` fields (reference naming), a
    token counting as float iff it carries a decimal point. Pure column
    exprs: one regexp_extract_all + HOF filters over the (small) match
    array — zero shuffle, no UDF. `max_fields` caps the expanded
    columns like the reference's implicit event-field budget; the full
    arrays stay available as `_ints`/`_floats` for relational consumers
    that prefer explode over wide columns."""
    nums = F.regexp_extract_all(F.col(source).cast("string"), F.lit(_NUM_PATTERN), 0)
    ints = F.filter(nums, lambda x: ~x.rlike(r"\.")).cast("array<long>")
    floats = F.filter(nums, lambda x: x.rlike(r"\.")).cast("array<double>")
    out = df.withColumn("_ints", ints).withColumn("_floats", floats)
    for i in range(max_fields):
        out = out.withColumn(f"{prefix_int}{i}", F.element_at("_ints", i + 1))
        out = out.withColumn(f"{prefix_float}{i}", F.element_at("_floats", i + 1))
    return out


_MATH_OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "subtract": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "multiply": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "divide": lambda a, b: a / b,
    "fdiv": lambda a, b: F.floor(a / b).cast("long"),
    "mod": lambda a, b: a % b,
}


@op("math")
def math_ops(
    df: DataFrame,
    calculate: Sequence[tuple[str, object, object, str]],
) -> DataFrame:
    """logstash-filter-math: a `calculate` list of
    ``(operation, operand1, operand2, target)`` rows evaluated IN ORDER
    (later rows may reference earlier targets, reference semantics).
    String operands are field references, numerics are literals;
    `round` takes the digit count as operand2. Pure sequential column
    arithmetic — zero shuffle, whole-stage codegen."""

    def operand(v: object) -> Column:
        return F.col(v) if isinstance(v, str) else F.lit(v)

    out = df
    for operation, left, right, target in calculate:
        a = operand(left)
        if operation == "round":
            expr = F.round(a, int(right))  # type: ignore[arg-type]
        else:
            fn = _MATH_OPS.get(operation)
            if fn is None:
                raise ValueError(f"unknown math operation {operation!r}")
            expr = fn(a, operand(right))
        out = out.withColumn(target, expr)
    return out


# 1:1 accent folds (translate is char-for-char); multi-char expansions
# (ß→ss, æ→ae, œ→oe) follow as replace steps in `transliterate`.
_FOLD_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝšŠžŽđĐ"
_FOLD_TO = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUYsSzZdD"
_FOLD_MULTI = [("ß", "ss"), ("æ", "ae"), ("Æ", "AE"), ("œ", "oe"), ("Œ", "OE")]


@op("transliterate")
def transliterate(
    df: DataFrame, source: str, *, target: str | None = None
) -> DataFrame:
    """logstash-filter-i18n (transliterate option): fold accented Latin
    characters to ASCII — char-for-char via one `translate` plus a short
    replace chain for the multi-char expansions. Deliberately a FIXED
    public folding table (the reference delegates to Ruby i18n's
    transliteration tables): deterministic, engine-portable, and the
    gate replays the identical table in DuckDB. Zero shuffle."""
    c = F.translate(F.col(source).cast("string"), _FOLD_FROM, _FOLD_TO)
    for frm, to in _FOLD_MULTI:
        c = F.replace(c, F.lit(frm), F.lit(to))
    return df.withColumn(target or source, c)
