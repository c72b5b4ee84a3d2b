"""Property-based tests (hypothesis) for the parser/compiler seams.

The reference's test strategy (SURVEY.md §5) leans on generated-input
specs for grok/dissect/kv/conditionals (logstash-filter-* rspec uses
randomized sample events); hypothesis is the pytest-native analog. Two
disciplines keep these fast under Spark:

* pure-Python properties (grok compile, Joda translation) run with
  normal hypothesis budgets — no Spark involved;
* Spark properties put the WHOLE generated batch in one DataFrame and
  assert row-wise after a single collect, with small max_examples —
  one Spark job per example, never one per generated row.
"""

from __future__ import annotations

import re
from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPARK_SETTINGS = dict(
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ---------------------------------------------------------------------------
# grok compile: generated field values survive a compile→match roundtrip
# ---------------------------------------------------------------------------

_word = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,11}", fullmatch=True)
_posint = st.integers(min_value=1, max_value=10**12)
_ipv4 = st.tuples(*[st.integers(0, 255)] * 4).map(
    lambda t: ".".join(str(o) for o in t)
)
_loglevel = st.sampled_from(["DEBUG", "INFO", "WARN", "ERROR", "FATAL", "TRACE"])


@given(w=_word, n=_posint, ip=_ipv4, lvl=_loglevel)
@settings(deadline=None, max_examples=200)
def test_grok_compile_match_roundtrip(w, n, ip, lvl):
    from logstash_spark.grok import compile_pattern, to_python_regex

    line = f"{w} pid={n} src={ip} level={lvl} trailer"
    c = compile_pattern(
        "%{WORD:w} pid=%{POSINT:n:int} src=%{IP:ip} level=%{LOGLEVEL:lvl}"
    )
    m = re.compile(to_python_regex(c)).match(line)
    assert m is not None, line
    got = {cap.name: m.group(cap.group) for cap in c.captures}
    assert got == {"w": w, "n": str(n), "ip": ip, "lvl": lvl}


@given(n=_posint, ip=_ipv4)
@settings(deadline=None, max_examples=100)
def test_grok_java_python_dialect_agree(n, ip):
    """The emitted regex must be valid in BOTH dialects (module contract:
    no possessive quantifiers / \\p classes). Python `re` accepting the
    translated form is asserted above; here pin that the java-dialect
    string contains no python-only (?P<...) groups and no constructs the
    JVM rejects outright."""
    from logstash_spark.grok import compile_pattern, to_java_regex

    c = compile_pattern("%{POSINT:n} %{IPV4:ip}")
    java = to_java_regex(c)
    assert "(?P<" not in java
    assert re.search(r"[*+?]\+|\\p\{", java) is None
    # behavioral check stays in the python dialect
    assert re.match(c.regex.replace("(?<", "(?P<"), f"{n} {ip}")


# ---------------------------------------------------------------------------
# Joda→strptime translation: emitted directives are self-consistent
# ---------------------------------------------------------------------------

_FULL_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "dd/MMM/yyyy:HH:mm:ss",
    "MMM dd yyyy HH:mm:ss",
    "EEE MMM dd HH:mm:ss yyyy",
    "yyyy-MM-dd'T'HH:mm:ss",
]


@given(
    dt=st.datetimes(
        min_value=datetime(1971, 1, 1), max_value=datetime(2099, 12, 31)
    ),
    joda=st.sampled_from(_FULL_FORMATS),
)
@settings(deadline=None, max_examples=200)
def test_joda_strptime_roundtrip(dt, joda):
    from logstash_spark.operators.parse import _joda_to_strptime

    dt = dt.replace(microsecond=0)
    fmt = _joda_to_strptime(joda)
    assert datetime.strptime(dt.strftime(fmt), fmt) == dt


@given(
    dt=st.datetimes(
        min_value=datetime(1971, 1, 4), max_value=datetime(2099, 12, 28)
    )
)
@settings(deadline=None, max_examples=100)
def test_joda_weekyear_maps_to_iso_week(dt):
    """xxxx.ww (Logstash index-name weekyear.week) must agree with ISO
    isocalendar — the exact rotation-boundary semantics sprintf relies on."""
    from logstash_spark.operators.parse import _joda_to_strptime

    fmt = _joda_to_strptime("xxxx.ww")
    iso = dt.isocalendar()
    assert dt.strftime(fmt) == f"{iso[0]:04d}.{iso[1]:02d}"


# ---------------------------------------------------------------------------
# conditional language: compiled Column ≡ a reference Python evaluator
# ---------------------------------------------------------------------------

_TAGS = ["alpha", "beta", "gamma"]
_STRS = ["web", "app", "db", "edge-7", "x y"]


def _leaves():
    num_op = st.sampled_from(["==", "!=", "<", ">", "<=", ">="])
    return st.one_of(
        st.tuples(st.just("num"), num_op, st.integers(-5, 5)),
        st.tuples(
            st.just("str"), st.sampled_from(["==", "!="]), st.sampled_from(_STRS)
        ),
        st.tuples(st.just("intag"), st.sampled_from(_TAGS)),
        st.tuples(st.just("regex"), st.sampled_from(["we", "app", "^db", "y$"])),
    )


_trees = st.recursive(
    _leaves(),
    lambda kids: st.one_of(
        st.tuples(st.sampled_from(["and", "or", "nand", "xor"]), kids, kids),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=8,
)


def _render(t) -> str:
    if t[0] == "num":
        return f"[x] {t[1]} {t[2]}"
    if t[0] == "str":
        return f'[s] {t[1]} "{t[2]}"'
    if t[0] == "intag":
        return f'"{t[1]}" in [tags]'
    if t[0] == "regex":
        return f"[s] =~ /{t[1]}/"
    if t[0] == "not":
        return f"!({_render(t[1])})"
    op, a, b = t
    return f"({_render(a)} {op} {_render(b)})"


_NUM_OPS = {
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b, ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
}


def _pyeval(t, row) -> bool:
    if t[0] == "num":
        return _NUM_OPS[t[1]](row["x"], t[2])
    if t[0] == "str":
        return (row["s"] == t[2]) if t[1] == "==" else (row["s"] != t[2])
    if t[0] == "intag":
        return t[1] in row["tags"]
    if t[0] == "regex":
        return re.search(t[1], row["s"]) is not None
    if t[0] == "not":
        return not _pyeval(t[1], row)
    op, a, b = t
    va, vb = _pyeval(a, row), _pyeval(b, row)
    if op == "and":
        return va and vb
    if op == "or":
        return va or vb
    if op == "nand":
        return not (va and vb)
    return va != vb  # xor


@given(tree=_trees)
@settings(**SPARK_SETTINGS)
def test_condition_compiler_matches_python_eval(spark, tree):
    from logstash_spark.operators.route import compile_condition

    rows = [
        {"x": x, "s": s, "tags": tags}
        for x in (-3, 0, 4)
        for s in _STRS
        for tags in ([], ["alpha"], ["beta", "gamma"])
    ]
    df = spark.createDataFrame(rows, "x int, s string, tags array<string>")
    expr = _render(tree)
    got = df.select(
        "x", "s", "tags", compile_condition(expr, df).alias("r")
    ).collect()
    for r in got:
        want = _pyeval(tree, {"x": r["x"], "s": r["s"], "tags": list(r["tags"])})
        assert bool(r["r"]) == want, f"{expr} on {dict(r.asDict())}"


# ---------------------------------------------------------------------------
# dissect: format → parse roundtrip
# ---------------------------------------------------------------------------

_val = st.from_regex(r"[A-Za-z0-9]{1,10}", fullmatch=True)
_delims = st.lists(
    st.sampled_from(["|", " ", ",", ":", " - ", ";", "\t"]),
    min_size=2, max_size=2, unique=True,
)


@given(
    delims=_delims,
    rows=st.lists(st.tuples(_val, _val, _val), min_size=1, max_size=20),
)
@settings(**SPARK_SETTINGS)
def test_dissect_roundtrip(spark, delims, rows):
    from logstash_spark.operators.parse import dissect

    d1, d2 = delims
    mapping = f"%{{a}}{d1}%{{b}}{d2}%{{c}}"
    df = spark.createDataFrame(
        [(f"{a}{d1}{b}{d2}{c}", a, b, c) for a, b, c in rows],
        "line string, ea string, eb string, ec string",
    )
    out = dissect(df, "line", mapping).collect()
    for r in out:
        assert "_dissectfailure" not in (r["tags"] or [])
        assert (r["a"], r["b"], r["c"]) == (r["ea"], r["eb"], r["ec"])


# ---------------------------------------------------------------------------
# kv: dict → "k=v ..." → parse roundtrip (default last-wins map)
# ---------------------------------------------------------------------------

_key = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True)


@given(
    d=st.dictionaries(_key, _val, min_size=1, max_size=6),
    dup_key=st.booleans(),
)
@settings(**SPARK_SETTINGS)
def test_kv_roundtrip_last_wins(spark, d, dup_key):
    from logstash_spark.operators.parse import kv

    pairs = [f"{k}={v}" for k, v in d.items()]
    if dup_key:  # duplicate first key: later pair must win
        first = next(iter(d))
        pairs = [f"{first}=SHADOWED"] + pairs
    line = " ".join(pairs)
    df = spark.createDataFrame([(line,)], "line string")
    out = kv(df, "line", target="kvmap").collect()[0]["kvmap"]
    assert dict(out) == d


@given(d=st.dictionaries(_key, _val, min_size=1, max_size=5))
@settings(**SPARK_SETTINGS)
def test_kv_array_mode_collects_all_values(spark, d):
    from logstash_spark.operators.parse import kv

    # every key appears twice: array mode must keep both, in order
    line = " ".join(f"{k}={v}" for k, v in d.items()) + " " + " ".join(
        f"{k}=second" for k in d
    )
    df = spark.createDataFrame([(line,)], "line string")
    out = kv(df, "line", target="kvmap", duplicates="array").collect()[0]["kvmap"]
    assert {k: list(v) for k, v in out.items()} == {
        k: [v, "second"] for k, v in d.items()
    }


# ---------------------------------------------------------------------------
# url_normalize: idempotence + param-permutation invariance
# ---------------------------------------------------------------------------

_host = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,6}){1,2}", fullmatch=True)
_seg = st.from_regex(r"[A-Za-z0-9_-]{1,8}", fullmatch=True)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=_host,
    segs=st.lists(_seg, max_size=3),
    params=st.dictionaries(_key, _val, max_size=4),
    utm=st.booleans(),
    frag=st.one_of(st.none(), _seg),
)
@settings(**SPARK_SETTINGS)
def test_url_normalize_idempotent_and_order_free(spark, scheme, host, segs, params, utm, frag):
    from logstash_spark.operators.dataprep import url_normalize

    items = [f"{k}={v}" for k, v in params.items()]
    if utm:
        items.append("utm_source=feed")
    path = "/" + "/".join(segs) if segs else ""
    q1 = "?" + "&".join(items) if items else ""
    q2 = "?" + "&".join(reversed(items)) if items else ""
    u1 = f"{scheme}://{host}{path}{q1}" + (f"#{frag}" if frag else "")
    u2 = f"{scheme}://{host}{path}{q2}"
    df = spark.createDataFrame([(u1, u2)], "u1 string, u2 string")
    r = df.select(
        url_normalize(F.col("u1")).alias("n1"),
        url_normalize(F.col("u2")).alias("n2"),
        url_normalize(url_normalize(F.col("u1"))).alias("n11"),
    ).collect()[0]
    assert r["n1"] == r["n2"], "param order must not matter"
    assert r["n11"] == r["n1"], "normalization must be idempotent"
    assert "#" not in r["n1"] and "utm_source" not in r["n1"]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
