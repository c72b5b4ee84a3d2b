"""External-lookup enrichment family (dns/http/memcached/jdbc_streaming
analogs): client seam, caches, failure tagging, both plan shapes.

Reference semantics: logstash-filter-dns (resolve/reverse, action
replace|append, hit/failed caches, tag_on_failure),
logstash-filter-jdbc_streaming (row-list target), SURVEY.md §2.5.
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from logstash_spark.operators.lookup import (
    DictClient,
    SqliteLookupClient,
    _lru_put,
    dns_filter,
    jdbc_streaming_filter,
    lookup_enrich,
    memcached_filter,
)

MAPPING = {"host-0": "10.0.0.1", "host-1": "10.0.0.2", "host-2": "10.0.0.3"}


def _mk(spark):
    rows = [
        Row(id=1, host="host-0"),
        Row(id=2, host="host-1"),
        Row(id=3, host="missing"),
        Row(id=4, host=None),
        Row(id=5, host="host-0"),  # duplicate key: dedup/cache path
    ]
    return spark.createDataFrame(rows)


def test_lookup_inline_values_and_tags(spark):
    df = _mk(spark)
    out = lookup_enrich(
        df, "host", "ip", lambda: DictClient(MAPPING), client_key="t-basic"
    ).orderBy("id")
    got = {r["id"]: (r["ip"], r["tags"]) for r in out.collect()}
    assert got[1] == ("10.0.0.1", None) or got[1][0] == "10.0.0.1"
    assert got[2][0] == "10.0.0.2"
    assert got[3][0] is None and list(got[3][1]) == ["_lookupfailure"]
    # null key: no lookup, no tag
    assert got[4][0] is None and not got[4][1]
    assert got[5][0] == "10.0.0.1"


def test_lookup_distinct_mode_matches_inline(spark):
    df = _mk(spark)
    a = lookup_enrich(
        df, "host", "ip", lambda: DictClient(MAPPING), client_key="t-a"
    )
    b = lookup_enrich(
        df, "host", "ip", lambda: DictClient(MAPPING),
        client_key="t-b", distinct_keys=True,
    )
    cols = ["id", "host", "ip", "tags"]
    assert sorted(map(str, a.select(cols).collect())) == sorted(
        map(str, b.select(cols).collect())
    )


def test_lookup_preserves_existing_tags(spark):
    df = _mk(spark).withColumn("tags", F.array(F.lit("seen")))
    out = lookup_enrich(
        df, "host", "ip", lambda: DictClient(MAPPING), client_key="t-tags"
    )
    got = {r["id"]: list(r["tags"]) for r in out.collect()}
    assert got[3] == ["seen", "_lookupfailure"]
    assert got[1] == ["seen"]


def test_in_batch_dedupe_single_client_call(spark):
    # 100 rows, 3 distinct keys, single partition → the client sees each
    # distinct key at most once per worker (in-batch dedupe + LRU).
    # RaisingClient throws on any repeat, so success == dedupe worked.
    class RaisingClient:
        def __init__(self):
            self.seen = set()

        def lookup(self, keys):
            dup = [k for k in keys if k in self.seen]
            assert not dup, f"re-looked-up keys: {dup}"
            self.seen.update(keys)
            return {k: MAPPING[k] for k in keys if k in MAPPING}

    df = spark.createDataFrame(
        [Row(id=i, host=f"host-{i % 3}") for i in range(100)]
    ).coalesce(1)
    out = lookup_enrich(
        df, "host", "ip", RaisingClient, client_key="t-dedupe"
    )
    assert out.where(F.col("ip").isNotNull()).count() == 100


def test_lru_put_evicts_oldest():
    from collections import OrderedDict

    c = OrderedDict()
    for i in range(5):
        _lru_put(c, i, i, maxsize=3)
    assert list(c) == [2, 3, 4]


def test_dns_replace_and_append(spark):
    df = _mk(spark)
    rep = dns_filter(
        df, resolve=["host"],
        client_factory=lambda: DictClient(MAPPING), client_key="t-dnsr",
    )
    got = {r["id"]: r["host"] for r in rep.collect()}
    assert got[1] == "10.0.0.1"
    assert got[3] == "missing"  # failed resolve keeps original (replace)
    tags = {r["id"]: r["tags"] for r in rep.collect()}
    assert list(tags[3]) == ["_dnsfailure"]

    app = dns_filter(
        df, resolve=["host"], action="append",
        client_factory=lambda: DictClient(MAPPING), client_key="t-dnsa",
    )
    got = {r["id"]: r["host"] for r in app.collect()}
    assert list(got[1]) == ["host-0", "10.0.0.1"]
    assert list(got[3]) == ["missing"]


def test_memcached_miss_untagged(spark):
    df = _mk(spark)
    out = memcached_filter(
        df, "host", "cached",
        client_factory=lambda: DictClient({"host-0": "v0"}),
        client_key="t-mc",
    )
    assert "tags" not in out.columns  # no tagging → no tags column added
    got = {r["id"]: r["cached"] for r in out.collect()}
    assert got[1] == "v0"
    assert got[2] is None  # miss: no value, NO tag


def test_jdbc_streaming_sqlite_roundtrip(spark, tmp_path):
    import sqlite3

    db = os.path.join(str(tmp_path), "lk.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE geo (host TEXT, code TEXT, region TEXT)")
    conn.executemany(
        "INSERT INTO geo VALUES (?,?,?)",
        [
            ("host-0", "US", "west"),
            ("host-0", "US", "east"),
            ("host-1", "DE", "eu"),
        ],
    )
    conn.commit()
    conn.close()

    df = _mk(spark)
    out = jdbc_streaming_filter(
        df, "host", "geo",
        client_factory=lambda: SqliteLookupClient(
            db, "SELECT code, region FROM geo WHERE host = ? ORDER BY region"
        ),
        client_key=f"t-jdbc:{db}",
        value_type="array<struct<code:string,region:string>>",
    )
    got = {r["id"]: r["geo"] for r in out.collect()}
    assert [(g["code"], g["region"]) for g in got[1]] == [
        ("US", "east"),
        ("US", "west"),
    ]
    assert [(g["code"], g["region"]) for g in got[2]] == [("DE", "eu")]
    assert got[3] is None
    tags = {r["id"]: r["tags"] for r in out.collect()}
    assert list(tags[3]) == ["_jdbcstreamingfailure"]


def test_lookup_inline_plan_shape(spark):
    # inline mode: exactly one Arrow mapInPandas node, NO Exchange —
    # the corpus never shuffles (SCALE.md §3c)
    df = _mk(spark)
    out = lookup_enrich(
        df, "host", "ip", lambda: DictClient(MAPPING), client_key="t-plan"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_lookup_distinct_plan_broadcasts_resolved_side(spark):
    # distinct_keys mode: resolved side comes back via BroadcastHashJoin
    # (corpus side stays unshuffled); the only Exchange is the distinct
    # over the narrow key projection
    df = _mk(spark)
    out = lookup_enrich(
        df, "host", "ip", lambda: DictClient(MAPPING),
        client_key="t-plan2", distinct_keys=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lookup_small_cache_still_resolves_all(spark):
    # regression: values must come from the batch-local result map, not
    # the LRU — with hit_cache_size smaller than the batch's distinct
    # keys, every resolved key still gets its value (no silent nulls)
    n_keys = 20
    mapping = {f"k{i}": f"v{i}" for i in range(n_keys)}
    df = spark.createDataFrame(
        [Row(id=i, host=f"k{i}") for i in range(n_keys)]
    ).coalesce(1)
    out = lookup_enrich(
        df, "host", "ip", lambda: DictClient(mapping),
        client_key="t-smallcache", hit_cache_size=3, failed_cache_size=3,
    )
    got = {r["id"]: r["ip"] for r in out.collect()}
    assert got == {i: f"v{i}" for i in range(n_keys)}


def test_lookup_in_place_target(spark):
    # regression: target == field (in-place enrichment) must work, not
    # KeyError in the worker
    df = _mk(spark)
    out = lookup_enrich(
        df, "host", "host", lambda: DictClient(MAPPING), client_key="t-inplace"
    )
    got = {r["id"]: r["host"] for r in out.collect()}
    assert got[1] == "10.0.0.1" and got[3] is None


def test_dns_resolve_and_reverse_separate_clients(spark):
    # regression: resolve and reverse with one client_key must not share
    # a memoized client (direction suffix is always appended)
    fwd = {"host-0": "10.0.0.1"}
    rev = {"10.9.9.9": "back.example.com"}

    class DirClient:
        def __init__(self, mapping):
            self.m = mapping

        def lookup(self, keys):
            return {k: self.m[k] for k in keys if k in self.m}

    df = spark.createDataFrame([Row(id=1, host="host-0", addr="10.9.9.9")])
    out = dns_filter(
        dns_filter(
            df, resolve=["host"],
            client_factory=lambda: DirClient(fwd), client_key="t-dir",
        ),
        reverse=["addr"],
        client_factory=lambda: DirClient(rev), client_key="t-dir",
    ).head()
    assert out["host"] == "10.0.0.1"
    assert out["addr"] == "back.example.com"


def test_lookup_null_numeric_key_untagged(spark):
    # regression: nullable LONG keys arrive in pandas as NaN — they must
    # stay untagged (null-key contract), not get _lookupfailure
    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, 999)], "id long, code long"
    )
    out = lookup_enrich(
        df, "code", "name", lambda: DictClient({100: "hundred"}),
        client_key="t-nan",
    )
    got = {r["id"]: (r["name"], r["tags"]) for r in out.collect()}
    assert got[1] == ("hundred", None)
    assert got[2][0] is None and not got[2][1]  # null key: no tag
    assert got[3][0] is None and list(got[3][1]) == ["_lookupfailure"]


def test_elasticsearch_filter_fields_copy(spark):
    from logstash_spark.operators.lookup import elasticsearch_filter

    class EsClient:
        # {query key: hit _source}
        M = {
            "q-1": {"status": "active", "plan": "pro"},
            "q-2": {"status": "trial", "plan": "free"},
        }

        def lookup(self, keys):
            return {k: self.M[k] for k in keys if k in self.M}

    df = spark.createDataFrame(
        [Row(id=1, qk="q-1"), Row(id=2, qk="q-2"), Row(id=3, qk="q-404")]
    )
    out = elasticsearch_filter(
        df, "qk",
        fields={"status": "acct_status", "plan": "acct_plan"},
        client_factory=EsClient, client_key="t-es",
    )
    got = {r["id"]: (r["acct_status"], r["acct_plan"], r["tags"]) for r in out.collect()}
    assert got[1] == ("active", "pro", None)
    assert got[2] == ("trial", "free", None)
    assert got[3][0] is None and list(got[3][2]) == ["_elasticsearch_lookup_failure"]
    assert "_es_hit" not in out.columns
