"""External-lookup enrichment family: the Logstash filters whose value
comes from a remote service — dns, http, memcached, jdbc_streaming,
elasticsearch (filter) — re-expressed as ONE generic Spark operator.

Reference behavior being matched (plugin gems, see SURVEY.md §2.5):
  - logstash-filter-dns: `resolve`/`reverse` field lists, replace or
    append action, `hit_cache_size` / `failed_cache_size` LRU caches,
    `tag_on_failure`.
  - logstash-filter-http / -memcached / -jdbc_streaming /
    -elasticsearch: per-event remote lookup into `target`, with a local
    cache and failure tagging.

Architecture (scale-first, SURVEY §7.4 pattern "mapInPandas with
memoized client"):
  - `lookup_enrich` runs ONE Arrow-batched `mapInPandas` over the rows:
    zero shuffle, the corpus never moves. Each Python worker builds the
    client ONCE (module-level memo keyed by `client_key`; workers are
    reused across tasks with spark.python.worker.reuse=true, the
    default) and keeps per-worker LRU hit/failed caches, so a key is
    resolved at most once per worker process, not once per row.
  - Within each Arrow batch the keys are DEDUPLICATED and the client is
    called with bounded chunks (`max_batch_keys`) — external RPCs are
    O(distinct keys), never O(rows).
  - `distinct_keys=True` switches to the cluster-global plan: project
    `SELECT DISTINCT key`, resolve that (small) side, broadcast-join it
    back. One shuffle for the distinct, but each key is resolved once
    per CLUSTER — the right trade when key cardinality ≪ row count
    (e.g. 100 TB of events over 10^5 hostnames).
  - Failure surfaces JVM-side: the pandas stage emits a `_lookup_failed`
    flag; tag append / action handling is plain column algebra, so
    everything after the lookup stays in whole-stage codegen.

The client is an injected seam: any picklable zero-arg factory returning
an object with `lookup(keys: list) -> dict{key: value}`. Functional
clients included: `SocketDnsClient` (stdlib DNS resolve/reverse),
`HttpGetClient` (stdlib urllib GET), `SqliteLookupClient` (stdlib
sqlite3 — the jdbc_streaming analog; a real cluster swaps in
`spark.read.jdbc` or a JDBC driver). `DictClient` is the deterministic
in-memory client used by the oracle gates and memcached-style tests.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable, Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.operators import op

# Per-Python-worker memoization: survives across tasks/batches while the
# worker process lives (spark.python.worker.reuse=true by default).
_WORKER_CLIENTS: dict[str, Any] = {}
_WORKER_CACHES: dict[str, tuple[OrderedDict, OrderedDict]] = {}


def _lru_put(cache: OrderedDict, key: Any, val: Any, maxsize: int) -> None:
    cache[key] = val
    cache.move_to_end(key)
    while len(cache) > maxsize:
        cache.popitem(last=False)


class DictClient:
    """Deterministic in-memory client (tests + oracle gates; also the
    memcached-analog when the cache contents are known up front)."""

    def __init__(self, mapping: Mapping[Any, Any]):
        self._m = dict(mapping)
        self.calls = 0
        self.keys_seen = 0

    def lookup(self, keys: Sequence[Any]) -> dict[Any, Any]:
        self.calls += 1
        self.keys_seen += len(keys)
        return {k: self._m[k] for k in keys if k in self._m}


class SocketDnsClient:
    """Real DNS via the OS resolver (stdlib socket). `reverse=True`
    turns addresses back into hostnames (logstash-filter-dns `reverse`)."""

    def __init__(self, reverse: bool = False):
        self._reverse = reverse

    def lookup(self, keys: Sequence[str]) -> dict[str, str]:
        import socket

        out: dict[str, str] = {}
        for k in keys:
            try:
                if self._reverse:
                    out[k] = socket.gethostbyaddr(k)[0]
                else:
                    out[k] = socket.gethostbyname(k)
            except OSError:
                pass  # miss → failed cache + tag downstream
        return out


class HttpGetClient:
    """logstash-filter-http analog: GET `url_template` with `%{key}`
    substituted, body (utf-8) is the value. stdlib urllib — a real
    deployment would swap a pooled session in via the same seam."""

    def __init__(self, url_template: str, timeout: float = 5.0):
        self.url_template = url_template
        self.timeout = timeout

    def lookup(self, keys: Sequence[str]) -> dict[str, str]:
        import urllib.parse
        import urllib.request

        out: dict[str, str] = {}
        for k in keys:
            url = self.url_template.replace("%{key}", urllib.parse.quote(str(k)))
            try:
                with urllib.request.urlopen(url, timeout=self.timeout) as r:
                    out[k] = r.read().decode("utf-8", errors="replace")
            except OSError:
                pass
        return out


class SqliteLookupClient:
    """logstash-filter-jdbc_streaming analog over stdlib sqlite3: runs
    `statement` (one `?` placeholder = the key) per distinct key and
    returns the row list as list-of-dicts (the filter's `target` is an
    array of result rows). On a cluster the same seam takes a JDBC
    client; bulk loads go through `spark.read.jdbc` instead."""

    def __init__(self, db_path: str, statement: str):
        self.db_path = db_path
        self.statement = statement
        self._conn = None

    def _connect(self):
        if self._conn is None:
            import sqlite3

            self._conn = sqlite3.connect(self.db_path)
            self._conn.row_factory = sqlite3.Row
        return self._conn

    def lookup(self, keys: Sequence[Any]) -> dict[Any, list[dict]]:
        conn = self._connect()
        out: dict[Any, list[dict]] = {}
        for k in keys:
            rows = [dict(r) for r in conn.execute(self.statement, (k,))]
            if rows:
                out[k] = rows
        return out


def _chunks(seq: list, n: int):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


def lookup_enrich(
    df: DataFrame,
    field: str,
    target: str,
    client_factory: Callable[[], Any],
    *,
    client_key: str,
    value_type: str = "string",
    hit_cache_size: int = 10_000,
    failed_cache_size: int = 10_000,
    max_batch_keys: int = 1_000,
    tag_on_failure: Sequence[str] = ("_lookupfailure",),
    tags_col: str = "tags",
    distinct_keys: bool = False,
) -> DataFrame:
    """Enrich `target` from an external lookup on `field`.

    Inline mode (default): one mapInPandas pass, per-worker client memo
    + LRU caches, in-batch key dedupe — zero shuffle.
    `distinct_keys=True`: resolve `SELECT DISTINCT field` then
    broadcast-join back — one shuffle, one resolution per key per
    cluster. Identical results either way (tested).

    Null keys are passed through untagged (reference: no lookup
    attempted). Misses/errors null the target and append
    `tag_on_failure` to `tags_col`.
    """
    if distinct_keys:
        return _lookup_via_distinct(
            df, field, target, client_factory,
            client_key=client_key, value_type=value_type,
            max_batch_keys=max_batch_keys, tag_on_failure=tag_on_failure,
            tags_col=tags_col,
        )

    import pandas as pd

    # the pandas stage always emits a reserved output column; the final
    # withColumn maps it onto `target`, so in-place enrichment
    # (target == field) works instead of crashing in the worker
    out_col = "_lk_out"
    in_fields = df.schema.fieldNames()
    passthrough = [f for f in in_fields if f not in (out_col, "_lookup_failed")]
    proj = df.select(*passthrough)
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in proj.schema.fields
    ) + f", `{out_col}` {value_type}, `_lookup_failed` boolean"

    fac, ckey = client_factory, client_key
    hit_n, fail_n, chunk_n = hit_cache_size, failed_cache_size, max_batch_keys

    def run(batches):
        client = _WORKER_CLIENTS.get(ckey)
        if client is None:
            client = _WORKER_CLIENTS[ckey] = fac()
        hits, fails = _WORKER_CACHES.setdefault(
            ckey, (OrderedDict(), OrderedDict())
        )
        for pdf in batches:
            keys = pdf[field]
            # batch-local result map: row values are filled from THIS
            # map, never from the LRUs, so cache eviction within a large
            # batch can't silently null out resolved values — the LRUs
            # only pre-seed across batches
            local: dict = {}
            need = []
            for k in pd.unique(keys.dropna()):
                if k in hits:
                    local[k] = hits[k]
                    hits.move_to_end(k)
                elif k not in fails:
                    need.append(k)
            for chunk in _chunks(need, chunk_n):
                try:
                    res = client.lookup(list(chunk))
                except Exception:
                    res = {}
                for k in chunk:
                    if k in res:
                        local[k] = res[k]
                        _lru_put(hits, k, res[k], hit_n)
                    else:
                        _lru_put(fails, k, True, fail_n)
            # pd.isna, not `is None`: Arrow hands nullable numeric key
            # columns to pandas as float64 with NaN nulls — those must
            # stay untagged per the null-key contract
            vals = [None if pd.isna(k) else local.get(k) for k in keys]
            failed = [not pd.isna(k) and k not in local for k in keys]
            yield pdf.assign(**{out_col: vals, "_lookup_failed": failed})

    out = proj.mapInPandas(run, out_ddl)
    out = out.withColumn(target, F.col(out_col))
    if target != out_col:
        out = out.drop(out_col)
    return _apply_failure_tags(out, tag_on_failure, tags_col)


def _lookup_via_distinct(
    df: DataFrame,
    field: str,
    target: str,
    client_factory: Callable[[], Any],
    *,
    client_key: str,
    value_type: str,
    max_batch_keys: int,
    tag_on_failure: Sequence[str],
    tags_col: str,
) -> DataFrame:
    """Cluster-global variant: distinct keys → resolve → broadcast join."""
    import pandas as pd

    key_t = df.schema[field].dataType.simpleString()
    keys_df = df.select(F.col(field).alias("_lk_key")).where(
        F.col(field).isNotNull()
    ).distinct()
    out_ddl = f"`_lk_key` {key_t}, `_lk_val` {value_type}, `_lk_ok` boolean"
    fac, ckey, chunk_n = client_factory, client_key, max_batch_keys

    def resolve(batches):
        client = _WORKER_CLIENTS.get(ckey)
        if client is None:
            client = _WORKER_CLIENTS[ckey] = fac()
        for pdf in batches:
            uniq = list(pd.unique(pdf["_lk_key"].dropna()))
            res: dict = {}
            for chunk in _chunks(uniq, chunk_n):
                try:
                    res.update(client.lookup(list(chunk)))
                except Exception:
                    pass
            yield pd.DataFrame(
                {
                    "_lk_key": pdf["_lk_key"],
                    "_lk_val": [res.get(k) for k in pdf["_lk_key"]],
                    "_lk_ok": [k in res for k in pdf["_lk_key"]],
                }
            )

    resolved = keys_df.mapInPandas(resolve, out_ddl)
    joined = df.join(
        F.broadcast(resolved), df[field] == resolved["_lk_key"], "left"
    )
    out = (
        joined.withColumn(target, F.col("_lk_val"))
        .withColumn(
            "_lookup_failed",
            F.col(field).isNotNull() & ~F.coalesce(F.col("_lk_ok"), F.lit(False)),
        )
        .drop("_lk_key", "_lk_val", "_lk_ok")
    )
    return _apply_failure_tags(out, tag_on_failure, tags_col)


def _apply_failure_tags(
    df: DataFrame, tag_on_failure: Sequence[str], tags_col: str
) -> DataFrame:
    """JVM-side tag append from the `_lookup_failed` flag (keeps the
    post-lookup plan in whole-stage codegen)."""
    if not tag_on_failure:
        return df.drop("_lookup_failed")
    # when the df had no tags column, untagged rows keep NULL (Logstash
    # events have no `tags` field until something sets it), not []
    tags = (
        F.col(tags_col)
        if tags_col in df.columns
        else F.lit(None).cast("array<string>")
    )
    tagged = F.when(
        F.col("_lookup_failed"),
        F.array_union(
            F.coalesce(tags, F.array().cast("array<string>")),
            F.array(*[F.lit(t) for t in tag_on_failure]),
        ),
    ).otherwise(tags)
    return df.withColumn(tags_col, tagged).drop("_lookup_failed")


# ---------------------------------------------------------------------------
# Thin plugin-shaped wrappers
# ---------------------------------------------------------------------------


@op("dns")
def dns_filter(
    df: DataFrame,
    resolve: Sequence[str] = (),
    reverse: Sequence[str] = (),
    *,
    action: str = "replace",
    client_factory: Callable[[], Any] | None = None,
    client_key: str | None = None,
    hit_cache_size: int = 10_000,
    failed_cache_size: int = 10_000,
    tag_on_failure: Sequence[str] = ("_dnsfailure",),
    distinct_keys: bool = False,
) -> DataFrame:
    """logstash-filter-dns: resolve hostnames in `resolve` fields (and
    reverse-resolve addresses in `reverse` fields). `action=replace`
    overwrites the field; `action=append` keeps the original and makes
    the field `array<string>` [original, resolved] on success (the
    reference appends to the field-as-list). Default client is the OS
    resolver; tests inject `DictClient`."""
    if action not in ("replace", "append"):
        raise ValueError(f"dns action must be replace|append, got {action!r}")
    for fields, rev in ((resolve, False), (reverse, True)):
        for f_name in fields:
            fac = client_factory or (lambda rev=rev: SocketDnsClient(reverse=rev))
            # direction suffix is ALWAYS appended: resolve and reverse
            # use different clients, so they must never share a memo slot
            ckey = f"{client_key or 'dns'}:{'rev' if rev else 'fwd'}"
            tmp = f"_{f_name}_resolved"
            df = lookup_enrich(
                df, f_name, tmp, fac,
                client_key=ckey, value_type="string",
                hit_cache_size=hit_cache_size,
                failed_cache_size=failed_cache_size,
                tag_on_failure=tag_on_failure,
                distinct_keys=distinct_keys,
            )
            if action == "replace":
                df = df.withColumn(
                    f_name, F.coalesce(F.col(tmp), F.col(f_name))
                ).drop(tmp)
            else:  # append
                df = df.withColumn(
                    f_name,
                    F.when(
                        F.col(tmp).isNotNull(),
                        F.array(F.col(f_name), F.col(tmp)),
                    ).otherwise(F.array(F.col(f_name))),
                ).drop(tmp)
    return df


@op("http")
def http_filter(
    df: DataFrame,
    url_template: str,
    key_field: str,
    target: str = "http_response",
    *,
    client_factory: Callable[[], Any] | None = None,
    client_key: str | None = None,
    tag_on_failure: Sequence[str] = ("_httprequestfailure",),
    **kw: Any,
) -> DataFrame:
    """logstash-filter-http analog: GET url_template (`%{key}` ← field
    value), response body into `target`."""
    fac = client_factory or (lambda: HttpGetClient(url_template))
    return lookup_enrich(
        df, key_field, target, fac,
        client_key=client_key or f"http:{url_template}",
        tag_on_failure=tag_on_failure, **kw,
    )


@op("memcached")
def memcached_filter(
    df: DataFrame,
    key_field: str,
    target: str,
    *,
    client_factory: Callable[[], Any],
    client_key: str,
    tag_on_failure: Sequence[str] = (),
    **kw: Any,
) -> DataFrame:
    """logstash-filter-memcached GET analog. The client seam takes a
    pymemcache-style wrapper on a real deployment; by default a miss is
    NOT tagged (reference: absent key is normal for a cache)."""
    return lookup_enrich(
        df, key_field, target, client_factory,
        client_key=client_key, tag_on_failure=tag_on_failure, **kw,
    )


@op("jdbc_streaming")
def jdbc_streaming_filter(
    df: DataFrame,
    key_field: str,
    target: str,
    *,
    client_factory: Callable[[], Any],
    client_key: str,
    value_type: str,
    tag_on_failure: Sequence[str] = ("_jdbcstreamingfailure",),
    **kw: Any,
) -> DataFrame:
    """logstash-filter-jdbc_streaming: per-key SQL lookup, result-row
    list into `target` (`value_type` e.g. 'array<struct<code:string,
    region:string>>'). `SqliteLookupClient` is the in-repo functional
    client; a cluster swaps a JDBC wrapper through the same seam."""
    return lookup_enrich(
        df, key_field, target, client_factory,
        client_key=client_key, value_type=value_type,
        tag_on_failure=tag_on_failure, **kw,
    )


@op("elasticsearch")
def elasticsearch_filter(
    df: DataFrame,
    query_field: str,
    *,
    fields: Mapping[str, str],
    client_factory: Callable[[], Any],
    client_key: str,
    tag_on_failure: Sequence[str] = ("_elasticsearch_lookup_failure",),
    **kw: Any,
) -> DataFrame:
    """logstash-filter-elasticsearch analog: search a previous-events
    store by a key derived from the current event, copy `fields`
    (hit-source path → event field) out of the FIRST hit — the
    reference's default `result_size => 1` behavior.

    The client seam returns {key: {source_field: value}} for resolved
    keys (an elasticsearch-py wrapper on a real deployment; any dict
    client in tests). One lookup populates ALL requested fields, so the
    wire cost matches the reference's single search per event — the
    struct lands once and `getField` fans it out column-side.
    """
    value_type = "map<string,string>"
    hit = "_es_hit"
    out = lookup_enrich(
        df, query_field, hit, client_factory,
        client_key=client_key, value_type=value_type,
        tag_on_failure=tag_on_failure, **kw,
    )
    for src_path, dst in fields.items():
        out = out.withColumn(dst, F.col(hit).getItem(src_path))
    return out.drop(hit)
