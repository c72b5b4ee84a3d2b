"""logstash_spark — a from-scratch PySpark-native log/telemetry engine.

Re-expresses the capabilities of Logstash (reference: danhermann/logstash,
a fork of elastic/logstash — see SURVEY.md) as idiomatic Spark DataFrame
plans: grok/dissect parse as vectorized regex, mutate/date/kv as Catalyst
column expressions, translate enrichment as broadcast hash joins,
conditional output routing as tag-based fan-out writes, and the
aggregate/metrics filters as groupBy/window aggregations.

Design rules (SURVEY.md §4, §7.3):
  * declarative DataFrame plans — let Catalyst push down/prune/codegen;
  * pandas/Arrow UDFs only where Catalyst genuinely can't express the op
    (multi-group regex extraction in one pass); never per-row Python;
  * persist() exactly once before multi-sink fan-out;
  * deterministic everything — hashes instead of rand(), seeds fixed.
"""

__version__ = "0.1.0"

from logstash_spark.session import get_spark  # noqa: F401
