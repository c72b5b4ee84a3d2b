"""Declarative pipeline spec — our LSCL.

A Logstash config compiles to a DAG of input/filter/output vertices with
conditional edges (PipelineIR — SURVEY.md §1.2). Our spec is the same
shape as Python data: an ordered filter list (each optionally gated by a
condition string), a route table (sink → condition), and sink/aggregate
definitions. `plans.runner` turns a spec into one Catalyst plan; there is
no custom graph IR — the DAG *is* the logical plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class FilterSpec:
    """One filter vertex: registry op name + conf + optional `when` gate.

    `when` is an LSCL condition string: the op applies only to matching
    rows (filters inside `if` blocks — CompiledPipeline §splitDataset).
    """

    op: str
    conf: dict[str, Any]
    when: str | None = None


@dataclass
class SinkSpec:
    name: str
    partition_by: list[str] = field(default_factory=list)
    # columns to drop before writing, on top of the automatic @metadata
    # drop (Event.java §getMetadata is never serialized to outputs)
    drop_columns: list[str] = field(default_factory=list)
    # encode codec applied to the frame before the write — the LSCL
    # `codec => name { ... }` attribute on an output plugin (reference:
    # per-plugin codec config, logstash-core lib/logstash/config/
    # mixin.rb). The op name resolves in the OPS registry / the encode
    # adapter table in plans.lscl; conf is its kwargs.
    codec: str | None = None
    codec_conf: dict = field(default_factory=dict)


#: route-table sink names with this prefix are VIRTUAL: they feed another
#: pipeline's input (the reference's pipeline-to-pipeline `pipeline
#: { send_to => [...] }` output / `pipeline { address => ... }` input,
#: logstash pipeline_bus §PipelineBus). `pipeline:metrics` sends to
#: address `metrics`; any pipeline whose `listen` contains `metrics`
#: receives those rows. Unlike the reference there is no queue between
#: pipelines — the downstream plan composes the upstream frame directly,
#: so Catalyst fuses across the boundary.
PIPELINE_SINK_PREFIX = "pipeline:"


@dataclass
class PipelineSpec:
    name: str
    filters: list[FilterSpec]
    routes: dict[str, str]  # sink name → LSCL condition
    else_sink: str | None = None  # receives rows matching no route
    # virtual addresses this pipeline reads (pipeline { address => x })
    listen: list[str] = field(default_factory=list)
    sinks: list[SinkSpec] = field(default_factory=list)
    # per-sink aggregate dims (FIXTURES.md F5): groupBy(sink, *dims)
    aggregate_dims: list[str] = field(default_factory=lambda: ["source"])
    aggregate_sum: str | None = "n_tok"
    metrics_ts: str | None = None  # timestamp col for the metrics side table
    metrics_window: str = "5 minutes"
    # sink that receives failed events; its rows gain a _dlq_reason
    # column (joined failure tags — the reference DLQ's reason metadata)
    dlq_sink: str = "dlq"

    def sink_names(self) -> list[str]:
        names = list(self.routes)
        if self.else_sink and self.else_sink not in names:
            names.append(self.else_sink)
        for s in self.sinks:
            if s.name not in names:
                names.append(s.name)
        return names

    def virtual_sends(self) -> dict[str, str]:
        """Virtual sink name → downstream address."""
        return {
            n: n[len(PIPELINE_SINK_PREFIX):]
            for n in self.sink_names()
            if n.startswith(PIPELINE_SINK_PREFIX)
        }
