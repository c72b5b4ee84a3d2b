"""Operator library: each function is `(df, **conf) -> df`, composable.

Mirrors the Logstash plugin inventory (SURVEY.md §2) re-expressed as
DataFrame transformations. Registry `OPS` maps logstash-style names to
implementations for the declarative pipeline spec (plans.spec).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

OPS: dict[str, Callable[..., DataFrame]] = {}


def op(name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Register an operator under its logstash-equivalent name."""

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        OPS[name] = fn
        return fn

    return deco
