"""Declarative pipeline/step registry — the user-extension surface.

The reference's extension points are (a) a declarative endpoint dict —
add an entry (path, pagination type, cursor fields, dependencies,
priority) and a new source table exists (``extractors/repsly/
extractor.py:41-198``, YAML for Acumatica ``config/sources/
acumatica.yml:62-163``) — and (b) drop-in dbt models discovered
dynamically (``airflow/dags/repsly_dag.py:622-641``). Here:

- a ``Step`` is any ``Dataset -> Dataset`` callable registered under a
  name (the dbt-model analogue);
- a ``PipelineSpec`` declares source → ordered steps → sink, with
  dependencies resolved topologically (the endpoint-dependency
  ordering, ``extractors/repsly/extractor.py:1315-1356``);
- enable/disable flags gate execution (``config/sources/repsly.yml:
  72-99``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

STEP_REGISTRY: dict[str, Callable] = {}


def register_step(name: str):
    """Decorator: register a Dataset->Dataset transform under a name."""

    def deco(fn: Callable):
        if name in STEP_REGISTRY:
            raise ValueError(f"step {name!r} already registered")
        STEP_REGISTRY[name] = fn
        return fn

    return deco


@dataclass
class PipelineSpec:
    name: str
    source: Callable[[], Any] | None = None  # () -> Dataset
    steps: list[str] = field(default_factory=list)  # registered step names
    sink: Callable[[Any], Any] | None = None  # Dataset -> result
    depends_on: list[str] = field(default_factory=list)
    enabled: bool = True
    # the dbt ``ref()`` analogue: read this pipeline's input from another
    # pipeline's RESULT instead of an external source — the model-chain
    # edge (raw → silver → gold, ``airflow/dags/repsly_dag.py:722-785``).
    # Mutually exclusive with ``source``; implies a dependency.
    source_pipeline: str | None = None


class PipelineRegistry:
    def __init__(self):
        self.pipelines: dict[str, PipelineSpec] = {}

    def add(self, spec: PipelineSpec) -> None:
        if spec.name in self.pipelines:
            raise ValueError(f"pipeline {spec.name!r} already registered")
        unknown = [s for s in spec.steps if s not in STEP_REGISTRY]
        if unknown:
            raise ValueError(f"unregistered steps {unknown} in {spec.name!r}")
        if (spec.source is None) == (spec.source_pipeline is None):
            raise ValueError(
                f"pipeline {spec.name!r} needs exactly one of source / source_pipeline"
            )
        if spec.source_pipeline is not None and spec.source_pipeline not in spec.depends_on:
            spec.depends_on = [*spec.depends_on, spec.source_pipeline]
        self.pipelines[spec.name] = spec

    def topo_order(self) -> list[str]:
        """Dependency-respecting execution order (Kahn)."""
        pending = {n: set(s.depends_on) for n, s in self.pipelines.items() if s.enabled}
        for deps in pending.values():
            deps.intersection_update(pending)
        order: list[str] = []
        while pending:
            ready = sorted(n for n, d in pending.items() if not d)
            if not ready:
                raise ValueError(f"dependency cycle among {sorted(pending)}")
            for n in ready:
                order.append(n)
                del pending[n]
            for d in pending.values():
                d.difference_update(ready)
        return order

    def run(self, only: list[str] | None = None) -> dict[str, Any]:
        """Execute enabled pipelines in dependency order; each pipeline
        is source → steps (chained lazily) → sink. ``only`` is closed
        over transitive dependencies (asking for a gold model runs the
        silver model it ``ref``s first), and the results of every
        executed pipeline are returned."""
        wanted: set[str] | None = None
        if only is not None:
            wanted = set()
            stack = list(only)
            while stack:
                n = stack.pop()
                if n in wanted:
                    continue
                if n not in self.pipelines:
                    raise KeyError(f"unknown pipeline {n!r}")
                wanted.add(n)
                stack.extend(self.pipelines[n].depends_on)
        results: dict[str, Any] = {}
        for name in self.topo_order():
            if wanted is not None and name not in wanted:
                continue
            spec = self.pipelines[name]
            if spec.source_pipeline is not None:
                if spec.source_pipeline not in results:
                    # topo_order() drops disabled pipelines silently; a
                    # bare KeyError here would hide the actual cause
                    raise ValueError(
                        f"pipeline {name!r} reads from {spec.source_pipeline!r}, "
                        "which is disabled or did not execute — enable it or "
                        "remove the dependent"
                    )
                ds = results[spec.source_pipeline]
            else:
                ds = spec.source()
            for step_name in spec.steps:
                ds = STEP_REGISTRY[step_name](ds)
            results[name] = spec.sink(ds) if spec.sink else ds
        return results
