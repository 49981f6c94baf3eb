"""User-extension surface (SURVEY.md §2.10): a pipeline-stage protocol,
a mention-detector registry, and injectable scorer/sink seams.

The reference's only extension surface is CLI flags (arguments.py:1-201);
this is the idiomatic replacement: stages are objects with
``apply(ds, ctx) -> Dataset``, composed left-to-right; detectors register
by name; the linker scorer class is a constructor argument of the link
stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

import ray.data


@dataclass
class StageContext:
    """Shared per-run state: config, broadcast handles, metrics sink."""

    config: object | None = None
    broadcasts: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)


@runtime_checkable
class Stage(Protocol):
    name: str

    def apply(self, ds: ray.data.Dataset,
              ctx: StageContext) -> ray.data.Dataset: ...


@dataclass
class FnStage:
    """Adapter: lift a ``(ds, ctx) -> ds`` function into a Stage."""

    name: str
    fn: Callable[[ray.data.Dataset, StageContext], ray.data.Dataset]

    def apply(self, ds, ctx):
        return self.fn(ds, ctx)


def compose(stages: list[Stage]):
    """Left-to-right stage composition over a shared StageContext."""

    def run(ds: ray.data.Dataset, ctx: StageContext | None = None):
        ctx = ctx or StageContext()
        for st in stages:
            ds = st.apply(ds, ctx)
        return ds

    return run


# ------------------------------------------------------- detector registry

_DETECTORS: dict[str, Callable] = {}


def register_detector(name: str):
    """Decorator: register a detector factory. A factory returns a callable
    ``(text: str) -> list[tuple[offset, surface, ent_type]]`` used by
    custom extract stages."""

    def deco(factory: Callable):
        _DETECTORS[name] = factory
        return factory

    return deco


def get_detector(name: str) -> Callable:
    try:
        return _DETECTORS[name]
    except KeyError:
        raise KeyError(
            f"no detector {name!r}; registered: {sorted(_DETECTORS)}")


@register_detector("regex")
def _regex_detector(pattern: str, ent_type: str = ""):
    import re

    rex = re.compile(pattern)

    def detect(text: str):
        return [(m.start(), m.group(), ent_type) for m in rex.finditer(text)]

    return detect


@register_detector("gazetteer")
def _gazetteer_detector(surface_to_type: dict[str, str]):
    import re

    # alternation, longest-first so overlapping surfaces prefer the longest
    alts = sorted(surface_to_type, key=len, reverse=True)
    rex = re.compile("|".join(re.escape(s) for s in alts)) if alts else None

    def detect(text: str):
        if rex is None:
            return []
        return [(m.start(), m.group(), surface_to_type[m.group()])
                for m in rex.finditer(text)]

    return detect
