"""wp-function registry.

The reference passes ``functions: dict[str, callable]`` into
``WeakScraper(template, functions)`` and applies them to captured
values (reference: weakscraper/weakscraper.py ≈15, template.py ≈200;
approx cites, SURVEY §0). In the Spark engine callables must NOT ride
inside the broadcast spec (pickled closures break --py-files version
stability, SURVEY §8 risk register) — templates reference functions
by name; executors resolve them here at match time.
"""

from __future__ import annotations

from typing import Any, Callable

REGISTRY: dict[str, Callable[[Any], Any]] = {}


def register(name: str, fn: Callable[[Any], Any] | None = None):
    """Register a transform hook: ``register('to_int', int)`` or as a
    decorator ``@register('slug')``."""
    if fn is not None:
        REGISTRY[name] = fn
        return fn

    def deco(f):
        REGISTRY[name] = f
        return f

    return deco


def resolve(names_or_none: dict | None = None) -> dict[str, Callable]:
    """Functions dict for the matcher: the global registry, optionally
    overlaid with per-call extras."""
    out = dict(REGISTRY)
    if names_or_none:
        out.update(names_or_none)
    return out


# -- built-ins (a practical default set) -----------------------------------
register("to_int", lambda v: int(str(v).strip()))
register("to_float", lambda v: float(str(v).strip()))
register("lower", lambda v: str(v).lower())
register("upper", lambda v: str(v).upper())
register("strip", lambda v: str(v).strip())
register("strip_currency",
         lambda v: str(v).strip().lstrip("$€£¥").replace(",", ""))
