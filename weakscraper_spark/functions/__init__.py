"""User transform hooks (the reference's ``functions`` dict,
SURVEY.md §3A A11) — registered by NAME so compiled template specs
stay JSON-serializable and workers resolve callables locally."""

from .registry import REGISTRY, register, resolve  # noqa: F401
