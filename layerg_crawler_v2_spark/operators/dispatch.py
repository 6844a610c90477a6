"""Handler registry: per-type dispatch of an event stream to transforms.

Graft analog of the generated router + handler registry
(cmd/handler_registry.go:27-63, generated/router/router.go:35-74): the
reference switches on an event's topic signature and routes the decoded log
to its registered handler. Here a handler is a DataFrame transform over the
rows of one type, and dispatch is filter-per-type + union — Catalyst
collapses the per-type filters into one scan-side predicate each, and the
union branches run as independent jobs of one DAG (no row-at-a-time switch).

Handlers must all emit the SAME schema (the reference's handlers all emit
entity upserts; here the shared shape is enforced by unionByName). Rows of
unregistered types go to `default` when given, else are dropped — the
reference's unrouted-log behavior (router.go:70-73).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Handler = Callable[[DataFrame], DataFrame]


class HandlerRegistry:
    def __init__(self, type_col: str = "event_type"):
        self.type_col = type_col
        self._handlers: dict[str, Handler] = {}
        self._default: Handler | None = None

    def register(self, event_type: str, handler: Handler) -> "HandlerRegistry":
        if event_type in self._handlers:
            raise ValueError(f"handler already registered for {event_type!r}")
        self._handlers[event_type] = handler
        return self

    def register_default(self, handler: Handler) -> "HandlerRegistry":
        self._default = handler
        return self

    def dispatch(self, df: DataFrame) -> DataFrame:
        """Route rows to their type's handler; union the typed outputs."""
        if not self._handlers and self._default is None:
            raise ValueError("no handlers registered")
        parts: list[DataFrame] = []
        for etype, handler in sorted(self._handlers.items()):
            parts.append(handler(df.filter(F.col(self.type_col) == etype)))
        if self._default is not None:
            known = list(self._handlers)
            parts.append(self._default(df.filter(~F.col(self.type_col).isin(known))))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
