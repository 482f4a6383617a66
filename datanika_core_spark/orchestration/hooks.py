"""Event-hook bus (O6) — same pure-Python semantics as the reference
(/root/reference/datanika/hooks.py:1-28, DESIGN.md:252-262).

Known events (emitted by the engine's jobs):
- ``run.upload_completed``       (table_count)
- ``run.models_completed``       (count)
- ``run.transformation_completed``
- ``connection.before_create``, ``schedule.before_create``
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable


class HookBus:
    def __init__(self) -> None:
        self._handlers: dict[str, list[Callable[..., Any]]] = defaultdict(list)

    def on(self, event: str, handler: Callable[..., Any]) -> None:
        self._handlers[event].append(handler)

    def off(self, event: str, handler: Callable[..., Any]) -> None:
        if handler in self._handlers.get(event, []):
            self._handlers[event].remove(handler)

    def emit(self, event: str, *args: Any, **kwargs: Any) -> list[Any]:
        return [h(*args, **kwargs) for h in list(self._handlers.get(event, []))]

    def clear(self, event: str | None = None) -> None:
        if event is None:
            self._handlers.clear()
        else:
            self._handlers.pop(event, None)


#: module-level bus, like the reference's singleton hooks module
hooks = HookBus()
