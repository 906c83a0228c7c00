"""Run-outcome notification hooks (SURVEY §2.1 S11).

The reference posts success/failure messages to a Lark group chat via a
callback wired into the DAG (reference dags/utils/notifier.py:6-18,
dags/utils/lark.py:114-134, dags/etl/run_etl.py:29-30). The chat API is
out of query scope; the engine keeps the *hook surface* — a notifier
receives the run outcome — with a logging implementation. A real
deployment drops in an HTTP notifier with the same interface.
"""

from __future__ import annotations

import logging
from typing import Any, Protocol

log = logging.getLogger("demo_data_warehouse_spark.notify")


class RunNotifier(Protocol):
    def on_success(self, context: dict[str, Any]) -> None: ...

    def on_failure(self, context: dict[str, Any]) -> None: ...


class LogNotifier:
    """Default notifier: structured log lines instead of chat messages
    (reference message bodies carry the DAG id + run date; we carry
    pipeline name + partition)."""

    def on_success(self, context: dict[str, Any]) -> None:
        log.info("pipeline succeeded: %s", context)

    def on_failure(self, context: dict[str, Any]) -> None:
        log.error("pipeline FAILED: %s", context)


class CollectingNotifier:
    """Test double: records every notification."""

    def __init__(self) -> None:
        self.events: list[tuple[str, dict[str, Any]]] = []

    def on_success(self, context: dict[str, Any]) -> None:
        self.events.append(("success", context))

    def on_failure(self, context: dict[str, Any]) -> None:
        self.events.append(("failure", context))
