"""Execution-branch observability.

Several sinks/sources have a connector-gated primary branch (Iceberg/
Delta ``format(...)`` readers, v2 ``writeTo().createOrReplace()``,
``MERGE INTO``) with a plain-Spark fallback. In this environment the
connector JARs are absent, so the fallbacks are what actually run —
which is fine, but it must never be SILENT: a cluster user with the
connectors installed needs to see which path served their call, and a
user without them needs to know they're on the rebuild path.

Every branch decision is (a) logged at INFO on the
``embeddinghub_spark.branches`` logger and (b) recorded in
``BRANCH_LOG`` (a bounded in-process ring, newest last) so tests and
operators can assert on it: ``last_branch("merge_upsert_table")`` →
``"merge_into"`` or ``"rebuild_swap"``.
"""

from __future__ import annotations

import logging
from collections import deque

logger = logging.getLogger("embeddinghub_spark.branches")

BRANCH_LOG: deque = deque(maxlen=256)  # (op, branch, detail)


def record_branch(op: str, branch: str, detail: str = "") -> None:
    BRANCH_LOG.append((op, branch, detail))
    logger.info("%s -> %s%s", op, branch, f" ({detail})" if detail else "")


def last_branch(op: str) -> str | None:
    """Most recent branch taken for ``op`` (None if never ran)."""
    for rec_op, branch, _ in reversed(BRANCH_LOG):
        if rec_op == op:
            return branch
    return None
