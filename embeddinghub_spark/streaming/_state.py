"""Shared atomic symlink-flip commit for on-disk streaming state.

Every *_dir streaming state store (auc_monitor, cms_by, distinct_by,
psi_monitor, cdc_ingest) commits a freshly-written version directory
the same way: write ``<state_dir>.v-<nonce>``, flip the ``state_dir``
symlink atomically, retire the superseded version. One copy of that
sequence lives here so the crash-recovery rules — the legacy
plain-dir migration and the orphan sweep — can never drift between
stores (ADVICE r8: the sweep was first fixed in one copy only).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


def new_version_dir(state_dir: str) -> str:
    """Path for the next version directory (not yet created — the
    caller writes its parquet there, then calls commit_version_dir)."""
    return state_dir + ".v-" + uuid.uuid4().hex[:8]


def commit_version_dir(
    state_dir: str,
    phys: str,
    batch_id: int | None = None,
    meta_name: str | None = None,
) -> None:
    """Atomically make ``phys`` the live version of ``state_dir``.

    - Optionally stamps ``{meta_name: {"committed_batch": batch_id}}``
      inside ``phys`` FIRST, so a version is never observable without
      its watermark (the transactional exactly-once gate).
    - Symlink-flips via a temp link + ``os.replace`` — readers see the
      old version XOR the new one, never a partial state.
    - A legacy PLAIN-dir snapshot (seeded outside the symlink
      protocol) is moved aside before the flip (``os.replace`` cannot
      replace a real directory with a symlink) and then retired.
    - Sweeps orphan ``.v-*`` siblings that no link references — a
      crash between version-write and flip would otherwise leak state
      unboundedly across restarts.
    """
    if meta_name is not None and batch_id is not None:
        with open(os.path.join(phys, meta_name), "w") as fh:
            json.dump({"committed_batch": int(batch_id)}, fh)
    tmp = state_dir + ".link-" + uuid.uuid4().hex[:8]
    os.symlink(phys, tmp)
    prev = os.path.realpath(state_dir) if os.path.islink(state_dir) else None
    if prev is None and os.path.isdir(state_dir):
        prev = state_dir + ".legacy-" + uuid.uuid4().hex[:8]
        os.rename(state_dir, prev)
    os.replace(tmp, state_dir)
    if prev and os.path.isdir(prev):
        shutil.rmtree(prev, ignore_errors=True)
    live = os.path.realpath(state_dir)
    stem = os.path.basename(state_dir)
    parent = os.path.dirname(os.path.abspath(state_dir))
    for name in os.listdir(parent):
        cand = os.path.join(parent, name)
        if name.startswith(stem + ".v-"):
            # crash between version-write and flip
            if os.path.realpath(cand) != live:
                shutil.rmtree(cand, ignore_errors=True)
        elif name.startswith(stem + ".link-"):
            # crash between temp-symlink creation and os.replace
            # (ADVICE r9: these were never swept and leaked forever)
            if os.path.islink(cand):
                try:
                    os.unlink(cand)
                except OSError:
                    pass
        elif name.startswith(stem + ".legacy-"):
            # crash after moving a legacy plain dir aside but before
            # retiring it (ADVICE r9)
            if os.path.realpath(cand) != live:
                shutil.rmtree(cand, ignore_errors=True)
