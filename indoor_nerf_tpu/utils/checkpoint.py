"""Checkpoint save / auto-resume with the reference's directory semantics.

Equivalent of the torch.save/.tar flow (reference: PocketNeRF/run_nerf.py:
1345-1362 save, 295-315 resume): checkpoints live in ``<logdir>/<expname>/``
named ``{step:06d}.ckpt``, the newest is auto-loaded unless --no_reload, and
--ft_path pins a specific file. The payload is the WHOLE train-state pytree
(params + RAdam moments + quant state + counters) serialized with
flax.serialization msgpack — one file, byte-stable, no pickle.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

CKPT_SUFFIX = ".ckpt"


def _atomic_write_state(path: str, state: Dict[str, Any]) -> str:
    host_state = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def save_checkpoint(logdir: str, step: int, state: Dict[str, Any]) -> str:
    """Atomic write (tmp + rename): a preemption mid-save can never leave a
    truncated checkpoint to auto-resume from (SURVEY.md §5.3 — the reference
    has no preemption story at all)."""
    os.makedirs(logdir, exist_ok=True)
    return _atomic_write_state(
        os.path.join(logdir, f"{step:06d}{CKPT_SUFFIX}"), state
    )


def save_best_checkpoint(logdir: str, state: Dict[str, Any]) -> str:
    """Best-held-out snapshot as ``best.ckpt`` (framework extension: the
    held-out curve peaks mid-training then declines from overfitting —
    BENCH_NOTES.md ceiling study — so keep-latest loses ~1 dB). Excluded
    from auto-resume-newest (list_checkpoints filters to step-numbered
    files); load explicitly via ``--ft_path <logdir>/best.ckpt``."""
    os.makedirs(logdir, exist_ok=True)
    return _atomic_write_state(
        os.path.join(logdir, f"best{CKPT_SUFFIX}"), state
    )


def list_checkpoints(logdir: str) -> List[str]:
    """Sorted checkpoint paths (reference: run_nerf.py:299 sorts + filters)."""
    if not os.path.isdir(logdir):
        return []
    return [
        os.path.join(logdir, f)
        for f in sorted(os.listdir(logdir))
        # step-numbered files only: best.ckpt would sort AFTER the digits
        # and hijack auto-resume-NEWEST
        if f.endswith(CKPT_SUFFIX) and f[: -len(CKPT_SUFFIX)].isdigit()
    ]


def restore_checkpoint(
    path: str, state_template: Dict[str, Any]
) -> Dict[str, Any]:
    """Restore into the template pytree (shapes/dtypes must match).

    Forward-compatible at the TOP level: a checkpoint written before a new
    optional state key existed (e.g. ``ema``) restores with that key kept
    at its fresh-init template value — except ``ema``, which (when enabled)
    is seeded from the RESTORED params so averaging resumes from the
    checkpointed weights rather than the fresh init.
    """
    with open(path, "rb") as f:
        data = f.read()
    try:
        return serialization.from_bytes(state_template, data)
    except (KeyError, ValueError):
        raw = serialization.msgpack_restore(data)
        restored: Dict[str, Any] = {}
        for k, tmpl in state_template.items():
            if k in raw:
                restored[k] = serialization.from_state_dict(tmpl, raw[k])
            else:
                restored[k] = tmpl
        if state_template.get("ema") is not None and "ema" not in raw:
            restored["ema"] = jax.tree_util.tree_map(
                np.array, restored["params"]
            )
        return restored


def maybe_resume(
    logdir: str,
    state: Dict[str, Any],
    ft_path: Optional[str] = None,
    no_reload: bool = False,
) -> Dict[str, Any]:
    """Auto-resume-newest semantics (reference: run_nerf.py:295-315)."""
    if ft_path is not None and ft_path != "None":
        ckpts = [ft_path]
    else:
        ckpts = list_checkpoints(logdir)
    print("Found ckpts", ckpts)
    if ckpts and not no_reload:
        path = ckpts[-1]
        print("Reloading from", path)
        state = restore_checkpoint(path, state)
        print("Resumed at step", int(np.asarray(state["step"])))
    return state
