"""Checkpoint save/restore with shape-tolerant partial ("fuzzy") restore.

Reference behaviours reproduced (train_4_normal.py:161-170, 277-278;
normal_predict/models.py:79-83 fuzzy_load): checkpoints carry
{params, opt_state, epoch}; restore tolerates missing keys and shape
mismatches by keeping the freshly-initialized value.  Serialization is
flax msgpack (pure pytrees, no pickled code).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(
    path: str, params: Any, opt_state: Any = None, epoch: int = 0, step: int = 0
) -> None:
    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # multihost: params are replicated; only process 0 writes
    payload = {
        "params": serialization.to_state_dict(jax.device_get(params)),
        "epoch": np.asarray(epoch),
        "step": np.asarray(int(step)),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(jax.device_get(opt_state))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as fh:
        return serialization.msgpack_restore(fh.read())


def fuzzy_restore(params: Any, loaded_state_dict: dict) -> Any:
    """Merge a loaded state dict into ``params``, keeping only entries that
    exist with matching shapes (parity: models.py fuzzy_load)."""
    flat_params = _flatten(serialization.to_state_dict(params))
    flat_loaded = _flatten(loaded_state_dict)
    merged = dict(flat_params)
    for k, v in flat_loaded.items():
        if k in flat_params and np.shape(flat_params[k]) == np.shape(v):
            merged[k] = v
    return serialization.from_state_dict(params, _unflatten(merged))


def restore_training(path: str, params: Any, opt_state: Any = None):
    """Restore (params, opt_state, start_epoch, step) from a checkpoint file.

    Missing/mismatched params fall back to their initialized values; the
    optimizer state is restored only when structurally compatible (else the
    reference's 'Optimizer is not loaded' behaviour applies).  ``step`` is
    the optimizer step count (TrainState.step) so step-based LR schedules
    resume exactly; checkpoints written before round 3 lack it and restore
    as 0.
    """
    ckpt = load_checkpoint(path)
    params = fuzzy_restore(params, ckpt["params"])
    epoch = int(ckpt.get("epoch", 0))
    step = int(ckpt.get("step", 0))
    if opt_state is not None and "opt_state" in ckpt:
        try:
            opt_state = serialization.from_state_dict(opt_state, ckpt["opt_state"])
        except (KeyError, ValueError):
            opt_state = None
    else:
        opt_state = None
    return params, opt_state, epoch, step


def _flatten(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out
