"""Shared helpers for parity tests against the reference torch oracle."""

import importlib.util
import sys

import numpy as np

try:
    import torch
except Exception:  # pragma: no cover
    torch = None

import jax.numpy as jnp


def load_reference_module(task: str, module: str):
    """Import a reference task module under a unique name (several task dirs
    all contain a 'models.py'; plain import would hit the sys.modules cache)."""
    path = f"/root/reference/src/{task}/{module}.py"
    qualname = f"ref_{task}_{module}"
    if qualname in sys.modules:
        return sys.modules[qualname]
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    task_dir = f"/root/reference/src/{task}"
    if task_dir not in sys.path:
        sys.path.insert(0, task_dir)
    spec = importlib.util.spec_from_file_location(qualname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[qualname] = mod
    spec.loader.exec_module(mod)
    return mod


def to_torch_sparse(coo):
    idx = torch.from_numpy(np.stack([coo.row, coo.col]).astype(np.int64))
    return torch.sparse_coo_tensor(
        idx, torch.from_numpy(coo.data.astype(np.float32)), coo.shape
    ).coalesce()


def copy_graphconv(tm):
    """Flax GraphConv1x1 params from a torch reference GraphConv1x1."""
    out = {
        "fc": {
            "kernel": jnp.asarray(tm.fc.weight.detach().numpy().T),
            "bias": jnp.asarray(tm.fc.bias.detach().numpy()),
        }
    }
    if getattr(tm, "batch_norm", None) in ("pre", "post"):
        out["bn"] = {
            "scale": jnp.asarray(tm.bn.weight.detach().numpy()),
            "bias": jnp.asarray(tm.bn.bias.detach().numpy()),
        }
    return out


def copy_graphbn(tm):
    return {
        "scale": jnp.asarray(tm.bn.weight.detach().numpy()),
        "bias": jnp.asarray(tm.bn.bias.detach().numpy()),
    }


def copy_two_conv_block(tm):
    """Blocks with bn_fc0/bn_fc1 (Lap/Avg/Dir ResNet2 and the wide variants)."""
    out = {}
    for name, sub in tm.named_children():
        if name.startswith("bn_fc"):
            out[name] = copy_graphconv(sub)
    return out


def copy_deep_model(tm):
    """Flax params for LapDeepModel-style zoos: conv1, rn{i}, conv2."""
    params = {"conv1": copy_graphconv(tm.conv1), "conv2": copy_graphconv(tm.conv2)}
    for name, sub in tm.named_children():
        if name.startswith("rn"):
            cls = sub.__class__.__name__
            if cls in ("MlpResNet2",):
                params[name] = {
                    "bn0": copy_graphbn(sub.bn0),
                    "bn1": copy_graphbn(sub.bn1),
                    "fc0": copy_graphconv(sub.fc0),
                    "fc1": copy_graphconv(sub.fc1),
                }
            else:
                params[name] = copy_two_conv_block(sub)
    if hasattr(tm, "bn") and tm.bn is not None and hasattr(tm.bn, "bn"):
        params["bn"] = copy_graphbn(tm.bn)
    return params
