"""Checkpointing: orbax save/load + torch .pth converter.

TPU-native replacement for gorilla.solver.save_checkpoint/load_checkpoint
(reference tools/train_YCBV_stage1.py:102-104, tools/test_YCBV_stage1.py:
233-235). Layout: <dir>/epoch_<n>/ orbax PyTree checkpoints holding
{params, batch_stats, opt_state, step, meta}.

The converter maps the released reference .pth weights onto our parameter
tree so the eval harness can verify numerical fidelity (SURVEY.md §7 step 3).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(directory: str, state, epoch: int, meta: Optional[Dict] = None) -> str:
    ocp = _ocp()
    path = os.path.abspath(os.path.join(directory, f"epoch_{epoch}"))
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
        # always present so restore-with-target has a fixed schema;
        # consumed_batches > 0 marks a mid-epoch checkpoint
        "meta": {"consumed_batches": 0, **(meta or {})},
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str, target: Optional[Dict] = None) -> Dict[str, Any]:
    """Restore a checkpoint. Without `target`, container types degrade to
    plain dicts (fine for params/batch_stats). Pass `target` (a matching
    pytree, e.g. built from a live TrainState) to restore custom containers
    — optax/NamedTuple opt states NEED this or their structure is lost.

    Checkpoints written by OLDER code may lack top-level keys the current
    schema adds (e.g. 'meta', which arrived with mid-epoch resume): those
    keys are filled from `target`'s defaults instead of failing the
    tree-structure match, so old runs stay resumable."""
    ocp = _ocp()
    p = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(p)
        try:
            return ckptr.restore(p, item=target)
        except Exception:
            stored = ckptr.restore(p)  # structure-free read of what exists
            sub = {k: v for k, v in target.items() if k in stored}
            out = dict(ckptr.restore(p, item=sub))
            for k, v in target.items():
                out.setdefault(k, v)
            return out


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best = None
    for name in os.listdir(directory):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m:
            e = int(m.group(1))
            if best is None or e > best[0]:
                best = (e, os.path.join(directory, name))
    return best[1] if best else None


# ---------------------------------------------------------------------------
# torch .pth -> params converter
# ---------------------------------------------------------------------------
_HEAD_NAMES = [
    "regressor_Xo", "regressor_Yc", "regressor_conf", "regressor_conf_bi",
    "neck_fuser", "neck_fuser_bi", "regressor_rot", "regressor_trans",
]
_DISENGAGE_NAMES = [
    "disengage_Xc_p1", "disengage_Xc_m1", "disengage_Xc_p2", "disengage_Xc_m2",
    "disengage_Yo_p1", "disengage_Yo_m1", "disengage_Yo_p2", "disengage_Yo_m2",
]


def convert_reference_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference DCL-Net torch state_dict into our flax trees.

    Handles the weight layout differences:
    - spconv SubMConv3d/SparseConv3d weight [kz,ky,kx,Cin,Cout] maps directly
      to flax nn.Conv [kz,ky,kx,Cin,Cout] (spconv already stores kernel-first).
      torch Conv3d 1x1 weight [Cout,Cin,1,1,1] -> Dense [Cin,Cout].
      torch Conv1d 1x1 weight [Cout,Cin,1] -> Dense [Cin,Cout].
    - BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats.

    Returns {"params": ..., "batch_stats": ...} matching DCLNet's tree.
    Keys that cannot be mapped raise KeyError so fidelity gaps are loud.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def conv_w(w):
        w = np.asarray(w)
        if w.ndim == 5 and w.shape[2] == 1 and w.shape[3] == 1 and w.shape[4] == 1:
            return w[:, :, 0, 0, 0].T  # Conv3d 1x1 -> Dense
        if w.ndim == 3 and w.shape[2] == 1:
            return w[:, :, 0].T  # Conv1d 1x1 -> Dense
        if w.ndim == 5:
            return w  # spconv kernel [kz,ky,kx,Cin,Cout]
        raise ValueError(f"unexpected conv weight shape {w.shape}")

    sd = {k.replace("module.", ""): np.asarray(v) for k, v in state_dict.items()}

    for key, value in sd.items():
        parts = key.split(".")
        top = parts[0]
        if top.startswith("backbone_"):
            # backbone_inp.moduleX.Y.layers.Z.{weight,...}
            m = re.fullmatch(
                r"backbone_(inp|tmp)\.module(\d)\.(\d)\.layers\.(\d)\.(.+)", key
            )
            if not m:
                raise KeyError(key)
            branch, mod, blk, layer, leaf = m.groups()
            conv_idx = (int(mod) - 1) * 2 + int(blk)
            base = (f"backbone_{branch}", f"conv{conv_idx}")
            if leaf == "weight" and layer == "0":
                put(params, base + ("kernel",), conv_w(value))
            elif layer == "1":  # BatchNorm1d
                if leaf == "weight":
                    put(params, base + ("scale",), value)
                elif leaf == "bias":
                    put(params, base + ("bias",), value)
                elif leaf == "running_mean":
                    put(stats, base + ("mean",), value)
                elif leaf == "running_var":
                    put(stats, base + ("var",), value)
                elif leaf == "num_batches_tracked":
                    pass
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif top in _DISENGAGE_NAMES or top.split(".")[0] in _DISENGAGE_NAMES:
            # disengage_X.S.layers.L.{weight,...}: S in 0,1 blocks; L 0=conv 1=bn
            m = re.fullmatch(r"(disengage_\w+)\.(\d)\.layers\.(\d)\.(.+)", key)
            if not m:
                raise KeyError(key)
            name, blk, layer, leaf = m.groups()
            blk = int(blk)
            if layer == "0" and leaf == "weight":
                put(params, (name, f"Dense_{blk}", "kernel"), conv_w(value))
            elif layer == "1":
                if leaf == "weight":
                    put(params, (name, f"BatchNorm_{blk}", "scale"), value)
                elif leaf == "bias":
                    put(params, (name, f"BatchNorm_{blk}", "bias"), value)
                elif leaf == "running_mean":
                    put(stats, (name, f"BatchNorm_{blk}", "mean"), value)
                elif leaf == "running_var":
                    put(stats, (name, f"BatchNorm_{blk}", "var"), value)
                elif leaf == "num_batches_tracked":
                    pass
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif top in _HEAD_NAMES or top in ("MLP_share", "regressor_rot2", "regressor_trans2"):
            # Head MLP: <name>.layers.<i>.{weight,bias,...}; torch Sequential
            # interleaves Conv1d/act/BN so conv indices are not contiguous.
            m = re.fullmatch(r"(\w+)\.layers\.(\d+)\.(.+)", key)
            if not m:
                raise KeyError(key)
            name, seq_idx, leaf = m.groups()
            put(params, (name, "_torch_seq", seq_idx, leaf), value)
        else:
            raise KeyError(f"unmapped reference key: {key}")

    # Second pass: resolve head sequential indices into Dense_i / BatchNorm_i
    for name in list(params.keys()):
        node = params[name]
        if "_torch_seq" not in node:
            continue
        seq = node.pop("_torch_seq")
        dense_i = 0
        bn_i = 0
        for seq_idx in sorted(seq.keys(), key=int):
            leaves = seq[seq_idx]
            if "running_mean" in leaves:  # BatchNorm1d
                put(params, (name, f"BatchNorm_{bn_i}", "scale"), leaves["weight"])
                put(params, (name, f"BatchNorm_{bn_i}", "bias"), leaves["bias"])
                put(stats, (name, f"BatchNorm_{bn_i}", "mean"), leaves["running_mean"])
                put(stats, (name, f"BatchNorm_{bn_i}", "var"), leaves["running_var"])
                bn_i += 1
            else:  # Conv1d
                put(params, (name, f"Dense_{dense_i}", "kernel"), conv_w(leaves["weight"]))
                if "bias" in leaves:
                    put(params, (name, f"Dense_{dense_i}", "bias"), leaves["bias"])
                dense_i += 1

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth file into numpy (CPU torch is available)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict") or ckpt.get("state_dict") or ckpt
    return {k: v.numpy() for k, v in sd.items()}
