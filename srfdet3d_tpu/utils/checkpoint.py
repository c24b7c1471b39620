"""Checkpointing: orbax save/restore, prefix partial loads, torch import.

Replaces the reference's mmcv CheckpointHook + per-module
`init_cfg=dict(type='Pretrained', checkpoint=..., prefix=...)` partial
restores (cfg srfdet_voxel_nusc_LC.py:51-53,81-83) and `load_from` /
`resume_from` (cfg :393-394, tools/train.py:151-152).

Checkpoint layout: orbax PyTree checkpoint of
{"params", "batch_stats", "opt_state", "step"} plus a JSON metadata file
(config name, class names, framework version) mirroring the reference's
ckpt meta (tools/train.py:292-302).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state, meta: Optional[Dict] = None) -> None:
    """Save a TrainState (or any pytree) to `path` (a directory)."""
    path = os.path.abspath(path)
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step)}
    _checkpointer().save(path, tree, force=True)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def restore_checkpoint(path: str, state):
    """Restore a TrainState saved by :func:`save_checkpoint`."""
    path = os.path.abspath(path)
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": np.asarray(state.step)}
    tree = _checkpointer().restore(path, item=template)
    return state.replace(params=tree["params"],
                         batch_stats=tree["batch_stats"],
                         opt_state=tree["opt_state"],
                         step=jax.numpy.asarray(tree["step"]))


def _merge_into(dst: Dict, src: Dict, path: str = "") -> tuple:
    """Recursively overwrite dst's leaves with src's matching ones
    (shape-guarded). Returns (merged, n_hit)."""
    n_hit = 0

    def merge(d, s, p):
        nonlocal n_hit
        out = dict(d)
        for k, v in s.items():
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = merge(out[k], v, f"{p}/{k}")
            elif k in out:
                dshape = getattr(out[k], "shape", None)
                sshape = getattr(v, "shape", None)
                if dshape is not None and sshape is not None \
                        and tuple(dshape) != tuple(sshape):
                    raise ValueError(
                        f"partial load: shape mismatch at {p}/{k}: "
                        f"model {tuple(dshape)} vs ckpt {tuple(sshape)}")
                out[k] = v
                n_hit += 1
        return out

    return merge(dict(dst), dict(src), path), n_hit


def load_partial(params: Any, ckpt_path: str, prefix: str = "") -> Any:
    """Prefix-filtered partial restore (the reference's Pretrained-prefix
    mechanism): overwrite every leaf of `params` under top-level key
    `prefix` with the checkpoint's matching subtree; everything else keeps
    its fresh initialization."""
    ckpt = _checkpointer().restore(os.path.abspath(ckpt_path))
    src = ckpt.get("params", ckpt)

    if not prefix:
        out, n_hit = _merge_into(dict(params), dict(src))
    elif prefix in src and prefix in params:
        out = dict(params)
        out[prefix], n_hit = _merge_into(dict(params[prefix]),
                                         dict(src[prefix]), prefix)
    else:
        raise KeyError(
            f"load_partial: prefix {prefix!r} not found in "
            f"{'checkpoint' if prefix in params else 'params'} "
            f"(ckpt top-level keys: {sorted(src)[:8]})")
    if n_hit == 0:
        # a typo'd layout silently fine-tuning from random init is the
        # worst failure mode a partial load can have
        raise KeyError(
            f"load_partial: ZERO leaves matched between {ckpt_path} and "
            f"the model params (ckpt top-level keys: {sorted(src)[:8]})")
    print(f"load_partial: restored {n_hit} leaves from {ckpt_path}"
          + (f" under {prefix!r}" if prefix else ""), flush=True)
    return out


def load_pretrained(state, ckpt_path: str):
    """Partial-load params AND batch_stats (when the checkpoint carries
    them) into a TrainState — the load path for converted reference
    checkpoints (tools/convert_checkpoint.py): frozen-BN fine-tuning and
    eval fidelity both need the torch RUNNING STATS, not just weights."""
    ckpt = _checkpointer().restore(os.path.abspath(ckpt_path))
    src = ckpt.get("params", ckpt)
    params, n_hit = _merge_into(dict(state.params), dict(src))
    if n_hit == 0:
        raise KeyError(
            f"load_pretrained: ZERO param leaves matched from {ckpt_path} "
            f"(ckpt top-level keys: {sorted(src)[:8]})")
    state = state.replace(params=params)
    n_bs = 0
    if isinstance(ckpt, dict) and isinstance(ckpt.get("batch_stats"), dict) \
            and ckpt["batch_stats"]:
        bs, n_bs = _merge_into(dict(state.batch_stats),
                               dict(ckpt["batch_stats"]))
        state = state.replace(batch_stats=bs)
    print(f"load_pretrained: restored {n_hit} param + {n_bs} batch-stat "
          f"leaves from {ckpt_path}", flush=True)
    return state


def load_for_eval(path: str, state):
    """Restore for inference: a full TrainState checkpoint when present
    (training saves), else a params(+batch_stats) checkpoint (converted
    reference weights).  The dispatch sniffs the top-level keys from
    checkpoint METADATA (no array reads) when orbax supports it."""
    path = os.path.abspath(path)
    keys: set = set()
    try:
        md = _checkpointer().metadata(path)
        item = getattr(md, "item_metadata", md)   # StepMetadata wrapper
        if hasattr(item, "keys"):
            keys = set(item.keys())
    except Exception:
        pass
    if not keys:                                  # metadata API mismatch
        raw = _checkpointer().restore(path)
        keys = set(raw) if isinstance(raw, dict) else set()
    if "opt_state" in keys:
        return restore_checkpoint(path, state)
    return load_pretrained(state, path)


def torch_to_jax_array(t) -> np.ndarray:
    """Convert a torch tensor to numpy with layout translation:
    conv OIHW -> HWIO, conv3d OIDHW stays caller-handled, linear (out,in)
    -> (in,out)."""
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    if arr.ndim == 4:                     # conv2d OIHW -> HWIO
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 2:                     # linear (out, in) -> (in, out)
        return arr.T
    return arr
