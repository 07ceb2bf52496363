"""Checkpointing: params + batch stats + FULL optimizer state + step.

Improves on the reference, which saves only [state_dict, args] per epoch and
cannot truly resume (no optimizer/scheduler/step state —
reference qagnn.py:317-333, 163-166). Uses orbax for the array tree and JSON
for the config.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state, cfg=None) -> None:
    """Save a TrainState (or any pytree of arrays) + optional TrainConfig."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    host_state = jax.tree.map(np.asarray, _to_pure_tree(state))
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, host_state)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def load_checkpoint(path: str):
    """Returns (state_tree, TrainConfig-or-None)."""
    import orbax.checkpoint as ocp

    from qagnn_tpu.utils.config import TrainConfig

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path)
    cfg = None
    cfg_path = path + ".config.json"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(TrainConfig)}
        d = {k: v for k, v in d.items() if k in known}
        for k in ("ent_emb", "ent_emb_paths"):
            if isinstance(d.get(k), list):
                d[k] = tuple(d[k])
        for k in ("test_statements", "test_adj", "load_model_path",
                  "encoder_lr", "decoder_lr"):
            if d.get(k) == "None":
                d[k] = None
        cfg = TrainConfig(**d)
    return state, cfg


def restore_into(template: Any, pure: Any):
    """Rebuild a structured state (TrainState with nested namedtuple optimizer
    state) from the plain nested-dict tree save_checkpoint wrote. The template
    supplies structure and dtypes; `pure` supplies values. Used by train
    warm-start/resume (reference qagnn.py:163-166 --load_model_path, but with
    FULL state — the reference reloads weights only)."""
    import jax.numpy as jnp

    if hasattr(template, "__dataclass_fields__"):
        kw = {k: restore_into(getattr(template, k), pure[k])
              for k in template.__dataclass_fields__}
        if hasattr(template, "replace"):          # flax struct
            return template.replace(**kw)
        return dataclasses.replace(template, **kw)
    if isinstance(template, dict):
        return {k: restore_into(v, pure[k]) for k, v in template.items()}
    if isinstance(template, tuple):
        vals = [restore_into(v, pure[str(i)]) for i, v in enumerate(template)]
        if hasattr(template, "_fields"):          # namedtuple
            return type(template)(*vals)
        return tuple(vals)
    if isinstance(template, list):
        return [restore_into(v, pure[str(i)]) for i, v in enumerate(template)]
    if template is None:
        return None
    arr = jnp.asarray(pure)
    assert arr.shape == template.shape, (
        f"checkpoint/model shape mismatch: {arr.shape} vs {template.shape}")
    return arr.astype(template.dtype)


def _to_pure_tree(state: Any):
    """Flatten a flax struct dataclass into a plain nested dict."""
    if hasattr(state, "__dataclass_fields__"):
        return {k: _to_pure_tree(getattr(state, k))
                for k in state.__dataclass_fields__}
    if isinstance(state, dict):
        return {k: _to_pure_tree(v) for k, v in state.items()}
    if isinstance(state, (list, tuple)):
        # preserve namedtuple/tuple structure as dict for orbax stability
        return {str(i): _to_pure_tree(v) for i, v in enumerate(state)}
    return state
