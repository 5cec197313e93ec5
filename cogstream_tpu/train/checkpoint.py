"""Native checkpoint/resume via Orbax.

Replaces the reference's dual checkpoint stack — HF Trainer epoch saves
(first_stage_training.py:491) and accelerate ``save_state`` +
``save_pretrained`` every 30 updates with manual resume constants
(second_stage_training.py:114-125,182-202,236-239,311-316) — with one
atomic Orbax checkpoint holding the LoRA tree, optimizer state and step
counter. Resume is ``restore`` + continue; no hand-counted batch
skipping.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _mgr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_train_state(directory: str, state, extra: Optional[dict] = None,
                     max_to_keep: int = 3) -> int:
    """Save TrainState (lora, opt_state, step) atomically. Returns step."""
    import orbax.checkpoint as ocp

    step = int(np.asarray(state.step))
    mgr = _mgr(directory, max_to_keep)
    payload = {"lora": state.lora, "opt_state": state.opt_state,
               "step": state.step}
    if extra:
        payload["extra"] = extra
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()
    return step


def restore_train_state(directory: str, template_state) -> Any:
    """Restore the latest checkpoint into the TrainState structure
    (template provides shapes/dtypes/shardings). Returns None if the
    directory has no checkpoints."""
    import orbax.checkpoint as ocp

    from .trainer import TrainState

    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    template = {"lora": template_state.lora,
                "opt_state": template_state.opt_state,
                "step": template_state.step}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()

    # Re-place every leaf under the template's sharding: StandardRestore
    # hands back arrays COMMITTED to their restore device, and mixing
    # those with mesh-sharded params fails the next jitted step
    # ("incompatible devices"). Where the template is genuinely
    # multi-device its sharding is the truth; single-device template
    # leaves (fresh optimizer scalars) go back as host numpy so jit
    # re-places them like the uncommitted originals.
    def place(t, r):
        if isinstance(t, jax.Array) and len(t.sharding.device_set) > 1:
            return jax.device_put(r, t.sharding)
        if isinstance(r, jax.Array):
            return np.asarray(r)
        return r

    restored = jax.tree.map(place, template, restored)
    return TrainState(restored["lora"], restored["opt_state"],
                      restored["step"])


def save_lora_adapter(directory: str, lora_tree, name: str = "adapter") -> str:
    """Export just the adapter weights (the ``save_pretrained`` analogue,
    second_stage_training.py:323-335) as a flat .npz."""
    os.makedirs(directory, exist_ok=True)
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")
        elif node is not None:
            flat[prefix] = np.asarray(jax.device_get(node))

    walk(lora_tree, "")
    path = os.path.join(directory, f"{name}.npz")
    np.savez(path, **flat)
    return path


def load_lora_adapter(path: str, dtype=None):
    """Rebuild the nested LoRA tree from a flat .npz export."""
    import jax.numpy as jnp

    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        node[parts[-1]] = jnp.asarray(arr, dtype) if dtype else jnp.asarray(arr)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)
