"""Checkpoint / resume.

≙ reference capture()/restore() torch tuples (scene/gaussian_model.py:167-270,
train.py:299-301). Here checkpoints are flax-serialized pytrees plus a JSON
manifest; the portable artifact remains the PLY + envmap sidecar
(scene/gaussians.py save_ply/load_ply).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state, iteration: int, extra: dict | None = None):
    # serialize flat leaves: custom registered dataclasses (GaussianParams
    # etc.) aren't known to msgpack, but their leaves are plain arrays
    leaves = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(state))]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = serialization.to_bytes(leaves)
    with open(path, "wb") as f:
        f.write(blob)
    manifest = {"iteration": int(iteration), **(extra or {})}
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)


def load_checkpoint(path: str, template):
    """Restore into a pytree of the same structure (`template`)."""
    with open(path, "rb") as f:
        blob = f.read()
    t_leaves, treedef = jax.tree.flatten(template)
    leaves = serialization.from_bytes([np.asarray(x) for x in t_leaves], blob)
    import jax.numpy as jnp
    state = jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])
    manifest = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            manifest = json.load(f)
    return state, manifest.get("iteration", 0)


def save_cmd_provenance(model_path: str):
    """≙ cmd.txt command provenance (train.py:305-309)."""
    import sys
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cmd.txt"), "a") as f:
        f.write(" ".join(sys.argv) + "\n")
