"""Flat-npz parameter persistence (portable across rounds/machines).

Orbax checkpoints are the training-time format (async, sharded,
full-state).  For *handing a trained model to someone else* — or keeping
it alive when everything outside git is wiped — a single flat ``.npz``
of the parameter pytree is the right artifact: no orbax version
coupling, no sharding metadata, loadable with plain numpy.

Key format matches the CFG demo's persisted ``cfg_params.npz``
(scripts/demo_cfg.py): pytree path segments joined with ``/``
(flax param dicts never contain ``/`` in a key).  The reference ships
weights as ``torch.save`` state-dicts with the same flat-name idea
(reference utils/rotinas.py:555-564); this is the jax-native analogue.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np


def flatten_params(params: Any) -> Dict[str, np.ndarray]:
    """Pytree of arrays -> {"a/b/c": np.ndarray} (host copies)."""
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
        for path, leaf in jtu.tree_flatten_with_path(params)[0]
    }


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Inverse of flatten_params for dict-of-dict pytrees (flax params)."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(path: str, params: Any, dtype: str = "float16") -> None:
    """Write the param pytree as a compressed flat npz.

    dtype float16 is the default export precision: the model *computes*
    in bfloat16 (models/unet.py dtype), whose 8-bit mantissa rounding
    exceeds fp16's 10-bit storage error, so fp16 storage is lossless
    w.r.t. the bf16 compute path while halving the artifact size.
    """
    cast = np.dtype(dtype)
    flat = {k: v.astype(cast) if np.issubdtype(v.dtype, np.floating) else v
            for k, v in flatten_params(params).items()}
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, template: Any = None) -> Any:
    """Load a flat npz back into a param pytree.

    With ``template`` (a pytree of arrays or ShapeDtypeStructs), the
    result is validated against the template's treedef and each leaf is
    cast to the template leaf dtype (fp16 storage -> f32 master weights).
    """
    with np.load(path) as z:
        tree = unflatten_params({k: z[k] for k in z.files})
    if template is None:
        return jtu.tree_map(jnp.asarray, tree)
    t_flat, t_def = jtu.tree_flatten(template)
    flat, got_def = jtu.tree_flatten(tree)
    if t_def != got_def:
        raise ValueError(
            f"params npz {path} does not match the model: saved tree "
            f"{got_def} vs expected {t_def}")
    out = [jnp.asarray(leaf, dtype=t.dtype) for leaf, t in zip(flat, t_flat)]
    for leaf, t in zip(out, t_flat):
        if leaf.shape != t.shape:
            raise ValueError(
                f"params npz {path}: leaf shape {leaf.shape} != "
                f"expected {t.shape}")
    return jtu.tree_unflatten(t_def, out)
