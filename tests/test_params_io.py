"""Flat-npz params persistence: roundtrip + restore_params dispatch.

The npz export (utils/params_io.py, scripts/export_params.py) is the
round-portable weight artifact — these tests pin its format (the
CFG demo's "/"-joined path keys), the fp16 cast-back behavior, and the
`.npz` branch inside train.checkpoint.restore_params.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.utils.params_io import (
    flatten_params,
    load_params_npz,
    save_params_npz,
    unflatten_params,
)


def _tree(dtype=np.float32):
    rng = np.random.RandomState(0)
    return {
        "params": {
            "head": {"kernel": rng.randn(3, 3, 6, 8).astype(dtype),
                     "bias": rng.randn(8).astype(dtype)},
            "tail": {"Dense_0": {"kernel": rng.randn(8, 4).astype(dtype)}},
        }
    }


def test_flatten_unflatten_roundtrip():
    tree = _tree()
    flat = flatten_params(tree)
    assert set(flat) == {"params/head/kernel", "params/head/bias",
                         "params/tail/Dense_0/kernel"}
    back = unflatten_params(flat)
    jax.tree_util.tree_map(np.testing.assert_array_equal, tree, back)


def test_npz_roundtrip_fp16_cast_back(tmp_path):
    tree = _tree()
    path = str(tmp_path / "p.npz")
    save_params_npz(path, tree, dtype="float16")
    # Template leaves are f32 -> loaded leaves come back as f32 arrays
    # with fp16 storage precision.
    out = load_params_npz(path, template=tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-3, atol=1e-3)


def test_npz_template_validation(tmp_path):
    tree = _tree()
    path = str(tmp_path / "p.npz")
    save_params_npz(path, tree, dtype="float32")
    wrong_shape = jax.tree_util.tree_map(lambda a: a[..., :1], tree)
    with pytest.raises(ValueError):
        load_params_npz(path, template=wrong_shape)
    wrong_tree = {"params": {"head": tree["params"]["head"]}}
    with pytest.raises(ValueError):
        load_params_npz(path, template=wrong_tree)


def test_restore_params_dispatches_npz(tmp_path):
    from hybrid_diffusion_tpu.train.checkpoint import restore_params

    tree = _tree()
    path = str(tmp_path / "exported.npz")
    save_params_npz(path, tree, dtype="float16")
    template = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)
    out = restore_params(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-3, atol=1e-3)


def test_eval_shape_template_matches_real_init():
    """export_params.py builds its template with eval_shape — pin that it
    produces the same treedef/shapes as a real init on a tiny model."""
    from hybrid_diffusion_tpu.models import DynamicUNet

    model = DynamicUNet(T=16, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        dropout=0.0)
    x6 = jnp.zeros((1, 16, 16, 6))
    t = jnp.zeros((1,), jnp.int32)
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0), x6, t)
    real = jax.jit(model.init)(jax.random.PRNGKey(0), x6, t)
    a_flat, a_def = jax.tree_util.tree_flatten(abstract)
    r_flat, r_def = jax.tree_util.tree_flatten(real)
    assert a_def == r_def
    assert [l.shape for l in a_flat] == [l.shape for l in r_flat]
