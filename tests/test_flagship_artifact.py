"""The committed flagship weights must stay loadable.

`docs/assets/flagship256_fp16.npz` is the repo's only trained-model
artifact that survives the between-round `output/` wipe; eval
(`scripts/eval_flagship.py --ckpt`) and warm-start training
(`--init_from_npz`) both restore it against a freshly built flagship
model. This pins that contract: any drift in the model definition
(layer names, shapes, topology — reference parity surface
diffusion/Model.py:382-431) that would orphan the shipped weights fails
here, on CPU, in seconds — not in round N+1 on the chip.

Structure-only via `jax.eval_shape`: no weights are materialized.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
NPZ = os.path.join(REPO, "docs", "assets", "flagship256_fp16.npz")


@pytest.mark.skipif(not os.path.exists(NPZ),
                    reason="flagship npz not present")
def test_shipped_flagship_npz_matches_flagship_model():
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import build_model
    from hybrid_diffusion_tpu.utils.params_io import load_params_npz

    # The flagship operating point (BASELINE.md / RUNBOOK flagship
    # command). img_size is irrelevant to the param tree (fully
    # convolutional) — trace the init at 32² so eval_shape stays cheap.
    cfg = Config(channel=128, channel_mult=(1, 2, 2, 2), num_res_blocks=2,
                 T=1000, dropout=0.15)
    model = build_model(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 6)), jnp.zeros((1,), jnp.int32))

    # Raises on any treedef/shape mismatch; casts fp16 -> template dtype.
    params = load_params_npz(NPZ, template=template)
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and all(
        l.dtype == t.dtype for l, t in
        zip(leaves, jax.tree_util.tree_leaves(template)))
    # Trained weights, not zeros/init garbage.
    assert any(float(jnp.abs(l).max()) > 0.01 for l in leaves)

    # Sidecar provenance: the shipped subtree was chosen by the
    # evidence policy and records the step it was exported at.
    side = json.load(open(NPZ + ".json"))
    assert side["subtree"] in ("params", "ema_params")
    assert side["step"] >= 40_000  # the flagship run's finished budget


@pytest.mark.skipif(not os.path.exists(NPZ),
                    reason="flagship npz not present")
def test_shipped_flagship_npz_values_finite():
    with np.load(NPZ) as z:
        for k in z.files:
            assert np.isfinite(z[k]).all(), f"non-finite values in {k}"
