"""The committed flagship weights must stay loadable.

Two trained-model artifacts survive the between-round `output/` wipe:
`docs/assets/flagship256_fp16.npz` (the step-50k base, the documented
warm-start anchor) and `docs/assets/flagship256_r5_fp16.npz` (the
round-5 warm-start extension — the current best flagship). Eval
(`scripts/eval_flagship.py --ckpt`) and warm-start training
(`--init_from_npz`) both restore them against a freshly built flagship
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
ARTIFACTS = [
    # (path, minimum step recorded in the sidecar)
    (os.path.join(REPO, "docs", "assets", "flagship256_fp16.npz"), 40_000),
    # The r5 extension run restarts its step counter at the warm start;
    # its sidecar step counts post-warm-start steps.
    (os.path.join(REPO, "docs", "assets", "flagship256_r5_fp16.npz"), 1),
]


@pytest.mark.parametrize("npz,min_step",
                         ARTIFACTS, ids=["base50k", "r5ext"])
def test_shipped_flagship_npz_matches_flagship_model(npz, min_step):
    if not os.path.exists(npz):
        pytest.skip("flagship npz not present")
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
    params = load_params_npz(npz, template=template)
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and all(
        l.dtype == t.dtype for l, t in
        zip(leaves, jax.tree_util.tree_leaves(template)))
    # Trained weights, not zeros/init garbage.
    assert any(float(jnp.abs(l).max()) > 0.01 for l in leaves)

    # Sidecar provenance: the shipped subtree was chosen by the
    # evidence policy and records the step it was exported at.
    side = json.load(open(npz + ".json"))
    assert side["subtree"] in ("params", "ema_params")
    assert side["step"] >= min_step


@pytest.mark.parametrize("npz,_min_step", ARTIFACTS, ids=["base50k", "r5ext"])
def test_shipped_flagship_npz_values_finite(npz, _min_step):
    if not os.path.exists(npz):
        pytest.skip("flagship npz not present")
    with np.load(npz) as z:
        for k in z.files:
            assert np.isfinite(z[k]).all(), f"non-finite values in {k}"


def test_r5_extension_sidecar_records_warm_start_provenance():
    """The r5 artifact must name the 50k npz it stands on (the provenance
    chain the round-4 ADVICE asked for, observed live in round 5)."""
    npz = ARTIFACTS[1][0]
    if not os.path.exists(npz + ".json"):
        pytest.skip("r5 sidecar not present")
    side = json.load(open(npz + ".json"))
    init = side.get("init_from") or {}
    assert init.get("path", "").endswith("flagship256_fp16.npz")
    assert init.get("src_step") == 50_000
