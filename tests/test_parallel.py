"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hybrid_diffusion_tpu.diffusion import linear_beta_schedule
from hybrid_diffusion_tpu.losses import CompositeLossConfig
from hybrid_diffusion_tpu.models import DynamicUNet
from hybrid_diffusion_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    shard_batch,
    shard_params,
    shard_state,
)
from hybrid_diffusion_tpu.train import create_train_state, make_train_step


def test_make_mesh_shapes():
    mesh = make_mesh()  # all 8 devices, pure DP
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


@pytest.fixture()  # function-scoped: donation in one test aliases/deletes
def setup():       # param buffers, so each test needs a fresh init
    model = DynamicUNet(T=20, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        dropout=0.0)
    x6 = jnp.zeros((8, 16, 16, 6))
    params = model.init(jax.random.PRNGKey(0), x6, jnp.zeros(8, jnp.int32))
    schedule = linear_beta_schedule(1e-4, 0.02, 20)
    return model, params, schedule


def _batch(B=8, size=16):
    rng = np.random.RandomState(0)
    return {
        "input": jnp.asarray(rng.randint(0, 255, (B, size, size, 3), np.uint8)),
        "gt": jnp.asarray(rng.randint(0, 255, (B, size, size, 3), np.uint8)),
    }


def test_param_shardings_tp_rules(setup):
    model, params, _ = setup
    mesh = make_mesh(model=2)
    sh = param_shardings(mesh, params)
    attn_in = sh["params"]["middle_0"]["attn"]["in_proj"]["kernel"]
    assert attn_in.spec == P(None, "model")
    attn_out = sh["params"]["middle_0"]["attn"]["out_proj"]["kernel"]
    assert attn_out.spec == P("model", None)
    head = sh["params"]["head"]["kernel"]
    assert head.spec == P()


def test_dp_train_step_on_mesh(setup):
    """Pure data-parallel step over 8 devices matches single-device math."""
    model, params, schedule = setup
    mesh = make_mesh()  # 8×1
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)

    state = create_train_state(params, model.apply, total_epochs=10,
                               steps_per_epoch=5)
    raw = make_train_step(schedule, cfg, domain_routing=True, jit=False)
    batch = _batch()

    # Run the plain step BEFORE the sharded one: donation of the sharded
    # state may delete aliased source buffers (see shard_params docstring).
    plain_step = make_train_step(schedule, cfg, domain_routing=True,
                                 donate=False)
    new_plain, m_plain = plain_step(state, batch, jax.random.PRNGKey(7))

    sharded_params = shard_params(mesh, params)
    sharded_state = create_train_state(sharded_params, model.apply,
                                       total_epochs=10, steps_per_epoch=5)
    sharded_state = shard_state(mesh, sharded_state)
    step = make_sharded_train_step(mesh, raw)
    sbatch = shard_batch(mesh, batch)
    new_sharded, m_sharded = step(sharded_state, sbatch, jax.random.PRNGKey(7))

    np.testing.assert_allclose(
        float(m_sharded["mse"]), float(m_plain["mse"]), rtol=1e-4
    )
    a = jax.tree_util.tree_leaves(new_sharded.params)[0]
    b = jax.tree_util.tree_leaves(new_plain.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_dp_mesh_train_step(setup):
    """4×2 DP×TP mesh: step runs and attention weights land sharded."""
    model, params, schedule = setup
    mesh = make_mesh(model=2)
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    sparams = shard_params(mesh, params)
    state = create_train_state(sparams, model.apply, total_epochs=10,
                               steps_per_epoch=5)
    state = shard_state(mesh, state)
    raw = make_train_step(schedule, cfg, jit=False)
    step = make_sharded_train_step(mesh, raw)
    new_state, metrics = step(state, shard_batch(mesh, _batch()),
                              jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total"]))
    k = new_state.params["params"]["middle_0"]["attn"]["in_proj"]["kernel"]
    assert k.sharding.spec == P(None, "model")


def test_batch_sharding_distributes(setup):
    mesh = make_mesh()
    b = shard_batch(mesh, _batch())
    assert b["input"].sharding.spec == P("data")
    # Each device holds B/8 examples.
    shard = b["input"].addressable_shards[0]
    assert shard.data.shape[0] == 1


def test_sharded_sampler_matches_single_device(setup):
    """Batch-sharded DDIM sampling == single-device sampling bit-for-bit
    (threefry partitionable RNG; params replicated, batch on data axis)."""
    from hybrid_diffusion_tpu.diffusion import ddim_sample
    from hybrid_diffusion_tpu.parallel import make_sharded_sampler

    model, params, schedule = setup

    def denoise(x6, t, context_zero=True):
        return model.apply(params, x6, t, context_zero=context_zero)

    def sample_fn(cond, rng):
        return ddim_sample(denoise, schedule, cond, rng, ddim_steps=4)

    cond = jnp.asarray(
        np.random.RandomState(3).randn(8, 16, 16, 3), jnp.float32)
    rng = jax.random.PRNGKey(11)
    plain = jax.jit(sample_fn)(cond, rng)

    mesh = make_mesh()  # 8×1
    sharded = make_sharded_sampler(mesh, sample_fn)(cond, rng)
    assert sharded.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               atol=2e-5)


def test_sharded_train_step_with_ema(setup):
    """EMA tree stays consistent under mesh execution + buffer donation."""
    model, params, schedule = setup
    mesh = make_mesh()  # 8×1 DP
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    state = create_train_state(shard_params(mesh, params), model.apply,
                               total_epochs=10, steps_per_epoch=5,
                               ema_decay=0.5)
    state = shard_state(mesh, state)
    step = make_sharded_train_step(mesh, make_train_step(
        schedule, cfg, domain_routing=True, jit=False))
    sbatch = shard_batch(mesh, _batch())
    for k in range(2):
        state, _ = step(state, sbatch, jax.random.PRNGKey(k))
    dist = float(sum(
        jnp.sum(jnp.square(e - p)) for e, p in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(state.params))))
    assert dist > 0  # EMA lags the live params
    assert np.isfinite(dist)


def test_zero1_optimizer_sharding(setup):
    """ZeRO-1: moments + EMA shard over the data axis, params replicated,
    and the update matches the fully-replicated step numerically."""
    from hybrid_diffusion_tpu.parallel import state_shardings

    model, params, schedule = setup
    mesh = make_mesh()  # 8×1 DP
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    batch = _batch()

    # Replicated baseline first (donation aliasing — see above).
    base = create_train_state(params, model.apply, total_epochs=10,
                              steps_per_epoch=5)
    plain_step = make_train_step(schedule, cfg, donate=False)
    new_plain, _ = plain_step(base, batch, jax.random.PRNGKey(7))

    state = create_train_state(shard_params(mesh, params), model.apply,
                               total_epochs=10, steps_per_epoch=5,
                               ema_decay=0.5)
    state = shard_state(mesh, state, zero1=True)
    sh = state_shardings(mesh, state, zero1=True)
    step = make_sharded_train_step(mesh, make_train_step(
        schedule, cfg, jit=False), state_shardings=sh)

    # Adam μ for a conv kernel: sharded over "data"; its param: replicated.
    mu = state.opt_state[1][0].mu["params"]["head"]["kernel"]
    assert "data" in tuple(mu.sharding.spec)
    assert mu.addressable_shards[0].data.size == mu.size // 8
    assert state.params["params"]["head"]["kernel"].sharding.spec == P()

    sbatch = shard_batch(mesh, batch)
    state, metrics = step(state, sbatch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["total"]))
    # First-step params match the replicated baseline (allclose: the
    # sharded reduction order differs) and stay replicated.
    np.testing.assert_allclose(
        np.asarray(state.params["params"]["head"]["kernel"]),
        np.asarray(new_plain.params["params"]["head"]["kernel"]),
        atol=1e-5)
    assert state.params["params"]["head"]["kernel"].sharding.spec == P()
    # Output state keeps the pinned ZeRO placement across steps.
    state, _ = step(state, sbatch, jax.random.PRNGKey(8))
    mu2 = state.opt_state[1][0].mu["params"]["head"]["kernel"]
    assert mu2.sharding == mu.sharding
    assert state.ema_params["params"]["head"]["kernel"].sharding.spec != P()


def test_zero1_checkpoint_roundtrip(setup, tmp_path):
    """Orbax save/restore of a ZeRO-1-sharded train state preserves the
    values and the restored state re-pins to the mesh placement."""
    from hybrid_diffusion_tpu.parallel import state_shardings
    from hybrid_diffusion_tpu.train.checkpoint import (
        restore_state,
        save_checkpoint,
    )

    model, params, schedule = setup
    mesh = make_mesh()
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    # Keep an unaliased copy: the donating step below deletes buffers that
    # shard_params aliased from `params` (see shard_params docstring).
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    state = create_train_state(shard_params(mesh, params), model.apply,
                               total_epochs=10, steps_per_epoch=5)
    state = shard_state(mesh, state, zero1=True)
    step = make_sharded_train_step(mesh, make_train_step(
        schedule, cfg, jit=False),
        state_shardings=state_shardings(mesh, state, zero1=True))
    state, _ = step(state, shard_batch(mesh, _batch()), jax.random.PRNGKey(0))

    mu_before = np.asarray(state.opt_state[1][0].mu["params"]["head"]["kernel"])
    path = save_checkpoint(str(tmp_path), 1, "Z1", "SYN", state)

    fresh = create_train_state(shard_params(mesh, params_copy), model.apply,
                               total_epochs=10, steps_per_epoch=5)
    fresh = shard_state(mesh, fresh, zero1=True)
    restored = restore_state(path, fresh)
    restored = shard_state(mesh, restored, zero1=True)
    mu = restored.opt_state[1][0].mu["params"]["head"]["kernel"]
    np.testing.assert_allclose(np.asarray(mu), mu_before)
    assert "data" in tuple(mu.sharding.spec)
    assert int(restored.step) == 1
