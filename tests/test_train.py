"""Training-step tests: schedule golden values, loss decrease, domain gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.diffusion import linear_beta_schedule
from hybrid_diffusion_tpu.losses import CompositeLossConfig
from hybrid_diffusion_tpu.models import DynamicUNet
from hybrid_diffusion_tpu.train import (
    create_train_state,
    make_train_step,
    normalize_uint8,
    warmup_cosine_schedule,
)


def test_warmup_cosine_golden():
    """Matches the reference scheduler semantics (Scheduler.py:13-21):
    base=1e-4, multiplier=2, warm=10, total=100, 1 step/epoch."""
    s = warmup_cosine_schedule(1e-4, 100, 1, multiplier=2.0, warm_epochs=10)
    # Epoch 0: base.
    assert np.isclose(float(s(0)), 1e-4)
    # Epoch 5: base·(1·5/10+1) = 1.5e-4
    assert np.isclose(float(s(5)), 1.5e-4)
    # Epoch 10: base·2
    assert np.isclose(float(s(10)), 2e-4)
    # Epoch 60: cosine at progress (60-10)/100 → 2e-4·½(1+cos(π/2))
    assert np.isclose(float(s(60)), 2e-4 * 0.5, rtol=1e-5)
    # Monotone decrease after warmup.
    vals = [float(s(e)) for e in range(11, 100, 7)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_warmup_steps_per_epoch():
    s = warmup_cosine_schedule(1e-4, 100, 50, warm_epochs=10)
    # All steps within epoch 0 share the epoch-0 LR.
    assert float(s(0)) == float(s(49))
    assert float(s(0)) != float(s(50))


def test_normalize_uint8():
    x = jnp.array([[0, 127, 255]], dtype=jnp.uint8)
    out = normalize_uint8(x)
    np.testing.assert_allclose(
        np.asarray(out), [[-1.0, 127 / 255 * 2 - 1, 1.0]], atol=1e-6
    )


@pytest.fixture(scope="module")
def tiny_setup():
    model = DynamicUNet(T=20, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        dropout=0.0)
    x6 = jnp.zeros((2, 16, 16, 6))
    params = model.init(jax.random.PRNGKey(0), x6, jnp.array([0, 1]))
    schedule = linear_beta_schedule(1e-4, 0.02, 20)
    state = create_train_state(
        params, model.apply, lr=1e-3, total_epochs=10, steps_per_epoch=5
    )
    return model, state, schedule


def _batch(key=0, B=2, blue=True):
    rng = np.random.RandomState(key)
    img = rng.randint(0, 255, (B, 16, 16, 3), dtype=np.uint8)
    if blue:
        img[..., 2] = 255  # underwater-looking
    else:
        img[..., 0] = 255
    return {"input": jnp.asarray(img), "gt": jnp.asarray(img)}


def test_train_step_decreases_mse(tiny_setup):
    _, state, schedule = tiny_setup
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    step = make_train_step(schedule, cfg, domain_routing=False, donate=False)
    batch = _batch()
    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        losses.append(float(m["mse"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_domain_gating_freezes_middle_blocks(tiny_setup):
    """Underwater batch (blue>red) must leave odd middle blocks untouched;
    atmospheric batch must leave even blocks untouched."""
    _, state, schedule = tiny_setup
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    step = make_train_step(schedule, cfg, domain_routing=True, donate=False)

    def middle(params, i):
        return jax.tree_util.tree_leaves(params["params"][f"middle_{i}"])

    s1, m = step(state, _batch(blue=True), jax.random.PRNGKey(1))
    assert float(m["underwater_gate"]) == 1.0
    for i in (1, 3):  # frozen for underwater
        for a, b in zip(middle(state.params, i), middle(s1.params, i)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(middle(state.params, 0), middle(s1.params, 0))
    )
    assert changed  # active blocks did update

    s2, m2 = step(state, _batch(blue=False), jax.random.PRNGKey(1))
    assert float(m2["underwater_gate"]) == 0.0
    for i in (0, 2):  # frozen for atmospheric
        for a, b in zip(middle(state.params, i), middle(s2.params, i)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_no_recompile_across_domains(tiny_setup):
    """The gate is traced — both domains share one compiled step."""
    _, state, schedule = tiny_setup
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    step = make_train_step(schedule, cfg, donate=False)
    step(state, _batch(blue=True), jax.random.PRNGKey(0))
    n0 = step._cache_size()
    step(state, _batch(blue=False), jax.random.PRNGKey(0))
    assert step._cache_size() == n0


def test_full_composite_step_runs(tiny_setup):
    """Composite objective (MSE + MS-SSIM + color) through the full U-Net
    grad at 96² — 4 MS-SSIM scales engage. 96² (not the 5-scale 176²)
    because XLA:CPU compile time for the U-Net backward grows superlinearly
    past ~128px (≈45 min at 176² vs ≈70 s at 96² on this host); the
    5-scale path is covered by test_ms_ssim_five_scale_grad without the
    U-Net in the program.
    """
    _, state, schedule = tiny_setup
    step = make_train_step(schedule, CompositeLossConfig(dino_weight=0.0),
                           donate=False)
    batch = {
        "input": jnp.zeros((2, 96, 96, 3), jnp.uint8),
        "gt": jnp.zeros((2, 96, 96, 3), jnp.uint8),
    }
    # Needs a model init at this resolution — reuse state's params is fine
    # because the U-Net is resolution-agnostic.
    state2, m = step(state, batch, jax.random.PRNGKey(0))
    for k in ("mse", "ms_ssim", "color", "total", "grad_norm"):
        assert np.isfinite(float(m[k])), (k, m[k])


def test_ms_ssim_five_scale_grad():
    """All 5 standard MS-SSIM scales (min side ≥ 11·2⁴ = 176) produce a
    finite, nonzero gradient — the operating-point path of the 256² model,
    isolated from the U-Net so the compile stays seconds-scale."""
    from hybrid_diffusion_tpu.losses.ms_ssim import ms_ssim_loss

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 176, 176, 3), jnp.float32)
    y = jnp.asarray(rng.rand(2, 176, 176, 3), jnp.float32)
    g = jax.jit(jax.grad(lambda a: ms_ssim_loss(a, y)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_full_state_checkpoint_resume(tmp_path):
    """save_checkpoint -> restore_state resumes step + optimizer moments;
    train(resume_from=...) continues instead of restarting the schedule."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.checkpoint import (
        restore_state,
        save_checkpoint,
    )
    from hybrid_diffusion_tpu.train.loop import train

    model = DynamicUNet(T=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        dropout=0.0)
    x6 = jnp.zeros((2, 16, 16, 6))
    params = model.init(jax.random.PRNGKey(0), x6, jnp.zeros(2, jnp.int32))
    state = create_train_state(params, model.apply, total_epochs=4,
                               steps_per_epoch=2)
    schedule = linear_beta_schedule(1e-4, 0.02, 8)
    step = make_train_step(
        schedule, CompositeLossConfig(dino_weight=0, ms_ssim_weight=0,
                                      color_weight=0), donate=False)
    rng = np.random.RandomState(0)
    batch = {"input": jnp.asarray(rng.randint(0, 255, (2, 16, 16, 3),
                                              np.uint8)),
             "gt": jnp.asarray(rng.randint(0, 255, (2, 16, 16, 3),
                                           np.uint8))}
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    path = save_checkpoint(str(tmp_path), 3, "Stage", "SYN", state)

    fresh = create_train_state(params, model.apply, total_epochs=4,
                               steps_per_epoch=2)
    restored = restore_state(path, fresh)
    assert int(restored.step) == 3
    a = jax.tree_util.tree_leaves(restored.params)[0]
    b = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer moments restored too (non-zero after 3 steps)
    mo = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in mo
               if hasattr(l, "shape") and getattr(l, "size", 0) > 1)

    # end-to-end: train() continues from the checkpoint step
    cfg = Config(synthetic_data=True, synthetic_length=8, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                 save_checkpoint=1000, dino_weight=0.0, bf16=False,
                 checkpoint_dir=str(tmp_path / "ck2"),
                 output_path=str(tmp_path / "out"), num_workers=1,
                 compilation_cache="", resume_from=path)
    # max_steps is a GLOBAL optimizer-step budget: the restored step (3)
    # counts toward it, so budget 4 runs exactly one more step — the
    # original schedule completes instead of appending a fresh budget.
    summary = train(cfg, max_steps=4)
    assert summary["steps"] == 4


def test_nan_guard_saves_emergency_checkpoint(tmp_path, monkeypatch):
    """A non-finite loss aborts the stage with a resumable emergency save."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train import loop as loop_mod

    real = loop_mod.make_train_step

    def poisoned(*args, **kwargs):
        step = real(*args, **kwargs)

        def bad(state, batch, rng):
            new_state, metrics = step(state, batch, rng)
            metrics = dict(metrics)
            metrics["total"] = jnp.float32(float("nan"))
            return new_state, metrics

        return bad

    monkeypatch.setattr(loop_mod, "make_train_step", poisoned)
    cfg = Config(synthetic_data=True, synthetic_length=8, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                 save_checkpoint=1000, dino_weight=0.0, bf16=False,
                 checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "out"), num_workers=1,
                 compilation_cache="")
    with pytest.raises(FloatingPointError):
        loop_mod.train(cfg)
    saved = list((tmp_path / "ck").glob("*NAN_ABORT*"))
    assert saved, "emergency checkpoint not written"


def test_find_checkpoint_by_epoch(tmp_path):
    from hybrid_diffusion_tpu.train.checkpoint import find_checkpoint

    for name in ("ckpt_200_Atmospheric_HICRDLoLI",
                 "ckpt_400_Underwater_HICRDLoLI", "notes.txt"):
        p = tmp_path / name
        if name.endswith(".txt"):
            p.write_text("x")
        else:
            p.mkdir()
    assert find_checkpoint(str(tmp_path), 400).endswith(
        "ckpt_400_Underwater_HICRDLoLI")
    assert find_checkpoint(str(tmp_path), 999) is None


def test_evaluate_ragged_final_batch(tmp_path):
    """Eval pads the ragged final batch (one compiled shape) and reports
    metrics over exactly the real images."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import evaluate

    # Disjoint synthetic splits: val length = synthetic_length // 7.
    cfg = Config(synthetic_data=True, synthetic_length=350, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, ddim=True, ddim_step=4, bf16=False,
                 dino_weight=0.0, output_path=str(tmp_path),
                 checkpoint_dir=str(tmp_path), num_workers=1,
                 compilation_cache="")
    res = evaluate(cfg, split="val", compute_fid=False, save_images=False)
    # 50 val images / batch 8 → 6 full + 1 ragged batch of 2 (padded to 8,
    # sliced back); all 50 real images scored
    assert res["underwater"]["n_images"] == 50
    assert np.isfinite(res["underwater"]["psnr"])
    # The UIQM suite must see 0-255 images end-to-end (reference
    # rotinas.py:918-923): on [0,1] inputs UISM degenerates to exactly 0
    # for every image (round-2 regression, VERDICT weak #2).
    assert res["underwater"]["uism"] > 0.0
    assert abs(res["underwater"]["uiconm"]) > 1e-6


def test_eval_every_writes_psnr_curve(tmp_path):
    """--eval_every N banks a fixed-subset val-PSNR JSONL during training
    (the reference's per-checkpoint test-hook intent, rotinas.py:699-711)."""
    import json

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    cfg = Config(synthetic_data=True, synthetic_length=56, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, epochs_stage_1=2, epochs_stage_2=0,
                 save_checkpoint=1000, eval_every=2, eval_probe_steps=3,
                 dino_weight=0.0, bf16=False,
                 checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "o"), num_workers=1,
                 compilation_cache="")
    train(cfg)
    curve = tmp_path / "o" / "eval_curve.jsonl"
    assert curve.exists()
    rows = [json.loads(line) for line in curve.read_text().splitlines()]
    assert rows, "probe wrote no rows"
    for r in rows:
        assert np.isfinite(r["psnr"]) and r["n"] > 0
        assert r["epoch"] == 2
    # The probe scores BOTH domains even in a single-domain stage, so
    # cross-domain forgetting is visible live (the r4 staged recipe lost
    # 6.5 dB on the stage-1 domain with no artifact to show when).
    assert {r["domain"] for r in rows} == {"atmospheric", "underwater"}


def test_joint_training_interleaves_domains(tmp_path):
    """joint_training=True runs one stage over both domain loaders."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    cfg = Config(synthetic_data=True, synthetic_length=8, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, joint_training=True,
                 epochs_stage_1=1, epochs_stage_2=0, save_checkpoint=1000,
                 dino_weight=0.0, bf16=False,
                 checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "o"), num_workers=1,
                 compilation_cache="")
    summary = train(cfg)
    assert [s["stage"] for s in summary["stages"]] == ["Joint"]
    # one epoch over BOTH loaders: 8 atm + 8 uw images / batch 8 = 2 steps
    assert summary["steps"] == 2


# ---------- EMA + gradient accumulation (beyond-reference, train_state.py) ----


def test_ema_tracks_params(tiny_setup):
    model, _, schedule = tiny_setup
    params = jax.tree_util.tree_map(jnp.array, tiny_setup[1].params)
    state = create_train_state(params, model.apply, lr=1e-3, total_epochs=10,
                               steps_per_epoch=5, ema_decay=0.5)
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    step = make_train_step(schedule, cfg, domain_routing=False, donate=False)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    s0_params = jax.tree_util.tree_map(jnp.array, state.params)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, batch, sub)
    # EMA moved off the start but lags the live params (whole-tree L2).
    d_e_p0 = _tree_dist(state.ema_params, s0_params)
    d_e_p = _tree_dist(state.ema_params, state.params)
    d_p_p0 = _tree_dist(state.params, s0_params)
    assert d_e_p0 > 0 and d_e_p > 0
    assert d_e_p0 < d_p_p0  # the average trails the trajectory
    # eval_params prefers the EMA tree.
    assert state.eval_params is state.ema_params


def _tree_dist(a, b) -> float:
    return float(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))))


def test_ema_checkpoint_roundtrip(tiny_setup, tmp_path):
    from hybrid_diffusion_tpu.train.checkpoint import (
        checkpoint_has_ema,
        restore_params,
        restore_state,
        save_checkpoint,
    )

    model, _, schedule = tiny_setup
    params = jax.tree_util.tree_map(jnp.array, tiny_setup[1].params)
    state = create_train_state(params, model.apply, lr=1e-2, total_epochs=10,
                               steps_per_epoch=5, ema_decay=0.9)
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    step = make_train_step(schedule, cfg, domain_routing=False, donate=False)
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))
    # Mark the EMA mature (decay^step < 5%) so restore_params selects it;
    # immature-EMA fallback is covered by
    # test_immature_ema_restore_falls_back_to_raw.
    state = state.replace(step=jnp.asarray(100))
    path = save_checkpoint(str(tmp_path), 1, "Stage", "ds", state)
    assert checkpoint_has_ema(path)
    # restore_params prefers EMA weights when the EMA is mature.
    got = restore_params(path, jax.tree_util.tree_map(jnp.zeros_like, params))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(got)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]))
    # full-state resume restores the EMA tree too.
    fresh = create_train_state(
        jax.tree_util.tree_map(jnp.zeros_like, params), model.apply,
        lr=1e-2, total_epochs=10, steps_per_epoch=5, ema_decay=0.9)
    resumed = restore_state(path, fresh)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(resumed.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]))


def test_immature_ema_restore_falls_back_to_raw(tiny_setup, tmp_path):
    """VERDICT r3 weak #2 regression: a preempted run whose EMA decay was
    calibrated to the full budget leaves an EMA that is mostly random init;
    restore_params must load the raw params instead (the r3 artifact scored
    4.4 dB from the EMA while raw params scored 9-10 dB)."""
    from hybrid_diffusion_tpu.train.checkpoint import (
        choose_restore_subtree,
        load_metadata,
        restore_params,
        save_checkpoint,
    )

    model, _, schedule = tiny_setup
    params = jax.tree_util.tree_map(jnp.array, tiny_setup[1].params)
    state = create_train_state(params, model.apply, lr=1e-2, total_epochs=10,
                               steps_per_epoch=5, ema_decay=0.999)
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    step = make_train_step(schedule, cfg, domain_routing=False, donate=False)
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))
    path = save_checkpoint(str(tmp_path), 1, "Stage", "ds", state)
    meta = load_metadata(path)
    assert meta["step"] == 1 and meta["ema_decay"] == 0.999
    subtree, reason = choose_restore_subtree(path)
    assert subtree == "params" and "immature" in reason
    got = restore_params(path, jax.tree_util.tree_map(jnp.zeros_like, params))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(got)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))


def test_probe_evidence_overrides_ema_maturity(tmp_path):
    """Direct raw-vs-EMA probe PSNR stored in checkpoint metadata beats the
    decay^step init-mass proxy: a 'mature' EMA that still lags the raw
    weights (measured live: 4% init mass, 5.6 vs 14.3 dB) must not be the
    eval subtree."""
    import json
    import os

    from hybrid_diffusion_tpu.train.checkpoint import choose_restore_subtree

    d = tmp_path / "ckpt_1_S_D"
    d.mkdir()
    meta = {"has_ema": True, "step": 3200, "ema_decay": 0.999,
            "probe": {"step": 3200, "psnr": 14.3, "psnr_ema": 5.6}}
    (d / "hdt_metadata.json").write_text(json.dumps(meta))
    subtree, reason = choose_restore_subtree(str(d))
    assert subtree == "params" and "probe" in reason
    meta["probe"] = {"step": 39000, "psnr": 13.0, "psnr_ema": 13.9}
    (d / "hdt_metadata.json").write_text(json.dumps(meta))
    subtree, _ = choose_restore_subtree(str(d))
    assert subtree == "ema_params"
    # Without probe evidence the init-mass rule still applies.
    del meta["probe"]
    (d / "hdt_metadata.json").write_text(json.dumps(meta))
    assert choose_restore_subtree(str(d))[0] == "ema_params"
    meta["step"] = 100  # 0.999^100 = 90% init mass
    (d / "hdt_metadata.json").write_text(json.dumps(meta))
    assert choose_restore_subtree(str(d))[0] == "params"


def test_checkpoint_same_name_never_clobbers(tiny_setup, tmp_path):
    """VERDICT r3 weak #1 regression: two runs saving the same
    epoch/stage/datasets name must yield two distinct checkpoints (round 3
    lost its weights to force=True overwrites at one shared path), and
    auto-resume must pick the newest."""
    import os

    from hybrid_diffusion_tpu.train.checkpoint import (
        find_latest_checkpoint,
        restore_params,
        save_checkpoint,
    )

    model, base_state, _ = tiny_setup
    params = jax.tree_util.tree_map(jnp.array, base_state.params)
    s1 = create_train_state(params, model.apply, lr=1e-2, total_epochs=1,
                            steps_per_epoch=5)
    s2 = create_train_state(
        jax.tree_util.tree_map(lambda a: a + 1.0, params), model.apply,
        lr=1e-2, total_epochs=1, steps_per_epoch=5)
    p1 = save_checkpoint(str(tmp_path), 7, "Joint_PREEMPT", "SYN", s1)
    p2 = save_checkpoint(str(tmp_path), 7, "Joint_PREEMPT", "SYN", s2)
    assert p1 != p2 and os.path.isdir(p1) and os.path.isdir(p2)
    assert find_latest_checkpoint(str(tmp_path)) == p2
    # The first run's weights are intact, not overwritten by the second's.
    got1 = restore_params(p1, jax.tree_util.tree_map(jnp.zeros_like, params))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(got1)[0]),
        np.asarray(jax.tree_util.tree_leaves(s1.params)[0]))


def test_export_npz_snapshot_during_training(tmp_path):
    """export_npz: every checkpoint save also writes a flat fp16 npz (+
    sidecar naming the subtree/step) that restore_params loads directly —
    the round-portable artifact (VERDICT r3 #1/#3)."""
    import json

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    out_npz = tmp_path / "weights.npz"
    cfg = Config(synthetic_data=True, synthetic_length=8, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                 save_checkpoint=1, dino_weight=0.0, bf16=False,
                 ms_ssim_weight=0.0, color_weight=0.0, ema_decay=0.9,
                 checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "o"), num_workers=1,
                 export_npz=str(out_npz), compilation_cache="")
    summary = train(cfg)
    assert out_npz.exists()
    sidecar = json.loads((tmp_path / "weights.npz.json").read_text())
    # 1 epoch × 1 batch at decay 0.9 → EMA immature → raw params exported.
    assert sidecar["subtree"] == "params"
    assert sidecar["step"] == summary["steps"] == 1
    from hybrid_diffusion_tpu.train.checkpoint import restore_params

    template = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), summary["params"])
    got = restore_params(str(out_npz), template)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(got)[0]),
        np.asarray(jax.tree_util.tree_leaves(summary["params"])[0]),
        rtol=2e-3, atol=2e-3)  # fp16 storage round-trip


def test_init_from_npz_warm_starts_training(tmp_path, monkeypatch, capsys):
    """init_from_npz: a new run stands on a committed npz's weights (fp16
    -> f32 via the template cast), with a fresh optimizer — the cross-round
    continuation path once the orbax tree under output/ is wiped."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train import loop as loop_mod
    from hybrid_diffusion_tpu.train.loop import train

    out_npz = tmp_path / "w.npz"
    base = dict(synthetic_data=True, synthetic_length=8, batch_size=8,
                img_size=16, channel=32, channel_mult=(1, 2),
                num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                save_checkpoint=1, dino_weight=0.0, bf16=False,
                ms_ssim_weight=0.0, color_weight=0.0, ema_decay=0.0,
                num_workers=1, compilation_cache="")
    train(Config(checkpoint_dir=str(tmp_path / "ck_a"),
                 output_path=str(tmp_path / "oa"),
                 export_npz=str(out_npz), **base))
    assert out_npz.exists()

    captured = {}
    real = loop_mod.create_train_state

    def spy(params, *args, **kwargs):
        # Host copy: the live arrays are later donated into the jitted
        # train step and deleted.
        captured.setdefault("params", jax.device_get(params))
        return real(params, *args, **kwargs)

    monkeypatch.setattr(loop_mod, "create_train_state", spy)
    train(Config(checkpoint_dir=str(tmp_path / "ck_b"),
                 output_path=str(tmp_path / "ob"),
                 init_from_npz=str(out_npz), **base))
    assert "warm-start params from" in capsys.readouterr().out

    import numpy as np_
    from hybrid_diffusion_tpu.utils.params_io import flatten_params

    with np_.load(out_npz) as z:
        saved = {k: z[k] for k in z.files}
    got = flatten_params(captured["params"])
    assert set(got) == set(saved)
    for k in saved:
        # Exact: fp16 values are representable in the f32 master weights.
        np_.testing.assert_array_equal(got[k].astype(np_.float16), saved[k])
        assert got[k].dtype == np_.float32


def test_resume_auto_falls_back_to_npz_warm_start(tmp_path, capsys):
    """--resume_from auto + --init_from_npz with no checkpoint yet (the
    FIRST segment of a segmented warm-started run): falls back to the npz
    warm-start instead of raising, and records the warm-start provenance
    in the run's checkpoint metadata (ADVICE r4 items 1 and 3)."""
    import jax
    import jax.numpy as jnp

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.checkpoint import (
        find_latest_checkpoint,
        load_metadata,
    )
    from hybrid_diffusion_tpu.train.loop import build_model, train
    from hybrid_diffusion_tpu.utils.params_io import save_params_npz

    base = dict(synthetic_data=True, synthetic_length=8, batch_size=8,
                img_size=16, channel=32, channel_mult=(1, 2),
                num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                save_checkpoint=1, dino_weight=0.0, bf16=False,
                ms_ssim_weight=0.0, color_weight=0.0, ema_decay=0.0,
                num_workers=1, compilation_cache="")
    cfg = Config(checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "o"),
                 resume_from="auto", init_from_npz=str(tmp_path / "w.npz"),
                 lr=1e-5, **base)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 16, 16, 6)), jnp.zeros((1,), jnp.int32))
    save_params_npz(str(tmp_path / "w.npz"), params)

    train(cfg, max_steps=1)
    out = capsys.readouterr().out
    assert "falling back to the --init_from_npz warm-start" in out
    assert "warm-start params from" in out

    meta = load_metadata(find_latest_checkpoint(str(tmp_path / "ck")))
    assert meta["init_from"]["path"] == str(tmp_path / "w.npz")


def test_resume_inherits_warm_start_provenance(tmp_path, capsys):
    """Segment 2+ of a warm-started segmented run resumes from a checkpoint,
    not the npz — but its checkpoints AND exported-npz sidecars must keep
    recording the artifact the whole run stands on (round 5: the segment-1
    final export recorded init_from null, breaking the provenance chain)."""
    import jax
    import jax.numpy as jnp

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.checkpoint import (
        find_latest_checkpoint,
        load_metadata,
    )
    from hybrid_diffusion_tpu.train.loop import build_model, train
    from hybrid_diffusion_tpu.utils.params_io import save_params_npz

    base = dict(synthetic_data=True, synthetic_length=8, batch_size=8,
                img_size=16, channel=32, channel_mult=(1, 2),
                num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                save_checkpoint=1, dino_weight=0.0, bf16=False,
                ms_ssim_weight=0.0, color_weight=0.0, ema_decay=0.0,
                num_workers=1, compilation_cache="")
    base["epochs_stage_1"] = 3
    cfg = Config(checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "o"),
                 resume_from="auto", init_from_npz=str(tmp_path / "w.npz"),
                 export_npz=str(tmp_path / "exp.npz"),
                 lr=1e-5, **base)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 16, 16, 6)), jnp.zeros((1,), jnp.int32))
    save_params_npz(str(tmp_path / "w.npz"), params)

    train(cfg, max_steps=2)  # segment 1: npz warm-start, ends mid-stage
    capsys.readouterr()
    # Segment 2 resumes full state from segment 1's mid-stage periodic
    # checkpoint (epoch 1) — the real segmented-run shape.
    from hybrid_diffusion_tpu.train.checkpoint import find_checkpoint

    mid_ckpt = find_checkpoint(str(tmp_path / "ck"), 1)
    assert mid_ckpt is not None
    cfg2 = Config(**{**cfg.__dict__, "resume_from": mid_ckpt})
    train(cfg2, max_steps=3)
    assert "resumed full state" in capsys.readouterr().out

    import json

    meta = load_metadata(find_latest_checkpoint(str(tmp_path / "ck")))
    assert meta["init_from"]["path"] == str(tmp_path / "w.npz")
    with open(str(tmp_path / "exp.npz") + ".json") as f:
        assert json.load(f)["init_from"]["path"] == str(tmp_path / "w.npz")


def test_warm_start_high_lr_warns(tmp_path, capsys):
    """Warm-starting shipped weights with the from-scratch default lr (or
    higher) prints a degradation warning (ADVICE r4 item 4)."""
    import jax
    import jax.numpy as jnp

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import build_model, train
    from hybrid_diffusion_tpu.utils.params_io import save_params_npz

    base = dict(synthetic_data=True, synthetic_length=8, batch_size=8,
                img_size=16, channel=32, channel_mult=(1, 2),
                num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                save_checkpoint=1, dino_weight=0.0, bf16=False,
                ms_ssim_weight=0.0, color_weight=0.0, ema_decay=0.0,
                num_workers=1, compilation_cache="")
    cfg = Config(checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "o"),
                 init_from_npz=str(tmp_path / "w.npz"), **base)
    assert cfg.lr == type(cfg).lr  # the from-scratch default
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 16, 16, 6)), jnp.zeros((1,), jnp.int32))
    save_params_npz(str(tmp_path / "w.npz"), params)
    train(cfg, max_steps=1)
    assert "WARNING: warm-starting trained weights" in capsys.readouterr().out


def test_grad_accum_matches_big_batch(tiny_setup):
    """k micro-steps with grad_accum=k == one step on the concatenated batch
    (same LR step; mean loss ⇒ averaged gradients)."""
    model, _, schedule = tiny_setup
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0, color_weight=0)
    step = make_train_step(schedule, cfg, domain_routing=False, donate=False)

    def fresh(k):
        params = jax.tree_util.tree_map(jnp.array, tiny_setup[1].params)
        return create_train_state(params, model.apply, lr=1e-3,
                                  total_epochs=10, steps_per_epoch=5,
                                  grad_accum=k)

    b1, b2 = _batch(0), _batch(1)
    sa = fresh(2)
    p0 = jax.tree_util.tree_map(jnp.array, sa.params)
    sa, _ = step(sa, b1, jax.random.PRNGKey(7))
    # After the 1st micro-batch no optimizer update happened (whole tree).
    assert _tree_dist(sa.params, p0) == 0.0
    sa, _ = step(sa, b2, jax.random.PRNGKey(8))
    assert _tree_dist(sa.params, p0) > 0.0


def test_aux_snr_weight_through_train_step(tiny_setup):
    model, _, schedule = tiny_setup
    params = jax.tree_util.tree_map(jnp.array, tiny_setup[1].params)
    state = create_train_state(params, model.apply, lr=1e-3,
                               total_epochs=10, steps_per_epoch=5)
    cfg = CompositeLossConfig(dino_weight=0, ms_ssim_weight=0,
                              color_weight=1.0, aux_snr_weight=True)
    step = make_train_step(schedule, cfg, domain_routing=False, donate=False)
    state, metrics = step(state, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total"]))
    assert "color" in metrics


def test_async_checkpoint_roundtrip(tiny_setup, tmp_path):
    """block=False saves commit after wait_for_checkpoints(), with
    metadata intact and the saved arrays immune to later donation."""
    from hybrid_diffusion_tpu.train.checkpoint import (
        checkpoint_has_ema,
        restore_state,
        save_checkpoint,
        wait_for_checkpoints,
    )

    model, base_state, schedule = tiny_setup
    params = base_state.params
    batch = _batch()
    state = create_train_state(params, model.apply, total_epochs=4,
                               steps_per_epoch=2, ema_decay=0.5)
    step = make_train_step(
        schedule, CompositeLossConfig(dino_weight=0, ms_ssim_weight=0,
                                      color_weight=0), donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    saved_head = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]).copy()

    path = save_checkpoint(str(tmp_path), 1, "Async", "SYN", state,
                           metadata={"stage": "Async"}, block=False)
    # Mutate the live state after the async save returned (the D2H copy
    # must have already happened).
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    wait_for_checkpoints()
    assert checkpoint_has_ema(path)

    fresh = create_train_state(params, model.apply, total_epochs=4,
                               steps_per_epoch=2, ema_decay=0.5)
    restored = restore_state(path, fresh)
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        saved_head)


def test_preemption_checkpoint_and_auto_resume(tmp_path):
    """SIGTERM mid-train → graceful stop with a resumable checkpoint;
    --resume_from auto continues from it."""
    import os
    import signal
    import threading

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    cfg = Config(synthetic_data=True, synthetic_length=8, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, epochs_stage_1=2000,
                 epochs_stage_2=0, save_checkpoint=10_000, dino_weight=0.0,
                 bf16=False, ms_ssim_weight=0.0, color_weight=0.0,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 output_path=str(tmp_path / "out"))

    # Fire SIGTERM shortly after training starts; the loop must stop at
    # an epoch boundary long before 2000 epochs.
    killer = threading.Timer(10.0, os.kill, (os.getpid(), signal.SIGTERM))
    killer.start()
    try:
        summary = train(cfg)
    finally:
        killer.cancel()
    assert summary["preempted"]
    assert summary["steps"] < 2000
    ckpt = summary["stages"][-1]["checkpoint"]
    assert "_PREEMPT" in ckpt and os.path.isdir(ckpt)

    # Auto-resume picks the newest checkpoint and continues the step count.
    cfg2 = Config(**{**cfg.__dict__, "resume_from": "auto",
                     "epochs_stage_1": 1})
    summary2 = train(cfg2, max_steps=summary["steps"] + 2)
    assert not summary2["preempted"]


def test_find_latest_skips_orbax_tmp(tmp_path):
    """An in-flight orbax temp dir (left by an unclean kill mid-save) must
    never be picked by --resume_from auto or epoch lookup."""
    import time as _time

    from hybrid_diffusion_tpu.train.checkpoint import (
        find_checkpoint,
        find_latest_checkpoint,
    )

    (tmp_path / "ckpt_1_Stage_D").mkdir()
    _time.sleep(0.01)
    (tmp_path / "ckpt_2_Stage_D.orbax-checkpoint-tmp-1723890").mkdir()
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("ckpt_1_Stage_D")
    assert find_checkpoint(str(tmp_path), 2) is None


def test_parse_loss_overrides():
    from hybrid_diffusion_tpu.config import Config, parse_loss_overrides

    assert parse_loss_overrides("vgg=1.0, charbonnier=0.5") == {
        "vgg": 1.0, "charbonnier": 0.5}
    assert parse_loss_overrides("") == {}
    with pytest.raises(ValueError):
        parse_loss_overrides("nonsense=1.0")
    with pytest.raises(ValueError):
        parse_loss_overrides("vgg")

    cfg = Config(stage1_losses="vgg=1.0,dino=0",
                 stage2_losses="charbonnier=2.0")
    s1, s2 = cfg.stage_loss_config(0), cfg.stage_loss_config(1)
    assert s1.vgg_weight == 1.0 and s1.dino_weight == 0.0
    assert s1.ms_ssim_weight == cfg.ms_ssim_weight  # untouched → shared
    assert s2.charbonnier_weight == 2.0 and s2.vgg_weight == 0.0


def test_per_stage_loss_sets(tmp_path, monkeypatch):
    """The run-book's two-stage recipe (aplicacao.ipynb: 'Pre-Training
    VGG+Charbonnier' then 'Enhancement (Charbonnier+Color+MS_SSIM)') is
    expressible: each stage's logged per-term losses reflect exactly its
    own weight set, and the VGG extractor is built when any stage uses it."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train import loop as loop_mod

    logs = []

    class Recorder:
        def __init__(self, *a, **k):
            pass

        def log(self, metrics, step=None, prefix=""):
            safe = {}
            for k, v in metrics.items():
                try:
                    safe[k] = float(v)
                except (TypeError, ValueError):
                    continue
            logs.append((prefix, safe))
            return safe

        def alert(self, *a, **k):
            pass

        def finish(self):
            pass

    monkeypatch.setattr(loop_mod, "MetricsLogger", Recorder)
    cfg = Config(
        synthetic_data=True, synthetic_length=8, batch_size=8,
        img_size=16, channel=32, channel_mult=(1, 2), num_res_blocks=1,
        T=8, epochs_stage_1=1, epochs_stage_2=1, save_checkpoint=1000,
        bf16=False, num_workers=1, compilation_cache="",
        checkpoint_dir=str(tmp_path / "ck"),
        output_path=str(tmp_path / "out"),
        stage1_losses="vgg=0.2,charbonnier=1.0,dino=0,ms_ssim=0,color=0",
        stage2_losses="charbonnier=1.0,color=1.0,ms_ssim=0.0045,"
                      "dino=0,vgg=0",
    )
    summary = loop_mod.train(cfg)
    assert len(summary["stages"]) == 2

    stage1 = [m for p, m in logs if p.startswith("Train Atmospheric")]
    stage2 = [m for p, m in logs if p.startswith("Train Underwater")]
    assert stage1 and stage2
    assert "vgg" in stage1[-1] and "charbonnier" in stage1[-1]
    assert "color" not in stage1[-1] and "ms_ssim" not in stage1[-1]
    assert "dino" not in stage1[-1]
    assert "vgg" not in stage2[-1] and "dino" not in stage2[-1]
    for term in ("charbonnier", "color", "ms_ssim"):
        assert term in stage2[-1]
    assert np.isfinite(stage1[-1]["total"])
    assert np.isfinite(stage2[-1]["total"])


def test_demo_e2e_staged_config_plumbing():
    """scripts/demo_e2e.py --staged maps --steps onto the reference's
    two-stage recipe (rotinas.py:643-731): equal epoch budgets per stage,
    joint_training off, per-stage loss overrides forwarded."""
    import argparse
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "demo_e2e", os.path.join(os.path.dirname(__file__), os.pardir,
                                 "scripts", "demo_e2e.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    base = dict(steps=4000, size=128, batch=16, channel=64,
                channel_mult=[1, 2, 2], num_res_blocks=2,
                synthetic_length=256, domain_routing=False, T=200,
                dropout=0.1, save_every=10_000, lr=2e-4, ddim_steps=50,
                color_weight=0.0, dino_weight=0.0, ms_ssim_weight=0.0,
                aux_snr_weight=True, eval_every=0, eval_probe_steps=15,
                export_npz="", resume_from=None, device_data=False,
                init_from_npz="/tmp/warm.npz",
                use_conditioning=False, p_uncond=0.1, guidance=1.0,
                stage1_losses="vgg=1.0,charbonnier=1.0,dino=0,color=0,"
                              "ms_ssim=0",
                stage2_losses="charbonnier=1.0,color=1.0,ms_ssim=0.0045,"
                              "dino=0")
    staged = demo.build_config(
        "/tmp/x", argparse.Namespace(staged=True, **base))
    # 4000 steps / 2 stages / (256/16 steps per staged epoch) = 125 each.
    assert (staged.epochs_stage_1, staged.epochs_stage_2) == (125, 125)
    assert staged.joint_training is False
    s1, s2 = staged.stage_loss_config(0), staged.stage_loss_config(1)
    assert s1.vgg_weight == 1.0 and s1.color_weight == 0.0
    assert s2.vgg_weight == 0.0 and s2.color_weight == 1.0
    assert s2.ms_ssim_weight == 0.0045
    assert s1.aux_snr_weight and s2.aux_snr_weight

    assert staged.init_from_npz == "/tmp/warm.npz"

    joint = demo.build_config(
        "/tmp/x", argparse.Namespace(staged=False, **base))
    assert joint.joint_training is True and joint.epochs_stage_2 == 0


def test_stage_final_resume_enters_next_stage(tmp_path, capsys):
    """Resuming from a stage-1 FINAL checkpoint skips stage 1 and runs
    stage 2 on the restored weights with a FRESH optimizer — the
    reference's per-stage semantics (rotinas.py:660: new AdamW + warmup
    per stage), not stage 1's moments and schedule step."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    base = dict(synthetic_data=True, synthetic_length=8, batch_size=8,
                img_size=16, channel=32, channel_mult=(1, 2),
                num_res_blocks=1, T=8, save_checkpoint=10_000,
                dino_weight=0.0, bf16=False, ms_ssim_weight=0.0,
                color_weight=0.0, joint_training=False,
                checkpoint_dir=str(tmp_path / "ckpt"),
                output_path=str(tmp_path / "out"))
    s1 = train(Config(epochs_stage_1=2, epochs_stage_2=0, **base))
    ck = s1["stages"][-1]["checkpoint"]
    assert "_final_" in ck and "Atmospheric" in ck

    s2 = train(Config(epochs_stage_1=2, epochs_stage_2=1,
                      resume_from=ck, **base))
    out = capsys.readouterr().out
    # Stage 1 was skipped; only stage 2 ran in this invocation.
    assert [st["stage"] for st in s2["stages"]] == ["Underwater"]
    assert "skipping completed stage Atmospheric" in out
    assert "fresh optimizer" in out
    assert not s2["preempted"]


def test_mid_stage2_resume_skips_stage1(tmp_path, capsys):
    """A run cut short inside stage 2 must resume INTO stage 2 (full
    state: params + optimizer moments + step), not replay stage 1's loss
    set over the stage-2 weights."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    base = dict(synthetic_data=True, synthetic_length=8, batch_size=8,
                img_size=16, channel=32, channel_mult=(1, 2),
                num_res_blocks=1, T=8, save_checkpoint=10_000,
                dino_weight=0.0, bf16=False, ms_ssim_weight=0.0,
                color_weight=0.0, joint_training=False,
                checkpoint_dir=str(tmp_path / "ckpt"),
                output_path=str(tmp_path / "out"))
    # Stage 1 is one epoch (1 step); the global budget stops the run two
    # steps into stage 2's 2000-epoch plan.
    s1 = train(Config(epochs_stage_1=1, epochs_stage_2=2000, **base),
               max_steps=3)
    assert s1["steps"] == 3
    ck = s1["stages"][-1]["checkpoint"]
    assert "Underwater" in ck
    capsys.readouterr()

    s2 = train(Config(epochs_stage_1=1, epochs_stage_2=2000,
                      resume_from="auto", **base), max_steps=5)
    out = capsys.readouterr().out
    assert "skipping completed stage Atmospheric" in out
    assert "resumed full state" in out
    assert [st["stage"] for st in s2["stages"]] == ["Underwater"]
    assert s2["steps"] == 5


def test_train_with_device_resident_data(tmp_path):
    """device_data=True trains end-to-end: corpus staged to device once,
    batches gathered on-device (the per-step H2D leak mitigation for the
    axon plugin, and the idiomatic ingestion for HBM-sized corpora)."""
    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    result = train(Config(
        state="train", synthetic_data=True, synthetic_length=16,
        batch_size=8, img_size=16, channel=32, channel_mult=(1, 2),
        num_res_blocks=1, T=8, save_checkpoint=10_000, dino_weight=0.0,
        bf16=False, ms_ssim_weight=0.0, color_weight=0.0,
        joint_training=True, epochs_stage_1=2, epochs_stage_2=0,
        device_data=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out")))
    assert result["steps"] == 8  # 2 epochs x 2 domains x 16//8 batches
    assert np.isfinite(result["stages"][-1]["last_loss"])


def test_resume_loss_set_mismatch_warns(tmp_path, capsys):
    """Full-state resume under a CHANGED loss set must warn loudly, and
    every checkpoint must carry loss-set provenance: restored Adam second
    moments are calibrated to the old objective and amplify a new term's
    gradients (measured collapse at the 256 flagship point, PARITY.md
    'x0-based aux losses'). The safe protocol is --pretrained_path."""
    import dataclasses

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.checkpoint import (
        find_latest_checkpoint,
        load_metadata,
        save_checkpoint,
    )
    from hybrid_diffusion_tpu.train.loop import train

    model = DynamicUNet(T=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        dropout=0.0)
    x6 = jnp.zeros((2, 16, 16, 6))
    params = model.init(jax.random.PRNGKey(0), x6, jnp.zeros(2, jnp.int32))
    state = create_train_state(params, model.apply, total_epochs=4,
                               steps_per_epoch=2)
    schedule = linear_beta_schedule(1e-4, 0.02, 8)
    step = make_train_step(
        schedule, CompositeLossConfig(dino_weight=0, ms_ssim_weight=0,
                                      color_weight=0), donate=False)
    rng = np.random.RandomState(0)
    batch = {"input": jnp.asarray(rng.randint(0, 255, (2, 16, 16, 3),
                                              np.uint8)),
             "gt": jnp.asarray(rng.randint(0, 255, (2, 16, 16, 3),
                                           np.uint8))}
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    mse_only = dataclasses.asdict(CompositeLossConfig(
        dino_weight=0, ms_ssim_weight=0, color_weight=0))
    path = save_checkpoint(str(tmp_path), 1, "Stage", "SYN", state,
                           metadata={"loss_config": mse_only})

    ck2 = str(tmp_path / "ck2")
    cfg = Config(synthetic_data=True, synthetic_length=8, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=0,
                 save_checkpoint=1000, dino_weight=0.0, ms_ssim_weight=0.0,
                 color_weight=1.0, bf16=False, checkpoint_dir=ck2,
                 output_path=str(tmp_path / "out"), num_workers=1,
                 compilation_cache="", resume_from=path)
    train(cfg, max_steps=2)
    out = capsys.readouterr().out
    assert "CHANGED loss set" in out and "color_weight" in out
    assert "--pretrained_path" in out

    # The run's own stage-final checkpoint records its loss set.
    meta = load_metadata(find_latest_checkpoint(ck2))
    assert meta["loss_config"]["color_weight"] == 1.0

    # Same loss set -> no warning (another full-state resume: metadata
    # stage "Stage" is not a live stage name, so the stage-boundary
    # params-only path is not taken).
    same = dataclasses.asdict(CompositeLossConfig(
        dino_weight=0, ms_ssim_weight=0, color_weight=1.0))
    path2 = save_checkpoint(str(tmp_path / "ck3src"), 1, "Stage", "SYN",
                            state, metadata={"loss_config": same})
    cfg2 = Config(**{**cfg.__dict__, "resume_from": path2,
                     "checkpoint_dir": str(tmp_path / "ck3")})
    capsys.readouterr()
    train(cfg2, max_steps=2)
    assert "CHANGED loss set" not in capsys.readouterr().out


def test_staged_stage2_replay_and_both_domain_probe(tmp_path, capsys):
    """stage2_replay replaces every round(1/f)-th stage-2 batch with a
    stage-1-domain batch (budget unchanged), and the eval probe scores
    BOTH domains even in single-domain stages — the r4 staged run lost
    6.5 dB on the stage-1 domain invisibly (VERDICT r4 weak #2/#6)."""
    import json as _json

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import train

    cfg = Config(synthetic_data=True, synthetic_length=8, batch_size=8,
                 img_size=16, channel=32, channel_mult=(1, 2),
                 num_res_blocks=1, T=8, epochs_stage_1=1, epochs_stage_2=2,
                 joint_training=False, stage2_replay=0.5,
                 eval_every=1, eval_probe_steps=2, eval_probe_batches=1,
                 save_checkpoint=10, dino_weight=0.0, bf16=False,
                 ms_ssim_weight=0.0, color_weight=0.0, ema_decay=0.0,
                 num_workers=1, compilation_cache="",
                 checkpoint_dir=str(tmp_path / "ck"),
                 output_path=str(tmp_path / "o"))
    train(cfg)
    out = capsys.readouterr().out
    assert "replaying a atmospheric batch every 2 steps" in out

    rows = [_json.loads(l) for l in
            open(tmp_path / "o" / "eval_curve.jsonl")]
    domains = {r["domain"] for r in rows}
    assert domains == {"atmospheric", "underwater"}
