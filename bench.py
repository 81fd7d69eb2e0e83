"""Benchmark harness: DDIM sampling throughput at the reference operating
point (256², batch 16, 100 DDIM steps, ch=128 U-Net — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the driver-defined nominal single-GPU estimate of 1.0 image/sec
for 100-step DDIM sampling of this U-Net at 256² batch 16 (a ~35M-param
UNet forward ≈150 ms/batch on a V100-class card ⇒ ~15 s per 16-image batch).
vs_baseline = measured images/sec ÷ 1.0.

Env overrides: BENCH_BATCH, BENCH_STEPS, BENCH_SIZE, BENCH_REPS, BENCH_QUICK.
BENCH_MODE=train measures training steps/sec instead (full composite-loss
train step at the reference operating point, BASELINE.md "train throughput"
row); default is the DDIM sampling headline metric.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SINGLE_GPU_IMAGES_PER_SEC = 1.0  # nominal estimate, see docstring


def bench_train(quick: bool) -> None:
    """Train-step throughput (steps/sec, batch 16 @256² unless overridden).

    Variant knobs (for the train-MFU breakdown, BASELINE.md):
      BENCH_ROUTING=0    disable domain routing (gates + freeze blend)
      BENCH_LOSS=mse     MSE-only loss (drop the x0 aux-loss chain)
      BENCH_REMAT=1      rematerialized ResBlocks
      BENCH_ATTN=xla     XLA einsum attention instead of Pallas
      BENCH_GRAD_ONLY=1  value_and_grad only (no optimizer/EMA/blend)
    """
    import time

    import numpy as np

    from hybrid_diffusion_tpu.diffusion import linear_beta_schedule
    from hybrid_diffusion_tpu.losses import CompositeLossConfig
    from hybrid_diffusion_tpu.models import DynamicUNet
    from hybrid_diffusion_tpu.train import create_train_state, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "4" if quick else "16"))
    size = int(os.environ.get("BENCH_SIZE", "64" if quick else "256"))
    reps = int(os.environ.get("BENCH_REPS", "2" if quick else "10"))
    routing = os.environ.get("BENCH_ROUTING", "1") != "0"
    mse_only = os.environ.get("BENCH_LOSS", "full") == "mse"
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    # XLA attention measured faster than the Pallas kernel at the 1024-
    # token bottleneck (4.4 vs 7.7 us fwd — BASELINE.md attention A/B).
    attn = os.environ.get("BENCH_ATTN", "xla")
    grad_only = os.environ.get("BENCH_GRAD_ONLY", "0") == "1"

    model = DynamicUNet(
        T=1000, ch=32 if quick else 128,
        ch_mult=(1, 2) if quick else (1, 2, 2, 2),
        num_res_blocks=1 if quick else 2, dropout=0.15,
        dtype=jnp.bfloat16, norm_dtype=jnp.bfloat16,
        use_pallas_attention=(attn == "pallas"),
        remat=remat,
    )
    x6 = jnp.zeros((batch, size, size, 6))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x6,
                                 jnp.zeros((batch,), jnp.int32))
    schedule = linear_beta_schedule(1e-4, 0.02, 1000)
    # DINO off (no pretrained weights here); MSE + MS-SSIM + color, the
    # reference's live loss terms (diffusion/Diffusion.py:159-169).
    cfg = (CompositeLossConfig(dino_weight=0.0, ms_ssim_weight=0.0,
                               color_weight=0.0)
           if mse_only else CompositeLossConfig(dino_weight=0.0))
    state = create_train_state(params, model.apply, total_epochs=1000,
                               steps_per_epoch=100)
    if grad_only:
        # Isolate loss fwd+bwd from the optimizer/blend/EMA tail: run the
        # same step with the optimizer update replaced by a no-op.
        from hybrid_diffusion_tpu.train import step as step_mod

        def raw(state_, batch_, rng_):
            from hybrid_diffusion_tpu.diffusion.process import (
                predict_x0_from_eps,
                q_sample,
            )
            from hybrid_diffusion_tpu.losses.composite import (
                composite_enhancement_loss,
            )

            inp = step_mod.normalize_uint8(batch_["input"])
            gt = step_mod.normalize_uint8(batch_["gt"])
            B = gt.shape[0]
            t_rng, noise_rng, _, dr = jax.random.split(rng_, 4)
            t = jax.random.randint(t_rng, (B,), 0, schedule.num_steps)
            noise = jax.random.normal(noise_rng, gt.shape, jnp.float32)
            y_t = q_sample(schedule, gt, t, noise)
            x6_ = jnp.concatenate([inp, y_t], axis=-1)

            def loss_fn(p):
                eps = state_.apply_fn(p, x6_, t, cond_image=inp,
                                      train=True, rngs={"dropout": dr})
                x0 = predict_x0_from_eps(schedule, y_t, t, eps)
                loss, parts = composite_enhancement_loss(
                    eps, noise, x0, gt, cfg)
                return loss, parts

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state_.params)
            parts["gsum"] = sum(jnp.sum(g) for g in
                                jax.tree_util.tree_leaves(grads))
            return state_, parts

        step = jax.jit(raw, donate_argnums=(0,))
    else:
        step = make_train_step(schedule, cfg, domain_routing=routing)

    rng = np.random.RandomState(0)
    batches = [
        {"input": jnp.asarray(rng.randint(0, 255, (batch, size, size, 3),
                                          np.uint8)),
         "gt": jnp.asarray(rng.randint(0, 255, (batch, size, size, 3),
                                       np.uint8))}
        for _ in range(3)
    ]
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    key, sub = jax.random.split(key)
    state, m = step(state, batches[0], sub)
    jax.block_until_ready(m["total"])
    print(f"# compile+first step {time.time()-t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    for i in range(reps):
        key, sub = jax.random.split(key)
        state, m = step(state, batches[i % len(batches)], sub)
    jax.block_until_ready(m["total"])
    sps = reps / (time.time() - t0)
    tag = (f"loss={'mse' if mse_only else 'composite'} "
           f"routing={'on' if routing else 'off'} attn={attn}"
           + (" remat" if remat else "")
           + (" grad-only" if grad_only else ""))
    print(json.dumps({
        "metric": f"train steps/sec {size}x{size} batch {batch} ({tag})",
        "value": round(sps, 3),
        "unit": "steps/sec",
        "vs_baseline": round(sps, 3),
    }))


def bench_attn(quick: bool) -> None:
    """Kernel-level XLA-vs-Pallas attention A/B at the U-Net bottleneck
    shape (B=16, N=1024 tokens, 8 heads, d=32 — diffusion/Model.py:306-311
    at 256² ch_mult [1,2,2,2]). Prints one JSON line per arm.

    Timing: a jitted lax.scan of ITERS chained attention calls per
    executable run, fresh key per rep (the runtime memoizes identical
    executions — CLAUDE.md).
    """
    import time

    from hybrid_diffusion_tpu.ops.attention import fused_spatial_attention

    B = int(os.environ.get("BENCH_BATCH", "2" if quick else "16"))
    N = int(os.environ.get("BENCH_TOKENS", "64" if quick else "1024"))
    h, d = 8, 32
    iters = int(os.environ.get("BENCH_ITERS", "4" if quick else "50"))
    reps = int(os.environ.get("BENCH_REPS", "2" if quick else "7"))
    results = {}

    for arm in ("xla", "pallas"):
        use_pallas = arm == "pallas"

        def fwd_chain(key, _up=use_pallas):
            q0 = jax.random.normal(key, (B, N, h, d), jnp.bfloat16)
            k0 = jax.random.normal(jax.random.fold_in(key, 1),
                                   (B, N, h, d), jnp.bfloat16)
            v0 = jax.random.normal(jax.random.fold_in(key, 2),
                                   (B, N, h, d), jnp.bfloat16)

            def body(q, _):
                o = fused_spatial_attention(q, k0, v0, use_pallas=_up)
                return o, ()

            out, _ = jax.lax.scan(body, q0, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

        def bwd_chain(key, _up=use_pallas):
            q0 = jax.random.normal(key, (B, N, h, d), jnp.bfloat16)
            k0 = jax.random.normal(jax.random.fold_in(key, 1),
                                   (B, N, h, d), jnp.bfloat16)
            v0 = jax.random.normal(jax.random.fold_in(key, 2),
                                   (B, N, h, d), jnp.bfloat16)

            def body(q, _):
                def loss(qq):
                    return jnp.sum(
                        fused_spatial_attention(qq, k0, v0, use_pallas=_up)
                        .astype(jnp.float32) ** 2)

                g = jax.grad(loss)(q)
                return g / (jnp.max(jnp.abs(g)) + 1e-6), ()

            out, _ = jax.lax.scan(body, q0, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

        for name, fn in (("fwd", jax.jit(fwd_chain)),
                         ("fwd+bwd", jax.jit(bwd_chain))):
            jax.block_until_ready(fn(jax.random.PRNGKey(0)))  # compile
            times = []
            for r in range(reps):
                t0 = time.time()
                jax.block_until_ready(fn(jax.random.PRNGKey(1 + r)))
                times.append(time.time() - t0)
            us = min(times) / iters * 1e6
            results[f"{arm} {name}"] = round(us, 1)
            print(json.dumps({
                "metric": f"attention {name} us/call {arm} "
                          f"(B={B} N={N} h={h} d={d}, bf16)",
                "value": round(us, 1),
                "unit": "us",
                "vs_baseline": round(us, 1),
            }))
    print(f"# summary: {results}", file=sys.stderr)


def main():
    quick = bool(int(os.environ.get("BENCH_QUICK", "0")))
    if os.environ.get("BENCH_MODE") == "train":
        bench_train(quick)
        return
    if os.environ.get("BENCH_MODE") == "attn":
        bench_attn(quick)
        return
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    size = int(os.environ.get("BENCH_SIZE", "256"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    if quick:
        batch, steps, size, reps = 4, 10, 64, 2

    from hybrid_diffusion_tpu.diffusion import (
        ddim_sample,
        dpm_solver_pp_2m_sample,
        linear_beta_schedule,
    )
    from hybrid_diffusion_tpu.models import DynamicUNet

    sampler_name = os.environ.get("BENCH_SAMPLER", "ddim")

    model = DynamicUNet(
        T=1000,
        ch=32 if quick else 128,
        ch_mult=(1, 2) if quick else (1, 2, 2, 2),
        num_res_blocks=1 if quick else 2,
        dropout=0.0,
        dtype=jnp.bfloat16,
        # GN stats are fp32 inside flax regardless; bf16 normalize halves
        # the HBM traffic of every norm. XLA attention measured faster
        # than the Pallas kernel at the 1024-token bottleneck (4.4 vs
        # 7.7 us fwd, BASELINE.md A/B) — BENCH_ATTN=pallas to flip.
        norm_dtype=jnp.bfloat16,
        use_pallas_attention=os.environ.get("BENCH_ATTN") == "pallas",
    )
    x6 = jnp.zeros((batch, size, size, 6))
    t0 = time.time()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x6, jnp.zeros((batch,), jnp.int32)
    )
    jax.block_until_ready(params)
    # Weights are loop-invariant across the 100-step scan: cast to bf16
    # once here instead of re-casting 43M params every denoise step.
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)

    schedule = linear_beta_schedule(1e-4, 0.02, 1000)

    def denoise(x6, t, context_zero=True):
        return model.apply(params, x6, t, context_zero=context_zero)

    @jax.jit
    def sample(cond, rng):
        if sampler_name == "dpm++2m":
            return dpm_solver_pp_2m_sample(denoise, schedule, cond, rng,
                                           steps=steps)
        return ddim_sample(denoise, schedule, cond, rng, ddim_steps=steps)

    cond = jnp.zeros((batch, size, size, 3))
    t0 = time.time()
    out = jax.block_until_ready(sample(cond, jax.random.PRNGKey(1)))
    print(f"# compile+first run {time.time()-t0:.0f}s", file=sys.stderr)

    times = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(sample(cond, jax.random.PRNGKey(2 + i)))
        times.append(time.time() - t0)
    best = min(times)
    images_per_sec = batch / best
    print(f"# times={['%.3f' % t for t in times]}", file=sys.stderr)

    print(json.dumps({
        "metric": f"images/sec/chip {size}x{size} "
                  f"{'DPM++2M' if sampler_name == 'dpm++2m' else 'DDIM'}"
                  f"-{steps} sampling (batch {batch}, bf16)",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(
            images_per_sec / REFERENCE_SINGLE_GPU_IMAGES_PER_SEC, 3
        ),
    }))


if __name__ == "__main__":
    main()
