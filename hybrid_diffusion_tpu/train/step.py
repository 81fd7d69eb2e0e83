"""The jitted diffusion training step.

Rebuilds the reference's GaussianDiffusionTrainer.forward + optimizer step
(diffusion/Diffusion.py:54-178, rotinas.py:427-448) as one pure function:

    uint8 batch → normalize → t ~ U[0,T) → q-sample → U-Net ε-prediction →
    composite loss → grads → domain-gated middle-block grads → clip+AdamW.

Fixed reference defects (SURVEY.md §2.9.3-5):
  - arguments are NOT inverted: the *clean* target is diffused, conditioned
    on the *degraded* input (the reference accidentally swaps them at
    rotinas.py:439);
  - x₀ reconstruction feeds the auxiliary losses in a consistent [-1, 1]
    range (no stray /255);
  - domain routing gates *gradients* (multiplicative masks on the middle
    blocks) instead of mutating requires_grad, which is a no-op under jit
    (§2.9.11). The gate is a traced value — no recompilation per domain.

Conditioning: like the reference's effective behavior the conditional
embedding path defaults to disabled (context_zero=True — Model.py:483-486);
set use_conditioning=True for live image-conditioning with per-example
p_uncond dropout (the reference's 2% branch, Diffusion.py:71-72, made
functional).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion.process import predict_x0_from_eps, q_sample
from ..diffusion.schedule import DiffusionSchedule
from ..losses.composite import CompositeLossConfig, composite_enhancement_loss
from ..models.unet import NUM_MIDDLE_BLOCKS, domain_gates_from_batch
from .train_state import TrainState


def normalize_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] → float32 [-1,1]. Device-side, so the host→device copy
    moves 1 byte/px instead of 4 (the reference normalizes after the copy
    too, Diffusion.py:56-57)."""
    return x.astype(jnp.float32) / 255.0 * 2.0 - 1.0


def apply_domain_gates(grads: Any, gates: jnp.ndarray) -> Any:
    """Scale middle-block parameter gradients by their domain gate.

    grads: a flax param tree whose top level contains middle_{i} subtrees.
    gates: float32 (NUM_MIDDLE_BLOCKS,) of 0/1 (traced). Gating *before*
    the global-norm clip also matches torch semantics, where frozen params
    contribute no gradient to the clip norm.
    """
    p = dict(grads["params"])
    for i in range(NUM_MIDDLE_BLOCKS):
        key = f"middle_{i}"
        if key in p:
            p[key] = jax.tree_util.tree_map(lambda g, i=i: g * gates[i], p[key])
    return {**grads, "params": p}


def blend_by_gates(new_tree: Any, old_tree: Any, gates: jnp.ndarray) -> Any:
    """Where a leaf path passes through middle_{i}, keep new only if gate i
    is open: new·g + old·(1−g).

    Needed because zeroing gradients is not enough to freeze a block under
    AdamW — decoupled weight decay and optimizer-moment decay still move
    the parameters/state. torch's requires_grad=False skips the parameter
    entirely; this blend reproduces that.
    """
    middle_names = {f"middle_{i}": i for i in range(NUM_MIDDLE_BLOCKS)}

    def blend(path, new, old):
        for k in path:
            name = getattr(k, "key", None) or getattr(k, "name", None)
            if name in middle_names:
                g = gates[middle_names[name]]
                return jnp.asarray(new) * g + jnp.asarray(old) * (1.0 - g)
        return new

    return jax.tree_util.tree_map_with_path(blend, new_tree, old_tree)


def diffusion_train_step(
    state: TrainState,
    batch: dict[str, jnp.ndarray],
    rng: jax.Array,
    schedule: DiffusionSchedule,
    loss_config: CompositeLossConfig = CompositeLossConfig(),
    dino_loss_fn: Optional[Callable] = None,
    vgg_loss_fn: Optional[Callable] = None,
    use_conditioning: bool = False,
    p_uncond: float = 0.02,
    domain_routing: bool = True,
) -> tuple[TrainState, dict[str, jnp.ndarray]]:
    """One optimization step.

    batch: {"input": degraded (B,H,W,3) uint8, "gt": clean (B,H,W,3) uint8}.
    Returns (new_state, metrics dict of scalars).
    """
    input_img = normalize_uint8(batch["input"])
    gt = normalize_uint8(batch["gt"])
    B = gt.shape[0]

    t_rng, noise_rng, drop_rng, dropout_rng = jax.random.split(rng, 4)
    t = jax.random.randint(t_rng, (B,), 0, schedule.num_steps)
    noise = jax.random.normal(noise_rng, gt.shape, jnp.float32)
    y_t = q_sample(schedule, gt, t, noise)
    x6 = jnp.concatenate([input_img, y_t], axis=-1)

    if use_conditioning:
        context_zero = jax.random.bernoulli(drop_rng, p_uncond, (B,))
    else:
        context_zero = True

    aux_w = (schedule.alphas_bar[t] if loss_config.aux_snr_weight else None)

    def loss_fn(params):
        noise_pred = state.apply_fn(
            params, x6, t, cond_image=input_img, context_zero=context_zero,
            train=True, rngs={"dropout": dropout_rng},
        )
        x0_pred = predict_x0_from_eps(schedule, y_t, t, noise_pred)
        loss, parts = composite_enhancement_loss(
            noise_pred, noise, x0_pred, gt, loss_config,
            dino_loss_fn=dino_loss_fn, vgg_loss_fn=vgg_loss_fn,
            aux_weights=aux_w,
        )
        return loss, parts

    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    if domain_routing:
        gates = domain_gates_from_batch(input_img)
        grads = apply_domain_gates(grads, gates)
        parts["underwater_gate"] = gates[0]

    new_state = state.apply_gradients(grads)
    if domain_routing:
        # Neutralize weight-decay / moment drift on frozen blocks.
        new_state = new_state.replace(
            params=blend_by_gates(new_state.params, state.params, gates),
            opt_state=blend_by_gates(new_state.opt_state, state.opt_state, gates),
        )
    new_state = new_state.update_ema()
    parts["grad_norm"] = optax_global_norm(grads)
    return new_state, {k: v for k, v in parts.items()}


def optax_global_norm(tree: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


def make_train_step(
    schedule: DiffusionSchedule,
    loss_config: CompositeLossConfig = CompositeLossConfig(),
    dino_loss_fn: Optional[Callable] = None,
    vgg_loss_fn: Optional[Callable] = None,
    use_conditioning: bool = False,
    p_uncond: float = 0.02,
    domain_routing: bool = True,
    donate: bool = True,
    jit: bool = True,
) -> Callable:
    """Close over the static configuration and return a (jitted) step fn.

    The returned fn has signature (state, batch, rng) → (state, metrics).
    State buffers are donated so parameter/optimizer memory is updated in
    place on device. Pass jit=False to get the raw function (the sharded
    wrapper in parallel/sharding.py jits it with explicit shardings).
    """
    step = functools.partial(
        diffusion_train_step,
        schedule=schedule,
        loss_config=loss_config,
        dino_loss_fn=dino_loss_fn,
        vgg_loss_fn=vgg_loss_fn,
        use_conditioning=use_conditioning,
        p_uncond=p_uncond,
        domain_routing=domain_routing,
    )
    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())
