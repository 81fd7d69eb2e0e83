"""GSPMD sharding rules for the DynamicUNet training/sampling programs.

Strategy (scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives):

  - **data axis**: batch dim of every array in the batch + rng. Gradient
    all-reduce is inserted by XLA inside the jitted train step — the role
    NCCL allreduce plays in the reference's DDP (rotinas.py:618-619).
  - **model axis**: tensor parallelism on the attention bottleneck — the
    qkv projection kernel is sharded on its output features (head-parallel)
    and the output projection on its input features, so the attention
    compute is head-sharded with one all-reduce at the out-proj, the
    Megatron pattern. Conv/mlp weights stay replicated (they are small
    relative to activations at 256²).

All other params are replicated. Single-device meshes degrade to no-ops.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def _is_attn_path(path) -> tuple[bool, str | None]:
    names = [getattr(k, "key", None) or getattr(k, "name", None) for k in path]
    if "attn" in names:
        if "in_proj" in names:
            return True, "in"
        if "out_proj" in names:
            return True, "out"
    return False, None


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Sharding tree for a DynamicUNet/CFGUNet param pytree."""
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        is_attn, kind = _is_attn_path(path)
        leaf_name = getattr(path[-1], "key", None)
        if is_attn and model_size > 1:
            if leaf_name == "kernel":
                if kind == "in" and leaf.shape[-1] % model_size == 0:
                    return NamedSharding(mesh, P(None, "model"))
                if kind == "out" and leaf.shape[0] % model_size == 0:
                    return NamedSharding(mesh, P("model", None))
            if leaf_name == "bias" and kind == "in" \
                    and leaf.shape[-1] % model_size == 0:
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())  # replicated

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place params per param_shardings.

    Note: device_put may alias the source buffers (zero-copy when a shard
    lands on the source device), so after the sharded state is donated to a
    train step the *original* un-sharded arrays may be deleted too. Don't
    keep using them — reload or copy explicitly if you need both.
    """
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return {
        k: (jax.device_put(v, sh) if hasattr(v, "shape") else v)
        for k, v in batch.items()
    }


def _keep_or_replicate(mesh: Mesh, x) -> NamedSharding:
    sh = getattr(x, "sharding", None)
    if isinstance(sh, NamedSharding) and sh.mesh == mesh:
        return sh
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Sharding pytree for a TrainState (same treedef, shardings at leaves).

    Default: every leaf keeps its current placement (params as placed by
    shard_params; everything else replicated).

    zero1=True: ZeRO-1 / optimizer-state sharding — AdamW moments, grad-
    accumulation buffers, and the EMA average are sharded over the **data**
    axis (largest dim divisible by the axis size), while params stay
    replicated. Each chip then owns 1/N of the optimizer state: XLA lowers
    the update to reduce-scatter(grads) → shard-local moment update →
    all-gather(updates), cutting optimizer memory per chip from 3× params
    (μ, ν, EMA) to 3×/N. The reference's DDP replicates optimizer state on
    every GPU (rotinas.py:618-627); this is the TPU-native improvement.
    """
    tree = jax.tree_util.tree_map(
        lambda x: _keep_or_replicate(mesh, x), state)
    if not zero1 or mesh.shape["data"] == 1:
        return tree

    ndata = mesh.shape["data"]

    def zero1_rule(x):
        sh = _keep_or_replicate(mesh, x)
        if sh.spec != P():          # e.g. model-sharded attn moments: keep
            return sh
        shape = getattr(x, "shape", ())
        best = None
        for d in range(len(shape) - 1, -1, -1):
            if shape[d] % ndata == 0 and (
                    best is None or shape[d] > shape[best]):
                best = d
        if best is None:            # scalar counts / tiny leaves
            return sh
        spec = [None] * len(shape)
        spec[best] = "data"
        return NamedSharding(mesh, P(*spec))

    return tree.replace(
        opt_state=jax.tree_util.tree_map(zero1_rule, state.opt_state),
        ema_params=jax.tree_util.tree_map(zero1_rule, state.ema_params),
    )


def shard_state(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Place every train-state leaf on the mesh (see state_shardings)."""
    sh_tree = state_shardings(mesh, state, zero1=zero1)
    return jax.tree_util.tree_map(
        lambda x, s: x if getattr(x, "sharding", None) == s
        else jax.device_put(x, s),
        state, sh_tree,
    )


def make_sharded_train_step(mesh: Mesh, train_step, state_shardings=None):
    """Jit a raw train step for mesh execution.

    `train_step` is the raw fn from train.make_train_step(jit=False). By
    default input placement is taken from the committed shardings of the
    state/batch (shard_state / shard_batch); XLA then inserts the data-axis
    gradient all-reduce and the model-axis attention collectives
    automatically.

    Passing the `state_shardings(mesh, state, zero1=True)` tree pins the
    ZeRO-1 placement on both the input and output state, so GSPMD cannot
    silently re-replicate the moments between steps.
    """
    if state_shardings is None:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(
        train_step,
        in_shardings=(state_shardings, NamedSharding(mesh, P("data")), None),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )


def make_sharded_sampler(mesh: Mesh, sample_fn) -> Any:
    """Batch-shard a sampler (cond, rng) → images over the data axis.

    The role DDP-style batched inference would play in the reference:
    each chip runs the full reverse-diffusion scan on its batch shard —
    zero inter-chip communication during the scan (the U-Net params are
    replicated), so sampling throughput scales linearly with chips (the
    v5e-8 ≥10×-single-GPU target, BASELINE.md). Output stays sharded;
    np.asarray gathers to host only when the caller materializes it.
    """
    jitted = jax.jit(
        sample_fn,
        in_shardings=(NamedSharding(mesh, P("data")), None),
        out_shardings=NamedSharding(mesh, P("data")),
    )

    def sample(cond, rng):
        cond = jax.device_put(cond, NamedSharding(mesh, P("data")))
        return jitted(cond, rng)

    return sample
