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


def shard_state(mesh: Mesh, state: Any) -> Any:
    """Place every train-state leaf on the mesh.

    Leaves already carrying a NamedSharding on this mesh (params placed via
    shard_params, and optimizer moments inheriting from them) are kept;
    everything else (step counter, schedule count, …) is replicated.
    """
    replicated = NamedSharding(mesh, P())

    def place(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, replicated)

    return jax.tree_util.tree_map(place, state)


def make_sharded_train_step(mesh: Mesh, train_step, state=None) -> Any:
    """Jit a raw train step for mesh execution.

    `train_step` is the raw fn from train.make_train_step(jit=False). Input
    placement is taken from the committed shardings of the state/batch
    (shard_state / shard_batch); XLA then inserts the data-axis gradient
    all-reduce and the model-axis attention collectives automatically.
    """
    return jax.jit(train_step, donate_argnums=(0,))


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
