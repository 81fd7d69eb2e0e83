"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference attends over 32×32 = 1024 flattened spatial tokens at the
U-Net bottleneck (diffusion/Model.py:306-311) — small enough for one chip.
Attending at higher resolutions scales O((HW)²) (SURVEY.md §5.7); the
TPU-native answer is to shard the *token* axis across the mesh and rotate
K/V blocks around the ring with `ppermute` while each chip keeps only its
query shard — communication rides ICI neighbor links, memory per chip is
O(N/P), and the result is EXACT (flash-style online softmax, not an
approximation).

Per ring step each chip computes local-Q × visiting-KV block attention and
folds it into a running (max, sum, out) accumulator; the `ppermute` of the
next K/V block is independent of that compute, so XLA:TPU overlaps the
collective-permute DMA with the MXU matmuls.

`ring_spatial_attention` is a drop-in for `fused_spatial_attention` given
a mesh: (B, N, h, d) replicated or batch-sharded inputs, token axis split
internally via shard_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attention_shard(q, k, v, axis_name: str):
    """Per-shard body: q/k/v (B, n_local, h, d) — token-sharded over
    `axis_name`. Returns the exact softmax(QKᵀ/√d)V rows for the local
    query shard."""
    B, nq, h, d = q.shape
    nkv = k.shape[1]
    steps = jax.lax.psum(1, axis_name)  # ring length (static)
    scale = 1.0 / (d ** 0.5)
    perm = [(j, (j + 1) % steps) for j in range(steps)]

    q32 = q.astype(jnp.float32)

    def body(carry, _):
        o, m, l, kb, vb = carry
        # (B, h, nq, nkv) scores for the currently-visiting K/V block.
        s = jnp.einsum("bqhd,bkhd->bhqk", q32, kb.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        # Rotate K/V to the next chip; independent of the matmuls above,
        # so the compiler overlaps the DMA with compute. The final rotate
        # returns K/V to their home chip (buffers end where they started).
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (o, m_new, l, kb, vb), None

    def vary(x):
        # Mark device-constant initial carries as varying over the ring
        # axis (shard_map's varying-manual-axes type system requires the
        # scan carry in/out types to agree).
        if hasattr(jax.lax, "pvary"):
            return jax.lax.pvary(x, (axis_name,))
        return jax.lax.pcast(x, (axis_name,), to="varying")

    init = (
        vary(jnp.zeros((B, h, nq, d), jnp.float32)),
        vary(jnp.full((B, h, nq), -jnp.inf, jnp.float32)),
        vary(jnp.zeros((B, h, nq), jnp.float32)),
        k,
        v,
    )
    (o, m, l, _, _), _ = jax.lax.scan(body, init, None, length=steps)
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (B, nq, h, d)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def ring_spatial_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Exact attention with the token axis sharded over `mesh[axis]`.

    q, k, v: (B, N, heads, head_dim); N must divide the axis size.
    Output matches `fused_spatial_attention(q, k, v)` up to fp summation
    order (tested bit-close on the 8-device virtual mesh).
    """
    try:
        from jax import shard_map
    except ImportError:  # older JAX
        from jax.experimental.shard_map import shard_map

    n_axis = mesh.shape[axis]
    if q.shape[1] % n_axis:
        raise ValueError(
            f"token count {q.shape[1]} not divisible by mesh axis "
            f"'{axis}' of size {n_axis}")
    spec = P(None, axis, None, None)
    f = shard_map(
        functools.partial(_ring_attention_shard, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return f(q, k, v)


def make_ring_attention(mesh: Mesh, axis: str = "data"):
    """Adapter with the `fused_spatial_attention(q, k, v)` signature, for
    injecting sequence parallelism into SpatialSelfAttention
    (`attention_fn=make_ring_attention(mesh, "data")`)."""

    def attention_fn(q, k, v):
        return ring_spatial_attention(q, k, v, mesh, axis)

    return attention_fn
