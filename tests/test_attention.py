"""XLA vs Pallas attention equivalence and reference-semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.ops.attention import (
    _pallas_attention,
    _xla_attention,
    fused_spatial_attention,
)
from hybrid_diffusion_tpu.ops.resize import nearest_resize


def _rand_qkv(key, B=2, N=64, h=4, d=16, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (B, N, h, d), dtype) for k in ks)


def test_xla_attention_matches_numpy():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), B=1, N=8, h=2, d=4)
    out = _xla_attention(q, k, v)
    qn, kn, vn = map(np.asarray, (q, k, v))
    expected = np.zeros_like(qn)
    for h_ in range(2):
        s = qn[0, :, h_] @ kn[0, :, h_].T / np.sqrt(4)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        expected[0, :, h_] = p @ vn[0, :, h_]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_pallas_matches_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), B=2, N=128, h=4, d=32)
    a = _xla_attention(q, k, v)
    b = _pallas_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_dispatcher():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), B=1, N=32, h=2, d=8)
    a = fused_spatial_attention(q, k, v, use_pallas=False)
    b = fused_spatial_attention(q, k, v, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_nearest_resize_integer_upscale_matches_jax_image():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 3))
    a = nearest_resize(x, 8, 8)
    b = jax.image.resize(x, (1, 8, 8, 3), method="nearest")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_nearest_resize_identity():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 3))
    assert nearest_resize(x, 4, 4) is x


def test_pallas_attention_gradients_match_xla():
    """custom_vjp backward (XLA recompute) == autodiff of the XLA path."""
    import numpy as np
    from hybrid_diffusion_tpu.ops.attention import (
        _pallas_attention_diff,
        _pallas_interpret_mode,
        _xla_attention,
    )

    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(2, 16, 2, 8), jnp.float32)
               for _ in range(3))

    def loss_pallas(q, k, v):
        return jnp.sum(
            _pallas_attention_diff(q, k, v, _pallas_interpret_mode()) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_spatial_attention_matches_torch_mha():
    """Golden parity with the reference's exact op: torch.nn.MultiheadAttention
    (diffusion/Model.py:306-311), same weights, same inputs."""
    torch = pytest.importorskip("torch")

    from hybrid_diffusion_tpu.models.blocks import SpatialSelfAttention

    B, H, W, C, heads = 2, 4, 4, 32, 4
    rng = np.random.RandomState(0)
    x = rng.randn(B, H, W, C).astype(np.float32)

    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(C, heads, batch_first=True)
    with torch.no_grad():
        ref, _ = mha(*([torch.from_numpy(x.reshape(B, H * W, C))] * 3),
                     need_weights=False)
    ref = ref.numpy().reshape(B, H, W, C)

    w_in = mha.in_proj_weight.detach().numpy()    # (3C, C)
    b_in = mha.in_proj_bias.detach().numpy()      # (3C,)
    w_out = mha.out_proj.weight.detach().numpy()  # (C, C)
    b_out = mha.out_proj.bias.detach().numpy()
    params = {"params": {
        "in_proj": {"kernel": jnp.asarray(w_in.T), "bias": jnp.asarray(b_in)},
        "out_proj": {"kernel": jnp.asarray(w_out.T),
                     "bias": jnp.asarray(b_out)},
    }}
    mod = SpatialSelfAttention(channels=C, num_heads=heads)
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # And through the Pallas kernel path.
    mod_p = SpatialSelfAttention(channels=C, num_heads=heads, use_pallas=True)
    out_p = np.asarray(mod_p.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out_p, ref, atol=2e-4)


# ---------------------------------------------------------------- ring


def test_ring_attention_matches_xla():
    """Sequence-parallel ring attention == dense attention, exactly."""
    from hybrid_diffusion_tpu.ops import ring_spatial_attention
    from hybrid_diffusion_tpu.parallel import make_mesh

    mesh = make_mesh()  # 8×1: token axis ring of length 8
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B=2, N=64, h=4, d=16)
    dense = _xla_attention(q, k, v)
    ring = ring_spatial_attention(q, k, v, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               atol=2e-5)


def test_ring_attention_grads_match_dense():
    from hybrid_diffusion_tpu.ops import ring_spatial_attention
    from hybrid_diffusion_tpu.parallel import make_mesh

    mesh = make_mesh()
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), B=1, N=32, h=2, d=8)

    def loss_ring(q, k, v):
        return jnp.sum(ring_spatial_attention(q, k, v, mesh) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ring_attention_rejects_indivisible_tokens():
    from hybrid_diffusion_tpu.ops import ring_spatial_attention
    from hybrid_diffusion_tpu.parallel import make_mesh

    mesh = make_mesh()
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), B=1, N=12, h=2, d=8)
    with pytest.raises(ValueError, match="not divisible"):
        ring_spatial_attention(q, k, v, mesh)


def test_attention_fn_injection_in_module():
    """SpatialSelfAttention(attention_fn=ring) == default, same params."""
    from hybrid_diffusion_tpu.models.blocks import SpatialSelfAttention
    from hybrid_diffusion_tpu.ops import make_ring_attention
    from hybrid_diffusion_tpu.parallel import make_mesh

    mesh = make_mesh()
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 32))
    base = SpatialSelfAttention(channels=32, num_heads=4)
    params = base.init(jax.random.PRNGKey(7), x)
    seq_par = SpatialSelfAttention(
        channels=32, num_heads=4,
        attention_fn=make_ring_attention(mesh, "data"))
    np.testing.assert_allclose(
        np.asarray(seq_par.apply(params, x)),
        np.asarray(base.apply(params, x)), atol=2e-5)
