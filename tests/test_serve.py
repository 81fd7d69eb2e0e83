"""Serving-surface tests: warm Enhancer, padding/bucketing, prefetch."""

import numpy as np
import pytest

from hybrid_diffusion_tpu.config import Config
from hybrid_diffusion_tpu.data.pipeline import BatchLoader, device_prefetch
from hybrid_diffusion_tpu.serve import Enhancer


@pytest.fixture(scope="module")
def enhancer():
    cfg = Config(T=8, channel=32, channel_mult=(1, 2), num_res_blocks=1,
                 dropout=0.0, img_size=32, ddim=True, ddim_step=4,
                 bf16=False, compilation_cache="")
    return Enhancer(cfg, max_batch=4, warmup=True)


def test_enhance_mixed_sizes(enhancer):
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (40, 56, 3), np.uint8),
            rng.randint(0, 255, (32, 32, 3), np.uint8),
            rng.randint(0, 255, (17, 23, 3), np.uint8)]
    outs = enhancer.enhance(imgs)
    assert [o.shape for o in outs] == [im.shape for im in imgs]
    assert all(o.dtype == np.uint8 for o in outs)


def test_enhance_over_max_batch_buckets(enhancer):
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 255, (32, 32, 3), np.uint8) for _ in range(6)]
    outs = enhancer.enhance(imgs)  # 4 + 2 → two fixed-shape device calls
    assert len(outs) == 6


def test_enhance_empty(enhancer):
    assert enhancer.enhance([]) == []


def test_enhance_paths_writes(enhancer, tmp_path):
    import cv2

    p = str(tmp_path / "x.png")
    cv2.imwrite(p, np.zeros((20, 20, 3), np.uint8))
    outs = enhancer.enhance_paths([p], output_dir=str(tmp_path / "o"))
    assert len(outs) == 1
    assert (tmp_path / "o" / "enhanced_x.png").exists()


def test_device_prefetch_order_and_placement():
    class DS:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"input": np.full((4, 4, 3), i, np.uint8),
                    "gt": np.full((4, 4, 3), i, np.uint8),
                    "name": f"{i}.png"}

    loader = BatchLoader(DS(), batch_size=4, shuffle=False)
    seen = list(device_prefetch(iter(loader), depth=2))
    assert len(seen) == 3
    # order preserved
    firsts = [int(np.asarray(b["input"])[0, 0, 0, 0]) for b in seen]
    assert firsts == [0, 4, 8]
    # arrays became device arrays
    assert hasattr(seen[0]["input"], "devices")


def test_export_roundtrip(enhancer, tmp_path):
    """StableHLO export == live sampler output, reloaded from disk."""
    import jax
    import jax.numpy as jnp

    from hybrid_diffusion_tpu.serve import export_enhancer, load_exported

    path = str(tmp_path / "enhancer.stablehlo")
    export_enhancer(enhancer, path=path)
    call = load_exported(path)

    batch = np.random.RandomState(0).randint(
        0, 255, (enhancer.max_batch, enhancer.size, enhancer.size, 3),
        dtype=np.uint8)
    key = jax.random.PRNGKey(42)
    live = np.asarray(enhancer._sample(jnp.asarray(batch), key))
    exported = np.asarray(call(jnp.asarray(batch), key))
    np.testing.assert_allclose(exported, live, atol=1e-5)


def test_http_server_roundtrip(enhancer):
    """POST an encoded image → enhanced PNG back; health/stats endpoints."""
    import json as _json
    import urllib.request

    cv2 = pytest.importorskip("cv2")
    from hybrid_diffusion_tpu.serve_http import serve

    server = serve(enhancer, port=0, block=False)  # ephemeral port
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        img = np.random.RandomState(0).randint(
            0, 255, (40, 56, 3), np.uint8)
        body = cv2.imencode(".png", img[..., ::-1])[1].tobytes()
        req = urllib.request.Request(f"{base}/enhance", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                               cv2.IMREAD_COLOR)
        assert out.shape == (40, 56, 3)  # original size restored

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h = _json.loads(r.read())
        assert h["status"] == "ok" and h["requests"] == 1

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            s = _json.loads(r.read())
        assert s["errors"] == 0 and s["mean_ms"] > 0

        # ?size=WxH output-size override (host-side resize of the result).
        req = urllib.request.Request(f"{base}/enhance?size=20x24",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out2 = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                                cv2.IMREAD_COLOR)
        assert out2.shape == (24, 20, 3)

        # Malformed size → 400.
        req = urllib.request.Request(f"{base}/enhance?size=bogus",
                                     data=body, method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # Undecodable body → 400, not a crash.
        req = urllib.request.Request(f"{base}/enhance", data=b"junk",
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
