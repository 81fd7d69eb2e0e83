"""Tests: profiling hooks, multi-host init gating, single-image enhance."""

import os

import jax.numpy as jnp
import numpy as np

from hybrid_diffusion_tpu.parallel.distributed import (
    maybe_initialize,
    process_info,
)
from hybrid_diffusion_tpu.utils import profile_trace, timed_block


def test_profile_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("HDT_PROFILE", raising=False)
    with profile_trace():
        pass  # must not create anything / require a TPU profiler


def test_profile_trace_writes_trace(tmp_path):
    with profile_trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # xprof/tensorboard layout: plugins/profile/<run>/...
    assert (tmp_path / "plugins" / "profile").exists()


def test_timed_block_measures_and_blocks():
    with timed_block("t", verbose=False) as tb:
        x = tb.block(jnp.ones((16, 16)) * 2)
    assert tb.elapsed is not None and tb.elapsed >= 0
    assert float(x[0, 0]) == 2.0


def test_maybe_initialize_noop_single_host(monkeypatch):
    monkeypatch.delenv("HDT_MULTIHOST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize() is False
    info = process_info()
    assert info["process_count"] == 1 and info["process_index"] == 0


def test_enhance_image_end_to_end(tmp_path):
    import cv2

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import enhance_image

    src = str(tmp_path / "in.png")
    rng = np.random.RandomState(0)
    cv2.imwrite(src, rng.randint(0, 255, (40, 52, 3), np.uint8))
    cfg = Config(T=8, channel=32, channel_mult=(1, 2), num_res_blocks=1,
                 dropout=0.0, img_size=32, ddim=True, ddim_step=4,
                 bf16=False, output_path=str(tmp_path / "out"),
                 compilation_cache="", inference_image=src)
    out = enhance_image(cfg)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    assert os.path.exists(str(tmp_path / "out" / "enhanced_in.png"))
