"""scripts/rescore_metrics.py round-trip: saved result images + synthetic
GT fixture → full metric row with the 0-255 UIQM pipeline (nonzero UISM)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_rescore_roundtrip(tmp_path):
    from hybrid_diffusion_tpu.data import make_dataset

    size, length = 32, 70
    for domain in ("underwater", "atmospheric"):
        ds = make_dataset(f"synthetic-{domain}", task="val",
                          image_size=size, synthetic_length=length)
        out = tmp_path / f"synthetic-{domain}" / "val"
        out.mkdir(parents=True)
        rng = np.random.RandomState(3)
        for i in range(len(ds)):
            ex = ds[i]
            # "Enhanced" = GT + mild noise → high-but-finite PSNR.
            img = np.clip(ex["gt"].astype(np.int16)
                          + rng.randint(-8, 9, ex["gt"].shape), 0,
                          255).astype(np.uint8)
            cv2.imwrite(str(out / ex["name"]),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/rescore_metrics.py"),
         "--root", str(tmp_path), "--size", str(size),
         "--synthetic_length", str(length),
         "--out", str(tmp_path / "rescored.json")],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert res.returncode == 0, res.stderr
    with open(tmp_path / "rescored.json") as f:
        scored = json.load(f)
    for domain in ("underwater", "atmospheric"):
        row = scored[domain]
        assert row["n_images"] == length // 7
        assert 25.0 < row["psnr"] < 45.0      # ±8 uniform noise ≈ 33 dB
        assert row["uism"] > 0.0              # the fix this harness proves
        assert np.isfinite(row["uiqm"])
        # res.txt got the appended rescored line
        txt = (tmp_path / f"synthetic-{domain}" / "res.txt").read_text()
        assert "rescored" in txt
