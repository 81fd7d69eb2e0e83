"""Re-score saved eval result images against the synthetic GT fixture.

The round-2 eval loop fed the UIQM suite [0,1] floats, so every committed
UISM/UICONM/UIQM number was degenerate (uism=0.0000). The sampled images
themselves are fine and on disk (`evaluate(save_images=True)` writes
result/<dataset>/<split>/<name>.png) — this harness recomputes the full
metric row with the fixed 0-255 pipeline without re-running the sampler
(reference analog: the standalone folder harness, metrics/metrics.py:609).

Usage:
  python scripts/rescore_metrics.py --root output/demo256/out/result \
      --size 256 --synthetic_length 512 [--split val] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="output/demo256/out/result")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--synthetic_length", type=int, default=512)
    p.add_argument("--split", default="val")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from hybrid_diffusion_tpu.data import make_dataset
    from hybrid_diffusion_tpu.data.registry import load_image
    from hybrid_diffusion_tpu.metrics import (
        getUIQM,
        nmetrics,
        psnr,
        ssim_index,
    )

    results = {}
    for domain in ("underwater", "atmospheric"):
        res_dir = os.path.join(args.root, f"synthetic-{domain}", args.split)
        if not os.path.isdir(res_dir):
            continue
        ds = make_dataset(f"synthetic-{domain}", task=args.split,
                          image_size=args.size,
                          synthetic_length=args.synthetic_length)
        gt_by_name = {}
        for i in range(len(ds)):
            ex = ds[i]
            gt_by_name[ex["name"]] = ex["gt"]
        sums = dict(psnr=0.0, ssim=0.0, uiqm=0.0, uciqe=0.0, uism=0.0,
                    uicm=0.0, uiconm=0.0, uiqm_nd=0.0)
        n = 0
        for name in sorted(os.listdir(res_dir)):
            if name not in gt_by_name:
                print(f"warning: no GT for {name}, skipped")
                continue
            img = load_image(os.path.join(res_dir, name))
            gt = gt_by_name[name]
            sums["psnr"] += psnr(gt, img, data_range=255)
            sums["ssim"] += ssim_index(gt, img, data_range=255)
            uiqm_v, uciqe_v, uism_v, uicm_v, uiconm_v = nmetrics(img)
            sums["uiqm"] += uiqm_v
            sums["uciqe"] += uciqe_v
            sums["uism"] += uism_v
            sums["uicm"] += uicm_v
            sums["uiconm"] += uiconm_v
            sums["uiqm_nd"] += getUIQM(img)
            n += 1
        res = {k: round(v / max(n, 1), 4) for k, v in sums.items()}
        res["n_images"] = n
        results[domain] = res
        line = (f"split={args.split} n={n} (rescored, 0-255 UIQM fix) "
                + " ".join(f"{k}={v:.4f}" for k, v in res.items()
                           if isinstance(v, float)))
        print(f"[{domain}] {line}")
        report = os.path.join(args.root, f"synthetic-{domain}", "res.txt")
        with open(report, "a") as f:
            f.write(line + "\n")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
