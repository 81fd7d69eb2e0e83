"""Compose a (degraded | enhanced | ground-truth) preview grid.

Pairs an evaluation output directory (train.loop.evaluate save_images=True
writes enhanced images named like the originals) with the dataset that
produced them, and writes one PNG: rows = images, columns = input /
enhanced / GT. The reference's debug helper only plotted inputs
(utils/utils.py:475-508); this is the eval-facing equivalent.

Usage:
  python scripts/make_preview_grid.py --results out/result/synthetic-underwater \
      --dataset synthetic-underwater --split val --size 128 \
      --synthetic_length 512 --rows 6 --out grid.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True,
                   help="dir of enhanced images (evaluate output)")
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--synthetic_length", type=int, default=64)
    p.add_argument("--dataset_path", default="./data/")
    p.add_argument("--rows", type=int, default=6)
    p.add_argument("--out", default="preview_grid.png")
    args = p.parse_args()

    import cv2

    from hybrid_diffusion_tpu.data import make_dataset

    ds = make_dataset(args.dataset, task=args.split,
                      dataset_path=args.dataset_path,
                      image_size=args.size,
                      synthetic_length=args.synthetic_length)
    rows = []
    for i in range(min(args.rows, len(ds))):
        item = ds[i]
        enhanced_path = os.path.join(args.results, item["name"])
        if not os.path.exists(enhanced_path):
            continue
        enh = cv2.cvtColor(cv2.imread(enhanced_path), cv2.COLOR_BGR2RGB)
        if enh.shape[:2] != (args.size, args.size):
            enh = cv2.resize(enh, (args.size, args.size))
        rows.append(np.concatenate([item["input"], enh, item["gt"]], axis=1))
    if not rows:
        print(f"no pairs found under {args.results}", file=sys.stderr)
        return 1
    grid = np.concatenate(rows, axis=0)
    cv2.imwrite(args.out, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    print(f"wrote {args.out} ({len(rows)} rows: input | enhanced | gt)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
