"""Sampler/NFE quality sweep over a trained checkpoint.

Runs `evaluate()` at a grid of (sampler, steps) operating points against
one set of weights and writes a consolidated JSON table — the harness
behind the flagship NFE-vs-quality study (see BASELINE.md "Sampler/NFE
sweep"). Reference parity: the reference evaluates only DDIM-100
(`utils/rotinas.py:906-910`, `Main.py:33-35`); this sweep is the TPU
rebuild's extension that found the low-NFE DPM-Solver++ operating points.

Usage:
  python scripts/sweep_sampler.py --ckpt docs/assets/flagship256_fp16.npz \
      --points dpm++2m:5 dpm++2m:10 ddim:100 --out sweep.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--points", nargs="+", default=[
        "dpm++2m:5", "dpm++2m:10", "dpm++2m:15", "ddim:100"],
        help="sampler:steps grid points")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+", default=[1, 2, 2, 2])
    p.add_argument("--num_res_blocks", type=int, default=2)
    p.add_argument("--T", type=int, default=1000)
    p.add_argument("--synthetic_length", type=int, default=512)
    p.add_argument("--split", default="val")
    p.add_argument("--fid", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from hybrid_diffusion_tpu.config import Config
    from hybrid_diffusion_tpu.train.loop import evaluate

    rows = []
    for point in args.points:
        sampler, steps = point.rsplit(":", 1)
        config = Config(
            state="eval",
            synthetic_data=True,
            synthetic_length=args.synthetic_length,
            img_size=args.size,
            batch_size=args.batch,
            channel=args.channel,
            channel_mult=args.channel_mult,
            num_res_blocks=args.num_res_blocks,
            T=args.T,
            dropout=0.0,
            ddim=True,
            ddim_step=int(steps),
            sampler="" if sampler == "ddim" else sampler,
            pretrained_path=args.ckpt,
            output_path="output/sweep/eval",
            compilation_cache=os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                             ".jax_cache"),
        )
        t0 = time.time()
        results = evaluate(config, split=args.split, compute_fid=args.fid,
                           save_images=False)
        rows.append({
            "sampler": sampler,
            "steps": int(steps),
            "results": {d: {k: round(float(v), 3) for k, v in r.items()
                            if math.isfinite(float(v))}
                        for d, r in results.items()},
            "eval_wall_s": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]))

    summary = {"checkpoint": args.ckpt, "split": args.split, "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
