"""Regenerate CFG sweep grids from a persisted cfg_params.npz — no retrain.

`scripts/demo_cfg.py` saves its trained parameters as a flat npz
(`<keep>/cfg_params.npz`). This harness reloads them into the CFG U-Net
and re-runs the guidance sweep (one jitted sampler, w traced), writing
grid PNGs + a JSON — useful when a sweep was lost to an output bug or a
tunnel stall without paying the ~30 min retrain.

Usage:
  python scripts/regen_cfg_grids.py --params output/cfg_demo/cfg_params.npz \
      [--ws 0,0.5,1.8,3.0] [--out cfg_regen.json] [--keep output/cfg_demo]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo_cfg import class_templates, template_accuracy  # noqa: E402


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--params", required=True, help="cfg_params.npz")
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--T", type=int, default=500)
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--nrow", type=int, default=8)
    p.add_argument("--ws", default="0,0.5,1.8,3.0")
    p.add_argument("--out", default=None)
    p.add_argument("--keep", default=None,
                   help="output dir (default: the npz's directory)")
    args = p.parse_args()

    import jax

    if os.environ.get("HDT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["HDT_PLATFORM"])
    import jax.numpy as jnp

    from hybrid_diffusion_tpu.cfg.sampler import cfg_ddpm_sample
    from hybrid_diffusion_tpu.cfg.train import (
        CFGConfig,
        _image_grid,
        _write_png,
        build_cfg_model,
    )
    from hybrid_diffusion_tpu.diffusion.schedule import linear_beta_schedule

    out_dir = args.keep or os.path.dirname(os.path.abspath(args.params))
    os.makedirs(out_dir, exist_ok=True)
    with np.load(args.params) as z:
        params = unflatten({k: z[k] for k in z.files})
    params = jax.tree_util.tree_map(jnp.asarray, params)

    config = CFGConfig(T=args.T, channel=args.channel,
                       img_size=args.img_size, nrow=args.nrow, dropout=0.0)
    model = build_cfg_model(dataclasses.replace(config, dropout=0.0))
    schedule = linear_beta_schedule(config.beta_1, config.beta_T, config.T)
    labels_np = np.repeat(np.arange(1, 11), config.nrow)
    labels = jnp.asarray(labels_np, jnp.int32)

    def denoise(x, t, l):
        return model.apply(params, x, t, l)

    sample = jax.jit(lambda w, r: cfg_ddpm_sample(
        denoise, schedule, labels, r, image_size=config.img_size, w=w))

    templates = class_templates(config.img_size)
    summary = {"params": args.params, "sweep": []}
    for w in (float(v) for v in args.ws.split(",")):
        t0 = time.time()
        out = jax.block_until_ready(
            sample(jnp.float32(w), jax.random.PRNGKey(1234)))
        imgs = (np.asarray((out + 1.0) / 2.0 * 255.0)
                .clip(0, 255).astype(np.uint8))
        acc, dist = template_accuracy(imgs, labels_np - 1, templates)
        png = os.path.join(out_dir, f"cfg_grid_w{w:g}.png")
        _write_png(png, _image_grid(imgs, config.nrow))
        summary["sweep"].append(
            {"w": w, "template_accuracy": round(acc, 4),
             "template_dist": round(dist, 2),
             "sample_wall_s": round(time.time() - t0, 1), "grid": png})
        print(f"# w={w:g}: acc={acc:.3f} dist={dist:.1f}", file=sys.stderr)

    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
