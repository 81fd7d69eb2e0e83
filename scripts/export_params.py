"""Export a trained checkpoint's params to a single flat .npz.

The orbax checkpoint directories live under gitignored ``output/`` and
are wiped between rounds; this exports the sampling weights as one
compressed, git-committable file that `restore_params` (and thus
eval_flagship.py / the CLI ``--pretrained_path``) accepts directly:

  python scripts/export_params.py --ckpt output/demo256/ckpt/ckpt_... \
      --size 256 --channel 128 --channel_mult 1 2 2 2 \
      --out docs/assets/flagship256_fp16.npz

  python scripts/eval_flagship.py --ckpt docs/assets/flagship256_fp16.npz

``--subtree auto`` (default) applies the EMA-maturity rule
(train/checkpoint.py:choose_restore_subtree): the EMA is exported only
when decay^step says it carries <5% residual random init, otherwise the
raw params — round 3 shipped a 1,600-step EMA that evaluated at 4.4 dB
(below the no-op baseline) because the old script exported EMA
unconditionally. A <out>.json sidecar records step/subtree/decay.

**Verify before shipping**: ALWAYS run
``scripts/eval_flagship.py --ckpt <out>`` on the exported file itself —
not the orbax dir — before committing it; the sidecar is provenance,
not proof.

The template is built with jax.eval_shape (no compile, no device work) —
important on this 1-core host where a jitted 256^2 model.init costs
minutes of XLA:CPU compile.

Reference analogue: torch.save state-dict checkpoints
(utils/rotinas.py:555-564), which the author's run-book (aplicacao.ipynb)
passes around by filename the same way.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--dtype", default="float16",
                   choices=["float16", "float32"],
                   help="export precision (fp16 is lossless w.r.t. the "
                        "bf16 compute path; see utils/params_io.py)")
    p.add_argument("--subtree", default="auto",
                   choices=["auto", "ema", "raw"],
                   help="auto = EMA-maturity rule; ema/raw force a subtree")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+", default=[1, 2, 2, 2])
    p.add_argument("--num_res_blocks", type=int, default=2)
    p.add_argument("--T", type=int, default=1000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # no device work needed

    from hybrid_diffusion_tpu.models import DynamicUNet
    from hybrid_diffusion_tpu.train.checkpoint import (
        _restore_partial,
        choose_restore_subtree,
        load_metadata,
        restore_params,
    )
    from hybrid_diffusion_tpu.utils.params_io import save_params_npz

    model = DynamicUNet(T=args.T, ch=args.channel,
                        ch_mult=tuple(args.channel_mult),
                        num_res_blocks=args.num_res_blocks, dropout=0.0)
    x6 = jnp.zeros((1, args.size, args.size, 6))
    t = jnp.zeros((1,), jnp.int32)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), x6, t)

    if args.ckpt.endswith(".npz"):
        if args.subtree != "auto":
            # A flat npz holds exactly one subtree — honoring a forced
            # ema/raw choice is impossible; silently re-exporting whatever
            # the npz contains would repeat round 3's shipped-EMA mistake.
            p.error(f"--subtree {args.subtree} cannot be honored for a flat "
                    ".npz input (it holds a single already-selected "
                    "subtree); re-export from the orbax checkpoint dir")
        subtree, reason = "npz", "flat npz re-export"
        params = restore_params(args.ckpt, template)
    elif args.subtree == "auto":
        subtree, reason = choose_restore_subtree(args.ckpt)
        params = restore_params(args.ckpt, template)
    else:
        subtree = {"ema": "ema_params", "raw": "params"}[args.subtree]
        reason = f"forced --subtree {args.subtree}"
        params = _restore_partial(args.ckpt, {subtree: template})[subtree]
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(params))
    save_params_npz(args.out, params, dtype=args.dtype)
    meta = load_metadata(args.ckpt) if not args.ckpt.endswith(".npz") else {}
    import json

    with open(args.out + ".json", "w") as f:
        json.dump({"subtree": subtree, "reason": reason,
                   "step": meta.get("step"),
                   "ema_decay": meta.get("ema_decay"),
                   "source": os.path.abspath(args.ckpt)}, f)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out}: {n / 1e6:.1f}M params, {mb:.1f} MB "
          f"({args.dtype}, compressed)")
    print(f"exported subtree: {subtree} — {reason}")
    print(f"VERIFY BEFORE SHIPPING: python scripts/eval_flagship.py "
          f"--ckpt {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
