"""Export a trained checkpoint's (EMA) params to a single flat .npz.

The orbax checkpoint directories live under gitignored ``output/`` and
are wiped between rounds; this exports the weights that matter — the
EMA params used for sampling — as one compressed, git-committable file
that `restore_params` (and thus eval_flagship.py / the CLI
``--pretrained_path``) accepts directly:

  python scripts/export_params.py --ckpt output/demo256/ckpt/ckpt_... \
      --size 256 --channel 128 --channel_mult 1 2 2 2 \
      --out docs/assets/flagship256_ema_fp16.npz

  python scripts/eval_flagship.py --ckpt docs/assets/flagship256_ema_fp16.npz

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
    from hybrid_diffusion_tpu.train.checkpoint import restore_params
    from hybrid_diffusion_tpu.utils.params_io import save_params_npz

    model = DynamicUNet(T=args.T, ch=args.channel,
                        ch_mult=tuple(args.channel_mult),
                        num_res_blocks=args.num_res_blocks, dropout=0.0)
    x6 = jnp.zeros((1, args.size, args.size, 6))
    t = jnp.zeros((1,), jnp.int32)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), x6, t)

    params = restore_params(args.ckpt, template)
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(params))
    save_params_npz(args.out, params, dtype=args.dtype)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out}: {n / 1e6:.1f}M params, {mb:.1f} MB "
          f"({args.dtype}, compressed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
