"""Run configuration: one dataclass + CLI overrides.

Replaces the reference's argparse + hardcoded modelConfig dict merge
(Main.py:9-68, MainCondition.py:5-29, rotinas.py:1336-1361) with a single
typed config. The printed-final-config behavior (Main.py:75-76) is kept
via `pprint()`.

State-name semantics (documented divergence, SURVEY.md §2.9.9): the
reference dispatches --state eval → inference() (val split) and --state
inference → test() (test split). Here the names mean what they say:
`eval` evaluates the val split, `test` the test split; `inference` is
accepted as an alias for `test` for reference-CLI compatibility.
"""

from __future__ import annotations

import argparse
import dataclasses
import pprint as _pprint
from typing import Optional, Sequence


@dataclasses.dataclass
class Config:
    # dispatch
    state: str = "train"                      # train | eval | test (alias: inference)
    # data (Main.py:41-44)
    underwater_data_name: str = "HICRD"
    atmospheric_data_name: str = "LoLI"
    dataset_path: str = "./data/"
    supervised: bool = True
    synthetic_data: bool = False              # use the synthetic paired fixture
    synthetic_length: int = 64
    # model (Main.py:17-22)
    T: int = 1000
    channel: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    dropout: float = 0.15
    img_size: int = 256
    # optimization (Main.py:23-28)
    lr: float = 5e-5
    multiplier: float = 2.0
    beta_1: float = 1e-4
    beta_T: float = 0.02
    grad_clip: float = 1.0
    weight_decay: float = 1e-4
    batch_size: int = 16
    # beyond-reference training options (off by default)
    ema_decay: float = 0.0                    # >0: keep EMA params; eval uses them
    grad_accum: int = 1                       # micro-batches per optimizer update
    # staged training (Main.py:55-57)
    epochs_stage_1: int = 1000                # atmospheric stage
    epochs_stage_2: int = 1000                # underwater stage
    # Joint mode: one stage interleaving both domain loaders batch-by-batch
    # (epochs_stage_1 epochs). This is where the dynamic domain routing
    # actually matters — batches alternate domains, so both middle-block
    # gate patterns fire within one optimizer run.
    joint_training: bool = False
    save_checkpoint: int = 200                # ckpt cadence in epochs
    # sampling (Main.py:33-35)
    ddim: bool = True
    ddim_step: int = 100
    unconditional_guidance_scale: float = 1.0
    # "" → reference behavior (ddim flag picks DDIM/DDPM). "dpm++2m"
    # selects DPM-Solver++(2M): DDIM-100-class quality in ~15-25 steps.
    sampler: str = ""
    # losses (diffusion/Diffusion.py:159)
    dino_weight: float = 0.5
    ms_ssim_weight: float = 0.0045
    color_weight: float = 1.0
    charbonnier_weight: float = 0.0
    vgg_weight: float = 0.0
    vgg_model: str = "vgg16"                  # backbone for the vgg term
    aux_snr_weight: bool = False              # SNR-weight x0-based aux losses
    # Per-stage loss weight overrides, "name=weight,..." (names: mse, dino,
    # ms_ssim, color, charbonnier, vgg). The reference run-book trains
    # stage 1 as "Pre-Training VGG+Charbonnier" and stage 2 as "Enhancement
    # Training (Charbonnier+Angular Color Loss+MS_SSIM)" (aplicacao.ipynb,
    # SURVEY.md §C14) — different loss sets per stage, e.g.
    #   --stage1_losses "vgg=1.0,charbonnier=1.0,dino=0,ms_ssim=0,color=0"
    #   --stage2_losses "charbonnier=1.0,color=1.0,ms_ssim=0.0045,dino=0"
    # Empty string → the shared weights above. Joint mode uses stage1_losses.
    stage1_losses: str = ""
    stage2_losses: str = ""
    use_conditioning: bool = False            # live cemb path + CFG dropout
    p_uncond: float = 0.02
    domain_routing: bool = True
    # Staged-recipe forgetting mitigation A/B: fraction of stage-2+ steps
    # that train on the stage-1 domain instead (every round(1/f)-th batch
    # is REPLACED, so the step budget is unchanged). 0 = the reference's
    # pure-sequential protocol (rotinas.py:643-646), which in r4 lost
    # 6.5 dB on the stage-1 domain (staged128_results_r4.json).
    stage2_replay: float = 0.0
    # paths / io
    pretrained_path: Optional[str] = None
    resume_from: Optional[str] = None         # full-state checkpoint resume
    # Warm-start: initialize model weights from a flat params npz (the
    # export_npz artifact) before training — fresh optimizer, step 0.
    # This is how a run continues from a *committed* artifact after the
    # orbax tree is gone (the reference's analogue: pretrained_path
    # loading before training, rotinas.py:655-658). Ignored when
    # resume_from is set (a full-state checkpoint carries more).
    init_from_npz: str = ""
    # Non-empty: at every checkpoint save, also export the current best
    # sampling weights (mature EMA, else raw params) as one flat fp16 .npz
    # at this path (atomic replace) plus a <path>.json sidecar recording
    # step/subtree — a git-committable artifact that survives the output/
    # wipe between rounds (orbax dirs do not). See utils/params_io.py.
    export_npz: str = ""
    output_path: str = "./results/"
    checkpoint_dir: str = "./output/ckpt/"
    inference_image: str = ""
    # observability (Main.py:49-50)
    wandb: bool = False
    wandb_name: str = "HybridDiffusion_TPU"
    # >0: also log the per-term loss dict every N optimizer steps (the
    # reference logs every batch, rotinas.py:479-485; per-step here would
    # force a device sync each step, so cadence is configurable).
    # 0 = per-epoch only.
    log_every: int = 0
    # >0: every N epochs run a cheap fixed-subset val PSNR probe
    # (DPM++(2M), eval_probe_steps) and append a JSONL row to
    # <output_path>/eval_curve.jsonl — banks a quality-vs-step curve during
    # long runs (the reference's per-checkpoint test hook intent,
    # rotinas.py:699-711, without the full metric sweep's cost).
    eval_every: int = 0
    eval_probe_steps: int = 15                # sampler steps for the probe
    eval_probe_batches: int = 1               # val batches per probe
    # TPU execution
    bf16: bool = True
    use_pallas_attention: bool = False
    remat: bool = False                       # rematerialize ResBlocks (memory↓)
    mesh_data: Optional[int] = None           # None → all devices / model
    mesh_model: int = 1
    zero1: bool = False                       # shard optimizer state over data axis
    async_checkpoint: bool = False            # overlap periodic saves with training
    epoch: int = 2000                         # eval-time checkpoint selector
    seed: int = 0
    num_workers: int = 4
    device_data: bool = False                 # keep train corpus in HBM; gather batches on device
    compilation_cache: str = ".jax_cache"

    def pprint(self) -> None:
        print("\nFinal configuration:")
        _pprint.pprint(dataclasses.asdict(self))

    @property
    def loss_config(self):
        from .losses import CompositeLossConfig

        return CompositeLossConfig(
            dino_weight=self.dino_weight,
            ms_ssim_weight=self.ms_ssim_weight,
            color_weight=self.color_weight,
            charbonnier_weight=self.charbonnier_weight,
            vgg_weight=self.vgg_weight,
            aux_snr_weight=self.aux_snr_weight,
        )

    def stage_loss_config(self, stage_index: int):
        """Loss weights for stage `stage_index` (0-based): the shared
        weights overlaid with that stage's --stageN_losses overrides."""
        base = self.loss_config
        spec = (self.stage1_losses, self.stage2_losses)[min(stage_index, 1)]
        if not spec:
            return base
        return dataclasses.replace(base, **{
            f"{name}_weight": w
            for name, w in parse_loss_overrides(spec).items()})


_LOSS_NAMES = ("mse", "dino", "ms_ssim", "color", "charbonnier", "vgg")


def parse_loss_overrides(spec: str) -> dict:
    """Parse 'name=weight,name=weight' into {name: float}.

    Valid names: mse, dino, ms_ssim, color, charbonnier, vgg.
    """
    out = {}
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        name, sep, value = item.partition("=")
        name = name.strip()
        if not sep or name not in _LOSS_NAMES:
            raise ValueError(
                f"bad loss override {item!r}: expected name=weight with "
                f"name in {_LOSS_NAMES}")
        out[name] = float(value)
    return out


def _add_bool_flag(parser, name: str, default: bool, help_: str = ""):
    parser.add_argument(f"--{name}", dest=name,
                        action=argparse.BooleanOptionalAction,
                        default=default, help=help_)


def parse_config(argv: Optional[Sequence[str]] = None) -> Config:
    defaults = Config()
    p = argparse.ArgumentParser(
        description="Hybrid two-domain diffusion enhancement (TPU-native)"
    )
    for f in dataclasses.fields(Config):
        name = f.name
        default = getattr(defaults, name)
        if isinstance(default, bool):
            _add_bool_flag(p, name, default)
        elif name == "channel_mult":
            p.add_argument("--channel_mult", type=int, nargs="+",
                           default=list(default))
        elif f.type in ("Optional[int]",) or default is None:
            kind = int if name in ("mesh_data",) else str
            p.add_argument(f"--{name}", type=kind, default=default)
        else:
            p.add_argument(f"--{name}", type=type(default), default=default)
    args = p.parse_args(argv)
    cfg = Config(**{f.name: getattr(args, f.name)
                    for f in dataclasses.fields(Config)})
    if cfg.state == "inference":  # reference-CLI alias (Main.py:107)
        cfg.state = "test"
    return cfg
