"""Orchestration: staged two-domain training, evaluation, inference.

Rebuilds utils/rotinas.py's train/test/inference drivers (rotinas.py:571,
:839, :1086) TPU-first:

  - staged training (atmospheric stage then underwater stage, fresh
    optimizer + warmup-cosine per stage — rotinas.py:643-665);
  - one compiled train step reused across stages and domains (the domain
    gate is traced — no per-stage recompilation);
  - GSPMD mesh execution (replaces the DDP/DataParallel branches,
    rotinas.py:618-627);
  - checkpoint cadence with stage-encoded names (rotinas.py:699-731);
  - evaluation: batched DDIM sampling + PSNR/SSIM/UIQM/UCIQE/FID sweep and
    a plain-text report per domain (rotinas.py:839-1084), with the
    reference's per-batch-FID and smoothed-average defects fixed
    (SURVEY.md §2.9.8-9: FID aggregates all features; averages are plain
    means).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import BatchLoader, make_dataset
from ..data.pipeline import interleave
from ..diffusion import ddim_sample, ddpm_sample, linear_beta_schedule
from ..models import DynamicUNet
from ..data.pipeline import device_prefetch
from ..parallel import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    maybe_initialize,
    shard_batch,
    shard_params,
    shard_state,
)
from ..utils import profile_trace, timed_block
from .checkpoint import (
    find_checkpoint,
    find_latest_checkpoint,
    restore_params,
    restore_state,
    save_checkpoint,
    wait_for_checkpoints,
)
from .logging import MetricsLogger
from .step import make_train_step, normalize_uint8
from .train_state import create_train_state


def setup_cache(config: Config) -> None:
    if config.compilation_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(config.compilation_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_model(config: Config) -> DynamicUNet:
    return DynamicUNet(
        T=config.T,
        ch=config.channel,
        ch_mult=tuple(config.channel_mult),
        num_res_blocks=config.num_res_blocks,
        dropout=config.dropout,
        dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
        use_pallas_attention=config.use_pallas_attention,
        remat=config.remat,
    )


def init_params(config: Config, model: DynamicUNet):
    x6 = jnp.zeros((1, config.img_size, config.img_size, 6))
    t = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(config.seed), x6, t)
    path = config.pretrained_path
    if not path and config.state in ("eval", "test", "enhance"):
        # Epoch-based checkpoint selection (the reference's eval flows
        # pick ckpt_{epoch}_* by name, rotinas.py:859).
        path = find_checkpoint(config.checkpoint_dir, config.epoch)
    if path:
        params = restore_params(path, params)
        print(f"[params] restored from {path}")
    return params

def _dataset_name(config: Config, domain: str) -> str:
    if config.synthetic_data:
        return f"synthetic-{domain}"
    return (config.underwater_data_name if domain == "underwater"
            else config.atmospheric_data_name)


def _loader(config: Config, domain: str, task: str,
            shuffle: bool, drop_last: bool = False, sharding=None):
    ds = make_dataset(
        _dataset_name(config, domain), task=task,
        dataset_path=config.dataset_path, image_size=config.img_size,
        supervised=config.supervised,
        synthetic_length=config.synthetic_length,
    )
    # Training corpora can live in HBM (device_data): batches are gathered
    # on device from one resident copy, so per-step host→device traffic is
    # an index vector instead of the images (data/pipeline.py rationale).
    if config.device_data and task == "train" and jax.process_count() == 1:
        from ..data.pipeline import DeviceBatchLoader

        return DeviceBatchLoader(ds, config.batch_size, shuffle=shuffle,
                                 seed=config.seed, drop_last=drop_last,
                                 sharding=sharding)
    return BatchLoader(ds, config.batch_size, shuffle=shuffle,
                       seed=config.seed, num_workers=config.num_workers,
                       drop_last=drop_last,
                       shard_hosts=jax.process_count() > 1)


def _make_dino(config: Config, stage_cfgs) -> Optional[object]:
    if not any(c.dino_weight for c in stage_cfgs):
        return None
    from ..losses import DinoPerceptualLoss

    return DinoPerceptualLoss(
        jax.random.PRNGKey(1), image_size=config.img_size,
        dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
    )


def _make_vgg(config: Config, stage_cfgs) -> Optional[object]:
    if not any(c.vgg_weight for c in stage_cfgs):
        return None
    from ..losses import VGGPerceptualLoss

    return VGGPerceptualLoss(
        jax.random.PRNGKey(2), model=config.vgg_model,
        dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
    )


def train(config: Config, max_steps: Optional[int] = None) -> dict:
    """Two-stage training driver. Returns a summary dict (for tests)."""
    # Preemption safety (SURVEY.md §5.3 — the reference has none): SIGTERM
    # (the TPU-VM maintenance-event signal) requests a graceful stop; the
    # loop saves a resumable full-state checkpoint at the next epoch
    # boundary and returns. `--resume_from auto` picks it back up.
    # Installed first so a signal during setup/compile is not fatal.
    import signal

    preempt = {"flag": False}

    def _on_sigterm(signum, frame):
        preempt["flag"] = True
        print("[train] SIGTERM — will checkpoint and stop at epoch end")

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        prev_handler = None  # not the main thread (e.g. a test harness)

    setup_cache(config)
    maybe_initialize()  # multi-host (no-op single-host; SURVEY.md §5.8)
    mesh = make_mesh(config.mesh_data, config.mesh_model)
    model = build_model(config)
    params = init_params(config, model)
    # Resolve the resume target BEFORE the warm-start decision: the
    # documented segmented long-run workflow passes `--resume_from auto`
    # on every segment, and on the FIRST segment (no ckpt_* yet) a
    # configured --init_from_npz must win instead of raising — one command
    # line for the whole loop.
    resume_path = None
    if config.resume_from:
        resume_path = config.resume_from
        if resume_path == "auto":
            resume_path = find_latest_checkpoint(config.checkpoint_dir)
            if resume_path is None:
                if not config.init_from_npz:
                    raise FileNotFoundError(
                        f"--resume_from auto: no ckpt_* directories under "
                        f"{config.checkpoint_dir}")
                print("[train] --resume_from auto: no checkpoint yet — "
                      "falling back to the --init_from_npz warm-start")
    warm_meta = None
    if config.init_from_npz and resume_path is None:
        # Warm-start from a committed flat-npz artifact (fp16 storage ->
        # f32 master weights via the template cast). Fresh optimizer and
        # schedule — this is a new run standing on shipped weights, not a
        # resume; use resume_from for full-state continuation.
        from ..utils.params_io import load_params_npz

        params = load_params_npz(config.init_from_npz, template=params)
        src_step = None
        try:
            # Sidecar is print-only provenance — a missing/malformed one
            # must not block training.
            import json as _json

            with open(config.init_from_npz + ".json") as f:
                src_step = _json.load(f).get("step")
        except (OSError, ValueError):
            pass
        # Recorded in every checkpoint/export sidecar of this run, so a
        # later round can see which artifact it stands on (same rationale
        # as the loss-set provenance).
        warm_meta = {"path": config.init_from_npz, "src_step": src_step}
        print(f"[train] warm-start params from {config.init_from_npz}"
              + (f" (exported at step {src_step})"
                 if src_step is not None else ""))
        if config.lr >= type(config).lr:
            print(f"[train] WARNING: warm-starting trained weights with "
                  f"lr={config.lr:g} (>= the from-scratch default "
                  f"{type(config).lr:g}) and a full warmup-cosine — this "
                  f"can degrade the shipped weights; fine-tunes usually "
                  f"want --lr 1e-5 (RUNBOOK 'No orbax checkpoint "
                  f"anymore?').")
    schedule = linear_beta_schedule(config.beta_1, config.beta_T, config.T)
    logger = MetricsLogger(config.wandb, project=config.wandb_name,
                           config=config.__dict__)

    datasets_tag = f"{config.underwater_data_name}{config.atmospheric_data_name}"
    if config.joint_training:
        # One stage, both domains interleaved batch-by-batch — the regime
        # where the color-statistic routing exercises both middle-block
        # gate patterns inside a single optimizer run.
        stages = [("Joint", "both", config.epochs_stage_1)]
    else:
        stages = [
            ("Atmospheric", "atmospheric", config.epochs_stage_1),
            ("Underwater", "underwater", config.epochs_stage_2),
        ]
    # Per-stage loss weight sets (the reference run-book's two-stage recipe,
    # aplicacao.ipynb: "Pre-Training VGG+Charbonnier" then "Enhancement
    # Training (Charbonnier+Angular Color Loss+MS_SSIM)"). Extractors are
    # built once, shared across stages that use them; a stage whose weights
    # differ from the previous one compiles its own step (at most one
    # compile per distinct weight set).
    stage_cfgs = [config.stage_loss_config(i) for i in range(len(stages))]
    dino = _make_dino(config, stage_cfgs)
    vgg = _make_vgg(config, stage_cfgs)
    step_cache: dict = {}

    def stage_step_fn(loss_cfg, state):
        if loss_cfg in step_cache:
            return step_cache[loss_cfg]
        raw = make_train_step(
            schedule, loss_cfg,
            dino_loss_fn=dino if loss_cfg.dino_weight else None,
            vgg_loss_fn=vgg if loss_cfg.vgg_weight else None,
            use_conditioning=config.use_conditioning,
            p_uncond=config.p_uncond,
            domain_routing=config.domain_routing, jit=False,
        )
        if config.zero1:
            from ..parallel import state_shardings

            fn = make_sharded_train_step(
                mesh, raw,
                state_shardings=state_shardings(mesh, state,
                                                zero1=True))
        else:
            fn = make_sharded_train_step(mesh, raw)
        step_cache[loss_cfg] = fn
        return fn

    rng = jax.random.PRNGKey(config.seed)
    summary = {"stages": [], "steps": 0, "preempted": False}
    resumed = False
    # Stage-aware resume (path resolved above): read which stage the
    # checkpoint belongs to, so a staged run preempted in stage 2 resumes
    # INTO stage 2 (not into stage 1's loss set on stage-2 weights), and a
    # stage-final checkpoint resumes at the NEXT stage.
    resume_start_stage = 0
    if resume_path is not None:
        from .checkpoint import load_metadata

        ck_meta = load_metadata(resume_path)
        # Inherit warm-start provenance across segments: the first segment
        # records --init_from_npz in its checkpoint metadata, and later
        # segments resume from a checkpoint instead of re-reading the npz —
        # but their exported-npz sidecars must keep naming the artifact the
        # whole run stands on (same rationale as the loss-set provenance).
        # Fall back to the CLI flag for runs whose early checkpoints predate
        # this propagation.
        if ck_meta.get("init_from"):
            warm_meta = ck_meta["init_from"]
        elif config.init_from_npz:
            src_step = None
            try:
                import json as _json

                with open(config.init_from_npz + ".json") as f:
                    src_step = _json.load(f).get("step")
            except (OSError, ValueError):
                pass
            warm_meta = {"path": config.init_from_npz, "src_step": src_step}
        stage_names = [s[0] for s in stages]
        resume_stage_finished = False
        if ck_meta.get("stage") in stage_names:
            idx = stage_names.index(ck_meta["stage"])
            finished = (not ck_meta.get("preempted", False)
                        and "_final_" in os.path.basename(resume_path))
            # A finished FINAL stage still enters that stage (its budget
            # check runs zero steps and re-saves), keeping summary shape.
            resume_start_stage = min(idx + (1 if finished else 0),
                                     len(stages) - 1)
            # Crossing a stage boundary restores params (+EMA) only — the
            # next stage gets the fresh optimizer + restarted warmup-cosine
            # the reference's per-stage semantics demand (rotinas.py:660),
            # not the finished stage's moments and schedule step.
            resume_stage_finished = finished and resume_start_stage > idx
    # Short run id baked into stage-final/preempt checkpoint names so two
    # runs of the same config can never share a directory (VERDICT r3
    # weak #1: the configured-epoch-total naming made every rerun clobber
    # its predecessor's preempt checkpoint).
    run_id = time.strftime("%m%d%H%M")

    def export_npz_snapshot(state) -> None:
        """Export the current best sampling weights as a flat fp16 npz at
        config.export_npz (atomic), with a .json sidecar naming the
        subtree/step — the round-portable artifact (VERDICT r3 #1/#3:
        progress must survive the output/ wipe, and what ships must be
        the weights that actually sample well, never an immature EMA)."""
        if not config.export_npz:
            return
        from ..utils.params_io import save_params_npz
        from .checkpoint import choose_subtree_from_evidence

        step = int(jax.device_get(state.step))
        has_ema = state.ema_params is not None and bool(state.ema_decay)
        # The SAME policy eval-time restore uses (checkpoint.py): probe
        # evidence first, decay^step init-mass proxy second — training
        # export and eval restore can never pick different subtrees.
        subtree, reason = choose_subtree_from_evidence(
            has_ema, step, state.ema_decay, probe_state.get("last"))
        use_ema = subtree == "ema_params"
        out = os.path.abspath(config.export_npz)
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        t0 = time.time()
        # pid-unique temp names: two concurrent runs sharing --export_npz
        # must not interleave writes into one temp file.
        tmp = f"{out}.tmp.{os.getpid()}.npz"
        save_params_npz(tmp, state.ema_params if use_ema else state.params)
        import json

        side_tmp = f"{out}.json.tmp.{os.getpid()}"
        with open(side_tmp, "w") as f:
            json.dump({"step": step,
                       "subtree": subtree,
                       "reason": reason,
                       "ema_decay": state.ema_decay,
                       "ema_init_mass": (state.ema_decay ** step
                                         if has_ema else None),
                       "probe": probe_state.get("last"),
                       "init_from": warm_meta,
                       "run_id": run_id}, f)
        # npz then sidecar, both atomic — a crash between the two leaves a
        # stale sidecar for at most one cadence, never a truncated one.
        os.replace(tmp, out)
        os.replace(side_tmp, out + ".json")
        print(f"[export] {out}: subtree={'ema' if use_ema else 'raw'} "
              f"step={step} ({time.time() - t0:.0f}s)")

    # --eval_every probe: cheap DPM++(2M) val PSNR on a fixed subset,
    # appended to <output_path>/eval_curve.jsonl. One jitted sampler taking
    # params as an argument (no per-call recompile); val batches are pulled
    # once per domain and pinned so the curve is comparable across epochs.
    probe_state: dict = {"fn": None, "batches": {}}

    def run_eval_probe(state, stage_name, probe_domains, epoch):
        from ..diffusion import dpm_solver_pp_2m_sample
        from ..metrics import psnr as _psnr

        # The default probe budget can exceed a tiny-T debug schedule —
        # clamp rather than error (the probe is diagnostic, not the eval).
        probe_steps = min(config.eval_probe_steps, config.T)
        if probe_state["fn"] is None:
            def _sample(p, cond_u8, sub):
                cond = normalize_uint8(cond_u8)

                # Probe samples the way this run trains: conditioned runs
                # score the live-cemb path (matching make_sampler).
                def denoise(x6, t,
                            context_zero=not config.use_conditioning):
                    return model.apply(p, x6, t, context_zero=context_zero)

                out = dpm_solver_pp_2m_sample(
                    denoise, schedule, cond, sub,
                    steps=probe_steps, guidance_scale=1.0)
                return (out + 1.0) / 2.0

            probe_state["fn"] = jax.jit(_sample)
        rows = []
        for dom in probe_domains:
            if dom not in probe_state["batches"]:
                ld = _loader(config, dom, "val", shuffle=False)
                # Pinned once — inputs as DEVICE arrays, so repeated probes
                # re-transfer nothing (the axon plugin leaks host RAM per
                # H2D transfer; gt stays host-side for the numpy PSNR).
                # The jitted probe compiles per distinct batch shape, so at
                # most one extra compile for a ragged tail.
                probe_state["batches"][dom] = [
                    {"input": jax.device_put(np.asarray(b["input"])),
                     "gt": b["gt"]}
                    for _, b in zip(range(config.eval_probe_batches), ld)]
            # Score raw params AND the EMA (when kept): an immature EMA can
            # sit far below the raw weights (r3: 4.4 vs 9-10 dB) and that
            # divergence must be visible live, not discovered at round-end
            # eval (VERDICT r3 weak #2/#6).
            variants = [("psnr", state.params)]
            if state.ema_params is not None:
                variants.append(("psnr_ema", state.ema_params))
            row = {"stage": stage_name, "epoch": epoch + 1,
                   "step": int(state.step), "domain": dom,
                   "probe_steps": probe_steps,
                   "time": time.time()}
            for key, probe_params in variants:
                total, n = 0.0, 0
                for bi, b in enumerate(probe_state["batches"][dom]):
                    out = np.asarray(probe_state["fn"](
                        probe_params, b["input"],
                        jax.random.PRNGKey(config.seed + bi)))
                    out_u8 = np.clip(out * 255.0, 0, 255).astype(np.uint8)
                    for i in range(out_u8.shape[0]):
                        total += _psnr(b["gt"][i], out_u8[i], data_range=255)
                        n += 1
                if n:
                    row[key] = round(total / n, 3)
                    row["n"] = n
            if "psnr" in row:
                rows.append(row)
        if rows:
            # Latest probe means (across domains) feed the export subtree
            # decision: ship EMA only when it actually scores >= raw.
            probe_state["last"] = {
                "step": rows[0]["step"],
                "psnr": round(sum(r["psnr"] for r in rows) / len(rows), 3),
            }
            if all("psnr_ema" in r for r in rows):
                probe_state["last"]["psnr_ema"] = round(
                    sum(r["psnr_ema"] for r in rows) / len(rows), 3)
            import json

            os.makedirs(config.output_path, exist_ok=True)
            with open(os.path.join(config.output_path,
                                   "eval_curve.jsonl"), "a") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
            print("[eval_probe] " + "  ".join(
                f"{r['domain']}: {r['psnr']:.2f} dB"
                + (f" (ema {r['psnr_ema']:.2f})" if "psnr_ema" in r else "")
                for r in rows))

    for stage_index, (stage_name, domain, stage_epochs) in enumerate(stages):
        if stage_epochs <= 0:
            continue
        if stage_index < resume_start_stage:
            print(f"[train] resume: skipping completed stage {stage_name}")
            continue
        # A ragged final batch cannot shard over the data axis (and would
        # trigger a recompile even single-device) — drop it when the batch
        # doesn't divide, like DistributedSampler padding rounds off.
        drop_last = mesh.devices.size > 1
        train_sharding = batch_sharding(mesh) if config.device_data else None
        if domain == "both":
            loaders = [
                _loader(config, "atmospheric", "train", shuffle=True,
                        drop_last=drop_last, sharding=train_sharding),
                _loader(config, "underwater", "train", shuffle=True,
                        drop_last=drop_last, sharding=train_sharding),
            ]
        else:
            loaders = [_loader(config, domain, "train", shuffle=True,
                               drop_last=drop_last,
                               sharding=train_sharding)]
        # Stage-2+ replay: replace every round(1/f)-th batch with one from
        # the stage-1 domain (budget unchanged). Mitigates the sequential
        # protocol's cross-domain forgetting (r4: −6.5 dB atmospheric
        # after the underwater stage) without changing compiled shapes.
        replay_loader = None
        if (config.stage2_replay > 0 and stage_index > 0
                and domain in ("atmospheric", "underwater")):
            other = ("atmospheric" if domain == "underwater"
                     else "underwater")
            replay_loader = _loader(config, other, "train", shuffle=True,
                                    drop_last=drop_last,
                                    sharding=train_sharding)
            replay_period = max(int(round(1.0 / config.stage2_replay)), 1)
            print(f"[train] stage {stage_name}: replaying a {other} batch "
                  f"every {replay_period} steps (stage2_replay="
                  f"{config.stage2_replay:g})")
        # The LR schedule counts optimizer updates: with grad accumulation,
        # k micro-batches advance it once.
        steps_per_epoch = max(
            sum(len(l) for l in loaders) // max(config.grad_accum, 1), 1)
        # Fresh optimizer per stage (rotinas.py:660) — same params carry over.
        state = create_train_state(
            shard_params(mesh, params), model.apply,
            lr=config.lr, weight_decay=config.weight_decay,
            grad_clip=config.grad_clip, total_epochs=stage_epochs,
            steps_per_epoch=steps_per_epoch, multiplier=config.multiplier,
            ema_decay=config.ema_decay, grad_accum=config.grad_accum,
        )
        state = shard_state(mesh, state, zero1=config.zero1)
        step_fn = stage_step_fn(stage_cfgs[stage_index], state)
        # Loss-set provenance, saved with every checkpoint (see the resume
        # warning below for why it matters).
        loss_meta = dataclasses.asdict(stage_cfgs[stage_index])
        if resume_path and not resumed:
            if resume_stage_finished:
                # Stage-boundary resume: weights only; this stage keeps its
                # fresh optimizer and restarted warmup-cosine (the
                # reference's per-stage semantics, rotinas.py:660).
                from .checkpoint import _restore_partial, checkpoint_has_ema

                item = {"params": state.params}
                if (state.ema_params is not None
                        and checkpoint_has_ema(resume_path)):
                    item["ema_params"] = state.ema_params
                restored = _restore_partial(resume_path, item)
                state = state.replace(
                    params=restored["params"],
                    **({"ema_params": restored["ema_params"]}
                       if "ema_params" in restored else {}))
                # Global budget still counts the finished stages' steps.
                summary["steps"] = int(ck_meta.get("step") or 0)
                print(f"[train] resumed params from finished stage "
                      f"checkpoint {resume_path} "
                      f"(step {summary['steps']}, fresh optimizer)")
            else:
                # Full-state resume: params + optimizer moments + step, so
                # the warmup-cosine schedule continues instead of
                # restarting (the reference loses optimizer state on
                # resume, SURVEY.md §5.4).
                saved_loss = ck_meta.get("loss_config")
                if saved_loss is not None and saved_loss != loss_meta:
                    diff = {k: (saved_loss.get(k), v)
                            for k, v in loss_meta.items()
                            if saved_loss.get(k) != v}
                    print(
                        "[train] WARNING: full-state resume with a CHANGED "
                        f"loss set {diff} — the restored Adam moments are "
                        "calibrated to the old objective; their tiny second "
                        "moments amplify any new loss term's gradients "
                        "(measured collapse within 2 epochs at the 256^2 "
                        "flagship point, PARITY.md 'x0-based aux losses'). "
                        "To fine-tune with a new loss set, pass the "
                        "checkpoint as --pretrained_path instead: params-"
                        "only init, fresh optimizer + warmup.")
                state = restore_state(resume_path, state)
                # Count the restored optimizer step against max_steps so a
                # resumed run finishes the ORIGINAL budget (and its cosine
                # schedule) instead of appending a whole new budget at
                # end-LR. (One device sync, once. Micro-step counts differ
                # from optimizer steps under grad_accum>1; the budget is
                # in optimizer steps then — the schedule's own clock.)
                summary["steps"] = int(state.step)
                print(f"[train] resumed full state from {resume_path} "
                      f"(step {int(state.step)})")
            # Orbax may restore leaves without the template's placement —
            # re-pin (no-op when shardings already match).
            state = shard_state(mesh, state, zero1=config.zero1)
            resumed = True

        last_metrics: dict = {}
        metrics = None  # set by the first executed step
        epochs_done = 0  # actual epochs completed this run (for ckpt names)
        for epoch in range(stage_epochs):
            for ld in loaders:
                ld.set_epoch(epoch)
            batch_iter = (iter(loaders[0]) if len(loaders) == 1
                          else interleave(*loaders))
            if replay_loader is not None:
                replay_loader.set_epoch(epoch)

                def _with_replay(main_iter, rep_ld, period):
                    rep = iter(rep_ld)
                    for i, b in enumerate(main_iter):
                        if (i + 1) % period == 0:
                            try:
                                yield next(rep)
                            except StopIteration:
                                rep = iter(rep_ld)
                                yield next(rep)
                        else:
                            yield b

                batch_iter = _with_replay(batch_iter, replay_loader,
                                          replay_period)
            t_epoch = time.time()
            if getattr(loaders[0], "device_resident", False):
                # Batches are already device arrays on the batch sharding
                # (DeviceBatchLoader gathers on device); a device_put here
                # would be a pointless round-trip.
                batches = ({"input": b["input"], "gt": b["gt"]}
                           for b in batch_iter)
            else:
                # Host→device copies of the next batches overlap the
                # current step (device_prefetch); uint8 on the wire,
                # normalize on-device.
                batches = device_prefetch(
                    ({"input": b["input"], "gt": b["gt"]}
                     for b in batch_iter),
                    sharding=batch_sharding(mesh),
                )
            for arrays in batches:
                # Budget check BEFORE the step: a resumed run whose
                # restored step already meets max_steps must run zero.
                if max_steps and summary["steps"] >= max_steps:
                    break
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, arrays, sub)
                summary["steps"] += 1
                if (config.log_every
                        and summary["steps"] % config.log_every == 0):
                    # Per-N-steps per-term logging (reference logs every
                    # batch, rotinas.py:479-485); fetching the metric dict
                    # syncs the device, hence the cadence knob.
                    logger.log(metrics, step=int(state.step),
                               prefix=f"Train {stage_name}/")
                if max_steps and summary["steps"] >= max_steps:
                    break
            if metrics is None:  # zero steps ran (budget already met)
                break
            epochs_done = epoch + 1
            last_metrics = logger.log(metrics, step=int(state.step),
                                      prefix=f"Train {stage_name}/")
            sps = steps_per_epoch / max(time.time() - t_epoch, 1e-9)
            gn = last_metrics.get("grad_norm")
            print(f"[{stage_name}] epoch {epoch+1}/{stage_epochs} "
                  f"loss={last_metrics.get('total', float('nan')):.4f} "
                  + (f"gnorm={float(gn):.2f} " if gn is not None else "")
                  + f"{sps:.2f} steps/s")
            # Failure detection (SURVEY.md §5.3 — the reference has none):
            # a non-finite loss aborts the stage after an emergency save,
            # so a resumable state survives divergence. Checked per epoch
            # (per-step checks would force a device sync every step).
            if not np.isfinite(last_metrics.get("total", 0.0)):
                path = save_checkpoint(
                    config.checkpoint_dir, epoch + 1,
                    f"{stage_name}_NAN_ABORT", datasets_tag, state,
                    metadata={"stage": stage_name, "epoch": epoch + 1,
                              "loss_config": loss_meta,
                              "init_from": warm_meta,
                              "reason": "non-finite loss"})
                logger.alert("non-finite loss", path)
                raise FloatingPointError(
                    f"non-finite loss at {stage_name} epoch {epoch+1}; "
                    f"emergency checkpoint: {path}")
            # Probe BEFORE save: at coincident cadences the checkpoint
            # metadata and the exported npz carry evidence from the state
            # being saved, not from eval_every epochs ago (during fast
            # improvement a stale probe can flip the subtree choice).
            if config.eval_every and (epoch + 1) % config.eval_every == 0:
                # Probe BOTH domains even in a single-domain stage: the
                # staged recipe's stage 2 (underwater) degraded the
                # stage-1 atmospheric domain by 6.5 dB in r4 and no
                # artifact could attribute it because the probe followed
                # the training domain (VERDICT r4 weak #2). Cross-domain
                # forgetting must be visible live.
                run_eval_probe(state, stage_name,
                               ("atmospheric", "underwater"), epoch)
            if (epoch + 1) % config.save_checkpoint == 0:
                # Periodic saves overlap training (async): save() returns
                # after the D2H copy; the disk write rides a background
                # thread. Stage-final/emergency saves below stay blocking.
                path = save_checkpoint(
                    config.checkpoint_dir, epoch + 1, stage_name,
                    datasets_tag, state,
                    metadata={"stage": stage_name, "epoch": epoch + 1,
                              "loss_config": loss_meta,
                              "init_from": warm_meta,
                              "probe": probe_state.get("last")},
                    block=not config.async_checkpoint,
                )
                logger.alert("checkpoint", path)
                export_npz_snapshot(state)
            if max_steps and summary["steps"] >= max_steps:
                break
            if preempt["flag"]:
                break

        params = state.params  # carry into the next stage
        wait_for_checkpoints()  # flush any in-flight async save
        # Name encodes the epoch actually REACHED plus a run id — not the
        # configured total, which made every preempted rerun of one config
        # clobber the same directory (VERDICT r3 weak #1; reference names
        # encode the reached epoch too, rotinas.py:555-564).
        suffix = "_PREEMPT" if preempt["flag"] else "_final"
        path = save_checkpoint(config.checkpoint_dir, epochs_done,
                               f"{stage_name}{suffix}_{run_id}",
                               datasets_tag, state,
                               metadata={"stage": stage_name,
                                         "epoch": epochs_done,
                                         "loss_config": loss_meta,
                                         "init_from": warm_meta,
                                         "probe": probe_state.get("last"),
                                         "preempted": preempt["flag"]})
        export_npz_snapshot(state)
        summary["stages"].append(
            {"stage": stage_name, "last_loss": last_metrics.get("total"),
             "checkpoint": path})
        if preempt["flag"]:
            summary["preempted"] = True
            logger.alert("preempted — resumable checkpoint saved", path)
            break
        if max_steps and summary["steps"] >= max_steps:
            break

    if prev_handler is not None:
        import signal

        signal.signal(signal.SIGTERM, prev_handler)
    logger.finish()
    summary["params"] = params
    return summary


def make_sampler(config: Config, model: DynamicUNet, params, mesh=None,
                 quantize_uint8: bool = False):
    """One jitted DDIM/DDPM sampler over the [-1,1] pipeline.

    With a multi-device `mesh`, the batch is sharded over the data axis
    (parallel.make_sharded_sampler) — linear sampling-throughput scaling,
    zero communication inside the scan.

    quantize_uint8: emit clip(x·255, 0, 255).astype(uint8) instead of
    [0,1] float — fused into the same jit (one dispatch per batch) and
    bit-identical to quantizing the float output on the host, while the
    D2H transfer shrinks 4× (the measured eval-pipeline bottleneck over
    the tunnel at the 5-NFE production point).
    """
    schedule = linear_beta_schedule(config.beta_1, config.beta_T, config.T)

    # Sample the way the model was trained: unconditionally-trained weights
    # keep cemb zeroed (the reference's effective behavior — its w==1 call
    # hits the forward's context_zero=True default, Diffusion.py:257);
    # conditioning-trained weights (use_conditioning=True) sample with the
    # live cemb. _guided_eps's w==1 path uses this default; w≠1 overrides
    # per-example for the batched CFG mix.
    uncond_default = not config.use_conditioning

    def denoise(x6, t, context_zero=None):
        if context_zero is None:
            context_zero = uncond_default
        return model.apply(params, x6, t, context_zero=context_zero)

    guidance = config.unconditional_guidance_scale

    def sample_fn(cond_u8, rng):
        cond = normalize_uint8(cond_u8)
        if config.sampler == "dpm++2m":
            from ..diffusion import dpm_solver_pp_2m_sample

            out = dpm_solver_pp_2m_sample(denoise, schedule, cond, rng,
                                          steps=config.ddim_step,
                                          guidance_scale=guidance)
        elif config.ddim:
            out = ddim_sample(denoise, schedule, cond, rng,
                              ddim_steps=config.ddim_step,
                              guidance_scale=guidance)
        else:
            out = ddpm_sample(denoise, schedule, cond, rng,
                              guidance_scale=guidance)
        out01 = (out + 1.0) / 2.0  # [0, 1]
        if quantize_uint8:
            return jnp.clip(out01 * 255.0, 0, 255).astype(jnp.uint8)
        return out01

    if mesh is not None and mesh.devices.size > 1:
        from ..parallel import make_sharded_sampler

        return make_sharded_sampler(mesh, sample_fn)
    return jax.jit(sample_fn)


def enhance_image(config: Config, image_path: Optional[str] = None,
                  output_path: Optional[str] = None, params=None):
    """Enhance a single image file end-to-end (CLI: --inference_image).

    Loads → resize to config.img_size → DDIM sample conditioned on it →
    writes <output_path or output/enhanced_<name>>; returns the uint8 RGB
    array.
    """
    from ..data.registry import load_image, resize_image

    setup_cache(config)
    image_path = image_path or config.inference_image
    if not image_path:
        raise ValueError("no image path: set --inference_image")
    model = build_model(Config(**{**config.__dict__, "dropout": 0.0}))
    if params is None:
        params = init_params(config, model)
    sampler = make_sampler(config, model, params)

    img = resize_image(load_image(image_path), config.img_size)
    with timed_block("enhance"):
        out = np.asarray(sampler(jnp.asarray(img[None]),
                                 jax.random.PRNGKey(config.seed)))[0]
    out_u8 = np.clip(out * 255.0, 0, 255).astype(np.uint8)
    if output_path is None:
        os.makedirs(config.output_path, exist_ok=True)
        name = os.path.basename(image_path)
        output_path = os.path.join(config.output_path, f"enhanced_{name}")
    import cv2

    cv2.imwrite(output_path, cv2.cvtColor(out_u8, cv2.COLOR_RGB2BGR))
    print(f"[enhance] wrote {output_path}")
    return out_u8


def evaluate(config: Config, split: str = "test",
             checkpoint_path: Optional[str] = None,
             compute_fid: bool = True,
             save_images: bool = True) -> dict:
    """Metric sweep over one split for both domains (rotinas test/inference).

    Returns {domain: {psnr, ssim, uiqm, uciqe, uism, uicm, uiconm, fid,
    n_images, time_cost}} and writes res.txt per domain.
    """
    from ..metrics import FID, StreamingFID, getUIQM, nmetrics, psnr, ssim_index

    setup_cache(config)
    maybe_initialize()
    # Eval runs with dropout 0 (reference loads the net with dropout=0,
    # rotinas.py:1104-1108).
    eval_cfg = Config(**{**config.__dict__, "dropout": 0.0})
    model = build_model(eval_cfg)
    params = init_params(config, model)
    # Batch-sharded sampling is opt-in (--mesh_data N): every eval batch
    # must then be divisible by the data-axis size.
    mesh = (make_mesh(config.mesh_data, config.mesh_model)
            if config.mesh_data else None)
    fid_model = FID(image_size=config.img_size) if compute_fid else None
    # With FID off, the sampler quantizes to uint8 on device: every
    # downstream consumer (PSNR/SSIM/UIQM/imwrite) starts from exactly
    # clip(x*255).astype(uint8), so results are bit-identical while the
    # D2H fetch — the measured pipeline bottleneck over this tunnel at
    # DPM++2M-5 — shrinks 4×. StreamingFID consumes f32 samples, so the
    # float output is kept when FID is on.
    sampler = make_sampler(config, model, params, mesh=mesh,
                           quantize_uint8=fid_model is None)

    results = {}
    for domain in ("underwater", "atmospheric"):
        loader = _loader(config, domain, split, shuffle=False)
        if len(loader) == 0:
            continue
        stream = StreamingFID(fid_model) if fid_model else None
        sums = dict(psnr=0.0, ssim=0.0, uiqm=0.0, uciqe=0.0, uism=0.0,
                    uicm=0.0, uiconm=0.0, uiqm_nd=0.0)
        n = 0
        t0 = time.time()
        out_dir = os.path.join(config.output_path, "result",
                               _dataset_name(config, domain), split)
        if save_images:
            os.makedirs(out_dir, exist_ok=True)
        rng = jax.random.PRNGKey(config.seed)

        # Pipelined sweep (VERDICT r4 weak #1: the serial H2D → sample →
        # blocking D2H → per-image CPU metrics loop capped the production
        # 5-NFE operating point at ~40% of its compute bound). Three
        # overlaps, results bit-identical to the serial loop:
        #   - host batch assembly + H2D staged 2 batches ahead (uint8);
        #   - the jitted sampler is dispatched ASYNC with up to 2 batches
        #     in flight — batch k's D2H fetch overlaps batch k+1's compute;
        #   - per-image CPU metrics (PSNR/SSIM/UIQM family) and imwrite run
        #     on a worker pool, off the sampling-critical path.
        import collections
        from concurrent.futures import ThreadPoolExecutor

        def staged_batches():
            """Padded batches with the input eagerly device_put 2 ahead."""
            buf: collections.deque = collections.deque()

            def stage(b):
                # Pad a ragged final batch up to batch_size (repeat-edge):
                # one compiled shape for the whole sweep, and the mesh data
                # axis always divides. Padded outputs are sliced off below.
                n_act = b["input"].shape[0]
                inp = b["input"]
                if n_act < config.batch_size:
                    inp = np.concatenate(
                        [inp] + [inp[-1:]] * (config.batch_size - n_act))
                return (jax.device_put(inp), b["gt"], b["name"], n_act)

            for b in loader:
                buf.append(stage(b))
                if len(buf) > 2:
                    yield buf.popleft()
            while buf:
                yield buf.popleft()

        def score_image(gt, img, name):
            row = {"psnr": psnr(gt, img, data_range=255),
                   "ssim": ssim_index(gt, img, data_range=255)}
            # uint8 0-255, matching the reference's nmetrics(res_Imgs)
            # call with [0,255] images (rotinas.py:918-923) — the UIQM
            # family is range-sensitive (metrics/uiqm.py:_to_255).
            (row["uiqm"], row["uciqe"], row["uism"],
             row["uicm"], row["uiconm"]) = nmetrics(img)
            row["uiqm_nd"] = getUIQM(img)
            if save_images:
                import cv2

                cv2.imwrite(os.path.join(out_dir, name),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            return row

        pool = ThreadPoolExecutor(max_workers=2)
        futs: list = []
        inflight: collections.deque = collections.deque()
        fetch_block_s = 0.0

        def drain_one():
            nonlocal fetch_block_s, n
            dev_out, gt, names, n_act = inflight.popleft()
            tb0 = time.time()
            sampled = np.asarray(dev_out)[:n_act]
            fetch_block_s += time.time() - tb0
            if stream is not None:
                stream.update(gt.astype(np.float32) / 255.0, sampled)
            for i in range(sampled.shape[0]):
                img = (sampled[i] if sampled.dtype == np.uint8 else
                       np.clip(sampled[i] * 255.0, 0, 255).astype(np.uint8))
                futs.append(pool.submit(score_image, gt[i], img, names[i]))
                n += 1

        for inp_dev, gt, names, n_act in staged_batches():
            rng, sub = jax.random.split(rng)
            with profile_trace():
                out = sampler(inp_dev, sub)  # async dispatch
            inflight.append((out, gt, names, n_act))
            while len(inflight) >= 2:
                drain_one()
        while inflight:
            drain_one()
        sample_wall = time.time() - t0  # last sampled batch fetched
        for f in futs:
            row = f.result()
            for k, v in row.items():
                sums[k] += v
        pool.shutdown()
        time_cost = time.time() - t0
        res = {k: v / max(n, 1) for k, v in sums.items()}
        res["sample_wall_s"] = sample_wall
        res["fetch_block_s"] = fetch_block_s
        res["fid"] = stream.compute() if (stream and n) else float("nan")
        if fid_model is not None:
            # 1.0 = Inception-weights FID; 0.0 = He-rescaled random-feature
            # FID (self-consistent only — metrics/fid.py module docstring).
            res["fid_pretrained"] = 1.0 if fid_model.pretrained else 0.0
        res["n_images"] = n
        res["time_cost"] = time_cost
        results[domain] = res

        report_dir = os.path.join(config.output_path, "result",
                                  _dataset_name(config, domain))
        os.makedirs(report_dir, exist_ok=True)
        with open(os.path.join(report_dir, "res.txt"), "a") as f:
            f.write(f"split={split} n={n} " + " ".join(
                f"{k}={v:.4f}" for k, v in res.items()
                if isinstance(v, float)) + "\n")
    return results
