"""The training loop.

Counterpart of reference ``model/train.py``: epoch loop with bf16-mixed
forward (the TPU analogue of AMP fp16 + GradScaler — bf16 needs no loss
scaling), gradient accumulation, validation, CSV-based resume
(train.py:86-114), best/interval checkpointing (train.py:229-251), early
stopping by patience (train.py:253-255), per-epoch sample-frame rendering
(inference_on_directory, train.py:33-76), and per-epoch metrics logging
(JSONL in place of TensorBoard scalars — no tensorboard in this image).

Checkpoints are orbax (params + buffers + opt_state) — the optimizer state
IS saved (an upgrade over the reference, which reconstructs lr from the CSV);
the CSV remains the human-readable history and the resume source of truth
for epoch/patience bookkeeping.
"""
from __future__ import annotations

import csv
import dataclasses
import gc
import glob
import json
import os
import time
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SRDataset, device_prefetch
from ..models import ModelDef
from ..losses.perceptual import build_criterion
from ..parallel.train_step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    merge_bn_buffers,
)

CSV_HEADER = [
    "Epoch", "Train Loss", "Validation Loss", "EpochsNoImprove",
    "LearningRate", "Checkpoint Path",
]


def save_training_stats(
    csv_file: str, epoch: int, train_loss: float, val_loss: float,
    epochs_no_improve: int, learning_rate: float, checkpoint_path: str,
) -> None:
    """Append one row (reference train.py:78-84, same column set)."""
    exists = os.path.isfile(csv_file)
    with open(csv_file, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(CSV_HEADER)
        w.writerow(
            [epoch, train_loss, val_loss, epochs_no_improve, learning_rate,
             checkpoint_path]
        )


def load_last_epoch_and_checkpoint(
    lr: float, csv_file: str
) -> Tuple[int, float, int, int, float, Optional[str]]:
    """(last_epoch, best_val, best_epoch, no_improve, lr, ckpt_path) from the
    stats CSV (reference train.py:86-114)."""
    if not os.path.isfile(csv_file):
        return 0, float("inf"), 0, 0, lr, None
    with open(csv_file) as f:
        rows = list(csv.reader(f))[1:]
    if not rows:
        return 0, float("inf"), 0, 0, lr, None
    best_val, best_epoch = float("inf"), 0
    for row in rows:
        v, e = float(row[2]), int(row[0])
        if v < best_val:
            best_val, best_epoch = v, e
    last = rows[-1]
    return (
        int(last[0]), best_val, best_epoch, int(last[3]), float(last[4]), last[5]
    )


# ---------------------------------------------------------------------------
# checkpoint I/O (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step, "params": state.params,
        "buffers": state.buffers or {"__empty__": jnp.zeros((1,))},
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, params_template):
    """Restore only the parameter pytree from a trainer checkpoint.

    Use when the optimizer state is irrelevant (export, inference): the
    opt_state pytree structure depends on the lr schedule the run used, so a
    full-state template from a differently-configured optimizer would not
    match.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # Restore the raw saved tree (opt_state structure is run-dependent, so no
    # full-state template exists here), but rebuild each leaf as an abstract
    # array placed on a LOCAL device: a targetless restore would replay the
    # sharding metadata saved with the checkpoint, which fails when the
    # checkpoint was written on another platform (TPU-trained -> CPU export).
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        ckptr.metadata(os.path.abspath(path)).item_metadata,
    )
    restored = ckptr.restore(os.path.abspath(path), target=abstract)
    params = restored["params"]
    # BN models (conv3/conv5) are saved split: running stats live in the
    # 'buffers' subtree (save_checkpoint above). A full-model template (from
    # m.init) expects them merged back, so fold real buffers in; the
    # {'__empty__': ...} sentinel marks a buffer-free model.
    buffers = restored.get("buffers") or {}
    if buffers and "__empty__" not in buffers:
        from ..parallel.train_step import merge_bn_buffers

        params = merge_bn_buffers(params, buffers)
    # cast leaves onto the template's dtypes/devices
    import jax.numpy as jnp

    return jax.tree.map(
        lambda t, v: jnp.asarray(v, dtype=t.dtype), params_template, params
    )


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": template.step, "params": template.params,
        "buffers": template.buffers or {"__empty__": jnp.zeros((1,))},
        "opt_state": template.opt_state,
    }
    restored = ckptr.restore(path, target=payload)
    buffers = restored["buffers"]
    if "__empty__" in buffers:
        buffers = {}
    return TrainState(
        restored["step"], restored["params"], buffers, restored["opt_state"]
    )


# ---------------------------------------------------------------------------
# sample-frame rendering (reference inference_on_directory, train.py:33-76)
# ---------------------------------------------------------------------------

def make_render_fn(model_apply: Callable, linear_io: bool = True):
    """Jitted sample-render forward; build ONCE per model and reuse across
    epochs (a fresh closure every call would defeat jax.jit's cache and
    recompile each improving epoch)."""

    @jax.jit
    def fwd(p, x):
        if linear_io:
            x = x**2.2
        y = model_apply(p, x)
        if linear_io:
            y = jnp.clip(y, 0.0, None) ** (1 / 2.2)
        return jnp.clip(y, 0.0, 1.0)

    return fwd


def inference_on_directory(
    model_apply: Callable, params, input_dir: str, output_dir: str,
    *, linear_io: bool = True, render_fn: Optional[Callable] = None,
) -> float:
    """Enhance every PNG in input_dir, save to output_dir; returns avg
    seconds per image."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(input_dir, "*.png")))
    if not paths:
        return 0.0

    fwd = render_fn if render_fn is not None else make_render_fn(
        model_apply, linear_io
    )

    t0 = time.time()
    for path in paths:
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        out = np.asarray(fwd(params, jnp.asarray(img)[None])[0])
        Image.fromarray((out * 255.0).astype(np.uint8)).save(
            os.path.join(output_dir, os.path.basename(path))
        )
    return (time.time() - t0) / len(paths)


def dump_internal_activations(
    model: ModelDef, params, samples_dir: str, out_dir: str, epoch: int,
) -> None:
    """Save per-layer activation images for the first sample frame.

    Counterpart of the reference's ``model.save`` internal dumps
    (train.py:278-301): each captured tensor is channel-averaged, min-max
    normalized and saved as ``epoch_<n>_basic_<tag>.png``."""
    from PIL import Image

    if model.name != "pix_shuffle":
        return
    from ..models import pix_shuffle as ps

    paths = sorted(glob.glob(os.path.join(samples_dir, "*.png")))
    if not paths:
        return
    img = np.asarray(Image.open(paths[0]).convert("RGB"), np.float32) / 255.0
    x = jnp.asarray(img**2.2)[None]
    _y, captured = ps.apply_with_intermediates(params, x, model.config)
    for tag, t in captured.items():
        a = np.asarray(t[0], np.float32).mean(axis=-1)  # channel average
        a = (a - a.min()) / (a.max() - a.min() + 1e-8)
        Image.fromarray((a * 255).astype(np.uint8), mode="L").save(
            os.path.join(out_dir, f"epoch_{epoch}_basic_{tag}.png")
        )


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainerConfig:
    num_epochs: int = 10
    lr: float = 1e-3
    weight_decay: float = 1e-5
    lr_decay_rate: float = 0.955  # per-epoch ExponentialLR gamma
    batch_size: int = 1
    accumulation_steps: int = 16
    checkpoint_interval: int = 5
    early_stopping_patience: int = 10
    checkpoint_dir: str = "."
    samples_dir: Optional[str] = None  # per-epoch rendering source
    inference_always: bool = False
    dump_internals: bool = False  # save per-layer activation images
    compute_dtype: str = "bfloat16"
    mesh: Optional[object] = None  # optional jax.sharding.Mesh
    verbose: int = 1
    # Sync with the device every K optimizer steps (bounded dispatch
    # runahead), not every step: fetching the loss scalar per step costs a
    # full tunnel round trip (~150-350 ms) PER STEP — measured 234 ms/step
    # on train_psh_long where device work is a fraction of that. Losses
    # stay on device and are fetched in ONE stacked transfer per epoch.
    loss_sync_steps: int = 8


class Trainer:
    def __init__(self, model: ModelDef, cfg: TrainerConfig, vgg_params=None):
        self.model = model
        self.cfg = cfg
        self.criterion = build_criterion(model.loss, vgg_params)
        self.has_bn = model.name in ("conv3", "conv5")
        self.stats_file = os.path.join(
            cfg.checkpoint_dir, f"training_stats_{model.name}.csv"
        )
        self.metrics_file = os.path.join(
            cfg.checkpoint_dir, f"metrics_{model.name}.jsonl"
        )
        self._render_fn = make_render_fn(model.apply, model.linear_io)

    def _log(self, msg: str) -> None:
        if self.cfg.verbose:
            print(msg, flush=True)

    def _log_metrics(self, **kv) -> None:
        os.makedirs(self.cfg.checkpoint_dir, exist_ok=True)
        with open(self.metrics_file, "a") as f:
            f.write(json.dumps(kv) + "\n")

    def train(
        self,
        train_ds: SRDataset,
        val_ds: Optional[SRDataset],
        *,
        state: Optional[TrainState] = None,
    ) -> Tuple[float, int, float]:
        cfg = self.cfg
        m = self.model
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)

        # ceil: the tail flush (train.py:190-193) is a real optimizer step
        steps_per_epoch = max(
            -(-len(train_ds) // cfg.accumulation_steps), 1
        )
        (start_epoch, best_val, best_epoch, no_improve, lr0, ckpt_path) = (
            load_last_epoch_and_checkpoint(cfg.lr, self.stats_file)
        )
        self._log(
            f"Starting from epoch {start_epoch + 1}, best val {best_val:.4f}, "
            f"patience used {no_improve}, lr {lr0}"
        )
        # Resume semantics match the reference (train.py:138-143): the
        # optimizer restarts from the CSV's last learning rate and the
        # exponential decay continues from there.
        optimizer = make_optimizer(
            lr=lr0, weight_decay=cfg.weight_decay,
            lr_decay_rate=cfg.lr_decay_rate, steps_per_epoch=steps_per_epoch,
        )

        if state is None:
            params = m.init(jax.random.key(0))
            state = init_train_state(params, optimizer, has_batchnorm=self.has_bn)
            if ckpt_path and not os.path.isdir(ckpt_path):
                # the CSV says we are resuming from this checkpoint; silently
                # continuing from RANDOM weights while comparing against the
                # CSV's best_val would waste the whole run (best checkpoint
                # never updated). Missing path = deleted checkpoints or a
                # cwd-relative path from another directory — fail loudly.
                raise FileNotFoundError(
                    f"resume checkpoint from {self.stats_file} not found: "
                    f"{ckpt_path!r} (relative paths resolve against the "
                    "current working directory)"
                )
            if ckpt_path and os.path.isdir(ckpt_path):
                # reference resume semantics (train.py:86-148): model weights
                # from the checkpoint, lr from the CSV, FRESH optimizer state
                # — restoring the schedule count too would double-apply the
                # decay already baked into lr0
                restored = load_checkpoint(ckpt_path, state)
                state = init_train_state(
                    merge_bn_buffers(restored.params, restored.buffers),
                    optimizer, has_batchnorm=self.has_bn,
                )
                self._log(f"Loaded checkpoint weights: {ckpt_path}")

        batch_put = eval_put = jnp.asarray
        if cfg.mesh is not None:
            from ..parallel.mesh import (
                accum_batch_sharding, batch_sharding, replicate,
            )

            state = replicate(cfg.mesh, state)
            bspec = accum_batch_sharding(cfg.mesh)
            espec = batch_sharding(cfg.mesh)

            def batch_put(x):  # noqa: F811 — mesh path override
                return jax.device_put(jnp.asarray(x), bspec)

            def eval_put(x):  # noqa: F811
                return jax.device_put(jnp.asarray(x), espec)

        # uint8-transfer batches (SRDataset transfer_dtype="uint8") are
        # normalized/linearized on device; trace-time no-op for fp32 batches.
        from ..data.dataset import batch_transform

        to_float = batch_transform(m.linear_io)

        train_step = jax.jit(
            make_train_step(
                m.apply, self.criterion, optimizer,
                has_batchnorm=self.has_bn,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
                mesh=cfg.mesh,
                input_transform=to_float,
            ),
            donate_argnums=(0,),
        )

        @jax.jit
        def eval_loss(params, buffers, lr_b, hr_b):
            full = merge_bn_buffers(params, buffers)
            lr_b, hr_b = to_float(lr_b), to_float(hr_b)
            x = lr_b.astype(jnp.dtype(cfg.compute_dtype))
            y = m.apply(full, x)  # inference mode: running BN stats
            return self.criterion(y.astype(jnp.float32), hr_b)

        avg_inference_time = 0.0
        for epoch in range(start_epoch + 1, cfg.num_epochs + 1):
            t_epoch = time.time()
            # ---- train ----
            # losses stay ON DEVICE until the epoch ends: a float() per step
            # is a tunnel round trip per step (see loss_sync_steps). A
            # block_until_ready every K steps bounds dispatch runahead (and
            # with it HBM held by in-flight batches) without serializing.
            losses: List = []
            accum_lr, accum_hr = [], []
            for lr_b, hr_b in device_prefetch(iter(train_ds)):
                accum_lr.append(lr_b)
                accum_hr.append(hr_b)
                if len(accum_lr) < cfg.accumulation_steps:
                    continue
                lrs = batch_put(jnp.stack(accum_lr))
                hrs = batch_put(jnp.stack(accum_hr))
                accum_lr, accum_hr = [], []
                state, loss = train_step(state, lrs, hrs)
                losses.append(loss)
                if len(losses) % max(cfg.loss_sync_steps, 1) == 0:
                    loss.block_until_ready()
            if accum_lr:  # tail flush (train.py:190-193)
                state, loss = train_step(
                    state,
                    batch_put(jnp.stack(accum_lr)),
                    batch_put(jnp.stack(accum_hr)),
                )
                losses.append(loss)
            # one stacked device->host transfer for the whole epoch
            train_loss = (
                float(np.mean(np.asarray(jnp.stack(losses), np.float32)))
                if losses else float("nan")
            )

            # ---- validate ----
            val_losses: List = []
            if val_ds is not None and val_ds.pool:
                for lr_b, hr_b in iter(val_ds):
                    val_losses.append(
                        eval_loss(
                            state.params, state.buffers,
                            eval_put(lr_b), eval_put(hr_b),
                        )
                    )
                    if len(val_losses) % max(cfg.loss_sync_steps, 1) == 0:
                        val_losses[-1].block_until_ready()
            val_loss = (
                float(np.mean(np.asarray(jnp.stack(val_losses), np.float32)))
                if val_losses else train_loss
            )

            current_lr = lr0 * (cfg.lr_decay_rate ** (epoch - start_epoch))
            new_best = val_loss < best_val
            apply_inference = cfg.inference_always or new_best
            if new_best:
                best_val, best_epoch, no_improve = val_loss, epoch, 0
                ckpt_path = os.path.join(
                    cfg.checkpoint_dir, f"checkpoint_best_{m.name}"
                )
                save_checkpoint(ckpt_path, state)
                self._log("New best model saved.")
            else:
                no_improve += 1

            if (
                epoch % cfg.checkpoint_interval == 0
                or new_best
                or no_improve > cfg.early_stopping_patience
                or epoch == cfg.num_epochs
            ):
                epoch_ckpt = os.path.join(
                    cfg.checkpoint_dir, f"checkpoint_epoch_{epoch}_{m.name}"
                )
                save_checkpoint(epoch_ckpt, state)
                save_training_stats(
                    self.stats_file, epoch, train_loss, val_loss, no_improve,
                    current_lr, epoch_ckpt,
                )

            self._log_metrics(
                epoch=epoch, train_loss=train_loss, val_loss=val_loss,
                lr=current_lr, seconds=round(time.time() - t_epoch, 2),
            )
            self._log(
                f"Epoch [{epoch}/{cfg.num_epochs}] Train {train_loss:.4f} "
                f"Val {val_loss:.4f} Patience "
                f"{cfg.early_stopping_patience - no_improve} LR {current_lr:.6f}"
            )

            if no_improve > cfg.early_stopping_patience:
                self._log("Early stopping triggered.")
                break

            if apply_inference and cfg.samples_dir:
                full_params = merge_bn_buffers(state.params, state.buffers)
                avg_inference_time = inference_on_directory(
                    m.apply, full_params, cfg.samples_dir,
                    os.path.join(cfg.checkpoint_dir, "predicted"),
                    linear_io=m.linear_io, render_fn=self._render_fn,
                )
                self._log(
                    f"Rendered samples; {avg_inference_time:.4f}s per image"
                )
                if cfg.dump_internals:
                    dump_internal_activations(
                        m, full_params, cfg.samples_dir,
                        cfg.checkpoint_dir, epoch,
                    )

            # Long runs through the remote-TPU tunnel accumulate host-side
            # transfer buffers (observed ~1.7 GB/min RSS growth at fp32
            # 376x288 batches); an epoch-boundary collect frees any
            # cycle-held jax arrays cheaply. The structural fix is uint8
            # transfer (SRDataset transfer_dtype="uint8").
            gc.collect()

        return best_val, best_epoch, avg_inference_time
