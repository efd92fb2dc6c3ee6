"""The activation-search NAS studies.

Re-creations of the reference's three Optuna studies over the conv6 model
(the NAS target, reconstructed in models/conv6.py):

- ``opt_act``       — activations for layers 1/2/4/6/7 with conditional
                      sub-params (optuna_study_opt_act.py:122-165),
- ``prune_act``     — wider activation sets across all layers + batch size
                      (optuna_study_prune_act.py:122-165),
- ``prune_act_r2``  — all 20 registry activations, act-specific param
                      suggestion, layer-6 kernel in {3,5,7}, FPS measured
                      after training (optuna_study_prune_act_r2.py:102-159).

Each trial: resolve config -> FPS from cache or measured with the shared
profiler -> short training run with per-epoch reports -> median pruning ->
best validation loss (inf on NaN, optuna_study_prune_act.py:321-323).
"""
from __future__ import annotations

import math
import sys
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..models.configs import Conv6Config, ConvLayerSpec, act
from .fps_cache import FPSCache
from .search import MedianPruner, Study, TrialPruned, TPESampler, create_study

# the full registry surface (optuna_study_prune_act_r2.py:127-132)
ALL_ACTIVATIONS = [
    "identity", "elu", "gelu", "leaky_relu", "mish", "prelu",
    "relu", "relu6", "sigmoid", "silu", "swish", "softplus",
    "tanh", "log_softmax", "softmax", "scaled_tanh", "telu",
    "sinlu", "biased_relu", "biased_prelu",
]

# reduced set used by the first-round studies
CORE_ACTIVATIONS = [
    "identity", "relu", "relu6", "leaky_relu", "mish", "prelu",
    "silu", "tanh", "telu",
]

# act slots per conv6 layer (matching the pix_shuffle/conv6 topology)
LAYER_SLOTS = {1: 2, 2: 4, 3: 2, 4: 4, 5: 2, 6: 2, 7: 2}


def suggest_activation_params(
    trial, prefix: str, act_name: str, out_channels: int
) -> Dict[str, Any]:
    """Conditional activation sub-params
    (optuna_study_prune_act_r2.py:135-159)."""
    params: Dict[str, Any] = {}
    if act_name == "leaky_relu":
        params["negative_slope"] = trial.suggest_float(
            f"{prefix}_negative_slope", 0.001, 0.5, log=True
        )
    elif act_name == "prelu":
        choice = trial.suggest_categorical(
            f"{prefix}_num_parameters_choice", ["global", "per_channel"]
        )
        params["num_parameters"] = 1 if choice == "global" else out_channels
    elif act_name == "elu":
        params["alpha"] = trial.suggest_float(f"{prefix}_alpha", 0.1, 2.0)
    elif act_name in ("log_softmax", "softmax"):
        params["axis"] = -1  # channel axis in NHWC
    return params


def suggest_conv6_config(
    trial,
    *,
    activation_choices: Sequence[str],
    layers_to_search: Sequence[int] = (1, 2, 3, 4, 5, 6, 7),
    search_layer6_kernel: bool = False,
    channels: int = 36,
) -> Conv6Config:
    """Build a Conv6Config from trial suggestions."""
    layer_specs: List[ConvLayerSpec] = []
    for li in range(1, 8):
        out_ch = 3 if li == 7 else channels
        n_slots = LAYER_SLOTS[li]
        acts = []
        for si in range(1, n_slots + 1):
            prefix = f"layer{li}_act{si}"
            if li in layers_to_search:
                name = trial.suggest_categorical(prefix, list(activation_choices))
                cfg = suggest_activation_params(trial, prefix, name, out_ch)
            else:
                name, cfg = "identity", {}
            acts.append(act(name, **cfg))
        ks = 3
        if li == 6 and search_layer6_kernel:
            ks = trial.suggest_int("layer6_kernel_size", 3, 7, step=2)
        layer_specs.append(ConvLayerSpec(out_ch, ks, tuple(acts)))
    return Conv6Config(layers=tuple(layer_specs))


def measure_fps(
    cfg: Conv6Config,
    *,
    height: int = 576,
    width: int = 752,
    duration_s: float = 3.0,
    compute_dtype="bfloat16",
) -> float:
    """Chained-timing FPS of the candidate at the deployment shape
    (reference protocol: model_pix_shuffle.py:348-368, honest-sync variant)."""
    import jax
    import jax.numpy as jnp

    from ..models import conv6 as conv6_mod
    from ..utils.profiler import measure_chained

    params = conv6_mod.init(jax.random.key(0), cfg)
    fwd = jax.jit(lambda x: conv6_mod.apply(params, x, cfg))
    x = jnp.zeros((1, height, width, 3), jnp.dtype(compute_dtype))
    res = measure_chained(fwd, x, warmup=3, duration_s=duration_s, chunk=10)
    return res.fps


def make_objective(
    *,
    activation_choices: Sequence[str],
    layers_to_search: Sequence[int],
    search_layer6_kernel: bool = False,
    train_pairs=None,
    val_pairs=None,
    crop_size=(128, 96),
    epochs_per_trial: int = 3,
    samples_per_epoch: int = 64,
    batch_size: int = 16,
    search_batch_size: bool = False,
    min_fps: float = 0.0,
    fps_cache: Optional[FPSCache] = None,
    fps_duration_s: float = 3.0,
):
    """Build the study objective: config -> FPS gate -> short train -> loss."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..data.dataset import SRDataset, batch_transform
    from ..losses.functional import l1_loss
    from ..models import conv6 as conv6_mod
    from ..parallel.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cache = fps_cache or FPSCache()

    def objective(trial) -> float:
        cfg = suggest_conv6_config(
            trial,
            activation_choices=activation_choices,
            layers_to_search=layers_to_search,
            search_layer6_kernel=search_layer6_kernel,
        )
        lr = trial.suggest_float("learning_rate", 1e-5, 1e-3, log=True)
        bs = batch_size
        if search_batch_size:
            bs = trial.suggest_categorical("batch_size", [16, 32])

        arch_key = {"config": dataclasses.asdict(cfg)}
        fps = cache.get_or_measure(
            arch_key, lambda: measure_fps(cfg, duration_s=fps_duration_s)
        )
        trial.params["fps_measured"] = fps  # recorded for pareto plots
        if min_fps and fps < min_fps:
            raise TrialPruned()

        if train_pairs is None:
            # FPS-only mode (no dataset supplied)
            return -fps

        params = conv6_mod.init(jax.random.key(trial.number), cfg)
        optimizer = make_optimizer(lr=lr)
        state = init_train_state(params, optimizer)
        # uint8 batch transfer + on-device decode: through the tunnel the
        # PJRT client retains ~1 GB host RSS per GB device_put forever
        # (docs/PERF.md "Tunnel transfer retention") — a multi-trial study
        # with fp32 batches would throttle; bytes-on-the-link is also just
        # the right TPU shape (move bytes, not floats)
        tf = batch_transform(linear=True)
        step = jax.jit(
            make_train_step(
                lambda p, x: conv6_mod.apply(p, x, cfg),
                lambda o, t: l1_loss(o, t),
                optimizer,
                input_transform=tf,
            ),
            donate_argnums=(0,),
        )

        @jax.jit
        def eval_loss(p, lr_b, hr_b):
            y = conv6_mod.apply(p, tf(lr_b).astype(jnp.bfloat16), cfg)
            return l1_loss(y.astype(jnp.float32), tf(hr_b).astype(jnp.float32))

        best_val = float("inf")
        for epoch in range(epochs_per_trial):
            ds = SRDataset(
                train_pairs, crop_size, samples_per_epoch, batch_size=bs,
                seed=trial.number * 100 + epoch, transfer_dtype="uint8",
            )
            loss = None
            for lr_b, hr_b in ds:
                state, loss = step(
                    state, jnp.asarray(lr_b)[None], jnp.asarray(hr_b)[None]
                )
            # NaN-abort check once per epoch, not per step: float(loss)
            # blocks async dispatch on a full tunnel RTT (~150-350 ms), and
            # a NaN reached mid-epoch persists in the loss value anyway
            # (it propagates through every later step's params)
            if loss is not None and not math.isfinite(float(loss)):
                return float("inf")
            vds = SRDataset(
                val_pairs or train_pairs, crop_size, max(bs, 16),
                batch_size=bs, seed=1, flips=False, transfer_dtype="uint8",
            )
            vals = [
                float(eval_loss(state.params, jnp.asarray(a), jnp.asarray(b)))
                for a, b in vds
            ]
            val = float(np.mean(vals)) if vals else float("inf")
            best_val = min(best_val, val)
            trial.report(val, epoch)
            if trial.should_prune():
                raise TrialPruned()
        return best_val if math.isfinite(best_val) else float("inf")

    return objective


STUDY_PRESETS = {
    # layers 1/2/4/6/7 searched, conditional sub-params (opt_act.py:122-165)
    "opt_act": dict(
        activation_choices=CORE_ACTIVATIONS, layers_to_search=(1, 2, 4, 6, 7)
    ),
    # all 7 layers, wider sets + batch size (prune_act.py:122-165)
    "prune_act": dict(
        activation_choices=CORE_ACTIVATIONS,
        layers_to_search=(1, 2, 3, 4, 5, 6, 7),
        search_batch_size=True,
    ),
    # all 20 registry activations + layer6 kernel (prune_act_r2.py:102-159)
    "prune_act_r2": dict(
        activation_choices=ALL_ACTIVATIONS,
        layers_to_search=(1, 2, 3, 4, 5, 6, 7),
        search_layer6_kernel=True,
    ),
}


def main(argv=None) -> int:
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import argparse

    ap = argparse.ArgumentParser(description="Run a NAS activation study")
    ap.add_argument("--study", choices=sorted(STUDY_PRESETS), required=True)
    ap.add_argument("--storage", default="tuning_results/studies.sqlite")
    ap.add_argument("--trials", type=int, default=35)
    ap.add_argument("--generator_train_dir", default=None)
    ap.add_argument("--crop_size", type=int, nargs=2, default=[128, 96])
    ap.add_argument("--epochs_per_trial", type=int, default=3)
    ap.add_argument("--samples_per_epoch", type=int, default=64)
    ap.add_argument("--min_fps", type=float, default=0.0)
    ap.add_argument("--fps_duration", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--pruning_warmup_steps", type=int, default=0,
        help="MedianPruner warmup epochs (reference optuna_study_opt_act.sh flag)",
    )
    args = ap.parse_args(argv)

    train_pairs = val_pairs = None
    if args.generator_train_dir:
        from ..data.dataset import gather_all_samples_from_directory, split_pairs

        pairs = gather_all_samples_from_directory(
            args.generator_train_dir, tuple(args.crop_size), verbose=1
        )
        train_pairs, val_pairs = split_pairs(pairs, 0.1)

    preset = dict(STUDY_PRESETS[args.study])
    objective = make_objective(
        train_pairs=train_pairs,
        val_pairs=val_pairs,
        crop_size=tuple(args.crop_size),
        epochs_per_trial=args.epochs_per_trial,
        samples_per_epoch=args.samples_per_epoch,
        min_fps=args.min_fps,
        fps_duration_s=args.fps_duration,
        **preset,
    )
    study = create_study(
        args.study, args.storage, load_if_exists=True,
        sampler=TPESampler(seed=args.seed),
        pruner=MedianPruner(n_warmup_steps=args.pruning_warmup_steps),
    )
    study.optimize(objective, n_trials=args.trials)
    bt = study.best_trial
    if bt:
        print(f"best value {bt.value:.6g} with params:")
        for k, v in sorted(bt.params.items()):
            print(f"  {k} = {v}")
        return 0
    # optimize() converts objective exceptions into FAIL rows so an
    # unattended hardware study survives transient trial failures — but a
    # study that produced NO usable trial must not look like success
    states = [t.state for t in study.trials]
    print(f"ERROR: no completed trial in study {args.study!r} "
          f"(states: { {s: states.count(s) for s in set(states)} }); "
          "see FAIL tracebacks above", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
