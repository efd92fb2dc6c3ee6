#!/usr/bin/env python3
"""Hardware demo of the widest NAS surface: the prune_act_r2 study
(round-4, VERDICT item 5).

Counterpart run of /root/reference/model/optuna_study_prune_act_r2.py
(:102-159 search space, :383-388 storage): all 20 registry activations
across all 7 conv6 layers, layer-6 kernel size in {3,5,7}, TPE sampling +
median pruning, SQLite persistence, and the shared FPS cache — on the
real lores corpus, on the TPU. Per-trial FPS is measured and cached but
NOT gated (the reference records FPS for pareto analysis and optimizes
training loss only, optuna_study_prune_act_r2.py:384-388; a hard 60 fps
gate would prune every exotic-activation candidate on this slice —
measured 32-45 fps for random draws over the 20-activation surface).

Outputs (committed as artifacts/nas_demo_r2/):
- studies.sqlite               — trial store (reference: tuning_results/)
- model_performance_cache.json — FPS cache (reference keeps the same file)
- prune_act_r2_{history,importances,pareto}.png
- best_trial.json              — summary incl. the cache-hit demonstration

Run on TPU from the repo root:  python scripts/nas_demo_r2.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("NAS_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "nas_demo_r2")
DATA = os.environ.get("NAS_DATA", "/root/work/dataset_lores/train")

N_TRIALS = int(os.environ.get("NAS_TRIALS", "14"))
EPOCHS = int(os.environ.get("NAS_EPOCHS", "5"))
SAMPLES = int(os.environ.get("NAS_SAMPLES", "256"))
MIN_FPS = float(os.environ.get("NAS_MIN_FPS", "0"))  # 0 = no gate (ref parity)
# Optional wall-clock budget (seconds from launch). The study is SQLite-
# resumable (load_if_exists), so a deadline-stopped run is a valid partial
# study: re-running the same command continues adding trials. With a
# deadline the summary/plots are still written (a plain kill would lose
# them); trials_total in the summary says how far the study got.
BUDGET_S = float(os.environ.get("NAS_BUDGET_S", "0"))  # 0 = no budget


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        register_preemptible_pid,
    )

    register_preemptible_pid()  # bench.py may preempt us; run is resumable
    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()



    from fs_uae_image_enhancer_project_tpu.data.dataset import (
        gather_all_samples_from_directory,
        split_pairs,
    )
    from fs_uae_image_enhancer_project_tpu.nas.fps_cache import FPSCache
    from fs_uae_image_enhancer_project_tpu.nas.search import (
        MedianPruner,
        TPESampler,
        create_study,
    )
    from fs_uae_image_enhancer_project_tpu.nas.studies import (
        STUDY_PRESETS,
        make_objective,
    )
    from fs_uae_image_enhancer_project_tpu.nas import visualize

    os.makedirs(OUT, exist_ok=True)
    pairs = gather_all_samples_from_directory(DATA, (376, 288), verbose=1)
    train_pairs, val_pairs = split_pairs(pairs, 0.1)
    print(f"corpus: {len(train_pairs)} train / {len(val_pairs)} val pairs",
          flush=True)

    cache = FPSCache(os.path.join(OUT, "model_performance_cache.json"))
    objective = make_objective(
        train_pairs=train_pairs,
        val_pairs=val_pairs,
        crop_size=(376, 288),
        epochs_per_trial=EPOCHS,
        samples_per_epoch=SAMPLES,
        min_fps=MIN_FPS,  # the PAL-real-time north star as the hard gate
        fps_cache=cache,
        fps_duration_s=3.0,
        **STUDY_PRESETS["prune_act_r2"],
    )
    study = create_study(
        "prune_act_r2", os.path.join(OUT, "studies.sqlite"),
        load_if_exists=True,
        sampler=TPESampler(seed=0),
        pruner=MedianPruner(n_warmup_steps=1),
    )
    import time

    t0 = time.monotonic()
    for _ in range(N_TRIALS):
        if BUDGET_S and time.monotonic() - t0 > BUDGET_S:
            print(f"budget {BUDGET_S:.0f}s reached after "
                  f"{len(study.trials)} total trials; finalizing "
                  "(resume by re-running — SQLite load_if_exists)",
                  flush=True)
            break
        study.optimize(objective, n_trials=1)

    bt = study.best_trial
    assert bt is not None, "no completed trials"
    print(f"best value {bt.value:.6g} (trial {bt.number})", flush=True)

    # FPS-cache hit demonstration: re-query the best trial's architecture
    # through get_or_measure with a sentinel measure fn — a hit returns the
    # stored figure WITHOUT invoking it (reference behaviour:
    # optuna_study_opt_act.py:16-39 model_performance_cache.json).
    from fs_uae_image_enhancer_project_tpu.nas.studies import (
        config_from_trial_params,
    )

    best_cfg = config_from_trial_params("prune_act_r2", bt.params)
    measured = {"count": 0}

    def _sentinel():
        measured["count"] += 1
        return -1.0

    from fs_uae_image_enhancer_project_tpu.models.configs import config_to_json

    hit_fps = cache.get_or_measure(config_to_json(best_cfg), _sentinel)
    cache_hit = measured["count"] == 0 and hit_fps > 0
    print(f"fps-cache replay of best arch: fps={hit_fps:.1f} "
          f"hit={cache_hit} (measure invoked {measured['count']}x)",
          flush=True)

    for fn, name in (
        (visualize.plot_optimization_history, "prune_act_r2_history.png"),
        (visualize.plot_param_importances, "prune_act_r2_importances.png"),
        (visualize.plot_pareto, "prune_act_r2_pareto.png"),
    ):
        fn(study, os.path.join(OUT, name))

    n_complete = sum(1 for t in study.trials if t.is_complete)
    n_pruned = len(study.trials) - n_complete
    summary = {
        "study": "prune_act_r2",
        "trials_total": len(study.trials),
        "trials_complete": n_complete,
        "trials_pruned_or_failed": n_pruned,
        "epochs_per_trial": EPOCHS,
        "samples_per_epoch": SAMPLES,
        "crop_size": [376, 288],
        "min_fps_gate": MIN_FPS,
        "best_trial": {
            "number": bt.number,
            "value": bt.value,
            "params": bt.params,
        },
        "fps_cache_hit_on_best_arch": {
            "fps": hit_fps,
            "hit": bool(cache_hit),
            "measure_invocations": measured["count"],
        },
    }
    with open(os.path.join(OUT, "best_trial.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
