"""NAS harness tests: sampler behaviour, pruning, SQLite persistence,
FPS cache, study presets, visualization export."""
import math
import os

import numpy as np
import pytest

from fs_uae_image_enhancer_project_tpu.nas import (
    FPSCache,
    MedianPruner,
    RandomSampler,
    TPESampler,
    TrialPruned,
    create_study,
)
from fs_uae_image_enhancer_project_tpu.nas.search import COMPLETE, FAIL, PRUNED


def _quadratic(trial):
    x = trial.suggest_float("x", -5.0, 5.0)
    y = trial.suggest_float("y", 1e-3, 10.0, log=True)
    c = trial.suggest_categorical("c", ["good", "bad"])
    penalty = 0.0 if c == "good" else 5.0
    return (x - 2.0) ** 2 + (math.log(y) - 0.0) ** 2 + penalty


def test_study_optimize_and_persistence(tmp_path):
    storage = str(tmp_path / "s.sqlite")
    study = create_study("quad", storage, sampler=TPESampler(seed=0))
    study.optimize(_quadratic, n_trials=40, verbose=0)
    assert study.best_value < 2.5
    assert study.best_params["c"] == "good"
    # reload: trials persisted, numbering continues
    study2 = create_study("quad", storage, sampler=TPESampler(seed=1))
    assert len(study2.trials) == 40
    study2.optimize(_quadratic, n_trials=5, verbose=0)
    assert len(study2.trials) == 45
    assert study2.trials[-1].number == 44


def test_tpe_beats_random_on_average(tmp_path):
    def run(sampler, name):
        s = create_study(name, str(tmp_path / f"{name}.sqlite"), sampler=sampler)
        s.optimize(_quadratic, n_trials=60, verbose=0)
        return s.best_value

    tpe = run(TPESampler(seed=3), "tpe")
    rnd = run(RandomSampler(seed=3), "rnd")
    assert tpe <= rnd + 1.0  # TPE should not be meaningfully worse


def test_int_and_step_suggestions(tmp_path):
    study = create_study("ints", str(tmp_path / "i.sqlite"))

    seen = []

    def obj(t):
        k = t.suggest_int("k", 3, 7, step=2)
        seen.append(k)
        return float(k)

    study.optimize(obj, n_trials=20, verbose=0)
    assert set(seen) <= {3, 5, 7}


def test_pruning_and_failed_trial_handling(tmp_path):
    study = create_study("p", str(tmp_path / "p.sqlite"),
                         pruner=MedianPruner(n_startup_trials=2))

    def obj(t):
        v = t.suggest_float("v", 0.0, 1.0)
        t.report(v, 0)
        if t.number == 5:
            raise RuntimeError("boom")
        if t.number == 6:
            return float("inf")
        if t.number >= 3 and t.should_prune():
            raise TrialPruned()
        return v

    study.optimize(obj, n_trials=10, verbose=0)
    states = {t.number: t.state for t in study.trials}
    assert states[5] == FAIL
    assert states[6] == COMPLETE  # the inf trial completes (cleaned below)
    # cleanup of FAIL + non-finite (reference prune_failed_trials.py)
    removed = study.delete_trials()
    assert removed >= 2
    assert all(
        t.state != FAIL and (t.value is None or math.isfinite(t.value))
        for t in study.trials
    )


def test_fps_cache(tmp_path):
    cache = FPSCache(str(tmp_path / "fps.json"))
    calls = []

    def measure():
        calls.append(1)
        return 123.0

    arch = {"layer1_act1": "relu", "ch": 36}
    assert cache.get_or_measure(arch, measure) == 123.0
    assert cache.get_or_measure(arch, measure) == 123.0
    assert len(calls) == 1  # second hit served from cache
    # failure remembered as 0.0
    def boom():
        raise RuntimeError()

    arch2 = {"layer1_act1": "telu"}
    assert cache.get_or_measure(arch2, boom) == 0.0
    assert cache.get_or_measure(arch2, lambda: 55.0) == 0.0
    # persisted across instances
    cache2 = FPSCache(str(tmp_path / "fps.json"))
    assert cache2.get(arch) == 123.0


def test_suggest_conv6_config_presets(tmp_path):
    from fs_uae_image_enhancer_project_tpu.nas.studies import (
        STUDY_PRESETS,
        suggest_conv6_config,
    )
    from fs_uae_image_enhancer_project_tpu.nas.search import Trial

    study = create_study("cfg", str(tmp_path / "c.sqlite"),
                         sampler=RandomSampler(seed=0))
    t = Trial(study, 0)
    preset = STUDY_PRESETS["prune_act_r2"]
    cfg = suggest_conv6_config(
        t,
        searched_slots=preset["searched_slots"],
        activation_choices=preset["activation_choices"],
        param_policy=preset["param_policy"],
        search_layer6_kernel=preset["search_layer6_kernel"],
    )
    assert len(cfg.layers) == 7
    assert cfg.layers[6].out_channels == 3
    assert cfg.layers[5].kernel_size in (3, 5, 7)
    assert "layer1_act1" in t.params
    # r2 searches layer1..6 with layer4 limited to 2 slots and layer7
    # untouched (optuna_study_prune_act_r2.py:162-206): unsearched slots
    # keep the conv6 Model defaults, not identity
    assert "layer4_act3" not in t.params and "layer7_act1" not in t.params
    from fs_uae_image_enhancer_project_tpu.models.conv6 import default_config
    assert cfg.layers[6].acts == default_config().layers[6].acts
    assert cfg.layers[3].acts[2:] == default_config().layers[3].acts[2:]


def test_nas_objective_short_train(tmp_path):
    """One real (tiny) NAS trial: config -> fps cache -> short train -> loss."""
    from PIL import Image

    from fs_uae_image_enhancer_project_tpu.nas.studies import make_objective

    rng = np.random.default_rng(0)
    d = tmp_path / "train" / "img"
    d.mkdir(parents=True)
    base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    Image.fromarray(base).save(d / "target_0_0_s100_r0.png")
    Image.fromarray((base // 32) * 32).save(
        d / "lores_0_0_s100_r0_rgb444_p32_dnone.png"
    )
    from fs_uae_image_enhancer_project_tpu.data import (
        gather_all_samples_from_directory,
    )

    pairs = gather_all_samples_from_directory(str(tmp_path / "train"), (16, 16), verbose=0)
    objective = make_objective(
        searched_slots={1: 2},
        activation_choices=["relu", "identity"],
        train_pairs=pairs,
        val_pairs=pairs,
        crop_size=(16, 16),
        epochs_per_trial=1,
        samples_per_epoch=4,
        batch_size=2,
        fps_cache=FPSCache(str(tmp_path / "fps.json")),
        fps_duration_s=0.2,
    )
    study = create_study("mini", str(tmp_path / "m.sqlite"),
                         sampler=RandomSampler(seed=0))
    study.optimize(objective, n_trials=2, verbose=0)
    assert study.best_trial is not None
    assert math.isfinite(study.best_value)


def test_visualize_exports(tmp_path):
    from fs_uae_image_enhancer_project_tpu.nas.visualize import export_all

    study = create_study("viz", str(tmp_path / "v.sqlite"),
                         sampler=RandomSampler(seed=0))
    study.optimize(_quadratic, n_trials=15, verbose=0)
    paths = export_all(study, str(tmp_path / "plots"))
    assert len(paths) == 2
    for p in paths:
        assert os.path.getsize(p) > 1000


def test_pareto_plot_export(tmp_path):
    from fs_uae_image_enhancer_project_tpu.nas.visualize import plot_pareto

    study = create_study("par", str(tmp_path / "p2.sqlite"),
                         sampler=RandomSampler(seed=0))

    def obj(t):
        v = t.suggest_float("v", 0.0, 1.0)
        t.params["fps_measured"] = 100.0 + 200.0 * (1.0 - v)  # speed/quality tradeoff
        return v

    study.optimize(obj, n_trials=12, verbose=0)
    out = str(tmp_path / "pareto.png")
    plot_pareto(study, out)
    assert os.path.getsize(out) > 1000


def test_fps_cache_backend_scoped_and_retry_env(tmp_path, monkeypatch):
    """Keys embed the measuring backend (a CPU smoke must not seed numbers
    a TPU study would reuse), and FSE_FPS_CACHE_RETRY_FAILED=1 re-measures
    remembered failures (transient tunnel errors must not poison an
    architecture forever)."""
    cache = FPSCache(str(tmp_path / "fps.json"))
    arch = {"ch": 36}
    key_cpu = cache.make_key(arch, backend="cpu")
    key_tpu = cache.make_key(arch, backend="tpu")
    assert key_cpu != key_tpu
    assert '"__backend__"' in key_cpu

    # a remembered failure (0.0) is served by default ...
    def boom():
        raise RuntimeError("wedged tunnel")

    assert cache.get_or_measure(arch, boom) == 0.0
    assert cache.get_or_measure(arch, lambda: 77.0) == 0.0
    # ... but the retry env makes it re-measurable
    monkeypatch.setenv("FSE_FPS_CACHE_RETRY_FAILED", "1")
    assert cache.get_or_measure(arch, lambda: 77.0) == 77.0
    monkeypatch.delenv("FSE_FPS_CACHE_RETRY_FAILED")
    assert cache.get_or_measure(arch, boom) == 77.0  # healthy value sticks


def test_study_all_failed_exits_nonzero(tmp_path, monkeypatch):
    """studies.main must exit nonzero when no trial completed (a fully
    failed unattended run previously looked like success)."""
    from fs_uae_image_enhancer_project_tpu.nas import studies

    def broken_objective_factory(**_kw):
        def objective(trial):
            raise NameError("systematic objective bug")

        return objective

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(studies, "make_objective", broken_objective_factory)
    rc = studies.main([
        "--study", "opt_act", "--trials", "2",
        "--storage", str(tmp_path / "s.sqlite"),
    ])
    assert rc == 1


def test_snap_to_lattice():
    """Step suggestions stay on the {low + k*step} lattice even when the
    span is not a step multiple (low=0 high=5 step=3 must yield {0,3},
    never a high-clamped 5 — Optuna semantics)."""
    from fs_uae_image_enhancer_project_tpu.nas.search import _snap_to_lattice

    assert _snap_to_lattice(4.9, 0, 5, 3) == 3
    assert _snap_to_lattice(-2.0, 0, 5, 3) == 0
    assert _snap_to_lattice(1.4, 0, 5, 3) == 0
    assert _snap_to_lattice(1.6, 0, 5, 3) == 3
    assert _snap_to_lattice(7.0, 3, 7, 2) == 7  # exact-multiple span intact


def test_median_pruner_uses_completed_trials_only():
    """PRUNED trials' intermediates must not enter the median (they would
    self-weaken the pruner), and must not count toward n_startup_trials
    (Optuna MedianPruner semantics: COMPLETE only)."""
    from fs_uae_image_enhancer_project_tpu.nas.search import (
        COMPLETE,
        PRUNED,
        FrozenTrial,
        MedianPruner,
    )

    class _T:
        _intermediate = {0: 5.0}

    pruner = MedianPruner(n_startup_trials=2)
    hist = [
        FrozenTrial(0, COMPLETE, 1.0, {}, {0: 1.0}),
        FrozenTrial(1, COMPLETE, 3.0, {}, {0: 3.0}),
        FrozenTrial(2, PRUNED, None, {}, {0: 100.0}),
        FrozenTrial(3, PRUNED, None, {}, {0: 100.0}),
        FrozenTrial(4, PRUNED, None, {}, {0: 100.0}),
    ]
    # COMPLETE-only median is 3.0 -> 5.0 prunes; folding the PRUNED 100s in
    # would give median 100 -> never prune
    assert pruner.should_prune(_T(), hist) is True
    # startup counts COMPLETE trials only: 1 COMPLETE + 5 PRUNED < 2
    hist2 = [FrozenTrial(0, COMPLETE, 1.0, {}, {0: 1.0})] + [
        FrozenTrial(i, PRUNED, None, {}, {}) for i in range(1, 6)
    ]
    assert pruner.should_prune(_T(), hist2) is False


def test_opt_act_preset_matches_reference_search_space(tmp_path):
    """opt_act searches layers 1/2/4/6/7 with per-parity choice sets
    (optuna_study_opt_act.py:122-150): odd slots saturating, even slots
    rectifiers; layers 3/5 keep the conv6 Model defaults."""
    from fs_uae_image_enhancer_project_tpu.models.conv6 import default_config
    from fs_uae_image_enhancer_project_tpu.nas.search import Trial
    from fs_uae_image_enhancer_project_tpu.nas.studies import (
        OPT_ACT_RECTIFIERS,
        OPT_ACT_SATURATING,
        STUDY_PRESETS,
        suggest_conv6_config,
    )

    study = create_study("optact", str(tmp_path / "o.sqlite"),
                         sampler=RandomSampler(seed=3))
    preset = dict(STUDY_PRESETS["opt_act"])
    for trial_no in range(8):
        t = Trial(study, trial_no)
        cfg = suggest_conv6_config(t, **preset)
        searched = {
            f"layer{li}_act{si}"
            for li, n in {1: 2, 2: 4, 4: 4, 6: 2, 7: 2}.items()
            for si in range(1, n + 1)
        }
        assert searched <= set(t.params)
        extras = set(t.params) - searched
        assert all(
            k.endswith(("_negative_slope", "_num_parameters_choice"))
            for k in extras
        ), extras
        for name in searched:
            si = int(name[-1])
            pool = OPT_ACT_SATURATING if si % 2 else OPT_ACT_RECTIFIERS
            assert t.params[name] in pool, (name, t.params[name])
        # layers 3/5 keep Model defaults (reference passes no kwargs)
        d = default_config().layers
        assert cfg.layers[2].acts == d[2].acts
        assert cfg.layers[4].acts == d[4].acts


def test_config_from_trial_params_replay(tmp_path):
    """A finished trial's recorded params deterministically rebuild the
    exact config it searched (the train-the-winner entry path), including
    first-choice fallbacks for sub-param keys recorded before a
    search-space widening."""
    from fs_uae_image_enhancer_project_tpu.nas.search import (
        RandomSampler, Trial, create_study,
    )
    from fs_uae_image_enhancer_project_tpu.nas.studies import (
        STUDY_PRESETS,
        config_from_trial_params,
        suggest_conv6_config,
    )

    study = create_study("replay", str(tmp_path / "r.sqlite"),
                         sampler=RandomSampler(seed=11))
    preset = dict(STUDY_PRESETS["prune_act_r2"])
    t = Trial(study, 0)
    cfg = suggest_conv6_config(t, **preset)
    assert config_from_trial_params("prune_act_r2", t.params) == cfg

    # pre-widening record: dropping a conditional sub-param key falls back
    # to the first choice instead of KeyError (round-4 sqlite compat)
    legacy = {k: v for k, v in t.params.items()
              if not k.endswith(("_approximate", "_alpha"))}
    cfg2 = config_from_trial_params("prune_act_r2", legacy)
    assert len(cfg2.layers) == 7
