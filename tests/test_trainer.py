"""Trainer tests: end-to-end tiny training run, CSV resume semantics,
checkpoint round trip, sample rendering."""
import os

import numpy as np
import pytest
from PIL import Image

import jax

from fs_uae_image_enhancer_project_tpu.data import (
    SRDataset,
    gather_all_samples_from_directory,
    split_pairs,
)
from fs_uae_image_enhancer_project_tpu.models import get_model
from fs_uae_image_enhancer_project_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
)
from fs_uae_image_enhancer_project_tpu.train.trainer import (
    Trainer,
    TrainerConfig,
    load_checkpoint,
    load_last_epoch_and_checkpoint,
    save_checkpoint,
    save_training_stats,
)


@pytest.fixture
def tiny_dataset(tmp_path):
    """A 2-location generated tree with 16x16 crops."""
    rng = np.random.default_rng(0)
    d = tmp_path / "train" / "img1"
    d.mkdir(parents=True)
    for loc in ((0, 0), (8, 8)):
        base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(base).save(
            d / f"target_{loc[0]}_{loc[1]}_s100_r0.png"
        )
        degraded = (base // 32) * 32
        Image.fromarray(degraded).save(
            d / f"lores_{loc[0]}_{loc[1]}_s100_r0_rgb444_p32_dnone.png"
        )
    return str(tmp_path / "train")


def test_csv_resume_roundtrip(tmp_path):
    csv_file = str(tmp_path / "training_stats_x.csv")
    assert load_last_epoch_and_checkpoint(0.01, csv_file) == (
        0, float("inf"), 0, 0, 0.01, None,
    )
    save_training_stats(csv_file, 1, 0.5, 0.4, 0, 0.001, "ckpt1")
    save_training_stats(csv_file, 2, 0.45, 0.42, 1, 0.00095, "ckpt2")
    last, best, best_ep, ni, lr, path = load_last_epoch_and_checkpoint(0.01, csv_file)
    assert last == 2 and best == 0.4 and best_ep == 1
    assert ni == 1 and lr == 0.00095 and path == "ckpt2"


def test_checkpoint_roundtrip(tmp_path):
    m = get_model("pix_shuffle")
    params = m.init(jax.random.key(0))
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(params, opt)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    template = init_train_state(m.init(jax.random.key(1)), opt)
    restored = load_checkpoint(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["conv1"]["w"]),
        np.asarray(state.params["conv1"]["w"]),
    )
    assert restored.buffers == {}


def test_trainer_end_to_end_and_resume(tiny_dataset, tmp_path):
    m = get_model("pix_shuffle")
    import dataclasses
    m = m._replace(loss=dataclasses.replace(m.loss, vgg_weight=0.0))
    pairs = gather_all_samples_from_directory(tiny_dataset, (16, 16), verbose=0)
    assert len(pairs) == 2
    train_pool, val_pool = split_pairs(pairs, 0.5)
    samples_dir = str(tmp_path / "samples")
    os.makedirs(samples_dir)
    Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    ).save(os.path.join(samples_dir, "s0.png"))

    ckpt_dir = str(tmp_path / "ckpts")
    cfg = TrainerConfig(
        num_epochs=2, lr=1e-3, batch_size=2, accumulation_steps=2,
        checkpoint_interval=1, checkpoint_dir=ckpt_dir,
        samples_dir=samples_dir, verbose=0,
    )
    tr = Trainer(m, cfg)
    train_ds = SRDataset(train_pool, (16, 16), num_samples=8, batch_size=2)
    val_ds = SRDataset(val_pool, (16, 16), num_samples=4, batch_size=2, flips=False)
    best_val, best_epoch, _ = tr.train(train_ds, val_ds)
    assert np.isfinite(best_val) and best_epoch >= 1
    assert os.path.isfile(os.path.join(ckpt_dir, "training_stats_pix_shuffle.csv"))
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint_best_pix_shuffle"))
    assert os.path.isfile(os.path.join(ckpt_dir, "predicted", "s0.png"))

    # resume: epoch counter continues from the CSV, no retraining of epoch<=2
    cfg3 = dataclasses.replace(cfg, num_epochs=3)
    tr2 = Trainer(m, cfg3)
    best_val2, _, _ = tr2.train(train_ds, val_ds)
    import csv as csvmod

    with open(os.path.join(ckpt_dir, "training_stats_pix_shuffle.csv")) as f:
        rows = list(csvmod.reader(f))[1:]
    epochs = [int(r[0]) for r in rows]
    assert max(epochs) == 3
    assert sorted(set(epochs)) == epochs  # no duplicate epoch rows


def test_trainer_batchnorm_model(tiny_dataset, tmp_path):
    import dataclasses
    m = get_model("conv3")
    m = m._replace(loss=dataclasses.replace(m.loss, vgg_weight=0.0))
    pairs = gather_all_samples_from_directory(tiny_dataset, (16, 16), verbose=0)
    cfg = TrainerConfig(
        num_epochs=1, batch_size=1, accumulation_steps=2,
        checkpoint_dir=str(tmp_path / "c3"), verbose=0,
    )
    train_ds = SRDataset(pairs, (16, 16), num_samples=4, linear=False)
    best_val, _, _ = Trainer(m, cfg).train(train_ds, None)
    assert np.isfinite(best_val)


@pytest.mark.skipif(
    not os.path.isfile(
        "/root/reference/model/model_pix_shuffle/training_stats_pix_shuffle.csv"
    ),
    reason="reference unavailable",
)
def test_csv_loader_parses_reference_committed_history():
    """The CSV-resume loader is byte-compatible with the reference's own
    committed training histories (BASELINE.md pins pix_shuffle best val
    0.11051 @ epoch 41 of 50)."""
    last, best, best_ep, ni, lr, path = load_last_epoch_and_checkpoint(
        0.01,
        "/root/reference/model/model_pix_shuffle/training_stats_pix_shuffle.csv",
    )
    assert last == 50
    assert best == pytest.approx(0.11051, abs=5e-5)
    assert best_ep == 41
    assert path.endswith(".pth")
    # conv3: best 0.05443 @ epoch 63 of 94
    last3, best3, ep3, *_ = load_last_epoch_and_checkpoint(
        0.01, "/root/reference/model/model_conv3/training_stats_conv3.csv"
    )
    assert last3 == 94 and ep3 == 63
    assert best3 == pytest.approx(0.05443, abs=5e-5)


def test_resume_uses_fresh_optimizer_with_csv_lr(tiny_dataset, tmp_path):
    """CSV resume restores weights + lr but NOT the schedule count —
    regression for the double-decay found in review."""
    import dataclasses
    import json

    m = get_model("pix_shuffle")
    m = m._replace(loss=dataclasses.replace(m.loss, vgg_weight=0.0,
                                            high_frequency_weight=0.0))
    pairs = gather_all_samples_from_directory(tiny_dataset, (16, 16), verbose=0)
    ckpt_dir = str(tmp_path / "ck")
    cfg = TrainerConfig(num_epochs=2, lr=1e-3, batch_size=2,
                        accumulation_steps=2, checkpoint_interval=1,
                        checkpoint_dir=ckpt_dir, verbose=0,
                        lr_decay_rate=0.5)
    ds = SRDataset(pairs, (16, 16), num_samples=8, batch_size=2)
    Trainer(m, cfg).train(ds, None)
    # resume one more epoch: logged lr must be csv_lr * 0.5^1, not ^2
    cfg3 = dataclasses.replace(cfg, num_epochs=3)
    Trainer(m, cfg3).train(ds, None)
    rows = [json.loads(l) for l in open(
        os.path.join(ckpt_dir, "metrics_pix_shuffle.jsonl"))]
    lr2 = next(r["lr"] for r in rows if r["epoch"] == 2)
    lr3 = next(r["lr"] for r in rows if r["epoch"] == 3)
    assert lr3 == pytest.approx(lr2 * 0.5, rel=1e-6)


def test_cli_multichip_training(tiny_dataset, tmp_path):
    """Multi-chip training through the CLI entry: a real 2-epoch run on the
    8-device CPU mesh (dp=4 x sp=2), not just the one-step dryrun."""
    from fs_uae_image_enhancer_project_tpu.train import cli

    ckpt_dir = str(tmp_path / "mc")
    rc = cli.main([
        "--model_type", "pix_shuffle",
        "--generator_train_dir", tiny_dataset,
        "--checkpoint_dir", ckpt_dir,
        "--crop_size", "16", "16",
        "--epochs", "2", "--batch_size", "4", "--accumulation_steps", "2",
        "--train_samples", "8", "--val_samples", "4",
        "--val_split_ratio", "0.5",
        "--n_devices", "8", "--spatial", "2",
        "--verbose", "0",
    ])
    assert rc == 0
    stats = os.path.join(ckpt_dir, "training_stats_pix_shuffle.csv")
    assert os.path.isfile(stats)
    import csv as csvmod

    with open(stats) as f:
        rows = list(csvmod.reader(f))[1:]
    assert max(int(r[0]) for r in rows) == 2
    assert all(np.isfinite(float(r[2])) for r in rows)


def test_cli_multichip_validation_errors(tiny_dataset, tmp_path, capsys):
    from fs_uae_image_enhancer_project_tpu.train import cli

    base = [
        "--model_type", "pix_shuffle",
        "--generator_train_dir", tiny_dataset,
        "--checkpoint_dir", str(tmp_path / "x"),
        "--crop_size", "16", "16", "--epochs", "1",
    ]
    # sp must divide n_devices
    assert cli.main(base + ["--n_devices", "8", "--spatial", "3"]) == 1
    # batch must be divisible by dp
    assert cli.main(base + ["--n_devices", "8", "--batch_size", "3"]) == 1
    # crop height must be divisible by sp (sp shards H)
    odd_h = [
        "--model_type", "pix_shuffle",
        "--generator_train_dir", tiny_dataset,
        "--checkpoint_dir", str(tmp_path / "x"),
        "--crop_size", "16", "15", "--epochs", "1",
        "--n_devices", "8", "--spatial", "2", "--batch_size", "4",
    ]
    assert cli.main(odd_h) == 1
    assert "crop height" in capsys.readouterr().err
