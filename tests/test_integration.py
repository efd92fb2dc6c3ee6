"""Full-pipeline integration: generate -> gather -> train -> export -> run.

One test walks the entire user journey at tiny scale: the dataset generator
produces styled/target pairs from a synthetic source image, the trainer runs
two epochs on them (pixel-only loss for speed), the best checkpoint exports
to ONNX, and the numpy runner executes the artifact — the complete L0->L5
chain of SURVEY §1 in a single flow.
"""
import dataclasses
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
from fs_uae_image_enhancer_project_tpu.datagen.generator import (
    DatasetGenerator,
    GeneratorConfig,
)
from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
    export_pix_shuffle_onnx,
)
from fs_uae_image_enhancer_project_tpu.export.onnx_runner import run_model
from fs_uae_image_enhancer_project_tpu.models import get_model
from fs_uae_image_enhancer_project_tpu.train.trainer import (
    Trainer,
    TrainerConfig,
    load_params,
)


def test_generate_train_export_run(tmp_path):
    # L0: generate
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(7)
    Image.fromarray(rng.integers(40, 256, (96, 128, 3), dtype=np.uint8)).save(
        src / "img.png"
    )
    gen_cfg = GeneratorConfig(
        train_images=[str(src)],
        dest_dir=str(tmp_path / "data"),
        crop_w=64, crop_h=64,
        resolutions=("lores",), colorspaces=("RGB444",),
        palettes=(16,), dithers=("bayer2x2",),
        rotations=(0,), downscales=(100,),
        palette_algorithm="median_cut", workers=1,
        cache_dir=str(tmp_path / "cache"), verbose=0,
        max_crops_per_image=2,
    )
    stats = DatasetGenerator(gen_cfg).run()
    assert stats["missing"] == 0 and stats["generated_this_run"] > 0

    # L1: gather + split
    pairs = gather_all_samples_from_directory(
        str(tmp_path / "data" / "train"), (64, 64), verbose=0
    )
    assert pairs
    train_pool, _ = split_pairs(pairs, 0.0)

    # L3: train (pixel-only loss for speed)
    m = get_model("pix_shuffle")
    m = m._replace(loss=dataclasses.replace(m.loss, vgg_weight=0.0,
                                            high_frequency_weight=0.0))
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = TrainerConfig(
        num_epochs=2, lr=1e-3, batch_size=2, accumulation_steps=1,
        checkpoint_interval=1, checkpoint_dir=ckpt_dir, verbose=0,
    )
    ds = SRDataset(train_pool, (64, 64), num_samples=8, batch_size=2)
    best_val, best_epoch, _ = Trainer(m, cfg).train(ds, None)
    assert np.isfinite(best_val)

    # L5: load best checkpoint -> export ONNX -> run the artifact
    params = load_params(
        os.path.join(ckpt_dir, "checkpoint_best_pix_shuffle"),
        get_model("pix_shuffle").init(jax.random.key(0)),
    )
    onnx_path = str(tmp_path / "deploy.onnx")
    export_pix_shuffle_onnx(
        params, get_model("pix_shuffle").config, onnx_path,
        crop_left=0, fp16=False, frame_h=64, frame_w=64,
    )
    frame = rng.integers(0, 256, (1, 64, 64, 4), np.uint8)
    out = run_model(onnx_path, {"input_rgba_chunky": frame})[
        "output_rgba_uint8_chunky"
    ]
    assert out.shape == (1, 64, 64, 4) and out.dtype == np.uint8
    assert (out[..., 3] == 255).all()
