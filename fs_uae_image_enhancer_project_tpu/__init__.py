"""fs_uae_image_enhancer_project_tpu — TPU-native rebuild of the FS-UAE AI image enhancer.

A JAX/XLA/Pallas framework with the capabilities of
cminnoy/fs_uae_image_enhancer_project, re-designed TPU-first:

- ``ops``      — gamma curves, functional activation registry, pixel (un)shuffle,
                 NHWC convolution primitives, Pallas kernels.
- ``models``   — the CNN zoo (pix_shuffle, conv3, conv5, conv6, residual_unet)
                 as pure functions over parameter pytrees.
- ``losses``   — Charbonnier / perceptual-VGG / Laplacian-HF / SSIM losses.
- ``data``     — generated-dataset filename codec, pair gatherer, training
                 iterator with host-side prefetch.
- ``datagen``  — idempotent dataset generator with on-device quantize/dither.
- ``train``    — optax trainer with grad accumulation, early stopping,
                 CSV-resume semantics and orbax checkpoints.
- ``nas``      — architecture/hyperparameter search harness with FPS cache.
- ``export``   — jitted uint8-RGBA enhance artifact, StableHLO and ONNX export,
                 ONNX import of the reference's shipped artifacts.
- ``parallel`` — jax.sharding mesh helpers; data/spatial-parallel train steps.
- ``utils``    — the single FPS/latency harness, CSV logging, image I/O.

Reference: /root/reference (cminnoy/fs_uae_image_enhancer_project). The
framebuffer contract is fixed 752x576 uint8 RGBA (reference README.md:5).
"""

__version__ = "0.1.0"

FRAME_W = 752
FRAME_H = 576
# The deployed graph crops 16 px from the left edge so the model sees 736x576
# (width divisible by 32); the output is padded back with black
# (reference convertion_tools/torch2onnx.py:299-355, :634-674).
CROP_LEFT = 16
MODEL_W = FRAME_W - CROP_LEFT  # 736
MODEL_H = FRAME_H              # 576
