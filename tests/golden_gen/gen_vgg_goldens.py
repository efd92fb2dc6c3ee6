"""Generate torch-golden outputs for the VGG16 perceptual-loss pipeline.

Run manually (torch-only process — never imports jax, because torch+jax in
one process stalls on this VM's storage):

    python tests/golden_gen/gen_vgg_goldens.py

Writes tests/goldens/vgg_goldens.npz, which tests/test_losses.py consumes.

The goldens pin the reference's PerceptualLoss end to end
(/root/reference/model/loss_vgg.py):

- the torchvision vgg16 ``features[0..26]`` topology (cfg D: 3x3 pad-1 convs,
  2x2/2 max pools) with tap activations at indices {3, 8, 17, 26}
  (loss_vgg.py:72-77) under the std=1/255 normalization (loss_vgg.py:113-114);
- the total-loss combination for l1/charbonnier pixel losses, the Laplacian
  high-frequency branch, the kornia-YCbCr luminance branch computed on the
  VGG-NORMALIZED tensors (loss_vgg.py:192-194), and the ``input_is_linear``
  clamp asymmetry (output clamped to [0,1] after the 1/2.2 pow, target NOT —
  loss_vgg.py:171-177).

torchvision is absent in this image, so the feature stack is built from plain
``torch.nn`` modules in the torchvision layout; weights are He-normal from a
FIXED numpy seed so the jax test can regenerate them bit-identically instead
of committing ~59 MB of fp32 weights. Inputs are drawn from [0.01, 0.99] so
the repo's documented NaN-guard deviation (perceptual.py: eps-clip before the
x**(1/2.2) pow) is exactly value-neutral.
"""
import os

import numpy as np
import torch
import torch.nn.functional as tF

OUT = os.path.join(os.path.dirname(__file__), "..", "goldens", "vgg_goldens.npz")

WEIGHT_SEED = 20260818
# (index, kind, cout) for torchvision vgg16().features[0..26] — mirror of
# losses/vgg.py VGG16_LAYOUT (kept independent on purpose: a layout bug there
# must fail the test, not reshape the golden).
LAYOUT = (
    (0, "conv", 64), (1, "relu", 0), (2, "conv", 64), (3, "relu", 0),
    (4, "pool", 0),
    (5, "conv", 128), (6, "relu", 0), (7, "conv", 128), (8, "relu", 0),
    (9, "pool", 0),
    (10, "conv", 256), (11, "relu", 0), (12, "conv", 256), (13, "relu", 0),
    (14, "conv", 256), (15, "relu", 0),
    (16, "pool", 0),
    (17, "conv", 512), (18, "relu", 0), (19, "conv", 512), (20, "relu", 0),
    (21, "conv", 512), (22, "relu", 0),
    (23, "pool", 0),
    (24, "conv", 512), (25, "relu", 0), (26, "conv", 512),
)
TAPS = (3, 8, 17, 26)
TAP_WEIGHTS = {3: 1.0 / 2.6, 8: 1.0 / 4.8, 17: 1.0 / 3.7, 26: 1.0 / 5.6}
MEAN = (0.48235, 0.45882, 0.40784)
STD = 0.00392156862745098  # 1/255, loss_vgg.py:113-114


def make_weights():
    """He-normal OIHW conv weights + small nonzero biases, fixed seed.

    The jax test regenerates these bit-identically (numpy is the shared RNG)
    and routes them through convert_torchvision_state_dict, so the OIHW->HWIO
    converter is under test too.
    """
    rng = np.random.default_rng(WEIGHT_SEED)
    state = {}
    cin = 3
    for i, kind, cout in LAYOUT:
        if kind != "conv":
            continue
        std = np.sqrt(2.0 / (cin * 9))
        state[f"features.{i}.weight"] = rng.normal(
            0.0, std, (cout, cin, 3, 3)).astype(np.float32)
        state[f"features.{i}.bias"] = rng.normal(
            0.0, 0.01, (cout,)).astype(np.float32)
        cin = cout
    return state


def run_features(state, x):
    """features[0..26] forward, returning {tap_index: activation} (NCHW)."""
    taps = {}
    for i, kind, _cout in LAYOUT:
        if kind == "conv":
            w = torch.from_numpy(state[f"features.{i}.weight"])
            b = torch.from_numpy(state[f"features.{i}.bias"])
            x = tF.conv2d(x, w, b, padding=1)
        elif kind == "relu":
            x = tF.relu(x)
        else:
            x = tF.max_pool2d(x, 2, 2)
        if i in TAPS:
            taps[i] = x
    return taps


def normalize(x):
    mean = torch.tensor(MEAN).view(1, 3, 1, 1)
    return (x - mean) / STD


def charbonnier(o, t, eps=1e-6):
    return torch.mean(torch.sqrt((o - t) ** 2 + eps ** 2))


def laplacian_hf(o, t):
    k = torch.tensor([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    k = k.reshape(1, 1, 3, 3)
    ho = tF.conv2d(o, k.repeat(o.shape[1], 1, 1, 1), padding="same",
                   groups=o.shape[1])
    ht = tF.conv2d(t, k.repeat(t.shape[1], 1, 1, 1), padding="same",
                   groups=t.shape[1])
    return tF.l1_loss(ho, ht)


def luminance(o_norm, t_norm):
    # kornia rgb_to_ycbcr Y channel, applied to the NORMALIZED tensors —
    # the reference's exact (quirky) operand choice (loss_vgg.py:192-194)
    def y(x):
        return 0.299 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2]
    return tF.l1_loss(y(o_norm), y(t_norm))


def perceptual_total(state, o, t, *, pixel_w, vgg_w, pixel_type,
                     hf_w=0.0, lum_w=0.0, input_is_linear=False):
    """Reference PerceptualLoss.forward (loss_vgg.py:169-216), verbatim math."""
    if input_is_linear:
        o_vgg = normalize((o ** (1 / 2.2)).clamp(0.0, 1.0))
        t_vgg = normalize(t ** (1 / 2.2))  # target NOT clamped
    else:
        o_vgg = normalize(o.clamp(0.0, 1.0))
        t_vgg = normalize(t)
    pixel = tF.l1_loss(o, t) if pixel_type == "l1" else charbonnier(o, t)
    total = pixel_w * pixel
    if vgg_w > 0:
        fo = run_features(state, o_vgg)
        ft = run_features(state, t_vgg)
        total = total + vgg_w * sum(
            TAP_WEIGHTS[i] * tF.l1_loss(fo[i], ft[i]) for i in TAPS)
    if hf_w > 0:
        total = total + hf_w * laplacian_hf(o, t)
    if lum_w > 0:
        total = total + lum_w * luminance(o_vgg, t_vgg)
    return float(total)


def main():
    state = make_weights()
    rng = np.random.default_rng(7)
    o = rng.uniform(0.01, 0.99, (1, 3, 32, 32)).astype(np.float32)
    t = rng.uniform(0.01, 0.99, (1, 3, 32, 32)).astype(np.float32)
    # exact-black target region: pins the reference's no-clamp target path
    # (loss_vgg.py:173 — pow(0) must stay 0; an eps clamp would shift black
    # by (1e-6)**(1/2.2) ~= 1.9e-3 pre-normalization). The OUTPUT keeps no
    # zeros: our implementation deliberately eps-clamps the differentiated
    # side (losses/perceptual.py), a documented divergence.
    t[0, :, :8, :8] = 0.0
    g = {"input_o": o, "input_t": t}

    with torch.no_grad():
        taps = run_features(state, normalize(torch.from_numpy(o)))
        for i in TAPS:
            g[f"tap_{i}"] = taps[i].numpy()
        # pix_shuffle's exact criterion weights (model_pix_shuffle.py),
        # both color modes, plus an everything-on config
        configs = {
            "loss_srgb_l1_vgg": dict(pixel_w=0.990, vgg_w=0.007,
                                     pixel_type="l1", hf_w=0.003),
            "loss_srgb_charb_lum": dict(pixel_w=1.0, vgg_w=0.006,
                                        pixel_type="charbonnier", lum_w=0.05),
            "loss_linear_all": dict(pixel_w=0.990, vgg_w=0.007,
                                    pixel_type="charbonnier", hf_w=0.003,
                                    lum_w=0.02, input_is_linear=True),
        }
        for name, kw in configs.items():
            g[name] = np.float64(
                perceptual_total(state, torch.from_numpy(o),
                                 torch.from_numpy(t), **kw))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    size = os.path.getsize(OUT)
    print(f"wrote {OUT} ({size / 1024:.0f} KiB): "
          + ", ".join(sorted(g)))


if __name__ == "__main__":
    main()
