"""Generate torch-golden outputs for FULL ResidualUNet model parity.

Runs the ACTUAL reference model (``model/model_residual_unet.py``) in a
torch-only process and records input/output for three configs:

- ``light``: the shipped lightweight config (get_model('lightweight'):
  depth 3, blocks_per_level 1, base 36, ratio 1.50) — pins the production
  wiring: stem unshuffle+1x1, per-level block stacks with channel doubling,
  bottleneck, skip concatenation (original input at the top), final ReLU.
- ``heavy``: the shipped heavyweight config (depth 4, blocks 4, base 72,
  ratio 1.50) on a tiny spatial grid — pins the deep wiring incl. the 1x1
  bottleneck spatial case.
- ``acts``: depth 2, blocks 2, base 8, ratio 0.75 with learnable
  activations (telu / channel-PReLU / identity / global-PReLU) — pins the
  act_config plumbing through every block of the model.

Weights are NOT stored: every state_dict tensor is overwritten with values
regenerated from a per-key crc32-seeded numpy RNG (fan-in-scaled normals),
and the jax test regenerates them bit-identically (the duplicated helper is
the same convention as tests/test_losses.py::_regen_torch_vgg_state). The
npz stores only the state_dict key/shape manifest plus x and y per case.

    python tests/golden_gen/gen_unet_model_goldens.py

Writes tests/goldens/unet_model_goldens.npz, consumed by
tests/test_models.py::test_residual_unet_matches_reference_golden.
"""
import json
import os
import sys
import types
import zlib

import numpy as np
import torch

REF_MODEL_DIR = os.environ.get("REF_MODEL_DIR", "/root/reference/model")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "unet_model_goldens.npz"
)


def regen_weight(key: str, shape) -> np.ndarray:
    """Deterministic per-key weight values; duplicated bit-identically in
    tests/test_models.py (numpy is the shared RNG — torch never sees a
    seed). Conv weights are fan-in-scaled so deep stacks stay O(1)."""
    rng = np.random.default_rng(zlib.crc32(key.encode()))
    v = rng.standard_normal(shape).astype(np.float32)
    if len(shape) == 4:  # OIHW conv weight
        v /= np.sqrt(shape[1] * shape[2] * shape[3])
    else:  # bias / PReLU slope vectors
        v *= 0.25
    return v


def main() -> int:
    # The reference model imports loss_vgg (torchvision, absent here); the
    # criterion never runs in this golden, so stub the module surface.
    stub = types.ModuleType("loss_vgg")

    class _Perceptual(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    stub.PerceptualLoss = _Perceptual
    stub.charbonnier_loss = lambda *a, **k: None
    sys.modules["loss_vgg"] = stub
    sys.path.insert(0, REF_MODEL_DIR)
    from model_residual_unet import ResidualUNet, get_model

    rng = np.random.default_rng(7)
    g = {}
    prelu_acts = dict(
        activation1="telu", activation1_params=None,
        activation2="prelu",
        activation2_params={"num_parameters": "channel"},
        activation3="identity", activation3_params=None,
        activation4="prelu",
        activation4_params={"num_parameters": "global"},
    )
    cases = {
        # (model factory, input HxW)
        "light": (lambda: get_model("lightweight"), (24, 32)),
        "heavy": (lambda: get_model("heavyweight"), (16, 32)),
        "acts": (lambda: ResidualUNet(base_channels=8, unet_depth=2,
                                      blocks_per_level=2,
                                      internal_block_channels_ratio=0.75,
                                      **prelu_acts), (12, 20)),
    }
    for tag, (factory, (h, w)) in cases.items():
        m = factory().eval()
        sd = m.state_dict()
        for name, t in sd.items():
            t.copy_(torch.from_numpy(regen_weight(f"{tag}/{name}",
                                                  tuple(t.shape))))
        m.load_state_dict(sd)
        x = rng.uniform(0.0, 1.0, (1, 3, h, w)).astype(np.float32)
        with torch.no_grad():
            y = m(torch.from_numpy(x)).numpy()
        g[f"{tag}_x"] = x
        g[f"{tag}_y"] = y
        manifest = {name: list(t.shape) for name, t in sd.items()}
        g[f"{tag}_manifest"] = np.frombuffer(
            json.dumps(manifest).encode(), dtype=np.uint8)
        print(tag, "out", y.shape, "|y| max", float(np.abs(y).max()),
              "params", sum(int(np.prod(s)) for s in manifest.values()))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} with {len(g)} arrays")
    return 0


if __name__ == "__main__":
    sys.exit(main())
