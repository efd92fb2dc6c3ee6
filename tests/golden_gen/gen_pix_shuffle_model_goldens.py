"""Generate torch-golden outputs for FULL pix_shuffle model parity.

Runs the ACTUAL reference production model (``model/model_pix_shuffle.py``)
in a torch-only process and records input/output for both shipped configs:

- ``light``: get_model('lightweight') (model_pix_shuffle.py:304-311) — the
  trained production config. Its wiring is already pinned by live parity
  against the reference's predicted frames, but only WITH the shipped
  weights; this golden pins it under random weights too (which exercises
  sinlu/biased_prelu learnable parameters away from their trained values).
- ``heavy``: get_model('heavyweight') (model_pix_shuffle.py:312-313) — the
  default-act heavy config (36/36/108/108/36/36). The reference ships no
  heavy checkpoint or ONNX, so this is the only reference-executed evidence
  for our pix_shuffle_heavy wiring (biased_relu / leaky_relu / prelu slots,
  no skip projections at equal widths).

Weights are regenerated from a per-key crc32-seeded numpy RNG exactly as in
gen_unet_model_goldens.py; the npz stores only the state_dict manifest + x/y.

    python tests/golden_gen/gen_pix_shuffle_model_goldens.py

Writes tests/goldens/pix_shuffle_model_goldens.npz, consumed by
tests/test_models.py::test_pix_shuffle_matches_reference_golden.
"""
import json
import os
import sys
import types

import numpy as np
import torch

from gen_unet_model_goldens import regen_weight

REF_MODEL_DIR = os.environ.get("REF_MODEL_DIR", "/root/reference/model")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens",
    "pix_shuffle_model_goldens.npz"
)


def main() -> int:
    stub = types.ModuleType("loss_vgg")

    class _Perceptual(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    stub.PerceptualLoss = _Perceptual
    stub.charbonnier_loss = lambda *a, **k: None
    sys.modules["loss_vgg"] = stub
    sys.path.insert(0, REF_MODEL_DIR)
    from model_pix_shuffle import get_model

    rng = np.random.default_rng(11)
    g = {}
    for tag in ("light", "heavy"):
        m = get_model("lightweight" if tag == "light" else "heavyweight")
        m = m.eval()
        sd = m.state_dict()
        for name, t in sd.items():
            t.copy_(torch.from_numpy(regen_weight(f"{tag}/{name}",
                                                  tuple(t.shape))))
        m.load_state_dict(sd)
        x = rng.uniform(0.0, 1.0, (1, 3, 16, 20)).astype(np.float32)
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
