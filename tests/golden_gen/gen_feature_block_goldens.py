"""Generate torch-golden outputs for the ResidualFeatureBlock parity test.

Runs the ACTUAL reference module (``model/residual_feature_block.py``) in a
torch-only process and records weights/inputs/outputs for two configs:

- no projection (in == out), default acts (identity, relu, identity, relu),
- projected residual (in != out) with channel-resolved PReLU on act2 (mid
  channels) and global PReLU on act4 (out channels) — exercising the
  'channel'/'global' num_parameters resolution at both widths.

    python tests/golden_gen/gen_feature_block_goldens.py

Writes tests/goldens/feature_block_goldens.npz, consumed by
tests/test_models.py::test_feature_block_matches_reference_golden.
"""
import os
import sys

import zlib

import numpy as np
import torch

REF_MODEL_DIR = os.environ.get("REF_MODEL_DIR", "/root/reference/model")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "feature_block_goldens.npz"
)


def main() -> int:
    sys.path.insert(0, REF_MODEL_DIR)
    from residual_feature_block import ResidualFeatureBlock

    rng = np.random.default_rng(1)
    g = {}
    cases = {
        "plain": dict(in_channels=8, mid_channels=12, out_channels=8,
                      kernel_size=3),
        "proj": dict(in_channels=8, mid_channels=12, out_channels=16,
                     kernel_size=3,
                     acts={
                         "act1": "identity", "act1_params": None,
                         "act2": "prelu",
                         "act2_params": {"num_parameters": "channel"},
                         "act3": "identity", "act3_params": None,
                         "act4": "prelu",
                         "act4_params": {"num_parameters": "global"},
                     }),
    }
    for tag, kw in cases.items():
        # crc32, not hash(): str hash is per-process randomized,
        # which would make golden regeneration non-reproducible
        torch.manual_seed(zlib.crc32(tag.encode()))
        m = ResidualFeatureBlock(**kw).eval()
        x = rng.normal(0, 1.0, (1, kw["in_channels"], 8, 10)).astype(
            np.float32)
        with torch.no_grad():
            y = m(torch.from_numpy(x)).numpy()
        g[f"{tag}_x"] = x
        g[f"{tag}_y"] = y
        for name, t in m.state_dict().items():
            g[f"{tag}_w_{name}"] = t.numpy()
        print(tag, "out", y.shape, "params", [k for k in m.state_dict()])

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} with {len(g)} arrays")
    return 0


if __name__ == "__main__":
    sys.exit(main())
