"""Generate torch-golden outputs for the ResidualDenseBlock parity test.

Runs the ACTUAL reference module (``model/residual_dense_block.py`` from
/root/reference) in a torch-only process (never imports jax: torch+jax in
one process stalls this VM) and records weights, inputs and outputs for
three configurations:

- matching channels (16->16, n_convs=3, default relu+identity acts;
  the reference returns the fusion output with NO residual here),
- differing channels (16->24, n_convs=2; residual through the 1x1
  local_residual_adjustment conv),
- channel-resolved PReLU in slot 1 (num_parameters='channel' -> growth).

The reference imports the missing-upstream ``triplet_attention`` module, so
a stub is injected before import (attention stays OFF in all cases — the
phantom module has no reference implementation to golden against).

    python tests/golden_gen/gen_dense_block_goldens.py

Writes tests/goldens/dense_block_goldens.npz, consumed by
tests/test_models.py::test_dense_block_matches_reference_golden.
"""
import os
import sys
import types

import zlib

import numpy as np
import torch

REF_MODEL_DIR = os.environ.get("REF_MODEL_DIR", "/root/reference/model")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "dense_block_goldens.npz"
)


def _load_reference_rdb():
    sys.path.insert(0, REF_MODEL_DIR)
    # residual_dense_block.py imports the phantom triplet_attention module
    stub = types.ModuleType("triplet_attention")

    class _NoAttention:  # never instantiated (use_triplet_attention=False)
        def __init__(self, *a, **k):
            raise AssertionError("goldens keep attention off")

    stub.TripletAttention = _NoAttention
    sys.modules.setdefault("triplet_attention", stub)
    from residual_dense_block import ResidualDenseBlock

    return ResidualDenseBlock


def main() -> int:
    RDB = _load_reference_rdb()
    rng = np.random.default_rng(0)
    g = {}

    cases = {
        "match": dict(in_channels=16, out_channels=16, growth_rate=8,
                      n_convs=3),
        "adjust": dict(in_channels=16, out_channels=24, growth_rate=8,
                       n_convs=2),
        "prelu": dict(in_channels=16, out_channels=16, growth_rate=8,
                      n_convs=2,
                      activation_names=("prelu", "identity"),
                      activation_params=({"num_parameters": "channel"},
                                         None)),
    }
    for tag, kw in cases.items():
        # crc32, not hash(): str hash is per-process randomized,
        # which would make golden regeneration non-reproducible
        torch.manual_seed(zlib.crc32(tag.encode()))
        m = RDB(**kw).eval()
        x = rng.normal(0, 1.0, (1, kw["in_channels"], 8, 10)).astype(
            np.float32)
        with torch.no_grad():
            y = m(torch.from_numpy(x)).numpy()
        g[f"{tag}_x"] = x
        g[f"{tag}_y"] = y
        for name, t in m.state_dict().items():
            g[f"{tag}_w_{name}"] = t.numpy()
        print(tag, "out", y.shape,
              "params", [k for k in m.state_dict()])

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} with {len(g)} arrays")
    return 0


if __name__ == "__main__":
    sys.exit(main())
