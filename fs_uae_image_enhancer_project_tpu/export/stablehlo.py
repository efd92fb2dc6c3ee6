"""StableHLO / jax.export serialization of the enhance artifact.

The TPU-native deployment format alongside ONNX: ``jax.export`` produces a
portable serialized artifact (StableHLO inside) that any XLA-backed runtime
can load and run — the analogue of the reference's .onnx file for
XLA-family consumers.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import FRAME_H, FRAME_W


def export_enhance(
    enhance_fn: Callable,
    out_path: str,
    *,
    frame_h: int = FRAME_H,
    frame_w: int = FRAME_W,
    batch: int = 1,
) -> str:
    """Serialize a jitted enhance function to a portable artifact."""
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch, frame_h, frame_w, 4), jnp.uint8)
    exported = jexport.export(jax.jit(enhance_fn))(spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def load_enhance(path: str):
    """Deserialize and return a callable enhance function."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def enhance(frames):
        return exported.call(frames)

    return enhance


def stablehlo_text(enhance_fn: Callable, *, frame_h: int = FRAME_H,
                   frame_w: int = FRAME_W, batch: int = 1) -> str:
    """Human-readable StableHLO of the enhance program (debug/inspection)."""
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch, frame_h, frame_w, 4), jnp.uint8)
    exported = jexport.export(jax.jit(enhance_fn))(spec)
    return exported.mlir_module()
