"""Sharded batch inference: offline enhancement at fleet scale.

Real-time emulation is single-chip/batch-1, but the same enhance artifact
serves offline workloads (re-rendering recordings, dataset-scale
enhancement). Here the frame batch is sharded over the mesh's dp axis and
params are replicated — XLA runs every chip on its shard with zero
collectives in the forward pass.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def make_sharded_enhance(
    enhance_fn: Callable,
    mesh: Optional[Mesh] = None,
):
    """Wrap an enhance function for dp-sharded batches.

    Returns (sharded_fn, shard_batch) where shard_batch places a host batch
    with (dp, None, None, None) sharding and sharded_fn is the jitted
    computation with matching output shardings.

    ``enhance_fn`` may be the library default (make_enhance_fn with
    jit=True + donated arg): an already-jitted fn is unwrapped to its
    underlying python function first — nesting a donating jit inside the
    outer sharded jit would drop the donation with a per-call warning.
    The sharded path itself does not donate (offline batch inference is
    throughput-bound, and callers keep their input batches).
    """
    if mesh is None:
        mesh = make_mesh(sp=1)
    enhance_fn = getattr(enhance_fn, "__wrapped__", enhance_fn)
    bspec = NamedSharding(mesh, P("dp"))

    def shard_batch(frames: np.ndarray):
        n = frames.shape[0]
        dp = mesh.devices.shape[0]
        if n % dp:
            raise ValueError(f"batch {n} must be divisible by dp={dp}")
        return jax.device_put(frames, bspec)

    sharded = jax.jit(enhance_fn, in_shardings=bspec, out_shardings=bspec)
    return sharded, shard_batch


def enhance_directory(
    enhance_fn: Callable,
    input_dir: str,
    output_dir: str,
    *,
    batch_size: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    verbose: int = 1,
) -> int:
    """Enhance every PNG in a directory with dp-sharded batches."""
    import glob
    import os

    from PIL import Image

    if mesh is None:
        mesh = make_mesh(sp=1)
    dp = mesh.devices.shape[0]
    if batch_size is None:
        batch_size = dp
    sharded, shard_batch = make_sharded_enhance(enhance_fn, mesh)
    os.makedirs(output_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(input_dir, "*.png")))
    done = 0
    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        frames = np.stack(
            [np.asarray(Image.open(p).convert("RGBA"), np.uint8) for p in chunk]
        )
        pad = (-len(chunk)) % batch_size
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
        out = np.asarray(sharded(shard_batch(frames)))
        for p, frame in zip(chunk, out):
            Image.fromarray(frame, mode="RGBA").save(
                os.path.join(output_dir, os.path.basename(p))
            )
            done += 1
    if verbose:
        print(f"enhanced {done} frames -> {output_dir} (dp={dp})")
    return done
