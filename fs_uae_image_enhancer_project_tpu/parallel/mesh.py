"""Device mesh and sharding helpers.

The workload is a small-CNN image enhancer: one frame fits one chip with room
to spare (SURVEY §5 "Long-context"), so the distributed axes that make sense
are:

- ``dp`` — batch data parallelism (gradient psum over ICI), the primary axis
  for training throughput (SURVEY §2 "Parallelism inventory").
- ``sp`` — spatial parallelism over image height for oversized inputs /
  tiny-batch scaling: convolutions over an H-sharded tensor get their halo
  exchanges inserted by XLA automatically under jit-with-shardings.

No NCCL/MPI translation: collectives are XLA-inserted over the ICI mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    dp: Optional[int] = None,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('dp', 'sp') mesh over the first n devices.

    Defaults: all devices on the dp axis. ``sp`` must divide n_devices.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    if n > len(devs):
        # devs[:n] would silently truncate and die later in an opaque
        # reshape; fail with the actual device arithmetic instead
        raise ValueError(
            f"asked for {n} devices but only {len(devs)} are available"
        )
    devs = devs[:n]
    if dp is None:
        if n % sp:
            raise ValueError(f"sp={sp} must divide device count {n}")
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp * sp} != {n} devices")
    arr = np.array(devs).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches: batch over dp, height over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def accum_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(micro, batch, H, W, C) accumulation batches: micro axis unsharded
    (it is lax.scan'd sequentially), batch over dp, height over sp."""
    return NamedSharding(mesh, P(None, "dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of NHWC arrays with (dp, sp) sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
