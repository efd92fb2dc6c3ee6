#!/usr/bin/env python3
"""Characterize host-RSS retention of host->device transfers (tunnel TPU).

Round-3 observation: long training runs grow host RSS roughly in proportion
to total bytes transferred to the device (fp32 run ~1.7 GB/min; uint8
transfer cut the rate ~4x), even though every jax Array is dropped and
gc'd — pointing at the PJRT tunnel client retaining send buffers.

This probe isolates it: device_put N arrays (dropping each reference,
forcing completion via a tiny fetch), sample RSS every K puts, and report
GB retained per GB transferred. Run on the TPU when idle:

    python scripts/probe_transfer_retention.py [--mb 8] [--n 200]
"""
import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1048576.0
    return float("nan")


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=8.0, help="array size, MB")
    ap.add_argument("--n", type=int, default=200, help="number of puts")
    ap.add_argument("--sample_every", type=int, default=25)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device={dev} array={args.mb} MB x {args.n} puts", flush=True)
    shape = (int(args.mb * 1048576) // 4,)
    host = np.ones(shape, np.float32)

    base = rss_gb()
    print(f"baseline rss: {base:.2f} GB", flush=True)
    for i in range(1, args.n + 1):
        a = jax.device_put(host, dev)
        # force the transfer to complete; then drop every reference
        np.asarray(a[:1])
        del a
        if i % args.sample_every == 0:
            gc.collect()
            sent_gb = i * args.mb / 1024.0
            grown = rss_gb() - base
            print(f"puts={i} sent={sent_gb:.2f} GB rss_growth={grown:.2f} GB "
                  f"(ratio {grown / sent_gb if sent_gb else 0:.2f})",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
