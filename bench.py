#!/usr/bin/env python3
"""Headline benchmark: sustained 752x576 uint8-RGBA enhance throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...}

Baseline: the rebuild north star is >=60 fps sustained, p50 < 5 ms/frame on
one TPU v5e chip (BASELINE.md "Rebuild north star"); vs_baseline = fps / 60.

Methodology: the deployed enhance function (full uint8->uint8 chunky wrapper,
weights imported from the reference's shipped pix_shuffle.onnx) is applied in
a dependency CHAIN — each frame's input is the previous frame's output — and
the final result is fetched to host. total_time / N is then true on-device
per-frame latency; chaining defeats the async-dispatch pipelining of the
remote-TPU tunnel, where block_until_ready alone returns early and naive
per-call timing reports physically impossible numbers (measured: a 8192^3
matmul "at" 37 PFLOPS). The protocol mirrors the reference's 20-warmups +
sustained-window loop (model_pix_shuffle.py:348-368) in spirit, with honest
synchronisation.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_backend() -> None:
    """The remote-TPU plugin registration (sitecustomize) fails transiently;
    a failed registration poisons the whole interpreter, so re-exec this
    script (fresh interpreter, fresh registration) a few times before giving
    up and falling back to CPU — and exit nonzero if even CPU won't come up
    (an unconditional re-exec would loop forever)."""
    import jax

    try:
        jax.devices()
        return
    except RuntimeError as e:
        if os.environ.get("BENCH_CPU_FALLBACK") == "1":
            print(f"# no usable backend even on CPU: {e}", file=sys.stderr)
            sys.exit(1)
        attempts = int(os.environ.get("BENCH_BACKEND_RETRIES", "0"))
        if attempts < 5:
            os.environ["BENCH_BACKEND_RETRIES"] = str(attempts + 1)
            time.sleep(30)
            os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["BENCH_CPU_FALLBACK"] = "1"
        print(f"# TPU backend unavailable after retries ({e}); CPU fallback",
              file=sys.stderr)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


def _arm_watchdog() -> None:
    """Fail deterministically instead of hanging when the tunnel wedges.

    The wedge mode this guards against: backend registration succeeds
    (jax.devices() lists the chip) but the server never grants the execution
    claim, so the FIRST device execution blocks forever (observed 2026-08-17:
    probes hung >1.5 h in nanosleep retry). The documented first-execution
    lottery tops out at 517.8 s (docs/DEPLOYMENT.md), so a 2400 s deadline
    cannot clip an honest cold start. BENCH_WATCHDOG_S=0 disables.
    """
    import threading

    limit = float(os.environ.get("BENCH_WATCHDOG_S", "2400"))
    if limit <= 0:
        return

    def fire():
        time.sleep(limit)
        print(f"# bench watchdog: no result after {limit:.0f}s "
              "(wedged tunnel?); aborting", file=sys.stderr)
        os._exit(17)

    threading.Thread(target=fire, daemon=True).start()


def _preempt_background_training() -> None:
    """One chip, one process: a background trainer (scripts/train_psh_long.py
    self-registers its pid in /tmp/tps3.pid at startup) would run
    concurrently with this bench and pollute both (CLAUDE.md: a bench during
    another process's work inflated a warm call to 167.9 s). Training is
    CSV-resumable, so killing it is lossless; benching is not re-runnable by
    the driver, so the bench wins. Kill strictly by pid file + cmdline check
    (never by pattern), and wait for the pid to exit before touching the
    chip. BENCH_PREEMPT=0 disables."""
    if os.environ.get("BENCH_PREEMPT", "1") != "1":
        return
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "tpu" not in plats and "axon" not in plats:
        # a CPU-pinned smoke bench never touches the chip — killing the
        # background trainer would stop hours of work for nothing
        return
    pidfile = "/tmp/tps3.pid"
    try:
        with open(pidfile) as f:
            pid = int(f.read().strip())
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmdline = f.read().decode("utf-8", "replace")
    except (OSError, ValueError):
        return
    # Allowlist of resumable background chip users that self-register via
    # utils.platform.register_preemptible_pid: CSV-resumable trainers and
    # SQLite-resumable NAS studies. Anything else holding the pid file is a
    # stale/unrelated process: hands off.
    _PREEMPTIBLE = (
        "train_psh_long",
        "train_psh_heavy_long",
        "training_parity_study",
        "nas_demo_r2",
        "train_nas_winner",
    )
    if not any(name in cmdline for name in _PREEMPTIBLE):
        return  # stale pid file now names an unrelated process: hands off
    print(f"# preempting background chip user pid {pid} (resumable)",
          file=sys.stderr)
    import signal

    try:
        os.kill(pid, signal.SIGTERM)
    except OSError:
        return
    def alive() -> bool:
        try:  # a zombie (unreaped by a still-living parent) holds no chip
            with open(f"/proc/{pid}/stat") as f:
                return f.read().split()[2] != "Z"
        except OSError:
            return False

    deadline = time.time() + 60
    while time.time() < deadline and alive():
        time.sleep(1)
    if alive():
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass
        # SIGKILL can stay pending while the process sits in uninterruptible
        # iowait (D-state — this VM stalls for minutes); re-check instead of
        # assuming, and say so loudly if it survives, because the bench
        # numbers are then polluted by a concurrent chip user.
        deadline = time.time() + 120
        while time.time() < deadline and alive():
            time.sleep(2)
        if alive():
            print(f"# WARNING: trainer pid {pid} survived SIGKILL "
                  "(D-state?); bench numbers may be polluted by the "
                  "concurrent process", file=sys.stderr)


def _claim_chip_lock() -> None:
    """Hold /tmp/tpu_bench.lock for this process's lifetime.

    Preempted trainers come back via supervising restart loops
    (recipes/train_heavy_staged.sh); register_preemptible_pid waits on
    this lock so the restarted trainer cannot land on the chip while the
    bench still owns it. Stale locks (dead pid) are ignored by waiters,
    but clean up on exit anyway."""
    import atexit

    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        BENCH_LOCKFILE,
    )

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "tpu" not in plats and "axon" not in plats:
        return  # CPU-pinned smoke bench: no chip to guard

    try:
        with open(BENCH_LOCKFILE, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        return

    def _release() -> None:
        try:
            with open(BENCH_LOCKFILE) as f:
                if int(f.read().strip()) == os.getpid():
                    os.unlink(BENCH_LOCKFILE)
        except (OSError, ValueError):
            pass

    atexit.register(_release)


def main() -> None:
    # watchdog first: the wedge can bite during backend init itself (the
    # xla_bridge warning prints, then jax.devices() never returns)
    _arm_watchdog()
    _preempt_background_training()
    _claim_chip_lock()

    # Optional fresh-process warm measurement, BEFORE this process touches
    # the TPU (two concurrent TPU clients pollute both — CLAUDE.md): the
    # child runs scripts/precompile.py to completion first, so with a seeded
    # persistent cache its first call is the "restart cost after
    # precompile" deployment figure. OFF by default: the first execution
    # in a fresh process is lottery-dominated through the tunnel
    # (8.6-517.8 s measured), which would regularly eat the watchdog
    # budget in unattended runs.
    warm_s = None
    if os.environ.get("BENCH_MEASURE_WARM") == "1":
        import re
        import subprocess

        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "precompile.py")],
                capture_output=True, text=True, timeout=900,
            )
            m = re.search(r"first call ([0-9.]+)s", proc.stdout)
            if m:
                warm_s = float(m.group(1))
        except (subprocess.TimeoutExpired, OSError):
            pass

    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    _ensure_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    cache_dir = enable_persistent_cache()
    bench_start = time.time()

    from fs_uae_image_enhancer_project_tpu.export.enhance import (
        default_enhance_fn,
        enhance_from_onnx,
    )

    duration = float(os.environ.get("BENCH_DURATION_S", "20"))
    # donate=True lets XLA alias the uint8 frame buffers through the chain
    # (each call's input IS the previous call's output); BENCH_DONATE=0
    # opts out for A/B comparison.
    donate = os.environ.get("BENCH_DONATE", "1") == "1"
    onnx_path = "/root/reference/model/model_pix_shuffle/pix_shuffle.onnx"
    if os.path.exists(onnx_path):
        enhance = enhance_from_onnx(onnx_path, donate=donate)
        source = "shipped pix_shuffle.onnx weights"
    else:
        enhance, _ = default_enhance_fn(donate=donate)
        source = "random-init pix_shuffle weights"

    from fs_uae_image_enhancer_project_tpu.utils.profiler import measure_chained

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8))
    # chunk=500: the tunnel amortizes one RTT per chunk (RTT/chunk adder per
    # frame: ~1.5-3.5 ms at chunk=100, ~0.3-0.7 ms at 500). The chain inside
    # a chunk is strictly dependent on-device work, so larger chunks are
    # MORE honest about sustained on-device throughput, not less.
    chunk = int(os.environ.get("BENCH_CHUNK", "500"))
    res = measure_chained(enhance, frame, warmup=20, duration_s=duration, chunk=chunk)

    # Cold vs warm, detected by effect: the persistent cache writes a new
    # jit_enhance-<key> entry on every XLA compile (min_compile_time=0), so
    # a new entry since bench start == this run cold-compiled; no new entry
    # == the executable came from the cache. (Checking merely whether SOME
    # jit_enhance-* entry pre-existed is wrong — other enhance programs,
    # e.g. bench_families' per-family variants, leave entries too.)
    import glob

    entries = glob.glob(os.path.join(cache_dir, "jit_enhance-*"))
    wrote_new = any(os.path.getmtime(p) >= bench_start for p in entries)
    compile_state = (
        "cold (new cache entry written this run)" if wrote_new
        else "warm (served from persistent cache)" if entries
        else "unknown (no cache entries)"
    )

    out = {
        "metric": "pix_shuffle 752x576 uint8 RGBA enhance, sustained fps (1 chip, chained)",
        "value": round(res.fps, 2),
        "unit": "fps",
        "vs_baseline": round(res.fps / 60.0, 3),
        "ms_per_frame": round(res.ms_per_call, 3),
        "p50_ms_per_frame": round(res.p50_ms, 3),
        "compile_s": round(res.compile_s, 1),
        "compile_state": compile_state,
        "warm_fresh_process_first_call_s": warm_s,
        "iterations": res.iterations,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "weights": source,
        "compile_cache": cache_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
