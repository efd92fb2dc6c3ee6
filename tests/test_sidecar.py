"""End-to-end tests for the emulator-facing enhance sidecar.

Spawns the real server CLI in a subprocess (CPU backend, small geometry so
the full pix_shuffle forward stays fast) and drives it through the Python
client and — when the native build exists — the C replay tool, validating
the wire protocol, pipelining semantics, and bit-exactness vs the in-process
enhance function.
"""
import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W = 64, 96


@pytest.fixture(scope="module")
def server():
    sock = f"/tmp/test_sidecar_{os.getpid()}.sock"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prev if prev else "")
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "fs_uae_image_enhancer_project_tpu.runtime.sidecar",
         "--socket", sock, "--height", str(H), "--width", str(W),
         "--depth", "2"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    from fs_uae_image_enhancer_project_tpu.utils.subproc import wait_for_line

    # deadline-safe wait: readline() alone would block past the deadline if
    # the server stalls silently before its first log line
    ready, lines = wait_for_line(proc, "SIDECAR_READY", timeout=300)
    if not ready:
        proc.kill()
        pytest.fail(f"server never became ready:\n{''.join(lines)}")
    yield sock
    if proc.poll() is None:
        from fs_uae_image_enhancer_project_tpu.runtime.sidecar import (
            SidecarClient,
        )

        try:
            c = SidecarClient(sock)
            c.shutdown_server()
            c.close()
        except Exception:
            proc.kill()
    proc.wait(timeout=60)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (H, W, 4), np.uint8) for _ in range(n)]


def test_pipelined_roundtrip(server):
    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import SidecarClient

    client = SidecarClient(server)
    assert (client.h, client.w, client.depth) == (H, W, 2)
    frames = _frames(5)
    outs = [client.submit(f) for f in frames]
    # depth=2: first two submits warm the pipeline
    assert outs[0] is None and outs[1] is None
    assert all(o is not None for o in outs[2:])
    tail = list(client.drain())
    assert len(tail) == 2
    results = [o for o in outs if o is not None] + tail
    assert len(results) == 5
    for out in results:
        assert out.shape == (H, W, 4) and out.dtype == np.uint8
        assert np.all(out[..., 3] == 255)  # alpha forced opaque
    client.close()


def test_matches_in_process_enhance(server):
    """Sidecar output must match calling the enhance fn directly (same
    weights resolution path). Not bit-exact: the server is a separate
    process whose XLA CPU bf16 codegen may differ slightly from this
    (8-virtual-device) pytest process — measured max 9/255 levels, ~48 dB;
    the bar is the project's >=40 dB cross-process parity floor."""
    import jax.numpy as jnp

    from conftest import psnr
    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import (
        SidecarClient, build_enhance_fn,
    )

    frame = _frames(1, seed=7)[0]
    client = SidecarClient(server)
    client.submit(frame)
    out = list(client.drain())[0]
    client.close()

    fn = build_enhance_fn()
    direct = np.asarray(fn(jnp.asarray(frame[None])))[0]
    assert psnr(out, direct) >= 40.0
    assert np.abs(out.astype(int) - direct.astype(int)).max() <= 16


def test_c_replay_tool(server):
    """Drive the native C client against the live server."""
    binary = os.path.join(REPO, "runtime", "build", "sidecar_replay")
    if not os.path.exists(binary):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "runtime")],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(binary):
            pytest.skip("native sidecar_replay not buildable here")
    frame = _frames(1, seed=3)[0]
    raw_in = f"/tmp/test_sidecar_in_{os.getpid()}.raw"
    raw_out = f"/tmp/test_sidecar_out_{os.getpid()}.raw"
    frame.tofile(raw_in)
    r = subprocess.run([binary, server, raw_in, raw_out, "4"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert '"frames": 4' in r.stdout
    out = np.fromfile(raw_out, np.uint8).reshape(H, W, 4)
    assert np.all(out[..., 3] == 255)
    # same frame every loop -> output must equal the python-client result
    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import SidecarClient

    client = SidecarClient(server)
    client.submit(frame)
    expect = list(client.drain())[0]
    client.close()
    np.testing.assert_array_equal(out, expect)
    os.unlink(raw_in)
    os.unlink(raw_out)


def _inprocess_server(depth):
    """Protocol-level server on a thread with a trivial enhance fn — tests
    wire semantics without paying a subprocess jax startup."""
    import threading

    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import (
        SidecarClient, SidecarServer,
    )

    def invert(x):
        import jax.numpy as jnp

        rgb = 255 - x[..., :3]
        alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
        return jnp.concatenate([rgb, alpha], axis=-1)

    sock = f"/tmp/test_sidecar_inproc_{os.getpid()}_{depth}.sock"
    server = SidecarServer(invert, sock, height=H, width=W, depth=depth,
                           verbose=0)
    server.bind()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return sock, t, SidecarClient


def test_sync_mode_depth0():
    """depth=0: every submit returns its own enhanced frame immediately."""
    sock, thread, SidecarClient = _inprocess_server(0)
    client = SidecarClient(sock)
    assert client.depth == 0
    for f in _frames(3, seed=11):
        out = client.submit(f)
        assert out is not None and out.shape == (H, W, 4)
        np.testing.assert_array_equal(out[..., :3], 255 - f[..., :3])
    client.shutdown_server()
    client.close()
    thread.join(timeout=30)
    assert not thread.is_alive()


def test_latency_stats_written(tmp_path):
    """--stats: server-side per-frame latency summary + histogram on exit,
    counting every frame (pipelined ones surface via submit or drain)."""
    import json
    import threading

    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import (
        SidecarClient, SidecarServer,
    )

    def invert(x):
        import jax.numpy as jnp

        rgb = 255 - x[..., :3]
        alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
        return jnp.concatenate([rgb, alpha], axis=-1)

    stats_path = tmp_path / "lat.json"
    sock = f"/tmp/test_sidecar_lat_{os.getpid()}.sock"
    server = SidecarServer(invert, sock, height=H, width=W, depth=2,
                           verbose=0, stats_path=str(stats_path))
    server.bind()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    client = SidecarClient(sock)
    n = 6
    for f in _frames(n, seed=3):
        client.submit(f)
    client.drain()
    client.shutdown_server()
    client.close()
    t.join(timeout=30)
    assert not t.is_alive()

    stats = json.loads(stats_path.read_text())
    assert stats["frames"] == n  # in-flight tail measured during drain too
    assert stats["depth"] == 2
    assert 0.0 < stats["p50_ms"] <= stats["p90_ms"] <= stats["p99_ms"]
    assert stats["min_ms"] <= stats["p50_ms"] <= stats["max_ms"]
    assert sum(stats["histogram"]["counts"]) == n
    assert "EXCLUDING socket RTT" in stats["definition"]


def test_concurrent_clients_inprocess():
    """N clients served simultaneously, each with an independent pipeline;
    per-client outputs must equal what a lone client would get."""
    import threading

    sock, thread, SidecarClient = _inprocess_server(1)
    n_clients, n_frames = 3, 6
    results = [None] * n_clients
    errors = []

    def drive(idx):
        try:
            client = SidecarClient(sock)
            frames = _frames(n_frames, seed=100 + idx)
            outs = [client.submit(f) for f in frames]
            assert outs[0] is None  # depth=1 warmup, per client
            got = [o for o in outs if o is not None] + list(client.drain())
            client.close()
            results[idx] = (frames, got)
        except Exception as e:  # surface in the main thread
            errors.append((idx, e))

    drivers = [threading.Thread(target=drive, args=(i,))
               for i in range(n_clients)]
    for d in drivers:
        d.start()
    for d in drivers:
        d.join(timeout=60)
    assert not errors, errors
    for frames, got in results:
        assert len(got) == n_frames
        for f, o in zip(frames, got):  # FIFO order per client
            np.testing.assert_array_equal(o[..., :3], 255 - f[..., :3])
    # server still alive: one more client can connect and shut it down
    c = SidecarClient(sock)
    c.shutdown_server()
    c.close()
    thread.join(timeout=30)
    assert not thread.is_alive()


def test_shutdown_unblocks_other_clients():
    """OP_SHUTDOWN from one client stops the server even while another
    client is idle inside recv."""
    sock, thread, SidecarClient = _inprocess_server(0)
    idle = SidecarClient(sock)  # connected, never sends
    killer = SidecarClient(sock)
    killer.shutdown_server()
    killer.close()
    thread.join(timeout=30)
    assert not thread.is_alive()
    idle.close()


def test_concurrent_clients_subprocess(server):
    """Two clients against the real jax-backed server: same frame in, the
    lone-client result out for both."""
    import threading

    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import SidecarClient

    frame = _frames(1, seed=21)[0]
    solo = SidecarClient(server)
    solo.submit(frame)
    expect = list(solo.drain())[0]
    solo.close()

    outs = [None, None]
    errors = []

    def drive(idx):
        try:
            c = SidecarClient(server)
            for _ in range(3):
                c.submit(frame)
            outs[idx] = (list(c.drain()))[-1]
            c.close()
        except Exception as e:
            errors.append((idx, e))

    ts = [threading.Thread(target=drive, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errors, errors
    for out in outs:
        np.testing.assert_array_equal(out, expect)


def test_reconnect_after_disconnect():
    """Server survives a client disconnect and accepts the next one."""
    sock, thread, SidecarClient = _inprocess_server(1)
    c1 = SidecarClient(sock)
    c1.submit(_frames(1)[0])
    c1.close()  # disconnect with one frame in flight
    c2 = SidecarClient(sock)
    out = c2.submit(_frames(1, seed=5)[0])
    assert out is None  # fresh pipeline
    assert len(list(c2.drain())) == 1
    c2.shutdown_server()
    c2.close()
    thread.join(timeout=30)


def test_python_replay_loops_output_mapping(tmp_path):
    """sidecar_replay --loops 2: every saved PNG must hold the enhancement
    of the SAME-named input (regression: responses used to be keyed by a
    len(outputs) counter, which mis-labels every frame once a name repeats)."""
    from fs_uae_image_enhancer_project_tpu.runtime import sidecar_replay
    from PIL import Image

    frames_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frames_dir.mkdir()
    frames = _frames(4, seed=77)
    for i, f in enumerate(frames):
        Image.fromarray(f, mode="RGBA").save(frames_dir / f"s{i}.png")

    sock, thread, _ = _inprocess_server(2)
    rc = sidecar_replay.main([
        "--socket", sock, "--frames", str(frames_dir),
        "--out", str(out_dir), "--loops", "2", "--shutdown",
    ])
    assert rc == 0
    for i, f in enumerate(frames):
        saved = np.asarray(Image.open(out_dir / f"s{i}.png"))
        np.testing.assert_array_equal(saved[..., :3], 255 - f[..., :3])
    thread.join(timeout=30)
    assert not thread.is_alive()


def test_drain_is_eager_even_when_result_ignored(server):
    """drain() flushes in-flight frames even if the caller never iterates
    the result (it was a generator whose OP_DRAIN send only happened on
    first iteration, silently dropping frames and desyncing _pending)."""
    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import SidecarClient

    client = SidecarClient(server)
    frames = _frames(3, seed=4)
    for f in frames[:2]:  # fill the depth-2 pipeline, read nothing
        assert client.submit(f) is None
    client.drain()  # result intentionally discarded
    assert client._pending == 0
    # the session is back in sync: a fresh depth-2 cycle behaves like new
    outs = [client.submit(f) for f in frames]
    assert outs[0] is None and outs[1] is None and outs[2] is not None
    tail = client.drain()
    assert isinstance(tail, list) and len(tail) == 2
    client.close()


def test_server_rejects_unencodable_geometry():
    """depth/height/width outside the handshake's u8/u16 ranges fail at
    construction, not as a struct.error after minutes of warmup."""
    from fs_uae_image_enhancer_project_tpu.runtime.sidecar import (
        SidecarServer,
    )

    with pytest.raises(ValueError, match="depth"):
        SidecarServer(lambda x: x, "/tmp/unused.sock", depth=256)
    with pytest.raises(ValueError, match="u16"):
        SidecarServer(lambda x: x, "/tmp/unused.sock", height=70000)
