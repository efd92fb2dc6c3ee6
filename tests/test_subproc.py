"""Deadline-safe readiness waits (utils/subproc.wait_for_line)."""
import subprocess
import sys
import time


def _spawn(code):
    return subprocess.Popen([sys.executable, "-u", "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def test_token_found():
    from fs_uae_image_enhancer_project_tpu.utils.subproc import wait_for_line

    proc = _spawn("print('warming'); print('READY now'); "
                  "import time; time.sleep(30)")
    t0 = time.monotonic()
    ok, lines = wait_for_line(proc, "READY", timeout=20)
    assert ok and any("READY" in l for l in lines)
    assert time.monotonic() - t0 < 15
    proc.kill()
    proc.wait()


def test_silent_child_times_out():
    """A child that prints nothing must not block past the deadline
    (readline() alone would hang forever)."""
    from fs_uae_image_enhancer_project_tpu.utils.subproc import wait_for_line

    proc = _spawn("import time; time.sleep(60)")
    t0 = time.monotonic()
    ok, lines = wait_for_line(proc, "READY", timeout=2)
    assert not ok and lines == []
    assert time.monotonic() - t0 < 10
    proc.kill()
    proc.wait()


def test_retry_after_timeout_sees_token():
    """Regression: retrying wait_for_line on the same proc must resume the
    SAME pump/queue — a per-call pump races the retry and can steal the
    token line (printed between or during the calls) and discard it."""
    from fs_uae_image_enhancer_project_tpu.utils.subproc import wait_for_line

    proc = _spawn("import time; time.sleep(4); print('READY late'); "
                  "time.sleep(30)")
    ok, _ = wait_for_line(proc, "READY", timeout=1)
    assert not ok
    time.sleep(5)  # token is printed while no consumer is waiting
    ok, lines = wait_for_line(proc, "READY", timeout=20)
    assert ok and any("READY" in l for l in lines)
    proc.kill()
    proc.wait()


def test_eof_returns_false():
    from fs_uae_image_enhancer_project_tpu.utils.subproc import wait_for_line

    proc = _spawn("print('goodbye')")
    ok, lines = wait_for_line(proc, "READY", timeout=20)
    assert not ok and lines == ["goodbye\n"]
    proc.wait()
