"""load_params must restore checkpoints written under a different device set.

TPU-trained checkpoints carry orbax sharding metadata naming the devices
they were saved on; a targetless restore replays that metadata and fails on
any host without those devices ("Device TPU v5 lite0 was not found in
jax.local_devices()") — which breaks every offline/CPU consumer of trained
weights (export, eval_headtohead, artifact builds). load_params therefore
builds its restore target from the checkpoint's own item_metadata as
abstract arrays placed on a LOCAL device (train/trainer.py).

Reproduced here without a TPU: the saver child runs with 8 virtual CPU
devices and places params on device 7; the restoring child runs with ONE
device, so the saved sharding names a device absent at restore time —
the same mismatch class as TPU-saved -> CPU-restored.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SAVER = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp
from fs_uae_image_enhancer_project_tpu.models import get_model
from fs_uae_image_enhancer_project_tpu.train.trainer import (
    TrainState, save_checkpoint,
)

m = get_model("pix_shuffle")
params = jax.device_put(m.init(jax.random.key(0)), jax.devices()[7])
save_checkpoint(
    %(path)r,
    TrainState(step=jnp.zeros((), jnp.int32), params=params,
               buffers={}, opt_state=()),
)
print("saved on", jax.devices()[7])
"""

RESTORER = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
import jax.numpy as jnp
from fs_uae_image_enhancer_project_tpu.models import get_model
from fs_uae_image_enhancer_project_tpu.train.trainer import load_params

m = get_model("pix_shuffle")
params = load_params(%(path)r, m.init(jax.random.key(0)))
y = m.apply(params, jnp.zeros((1, 32, 48, 3), jnp.bfloat16))
print("restored+applied", y.shape)
"""


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prev if prev else "")
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=420,
    )


def test_load_params_across_device_sets(tmp_path):
    ck = str(tmp_path / "ckpt")
    r = _run(SAVER % {"path": ck})
    assert r.returncode == 0, r.stderr
    r = _run(RESTORER % {"path": ck})
    assert r.returncode == 0, r.stderr
    assert "restored+applied" in r.stdout
