"""Generate torch-golden outputs for core-op parity tests.

Run manually (torch-only process — never imports jax, because torch+jax in one
process stalls on this VM's storage):

    python tests/golden_gen/gen_ops_goldens.py

Writes tests/goldens/ops_goldens.npz, which tests/test_ops.py consumes.
The goldens pin the reference's PyTorch semantics for: gamma formulas, all 20
activation functions, pixel (un)shuffle channel ordering, SAME conv2d,
depthwise Laplacian filter, and BatchNorm2d (train + eval).
"""
import os

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

OUT = os.path.join(os.path.dirname(__file__), "..", "goldens", "ops_goldens.npz")
RNG = np.random.default_rng(0)
g = {}

# --- gamma -----------------------------------------------------------------
t = np.linspace(0.0, 1.0, 1001, dtype=np.float32)
tt = torch.from_numpy(t)
g["gamma_t"] = t
g["gamma_srgb_to_linear"] = torch.where(
    tt <= 0.04045, tt / 12.92, ((tt + 0.055) / 1.055) ** 2.4
).numpy()
g["gamma_linear_to_srgb"] = torch.where(
    tt <= 0.0031308, tt * 12.92, 1.055 * tt ** (1 / 2.4) - 0.055
).numpy()
g["gamma_srgb_to_linear_approx"] = (tt ** 2.2).numpy()
g["gamma_linear_to_srgb_approx"] = (tt ** (1 / 2.2)).numpy()

# --- simple activations ------------------------------------------------------
x_act = RNG.normal(0, 2.0, (2, 4, 6, 3)).astype(np.float32)
g["act_x"] = x_act
tx = torch.from_numpy(x_act)
SIMPLE = {
    "identity": tnn.Identity(),
    "relu": tnn.ReLU(),
    "relu6": tnn.ReLU6(),
    "sigmoid": tnn.Sigmoid(),
    "tanh": tnn.Tanh(),
    "silu": tnn.SiLU(),
    "swish": tnn.SiLU(),
    "mish": tnn.Mish(),
    "gelu": tnn.GELU(),
    "elu": tnn.ELU(),
    "leaky_relu": tnn.LeakyReLU(),
    "softplus": tnn.Softplus(),
}
for name, mod in SIMPLE.items():
    g[f"act_{name}"] = mod(tx).numpy()
# gelu tanh approximation (searched by the reference's prune_act_r2,
# optuna_study_prune_act_r2.py:152-155)
g["act_gelu_tanh"] = tnn.GELU(approximate="tanh")(tx).numpy()
# custom formula activations (reference activations.py:6-32)
g["act_telu"] = (tx * torch.tanh(torch.exp(tx))).numpy()
g["act_scaled_tanh"] = ((torch.tanh(tx) + 1.0) * 0.5).numpy()
g["act_sinlu"] = (torch.sigmoid(tx) * (tx + torch.sin(tx))).numpy()  # a=b=1

# --- parameterized activations (NCHW in torch; stored as NHWC) ---------------
def nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))


def to_nhwc(t_):
    return np.transpose(t_.detach().numpy(), (0, 2, 3, 1))


C = 5
xp = RNG.normal(0, 1.5, (2, 4, 4, C)).astype(np.float32)
g["pact_x"] = xp
slope = np.full((C,), 0.3, np.float32)
m = tnn.PReLU(num_parameters=C, init=0.3)
g["prelu_slope"] = slope
g["prelu_out"] = to_nhwc(m(nchw(xp)))

bias = RNG.uniform(-0.1, 0.1, (C,)).astype(np.float32)
g["brelu_bias"] = bias
g["brelu_out"] = to_nhwc(torch.relu(nchw(xp) - torch.from_numpy(bias).view(1, -1, 1, 1)))
pre = tnn.PReLU(num_parameters=C, init=0.25)
g["bprelu_bias"] = bias
g["bprelu_slope"] = np.full((C,), 0.25, np.float32)
g["bprelu_out"] = to_nhwc(pre(nchw(xp) - torch.from_numpy(bias).view(1, -1, 1, 1)))

# --- pixel shuffle ------------------------------------------------------------
for r in (2, 3):
    xu = RNG.normal(size=(2, 6 * r, 4 * r, 3)).astype(np.float32)
    g[f"unshuf{r}_x"] = xu
    g[f"unshuf{r}_out"] = to_nhwc(tnn.PixelUnshuffle(r)(nchw(xu)))
    xs = RNG.normal(size=(2, 6, 4, 3 * r * r)).astype(np.float32)
    g[f"shuf{r}_x"] = xs
    g[f"shuf{r}_out"] = to_nhwc(tnn.PixelShuffle(r)(nchw(xs)))

# --- conv2d --------------------------------------------------------------------
for k in (1, 3, 5):
    cin, cout = 4, 7
    xc = RNG.normal(size=(2, 9, 11, cin)).astype(np.float32)
    w_oihw = RNG.normal(0, 0.2, (cout, cin, k, k)).astype(np.float32)
    b = RNG.normal(0, 0.2, (cout,)).astype(np.float32)
    out = tF.conv2d(
        nchw(xc), torch.from_numpy(w_oihw), torch.from_numpy(b), padding=(k - 1) // 2
    )
    g[f"conv{k}_x"] = xc
    g[f"conv{k}_w_oihw"] = w_oihw
    g[f"conv{k}_b"] = b
    g[f"conv{k}_out"] = to_nhwc(out)

# --- depthwise laplacian --------------------------------------------------------
xl = RNG.normal(size=(1, 8, 8, 3)).astype(np.float32)
lap = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32)
kernel = torch.from_numpy(lap).reshape(1, 1, 3, 3).repeat(3, 1, 1, 1)
g["lap_x"] = xl
g["lap_out"] = to_nhwc(tF.conv2d(nchw(xl), kernel, padding="same", groups=3))

# --- batchnorm -------------------------------------------------------------------
cbn = 6
xb = RNG.normal(size=(4, 5, 5, cbn)).astype(np.float32)
bn_mean = RNG.normal(size=(cbn,)).astype(np.float32)
bn_var = RNG.uniform(0.5, 2.0, (cbn,)).astype(np.float32)
bn_scale = RNG.normal(size=(cbn,)).astype(np.float32)
bn_bias = RNG.normal(size=(cbn,)).astype(np.float32)
g["bn_x"], g["bn_mean"], g["bn_var"], g["bn_scale"], g["bn_bias"] = (
    xb, bn_mean, bn_var, bn_scale, bn_bias,
)
m = tnn.BatchNorm2d(cbn).eval()
with torch.no_grad():
    m.running_mean.copy_(torch.from_numpy(bn_mean))
    m.running_var.copy_(torch.from_numpy(bn_var))
    m.weight.copy_(torch.from_numpy(bn_scale))
    m.bias.copy_(torch.from_numpy(bn_bias))
g["bn_eval_out"] = to_nhwc(m(nchw(xb)))
m2 = tnn.BatchNorm2d(cbn)
with torch.no_grad():
    m2.running_mean.copy_(torch.from_numpy(bn_mean))
    m2.running_var.copy_(torch.from_numpy(bn_var))
    m2.weight.copy_(torch.from_numpy(bn_scale))
    m2.bias.copy_(torch.from_numpy(bn_bias))
g["bn_train_out"] = to_nhwc(m2(nchw(xb)))
g["bn_train_new_mean"] = m2.running_mean.detach().numpy()
g["bn_train_new_var"] = m2.running_var.detach().numpy()

os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **g)
print(f"wrote {OUT} with {len(g)} arrays")
