"""int8 quantization-aware training (QAT) and the int8 conv-stack path.

STATUS (round 4): the int8 question is CLOSED as a measured negative —
this module is the study implementation behind that evidence
(`scripts/bench_int8_qat.py`, `artifacts/int8_qat/report.json`, and the
"int8: measured negative" section of docs/PERF.md). XLA's TPU conv
lowering runs int8xint8->int32 at bf16 rate even at conv3_heavy's
lane-filling 192->256 shape (+3% isolated, device-side fori_loop), so the
quantize/requantize epilogues make every end-to-end int8 path slower
(conv3_heavy 7.10 vs 5.02 ms; pix_shuffle 3.88 vs 3.59). Nothing
dispatches here; all inference stays bf16 with fp32 gamma islands.

Scheme (identical numerics in fake-quant training and int8 deployment):
weights per-output-channel symmetric int8; conv inputs per-tensor symmetric
int8 with static calibrated scales; int32 accumulation; dequantize +
bias + activation in float. Training uses a straight-through estimator and
*distills* the fp32 model's outputs (the parity metric IS output PSNR vs
the fp32 path, so the distillation loss is the deployment objective).

Reference counterpart: none — the reference ships fp16 ONNX and never
quantizes (torch2onnx.py:184-768 casts to fp16 only); this is a
beyond-parity TPU capability.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ConvStackConfig

Params = Dict[str, dict]


# ---------------------------------------------------------------------------
# fake-quant primitives (straight-through estimator)
# ---------------------------------------------------------------------------

def weight_scales(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric scale for an HWIO weight."""
    return jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0


def fq_weight(w: jnp.ndarray) -> jnp.ndarray:
    """STE fake-quant: value path quantizes, gradient path is identity.

    Scales are derived from the *current* weights each step (standard
    LSQ-free QAT), so the deployed per-channel scales are exactly the final
    weights' max-abs — quantize_conv_stack below reproduces them."""
    s = weight_scales(w)
    wq = jnp.clip(jnp.round(w / s), -127, 127) * s
    return w + jax.lax.stop_gradient(wq - w)


def fq_act(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """STE fake-quant of a conv input with a fixed per-tensor scale."""
    xq = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(xq - x)


# ---------------------------------------------------------------------------
# conv-stack (conv3/conv5 family, fused deployment form) int8 paths
# ---------------------------------------------------------------------------

def calibrate_conv_stack(
    params: Params,
    cfg: ConvStackConfig,
    frames: List[np.ndarray],
    *,
    relu_before_residual_add: bool = False,
) -> Dict[str, float]:
    """Per-conv-input max-abs scales over calibration frames (sRGB [0,1]
    float, the conv3/conv5 deployment domain)."""
    n_layers = len(cfg.channels)

    @jax.jit
    def collect(x):
        from ..ops.conv import conv2d

        maxes = {}

        def conv(name, t):
            # record each conv INPUT's max-abs, then run the real conv —
            # _stack_forward supplies the (single-copy) ordering semantics
            maxes[name] = jnp.max(jnp.abs(t))
            return conv2d(params[name], t)

        _stack_forward(conv, x, cfg, relu_before_residual_add)
        return maxes

    out = {f"conv{i + 1}": 0.0 for i in range(n_layers)}
    for f in frames:
        x = jnp.asarray(f, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        for k, v in collect(x).items():
            out[k] = max(out[k], float(v))
    return {k: max(v, 1e-6) / 127.0 for k, v in out.items()}


def _stack_forward(
    conv: Callable[[str, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    cfg: ConvStackConfig,
    relu_before_residual_add: bool,
) -> jnp.ndarray:
    """Shared fused-stack control flow over a pluggable conv op (mirrors
    models/conv_stack.apply_fused; one copy of the semantics)."""
    n_layers = len(cfg.channels)
    for i in range(n_layers):
        skip = x if i in cfg.residual_layers else None
        x = conv(f"conv{i + 1}", x)
        is_last = i == n_layers - 1
        if relu_before_residual_add:
            if not is_last:
                x = jax.nn.relu(x)
            elif cfg.final_act == "sigmoid":
                x = jax.nn.sigmoid(x)
            if skip is not None:
                x = skip + x
        else:
            if skip is not None:
                x = skip + x
            if not is_last:
                x = jax.nn.relu(x)
            elif cfg.final_act == "sigmoid":
                x = jax.nn.sigmoid(x)
    return x


def apply_fused_fakequant(
    params: Params,
    x: jnp.ndarray,
    cfg: ConvStackConfig,
    act_scales: Dict[str, float],
    *,
    relu_before_residual_add: bool = False,
) -> jnp.ndarray:
    """Differentiable int8-simulated forward (QAT training graph)."""
    from ..ops.conv import DIMENSION_NUMBERS

    def conv(name, t):
        p = params[name]
        t = fq_act(t, act_scales[name])
        w = fq_weight(p["w"].astype(t.dtype))
        # no preferred_element_type here: this graph is differentiated
        # (CLAUDE.md — a preferred dtype differing from the input dtype
        # breaks the conv transpose rule); accumulation follows t.dtype,
        # which the QAT study runs as fp32
        y = jax.lax.conv_general_dilated(
            t, w, (1, 1), "SAME", dimension_numbers=DIMENSION_NUMBERS,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(t.dtype)
        if "b" in p:
            y = y + p["b"].astype(t.dtype)
        return y

    return _stack_forward(conv, x, cfg, relu_before_residual_add)


def quantize_conv_stack(params: Params) -> Params:
    """Freeze fused conv-stack weights to int8 (per-cout scales — the same
    scales fq_weight trained against; single-copy scheme in
    export/quantized.quantize_weight)."""
    from .quantized import quantize_weight

    return {name: quantize_weight(p) for name, p in params.items()}


def apply_fused_int8(
    qparams: Params,
    x: jnp.ndarray,
    cfg: ConvStackConfig,
    act_scales: Dict[str, float],
    *,
    relu_before_residual_add: bool = False,
) -> jnp.ndarray:
    """Deployment int8 forward: int8 x int8 -> int32 on the MXU (shared
    kernel: export/quantized._qconv)."""
    from .quantized import _qconv

    def conv(name, t):
        return _qconv(qparams[name], t, act_scales[name])

    return _stack_forward(conv, x, cfg, relu_before_residual_add)


# ---------------------------------------------------------------------------
# QAT distillation finetune
# ---------------------------------------------------------------------------

def qat_distill_conv_stack(
    params: Params,
    cfg: ConvStackConfig,
    sample_batches: List[np.ndarray],
    *,
    relu_before_residual_add: bool = False,
    steps: int = 300,
    lr: float = 2e-5,
    act_scales: Dict[str, float] = None,
    verbose: int = 1,
) -> Tuple[Params, Dict[str, float], List[float]]:
    """Fine-tune fused weights under fake-quant to match the fp32 model.

    ``sample_batches``: NHWC sRGB [0,1] float arrays (crops of real frames).
    Teacher = the fp32 apply_fused of the INITIAL params; student starts at
    the same weights with quantizers inserted. Returns (trained fp32 params,
    act_scales, loss curve). Deploy via quantize_conv_stack + the returned
    act_scales."""
    import optax

    from ..models.conv_stack import apply_fused

    if act_scales is None:
        act_scales = calibrate_conv_stack(
            params, cfg, sample_batches[:4],
            relu_before_residual_add=relu_before_residual_add,
        )
    teacher_params = jax.tree.map(jnp.asarray, params)

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def loss_fn(p, x):
        y_t = apply_fused(
            teacher_params, x, cfg,
            relu_before_residual_add=relu_before_residual_add,
        )
        y_s = apply_fused_fakequant(
            p, x, cfg, act_scales,
            relu_before_residual_add=relu_before_residual_add,
        )
        return jnp.mean(jnp.sqrt((y_s - y_t) ** 2 + 1e-6**2))

    @jax.jit
    def step_fn(p, o, x):
        loss, grads = jax.value_and_grad(loss_fn)(p, x)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    curve: List[float] = []
    for s in range(steps):
        x = jnp.asarray(sample_batches[s % len(sample_batches)])
        params, opt_state, loss = step_fn(params, opt_state, x)
        curve.append(float(loss))
        if verbose and (s % 50 == 0 or s == steps - 1):
            print(f"  qat step {s}: distill loss {curve[-1]:.6f}", flush=True)
    return params, act_scales, curve
