"""Pallas TPU kernel: the entire pix_shuffle conv stack fused in VMEM.

One kernel runs all 7 convolutions + activations + skips of the production
model over an H-strip of the half-resolution tensor, so no intermediate
activation ever round-trips HBM. The conv is expressed as 9 roll-shifted
(M, Cin) x (Cin, Cout) MXU matmuls over the row-flattened strip:

    out[r, c] = sum_{dy, dx} in[r+dy, c+dx-1] @ W[dy, dx]

With one zero column padded on each side of W and zero pads re-applied after
every layer, `pltpu.roll` of the flattened (rows*Wp, C) buffer by 1-dx is an
EXACT SAME-boundary column shift: every wrapped element lands on a zero pad
(including the two buffer-edge wraps, which land on corner pads).

Strips carry a 7-row halo per side (one per conv); per-strip row budget:
46 in -> conv1 44 -> conv2 42 -> conv3 40 -> conv4 38 -> conv5 36 ->
conv6 34 -> conv7 32 out. The layer-6 concat is computed as a split matmul
(two Cin=36 halves summed) to avoid materializing the 72-channel concat.

Status on this environment (see docs/PERF.md): the kernel is numerically
validated against the fp32 reference forward (and is MORE accurate than the
bf16 XLA path — fp32 carries stay in VMEM), but this environment's remote
TPU compile helper is SIGKILLed compiling the 63-matmul Mosaic graph at any
strip size (the smaller Pallas dither kernel compiles fine, so this is a
helper memory cap, not a kernel defect). On a dedicated TPU with in-process
Mosaic compilation this is the speed-of-light path: it removes ~112 MB/frame
of inter-layer HBM traffic, which dominates once compute drops to ~0.2 ms on
full v5e silicon.

Supports the production "lightweight" topology (model_pix_shuffle.py:304-311)
with its exact activation chain; other configs fall back to the XLA path.
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, dict]

HALO = 7  # rows per side: one per conv
STRIP = 16  # output rows per grid step (compile-memory bound on the remote helper)

# (cin, cout) per conv for the lightweight config
_LIGHT_CHANNELS = [(12, 36), (36, 36), (36, 72), (72, 72), (72, 36), (72, 36), (36, 12)]


def supports_config(cfg) -> bool:
    chans = [l.out_channels for l in cfg.layers]
    return chans == [36, 36, 72, 72, 36, 36, 12] and all(
        l.kernel_size == 3 for l in cfg.layers
    )


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------

def _conv3x3(x, rows_out, wp, cin, cout, w, b):
    """x: (rows_out+2, wp, cin) bf16 -> (rows_out, wp, cout) bf16.

    w: (9*cin, cout); b: (1, cout). Accumulates fp32 on the MXU.
    """
    m = rows_out * wp
    acc = jnp.zeros((m, cout), jnp.float32)
    for dy in range(3):
        x_dy = x[dy : dy + rows_out].reshape(m, cin)
        for dx in range(3):
            # static circular shift by 1-dx rows of the flattened buffer
            # (Mosaic's rotate doesn't support bf16; slice+concat does)
            if dx == 1:
                shifted = x_dy
            elif dx == 0:  # shifted[m] = x[m-1]
                shifted = jnp.concatenate([x_dy[m - 1 :], x_dy[: m - 1]], axis=0)
            else:  # dx == 2: shifted[m] = x[m+1]
                shifted = jnp.concatenate([x_dy[1:], x_dy[:1]], axis=0)
            tap = w[(dy * 3 + dx) * cin : (dy * 3 + dx + 1) * cin, :]
            acc += jax.lax.dot_general(
                shifted, tap,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b.astype(jnp.float32)
    return acc.reshape(rows_out, wp, cout)


def _mask_pads(x, abs_row_start, h_half):
    """Zero the W pad columns AND any rows outside the image extent.

    Rows outside [HALO, HALO+h_half) in padded coordinates are the H halo:
    per-layer SAME convolution zero-pads there, but a fused stack would
    otherwise propagate features-of-zeros (bias + activation != 0) through
    the halo — masking after every layer restores exact per-layer-zero-pad
    semantics at the image's top/bottom edges.
    """
    wp = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + abs_row_start
    ok = (col > 0) & (col < wp - 1) & (row >= HALO) & (row < HALO + h_half)
    return jnp.where(ok, x, 0.0).astype(x.dtype)


def _sinlu(x, a, b):
    return jax.nn.sigmoid(x) * (x + a * jnp.sin(b * x))


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _telu(x):
    return x * jnp.tanh(jnp.exp(x))


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _biased_prelu(x, bias, slope):
    s = x - bias
    return jnp.where(s >= 0, s, slope * s)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _stack_kernel(
    # inputs
    x_ref,  # (H + 2*HALO, wp, 12) bf16, H- and W-padded with zeros
    w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6a, w6b, b6, w7, b7,
    a1a, a1b,  # l1 sinlu a, b
    a2a, a2b,  # l2_act3 sinlu a, b
    p2b, p2s,  # l2_act4 biased_prelu bias, slope (1, 36)
    p4b, p4s,  # l4_act2 biased_prelu (1, 72)
    p7b, p7s,  # l7_act2 biased_prelu (1, 1)
    # output
    out_ref,  # (STRIP, wp, 12) block
    *,
    wp: int,
    h_half: int,
):
    i = pl.program_id(0)
    base = i * STRIP
    f32 = jnp.float32

    def scalar(ref):
        return ref[0, 0].astype(f32)

    # input strip: STRIP + 14 rows starting at i*STRIP in padded coords
    x = x_ref[pl.ds(i * STRIP, STRIP + 2 * HALO), :, :].astype(jnp.bfloat16)

    # layer 1: conv + sinlu + relu6 (rows 46 -> 44)
    t = _conv3x3(x, STRIP + 12, wp, 12, 36, w1[...], b1[...])
    t = _relu6(_sinlu(t, scalar(a1a), scalar(a1b)))
    l1 = _mask_pads(t, base + 1, h_half).astype(jnp.bfloat16)  # (44, wp, 36)

    # layer 2: conv + telu, add l1 skip, sinlu + biased_prelu (44 -> 42)
    t = _conv3x3(l1, STRIP + 10, wp, 36, 36, w2[...], b2[...])
    t = _telu(t)
    t = t + l1[1 : STRIP + 11].astype(f32)
    t = _sinlu(t, scalar(a2a), scalar(a2b))
    t = _biased_prelu(t, p2b[...].astype(f32), p2s[...].astype(f32))
    l2 = _mask_pads(t, base + 2, h_half).astype(jnp.bfloat16)  # (42, wp, 36)

    # layer 3: conv, identity acts (42 -> 40)
    t = _conv3x3(l2, STRIP + 8, wp, 36, 72, w3[...], b3[...])
    l3 = _mask_pads(t, base + 3, h_half).astype(jnp.bfloat16)  # (40, wp, 72)

    # layer 4: conv + mish + biased_prelu, add l3 skip, tanh + relu (40 -> 38)
    t = _conv3x3(l3, STRIP + 6, wp, 72, 72, w4[...], b4[...])
    t = _biased_prelu(_mish(t), p4b[...].astype(f32), p4s[...].astype(f32))
    t = t + l3[1 : STRIP + 7].astype(f32)
    t = jax.nn.relu(jnp.tanh(t))
    l4 = _mask_pads(t, base + 4, h_half).astype(jnp.bfloat16)  # (38, wp, 72)

    # layer 5: conv, identity acts (38 -> 36)
    t = _conv3x3(l4, STRIP + 4, wp, 72, 36, w5[...], b5[...])
    l5 = _mask_pads(t, base + 5, h_half).astype(jnp.bfloat16)  # (36, wp, 36)

    # layer 6: conv over concat(l1, l5) as split matmuls + mish + relu6 (36 -> 34)
    ta = _conv3x3(l1[4 : STRIP + 8], STRIP + 2, wp, 36, 36, w6a[...], b6[...])
    tb = _conv3x3(l5, STRIP + 2, wp, 36, 36, w6b[...], jnp.zeros_like(b6[...]))
    t = _relu6(_mish(ta + tb))
    l6 = _mask_pads(t, base + 6, h_half).astype(jnp.bfloat16)  # (34, wp, 36)

    # layer 7: conv + biased_prelu(1) (34 -> 32)
    t = _conv3x3(l6, STRIP, wp, 36, 12, w7[...], b7[...])
    t = _biased_prelu(t, scalar(p7b), scalar(p7s))
    out_ref[...] = _mask_pads(t, base + 7, h_half).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _prep_weights(params: Params):
    """Flatten conv weights to (9*cin, cout) and collect act params."""

    def w_of(name, cin, cout, col_slice=None):
        w = np.asarray(params[name]["w"], np.float32)  # (3,3,cin_full,cout)
        if col_slice is not None:
            w = w[:, :, col_slice, :]
        assert w.shape[2:] == (cin, cout), (name, w.shape)
        return jnp.asarray(
            w.reshape(9 * cin, cout), jnp.bfloat16
        )

    def b_of(name, cout):
        return jnp.asarray(
            np.asarray(params[name]["b"], np.float32).reshape(1, cout), jnp.float32
        )

    def act2d(slot, leaf, n):
        v = np.asarray(params[slot][leaf], np.float32).reshape(-1)
        if v.size == 1:
            v = np.full((n,), v[0], np.float32)
        return jnp.asarray(v.reshape(1, n), jnp.float32)

    def act_scalar(slot, leaf):
        return jnp.asarray(
            np.asarray(params[slot][leaf], np.float32).reshape(1, 1), jnp.float32
        )

    args = [
        w_of("conv1", 12, 36), b_of("conv1", 36),
        w_of("conv2", 36, 36), b_of("conv2", 36),
        w_of("conv3", 36, 72), b_of("conv3", 72),
        w_of("conv4", 72, 72), b_of("conv4", 72),
        w_of("conv5", 72, 36), b_of("conv5", 36),
        w_of("conv6", 36, 36, slice(0, 36)),   # long-skip half
        w_of("conv6", 36, 36, slice(36, 72)),  # l5 half
        b_of("conv6", 36),
        w_of("conv7", 36, 12), b_of("conv7", 12),
        act_scalar("l1_act1", "a"), act_scalar("l1_act1", "b"),
        act_scalar("l2_act3", "a"), act_scalar("l2_act3", "b"),
        act2d("l2_act4", "bias", 36), act2d("l2_act4", "slope", 36),
        act2d("l4_act2", "bias", 72), act2d("l4_act2", "slope", 72),
        act_scalar("l7_act2", "bias"), act_scalar("l7_act2", "slope"),
    ]
    return args


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_stack(x_padded: jnp.ndarray, *weight_args, interpret: bool):
    hp, wp, _ = x_padded.shape
    h_out = hp - 2 * HALO
    grid = (h_out // STRIP,)
    kernel = functools.partial(_stack_kernel, wp=wp, h_half=h_out)
    space = pltpu.ANY if interpret else pltpu.VMEM
    in_specs = [pl.BlockSpec((hp, wp, 12), lambda i: (0, 0, 0), memory_space=space)]
    for arg in weight_args:
        in_specs.append(
            pl.BlockSpec(
                arg.shape,
                lambda i, r=len(arg.shape): (0,) * r,  # bind rank per-arg
                memory_space=space,
            )
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h_out, wp, 12), jnp.bfloat16),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (STRIP, wp, 12), lambda i: (i, 0, 0), memory_space=space
        ),
        interpret=interpret,
    )(x_padded, *weight_args)


def fused_stack_apply(
    params: Params, x: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """Drop-in replacement for models.pix_shuffle.apply (lightweight config):
    x (N, H, W, 3) linear float -> (N, H, W, 3). N must be 1; H/2 must be a
    multiple of STRIP; W/2 + 2 should be lane-friendly (376+2=378 is fine).
    """
    from ...ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, _ = x.shape
    if n != 1 or (h // 2) % STRIP:
        raise ValueError(f"fused stack needs N=1 and H/2 % {STRIP} == 0, got {x.shape}")
    identity = x
    u = pixel_unshuffle(x, 2)[0]  # (h/2, w/2, 12)
    u = u.astype(jnp.bfloat16)
    # pad: HALO zero rows top/bottom, 1 zero column left/right
    up = jnp.pad(u, ((HALO, HALO), (1, 1), (0, 0)))
    weight_args = _prep_weights(params)
    y = _run_stack(up, *weight_args, interpret=interpret)
    y = y[:, 1:-1, :].astype(x.dtype)  # strip W pads
    y = pixel_shuffle(y[None], 2)
    return jax.nn.relu(identity + y)
