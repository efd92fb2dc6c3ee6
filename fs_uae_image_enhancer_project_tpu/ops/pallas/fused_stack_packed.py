"""Width-packed (P=2) fused pix_shuffle stack — the lane-packing formulation.

Round 1's fused kernel (fused_stack.py) is MXU-lane-bound: its im2col
matmuls have N = cout in {12,36,72} of the 128-wide array and lose to XLA's
conv lowering (8.6 vs 6.9 ms/frame). This kernel lifts N by packing TWO
consecutive output pixels per matmul row (the space-to-depth formulation —
what XLA's lowering does internally), measured first in isolation
(scripts/bench_lane_packing.py, TPU v5e):

    class          (m,K)x(K,N) baseline -> packed-2        speedup
    l2/l6 36->36   (9216,324)x(324,36)  -> (4608,432)x(432,72)   1.63x
    l4    72->72   (9216,648)x(648,72)  -> (4608,864)x(864,144)  2.74x
    l5    72->36   (9216,648)x(648,36)  -> (4608,864)x(864,72)   1.40x
    l7    36->12   (9216,324)x(324,12)  -> (4608,432)x(432,24)   1.98x

Formulation. All tensors are width-GROUPED by pairs, wq = wu/2. A 3x3 conv
producing the even-phase output pair (ungrouped cols 2t, 2t+1) needs exactly
columns {2t-1..2t+2} = A[t] || O[t], where O[t] = odd phase (cols 2t+1,
2t+2) and A[t] = O[t-1]. Each layer's conv-input buffer stores the
lane-concat [A || O] (rows, wq, 4C), materialized ONCE at store time from
the masked fp32 even-phase value (_make_shifted: lane rotate by C + sublane
roll + lane select + one within-row group shift — all 32-bit ops, verified
on hardware). A conv window is then just three contiguous row-block reads
(one per dy) reshaped and lane-concatenated to the (m/2, 12cin) operand,
against block-structured weights (12cin, 2cout) with 25% structural zeros —
the lane-fill trade the numbers above show the MXU takes gladly. No
per-consumer roll and no fp32 round trip of whole buffers (the first,
flat-roll formulation of this kernel paid both per conv, and its full-buffer
roll+slice composition also miscompiled on hardware — git history
300ab7b^..300ab7b has it). Strip pipeline, carries, halos and per-layer
re-masking are inherited 1:1 from fused_stack.py; layers whose output feeds
a residual skip (l1, l3) additionally keep an even-phase buffer.

Reference behaviour being reproduced: model_pix_shuffle.py:227-298 forward,
lightweight config (model_pix_shuffle.py:304-311).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_stack import (
    HALO,
    STRIP,
    _biased_prelu,
    _mish,
    _relu6,
    _sinlu,
    _telu,
    supports_config,
    supports_shape,
)

Params = Dict[str, dict]


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------

def _conv3x3_packed(src_ref, src_row0: int, rows_out: int, wq: int,
                    cin: int, cout: int, w_ref, b):
    """3x3 SAME conv over an [A || O] grouped buffer (rows, wq, 4*cin).

    Buffers store, per group t, the lane-concat of A[t] = O[t-1] (the
    one-group-left shift, materialized once at store time via _make_shifted)
    and O[t] (odd phase, ungrouped cols 2t+1, 2t+2) — so each conv window is
    just a contiguous row-block read: matmul row t is the output pair at
    ungrouped columns (2t, 2t+1), whose 3x3 windows union to columns
    {2t-1..2t+2} = A[t] || O[t]. Three dy row-block reads reshape+concat to
    the (m, 12cin) operand against host-packed (12cin, 2cout) weights.
    No per-conv roll, no fp32 round trip of the whole buffer — the VPU cost
    the flat-roll formulation paid per consumer is paid once per producer.
    """
    m = rows_out * wq
    pieces = []
    for dy in range(3):
        blk = src_ref[pl.ds(src_row0 + dy, rows_out), :, :]
        pieces.append(blk.reshape(m, 4 * cin))
    op = jnp.concatenate(pieces, axis=1)  # (m, 12cin)
    acc = jax.lax.dot_general(
        op, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += b.astype(jnp.float32)
    return acc.reshape(rows_out, wq, 2 * cout)


def _mask_pads_grouped(x, abs_row_start, h_half, w_valid):
    """Zero pad columns / out-of-image rows of a grouped (rows, wq, 2C)
    value. Ungrouped column of lane l in group q is 2q + (l >= C); valid
    image columns are [2, 2 + w_valid) (two left pad columns)."""
    C = x.shape[2] // 2
    grp = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    col = 2 * grp + (lane >= C).astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + abs_row_start
    ok = (
        (col >= 2) & (col < 2 + w_valid)
        & (row >= HALO) & (row < HALO + h_half)
    )
    return jnp.where(ok, x, 0.0).astype(x.dtype)


def _make_odd(e_val):
    """Odd-phase view O[q] = (cols 2q+1, 2q+2) of a masked even-phase value.

    O[q]_lo = E[q]_hi and O[q]_hi = E[q+1]_lo: lane-rotate by C brings each
    group's halves into the opposite position, a sublane roll by -1 (on the
    flattened rows) brings E[q+1], and a lane select stitches them. The roll
    wraps the very last group onto E[0]_lo — a masked pad column, zero.
    All three ops are 32-bit (fp32 value), which Mosaic supports.
    """
    rows, wq, c2 = e_val.shape
    C = c2 // 2
    flat = e_val.reshape(rows * wq, c2)
    r = pltpu.roll(flat, C, axis=1)
    r_next = pltpu.roll(r, rows * wq - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
    o = jnp.where(lane < C, r, r_next)
    return o.reshape(rows, wq, c2)


def _make_shifted(e_val):
    """[A || O] conv-input value from a masked even-phase fp32 value.

    O = _make_odd(E); A[t] = O[t-1] via a within-row sublane roll — the
    cross-row element the flat roll would fetch is a pad group in both
    cases, zero after masking, so the per-row wrap is equivalent.
    """
    o = _make_odd(e_val)
    a = pltpu.roll(o, 1, axis=1)
    return jnp.concatenate([a, o], axis=2)


def _store(dst_ref, start: int, rows: int, value) -> None:
    """Same contract as fused_stack._store (spare zero top row, zeros below
    the write so rolled windows wrap onto zeros, carries preserved)."""
    zero_row = jnp.zeros(dst_ref.shape[1:], dst_ref.dtype)
    dst_ref[0, :, :] = zero_row
    dst_ref[pl.ds(start, rows), :, :] = value.astype(dst_ref.dtype)
    for r in range(start + rows, dst_ref.shape[0]):
        dst_ref[r, :, :] = zero_row


def _carry(dst_ref, src_start: int, n: int) -> None:
    v = dst_ref[pl.ds(src_start, n), :, :]
    dst_ref[pl.ds(1, n), :, :] = v


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _stack_kernel(
    # inputs
    x_ref,  # (H + 2*HALO, wq, 48) bf16 — [A || O] grouped input
    w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6a, w6b, b6, w7, b7,
    a1a, a1b, a2a, a2b, p2b, p2s, p4b, p4s, p7b, p7s,
    # output
    out_ref,  # (STRIP, wq, 24) even-phase grouped block
    # scratch — O (odd-phase) per layer; E kept only where skips read buffers
    in_o,  # (S+16, wq, 48)
    o1,      # (S+14, wq, 144)
    e1,      # (S+14, wq, 72)
    o2,      # (S+12, wq, 144)
    o3,      # (S+10, wq, 288)
    e3,      # (S+10, wq, 144)
    o4,      # (S+8, wq, 288)
    o5,      # (S+6, wq, 144)
    o6,      # (S+4, wq, 144)
    *,
    wq: int,
    h_half: int,
    w_valid: int,
):
    i = pl.program_id(0)
    base = i * STRIP
    S = STRIP
    f32 = jnp.float32

    def scalar(ref):
        return ref[0, 0].astype(f32)

    def mask(t, abs_row_start):
        return _mask_pads_grouped(t, abs_row_start, h_half, w_valid)

    @pl.when(i == 0)
    def _first_strip():
        _store(in_o, 1, S + 14, x_ref[pl.ds(0, S + 14), :, :])

        t = _conv3x3_packed(in_o, 1, S + 12, wq, 12, 36, w1, b1[...])
        t = _relu6(_sinlu(t, scalar(a1a), scalar(a1b)))
        l1 = mask(t, 1)
        _store(e1, 1, S + 12, l1)
        _store(o1, 1, S + 12, _make_shifted(l1))

        t = _conv3x3_packed(o1, 1, S + 10, wq, 36, 36, w2, b2[...])
        t = _telu(t)
        t = t + l1[1 : S + 11]
        t = _sinlu(t, scalar(a2a), scalar(a2b))
        t = _biased_prelu(t, p2b[...].astype(f32), p2s[...].astype(f32))
        l2 = mask(t, 2)
        _store(o2, 1, S + 10, _make_shifted(l2))

        t = _conv3x3_packed(o2, 1, S + 8, wq, 36, 72, w3, b3[...])
        l3 = mask(t, 3)
        _store(e3, 1, S + 8, l3)
        _store(o3, 1, S + 8, _make_shifted(l3))

        t = _conv3x3_packed(o3, 1, S + 6, wq, 72, 72, w4, b4[...])
        t = _biased_prelu(_mish(t), p4b[...].astype(f32), p4s[...].astype(f32))
        t = t + l3[1 : S + 7]
        t = jax.nn.relu(jnp.tanh(t))
        l4 = mask(t, 4)
        _store(o4, 1, S + 6, _make_shifted(l4))

        t = _conv3x3_packed(o4, 1, S + 4, wq, 72, 36, w5, b5[...])
        l5 = mask(t, 5)
        _store(o5, 1, S + 4, _make_shifted(l5))

        ta = _conv3x3_packed(o1, 5, S + 2, wq, 36, 36, w6a, b6[...])
        tb = _conv3x3_packed(o5, 1, S + 2, wq, 36, 36, w6b,
                             jnp.zeros_like(b6[...]))
        t = _relu6(_mish(ta + tb))
        l6 = mask(t, 6)
        _store(o6, 1, S + 2, _make_shifted(l6))

        t = _conv3x3_packed(o6, 1, S, wq, 36, 12, w7, b7[...])
        t = _biased_prelu(t, scalar(p7b), scalar(p7s))
        out_ref[...] = mask(t, 7).astype(out_ref.dtype)

        _carry(o1, S + 3, 10)
        _carry(e1, S + 3, 10)
        _carry(o2, S + 9, 2)
        _carry(o3, S + 7, 2)
        _carry(e3, S + 7, 2)
        _carry(o4, S + 5, 2)
        _carry(o5, S + 3, 2)
        _carry(o6, S + 1, 2)

    @pl.when(i > 0)
    def _steady_strip():
        _store(in_o, 1, S + 2, x_ref[pl.ds(base + 12, S + 2), :, :])

        t = _conv3x3_packed(in_o, 1, S, wq, 12, 36, w1, b1[...])
        t = _relu6(_sinlu(t, scalar(a1a), scalar(a1b)))
        l1 = mask(t, base + 13)
        _store(e1, 11, S, l1)
        _store(o1, 11, S, _make_shifted(l1))

        t = _conv3x3_packed(o1, 9, S, wq, 36, 36, w2, b2[...])
        t = _telu(t)
        t = t + e1[pl.ds(10, S), :, :].astype(f32)
        t = _sinlu(t, scalar(a2a), scalar(a2b))
        t = _biased_prelu(t, p2b[...].astype(f32), p2s[...].astype(f32))
        l2 = mask(t, base + 12)
        _store(o2, 3, S, _make_shifted(l2))

        t = _conv3x3_packed(o2, 1, S, wq, 36, 72, w3, b3[...])
        l3 = mask(t, base + 11)
        _store(e3, 3, S, l3)
        _store(o3, 3, S, _make_shifted(l3))

        t = _conv3x3_packed(o3, 1, S, wq, 72, 72, w4, b4[...])
        t = _biased_prelu(_mish(t), p4b[...].astype(f32), p4s[...].astype(f32))
        t = t + e3[pl.ds(2, S), :, :].astype(f32)
        t = jax.nn.relu(jnp.tanh(t))
        l4 = mask(t, base + 10)
        _store(o4, 3, S, _make_shifted(l4))

        t = _conv3x3_packed(o4, 1, S, wq, 72, 36, w5, b5[...])
        l5 = mask(t, base + 9)
        _store(o5, 3, S, _make_shifted(l5))

        ta = _conv3x3_packed(o1, 5, S, wq, 36, 36, w6a, b6[...])
        tb = _conv3x3_packed(o5, 1, S, wq, 36, 36, w6b,
                             jnp.zeros_like(b6[...]))
        t = _relu6(_mish(ta + tb))
        l6 = mask(t, base + 8)
        _store(o6, 3, S, _make_shifted(l6))

        t = _conv3x3_packed(o6, 1, S, wq, 36, 12, w7, b7[...])
        t = _biased_prelu(t, scalar(p7b), scalar(p7s))
        out_ref[...] = mask(t, base + 7).astype(out_ref.dtype)

        _carry(o1, S + 1, 10)
        _carry(e1, S + 1, 10)
        _carry(o2, S + 1, 2)
        _carry(o3, S + 1, 2)
        _carry(e3, S + 1, 2)
        _carry(o4, S + 1, 2)
        _carry(o5, S + 1, 2)
        _carry(o6, S + 1, 2)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _pack_conv_weight(w: np.ndarray) -> np.ndarray:
    """(3,3,cin,cout) -> (12*cin, 2*cout) packed-pair im2col weights.

    Operand lane layout (matches _conv3x3_packed): for dy in 0..2, the
    window pair [A=O[t-1] (cols 2t-1, 2t), B=O[t] (cols 2t+1, 2t+2)], each
    group's lanes being (pair_offset, cin). Output columns (p, cout) with
    p=0 -> ungrouped col 2t, p=1 -> col 2t+1. Tap (dy, dx) of output col c
    reads input col c-1+dx:
        p=0: dx0 -> (A,0)  dx1 -> (A,1)  dx2 -> (B,0)
        p=1: dx0 -> (A,1)  dx1 -> (B,0)  dx2 -> (B,1)
    The (A,0,p=1) and (B,1,p=0) blocks are structural zeros (25% of K).
    """
    _, _, cin, cout = w.shape
    w2 = np.zeros((3, 2, 2, cin, 2, cout), np.float32)  # dy,u,xoff,cin,p,cout
    for dy in range(3):
        w2[dy, 0, 0, :, 0, :] = w[dy, 0]  # A0 -> p0 dx0
        w2[dy, 0, 1, :, 0, :] = w[dy, 1]  # A1 -> p0 dx1
        w2[dy, 1, 0, :, 0, :] = w[dy, 2]  # B0 -> p0 dx2
        w2[dy, 0, 1, :, 1, :] = w[dy, 0]  # A1 -> p1 dx0
        w2[dy, 1, 0, :, 1, :] = w[dy, 1]  # B0 -> p1 dx1
        w2[dy, 1, 1, :, 1, :] = w[dy, 2]  # B1 -> p1 dx2
    return w2.reshape(12 * cin, 2 * cout)


_PREP_CACHE: dict = {}


def _prep_weights_cached(params: Params):
    """Per-params cache (see fused_stack._prep_weights_cached): avoids a
    device->host->device weight round trip per unjitted call. Keyed on the
    LEAF array ids (not the dict id), so in-place dict updates cannot serve
    stale packed weights; the stored strong references keep the leaf ids
    from being recycled."""
    import jax as _jax

    leaves = _jax.tree_util.tree_leaves(params)
    key = tuple(map(id, leaves))
    hit = _PREP_CACHE.get(key)
    if hit is None:
        _PREP_CACHE.clear()
        hit = (leaves, _prep_weights(params))
        _PREP_CACHE[key] = hit
    return hit[1]


def _prep_weights(params: Params):
    """Pack conv weights to (12cin, 2cout) and tile per-channel act params
    across the pair lanes."""

    def w_of(name, cin, cout, col_slice=None):
        w = np.asarray(params[name]["w"], np.float32)
        if col_slice is not None:
            w = w[:, :, col_slice, :]
        assert w.shape[2:] == (cin, cout), (name, w.shape)
        return jnp.asarray(_pack_conv_weight(w), jnp.bfloat16)

    def b_of(name, cout):
        b = np.asarray(params[name]["b"], np.float32).reshape(cout)
        return jnp.asarray(np.tile(b, 2).reshape(1, 2 * cout), jnp.float32)

    def act2d(slot, leaf, n):
        v = np.asarray(params[slot][leaf], np.float32).reshape(-1)
        if v.size == 1:
            v = np.full((n,), v[0], np.float32)
        return jnp.asarray(np.tile(v, 2).reshape(1, 2 * n), jnp.float32)

    def act_scalar(slot, leaf):
        return jnp.asarray(
            np.asarray(params[slot][leaf], np.float32).reshape(1, 1), jnp.float32
        )

    return [
        w_of("conv1", 12, 36), b_of("conv1", 36),
        w_of("conv2", 36, 36), b_of("conv2", 36),
        w_of("conv3", 36, 72), b_of("conv3", 72),
        w_of("conv4", 72, 72), b_of("conv4", 72),
        w_of("conv5", 72, 36), b_of("conv5", 36),
        w_of("conv6", 36, 36, slice(0, 36)),
        w_of("conv6", 36, 36, slice(36, 72)),
        b_of("conv6", 36),
        w_of("conv7", 36, 12), b_of("conv7", 12),
        act_scalar("l1_act1", "a"), act_scalar("l1_act1", "b"),
        act_scalar("l2_act3", "a"), act_scalar("l2_act3", "b"),
        act2d("l2_act4", "bias", 36), act2d("l2_act4", "slope", 36),
        act2d("l4_act2", "bias", 72), act2d("l4_act2", "slope", 72),
        act_scalar("l7_act2", "bias"), act_scalar("l7_act2", "slope"),
    ]


@functools.partial(jax.jit, static_argnames=("interpret", "w_valid"))
def _run_stack(x_grouped: jnp.ndarray, *weight_args, interpret: bool,
               w_valid: int):
    hp, wq, _ = x_grouped.shape
    h_out = hp - 2 * HALO
    grid = (h_out // STRIP,)
    kernel = functools.partial(
        _stack_kernel, wq=wq, h_half=h_out, w_valid=w_valid
    )
    # pl.ANY (pltpu.ANY is deprecated); fall back for older jax
    any_space = getattr(pl, "ANY", None) or pltpu.ANY
    space = any_space if interpret else pltpu.VMEM
    in_specs = [pl.BlockSpec((hp, wq, 48), lambda i: (0, 0, 0), memory_space=space)]
    for arg in weight_args:
        in_specs.append(
            pl.BlockSpec(
                arg.shape,
                lambda i, r=len(arg.shape): (0,) * r,
                memory_space=space,
            )
        )
    S = STRIP
    scratch = [
        pltpu.VMEM((S + 2 * HALO + 2, wq, 48), jnp.bfloat16),  # in_o
        pltpu.VMEM((S + 14, wq, 144), jnp.bfloat16),  # o1
        pltpu.VMEM((S + 14, wq, 72), jnp.bfloat16),   # e1
        pltpu.VMEM((S + 12, wq, 144), jnp.bfloat16),  # o2
        pltpu.VMEM((S + 10, wq, 288), jnp.bfloat16),  # o3
        pltpu.VMEM((S + 10, wq, 144), jnp.bfloat16),  # e3
        pltpu.VMEM((S + 8, wq, 288), jnp.bfloat16),   # o4
        pltpu.VMEM((S + 6, wq, 144), jnp.bfloat16),   # o5
        pltpu.VMEM((S + 4, wq, 144), jnp.bfloat16),   # o6
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h_out, wq, 24), jnp.bfloat16),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (STRIP, wq, 24), lambda i: (i, 0, 0), memory_space=space
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(x_grouped, *weight_args)


def fused_stack_packed_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    interpret: bool | None = None,
    cfg=None,
    fallback: bool = True,
) -> jnp.ndarray:
    """Drop-in pix_shuffle forward via the width-packed fused kernel.

    Same contract and fallback semantics as fused_stack.fused_stack_apply.
    """
    from ...models.pix_shuffle import apply as xla_apply, lightweight_config
    from ...ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

    if cfg is None:
        cfg = lightweight_config()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not (supports_shape(x.shape) and supports_config(cfg)):
        if fallback:
            return xla_apply(params, x, cfg)
        raise ValueError(
            f"packed fused stack needs the lightweight config, N=1 and "
            f"H/2 % {STRIP} == 0, got {x.shape}"
        )
    identity = x
    u = pixel_unshuffle(x, 2)[0]  # (h/2, w/2, 12)
    u = u.astype(jnp.bfloat16)
    h2, w2u, _ = u.shape
    # 2 left pad cols; round ungrouped width to a multiple of 16 (wq mult. of
    # 8 for sublane-merge alignment) with >= 2 right pads, +1 extra col so
    # the odd-phase slice [1, wu+1) exists
    wu = ((w2u + 4 + 15) // 16) * 16
    up = jnp.pad(u, ((HALO, HALO), (2, wu + 1 - 2 - w2u), (0, 0)))
    o_in = up[:, 1 : wu + 1, :].reshape(h2 + 2 * HALO, wu // 2, 24)
    a_in = jnp.pad(o_in[:, :-1, :], ((0, 0), (1, 0), (0, 0)))  # A[t] = O[t-1]
    o_in = jnp.concatenate([a_in, o_in], axis=2)  # (hp, wq, 48)
    weight_args = _prep_weights_cached(params)
    y = _run_stack(o_in, *weight_args, interpret=interpret, w_valid=w2u)
    y = y.reshape(h2, wu, 12)[:, 2 : 2 + w2u, :].astype(x.dtype)
    y = pixel_shuffle(y[None], 2)
    return jax.nn.relu(identity + y)
