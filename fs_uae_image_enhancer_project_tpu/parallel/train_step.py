"""The jitted multi-chip training step.

One function covers the reference trainer's inner loop semantics
(train.py:160-193): forward in low precision, loss, backward, gradient
accumulation over micro-batches, optimizer step — but TPU-native:

- gradient accumulation is a ``lax.scan`` over the micro axis *inside* the
  jitted step (no Python-side accumulation state),
- batch-parallel (dp) and spatial (sp) sharding are expressed with
  jax.sharding constraints; XLA inserts the gradient all-reduce and conv halo
  exchanges over ICI,
- mixed precision is bf16 compute / fp32 params + fp32 loss reduction (the
  TPU-native counterpart of the reference's AMP fp16 + GradScaler; bf16 needs
  no loss scaling),
- batchnorm models return updated running stats functionally (buffers ride in
  the train state, excluded from the optimizer).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import accum_batch_sharding


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any  # trainable params (fp32)
    buffers: Any  # non-trainable (batchnorm running stats); {} if none
    opt_state: Any


def split_bn_buffers(params: Dict) -> Tuple[Dict, Dict]:
    """Split batchnorm running stats out of a conv_stack param pytree.

    Returns (trainable, buffers); buffers is {} for models without BN.
    """
    trainable, buffers = {}, {}
    for k, v in params.items():
        if k.startswith("bn") and isinstance(v, dict) and "mean" in v:
            trainable[k] = {"scale": v["scale"], "bias": v["bias"]}
            buffers[k] = {"mean": v["mean"], "var": v["var"]}
        else:
            trainable[k] = v
    return trainable, buffers


def merge_bn_buffers(trainable: Dict, buffers: Dict) -> Dict:
    if not buffers:
        return trainable
    merged = dict(trainable)
    for k, stats in buffers.items():
        merged[k] = {**trainable[k], **stats}
    return merged


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    lr_decay_rate: float = 0.955,
    steps_per_epoch: Optional[int] = None,
) -> optax.GradientTransformation:
    """Adam(wd=1e-5) + per-epoch ExponentialLR(gamma=0.955), matching the
    reference trainer (train.py:142-143). torch's Adam weight_decay is L2
    regularization folded into the gradient before the moments, which is
    optax add_decayed_weights *before* scale_by_adam."""
    if steps_per_epoch:
        schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=steps_per_epoch,
            decay_rate=lr_decay_rate,
            staircase=True,
        )
    else:
        schedule = lr
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def make_train_step(
    model_apply: Callable,
    criterion: Callable,
    optimizer: optax.GradientTransformation,
    *,
    has_batchnorm: bool = False,
    compute_dtype=jnp.bfloat16,
    mesh: Optional[Mesh] = None,
    input_transform: Optional[Callable] = None,
):
    """Build ``train_step(state, lr_batch, hr_batch) -> (state, loss)``.

    Batches are shaped (micro, per_micro, H, W, C): the leading axis is
    scanned for gradient accumulation (reference accumulation_steps,
    train.py:180-193); per_micro is the on-device batch, sharded over dp.
    ``input_transform`` (e.g. data.dataset.batch_transform for uint8-transfer
    batches) runs per micro-batch on device, after sharding — so the host
    link carries bytes, not floats.
    """
    if input_transform is None:
        input_transform = lambda x: x  # noqa: E731

    def loss_fn(trainable, buffers, lr_mb, hr_mb):
        params = merge_bn_buffers(trainable, buffers)
        lr_mb = input_transform(lr_mb)
        hr_mb = input_transform(hr_mb)
        x = lr_mb.astype(compute_dtype)
        if has_batchnorm:
            y, bn_updates = model_apply(params, x, train=True)
            # keep only the running stats: scale/bias are trainable params
            bn_updates = {
                k: {"mean": v["mean"], "var": v["var"]}
                for k, v in bn_updates.items()
            }
        else:
            y = model_apply(params, x)
            bn_updates = {}
        loss = criterion(y.astype(jnp.float32), hr_mb.astype(jnp.float32))
        return loss, bn_updates

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, lr_batch, hr_batch):
        if mesh is not None:
            bspec = accum_batch_sharding(mesh)
            lr_batch = jax.lax.with_sharding_constraint(lr_batch, bspec)
            hr_batch = jax.lax.with_sharding_constraint(hr_batch, bspec)

        def micro(carry, mb):
            grads_acc, buffers, loss_acc = carry
            lr_mb, hr_mb = mb
            (loss, bn_updates), grads = grad_fn(
                state.params, buffers, lr_mb, hr_mb
            )
            new_buffers = {**buffers, **bn_updates} if bn_updates else buffers
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_buffers, loss_acc + loss), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        n_micro = lr_batch.shape[0]
        (grads, buffers, loss_sum), _ = jax.lax.scan(
            micro, (zero_grads, state.buffers, 0.0), (lr_batch, hr_batch)
        )
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, buffers, opt_state)
        return new_state, loss_sum / n_micro

    return train_step


def init_train_state(
    params: Dict,
    optimizer: optax.GradientTransformation,
    *,
    has_batchnorm: bool = False,
) -> TrainState:
    if has_batchnorm:
        trainable, buffers = split_bn_buffers(params)
    else:
        trainable, buffers = params, {}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainable,
        buffers=buffers,
        opt_state=optimizer.init(trainable),
    )
