"""Functional activation registry.

TPU-native counterpart of the reference's ``model/activations.py`` registry of
20 activations (activations.py:69-95) including the custom TeLU, ScaledTanh,
SinLU, BiasedReLU and BiasedPReLU modules (activations.py:6-65).

Design: activations are pure functions over (params, x). Learnable activations
(prelu, sinlu, biased_relu, biased_prelu) carry their parameters in a small
pytree created by :func:`init_activation`; parameter-free activations get an
empty dict so every activation slot has a uniform interface — this keeps model
param pytrees homogeneous and shardable.

Layout: tensors are NHWC (TPU-native); "per-channel" parameters broadcast over
the trailing channel axis.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Parameter-free activation bodies
# ---------------------------------------------------------------------------

def _identity(x):
    return x


def _relu(x):
    return jax.nn.relu(x)


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _tanh(x):
    return jnp.tanh(x)


def _silu(x):
    return jax.nn.silu(x)


def _mish(x):
    # x * tanh(softplus(x)) — matches torch.nn.Mish
    return x * jnp.tanh(jax.nn.softplus(x))


def _gelu(x, approximate: str = "none"):
    # torch.nn.GELU(approximate='none'|'tanh'); default is the exact erf
    # form. The tanh variant is searched by the reference's prune_act_r2
    # study (optuna_study_prune_act_r2.py:152-155).
    if approximate not in ("none", "tanh"):
        raise ValueError(
            f"gelu approximate must be 'none' or 'tanh', got {approximate!r}"
        )
    return jax.nn.gelu(x, approximate=(approximate == "tanh"))


def _telu(x):
    """TeLU: x * tanh(exp(x)) (reference activations.py:6-12)."""
    return x * jnp.tanh(jnp.exp(x))


def _scaled_tanh(x):
    """(tanh(x) + 1) / 2 — maps to [0, 1] (reference activations.py:14-20)."""
    return (jnp.tanh(x) + 1.0) * 0.5


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------
# Each entry: (has_params, default_config)
_SIMPLE = {
    "identity": _identity,
    "relu": _relu,
    "relu6": _relu6,
    "sigmoid": _sigmoid,
    "tanh": _tanh,
    "silu": _silu,
    "swish": _silu,  # alias, mirrors reference registry
    "mish": _mish,
    "telu": _telu,
    "scaled_tanh": _scaled_tanh,
}

# Configurable but parameter-free (config values are static python numbers)
_CONFIGURED = {"elu", "gelu", "leaky_relu", "softplus", "softmax", "log_softmax"}

# Learnable-parameter activations
_LEARNABLE = {"prelu", "sinlu", "biased_relu", "biased_prelu"}

ACTIVATION_NAMES = sorted(set(_SIMPLE) | _CONFIGURED | _LEARNABLE)


def _canonical(name: str) -> str:
    n = name.lower()
    if n not in _SIMPLE and n not in _CONFIGURED and n not in _LEARNABLE:
        raise ValueError(
            f"Unsupported activation: '{name}'. Supported: {ACTIVATION_NAMES}"
        )
    return n


# accepted config keys per activation; anything else raises (the reference
# factory passes params into the module constructor, so a misspelled key —
# e.g. negative_slop — raises TypeError there instead of silently running
# with the default; activations.py:99-171)
_ALLOWED_CONFIG: Dict[str, frozenset] = {
    "elu": frozenset({"alpha"}),
    "gelu": frozenset({"approximate"}),
    "leaky_relu": frozenset({"negative_slope"}),
    "softplus": frozenset({"beta", "threshold"}),
    "softmax": frozenset({"axis"}),
    "log_softmax": frozenset({"axis"}),
    "prelu": frozenset({"num_parameters", "init"}),
    "sinlu": frozenset(),
    "biased_relu": frozenset({"num_parameters"}),
    "biased_prelu": frozenset({"num_parameters", "init"}),
}


def _check_config(n: str, config: Dict[str, Any]) -> None:
    allowed = _ALLOWED_CONFIG.get(n, frozenset())
    unknown = set(config) - allowed
    if unknown:
        hint = ""
        if "dim" in unknown and n in ("softmax", "log_softmax"):
            hint = (" (this NHWC port takes 'axis'; torch NCHW 'dim' values "
                    "don't translate 1:1 — channel softmax is axis=-1)")
        raise TypeError(
            f"activation '{n}' got unexpected config key(s) "
            f"{sorted(unknown)}; allowed: {sorted(allowed)}{hint}"
        )


def init_activation(
    key: jax.Array, name: str, config: Optional[Dict[str, Any]] = None
) -> Params:
    """Create the parameter pytree for an activation slot.

    ``config`` mirrors the reference factory's ``params`` kwarg
    (activations.py:99-171): e.g. ``{'num_parameters': 36}`` for per-channel
    prelu variants, ``{'negative_slope': 0.05}`` for leaky_relu (static,
    therefore not stored in the pytree), ``{'init': 0.3}`` for prelu slope.
    """
    n = _canonical(name)
    config = dict(config or {})
    _check_config(n, config)
    if n == "prelu":
        num = int(config.get("num_parameters", 1))
        init = float(config.get("init", 0.25))
        return {"slope": jnp.full((num,), init, dtype=jnp.float32)}
    if n == "sinlu":
        # SinLU: sigmoid(x) * (x + a*sin(b*x)), a=b=1 at init
        # (reference activations.py:22-32)
        return {
            "a": jnp.ones((1,), dtype=jnp.float32),
            "b": jnp.ones((1,), dtype=jnp.float32),
        }
    if n == "biased_relu":
        num = int(config.get("num_parameters", 1))
        bias = jax.random.uniform(key, (num,), jnp.float32, -0.1, 0.1)
        return {"bias": bias}
    if n == "biased_prelu":
        num = int(config.get("num_parameters", 1))
        init = float(config.get("init", 0.25))
        bias = jax.random.uniform(key, (num,), jnp.float32, -0.1, 0.1)
        return {"bias": bias, "slope": jnp.full((num,), init, dtype=jnp.float32)}
    return {}


def _bcast_channel(p: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (num_parameters,) vector across the NHWC channel axis.

    Per-channel when num_parameters == C (reference BiasedReLU semantics,
    activations.py:42-48); scalar broadcast otherwise.
    """
    if p.shape[0] == x.shape[-1]:
        return p.reshape((1,) * (x.ndim - 1) + (p.shape[0],)).astype(x.dtype)
    if p.shape[0] != 1:
        raise ValueError(
            f"activation has {p.shape[0]} per-channel parameters but the "
            f"input has {x.shape[-1]} channels (torch would raise here too)"
        )
    return p.reshape(-1)[0].astype(x.dtype)


def apply_activation(
    name: str,
    params: Params,
    x: jnp.ndarray,
    config: Optional[Dict[str, Any]] = None,
) -> jnp.ndarray:
    """Apply activation ``name`` with pytree ``params`` and static ``config``."""
    n = _canonical(name)
    config = dict(config or {})
    _check_config(n, config)

    if n in _SIMPLE:
        return _SIMPLE[n](x)

    if n == "elu":
        alpha = float(config.get("alpha", 1.0))
        return jax.nn.elu(x, alpha=alpha)
    if n == "gelu":
        return _gelu(x, str(config.get("approximate", "none")))
    if n == "leaky_relu":
        slope = float(config.get("negative_slope", 0.01))
        return jax.nn.leaky_relu(x, negative_slope=slope)
    if n == "softplus":
        beta = float(config.get("beta", 1.0))
        threshold = float(config.get("threshold", 20.0))
        # torch switches to identity above threshold for numerical stability
        scaled = x * beta
        return jnp.where(scaled > threshold, x, jax.nn.softplus(scaled) / beta)
    if n == "softmax":
        axis = int(config.get("axis", -1))
        return jax.nn.softmax(x, axis=axis)
    if n == "log_softmax":
        axis = int(config.get("axis", -1))
        return jax.nn.log_softmax(x, axis=axis)

    if n == "prelu":
        slope = _bcast_channel(params["slope"], x)
        return jnp.where(x >= 0, x, slope * x)
    if n == "sinlu":
        a = params["a"].reshape(())[...].astype(x.dtype)
        b = params["b"].reshape(())[...].astype(x.dtype)
        return jax.nn.sigmoid(x) * (x + a * jnp.sin(b * x))
    if n == "biased_relu":
        bias = _bcast_channel(params["bias"], x)
        return jax.nn.relu(x - bias)
    if n == "biased_prelu":
        bias = _bcast_channel(params["bias"], x)
        slope = _bcast_channel(params["slope"], x)
        shifted = x - bias
        return jnp.where(shifted >= 0, shifted, slope * shifted)

    raise AssertionError(f"unreachable: {n}")
