"""Actuator network: ANYdrive v3 LSTM evaluated inside the jitted step.

Replaces the TorchScript LSTM actuator net the reference loads for the
Anymal tasks (reference envs/anymal_c/anymal.py:52-81, asset
resources/actuator_nets/anydrive_v3_lstm.pt; enabled by
anymal_c_rough_config.py:70-71): a 2-layer LSTM(2 -> 8 -> 8) + Linear(8 -> 1)
mapping per-joint (position error, velocity) to torque, with hidden/cell
state kept per env x joint and zeroed on reset.

Weights are baked from the reference TorchScript file to JSON
(scripts/bake_assets.py) and evaluated as pure JAX — the "actuator-net
in-the-loop dynamics" mode of BASELINE.json configs[3].
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ASSET = os.path.join(os.path.dirname(__file__), "_assets",
                      "actuator_anydrive_v3_lstm.json")

HIDDEN = 8
LAYERS = 2


class ActuatorWeights(NamedTuple):
    w_ih: Tuple[jax.Array, ...]  # per layer (4H, in)
    w_hh: Tuple[jax.Array, ...]  # per layer (4H, H)
    b: Tuple[jax.Array, ...]  # per layer (4H,) = b_ih + b_hh
    w_out: jax.Array  # (1, H)
    b_out: jax.Array  # (1,)
    in_scale: jax.Array  # (2,)  input normalization (pos_err*2, vel*0.25)
    out_scale: jax.Array  # ()   torque denormalization (x20 N*m)


@lru_cache(maxsize=1)
def load_anydrive_weights() -> ActuatorWeights:
    with open(_ASSET) as f:
        w = {k: np.asarray(v, np.float32) for k, v in json.load(f).items()}
    return ActuatorWeights(
        w_ih=tuple(jnp.asarray(w[f"lstm.weight_ih_l{i}"]) for i in range(LAYERS)),
        w_hh=tuple(jnp.asarray(w[f"lstm.weight_hh_l{i}"]) for i in range(LAYERS)),
        b=tuple(jnp.asarray(w[f"lstm.bias_ih_l{i}"] + w[f"lstm.bias_hh_l{i}"])
                for i in range(LAYERS)),
        w_out=jnp.asarray(w["linear.weight"]),
        b_out=jnp.asarray(w["linear.bias"]),
        in_scale=jnp.asarray(w["in_scale"]).reshape(2),
        out_scale=jnp.asarray(w["out_scale"]).reshape(()),
    )


def init_carry(batch_shape: Tuple[int, ...]) -> jax.Array:
    """(..., LAYERS, 2, HIDDEN) zeros — h and c per layer (anymal.py:62-69)."""
    return jnp.zeros(batch_shape + (LAYERS, 2, HIDDEN))


def _lstm_cell(w_ih, w_hh, b, x, h, c):
    """Torch gate order i, f, g, o."""
    gates = x @ w_ih.T + h @ w_hh.T + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def actuator_net_torque(weights: ActuatorWeights, carry: jax.Array,
                        pos_err: jax.Array, vel: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """One LSTM tick: (pos_err, vel) per joint -> torque.

    carry: (..., nj, LAYERS, 2, HIDDEN); pos_err/vel: (..., nj).
    Returns (torque (..., nj), new carry).  Mirrors anymal.py:71-81.
    """
    x = jnp.stack([pos_err, vel], axis=-1) * weights.in_scale  # (..., nj, 2)
    new_layers = []
    for l in range(LAYERS):
        h = carry[..., l, 0, :]
        c = carry[..., l, 1, :]
        h, c = _lstm_cell(weights.w_ih[l], weights.w_hh[l], weights.b[l],
                          x, h, c)
        new_layers.append(jnp.stack([h, c], axis=-2))
        x = h
    torque = (x @ weights.w_out.T + weights.b_out)[..., 0] * weights.out_scale
    new_carry = jnp.stack(new_layers, axis=-3)
    return torque, new_carry
