"""Flax network zoo for system identification.

Re-designs of the reference sys-ID model zoo (legged_gym/models/*, SURVEY.md
§2.2) with the same architectures expressed as flax modules; LSTMs unroll
with `lax.scan` (time-major inside, batch-first API) and everything jits:

* MLPGenerator      — 5-layer LeakyReLU(0.2)+Tanh MLP, per-dim sigmoid
                      mapped into `output_range` (models/rough_gen.py:6-31)
* MLPDiscriminator  — LSTM(d->d) over time, mean-pool, 5-layer MLP +
                      sigmoid (models/rough_disc.py:5-36)
* MLPCritic         — 3-layer MLP, linear output (models/critic.py:4-16),
                      the WGAN-GP critic
* LSTMIdentifier    — LSTM encoder, last step, 3 Linear/LeakyReLU head
                      (models/LSTM.py:25-43) regressing the 10-d
                      (friction^6, mass, com^3) parameter vector
* AttentionModel    — BiLSTM + additive attention + MLP (models/attention.py)
* TransformerGenerator / TransformerDiscriminator — encoder-based pair
                      (models/generator.py / models/discriminator.py)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

leaky = lambda x: nn.leaky_relu(x, negative_slope=0.2)


def _range_map(x, output_range: Tuple[Tuple[float, float], ...]):
    lo = jnp.asarray([r[0] for r in output_range])
    hi = jnp.asarray([r[1] for r in output_range])
    return jax.nn.sigmoid(x) * (hi - lo) + lo


class MLPGenerator(nn.Module):
    """Noise -> physical parameters inside `output_range`."""

    out_dim: int
    output_range: Tuple[Tuple[float, float], ...]
    hidden: int = 256

    @nn.compact
    def __call__(self, z):
        x = z
        for _ in range(4):
            x = leaky(nn.Dense(self.hidden)(x))
        x = jnp.tanh(nn.Dense(self.out_dim)(x))
        return _range_map(x, self.output_range)


class _ScanLSTM(nn.Module):
    """Batch-first LSTM unrolled over time with lax.scan."""

    hidden: int

    @nn.compact
    def __call__(self, x):  # (B, T, D) -> (B, T, H), (carry)
        cell = nn.OptimizedLSTMCell(self.hidden)
        B = x.shape[0]
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (B,) + x.shape[2:])

        scan = nn.scan(
            lambda c, carry, xt: c(carry, xt),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        carry, ys = scan(cell, carry, x)
        return ys, carry


class MLPDiscriminator(nn.Module):
    """Trajectory (B, T, D) -> per-feature probability (D,)-ish score.

    Follows the reference quirk of mean-pooling over the *batch-of-windows*
    dimension (rough_disc.py:33 pools dim 0), yielding one score vector per
    forward call; we pool over time instead when `pool_time=True` (the
    sane variant) — default matches the reference.
    """

    hidden: int = 128
    out_dim: int = 27
    pool_time: bool = True

    @nn.compact
    def __call__(self, x):
        ys, _ = _ScanLSTM(x.shape[-1])(x)
        pooled = jnp.mean(ys, axis=1) if self.pool_time else jnp.mean(ys, axis=0)
        h = pooled
        for _ in range(4):
            h = leaky(nn.Dense(self.hidden)(h))
        return jax.nn.sigmoid(nn.Dense(self.out_dim)(h))


class MLPCritic(nn.Module):
    """WGAN critic: (B, T, D) flattened window -> scalar score (no sigmoid)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            ys, _ = _ScanLSTM(x.shape[-1])(x)
            x = jnp.mean(ys, axis=1)
        h = leaky(nn.Dense(self.hidden)(x))
        h = leaky(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)


class LSTMIdentifier(nn.Module):
    """Supervised identifier: obs window -> (fric^6, mass, com^3)."""

    hidden: int = 512
    out_dim: int = 10

    @nn.compact
    def __call__(self, x):  # (B, T, 27)
        ys, _ = _ScanLSTM(self.hidden)(x)
        h = ys[:, -1]  # last timestep (models/LSTM.py:29-31)
        h = leaky(nn.Dense(self.hidden // 2)(h))
        h = leaky(nn.Dense(self.hidden // 4)(h))
        return nn.Dense(self.out_dim)(h)


class AttentionModel(nn.Module):
    """BiLSTM + additive attention + MLP head (models/attention.py:16-33)."""

    hidden: int = 256
    out_dim: int = 10

    @nn.compact
    def __call__(self, x):
        fwd, _ = _ScanLSTM(self.hidden)(x)
        bwd, _ = _ScanLSTM(self.hidden)(jnp.flip(x, axis=1))
        ys = jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)
        # additive attention
        scores = nn.Dense(1)(jnp.tanh(nn.Dense(self.hidden)(ys)))  # (B,T,1)
        attn = jax.nn.softmax(scores, axis=1)
        ctx = jnp.sum(attn * ys, axis=1)
        h = leaky(nn.Dense(self.hidden)(ctx))
        return nn.Dense(self.out_dim)(h)


class _EncoderBlock(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.heads)(y, y)
        x = x + y
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.dim * 4)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


def _posenc(T, D, dtype=jnp.float32):
    pos = jnp.arange(T)[:, None]
    i = jnp.arange(D // 2)[None, :]
    ang = pos / jnp.power(10000.0, 2 * i / D)
    pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return pe.astype(dtype)


class TransformerGenerator(nn.Module):
    """Noise sequence -> bounded parameter sequence (models/generator.py)."""

    out_dim: int
    output_range: Tuple[Tuple[float, float], ...]
    dim: int = 64
    layers: int = 2

    @nn.compact
    def __call__(self, z):  # (B, T, zdim)
        x = nn.Dense(self.dim)(z) + _posenc(z.shape[1], self.dim)
        for _ in range(self.layers):
            x = _EncoderBlock(self.dim)(x)
        x = jnp.tanh(nn.Dense(self.out_dim)(x[:, -1]))
        return _range_map(x, self.output_range)


class TransformerDiscriminator(nn.Module):
    """Trajectory -> probability (models/discriminator.py:5-24)."""

    dim: int = 64
    layers: int = 2

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        h = nn.Dense(self.dim)(x) + _posenc(x.shape[1], self.dim)
        for _ in range(self.layers):
            h = _EncoderBlock(self.dim)(h)
        return jax.nn.sigmoid(nn.Dense(1)(h[:, -1]))
