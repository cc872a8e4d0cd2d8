"""PPO with GAE, timeout bootstrapping, adaptive-KL learning rate.

Algorithm parity with rsl_rl v1.0.2's PPO as configured by the reference
(legged_robot_config.py:230-243, SURVEY.md §2.5): clipped surrogate + clipped
value loss, entropy bonus 0.01, 5 epochs x 4 minibatches over the flattened
(T*B) rollout, gamma 0.99 / GAE lambda 0.95, gradient-norm clip 1.0, and the
adaptive learning-rate rule targeting KL 0.01 (lr /1.5 above 2x target,
x1.5 below half target).  Timeout bootstrapping follows rsl_rl
`process_env_step`: on time-outs the reward is augmented with
gamma * V(s) so truncation is not treated as death (the reference wires this
through extras["time_outs"], point_foot.py:286-288).

The full update is one jitted function; under a device mesh the gradient
mean over minibatches is computed with a `psum` inserted automatically by
pjit from the sharding annotations (parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pointfoot_tpu.envs.config import AlgorithmCfg
from pointfoot_tpu.rl.networks import gaussian_entropy, gaussian_log_prob


class Transition(NamedTuple):
    """One rollout step, batched (T, B, ...) after scan stacking."""

    obs: jax.Array
    priv_obs: jax.Array
    action: jax.Array
    reward: jax.Array
    done: jax.Array
    time_out: jax.Array
    value: jax.Array
    log_prob: jax.Array
    mean: jax.Array
    std: jax.Array


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    learning_rate: jax.Array  # adaptive (scalar)
    update_count: jax.Array


def compute_gae(
    rewards, dones, time_outs, values, last_value, gamma: float, lam: float
) -> Tuple[jax.Array, jax.Array]:
    """GAE over a (T, B) rollout with rsl_rl timeout bootstrapping."""
    # bootstrap truncated episodes: r += gamma * V(s) on time-out steps
    rewards = rewards + gamma * values * time_outs

    def scan_fn(carry, inp):
        adv_next, v_next = carry
        r, d, v = inp
        nonterminal = 1.0 - d
        delta = r + gamma * v_next * nonterminal - v
        adv = delta + gamma * lam * nonterminal * adv_next
        return (adv, v), adv

    (_, _), advantages = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value),
        (rewards, dones.astype(rewards.dtype), values),
        reverse=True,
    )
    returns = advantages + values
    return advantages, returns


class PPO:
    """Stateless PPO update operator (state lives in TrainState)."""

    def __init__(self, network, cfg: AlgorithmCfg):
        self.network = network
        self.cfg = cfg
        # base optimizer; LR is injected per-update (adaptive schedule).
        # zero_non_finite guards the optimizer state against an exploded
        # minibatch: optax.zero_nans misses INF, and clip_by_global_norm
        # maps an inf gradient to NaN (inf * 0) which then corrupts the
        # Adam moments PERMANENTLY (observed: an 8k-iteration run froze at
        # it ~2000 with every subsequent update silently zeroed).
        def zero_non_finite():
            def init_fn(params):
                return optax.EmptyState()

            def update_fn(updates, state, params=None):
                updates = jax.tree.map(
                    lambda g: jnp.where(jnp.isfinite(g), g, 0.0), updates)
                return updates, state

            return optax.GradientTransformation(init_fn, update_fn)

        self.tx = optax.chain(
            zero_non_finite(),
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(1.0),  # lr applied manually
        )

    def init_train_state(self, params) -> TrainState:
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            learning_rate=jnp.asarray(self.cfg.learning_rate, jnp.float32),
            update_count=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------

    def _loss_from_outputs(self, mean, std, value, batch: Transition,
                           advantages, returns):
        """Clipped-PPO loss given network outputs — shared by the
        feed-forward (flat minibatch) and recurrent (sequence) paths so the
        surrogate/value-clip/entropy/KL math exists exactly once."""
        cfg = self.cfg
        log_prob = gaussian_log_prob(mean, std, batch.action)
        ratio = jnp.exp(log_prob - batch.log_prob)

        norm_adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        surr1 = ratio * norm_adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param,
                         1.0 + cfg.clip_param) * norm_adv
        surrogate_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        if cfg.use_clipped_value_loss:
            value_clipped = batch.value + jnp.clip(
                value - batch.value, -cfg.clip_param, cfg.clip_param)
            v_loss = jnp.maximum(
                (value - returns) ** 2, (value_clipped - returns) ** 2)
        else:
            v_loss = (value - returns) ** 2
        value_loss = jnp.mean(v_loss)

        entropy = jnp.mean(gaussian_entropy(std))
        loss = (surrogate_loss + cfg.value_loss_coef * value_loss
                - cfg.entropy_coef * entropy)

        # KL(old || new) for the adaptive LR rule (rsl_rl formula)
        kl_per_sample = jnp.sum(
            jnp.log(std / batch.std + 1e-5)
            + (batch.std**2 + (batch.mean - mean) ** 2) / (2.0 * std**2)
            - 0.5,
            axis=-1)
        # Winsorized mean (cfg.kl_winsor, 0 = reference-exact plain mean):
        # a handful of rogue samples (extreme post-push/reset obs) can
        # carry per-sample KL in the hundreds, dragging the MEAN over 98k
        # samples past the LR-drop threshold while the typical divergence
        # is tiny — measured on tpu_r4_storm iters 219k-234k: 31% of
        # iterations read mean KL > 1 with noise_std/eplen flat, railing
        # the adaptive LR to 1e-5 and cutting the EFFECTIVE lr to ~43% of
        # its cap.  Capping each sample's contribution (e.g. at 1.0,
        # ~60x the 0.016 desired_kl) keeps the controller's signal while
        # bounding one sample's vote.
        if getattr(cfg, "kl_winsor", 0.0) > 0.0:
            kl_per_sample = jnp.minimum(kl_per_sample, cfg.kl_winsor)
        kl = jnp.mean(kl_per_sample)
        metrics = dict(surrogate_loss=surrogate_loss, value_loss=value_loss,
                       entropy=entropy, kl=kl)
        return loss, metrics

    def _sgd_step(self, ts: TrainState, grads, metrics) -> TrainState:
        """Optimizer apply + adaptive-KL LR corridor — one implementation
        for both PPO variants (the corridor was once hand-mirrored and is
        easy to drift)."""
        cfg = self.cfg
        updates, new_opt = self.tx.update(grads, ts.opt_state, ts.params)
        updates = jax.tree.map(lambda u: u * ts.learning_rate, updates)
        new_params = optax.apply_updates(ts.params, updates)
        # exploration-noise rails (cfg.max/min_noise_std): see
        # AlgorithmCfg — prevents the entropy-only runaway when the
        # clipped reward is identically zero
        log_std = jnp.clip(new_params["params"]["log_std"],
                           jnp.log(cfg.min_noise_std),
                           jnp.log(cfg.max_noise_std))
        new_params = dict(new_params)
        new_params["params"] = dict(new_params["params"], log_std=log_std)
        lr = ts.learning_rate
        if cfg.schedule == "adaptive":
            lr = jnp.where(metrics["kl"] > cfg.desired_kl * 2.0,
                           jnp.maximum(lr / 1.5, cfg.min_lr), lr)
            lr = jnp.where(
                (metrics["kl"] < cfg.desired_kl / 2.0)
                & (metrics["kl"] > 0.0),
                jnp.minimum(lr * 1.5, cfg.max_lr), lr)
        return ts.replace(params=new_params, opt_state=new_opt,
                          learning_rate=lr,
                          update_count=ts.update_count + 1)

    def _loss(self, params, batch: Transition, advantages, returns):
        mean, std = self.network.apply(
            params, batch.obs, method=self.network.distribution)
        value = self.network.apply(
            params, batch.priv_obs, method=self.network.value)
        return self._loss_from_outputs(mean, std, value, batch, advantages,
                                       returns)

    def update(self, train_state: TrainState, rollout: Transition,
               last_value: jax.Array, key: jax.Array
               ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Full PPO update: GAE + epochs x minibatches of SGD."""
        cfg = self.cfg
        T, B = rollout.reward.shape
        advantages, returns = compute_gae(
            rollout.reward, rollout.done, rollout.time_out, rollout.value,
            last_value, cfg.gamma, cfg.lam)

        flat = jax.tree.map(
            lambda x: x.reshape((T * B,) + x.shape[2:]), rollout)
        adv_flat = advantages.reshape(-1)
        ret_flat = returns.reshape(-1)
        n = T * B
        mb_size = n // cfg.num_mini_batches

        def epoch_body(carry, ep_key):
            ts = carry
            perm = jax.random.permutation(ep_key, n)

            def mb_body(ts, mb_idx):
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * mb_size, mb_size)
                mb = jax.tree.map(lambda x: x[idx], flat)
                mb_adv = adv_flat[idx]
                mb_ret = ret_flat[idx]
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(ts.params, mb, mb_adv, mb_ret)
                # the FINAL lr of an update is a poor progress gauge — the
                # per-minibatch adaptive rule ping-pongs it (first minibatch
                # KL is ~0 -> raise; late epochs accumulate ~2x target ->
                # shrink), so the mean over minibatches is the honest
                # effective step size (measured: final 1e-5 "floor" while
                # the intra-update mean sits near 1e-4).  Captured BEFORE
                # _sgd_step: that is the lr this minibatch actually used.
                metrics = dict(metrics, lr_intra=ts.learning_rate)
                ts = self._sgd_step(ts, grads, metrics)
                return ts, metrics

            ts, metrics = jax.lax.scan(
                mb_body, ts, jnp.arange(cfg.num_mini_batches))
            return ts, metrics

        keys = jax.random.split(key, cfg.num_learning_epochs)
        train_state, metrics = jax.lax.scan(epoch_body, train_state, keys)
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["learning_rate"] = train_state.learning_rate
        metrics["mean_advantage"] = jnp.mean(advantages)
        metrics["mean_return"] = jnp.mean(returns)
        return train_state, metrics


class RecurrentPPO(PPO):
    """PPO for ActorCriticRecurrent: sequence minibatches + truncated BPTT.

    rsl_rl's recurrent mode replays each trajectory minibatch through the
    LSTM from the hidden state saved at rollout start (SURVEY.md §2.5,
    reference helpers.py:193-219 export path).  TPU-native form: minibatch
    over the ENV axis (sequences stay whole), `lax.scan` the LSTM over the
    T-step window with done-masked carry resets, backprop through the whole
    window.  The rollout's (T, B) layout is kept — no flatten/shuffle.
    """

    def _sequence_outputs(self, params, carry0, batch: Transition):
        """Replay the recurrent net over a (T, mb) window -> mean/std/value."""
        net = self.network

        def step(carry, x):
            obs, priv, done_prev = x
            # reset carries at episode starts (done on the PREVIOUS step)
            m = (1.0 - done_prev)[:, None]
            carry = jax.tree.map(lambda c: c * m, carry)
            carry, (mean, std, value) = net.apply(params, carry, obs, priv)
            return carry, (mean, std, value)

        # done_prev[t] = done[t-1]; the rollout's carry0 already reflects
        # resets up to t=0
        done_prev = jnp.concatenate(
            [jnp.zeros_like(batch.done[:1]), batch.done[:-1]], axis=0
        ).astype(batch.obs.dtype)
        _, (mean, std, value) = jax.lax.scan(
            step, carry0, (batch.obs, batch.priv_obs, done_prev))
        return mean, std, value

    def _loss_seq(self, params, carry0, batch: Transition, advantages,
                  returns):
        mean, std, value = self._sequence_outputs(params, carry0, batch)
        return self._loss_from_outputs(mean, std, value, batch, advantages,
                                       returns)

    def update(self, train_state: TrainState, rollout: Transition,
               last_value: jax.Array, key: jax.Array, carry0=None
               ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Epochs x env-axis minibatches with BPTT over the T-step window."""
        assert carry0 is not None, "RecurrentPPO.update needs rollout carry0"
        cfg = self.cfg
        T, B = rollout.reward.shape
        advantages, returns = compute_gae(
            rollout.reward, rollout.done, rollout.time_out, rollout.value,
            last_value, cfg.gamma, cfg.lam)
        mb_envs = B // cfg.num_mini_batches

        def epoch_body(carry, ep_key):
            ts = carry
            perm = jax.random.permutation(ep_key, B)

            def mb_body(ts, mb_idx):
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * mb_envs, mb_envs)
                mb = jax.tree.map(lambda x: x[:, idx], rollout)
                mb_carry = jax.tree.map(lambda c: c[idx], carry0)
                mb_adv = advantages[:, idx]
                mb_ret = returns[:, idx]
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_seq, has_aux=True)(
                    ts.params, mb_carry, mb, mb_adv, mb_ret)
                metrics = dict(metrics, lr_intra=ts.learning_rate)
                ts = self._sgd_step(ts, grads, metrics)
                return ts, metrics

            ts, metrics = jax.lax.scan(
                mb_body, ts, jnp.arange(cfg.num_mini_batches))
            return ts, metrics

        keys = jax.random.split(key, cfg.num_learning_epochs)
        train_state, metrics = jax.lax.scan(epoch_body, train_state, keys)
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["learning_rate"] = train_state.learning_rate
        metrics["mean_advantage"] = jnp.mean(advantages)
        metrics["mean_return"] = jnp.mean(returns)
        return train_state, metrics
