"""On-policy training runner (rsl_rl OnPolicyRunner replacement).

Mirrors the reference training contract (`make_alg_runner` ->
`runner.learn(...)`, task_registry.py:104-155, train.py:41-44): collects
`num_steps_per_env` transitions per iteration, runs the PPO update, logs
episode reward decomposition + curriculum gauges under the same metric names
(`rew_<term>`, terrain_level, max_command_x — point_foot.py:276-285), saves /
resumes checkpoints.

TPU-native design: one `train_iteration` = rollout `lax.scan` + PPO update,
jitted as a whole; with a mesh (parallel/mesh.py) the same function is
pjit-sharded over envs (DP) and gradients all-reduce over ICI.  The python
loop around it only logs and checkpoints (host work fully off the hot path).
Checkpoints are Orbax (params, opt state, env state, RNG, curriculum state)
— the full-resume superset of rsl_rl's model_<it>.pt (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.envs.config import TrainCfg
from pointfoot_tpu.rl.networks import (
    ActorCritic, gaussian_log_prob, sample_action)
from pointfoot_tpu.rl.ppo import PPO, TrainState, Transition


class OnPolicyRunner:
    def __init__(self, env, train_cfg: TrainCfg, log_dir: Optional[str] = None,
                 mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'dp' axis.  When given,
        `learn` shards the env batch over it (params/opt replicate) and the
        jitted iteration runs SPMD — gradient and metric reductions become
        XLA collectives over ICI/DCN (SURVEY.md §2.6).  Logging and
        checkpointing happen on process 0 only."""
        self.env = env
        self.cfg = train_cfg
        self.log_dir = log_dir
        self.mesh = mesh
        p = train_cfg.policy
        self.recurrent = (
            train_cfg.runner.policy_class_name == "ActorCriticRecurrent")
        if self.recurrent:
            from pointfoot_tpu.rl.networks import ActorCriticRecurrent
            from pointfoot_tpu.rl.ppo import RecurrentPPO

            self.network = ActorCriticRecurrent(
                num_actions=env.num_actions,
                rnn_hidden=p.rnn_hidden_size,
                actor_hidden=p.actor_hidden_dims,
                critic_hidden=p.critic_hidden_dims,
                activation=p.activation,
                init_noise_std=p.init_noise_std,
            )
            self.ppo = RecurrentPPO(self.network, train_cfg.algorithm)
        else:
            self.network = ActorCritic(
                num_actions=env.num_actions,
                actor_hidden=p.actor_hidden_dims,
                critic_hidden=p.critic_hidden_dims,
                activation=p.activation,
                init_noise_std=p.init_noise_std,
            )
            self.ppo = PPO(self.network, train_cfg.algorithm)
        self.current_iteration = 0
        self._writer = None
        self._jit_iter = None

    # ------------------------------------------------------------- setup

    def init(self, key: jax.Array) -> Tuple[TrainState, "EnvState"]:
        k_net, k_env = jax.random.split(key)
        obs_dim = self.env.num_obs
        priv_dim = self.env.num_privileged_obs or obs_dim
        if self.recurrent:
            carry = self.network.initialize_carry((1,))
            params = self.network.init(
                k_net, carry, jnp.zeros((1, obs_dim)),
                jnp.zeros((1, priv_dim)))
        else:
            params = self.network.init(
                k_net, jnp.zeros((1, obs_dim)), jnp.zeros((1, priv_dim)))
        train_state = self.ppo.init_train_state(params)
        env_state = self.env.init_state(k_env)
        return train_state, env_state

    # --------------------------------------------------------- iteration

    def rollout(self, train_state: TrainState, env_state, obs, priv_obs, key):
        """num_steps_per_env steps (cfg :248) as a lax.scan."""
        T = self.cfg.runner.num_steps_per_env
        net = self.network

        def step_fn(carry, step_key):
            env_state, obs, priv_obs = carry
            # symmetric-critic envs have NO separate privileged obs:
            # priv_obs is threaded as None (a static empty pytree) and obs
            # substitutes at the use sites.  Duplicating the obs buffer
            # into priv_obs instead would donate the SAME buffer twice in
            # the jitted iteration (XLA Execute error) — anymal/a1/cassie
            # hit this; pointfoot's asymmetric critic never did.
            po = obs if priv_obs is None else priv_obs
            mean, std = net.apply(train_state.params, obs,
                                  method=net.distribution)
            value = net.apply(train_state.params, po, method=net.value)
            action = sample_action(mean, std, step_key)
            log_prob = gaussian_log_prob(mean, std, action)
            env_state, out = self.env.step(env_state, action)
            trans = Transition(
                obs=obs, priv_obs=po, action=action, reward=out.reward,
                done=out.done, time_out=out.extras["time_outs"].astype(
                    out.reward.dtype),
                value=value, log_prob=log_prob, mean=mean, std=std)
            next_priv = (None if priv_obs is None else out.privileged_obs)
            info = {
                "episode_rew": out.extras["episode_rew"],
                "num_resets": out.extras["num_resets"],
                "terrain_level": out.extras["terrain_level"],
                "max_command_x": out.extras["max_command_x"],
                "num_nan_quarantined": out.extras["num_nan_quarantined"],
            }
            return (env_state, out.obs, next_priv), (trans, info)

        keys = jax.random.split(key, T)
        (env_state, obs, priv_obs), (rollout, infos) = jax.lax.scan(
            step_fn, (env_state, obs, priv_obs), keys)
        return env_state, obs, priv_obs, rollout, infos

    def rollout_recurrent(self, train_state: TrainState, env_state, obs,
                          priv_obs, carry, key):
        """Recurrent rollout: LSTM carries threaded through the scan and
        reset on done; returns carry0 (= input carry) for BPTT replay."""
        T = self.cfg.runner.num_steps_per_env
        net = self.network

        def step_fn(sc, step_key):
            env_state, obs, priv_obs, carry = sc
            po = obs if priv_obs is None else priv_obs  # see rollout()
            carry, (mean, std, value) = net.apply(
                train_state.params, carry, obs, po)
            action = sample_action(mean, std, step_key)
            log_prob = gaussian_log_prob(mean, std, action)
            env_state, out = self.env.step(env_state, action)
            # zero carries of envs that just reset (episode boundary)
            m = (1.0 - out.done.astype(obs.dtype))[:, None]
            carry = jax.tree.map(lambda c: c * m, carry)
            trans = Transition(
                obs=obs, priv_obs=po, action=action, reward=out.reward,
                done=out.done, time_out=out.extras["time_outs"].astype(
                    out.reward.dtype),
                value=value, log_prob=log_prob, mean=mean, std=std)
            next_priv = (None if priv_obs is None else out.privileged_obs)
            info = {
                "episode_rew": out.extras["episode_rew"],
                "num_resets": out.extras["num_resets"],
                "terrain_level": out.extras["terrain_level"],
                "max_command_x": out.extras["max_command_x"],
                "num_nan_quarantined": out.extras["num_nan_quarantined"],
            }
            return (env_state, out.obs, next_priv, carry), (trans, info)

        keys = jax.random.split(key, T)
        (env_state, obs, priv_obs, carry), (rollout, infos) = jax.lax.scan(
            step_fn, (env_state, obs, priv_obs, carry), keys)
        return env_state, obs, priv_obs, carry, rollout, infos

    def train_iteration(self, train_state: TrainState, env_state, obs,
                        priv_obs, key):
        k_roll, k_update = jax.random.split(key)
        env_state, obs, priv_obs, rollout, infos = self.rollout(
            train_state, env_state, obs, priv_obs, k_roll)
        last_value = self.network.apply(
            train_state.params, obs if priv_obs is None else priv_obs,
            method=self.network.value)
        train_state, metrics = self.ppo.update(
            train_state, rollout, last_value, k_update)
        return self._finish_iteration(
            train_state, env_state, obs, priv_obs, rollout, infos, metrics)

    def train_iteration_recurrent(self, train_state: TrainState, env_state,
                                  obs, priv_obs, carry, key):
        """Recurrent variant: carry threads across iterations; PPO replays
        each minibatch from carry0 with truncated BPTT (rl/ppo.RecurrentPPO)."""
        k_roll, k_update = jax.random.split(key)
        carry0 = carry
        env_state, obs, priv_obs, carry, rollout, infos = \
            self.rollout_recurrent(
                train_state, env_state, obs, priv_obs, carry, k_roll)
        # bootstrap value with the current carry (advanced copy is discarded)
        _, (_, _, last_value) = self.network.apply(
            train_state.params, carry, obs,
            obs if priv_obs is None else priv_obs)
        train_state, metrics = self.ppo.update(
            train_state, rollout, last_value, k_update, carry0=carry0)
        out = self._finish_iteration(
            train_state, env_state, obs, priv_obs, rollout, infos, metrics)
        return out[:4] + (carry,) + out[4:]

    def _finish_iteration(self, train_state, env_state, obs, priv_obs,
                          rollout, infos, metrics):
        metrics["mean_reward"] = jnp.mean(rollout.reward)
        metrics["mean_episode_length"] = jnp.mean(
            env_state.episode_step.astype(jnp.float32))
        metrics["noise_std"] = jnp.mean(
            jnp.exp(train_state.params["params"]["log_std"]))
        # episode decomposition averaged over steps that had resets
        n_resets = jnp.sum(infos["num_resets"])
        ep_rew = jnp.sum(
            infos["episode_rew"] * infos["num_resets"][:, None], axis=0
        ) / jnp.maximum(n_resets, 1)
        metrics["episode_rew"] = ep_rew
        metrics["num_resets"] = n_resets
        metrics["num_nan_quarantined"] = jnp.sum(
            infos["num_nan_quarantined"])
        metrics["terrain_level"] = infos["terrain_level"][-1]
        metrics["max_command_x"] = infos["max_command_x"][-1]
        return train_state, env_state, obs, priv_obs, metrics

    # ------------------------------------------------------------- learn

    def learn(self, num_iterations: int, key: Optional[jax.Array] = None,
              train_state=None, env_state=None, log_every: int = 10,
              init_at_random_ep_len: bool = True):
        """Training loop (reference train.py:44 runner.learn)."""
        if key is None:
            key = jax.random.PRNGKey(self.cfg.seed)
        if train_state is None or env_state is None:
            key, k_init = jax.random.split(key)
            train_state, env_state = self.init(k_init)
            if init_at_random_ep_len:
                key, k_len = jax.random.split(key)
                env_state = env_state.replace(
                    episode_step=jax.random.randint(
                        k_len, env_state.episode_step.shape, 0,
                        self.env.max_episode_length))

        if self._jit_iter is None:
            # donate train/env state + obs: in-place buffer reuse per iter
            if self.recurrent:
                # carry (arg 4) is NOT donated: initialize_carry's four
                # zero leaves share one buffer (XLA constant dedupe) and
                # donating aliased buffers is an error
                self._jit_iter = jax.jit(self.train_iteration_recurrent,
                                         donate_argnums=(0, 1, 2, 3))
            else:
                self._jit_iter = jax.jit(self.train_iteration,
                                         donate_argnums=(0, 1, 2, 3))

        if self.mesh is not None:
            # DP sharding: env batch over the 'dp' axis, params replicated;
            # the jitted iteration then compiles SPMD with psum gradient/
            # metric reductions inserted by XLA (dryrun_multichip path,
            # now first-class in training)
            from pointfoot_tpu.parallel.mesh import replicated, shard_batch

            # hand the env its mesh so the physics rollout can shard_map
            # the Pallas mega-kernel over the DP axis (pjit alone would
            # fall back to the XLA substep on multi-chip)
            self.env.shard_mesh = self.mesh
            env_state = shard_batch(env_state, self.mesh)
            train_state = jax.device_put(train_state, replicated(self.mesh))
            key = jax.device_put(key, replicated(self.mesh))

        # initial observations: one zero-action step (base_task.py:111-115)
        key, k0 = jax.random.split(key)
        env_state, out0 = jax.jit(self.env.step)(
            env_state, jnp.zeros((self.env.num_envs, self.env.num_actions)))
        obs = out0.obs
        priv_obs = out0.privileged_obs  # None for symmetric-critic envs

        carry = (self.network.initialize_carry((self.env.num_envs,))
                 if self.recurrent else None)
        if carry is not None and self.mesh is not None:
            # shard the batch-dim carry like the env state — an unsharded
            # carry would be resharded every iteration (and is process-local
            # garbage on a multihost pod slice)
            from pointfoot_tpu.parallel.mesh import shard_batch

            carry = shard_batch(carry, self.mesh)

        t_start = time.time()
        steps_per_iter = self.cfg.runner.num_steps_per_env * self.env.num_envs
        # bench handshake: register as the live trainer; each iteration
        # checks the bench lock (one stat() on the fast path) and pauses —
        # after draining queued device work — while bench.py measures.
        # Paused time is subtracted from the steps/s clock.
        from pointfoot_tpu.utils import benchlock
        if jax.process_index() == 0:
            benchlock.trainer_register()
        # honor a bench lock BEFORE the first compile too: restore+compile
        # runs minutes of device work during which the loop heartbeat can't
        # fire, which previously left a quiescing bench in timeout_no_ack
        benchlock.trainer_heartbeat()
        last_metrics = None
        for it in range(num_iterations):
            paused = benchlock.trainer_heartbeat(
                drain=(None if last_metrics is None
                       else lambda: jax.block_until_ready(last_metrics)))
            if paused:
                t_start += paused
            key, k_it = jax.random.split(key)
            if self.recurrent:
                (train_state, env_state, obs, priv_obs, carry,
                 metrics) = self._jit_iter(
                    train_state, env_state, obs, priv_obs, carry, k_it)
            else:
                train_state, env_state, obs, priv_obs, metrics = \
                    self._jit_iter(train_state, env_state, obs, priv_obs,
                                   k_it)
            last_metrics = metrics
            self.current_iteration += 1
            host0 = jax.process_index() == 0  # host-0 logging (SURVEY.md §5)
            if ((it % log_every == 0) or it == num_iterations - 1) and host0:
                m = jax.device_get(metrics)
                elapsed = time.time() - t_start
                sps = steps_per_iter * (it + 1) / max(elapsed, 1e-9)
                self._log(self.current_iteration, m, sps)
            # save() is a COLLECTIVE in multi-process runs (it all-gathers
            # the cross-process-sharded env state before host-0 writes), so
            # every process must enter it — the host-0 gate lives inside.
            if (self.cfg.runner.save_interval > 0 and self.log_dir
                    and (self.current_iteration
                         % self.cfg.runner.save_interval == 0)):
                self.save(train_state, env_state)
        if self.log_dir:
            self.save(train_state, env_state)
        benchlock.trainer_unregister()
        return train_state, env_state

    # ----------------------------------------------------------- logging

    def _log(self, it: int, m: Dict, steps_per_sec: float):
        scalars = {
            "it": it,
            "steps_per_sec": round(float(steps_per_sec), 1),
            "mean_reward": float(m["mean_reward"]),
            "mean_episode_length": float(m["mean_episode_length"]),
            "value_loss": float(m["value_loss"]),
            "surrogate_loss": float(m["surrogate_loss"]),
            "kl": float(m["kl"]),
            "lr": float(m["learning_rate"]),
            "lr_intra": float(m.get("lr_intra", m["learning_rate"])),
            "noise_std": float(m["noise_std"]),
            "terrain_level": float(m["terrain_level"]),
            "nan_quarantined": int(m["num_nan_quarantined"]),
        }
        ep = np.asarray(m["episode_rew"])
        for name, val in zip(self.env.reward_names, ep):
            scalars[f"rew_{name}"] = float(val)
        line = (f"it {it:6d} | {scalars['steps_per_sec']:9.0f} steps/s | "
                f"rew {scalars['mean_reward']:8.4f} | "
                f"eplen {scalars['mean_episode_length']:6.1f} | "
                f"kl {scalars['kl']:.4f} | lr {scalars['lr']:.1e}")
        print(line, flush=True)
        if self.log_dir:
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.log_dir, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(scalars) + "\n")
            self._tb_log(it, scalars)

    def _tb_log(self, it: int, scalars: Dict):
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(self.log_dir)
            except Exception:
                self._writer = False
        if self._writer:
            for k, v in scalars.items():
                if k != "it":
                    self._writer.add_scalar(k, v, it)

    # -------------------------------------------------------- checkpoints

    def save(self, train_state: TrainState, env_state) -> str:
        """Orbax checkpoint of the FULL training state (SURVEY.md §5).

        Multi-process: the env state is sharded across processes, so a
        host-0 `device_get` alone would raise (non-addressable shards).
        All processes enter; a jitted identity with replicated
        out_shardings all-gathers over the mesh (XLA collective over
        ICI/DCN), then host 0 alone writes.  Single-process runs skip the
        gather entirely.
        """
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(
            self.log_dir, f"model_{self.current_iteration}"))
        state_tree = {"train_state": train_state, "env_state": env_state}
        if jax.process_count() > 1 and self.mesh is not None:
            from pointfoot_tpu.parallel.mesh import replicated

            gather = jax.jit(lambda t: t,
                             out_shardings=replicated(self.mesh))
            state_tree = gather(state_tree)
        # device_get: host-numpy checkpoints restore on any backend
        # (TPU-sharded saves otherwise refuse to restore on CPU)
        payload = jax.device_get(state_tree)
        payload["iteration"] = self.current_iteration
        # every process calls save(): orbax writes host-numpy payloads from
        # the primary process only, but its completion barrier spans all
        # processes — a host-0-gated call deadlocks the cluster
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, payload, force=True)
        return path

    def load(self, path: str, train_state: TrainState, env_state):
        """Restore from an Orbax checkpoint directory.

        The template (train_state, env_state) supplies the pytree structure;
        raw arrays are restored host-side and grafted in.  If the saved env
        batch differs from the current one (e.g. evaluating a 4096-env
        training run with 50 envs), the fresh env_state is kept and only the
        train state (params/optimizer/LR) is restored.
        """
        import orbax.checkpoint as ocp

        import dataclasses

        ckpt = ocp.PyTreeCheckpointer()
        raw = ckpt.restore(os.path.abspath(path))  # host numpy arrays
        self.current_iteration = int(raw["iteration"])

        def graft(template, data):
            """Recursively pour Orbax's dict/list representation back into
            the typed template (flax structs by field name, NamedTuples and
            tuples positionally) — robust to key-order vs field-order."""
            if data is None:  # leafless nodes (optax EmptyState etc.)
                return template
            if isinstance(data, dict):
                if dataclasses.is_dataclass(template):
                    return template.replace(**{
                        k: graft(getattr(template, k), v)
                        for k, v in data.items()})
                if hasattr(template, "_fields"):  # NamedTuple by field name
                    return type(template)(**{
                        k: graft(getattr(template, k), v)
                        for k, v in data.items()})
                if isinstance(template, (tuple, list)):
                    seq = [graft(template[int(k)], data[k])
                           for k in sorted(data, key=int)]
                    return type(template)(seq)
                return {k: graft(template[k], v) for k, v in data.items()}
            if isinstance(data, (list, tuple)):
                seq = [graft(t, d) for t, d in zip(template, data)]
                return (type(template)(*seq) if hasattr(template, "_fields")
                        else type(template)(seq))
            return jnp.asarray(data)

        try:
            new_train = graft(train_state, raw["train_state"])
        except (AttributeError, KeyError, TypeError, IndexError):
            # optimizer-format drift between checkpoint and current code:
            # restore params + LR, keep a FRESH optimizer state
            import warnings

            warnings.warn(
                "checkpoint optimizer state incompatible with the current "
                "optimizer chain; restoring params/LR with fresh moments")
            new_train = train_state.replace(
                params=graft(train_state.params,
                             raw["train_state"]["params"]),
                learning_rate=jnp.asarray(
                    raw["train_state"]["learning_rate"]),
            )
        saved_env = raw["env_state"]

        def shapes_ok(tpl, saved):
            """Every leaf PRESENT IN THE CHECKPOINT must exist in the
            template at the same path with the same shape.  Compared by
            name, not leaf order (a flax struct's tree.leaves follow field
            order while the restored raw dict's follow sorted-key order —
            zipping them compares unrelated leaves).  Template-only fields
            (added since the checkpoint was saved) keep their fresh value,
            so old checkpoints stay restorable across EnvState growth."""
            if isinstance(saved, dict):
                if dataclasses.is_dataclass(tpl):
                    return all(hasattr(tpl, k)
                               and shapes_ok(getattr(tpl, k), v)
                               for k, v in saved.items())
                if isinstance(tpl, dict):
                    return all(k in tpl and shapes_ok(tpl[k], v)
                               for k, v in saved.items())
                if isinstance(tpl, (tuple, list)):
                    return all(int(k) < len(tpl)
                               and shapes_ok(tpl[int(k)], v)
                               for k, v in saved.items())
                return False
            if saved is None:
                return True
            return np.asarray(tpl).shape == np.asarray(saved).shape

        shapes_match = shapes_ok(env_state, saved_env)
        new_env = graft(env_state, saved_env) if shapes_match else env_state
        return new_train, new_env

    # --------------------------------------------------------- inference

    def get_inference_policy(self, train_state: TrainState):
        """Deterministic policy obs -> action mean (play.py:59).

        For recurrent runners the returned callable manages the LSTM carry
        internally (reset via `.reset()`, or automatically when the batch
        size changes), so every caller keeps the plain `policy(obs)`
        contract.  The explicit functional pair is available via
        `get_inference_policy_recurrent`."""
        if self.recurrent:
            step, carry0 = self.get_inference_policy_recurrent(train_state)

            class _StatefulPolicy:
                def __init__(self):
                    self._carry = None
                    self._batch = None

                def reset(self, batch: Optional[int] = None):
                    if batch is not None:
                        self._carry = carry0(batch)
                        self._batch = batch
                    else:
                        self._carry = None
                        self._batch = None

                def __call__(self, obs):
                    b = obs.shape[0] if obs.ndim > 1 else 1
                    if self._carry is None or b != self._batch:
                        self.reset(b)
                    o = obs if obs.ndim > 1 else obs[None]
                    self._carry, mean = step(self._carry, o)
                    return mean if obs.ndim > 1 else mean[0]

            return _StatefulPolicy()
        net = self.network

        @jax.jit
        def policy(obs):
            return net.apply(train_state.params, obs, method=net.act_mean)

        return policy

    def get_inference_policy_recurrent(self, train_state: TrainState):
        """(policy, carry0): policy(carry, obs) -> (carry, action_mean).

        The critic branch is fed the same obs (deployment has no privileged
        observations — reference flat-policy ONNX input is the 27-d proprio
        obs, export_policy_as_onnx.py:36-45)."""
        net = self.network

        @jax.jit
        def policy(carry, obs):
            carry, (mean, _, _) = net.apply(
                train_state.params, carry, obs, obs)
            return carry, mean

        def carry0(batch: int):
            return net.initialize_carry((batch,))

        return policy, carry0
