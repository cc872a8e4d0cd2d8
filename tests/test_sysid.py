"""Sys-ID subsystem tests: simulator, chunking, GAN/WGAN/identifier steps,
real-data ingestion, and gradient flow through the simulator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.utils.registry import task_registry

B = 2
SIM_LEN = 24  # small: grad-through-sim tests compile T+warmup env steps
CHUNK = 16
OVER = 4


@pytest.fixture(scope="module")
def env():
    return task_registry.make_env("pointfoot_flat", num_envs=B)


@pytest.fixture(scope="module")
def env_state(env):
    return env.init_state(jax.random.PRNGKey(0))


def zero_policy(obs):
    return jnp.zeros(obs.shape[:-1] + (6,))


def test_simulate_trajectory_shapes(env, env_state):
    from pointfoot_tpu.sysid.simulate import simulate_trajectory

    traj, _ = simulate_trajectory(
        env, env_state, zero_policy,
        friction=jnp.full((B, env.model.nj), 0.08), added_mass=0.5,
        com_offset=jnp.zeros(3), cmd=jnp.asarray([0.3, 0.0, 0.0]),
        length=SIM_LEN, warmup=3)
    assert traj.obs.shape == (SIM_LEN, B, 27)
    assert traj.fell.shape == (B,)
    # pinned command visible in the obs tail (commands last, *scale [2,2,.25])
    np.testing.assert_allclose(
        np.asarray(traj.obs[-1, :, 24]), 0.6, atol=0.05)


def test_chunk_windows():
    from pointfoot_tpu.sysid.simulate import chunk_windows

    traj = jnp.arange(100 * 2 * 3, dtype=jnp.float32).reshape(100, 2, 3)
    w = chunk_windows(traj, chunk=40, overlap=10)
    # stride 30: starts 0,30,60 -> 3 windows x 2 envs
    assert w.shape == (6, 40, 3)
    np.testing.assert_array_equal(np.asarray(w[0]), np.asarray(traj[0:40, 0]))


def test_gradients_flow_through_simulator(env, env_state):
    """The headline upgrade over the reference: d(traj)/d(params) != 0."""
    from pointfoot_tpu.sysid.simulate import simulate_trajectory

    def loss(added_mass):
        traj, _ = simulate_trajectory(
            env, env_state, zero_policy,
            friction=0.08, added_mass=added_mass,
            com_offset=jnp.zeros(3), cmd=jnp.asarray([0.0, 0.0, 0.0]),
            length=10, warmup=2)
        return jnp.mean(traj.obs**2)

    g = jax.grad(loss)(jnp.asarray(0.5))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0.0


@pytest.mark.slow
def test_per_joint_friction_recovery(env, env_state):
    """Recover 6 DISTINCT per-joint DOF friction values from a trajectory
    (reference identifies dof_props["friction"][i] per joint,
    point_foot.py:103-108, GAN.py:71-83).

    Excite all joints with a sinusoidal action sequence, then invert the
    trajectory map with Gauss-Newton steps using d(traj)/d(friction6) —
    possible only because friction is a differentiable pytree leaf."""
    T = 40
    amp = 0.3

    def traj_of(fric6):
        s = env.update_frictions(env_state, fric6)
        s = env.update_cmd(s, jnp.asarray([0.0, 0.0, 0.0]))

        def step(carry, t):
            s = carry
            a = amp * jnp.sin(
                0.3 * t + jnp.arange(6.0))[None, :].repeat(B, 0)
            s, out = env.step(s, a)
            return s, out.obs
        _, obs = jax.lax.scan(step, s, jnp.arange(T, dtype=jnp.float32))
        return obs.reshape(-1)

    true_fric = jnp.asarray([0.02, 0.12, 0.05, 0.18, 0.08, 0.15])
    target = traj_of(true_fric)

    fric = jnp.full(6, 0.10)  # start at the range midpoint
    for _ in range(3):  # Gauss-Newton on the least-squares residual
        r = traj_of(fric) - target
        J = jax.jacfwd(traj_of)(fric)  # (T*B*27, 6)
        JtJ = J.T @ J + 1e-8 * jnp.eye(6)
        fric = fric - jnp.linalg.solve(JtJ, J.T @ r)

    # identifiable: all six columns independent (well-conditioned JtJ)
    svals = jnp.linalg.svd(J, compute_uv=False)
    assert float(svals[-1]) > 1e-6 * float(svals[0])
    np.testing.assert_allclose(
        np.asarray(fric), np.asarray(true_fric), atol=0.01)
    assert np.unique(np.round(np.asarray(fric), 3)).size == 6  # distinct


@pytest.mark.slow
def test_gan_train_step(env, env_state):
    from pointfoot_tpu.sysid.gan import GANTrainer

    t = GANTrainer(env, zero_policy, sim_length=SIM_LEN, warmup=2,
                   chunk=CHUNK, overlap=OVER)
    gs = t.init(jax.random.PRNGKey(1))
    real = jax.random.normal(jax.random.PRNGKey(2), (4, t.chunk, 27)) * 0.1
    gs, metrics = t.train_step(gs, env_state, real,
                               jnp.asarray([0.0, 0.0, 0.0]),
                               jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    fric, mass, com = t.propose(gs, jax.random.PRNGKey(4))
    assert fric.shape == (6,) and mass.shape == (1,) and com.shape == (3,)
    assert float(fric.min()) >= 0.0 and float(fric.max()) <= 0.2
    assert -1.0 <= float(mass[0]) <= 2.0


@pytest.mark.slow
def test_wgan_train_step(env, env_state):
    from pointfoot_tpu.sysid.wgan import WGANTrainer

    t = WGANTrainer(env, zero_policy, sim_length=SIM_LEN, warmup=2,
                    chunk=CHUNK, overlap=OVER)
    ws = t.init(jax.random.PRNGKey(5))
    real = jax.random.normal(jax.random.PRNGKey(6), (4, t.chunk, 27)) * 0.1
    ws, metrics = t.train_step(ws, env_state, real,
                               jnp.asarray([0.0, 0.0, 0.0]),
                               jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["critic_loss"]))


def test_identifier_train_step(env, env_state):
    from pointfoot_tpu.sysid.identifier import IdentifierTrainer

    t = IdentifierTrainer(env, zero_policy, window=SIM_LEN, warmup=2,
                          hidden=32)
    ident = t.init(jax.random.PRNGKey(8))
    ident, m1 = t.train_step(ident, env_state, jnp.asarray([0.0, 0.0, 0.0]),
                             jax.random.PRNGKey(9))
    assert np.isfinite(float(m1["mse"]))
    # prediction shape
    w = jnp.zeros((3, SIM_LEN, 27))
    pred = t.predict(ident, w)
    assert pred.shape == (3, 10)


def test_real_data_roundtrip(tmp_path):
    from pointfoot_tpu.sysid.realdata import (
        categorize_data_by_cmd, real_to_tensor)

    entries = []
    for i in range(10):
        obs = np.zeros(30, np.float32)
        obs[:27] = np.random.default_rng(i).normal(size=27)
        obs[24:27] = [0.5, 0.0, 0.1] if i % 2 == 0 else [0.0, 0.0, 0.0]
        entries.append({"obs": obs})
    path = str(tmp_path / "rr1.npy")
    np.save(path, np.asarray(entries, dtype=object), allow_pickle=True)

    data = real_to_tensor(path)
    assert data.shape == (10, 1, 27)
    buckets = categorize_data_by_cmd(data)
    assert len(buckets) == 2
    sizes = sorted(v.shape[0] for v in buckets.values())
    assert sizes == [5, 5]


def test_model_zoo_shapes():
    from pointfoot_tpu.models.nets import (
        AttentionModel, LSTMIdentifier, MLPCritic, MLPDiscriminator,
        MLPGenerator, TransformerDiscriminator, TransformerGenerator)

    key = jax.random.PRNGKey(0)
    g = MLPGenerator(6, tuple((0.0, 0.2) for _ in range(6)))
    p = g.init(key, jnp.zeros(6))
    out = g.apply(p, jax.random.normal(key, (6,)))
    assert out.shape == (6,) and float(out.min()) >= 0.0

    d = MLPDiscriminator(out_dim=1)
    pd = d.init(key, jnp.zeros((2, 20, 27)))
    s = d.apply(pd, jnp.zeros((2, 20, 27)))
    assert s.shape == (2, 1) and 0.0 <= float(s[0, 0]) <= 1.0

    c = MLPCritic()
    pc = c.init(key, jnp.zeros((2, 20, 27)))
    assert c.apply(pc, jnp.zeros((2, 20, 27))).shape == (2, 1)

    ident = LSTMIdentifier(hidden=32)
    pi = ident.init(key, jnp.zeros((2, 20, 27)))
    assert ident.apply(pi, jnp.zeros((2, 20, 27))).shape == (2, 10)

    a = AttentionModel(hidden=16)
    pa = a.init(key, jnp.zeros((2, 20, 27)))
    assert a.apply(pa, jnp.zeros((2, 20, 27))).shape == (2, 10)

    tg = TransformerGenerator(6, tuple((0.0, 0.2) for _ in range(6)))
    ptg = tg.init(key, jnp.zeros((2, 10, 6)))
    assert tg.apply(ptg, jnp.zeros((2, 10, 6))).shape == (2, 6)

    td = TransformerDiscriminator()
    ptd = td.init(key, jnp.zeros((2, 10, 27)))
    assert td.apply(ptd, jnp.zeros((2, 10, 27))).shape == (2, 1)
