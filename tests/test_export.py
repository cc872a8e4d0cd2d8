"""Policy export tests: flax -> torch transplant parity and actuator net."""

import jax
import jax.numpy as jnp
import numpy as np


def test_torchscript_export_parity(tmp_path):
    from pointfoot_tpu.export.onnx import (
        export_policy_torchscript, load_onnx_policy)
    from pointfoot_tpu.rl.networks import ActorCritic

    net = ActorCritic(num_actions=6, actor_hidden=(32, 16),
                      critic_hidden=(32, 16))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 27)),
                      jnp.zeros((1, 27)))
    path = export_policy_torchscript(params, 27, str(tmp_path / "p.pt"))
    obs = np.random.default_rng(0).normal(size=(3, 27)).astype(np.float32)
    jax_out = np.asarray(net.apply(params, jnp.asarray(obs),
                                   method=net.act_mean))
    torch_out = load_onnx_policy(path)(obs)
    np.testing.assert_allclose(jax_out, torch_out, atol=1e-5)


def test_policy_reimport_exact(tmp_path):
    """Export -> TorchScript -> reimport as pure JAX must be bit-exact
    (the sys-ID trainers replay the deployed policy inside jitted scans)."""
    from pointfoot_tpu.export.onnx import (
        export_policy_torchscript, load_policy_as_jax)
    from pointfoot_tpu.rl.networks import ActorCritic

    net = ActorCritic(num_actions=6, actor_hidden=(32, 16),
                      critic_hidden=(16,))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 27)),
                      jnp.zeros((1, 27)))
    path = export_policy_torchscript(params, 27, str(tmp_path / "p.pt"))
    pol = load_policy_as_jax(path)
    obs = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 27)).astype(np.float32))
    a = np.asarray(net.apply(params, obs, method=net.act_mean))
    b = np.asarray(jax.jit(pol)(obs))
    np.testing.assert_array_equal(a, b)


def test_onnx_export_roundtrip(tmp_path):
    """Real .onnx artifact (pure-python writer): re-parse the protobuf and
    match the flax actor bit-for-bit through load_onnx_policy."""
    from pointfoot_tpu.export.onnx import (
        export_policy_as_onnx, load_onnx_policy)
    from pointfoot_tpu.export.onnx_writer import read_mlp_onnx
    from pointfoot_tpu.rl.networks import ActorCritic

    net = ActorCritic(num_actions=6, actor_hidden=(64, 32),
                      critic_hidden=(16,))
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 27)),
                      jnp.zeros((1, 27)))
    out = export_policy_as_onnx(params, 27, str(tmp_path / "p.onnx"))
    assert out.endswith(".onnx")

    # structural decode: opset 13, Gemm/Elu graph, named IO
    layers, activation, in_name, out_name, opset = read_mlp_onnx(out)
    assert opset == 13 and activation == "elu"
    assert in_name == "obs" and out_name == "actions"
    assert [w.shape for w, _ in layers] == [(27, 64), (64, 32), (32, 6)]

    obs = np.random.default_rng(0).normal(size=(5, 27)).astype(np.float32)
    jax_out = np.asarray(net.apply(params, jnp.asarray(obs),
                                   method=net.act_mean))
    onnx_out = load_onnx_policy(out)(obs)
    np.testing.assert_allclose(jax_out, onnx_out, atol=1e-6)


def test_onnx_matches_torchscript_twin(tmp_path):
    """The .onnx graph and the TorchScript export of the same params must
    agree — cross-validates the hand-rolled serializer against torch."""
    from pointfoot_tpu.export.onnx import (
        export_policy_as_onnx, export_policy_torchscript, load_onnx_policy)
    from pointfoot_tpu.rl.networks import ActorCritic

    net = ActorCritic(num_actions=6, actor_hidden=(32, 16),
                      critic_hidden=(16,))
    params = net.init(jax.random.PRNGKey(2), jnp.zeros((1, 27)),
                      jnp.zeros((1, 27)))
    p_onnx = export_policy_as_onnx(params, 27, str(tmp_path / "p.onnx"))
    p_ts = export_policy_torchscript(params, 27, str(tmp_path / "p.pt"))
    obs = np.random.default_rng(3).normal(size=(8, 27)).astype(np.float32)
    np.testing.assert_allclose(
        load_onnx_policy(p_onnx)(obs), load_onnx_policy(p_ts)(obs),
        atol=1e-5)


def test_actuator_net_matches_torchscript():
    """JAX LSTM evaluation == the reference TorchScript actuator net."""
    import os

    import torch

    from pointfoot_tpu.physics.actuator import (
        actuator_net_torque, init_carry, load_anydrive_weights)

    ref_path = "/root/reference/resources/actuator_nets/anydrive_v3_lstm.pt"
    if not os.path.exists(ref_path):
        import pytest

        pytest.skip("reference actuator net not available")
    ref = torch.jit.load(ref_path)
    rng = np.random.default_rng(0)
    T, B = 5, 3
    seq = rng.normal(size=(T, B, 2)).astype(np.float32) * 0.5

    with torch.no_grad():
        # reference calling convention: batch_first input (B, 1, 2) one tick
        # at a time with hidden (2, B, 8) (anymal.py:64-77)
        h = torch.zeros(2, B, 8)
        c = torch.zeros(2, B, 8)
        t_outs = []
        for t in range(T):
            x = torch.from_numpy(seq[t]).unsqueeze(1)  # (B, 1, 2)
            tq, (h, c) = ref(x, (h, c))
            t_outs.append(tq.numpy())
        t_torque = np.stack(t_outs)  # (T, B)

    w = load_anydrive_weights()
    carry = init_carry((B,))
    outs = []
    for t in range(T):
        tau, carry = actuator_net_torque(
            w, carry, jnp.asarray(seq[t, :, 0]), jnp.asarray(seq[t, :, 1]))
        outs.append(np.asarray(tau))
    j_torque = np.stack(outs)
    np.testing.assert_allclose(j_torque, t_torque, atol=1e-4)


def test_actuator_env_runs():
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("anymal_c_rough", num_envs=2)
    assert env.use_actuator_net
    state = env.init_state(jax.random.PRNGKey(0))
    state, out = jax.jit(env.step)(state, jnp.zeros((2, 12)))
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.abs(np.asarray(state.torques)).max() > 0  # net produces torque
