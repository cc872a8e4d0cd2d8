"""C++ async trajectory recorder tests (runtime/)."""

import numpy as np
import pytest


def test_recorder_roundtrip(tmp_path):
    from pointfoot_tpu.runtime import TrajectoryRecorder, read_log

    path = str(tmp_path / "run.tlog")
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 27)).astype(np.float32)
    with TrajectoryRecorder(path, record_size=27, capacity=128) as rec:
        for i in range(100):
            assert rec.push(data[i])
        n = rec.push_batch(data[100:500])
        rec.flush()
        written = rec.written
        dropped = rec.dropped
    assert written + dropped == 100 + n + (400 - n)
    out, rs = read_log(path)
    assert rs == 27
    assert out.shape[0] == written
    # every written record is one of the source rows, in order
    np.testing.assert_array_equal(out[:100], data[:100])


def test_recorder_nonblocking_under_overflow(tmp_path):
    """A tiny ring must drop rather than block when the producer outruns
    the writer thread."""
    from pointfoot_tpu.runtime import TrajectoryRecorder, read_log

    path = str(tmp_path / "over.tlog")
    row = np.zeros(8, np.float32)
    with TrajectoryRecorder(path, record_size=8, capacity=4) as rec:
        import time

        t0 = time.perf_counter()
        for _ in range(20000):
            rec.push(row)
        elapsed = time.perf_counter() - t0
        rec.flush()
        total = rec.written + rec.dropped
    assert total == 20000
    assert elapsed < 2.0  # never blocked
    out, _ = read_log(path)
    assert out.shape[0] == total - (total - out.shape[0])


def test_reader_rejects_garbage(tmp_path):
    from pointfoot_tpu.runtime import read_log

    p = tmp_path / "bad.tlog"
    p.write_bytes(b"not a tlog file at all")
    with pytest.raises(ValueError):
        read_log(str(p))


def test_native_policy_runner_matches_flax(tmp_path):
    """C++ deployment runner (runtime/policy.py) decodes the .onnx actor
    and matches the flax forward pass — the robot-side inference stack
    (reference deploys via onnxruntime C++, simulate_trajectory.py:45-59)."""
    import jax
    import jax.numpy as jnp

    from pointfoot_tpu.export.onnx import export_policy_as_onnx
    from pointfoot_tpu.rl.networks import ActorCritic
    from pointfoot_tpu.runtime.policy import NativePolicy

    net = ActorCritic(num_actions=6, actor_hidden=(64, 32),
                      critic_hidden=(16,))
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 27)),
                      jnp.zeros((1, 27)))
    path = export_policy_as_onnx(params, 27, str(tmp_path / "p.onnx"))
    pol = NativePolicy(path)
    assert (pol.obs_dim, pol.act_dim, pol.num_layers) == (27, 6, 3)
    obs = np.random.default_rng(4).normal(size=(16, 27)).astype(np.float32)
    ref = np.asarray(net.apply(params, jnp.asarray(obs),
                               method=net.act_mean))
    out = pol(obs)
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # single-obs (robot control loop) path
    np.testing.assert_allclose(pol(obs[0]), ref[0], atol=2e-5)
    pol.close()


def test_native_policy_runner_wide_input(tmp_path):
    """Regression: obs_dim wider than every hidden layer must not overflow
    the C++ scratch buffers (review finding: nested-ternary max bug)."""
    import jax
    import jax.numpy as jnp

    from pointfoot_tpu.export.onnx import export_policy_as_onnx
    from pointfoot_tpu.rl.networks import ActorCritic
    from pointfoot_tpu.runtime.policy import NativePolicy

    net = ActorCritic(num_actions=6, actor_hidden=(16,), critic_hidden=(8,))
    params = net.init(jax.random.PRNGKey(5), jnp.zeros((1, 27)),
                      jnp.zeros((1, 27)))
    path = export_policy_as_onnx(params, 27, str(tmp_path / "w.onnx"))
    pol = NativePolicy(path)
    obs = np.random.default_rng(6).normal(size=(8, 27)).astype(np.float32)
    ref = np.asarray(net.apply(params, jnp.asarray(obs),
                               method=net.act_mean))
    np.testing.assert_allclose(pol(obs), ref, atol=2e-5)
    pol.close()
