"""Recurrent policy export parity: flax LSTM actor == TorchScript export."""

import jax
import jax.numpy as jnp
import numpy as np


def test_lstm_policy_export_parity(tmp_path):
    import torch

    from pointfoot_tpu.export.onnx import export_policy_lstm
    from pointfoot_tpu.rl.networks import ActorCriticRecurrent

    net = ActorCriticRecurrent(num_actions=6, rnn_hidden=16,
                               actor_hidden=(16,), critic_hidden=(16,))
    carry0 = net.initialize_carry((1,))
    params = net.init(jax.random.PRNGKey(0), carry0, jnp.zeros((1, 27)),
                      jnp.zeros((1, 27)))

    path = export_policy_lstm(params, 27, str(tmp_path / "lstm.pt"))
    mod = torch.jit.load(path)

    rng = np.random.default_rng(0)
    obs_seq = rng.normal(size=(5, 1, 27)).astype(np.float32)

    carry = carry0
    jax_out = []
    for t in range(5):
        carry, (mean, _, _) = net.apply(
            params, carry, jnp.asarray(obs_seq[t]), jnp.asarray(obs_seq[t]))
        jax_out.append(np.asarray(mean))
    jax_out = np.stack(jax_out)

    mod.reset_memory()
    torch_out = []
    with torch.no_grad():
        for t in range(5):
            torch_out.append(mod(torch.from_numpy(obs_seq[t])).numpy())
    torch_out = np.stack(torch_out)

    np.testing.assert_allclose(jax_out, torch_out, atol=1e-5)


def test_direct_gan_step():
    from pointfoot_tpu.sysid.direct_gan import DirectTrajectoryGAN

    gan = DirectTrajectoryGAN(window=20, obs_dim=27, z_dim=8)
    gs = gan.init(jax.random.PRNGKey(0))
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 20, 27)) * 0.1
    gs, m = gan.train_step(gs, real, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["gen_loss"]))
    fake = gan.sample(gs, jax.random.PRNGKey(3), batch=2)
    assert fake.shape == (2, 20, 27)


def test_selected_terrain():
    from pointfoot_tpu.terrain.grid import TerrainCfg, build_terrain

    cfg = TerrainCfg(num_rows=2, num_cols=2, border_size=2.0,
                     terrain_length=4.0, terrain_width=4.0,
                     selected=True,
                     selected_kwargs={"type": "pyramid_stairs",
                                      "step_width": 0.4,
                                      "step_height": 0.1})
    grid = build_terrain(cfg, seed=0)
    h = np.asarray(grid.height)
    assert h.max() > 0.2  # stairs rose
    # all four cells identical (same selected terrain)
    c = int(4.0 / 0.1)
    b = int(2.0 / 0.1)
    np.testing.assert_array_equal(h[b:b + c, b:b + c],
                                  h[b + c:b + 2 * c, b:b + c])
