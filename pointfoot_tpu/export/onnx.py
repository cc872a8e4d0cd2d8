"""Export the trained actor to ONNX / TorchScript for robot deployment.

Replaces reference scripts/export_policy_as_onnx.py:13-46 (ONNX opset 13 of
the actor MLP on the 27-d proprio obs) and utils/helpers.py:180-219
(TorchScript JIT export incl. the LSTM variant).  The flax parameters are
transplanted into an equivalent torch module (torch CPU ships in this image)
and exported through torch's ONNX/TorchScript paths, so the resulting
artifacts are drop-in for the reference's onnxruntime deployment pipeline
(scripts/simulate_trajectory.py:45-59).
"""

from __future__ import annotations

import numpy as np


def _actor_layers(params) -> list:
    """Extract (weight, bias) pairs of the actor MLP from flax params."""
    actor = params["params"]["actor"]
    layers = []
    i = 0
    while f"Dense_{i}" in actor:
        d = actor[f"Dense_{i}"]
        layers.append((np.asarray(d["kernel"]), np.asarray(d["bias"])))
        i += 1
    return layers


def _build_torch_actor(layers, activation: str = "elu"):
    import torch
    import torch.nn as nn

    acts = {"elu": nn.ELU, "relu": nn.ReLU, "tanh": nn.Tanh, "selu": nn.SELU}
    mods: list = []
    for i, (w, b) in enumerate(layers):
        lin = nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.ascontiguousarray(w.T)))
            lin.bias.copy_(torch.from_numpy(np.ascontiguousarray(b)))
        mods.append(lin)
        if i < len(layers) - 1:
            mods.append(acts[activation]())
    return nn.Sequential(*mods).eval()


def export_policy_as_onnx(params, obs_dim: int, path: str,
                          activation: str = "elu", opset: int = 13) -> str:
    """Flax ActorCritic params -> ONNX actor (opset 13, parity with
    export_policy_as_onnx.py:36-45).

    Serialized by the in-repo pure-python writer (export/onnx_writer.py) —
    this image has neither the `onnx` package nor onnxruntime, so torch's
    exporter cannot emit a real artifact.  The output is a standard opset-13
    Gemm/Elu graph loadable by onnxruntime on the robot."""
    from pointfoot_tpu.export.onnx_writer import write_mlp_onnx

    layers = _actor_layers(params)
    if layers[0][0].shape[0] != obs_dim:
        raise ValueError(
            f"actor expects {layers[0][0].shape[0]}-d obs, got {obs_dim}")
    return write_mlp_onnx(layers, path, activation=activation, opset=opset)


def export_policy_torchscript(params, obs_dim: int, path: str,
                              activation: str = "elu") -> str:
    """TorchScript trace of the actor (helpers.py:180-190 equivalent)."""
    import torch

    model = _build_torch_actor(_actor_layers(params), activation)
    traced = torch.jit.trace(model, torch.zeros(1, obs_dim))
    traced.save(path)
    return path


def export_policy_lstm(params, obs_dim: int, path: str,
                       activation: str = "elu") -> str:
    """Export an ActorCriticRecurrent actor as a stateful TorchScript module.

    Mirrors reference `PolicyExporterLSTM` (helpers.py:193-219): the exported
    module keeps (hidden, cell) as buffers, advances them one step per
    forward call, and exposes `reset_memory()`.  Flax OptimizedLSTMCell
    gate layout (ii/if/ig/io + hi/hf/hg/ho dense layers) is transplanted
    into torch's fused (i, f, g, o) LSTM weights.
    """
    import torch
    import torch.nn as nn

    p = params["params"]
    rnn = p["actor_rnn"]
    hidden = rnn["hi"]["kernel"].shape[0]

    def cat_gates(group, key):
        return np.concatenate(
            [np.asarray(rnn[f"{group}{g}"][key]).T for g in "ifgo"], axis=0)

    lstm = nn.LSTM(obs_dim, hidden, num_layers=1)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.from_numpy(
            np.ascontiguousarray(cat_gates("i", "kernel"))))
        lstm.weight_hh_l0.copy_(torch.from_numpy(
            np.ascontiguousarray(cat_gates("h", "kernel"))))
        lstm.bias_ih_l0.zero_()
        bias_hh = np.concatenate(
            [np.asarray(rnn[f"h{g}"]["bias"]) for g in "ifgo"], axis=0)
        lstm.bias_hh_l0.copy_(torch.from_numpy(np.ascontiguousarray(bias_hh)))

    head_layers = []
    i = 0
    head = p["actor_head"]
    while f"Dense_{i}" in head:
        d = head[f"Dense_{i}"]
        head_layers.append((np.asarray(d["kernel"]), np.asarray(d["bias"])))
        i += 1
    mlp = _build_torch_actor(head_layers, activation)

    class PolicyExporterLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.memory = lstm
            self.head = mlp
            self.register_buffer("hidden_state", torch.zeros(1, 1, hidden))
            self.register_buffer("cell_state", torch.zeros(1, 1, hidden))

        def forward(self, x):
            out, (h, c) = self.memory(
                x.unsqueeze(0), (self.hidden_state, self.cell_state))
            self.hidden_state[:] = h
            self.cell_state[:] = c
            return self.head(out.squeeze(0))

        @torch.jit.export
        def reset_memory(self):
            self.hidden_state[:] = 0.0
            self.cell_state[:] = 0.0

    mod = PolicyExporterLSTM().eval()
    scripted = torch.jit.script(mod)
    scripted.save(path)
    return path


def load_policy_as_jax(path: str, activation: str = "elu"):
    """Load an exported TorchScript actor back as a pure-JAX callable.

    The sys-ID trainers replay the deployed policy INSIDE jitted rollouts
    (the reference replayed its exported ONNX policy via onnxruntime in a
    subprocess, simulate_trajectory.py:45-59 — host calls can't live inside
    a jitted scan, so we transplant the weights back to jnp).
    """
    import jax
    import jax.numpy as jnp
    import torch

    mod = torch.jit.load(path)
    layers = []
    for name, p in mod.named_parameters():
        # nn.Sequential naming: '<idx>.weight' / '<idx>.bias'
        if name.endswith("weight"):
            layers.append([np.asarray(p.detach().numpy()), None])
        else:
            layers[-1][1] = np.asarray(p.detach().numpy())
    acts = {"elu": jax.nn.elu, "relu": jax.nn.relu, "tanh": jnp.tanh}
    act = acts[activation]
    Ws = [jnp.asarray(w.T) for w, _ in layers]
    bs = [jnp.asarray(b) for _, b in layers]

    def policy(obs):
        x = obs
        for i, (W, b) in enumerate(zip(Ws, bs)):
            x = x @ W + b
            if i < len(Ws) - 1:
                x = act(x)
        return x

    return policy


def load_onnx_policy(path: str):
    """onnxruntime session -> policy callable (simulate_trajectory.py:45-59).

    Without onnxruntime: real `.onnx` files decode through the in-repo
    protobuf reader (export/onnx_writer.py) into a numpy forward pass;
    `.pt` files torch-load as TorchScript.
    """
    try:
        import onnxruntime as ort  # type: ignore

        sess = ort.InferenceSession(path)
        name = sess.get_inputs()[0].name

        def policy(obs_np: np.ndarray) -> np.ndarray:
            return sess.run(None, {name: obs_np.astype(np.float32)})[0]

        return policy
    except ImportError:
        pass
    if path.endswith(".onnx"):
        from pointfoot_tpu.export.onnx_writer import read_mlp_onnx

        layers, activation, _, _, _ = read_mlp_onnx(path)
        acts = {"elu": lambda x: np.where(x > 0, x, np.expm1(x)),
                "relu": lambda x: np.maximum(x, 0.0),
                "selu": lambda x: 1.0507010 * np.where(
                    x > 0, x, 1.6732632 * np.expm1(x)),
                "tanh": np.tanh, "linear": lambda x: x}
        act = acts[activation]

        def policy(obs_np: np.ndarray) -> np.ndarray:
            x = obs_np.astype(np.float32)
            for i, (W, b) in enumerate(layers):
                x = x @ W + b
                if i < len(layers) - 1:
                    x = act(x)
            return x

        return policy
    import torch

    mod = torch.jit.load(path)

    def policy(obs_np: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            return mod(torch.from_numpy(obs_np.astype(np.float32))).numpy()

    return policy
