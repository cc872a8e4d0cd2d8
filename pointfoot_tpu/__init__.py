"""pointfoot_tpu — a TPU-native framework for legged-robot RL, sys-ID and MPC.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the
`peachvegetable/pointfoot` stack (Isaac Gym `legged_gym` fork + rsl_rl PPO +
GAN sys-ID).  Instead of a C++/CUDA physics binary driven from Python, the
entire pipeline — batched rigid-body dynamics, compliant terrain contact,
observation/reward computation, PPO, trajectory-optimization (iLQR/SQP) and
differentiable system identification — is a set of pure, jit/vmap/scan-able
functions that compile to single fused XLA programs per training step and
shard over TPU device meshes with `jax.sharding`.

Layout
------
ops/       quaternion + spatial-algebra primitives, Pallas TPU kernels
physics/   robot model (URDF compiler), batched articulated dynamics, contact
terrain/   procedural heightfield generators + curriculum grid
envs/      functional vectorized environments (PointFoot, Anymal, A1, Cassie)
rl/        PPO / actor-critic / on-policy runner (rsl_rl v1.0.2 replacement)
mpc/       batched iLQR / SQP trajectory optimization with Riccati kernels
sysid/     differentiable sys-ID: GAN / WGAN-GP / LSTM identifier (in-process)
models/    network zoo (flax): MLP/LSTM/attention generators & discriminators
parallel/  device mesh, multi-host init, sharding rules
utils/     config system, task registry, CLI helpers, metrics logging
export/    policy export (ONNX / saved-model style)
"""

__version__ = "0.1.0"
