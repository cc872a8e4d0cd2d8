"""Differentiable system identification (GAN / WGAN-GP / LSTM identifier).

Replaces the reference's two-process, filesystem-IPC sys-ID loop (GAN.py /
Identifier.py spawning simulate_trajectory.py subprocesses, SURVEY.md §2.7,
§3.3): with the JAX simulator in-process and pure, (friction, mass, CoM) are
pytree leaves of the env state, the whole proposer->simulate->score pipeline
is one jitted function, and — unlike the reference, where the generator's
gradient was cut at a detached trajectory file — gradients flow through the
simulator itself.
"""

from pointfoot_tpu.sysid.simulate import simulate_trajectory, chunk_windows
from pointfoot_tpu.sysid.realdata import (
    real_to_tensor, categorize_data_by_cmd)
from pointfoot_tpu.sysid.gan import GANTrainer
from pointfoot_tpu.sysid.wgan import WGANTrainer
from pointfoot_tpu.sysid.identifier import IdentifierTrainer

__all__ = ["simulate_trajectory", "chunk_windows", "real_to_tensor",
           "categorize_data_by_cmd", "GANTrainer", "WGANTrainer",
           "IdentifierTrainer"]
