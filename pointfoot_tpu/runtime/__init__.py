"""Native (C++) host-side runtime: async trajectory recording / replay and
the dependency-free deployment policy runner."""

from pointfoot_tpu.runtime.recorder import TrajectoryRecorder, read_log
from pointfoot_tpu.runtime.policy import NativePolicy

__all__ = ["TrajectoryRecorder", "read_log", "NativePolicy"]
