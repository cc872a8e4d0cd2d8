"""Native (C++) host-side runtime: async trajectory recording / replay."""

from pointfoot_tpu.runtime.recorder import TrajectoryRecorder, read_log

__all__ = ["TrajectoryRecorder", "read_log"]
