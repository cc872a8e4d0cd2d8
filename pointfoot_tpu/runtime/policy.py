"""ctypes bindings for the C++ deployment policy runner.

`src/policy_runner.cpp` is the robot-side inference stack: it decodes the
framework's `.onnx` actor (export/onnx_writer.py; same Gemm/activation
subset torch emits for MLPs) and runs the forward pass dependency-free —
the TPU-native equivalent of the reference's onnxruntime deployment path
(reference scripts/simulate_trajectory.py:45-59).  Built with g++ on
first use, cached in `_build/`, plain C ABI like recorder.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "src", "policy_runner.cpp")
_BUILD = os.path.join(_DIR, "_build")
_SO = os.path.join(_BUILD, "libpolicyrunner.so")


def _build_library() -> str:
    os.makedirs(_BUILD, exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_library())
        lib.pr_load.restype = ctypes.c_void_p
        lib.pr_load.argtypes = [ctypes.c_char_p]
        lib.pr_obs_dim.restype = ctypes.c_int
        lib.pr_obs_dim.argtypes = [ctypes.c_void_p]
        lib.pr_act_dim.restype = ctypes.c_int
        lib.pr_act_dim.argtypes = [ctypes.c_void_p]
        lib.pr_num_layers.restype = ctypes.c_int
        lib.pr_num_layers.argtypes = [ctypes.c_void_p]
        lib.pr_run.restype = ctypes.c_int
        lib.pr_run.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.pr_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativePolicy:
    """Loaded .onnx actor running through the C++ forward pass."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.pr_load(path.encode())
        if not self._h:
            raise ValueError(f"could not parse ONNX policy at {path}")
        self.obs_dim = self._lib.pr_obs_dim(self._h)
        self.act_dim = self._lib.pr_act_dim(self._h)
        self.num_layers = self._lib.pr_num_layers(self._h)

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        if obs.shape[-1] != self.obs_dim:
            raise ValueError(f"expected obs dim {self.obs_dim}, "
                             f"got {obs.shape[-1]}")
        out = np.empty((obs.shape[0], self.act_dim), np.float32)
        rc = self._lib.pr_run(self._h, obs, out, obs.shape[0])
        if rc != 0:
            raise RuntimeError("pr_run failed")
        return out[0] if squeeze else out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.pr_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            self.close()
        except Exception:
            pass
