"""Policy export for deployment (ONNX / TorchScript equivalents)."""

from pointfoot_tpu.export.onnx import export_policy_as_onnx, export_policy_torchscript

__all__ = ["export_policy_as_onnx", "export_policy_torchscript"]
