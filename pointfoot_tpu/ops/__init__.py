"""Compute primitives: quaternion algebra, 6-D spatial algebra, Pallas kernels."""
