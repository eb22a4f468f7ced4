"""Fused Pallas TPU kernels (MXU-tiled MLP forward/backward)."""
