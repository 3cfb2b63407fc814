"""vidar-tpu: TPU-native visual point cloud forecasting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OpenDriveLab/ViDAR
(CVPR 2024): BEVFormer-style spatiotemporal encoding of multi-camera video,
latent-rendering, autoregressive future BEV decoding, ray-wise losses, and
chamfer evaluation — designed for TPU (MXU-friendly dense compute, static
shapes, `jit`/`pjit` data parallelism over a device mesh).
"""

__version__ = "0.1.0"
