"""LVD-GS-TPU: TPU-native 3D Gaussian Splatting SLAM for dynamic scenes.

A ground-up JAX/XLA/Pallas re-design of the capabilities of LVD_GS-SLAM
(monocular 3DGS SLAM with MASt3R pointmap priors and open-vocabulary
dynamic-object masking), built TPU-first:

- The Gaussian map is a fixed-capacity structure-of-arrays pytree so
  densify/prune are masked compactions at static shape (XLA-friendly).
- Rendering is a differentiable tile-based rasterizer whose backward pass
  (including camera-pose Jacobians) comes from autodiff over a carefully
  staged forward; hot paths have Pallas TPU kernels.
- Tracking and mapping are jitted step functions driven by a single-process
  host scheduler (replacing the reference's two torch.multiprocessing
  processes, cf. reference utils/slam_frontend.py:1185 /
  utils/slam_backend.py:20).
- Perception (MASt3R / GroundingDINO / SAM) runs as batched jitted
  inference, shardable over an ICI mesh via jax.sharding.
"""

__version__ = "0.1.0"
