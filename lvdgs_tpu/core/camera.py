"""Camera state and projection conventions.

Conventions follow the reference (MonoGS lineage):
- Poses are stored world-to-camera: x_cam = R @ x_world + T
  (reference utils/camera_utils.py:31-35, gaussian_splatting
  getWorld2View2 call sites).
- Pixels: u = fx * x/z + cx, v = fy * y/z + cy, z = camera depth.
- Per-frame learnable state: a 6-dof pose delta (rot, trans) applied
  left-multiplicatively, plus affine exposure (a, b):
  image_ab = exp(a) * image + b (reference utils/camera_utils.py:51-63,
  utils/slam_utils.py:43).

`Camera` is a JAX pytree (flax.struct) so a keyframe *window* is just a
stacked Camera (leading batch axis) that can be consumed by one jitted
mapping step. Static per-dataset intrinsics live in `Intrinsics` which is
hashable and used as a static argument.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


_CONSTS_CACHE: dict = {}


def _create_consts(H: int, W: int):
    """Device constants shared by every Camera.create call at (H, W).

    JAX arrays are immutable, so sharing is safe; caching avoids paying a
    ~30 ms eager-dispatch round trip per constant per frame on remote
    (tunnel-attached) devices.

    INVARIANT (ADVICE r2): these buffers are aliased across every Camera at
    a given (H, W), so no jitted function may DONATE a Camera pytree (or
    otherwise invalidate its buffers) — donation would free the shared
    constants for all past and future cameras at once. Today nothing
    donates Cameras (seed_step and the tracking/mapping entry points donate
    only the map/opt-state/kfbuf arguments); if a future jit needs Camera
    donation, make it deep-copy these fields first or bypass this cache."""
    key = (H, W, jax.default_backend())
    hit = _CONSTS_CACHE.get(key)
    if hit is None:
        hit = (
            jnp.eye(3, dtype=jnp.float32),
            jnp.zeros((3,), dtype=jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.ones((H, W), bool),
            jnp.asarray(False),
        )
        _CONSTS_CACHE[key] = hit
    return hit


def focal2fov(focal: float, pixels: float) -> float:
    """Field of view from focal length (gaussian_splatting graphics_utils parity)."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    """Static pinhole intrinsics (hashable; safe as a jit static arg)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def fovx(self) -> float:
        return focal2fov(self.fx, self.width)

    @property
    def fovy(self) -> float:
        return focal2fov(self.fy, self.height)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )

    def scaled(self, width: int, height: int) -> "Intrinsics":
        """Intrinsics for a resized image (render_with_custom_resolution parity,
        reference utils/init_pose.py:145-158)."""
        sw = width / self.width
        sh = height / self.height
        return Intrinsics(
            fx=self.fx * sw,
            fy=self.fy * sh,
            cx=self.cx * sw,
            cy=self.cy * sh,
            width=width,
            height=height,
            znear=self.znear,
            zfar=self.zfar,
        )


def projection_matrix(intr: Intrinsics) -> np.ndarray:
    """OpenGL-style perspective matrix with principal-point offset.

    Parity with gaussian_splatting getProjectionMatrix2 (consumed at
    reference utils/camera_utils.py:90-92, utils/slam_frontend.py:1743-1749).
    Kept for API/GUI parity; the rasterizer itself projects with
    fx/fy/cx/cy directly.
    """
    n, f = intr.znear, intr.zfar
    left = -(intr.cx) * n / intr.fx
    right = (intr.width - intr.cx) * n / intr.fx
    top = -(intr.cy) * n / intr.fy
    bottom = (intr.height - intr.cy) * n / intr.fy

    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * n / (right - left)
    P[1, 1] = 2.0 * n / (bottom - top)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (bottom + top) / (bottom - top)
    P[3, 2] = 1.0
    P[2, 2] = f / (f - n)
    P[2, 3] = -(f * n) / (f - n)
    return P


class Camera(struct.PyTreeNode):
    """Per-frame camera state as a pytree.

    All leaves are arrays so cameras stack/batch cleanly. `uid` is an int32
    scalar array (not static) so a stacked window keeps per-frame ids.
    """

    uid: jax.Array  # () int32
    image: jax.Array  # (3, H, W) float32 in [0, 1]
    R: jax.Array  # (3, 3) w2c rotation
    T: jax.Array  # (3,)   w2c translation
    R_gt: jax.Array  # (3, 3)
    T_gt: jax.Array  # (3,)
    cam_rot_delta: jax.Array  # (3,) learnable
    cam_trans_delta: jax.Array  # (3,) learnable
    exposure_a: jax.Array  # () learnable
    exposure_b: jax.Array  # () learnable
    depth: jax.Array  # (H, W) sensor depth (zeros if none)
    mono_depth: jax.Array  # (H, W) monocular/pointmap depth
    grad_mask: jax.Array  # (H, W) bool edge mask
    static_mask: jax.Array  # (H, W) bool, True = static scene
    has_static_mask: jax.Array  # () bool — whether static_mask is meaningful

    @classmethod
    def create(
        cls,
        uid: int,
        image: jax.Array,
        intr: Intrinsics,
        gt_R: Optional[jax.Array] = None,
        gt_T: Optional[jax.Array] = None,
        depth: Optional[jax.Array] = None,
        mono_depth: Optional[jax.Array] = None,
    ) -> "Camera":
        H, W = intr.height, intr.width
        # per-frame constants come from a (H, W)-keyed cache: each eager op
        # is a ~30 ms dispatch through the remote-device tunnel, and the
        # 7 constants here made camera construction the 4th-largest phase
        # of the frame loop (PERFORMANCE.md)
        eye, zeros3, zero_s, zeros_hw, ones_hw, false_s = _create_consts(H, W)
        return cls(
            uid=jnp.asarray(uid, jnp.int32),
            image=jnp.asarray(image, jnp.float32),
            R=eye,
            T=zeros3,
            R_gt=eye if gt_R is None else jnp.asarray(gt_R, jnp.float32),
            T_gt=zeros3 if gt_T is None else jnp.asarray(gt_T, jnp.float32),
            cam_rot_delta=zeros3,
            cam_trans_delta=zeros3,
            exposure_a=zero_s,
            exposure_b=zero_s,
            depth=zeros_hw if depth is None else jnp.asarray(depth, jnp.float32),
            mono_depth=zeros_hw
            if mono_depth is None
            else jnp.asarray(mono_depth, jnp.float32),
            grad_mask=ones_hw,
            static_mask=ones_hw,
            has_static_mask=false_s,
        )

    def update_RT(self, R: jax.Array, T: jax.Array) -> "Camera":
        return self.replace(R=R, T=T)

    @property
    def w2c(self) -> jax.Array:
        T = jnp.eye(4, dtype=self.R.dtype)
        T = T.at[:3, :3].set(self.R)
        T = T.at[:3, 3].set(self.T)
        return T

    @property
    def camera_center(self) -> jax.Array:
        return -(self.R.T @ self.T)

    def exposure_apply(self, image: jax.Array) -> jax.Array:
        """Affine exposure compensation exp(a) * I + b."""
        return jnp.exp(self.exposure_a) * image + self.exposure_b
