"""On-device SLAM state: the keyframe buffer.

The reference keeps keyframes as a host-side dict of Camera objects shared
between two processes (reference utils/slam_backend.py:41 `self.viewpoints`).
TPU-natively, keyframes live in a fixed-capacity on-device ring buffer so the
whole mapping optimisation (including random historical replay, reference
utils/slam_backend.py:275-297) runs inside one jitted program with no host
round-trips. Images are stored uint8 to bound HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.camera import Camera, Intrinsics


class KeyframeBuffer(struct.PyTreeNode):
    frame_idx: jax.Array  # (M,) int32, -1 = empty
    images_u8: jax.Array  # (M, 3, H, W) uint8
    R: jax.Array  # (M, 3, 3)
    T: jax.Array  # (M, 3)
    exposure_ab: jax.Array  # (M, 2)
    mono_depth: jax.Array  # (M, H, W) float32
    grad_mask: jax.Array  # (M, H, W) bool
    static_mask: jax.Array  # (M, H, W) bool
    has_static: jax.Array  # (M,) bool
    count: jax.Array  # () int32

    @property
    def capacity(self) -> int:
        return self.frame_idx.shape[0]


def create_keyframe_buffer(capacity: int, height: int, width: int) -> KeyframeBuffer:
    M, H, W = capacity, height, width
    return KeyframeBuffer(
        frame_idx=jnp.full((M,), -1, jnp.int32),
        images_u8=jnp.zeros((M, 3, H, W), jnp.uint8),
        R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (M, 1, 1)),
        T=jnp.zeros((M, 3), jnp.float32),
        exposure_ab=jnp.zeros((M, 2), jnp.float32),
        mono_depth=jnp.zeros((M, H, W), jnp.float32),
        grad_mask=jnp.zeros((M, H, W), bool),
        static_mask=jnp.ones((M, H, W), bool),
        has_static=jnp.zeros((M,), bool),
        count=jnp.zeros((), jnp.int32),
    )


@jax.jit
def add_keyframe(buf: KeyframeBuffer, cam: Camera) -> tuple[KeyframeBuffer, jax.Array]:
    """Append a camera; returns (buffer, slot). Overwrites the last slot if
    full (should not happen with sane capacity)."""
    slot = jnp.minimum(buf.count, buf.capacity - 1)
    img_u8 = jnp.clip(cam.image * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return (
        buf.replace(
            frame_idx=buf.frame_idx.at[slot].set(cam.uid),
            images_u8=buf.images_u8.at[slot].set(img_u8),
            R=buf.R.at[slot].set(cam.R),
            T=buf.T.at[slot].set(cam.T),
            exposure_ab=buf.exposure_ab.at[slot].set(
                jnp.stack([cam.exposure_a, cam.exposure_b])
            ),
            mono_depth=buf.mono_depth.at[slot].set(cam.mono_depth),
            grad_mask=buf.grad_mask.at[slot].set(cam.grad_mask),
            static_mask=buf.static_mask.at[slot].set(cam.static_mask),
            has_static=buf.has_static.at[slot].set(cam.has_static_mask),
            count=jnp.minimum(buf.count + 1, buf.capacity),
        ),
        slot,
    )


def camera_from_slot(buf: KeyframeBuffer, slot: jax.Array) -> Camera:
    """Materialise a Camera pytree from a buffer slot (device-side)."""
    safe = jnp.clip(slot, 0, buf.capacity - 1)
    return Camera(
        uid=buf.frame_idx[safe],
        image=buf.images_u8[safe].astype(jnp.float32) / 255.0,
        R=buf.R[safe],
        T=buf.T[safe],
        R_gt=buf.R[safe],
        T_gt=buf.T[safe],
        cam_rot_delta=jnp.zeros(3, jnp.float32),
        cam_trans_delta=jnp.zeros(3, jnp.float32),
        exposure_a=buf.exposure_ab[safe, 0],
        exposure_b=buf.exposure_ab[safe, 1],
        depth=jnp.zeros_like(buf.mono_depth[safe]),
        mono_depth=buf.mono_depth[safe],
        grad_mask=buf.grad_mask[safe],
        static_mask=buf.static_mask[safe],
        has_static_mask=buf.has_static[safe],
    )


@jax.jit
def update_pose_in_buffer(
    buf: KeyframeBuffer, slot: jax.Array, R: jax.Array, T: jax.Array
) -> KeyframeBuffer:
    return buf.replace(R=buf.R.at[slot].set(R), T=buf.T.at[slot].set(T))


@jax.jit
def update_mono_depth_in_buffer(
    buf: KeyframeBuffer, slot: jax.Array, mono_depth: jax.Array
) -> KeyframeBuffer:
    return buf.replace(mono_depth=buf.mono_depth.at[slot].set(mono_depth))
