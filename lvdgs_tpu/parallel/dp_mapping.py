"""Multi-chip mapping step: camera-data-parallel x Gaussian-sharded.

TPU-native scaling of the mapping optimisation (no reference equivalent —
the reference is single-GPU, SURVEY.md §2.6-2.7). Sharding layout on a
(data, gauss) mesh:

- The Gaussian map (all PARAM_FIELDS + Adam moments) is sharded along its
  capacity dimension over the `gauss` axis.
- The keyframe/camera batch is sharded over the `data` axis.
- Inside `shard_map`, each device all-gathers the map along `gauss`
  (tile-friendly: one ICI all-gather per step), renders its local cameras,
  and autodiff transposes the all-gather into a reduce-scatter of map
  gradients back to the local shard; a psum over `data` completes DDP.
- The Adam update then runs shard-locally — optimizer state never leaves
  its shard (ZeRO-style sharded optimizer).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import lie
from ..core.camera import Intrinsics
from ..gaussian.model import PARAM_FIELDS
from ..ops.rasterizer import RenderConfig, rasterize


def make_sharded_mapping_step(
    mesh: Mesh,
    intr: Intrinsics,
    rcfg: RenderConfig,
    *,
    lrs: Dict[str, float] | None = None,
    alpha: float = 0.95,
    rgb_boundary_threshold: float = 0.01,
    isotropic_weight: float = 10.0,
    b1: float = 0.9,
    b2: float = 0.999,
    adam_eps: float = 1e-15,
):
    """Returns (step_fn, shard_fn).

    step_fn(params, active, m, v, count, images, mono_depths, Rs, Ts, taus)
      -> (new_params, new_m, new_v, new_count, loss)
    where params/active/m/v are sharded along gauss, camera arrays along
    data. `taus` are per-camera pose deltas (for windowed pose refinement in
    the multi-chip regime) — their gradients are returned in `loss` aux via
    closure-free design later; this step optimises the map.
    """
    if lrs is None:
        lrs = {
            "means": 1.6e-4,
            "features_dc": 2.5e-3,
            "log_scales": 1e-3,
            "quats": 1e-3,
            "logit_opacities": 5e-2,
        }

    def local_loss(full_params, full_active, images, mono_depths, Rs, Ts, taus):
        def per_cam(xs):
            image, mono_depth, R, T, tau = xs
            Rn, Tn = lie.apply_delta(R, T, tau)
            out = rasterize(full_params, full_active, Rn, Tn, intr, rcfg)
            mr = (image.sum(0) > rgb_boundary_threshold)[None].astype(jnp.float32)
            md = (mono_depth > 0.01)[None].astype(jnp.float32)
            l_rgb = jnp.abs(out.image * mr - image * mr).mean()
            l_d = jnp.abs(out.depth * md - mono_depth[None] * md).mean()
            return alpha * l_rgb + (1 - alpha) * l_d

        losses = jax.lax.map(per_cam, (images, mono_depths, Rs, Ts, taus))
        return losses.sum()

    def shard_body(params, active, m, v, count, images, mono_depths, Rs, Ts, taus):
        # gather the full map along the gauss axis (ICI all-gather);
        # autodiff transposes this into a reduce-scatter of gradients.
        def loss_of_shard(p_shard):
            full = {
                k: jax.lax.all_gather(x, "gauss", axis=0, tiled=True)
                for k, x in p_shard.items()
            }
            full_active = jax.lax.all_gather(active, "gauss", axis=0, tiled=True)
            loss = local_loss(full, full_active, images, mono_depths, Rs, Ts, taus)
            # isotropic reg on the local shard (cheap, exact when psummed)
            scaling = jnp.exp(p_shard["log_scales"])
            dev = jnp.abs(scaling - scaling.mean(axis=1, keepdims=True))
            nactive = jax.lax.psum(active.sum(), "gauss")
            iso = jax.lax.psum(
                (dev * active[:, None]).sum(), "gauss"
            ) / (nactive.astype(jnp.float32) * 3 + 1e-8)
            # every data shard adds the (identical) iso term and the total
            # loss is psum'd over `data` — divide here so the term (and its
            # gradient) is counted exactly once
            iso = iso / jax.lax.axis_size("data")
            return loss + isotropic_weight * iso

        loss, grads = jax.value_and_grad(loss_of_shard)(params)
        # DDP: average over the data axis
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        loss = jax.lax.psum(loss, "data")

        new_count = count + 1
        cf = new_count.astype(jnp.float32)
        new_params, new_m, new_v = {}, {}, {}
        for f in PARAM_FIELDS:
            g = grads[f]
            mask = active if g.ndim == 1 else active[:, None]
            g = jnp.where(mask, g, 0.0)
            mf = b1 * m[f] + (1 - b1) * g
            vf = b2 * v[f] + (1 - b2) * g * g
            mhat = mf / (1 - b1**cf)
            vhat = vf / (1 - b2**cf)
            upd = lrs[f] * mhat / (jnp.sqrt(vhat) + adam_eps)
            new_params[f] = params[f] - jnp.where(mask, upd, 0.0)
            new_m[f], new_v[f] = mf, vf
        return new_params, new_m, new_v, new_count, loss

    pdict_g = {f: P("gauss") for f in PARAM_FIELDS}
    in_specs = (
        pdict_g,  # params
        P("gauss"),  # active
        pdict_g,  # m
        pdict_g,  # v
        P(),  # count
        P("data"),  # images
        P("data"),  # mono_depths
        P("data"),  # Rs
        P("data"),  # Ts
        P("data"),  # taus
    )
    out_specs = (pdict_g, pdict_g, pdict_g, P(), P())

    step = jax.jit(
        jax.shard_map(
            shard_body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )

    def shard_fn(params, active, m, v, cam_batch):
        """Device-put pytrees with the step's shardings."""
        sh_g = NamedSharding(mesh, P("gauss"))
        sh_d = NamedSharding(mesh, P("data"))
        params = jax.tree.map(lambda x: jax.device_put(x, sh_g), params)
        active = jax.device_put(active, sh_g)
        m = jax.tree.map(lambda x: jax.device_put(x, sh_g), m)
        v = jax.tree.map(lambda x: jax.device_put(x, sh_g), v)
        cam_batch = jax.tree.map(lambda x: jax.device_put(x, sh_d), cam_batch)
        return params, active, m, v, cam_batch

    return step, shard_fn
