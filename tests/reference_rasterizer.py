"""Brute-force NumPy reference rasterizer for testing.

Implements the same math as lvdgs_tpu.ops.rasterizer but per-pixel over all
Gaussians with no tiling, binning, or chunking — the ground truth for
correctness tests (SURVEY.md §4 proposed test strategy).
"""
import math

import numpy as np

NEAR_PLANE = 0.2
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1.0e-4
COV_DILATION = 0.3
SH_C0 = 0.28209479177387814


def quat_to_rotmat_np(q):
    q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )
    return R


def render_np(params, active, R, t, intr, bg=np.zeros(3)):
    """Returns dict with render/depth/opacity/radii/visibility/n_touched."""
    means = np.asarray(params["means"], np.float64)
    quats = np.asarray(params["quats"], np.float64)
    log_scales = np.asarray(params["log_scales"], np.float64)
    colors = np.clip(0.5 + SH_C0 * np.asarray(params["features_dc"], np.float64), 0, 1)
    opac = 1.0 / (1.0 + np.exp(-np.asarray(params["logit_opacities"], np.float64)))
    active = np.asarray(active, bool)
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)

    C = means.shape[0]
    H, W = intr.height, intr.width
    p_cam = means @ R.T + t
    z = p_cam[:, 2]
    in_front = z > NEAR_PLANE
    zs = np.where(in_front, z, 1.0)
    u = intr.fx * p_cam[:, 0] / zs + intr.cx
    v = intr.fy * p_cam[:, 1] / zs + intr.cy

    Rm = quat_to_rotmat_np(quats)
    S = np.exp(log_scales)
    M = Rm * S[:, None, :]
    cov3d = M @ M.transpose(0, 2, 1)
    covc = np.einsum("ij,njk,lk->nil", R, cov3d, R)

    tanfovx = math.tan(intr.fovx * 0.5)
    tanfovy = math.tan(intr.fovy * 0.5)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    txz = np.clip(p_cam[:, 0] / zs, -limx, limx)
    tyz = np.clip(p_cam[:, 1] / zs, -limy, limy)
    j00 = intr.fx / zs
    j02 = -intr.fx * txz / zs
    j11 = intr.fy / zs
    j12 = -intr.fy * tyz / zs
    a = j00**2 * covc[:, 0, 0] + 2 * j00 * j02 * covc[:, 0, 2] + j02**2 * covc[:, 2, 2] + COV_DILATION
    b = (
        j00 * j11 * covc[:, 0, 1]
        + j00 * j12 * covc[:, 0, 2]
        + j02 * j11 * covc[:, 1, 2]
        + j02 * j12 * covc[:, 2, 2]
    )
    c = j11**2 * covc[:, 1, 1] + 2 * j11 * j12 * covc[:, 1, 2] + j12**2 * covc[:, 2, 2] + COV_DILATION
    det = a * c - b * b
    valid = in_front & active & (det > 0)
    det_s = np.where(valid, det, 1.0)
    conic = np.stack([c / det_s, -b / det_s, a / det_s], -1)
    mid = 0.5 * (a + c)
    lam1 = mid + np.sqrt(np.maximum(0.1, mid * mid - det))
    radius = np.ceil(3.0 * np.sqrt(np.maximum(lam1, 0.0)))
    radius = np.where(valid, radius, 0.0)
    valid = valid & (radius > 0)

    order = np.argsort(np.where(valid, z, np.inf), kind="stable")

    img = np.zeros((H, W, 3))
    dep = np.zeros((H, W))
    trans = np.ones((H, W))
    n_touched = np.zeros(C, np.int64)

    for gi in order:
        if not valid[gi]:
            continue
        r = radius[gi]
        x0 = max(int(np.floor(u[gi] - r)), 0)
        x1 = min(int(np.floor(u[gi] + r)) + 1, W)
        y0 = max(int(np.floor(v[gi] - r)), 0)
        y1 = min(int(np.floor(v[gi] + r)) + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        xs = np.arange(x0, x1, dtype=np.float64)
        ys = np.arange(y0, y1, dtype=np.float64)
        dx = xs[None, :] - u[gi]
        dy = ys[:, None] - v[gi]
        A, B, Cc = conic[gi]
        power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
        alpha = np.minimum(ALPHA_MAX, opac[gi] * np.exp(power))
        alpha = np.where((power <= 0) & (alpha >= ALPHA_MIN), alpha, 0.0)
        t_here = trans[y0:y1, x0:x1]
        contributes = t_here > T_EPS
        w = np.where(contributes, alpha * t_here, 0.0)
        img[y0:y1, x0:x1] += w[..., None] * colors[gi]
        dep[y0:y1, x0:x1] += w * z[gi]
        n_touched[gi] += int((w > 0).sum())
        trans[y0:y1, x0:x1] = t_here * (1 - alpha)

    alpha_img = 1.0 - trans
    img = img + trans[..., None] * bg[None, None, :]
    return {
        "render": img.transpose(2, 0, 1),
        "depth": dep[None],
        "opacity": alpha_img[None],
        "radii": radius,
        "visibility_filter": valid,
        "n_touched": n_touched,
    }
