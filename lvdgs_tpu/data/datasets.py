"""Dataset parsers and loaders.

Directory/file conventions are kept compatible with the reference
(utils/dataset.py) so existing dataset layouts work unchanged:
- KITTI: image_2/*.jpg + gt/*.txt (12-number row-major 3x4 poses), poses
  origin-normalised then inverted to w2c (reference utils/dataset.py:68-107)
- Waymo: rgb/ + depth/ + mono_depth/ + gt/*.txt 4x4 poses (:109-133)
- Replica: results/frame*.png + results/depth*.png + traj.txt (:135-163)
- TUM: rgb.txt/depth.txt/groundtruth.txt association (:166-245)
- dl3dv: rgb/*.png + cameras.json quaternion poses (:25-66)
- synthetic: procedurally rendered Gaussian world (new capability — gives a
  self-contained end-to-end benchmark requiring no downloads)

All __getitem__ return (image (3,H,W) float32 [0,1], depth (H,W) | None,
w2c pose (4,4) float32, mono_depth (H,W) | None) as numpy arrays; device
placement happens at use sites.

RGB-only datasets use the first image channel as a depth placeholder, as the
reference does (utils/dataset.py:21-22) — the live mono depth is produced by
the pointmap network at runtime.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image

from ..core.camera import Intrinsics


def _rotmat_from_quat_xyzw(q):
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


# ---------------------------------------------------------------------------
# parsers


class KITTIParser:
    def __init__(self, input_folder: str, config):
        begin = config["Dataset"].get("begin", 0)
        end = config["Dataset"].get("end", None)
        self.color_paths = sorted(glob.glob(f"{input_folder}/image_2/*.jpg"))[begin:end]
        if not self.color_paths:
            self.color_paths = sorted(glob.glob(f"{input_folder}/image_2/*.png"))[begin:end]
        self.depth_paths = list(self.color_paths)
        self.mono_depth_paths = list(self.color_paths)
        self.n_img = len(self.color_paths)
        pose_files = sorted(glob.glob(f"{input_folder}gt/*.txt") or glob.glob(f"{input_folder}/gt/*.txt"))[
            begin:end
        ]
        self.poses = []
        init_trans = None
        for i in range(self.n_img):
            arr = np.loadtxt(pose_files[i], delimiter=" ")
            pose = np.eye(4)
            pose[:3, :] = arr.reshape(3, 4)
            if init_trans is None:
                init_trans = pose[:3, 3].copy()
            pose[:3, 3] -= init_trans
            self.poses.append(np.linalg.inv(pose))


class WaymoParser:
    def __init__(self, input_folder: str, config=None):
        self.color_paths = sorted(glob.glob(f"{input_folder}/rgb/*.png"))
        self.depth_paths = sorted(glob.glob(f"{input_folder}/depth/*.png"))
        self.mono_depth_paths = sorted(glob.glob(f"{input_folder}/mono_depth/*.png"))
        self.n_img = len(self.color_paths)
        pose_files = sorted(glob.glob(f"{input_folder}/gt/*.txt"))
        self.poses = [
            np.linalg.inv(np.loadtxt(pose_files[i], delimiter=" ").reshape(4, 4))
            for i in range(self.n_img)
        ]


class ReplicaParser:
    def __init__(self, input_folder: str, config=None):
        self.color_paths = sorted(glob.glob(f"{input_folder}/results/frame*.png"))
        self.depth_paths = sorted(glob.glob(f"{input_folder}/results/depth*.png"))
        self.mono_depth_paths = sorted(glob.glob(f"{input_folder}/results/mono*.png"))
        self.n_img = len(self.color_paths)
        traj = f"{input_folder}traj.txt"
        if not os.path.exists(traj):
            traj = os.path.join(input_folder, "traj.txt")
        with open(traj) as f:
            lines = f.readlines()
        self.poses = [
            np.linalg.inv(np.array(list(map(float, lines[i].split()))).reshape(4, 4))
            for i in range(self.n_img)
        ]


class TUMParser:
    def __init__(self, input_folder: str, config=None, frame_rate: int = 32):
        self.input_folder = input_folder
        self._load(input_folder, frame_rate)
        self.n_img = len(self.color_paths)

    @staticmethod
    def _parse_list(path, skiprows=0):
        return np.loadtxt(path, delimiter=" ", dtype=np.str_, skiprows=skiprows)

    @staticmethod
    def _associate(t_img, t_depth, t_pose, max_dt=0.08):
        out = []
        for i, t in enumerate(t_img):
            j = int(np.argmin(np.abs(t_depth - t)))
            k = int(np.argmin(np.abs(t_pose - t)))
            if abs(t_depth[j] - t) < max_dt and abs(t_pose[k] - t) < max_dt:
                out.append((i, j, k))
        return out

    def _load(self, datapath, frame_rate):
        pose_list = os.path.join(datapath, "groundtruth.txt")
        if not os.path.isfile(pose_list):
            pose_list = os.path.join(datapath, "pose.txt")
        image_data = self._parse_list(os.path.join(datapath, "rgb.txt"))
        depth_data = self._parse_list(os.path.join(datapath, "depth.txt"))
        mono_path = os.path.join(datapath, "mono_depth.txt")
        mono_data = self._parse_list(mono_path) if os.path.isfile(mono_path) else depth_data
        pose_data = self._parse_list(pose_list, skiprows=1)
        pose_vecs = pose_data[:, 0:].astype(np.float64)

        t_img = image_data[:, 0].astype(np.float64)
        t_depth = depth_data[:, 0].astype(np.float64)
        t_pose = pose_data[:, 0].astype(np.float64)
        assoc = self._associate(t_img, t_depth, t_pose)

        indices = [0]
        for i in range(1, len(assoc)):
            t0 = t_img[assoc[indices[-1]][0]]
            t1 = t_img[assoc[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                indices.append(i)

        self.color_paths, self.depth_paths, self.mono_depth_paths, self.poses = [], [], [], []
        for ix in indices:
            i, j, k = assoc[ix]
            self.color_paths.append(os.path.join(datapath, str(image_data[i, 1])))
            self.depth_paths.append(os.path.join(datapath, str(depth_data[j, 1])))
            self.mono_depth_paths.append(os.path.join(datapath, str(mono_data[min(i, len(mono_data) - 1), 1])))
            trans = pose_vecs[k][1:4]
            quat = pose_vecs[k][4:8]  # x y z w
            T = np.eye(4)
            T[:3, :3] = _rotmat_from_quat_xyzw(quat)
            T[:3, 3] = trans
            self.poses.append(np.linalg.inv(T))


class DL3DVParser:
    def __init__(self, input_folder: str, config):
        begin = config["Dataset"].get("begin", 0)
        end = config["Dataset"].get("end", None)
        self.color_paths = sorted(glob.glob(f"{input_folder}/rgb/*.png"))[begin:end]
        self.depth_paths = list(self.color_paths)
        self.mono_depth_paths = list(self.color_paths)
        self.n_img = len(self.color_paths)
        with open(os.path.join(input_folder, "cameras.json")) as f:
            all_poses = json.load(f)
        sel = all_poses[begin:end]
        init_trans = np.array(sel[0]["cam_trans"])
        self.poses = []
        for pose in sel:
            T = np.eye(4)
            T[:3, :3] = _rotmat_from_quat_xyzw(pose["cam_quat"])
            T[:3, 3] = np.array(pose["cam_trans"]) - init_trans
            self.poses.append(np.linalg.inv(T))


# ---------------------------------------------------------------------------
# datasets


class MonocularDataset:
    """Reference MonocularDataset parity (utils/dataset.py:263-344)."""

    PARSERS = {
        "KITTI": KITTIParser,
        "waymo": WaymoParser,
        "replica": ReplicaParser,
        "tum": TUMParser,
        "dl3dv": DL3DVParser,
    }

    def __init__(self, args, path, config):
        self.args = args
        self.path = path
        self.config = config
        calib = config["Dataset"]["Calibration"]
        self.intrinsics = Intrinsics(
            fx=calib["fx"],
            fy=calib["fy"],
            cx=calib["cx"],
            cy=calib["cy"],
            width=calib["width"],
            height=calib["height"],
        )
        self.fx, self.fy = calib["fx"], calib["fy"]
        self.cx, self.cy = calib["cx"], calib["cy"]
        self.width, self.height = calib["width"], calib["height"]
        self.fovx = self.intrinsics.fovx
        self.fovy = self.intrinsics.fovy
        self.K = self.intrinsics.K.astype(np.float64)

        self.disorted = calib.get("distorted", False)
        self.dist_coeffs = np.array(
            [calib.get(k, 0.0) for k in ("k1", "k2", "p1", "p2", "k3")]
        )
        if self.disorted and cv2 is not None:
            self.map1x, self.map1y = cv2.initUndistortRectifyMap(
                self.K, self.dist_coeffs, np.eye(3), self.K,
                (self.width, self.height), cv2.CV_32FC1,
            )
        self.has_depth = "depth_scale" in calib
        self.depth_scale = calib.get("depth_scale")

        dtype = config["Dataset"]["type"]
        parser = self.PARSERS[dtype](config["Dataset"]["dataset_path"], config)
        self.color_paths = parser.color_paths
        self.depth_paths = parser.depth_paths
        self.mono_depth_paths = parser.mono_depth_paths
        self.poses = parser.poses
        self.num_imgs = parser.n_img

    def __len__(self):
        return self.num_imgs

    @staticmethod
    def _load_depth_image(path):
        arr = np.array(Image.open(path))
        if arr.ndim == 3:
            return arr[:, :, 0]
        return arr

    def __getitem__(self, idx):
        image = np.array(Image.open(self.color_paths[idx]))
        if self.disorted and cv2 is not None:
            image = cv2.remap(image, self.map1x, self.map1y, cv2.INTER_LINEAR)

        depth = mono_depth = None
        if self.has_depth:
            depth = self._load_depth_image(self.depth_paths[idx]) / self.depth_scale
            mono_depth = self._load_depth_image(self.mono_depth_paths[idx]) / (
                self.depth_scale * 5
            )
        image = np.clip(image / 255.0, 0.0, 1.0).transpose(2, 0, 1).astype(np.float32)
        pose = np.asarray(self.poses[idx], np.float32)
        return image, depth, pose, mono_depth


class SyntheticDataset:
    """Procedural Gaussian-world dataset (new capability).

    Renders a fixed random Gaussian scene along a smooth trajectory with the
    framework's own rasterizer, providing photometrically consistent RGB +
    exact depth + ground-truth poses — the self-contained end-to-end test
    and benchmark scene (SURVEY.md §4 proposed strategy).
    """

    def __init__(self, args, path, config):
        import jax.numpy as jnp
        from ..ops.rasterizer import RenderConfig, rasterize

        scfg = config["Dataset"]
        calib = scfg["Calibration"]
        self.intrinsics = Intrinsics(
            fx=calib["fx"], fy=calib["fy"], cx=calib["cx"], cy=calib["cy"],
            width=calib["width"], height=calib["height"],
        )
        self.fx, self.fy = calib["fx"], calib["fy"]
        self.cx, self.cy = calib["cx"], calib["cy"]
        self.width, self.height = calib["width"], calib["height"]
        self.fovx, self.fovy = self.intrinsics.fovx, self.intrinsics.fovy
        self.K = self.intrinsics.K
        self.disorted = False
        self.dist_coeffs = np.zeros(5)
        self.has_depth = True
        self.depth_scale = 1.0
        self.num_imgs = scfg.get("n_frames", 30)

        n = scfg.get("n_gaussians", 4000)
        rng = np.random.default_rng(scfg.get("seed", 0))
        spread = scfg.get("spread", 4.0)
        means = np.concatenate(
            [
                rng.normal(size=(n, 2)) * spread,
                rng.uniform(4.0, 14.0, size=(n, 1)),
            ],
            axis=1,
        )
        self._params = {
            "means": jnp.asarray(means, jnp.float32),
            "features_dc": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
            "log_scales": jnp.asarray(rng.uniform(-2.0, -0.9, size=(n, 3)), jnp.float32),
            "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
            "logit_opacities": jnp.asarray(rng.uniform(1.5, 4.0, size=(n,)), jnp.float32),
        }
        self._active = jnp.ones((n,), bool)
        self._rcfg = RenderConfig(
            tile_size=16,
            max_per_tile=scfg.get("max_per_tile", 256),
            gaussian_chunk=32,
            tile_chunk=64,
        )
        self._rasterize = rasterize

        # smooth forward + lateral trajectory (w2c poses)
        step = scfg.get("step", 0.06)
        self.poses = []
        for i in range(self.num_imgs):
            t = np.array([0.3 * np.sin(i * 0.15), 0.05 * np.sin(i * 0.08), -step * i])
            ang = 0.02 * np.sin(i * 0.1)
            R = np.array(
                [
                    [np.cos(ang), 0, np.sin(ang)],
                    [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)],
                ]
            )
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            self.poses.append(T.astype(np.float32))
        self._cache = {}

    def __len__(self):
        return self.num_imgs

    def __getitem__(self, idx):
        import jax.numpy as jnp

        if idx not in self._cache:
            pose = self.poses[idx]
            out = self._rasterize(
                self._params,
                self._active,
                jnp.asarray(pose[:3, :3]),
                jnp.asarray(pose[:3, 3]),
                self.intrinsics,
                self._rcfg,
            )
            # stay ON DEVICE: this dataset is procedural, and a device->host
            # round trip of the full frame costs ~3 s through the TPU relay
            # (PERFORMANCE.md) — real file datasets go through the prefetch
            # loader instead
            depth = jnp.where(
                out.opacity[0] > 0.5,
                out.depth[0] / jnp.maximum(out.opacity[0], 1e-6),
                0.0,
            )
            self._cache[idx] = (out.image, depth)
        image, depth = self._cache[idx]
        return image, depth, self.poses[idx], depth


def load_dataset(args, path, config):
    """Reference load_dataset dispatch (utils/dataset.py:404-416) + synthetic."""
    dtype = config["Dataset"]["type"]
    if dtype == "synthetic":
        return SyntheticDataset(args, path, config)
    if dtype in MonocularDataset.PARSERS:
        return MonocularDataset(args, path, config)
    raise ValueError(f"Unknown dataset type: {dtype}")
