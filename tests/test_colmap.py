"""COLMAP export (io/colmap.py): database schema round-trip, pose-prior
quaternions, text model format. Reference capability:
mast3r/colmap/database.py export_images/export_matches."""
import sqlite3
import types

import numpy as np

from lvdgs_tpu.io.colmap import (
    ColmapDatabase,
    export_slam_to_colmap,
    export_text_model,
    pair_id_from_images,
    rotmat_to_qvec,
)


def _rot(axis, ang):
    c, s = np.cos(ang), np.sin(ang)
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def test_qvec_roundtrip():
    for ang in (0.0, 0.3, -1.2, 2.9):
        R = _rot("z", ang) @ _rot("x", ang * 0.7)
        q = rotmat_to_qvec(R)
        w, x, y, z = q
        # rebuild rotation from quaternion and compare
        R2 = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R2, R, atol=1e-8)
        assert q[0] >= 0


def test_database_roundtrip(tmp_path):
    path = str(tmp_path / "database.db")
    kps = np.array([[10.0, 20.0], [30.5, 40.5], [1.0, 2.0]], np.float32)
    matches = np.array([[0, 2], [1, 0]], np.uint32)
    with ColmapDatabase(path) as db:
        cam = db.add_camera("PINHOLE", 640, 480,
                            np.array([500.0, 500.0, 320.0, 240.0]))
        im1 = db.add_image("a.png", cam, prior_q=np.array([1.0, 0, 0, 0]),
                           prior_t=np.array([0.0, 0, 1]))
        im2 = db.add_image("b.png", cam)
        db.add_keypoints(im1, kps)
        db.add_matches(im1, im2, matches)
        db.add_two_view_geometry(im1, im2, matches)

    conn = sqlite3.connect(path)
    model, w, h, params = conn.execute(
        "SELECT model, width, height, params FROM cameras").fetchone()
    assert (model, w, h) == (1, 640, 480)
    np.testing.assert_allclose(
        np.frombuffer(params, np.float64), [500, 500, 320, 240])

    rows = conn.execute(
        "SELECT image_id, name, prior_qw, prior_tz FROM images "
        "ORDER BY image_id").fetchall()
    assert rows[0][1] == "a.png" and rows[0][2] == 1.0 and rows[0][3] == 1.0
    assert rows[1][1] == "b.png"

    r, c, data = conn.execute(
        "SELECT rows, cols, data FROM keypoints WHERE image_id=?",
        (im1,)).fetchone()
    kp = np.frombuffer(data, np.float32).reshape(r, c)
    np.testing.assert_allclose(kp[:, :2], kps)

    pid = pair_id_from_images(im1, im2)
    r, c, data = conn.execute(
        "SELECT rows, cols, data FROM matches WHERE pair_id=?",
        (pid,)).fetchone()
    m = np.frombuffer(data, np.uint32).reshape(r, c)
    np.testing.assert_array_equal(m, matches)
    assert conn.execute(
        "SELECT config FROM two_view_geometries WHERE pair_id=?",
        (pid,)).fetchone()[0] == 2
    conn.close()


def test_pair_id_ordering():
    assert pair_id_from_images(3, 7) == pair_id_from_images(7, 3)
    assert pair_id_from_images(1, 2) != pair_id_from_images(1, 3)


def _fake_slam():
    """Minimal SLAM-shaped object: intr + frames + gmap."""
    import jax.numpy as jnp

    from lvdgs_tpu.core.camera import Intrinsics
    from lvdgs_tpu.gaussian.model import create_map

    gmap = create_map(16)
    gmap = gmap.replace(
        means=jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)),
                          jnp.float32),
        active=jnp.asarray([True] * 5 + [False] * 11),
    )
    frames = {}
    for i in range(4):
        R = _rot("z", 0.1 * i)
        frames[i] = {"R": R.astype(np.float32),
                     "T": np.array([0.0, 0, 0.5 * i], np.float32)}
    slam = types.SimpleNamespace(
        intr=Intrinsics(fx=100.0, fy=100.0, cx=32.0, cy=24.0,
                        width=64, height=48),
        frames=frames,
        gmap=gmap,
        kf_indices=[0, 2],
    )
    return slam


def test_export_slam_to_colmap(tmp_path):
    slam = _fake_slam()

    def matcher(a, b):
        xy = np.array([[5.0, 6.0], [10.0, 12.0]], np.float32)
        return xy, xy + 1.0

    db_path = export_slam_to_colmap(
        slam, str(tmp_path), match_pairs=[(0, 2)], matcher=matcher)

    conn = sqlite3.connect(db_path)
    assert conn.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 4
    assert conn.execute("SELECT COUNT(*) FROM matches").fetchone()[0] == 1
    assert conn.execute("SELECT COUNT(*) FROM keypoints").fetchone()[0] == 2
    conn.close()

    sparse = tmp_path / "sparse"
    cam_lines = [ln for ln in (sparse / "cameras.txt").read_text().splitlines()
                 if ln and not ln.startswith("#")]
    assert cam_lines[0].split()[:4] == ["1", "PINHOLE", "64", "48"]
    img_lines = [ln for ln in (sparse / "images.txt").read_text().splitlines()
                 if ln and not ln.startswith("#")]
    assert len(img_lines) == 4  # one pose line per frame (2D line blank)
    # frame 0: identity rotation, zero translation
    v = img_lines[0].split()
    np.testing.assert_allclose([float(x) for x in v[1:8]],
                               [1, 0, 0, 0, 0, 0, 0], atol=1e-12)
    pt_lines = [ln for ln in (sparse / "points3D.txt").read_text().splitlines()
                if ln and not ln.startswith("#")]
    assert len(pt_lines) == 5  # active gaussians only
