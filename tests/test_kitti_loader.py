"""KITTI ingestion path, proven against format-faithful fixtures.

The loaders in vloam_tpu/data/kitti.py implement the reference's calib /
.bin parsing semantics (point_cloud_util.cpp:24-176).  These tests build a
miniature raw drive and odometry sequence in tmpdirs with the REAL file
grammar — distractor keys from other cameras, odd image dims (375-row
KITTI quirk), float32 xyzr .bin stride — and pin:

  * calib parsing against hand-computed projection matrices,
  * .bin xyz extraction with reflectance values chosen to corrupt xyz if
    the stride were wrong,
  * PNG loading + padding parity between the NumPy loader and the native
    C++ prefetcher,
  * (slow) run_kitti end-to-end over the fixture through BOTH loader
    paths, asserting the trajectories agree.
"""

import os

import numpy as np
import pytest

from vloam_tpu.data import kitti, synthetic
from vloam_tpu.data.gridding import grid_cloud


# ---------------------------------------------------------------------------
# fixture builders (real KITTI file grammar)
# ---------------------------------------------------------------------------

CAM_R_VELO = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
CAM_T_VELO_T = np.array([0.011, -0.054, -0.292])   # realistic magnitudes
R_RECT = np.array([
    [0.9999, 0.0098, -0.0074],
    [-0.0098, 0.9999, -0.0043],
    [0.0074, 0.0044, 0.9999],
])
P_RECT = np.array([
    [718.856, 0.0, 607.193, 45.382],
    [0.0, 718.856, 185.216, -0.113],
    [0.0, 0.0, 1.0, 0.004],
])


def _fmt(vals):
    return " ".join(f"{v:.12e}" for v in np.asarray(vals).ravel())


def write_raw_calib(date_dir, cam_R_velo=CAM_R_VELO, cam_t_velo=CAM_T_VELO_T,
                    r_rect=R_RECT, p_rect=P_RECT):
    os.makedirs(date_dir, exist_ok=True)
    # calib_velo_to_cam.txt: the reference reads ONLY the "R:"/"T:" keys
    # (point_cloud_util.cpp:50-82); delta_f/delta_c must be ignored.
    with open(os.path.join(date_dir, "calib_velo_to_cam.txt"), "w") as f:
        f.write("calib_time: 15-Mar-2026 11:37:16\n")
        f.write(f"R: {_fmt(cam_R_velo)}\n")
        f.write(f"T: {_fmt(cam_t_velo)}\n")
        f.write("delta_f: 0.000000e+00 0.000000e+00\n")
        f.write("delta_c: 0.000000e+00 0.000000e+00\n")
    # calib_cam_to_cam.txt: full grammar with the OTHER cameras' keys as
    # distractors — R_rect_01/P_rect_01 must not clobber camera 00.
    with open(os.path.join(date_dir, "calib_cam_to_cam.txt"), "w") as f:
        f.write("calib_time: 09-Jan-2026 13:57:47\n")
        f.write("corner_dist: 9.950000e-02\n")
        f.write("S_00: 1.392000e+03 5.120000e+02\n")
        f.write(f"K_00: {_fmt(np.diag([9.8e2, 9.8e2, 1.0]))}\n")
        f.write("D_00: -3.7e-01 1.9e-01 1.5e-03 -3.4e-04 -6.7e-02\n")
        f.write(f"R_00: {_fmt(np.eye(3))}\n")
        f.write("T_00: 2.5e-17 -1.1e-17 1.2e-17\n")
        f.write("S_rect_00: 1.242000e+03 3.750000e+02\n")
        f.write(f"R_rect_00: {_fmt(r_rect)}\n")
        f.write(f"P_rect_00: {_fmt(p_rect)}\n")
        # distractor block: camera 01 with deliberately different values
        f.write(f"R_rect_01: {_fmt(np.eye(3) * 0.5)}\n")
        f.write(f"P_rect_01: {_fmt(np.arange(12, dtype=float))}\n")
    with open(os.path.join(date_dir, "calib_imu_to_velo.txt"), "w") as f:
        f.write("calib_time: 25-May-2026 16:47:16\n")
        f.write(f"R: {_fmt(np.eye(3))}\n")
        f.write("T: -8.086759e-01 3.195559e-01 -7.997231e-01\n")


def write_bin(path, xyz, refl=None):
    """float32 xyzr records (point_cloud_util.cpp:148-176 layout)."""
    n = len(xyz)
    if refl is None:
        refl = np.linspace(0.0, 1.0, n)
    rec = np.concatenate([xyz.astype(np.float32), refl.reshape(-1, 1).astype(np.float32)], 1)
    rec.ravel().tofile(path)


def write_png(path, img):
    from PIL import Image

    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), mode="L").save(path)


def make_raw_drive(root, date, seq, clouds, images):
    """Assemble <root>/<date>/... with the raw-drive directory layout."""
    date_dir = os.path.join(root, date)
    write_raw_calib(date_dir)
    drive = os.path.join(date_dir, f"{date}_drive_{seq}_sync")
    velo = os.path.join(drive, "velodyne_points", "data")
    img = os.path.join(drive, "image_00", "data")
    os.makedirs(velo), os.makedirs(img)
    for i, c in enumerate(clouds):
        write_bin(os.path.join(velo, f"{i:010d}.bin"), c)
    for i, m in enumerate(images):
        write_png(os.path.join(img, f"{i:010d}.png"), m)
    return root


# ---------------------------------------------------------------------------
# calib parsing vs hand-computed matrices
# ---------------------------------------------------------------------------

def test_raw_calib_parsing(tmp_path):
    date_dir = str(tmp_path / "2026_03_15")
    write_raw_calib(date_dir)
    calib = kitti.load_calib_raw(date_dir)

    expect_cTv = np.eye(4)
    expect_cTv[:3, :3] = CAM_R_VELO
    expect_cTv[:3, 3] = CAM_T_VELO_T
    np.testing.assert_allclose(calib.cam_T_velo, expect_cTv, atol=1e-12)

    expect_rect = np.eye(4)
    expect_rect[:3, :3] = R_RECT
    np.testing.assert_allclose(calib.rect0_T_cam, expect_rect, atol=1e-12)
    np.testing.assert_allclose(calib.P_rect0, P_RECT, atol=1e-12)

    # full projection chain (point_cloud_util.cpp:191-193)
    expect_proj = (P_RECT @ expect_rect @ expect_cTv).astype(np.float32)
    np.testing.assert_allclose(calib.proj, expect_proj, rtol=1e-6)

    # distractor keys must not have leaked into camera 00
    assert abs(calib.rect0_T_cam[0, 0] - R_RECT[0, 0]) < 1e-9
    # hand-checked projection of a known velodyne point
    pt = np.array([12.0, -3.0, 0.5, 1.0])
    uvw = expect_proj @ pt
    got = calib.proj @ pt.astype(np.float32)
    np.testing.assert_allclose(got, uvw, rtol=1e-5)


def test_odometry_calib_parsing(tmp_path):
    seq_dir = tmp_path / "sequences" / "04"
    seq_dir.mkdir(parents=True)
    Tr = np.hstack([CAM_R_VELO, CAM_T_VELO_T.reshape(3, 1)])
    with open(seq_dir / "calib.txt", "w") as f:
        f.write(f"P0: {_fmt(P_RECT)}\n")
        f.write(f"P1: {_fmt(P_RECT + 1.0)}\n")
        f.write(f"P2: {_fmt(P_RECT + 2.0)}\n")
        f.write(f"P3: {_fmt(P_RECT + 3.0)}\n")
        f.write(f"Tr: {_fmt(Tr)}\n")
    calib = kitti.load_calib_odometry(str(seq_dir))
    expect_cTv = np.eye(4)
    expect_cTv[:3, :] = Tr
    np.testing.assert_allclose(calib.cam_T_velo, expect_cTv, atol=1e-12)
    np.testing.assert_allclose(calib.P_rect0, P_RECT, atol=1e-12)     # P0, not P1-3
    np.testing.assert_allclose(calib.rect0_T_cam, np.eye(4), atol=1e-12)
    expect_proj = (P_RECT @ expect_cTv).astype(np.float32)
    np.testing.assert_allclose(calib.proj, expect_proj, rtol=1e-6)


# ---------------------------------------------------------------------------
# .bin / .png loaders
# ---------------------------------------------------------------------------

def test_bin_loader_stride(tmp_path):
    """Reflectance values are huge on purpose: any stride slip (xyz xyz ...
    instead of xyzr xyzr ...) would pull 1e9s into the coordinates."""
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    refl = np.full((1000,), 1.0e9, np.float32)
    path = str(tmp_path / "cloud.bin")
    write_bin(path, xyz, refl)
    out = kitti.load_bin(path)
    assert out.shape == (1000, 3)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, xyz)


def test_png_loader_odd_dims(tmp_path):
    """KITTI raw grays are 375/376 x 1241/1242 depending on the date; the
    loader must return the file's own shape (padding happens downstream)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (375, 1241))
    path = str(tmp_path / "img.png")
    write_png(path, img)
    out = kitti.load_image(path)
    assert out.shape == (375, 1241)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, np.clip(img, 0, 255).astype(np.uint8), atol=0)


def test_raw_sequence_iteration(tmp_path):
    rng = np.random.default_rng(2)
    clouds = [rng.uniform(-30, 30, (200 + 50 * i, 3)).astype(np.float32) for i in range(3)]
    images = [rng.uniform(0, 255, (120, 250)) for _ in range(3)]
    make_raw_drive(str(tmp_path), "2026_03_15", "0007", clouds, images)
    seq = kitti.RawSequence(str(tmp_path), "2026_03_15", "0007")
    assert len(seq) == 3
    for i, fr in enumerate(seq):
        assert fr.index == i
        np.testing.assert_array_equal(fr.cloud, clouds[i])
        assert fr.image.shape == (120, 250)


# ---------------------------------------------------------------------------
# native prefetcher parity (the run_kitti frames() seam, driver.py:469-494)
# ---------------------------------------------------------------------------

def test_native_prefetcher_matches_numpy_loaders(tmp_path):
    from vloam_tpu.config import ScanConfig
    from vloam_tpu.runtime import native
    from vloam_tpu.runtime.driver import pad_image

    if not native.available():
        pytest.skip("native library not built")

    scan = ScanConfig(ring_cap=256, max_points=16384, less_flat_cap=2048)
    rng = np.random.default_rng(3)
    scene = synthetic.default_scene()
    poses = synthetic.straight_trajectory(2, speed=1.0)
    clouds = [
        synthetic.simulate_scan(R, t, scene, n_azimuth=200, noise=0.01, seed=i)
        for i, (R, t) in enumerate(poses)
    ]
    images = [rng.uniform(0, 255, (120, 250)) for _ in range(2)]
    make_raw_drive(str(tmp_path), "2026_03_15", "0009", clouds, images)
    seq = kitti.RawSequence(str(tmp_path), "2026_03_15", "0009")

    H, W = 128, 256
    bins = [os.path.join(seq.velo_dir, f) for f in seq.files]
    pngs = [os.path.join(seq.img_dir, os.path.splitext(f)[0] + ".png") for f in seq.files]
    pf = native.NativePrefetcher(bins, pngs, scan.max_points, H, W, scan_cfg=scan)
    got = list(pf.iter_grids())
    pf.close()
    assert len(got) == 2

    class _Cfg:
        class visual:
            img_height, img_width = H, W

    for i, (grid_n, gmask_n, npr_n, img_n) in enumerate(got):
        grid_p, gmask_p, npr_p = grid_cloud(seq.frame(i).cloud, scan)
        np.testing.assert_array_equal(gmask_n, gmask_p)
        np.testing.assert_array_equal(npr_n, npr_p)
        np.testing.assert_allclose(grid_n[gmask_n], grid_p[gmask_p], atol=1e-5)
        img_p = pad_image(seq.frame(i).image, _Cfg)
        np.testing.assert_allclose(img_n, img_p, atol=0)


# ---------------------------------------------------------------------------
# end-to-end: run_kitti over the fixture, NumPy loader vs native prefetcher
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_run_kitti_numpy_vs_native(tmp_path, monkeypatch):
    from vloam_tpu.config import MappingConfig, ScanConfig, VisualConfig, kitti_hdl64
    from vloam_tpu.models import frame_graph as fg
    from vloam_tpu.runtime import native
    from vloam_tpu.runtime.driver import run_kitti

    H, W = 128, 256
    K = np.array([[150.0, 0.0, 128.0], [0.0, 150.0, 64.0], [0.0, 0.0, 1.0]])
    cfg = kitti_hdl64().replace(
        scan=ScanConfig(ring_cap=512, max_points=32768, less_flat_cap=8192),
        mapping=MappingConfig(
            grid_w=7, grid_h=7, grid_d=3,
            corner_cube_cap=1024, surf_cube_cap=2048,
            corner_stack_cap=2048, surf_stack_cap=4096,
        ),
        visual=VisualConfig(img_height=H, img_width=W),
    )

    # Fixture calib consistent with the synthetic camera convention
    # (cam looks along velo +x; CAM_R_VELO == synthetic.CAM_R_WORLD).
    p_rect = np.zeros((3, 4))
    p_rect[:, :3] = K
    scene = synthetic.default_scene()
    poses = synthetic.straight_trajectory(4, speed=0.8, yaw_rate=0.01)
    rng = np.random.default_rng(4)
    uv0 = np.stack([rng.uniform(20, W - 20, 500), rng.uniform(15, H - 15, 500)], -1)
    R_wc0 = poses[0][0] @ synthetic.CAM_R_WORLD.T
    pc0, hit = synthetic.raycast_camera(R_wc0, poses[0][1], scene, K, uv0)
    blob_world = (pc0[hit] @ R_wc0.T) + poses[0][1]

    clouds, images = [], []
    for i, (R, t) in enumerate(poses):
        clouds.append(synthetic.simulate_scan(R, t, scene, n_azimuth=500, noise=0.005, seed=i))
        R_wc = R @ synthetic.CAM_R_WORLD.T
        images.append(synthetic.render_blob_image((blob_world - t) @ R_wc, K, H - 8, W - 6))

    root = str(tmp_path / "kitti")
    date, seqno = "2026_03_15", "0011"
    date_dir = os.path.join(root, date)
    write_raw_calib(date_dir, cam_R_velo=synthetic.CAM_R_WORLD,
                    cam_t_velo=np.zeros(3), r_rect=np.eye(3), p_rect=p_rect)
    drive = os.path.join(date_dir, f"{date}_drive_{seqno}_sync")
    velo, imgd = os.path.join(drive, "velodyne_points", "data"), os.path.join(drive, "image_00", "data")
    os.makedirs(velo), os.makedirs(imgd)
    for i, (c, m) in enumerate(zip(clouds, images)):
        write_bin(os.path.join(velo, f"{i:010d}.bin"), c)
        write_png(os.path.join(imgd, f"{i:010d}.png"), m)

    def run(out, force_numpy):
        seq = kitti.RawSequence(root, date, seqno)
        if force_numpy:
            monkeypatch.setattr(native, "available", lambda: False)
        else:
            if not native.available():
                pytest.skip("native library not built")
        run_kitti(cfg, seq, out_dir=out, verbose=False)
        monkeypatch.undo()
        d = int(cfg.detach_vo_lo)
        return {k: np.loadtxt(os.path.join(out, f"{k}{d}.txt")) for k in ("VO", "LO", "MO")}

    traj_native = run(str(tmp_path / "out_native"), force_numpy=False)
    traj_numpy = run(str(tmp_path / "out_numpy"), force_numpy=True)

    for k in ("VO", "LO", "MO"):
        assert traj_numpy[k].shape == (4, 12), k
        np.testing.assert_allclose(traj_native[k], traj_numpy[k], atol=5e-3, err_msg=k)
    # the drive actually moved ~0.8 m/frame along cam z (= velo x)
    assert traj_numpy["MO"][-1, 11] > 1.5
