"""Original-LOAM unreliable-point exclusion (ScanConfig.exclude_unreliable).

The A-LOAM-derived reference picks features with no occlusion/parallel-beam
pre-pass; the flag restores original LOAM's cloudNeighborPicked marking.
Unit level: synthetic rings with a known occlusion silhouette and a known
grazing stretch.  System level: on the degenerate corridor (whose edge
picks are dominated by exactly these artifacts) the exclusion must strip
most of the sharp features.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import scenarios as sc
from vloam_tpu.data import synthetic
from vloam_tpu.ops.scan_registration import extract_features, unreliable_mask


def test_occlusion_silhouette_marked():
    # one ring: a near wall (5 m) in front of a far wall (20 m) — the
    # jump between them is an occlusion edge; the FAR side's 6 points
    # flanking the edge must be marked, interior points must not.
    # (azimuth step ~0.004 rad, sensor-realistic: the parallel-beam gap
    # criterion must NOT fire on the walls themselves)
    C = 256
    az = np.linspace(-0.5, 0.5, C)
    r = np.where(np.abs(az) < 0.15, 5.0, 20.0)
    pts = np.stack([r * np.cos(az), r * np.sin(az), np.zeros(C)], -1)
    grid = np.zeros((1, C, 4), np.float32)
    grid[0, :, :3] = pts
    gmask = np.ones((1, C), bool)
    cfg = kitti_hdl64().scan
    un = np.asarray(unreliable_mask(jnp.array(grid), jnp.array(gmask), cfg))[0]
    edges = np.where(np.abs(np.diff(r)) > 1.0)[0]       # jump indices
    for e in edges:
        far = e if r[e] > r[e + 1] else e + 1           # far side of the jump
        sgn = -1 if far == e else 1
        marked = [far + sgn * l for l in range(6)]
        assert un[marked].all(), (e, un[max(0, e - 6):e + 7])
    # interior of the near wall: clean
    mid = np.argmin(np.abs(az))
    assert not un[mid - 2:mid + 3].any()


def test_grazing_stretch_marked():
    # ring on flat ground far away: consecutive azimuth samples are metres
    # apart (gap^2 > 0.0002 r^2) -> parallel-beam marking
    C = 48
    az = np.linspace(-0.1, 0.1, C)
    # grazing: depth grows quickly along the ring
    r = 60.0 + 120.0 * np.abs(az)
    pts = np.stack([r * np.cos(az), r * np.sin(az), np.full(C, -1.7)], -1)
    grid = np.zeros((1, C, 4), np.float32)
    grid[0, :, :3] = pts
    gmask = np.ones((1, C), bool)
    cfg = kitti_hdl64().scan
    un = np.asarray(unreliable_mask(jnp.array(grid), jnp.array(gmask), cfg))[0]
    gaps = np.sum(np.diff(pts, axis=0) ** 2, axis=-1)
    both_big = (gaps[:-1] > 0.0002 * r[1:-1] ** 2) & (gaps[1:] > 0.0002 * r[1:-1] ** 2)
    assert un[1:-1][both_big].all()


def test_corridor_sharp_features_are_artifacts():
    """On the corridor, the flag must kill the SENSOR-RELATIVE picks (far
    grazing-ground arcs, range-cutoff boundaries — r ≳ 25 m there) and keep
    the world-fixed wall-ground junction picks (r ≲ 15 m, |y| ≈ 7), while a
    structured scene keeps most of its picks."""
    cfg = kitti_hdl64()
    walls = sc.corridor_scene(120.0)
    pts = synthetic.simulate_scan(np.eye(3), np.zeros(3), walls,
                                  n_azimuth=900, noise=0.005, seed=0)
    p, m = synthetic.pad_cloud(pts, cfg.scan.max_points)

    def sharp(flag):
        c = cfg.replace(scan=__import__("dataclasses").replace(
            cfg.scan, exclude_unreliable=flag))
        f = extract_features(jnp.array(p), jnp.array(m), c.scan)
        return np.asarray(f.sharp)[np.asarray(f.sharp_mask)]

    s_off, s_on = sharp(False), sharp(True)
    far_off = np.mean(np.linalg.norm(s_off[:, :3], axis=1) > 25.0)
    far_on = np.mean(np.linalg.norm(s_on[:, :3], axis=1) > 25.0)
    print(f"\ncorridor sharp: {len(s_off)} -> {len(s_on)}; "
          f"far-artifact fraction {far_off:.2f} -> {far_on:.2f}")
    assert far_off > 0.25, far_off        # the artifacts dominate unfiltered
    assert far_on < 0.05, far_on          # ...and the flag removes them
    # the world-fixed junction features survive
    assert len(s_on) > 100 and np.median(np.abs(s_on[:, 1])) > 6.5

    boxes = synthetic.default_scene()
    pts2 = synthetic.simulate_scan(np.eye(3), np.zeros(3), boxes,
                                   n_azimuth=900, noise=0.005, seed=0)
    p2, m2 = synthetic.pad_cloud(pts2, cfg.scan.max_points)

    def n_sharp2(flag):
        c = cfg.replace(scan=__import__("dataclasses").replace(
            cfg.scan, exclude_unreliable=flag))
        f = extract_features(jnp.array(p2), jnp.array(m2), c.scan)
        return int(np.asarray(f.sharp_mask).sum())

    s_off, s_on = n_sharp2(False), n_sharp2(True)
    print(f"street sharp picks: {s_off} -> {s_on}")
    # real structure survives: the street keeps a solid majority of picks
    assert s_on > 0.45 * s_off, (s_off, s_on)
