"""Plain-NumPy transliteration of the reference's SEQUENTIAL semantics.

The production engine (ops/scan_registration.py, models/lidar_odometry.py)
re-formulates the reference's sequential sort-and-pick / kd-tree-walk
algorithms as fixed-shape array programs.  Two approximations in that
re-formulation were previously only asserted harmless:

  (a) the greedy per-sector selection with candidate pre-reduction and no
      cross-sector suppression, vs the reference's full sequential loop
      (/root/reference/src/lidar_odometry_mapping/src/scan_registration.cpp:352-504);
  (b) resolving the ring-constrained second/third association picks from a
      top-k NN list, vs the reference's kd-tree NN + directional index scans
      (/root/reference/src/lidar_odometry_mapping/src/laser_odometry.cpp:282-459).

This module is the measurement instrument: an exact, loops-and-all NumPy
transliteration of those passes (plus the ring assignment / azimuth
relative-time / curvature pre-passes and the PCL VoxelGrid reduction they
feed).  tests/test_oracle_parity.py runs both implementations on synthetic
HDL-64 frames and pins the agreement numbers (feature-set Jaccard, ring-pick
recall, LO pose-delta gap) as committed test assertions.

Everything here is deliberately UNvectorized where the reference is
sequential — order-dependent suppression and directional scans are the very
semantics under test.  Do not optimize; do not use from the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class OracleFeatures(NamedTuple):
    cloud: np.ndarray       # (M, 4) xyz + intensity (= scanID + period*relTime)
    scan_start: np.ndarray  # (R,) first selectable index per ring (incl. +5)
    scan_end: np.ndarray    # (R,) last+1 selectable bound per ring (incl. -6)
    curvature: np.ndarray   # (M,)
    label: np.ndarray       # (M,) 2 sharp / 1 less-sharp / -1 flat / 0 none
    sharp: np.ndarray       # (n, 4) in pick order
    less_sharp: np.ndarray
    flat: np.ndarray
    less_flat: np.ndarray   # voxel-downsampled remainder
    sharp_ind: np.ndarray   # indices into cloud
    flat_ind: np.ndarray


def ring_id(angle_deg: float, n_scans: int) -> int:
    """scan_registration.cpp:222-254 (C truncation via int())."""
    if n_scans == 16:
        sid = int((angle_deg + 15.0) / 2.0 + 0.5)
        return sid if 0 <= sid <= n_scans - 1 else -1
    if n_scans == 32:
        sid = int((angle_deg + 92.0 / 3.0) * 3.0 / 4.0)
        return sid if 0 <= sid <= n_scans - 1 else -1
    if n_scans == 64:
        if angle_deg >= -8.83:
            sid = int((2.0 - angle_deg) * 3.0 + 0.5)
        else:
            sid = n_scans // 2 + int((-8.83 - angle_deg) * 2.0 + 0.5)
        if angle_deg > 2.0 or angle_deg < -24.33 or sid > 50 or sid < 0:
            return -1
        return sid
    raise ValueError(n_scans)


def oracle_scan_registration(
    points: np.ndarray,
    n_scans: int = 64,
    minimum_range: float = 5.0,
    scan_period: float = 0.1,
    edge_threshold: float = 0.1,
    less_flat_voxel: float = 0.2,
) -> OracleFeatures:
    """ScanRegistration::input (scan_registration.cpp:144-513), exactly."""
    pts = np.asarray(points, np.float64)
    # NaN + min-range filter, order-preserving (:174-176, removeClosedPointCloud)
    keep = np.isfinite(pts).all(axis=1)
    keep &= np.sum(pts * pts, axis=1) >= minimum_range * minimum_range
    pts = pts[keep]
    n = len(pts)
    if n == 0:
        z4 = np.zeros((0, 4))
        zi = np.zeros(0, np.int64)
        return OracleFeatures(z4, zi, zi, np.zeros(0), zi, z4, z4, z4, z4, zi, zi)

    # azimuth sweep bounds (:185-197)
    start_ori = -np.arctan2(pts[0, 1], pts[0, 0])
    end_ori = -np.arctan2(pts[-1, 1], pts[-1, 0]) + 2 * np.pi
    if end_ori - start_ori > 3 * np.pi:
        end_ori -= 2 * np.pi
    elif end_ori - start_ori < np.pi:
        end_ori += 2 * np.pi

    # ring assignment + relative time, sequential halfPassed unwrap (:205-298)
    scans: list[list[np.ndarray]] = [[] for _ in range(n_scans)]
    half_passed = False
    for i in range(n):
        x, y, z = pts[i]
        angle = np.degrees(np.arctan(z / np.sqrt(x * x + y * y)))
        sid = ring_id(angle, n_scans)
        if sid < 0:
            continue
        ori = -np.arctan2(y, x)
        if not half_passed:
            if ori < start_ori - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start_ori + np.pi * 3 / 2:
                ori -= 2 * np.pi
            if ori - start_ori > np.pi:
                half_passed = True
        else:
            ori += 2 * np.pi
            if ori < end_ori - np.pi * 3 / 2:
                ori += 2 * np.pi
            elif ori > end_ori + np.pi / 2:
                ori -= 2 * np.pi
        rel = (ori - start_ori) / (end_ori - start_ori)
        scans[sid].append(np.array([x, y, z, sid + scan_period * rel]))

    # ring concatenation with the +5/-6 margins (:308-315)
    cloud_rows: list[np.ndarray] = []
    scan_start = np.zeros(n_scans, np.int64)
    scan_end = np.zeros(n_scans, np.int64)
    for r in range(n_scans):
        scan_start[r] = len(cloud_rows) + 5
        cloud_rows.extend(scans[r])
        scan_end[r] = len(cloud_rows) - 6
    cloud = np.array(cloud_rows) if cloud_rows else np.zeros((0, 4))
    m = len(cloud)

    # 11-point curvature (:323-346)
    curv = np.zeros(m)
    for i in range(5, m - 5):
        d = np.sum(cloud[i - 5 : i + 6, :3], axis=0) - 11.0 * cloud[i, :3]
        curv[i] = float(d @ d)

    picked = np.zeros(m, np.int64)
    label = np.zeros(m, np.int64)
    sharp, less_sharp, flat = [], [], []
    sharp_ind, flat_ind = [], []
    less_flat_all = []

    def suppress(ind: int) -> None:
        """±5 neighbour suppression with the gap^2 > 0.05 break (:406-429)."""
        for l in range(1, 6):
            d = cloud[ind + l, :3] - cloud[ind + l - 1, :3]
            if d @ d > 0.05:
                break
            picked[ind + l] = 1
        for l in range(-1, -6, -1):
            d = cloud[ind + l, :3] - cloud[ind + l + 1, :3]
            if d @ d > 0.05:
                break
            picked[ind + l] = 1

    # per ring x 6 sectors: sort by curvature, greedy pick (:352-504)
    for r in range(n_scans):
        if scan_end[r] - scan_start[r] < 6:
            continue
        ring_less_flat = []
        for j in range(6):
            sp = scan_start[r] + (scan_end[r] - scan_start[r]) * j // 6
            ep = scan_start[r] + (scan_end[r] - scan_start[r]) * (j + 1) // 6 - 1
            order = sorted(range(sp, ep + 1), key=lambda i: curv[i])

            # edges: descending curvature (:369-431)
            largest = 0
            for k in range(len(order) - 1, -1, -1):
                ind = order[k]
                if picked[ind] == 0 and curv[ind] > edge_threshold:
                    largest += 1
                    if largest <= 2:
                        label[ind] = 2
                        sharp.append(cloud[ind])
                        less_sharp.append(cloud[ind])
                        sharp_ind.append(ind)
                    elif largest <= 20:
                        label[ind] = 1
                        less_sharp.append(cloud[ind])
                    else:
                        break
                    picked[ind] = 1
                    suppress(ind)

            # planes: ascending curvature (:435-483)
            smallest = 0
            for k in range(len(order)):
                ind = order[k]
                if picked[ind] == 0 and curv[ind] < edge_threshold:
                    label[ind] = -1
                    flat.append(cloud[ind])
                    flat_ind.append(ind)
                    smallest += 1
                    if smallest >= 4:
                        break
                    picked[ind] = 1
                    suppress(ind)

            # everything not edge-labelled joins less-flat (:486-493)
            for k in range(sp, ep + 1):
                if label[k] <= 0:
                    ring_less_flat.append(cloud[k])

        less_flat_all.append(pcl_voxel_grid(np.array(ring_less_flat), less_flat_voxel))

    return OracleFeatures(
        cloud,
        scan_start,
        scan_end,
        curv,
        label,
        np.array(sharp) if sharp else np.zeros((0, 4)),
        np.array(less_sharp) if less_sharp else np.zeros((0, 4)),
        np.array(flat) if flat else np.zeros((0, 4)),
        np.concatenate(less_flat_all) if less_flat_all else np.zeros((0, 4)),
        np.array(sharp_ind, np.int64),
        np.array(flat_ind, np.int64),
    )


def pcl_voxel_grid(pts: np.ndarray, leaf: float) -> np.ndarray:
    """pcl::VoxelGrid::filter semantics (the :496-503 call): per-voxel
    centroid, output ordered by ascending linear voxel index."""
    if len(pts) == 0:
        return np.zeros((0, 4))
    inv = 1.0 / leaf
    mn = np.floor(pts[:, :3].min(axis=0) * inv)
    mx = np.floor(pts[:, :3].max(axis=0) * inv)
    div = (mx - mn + 1).astype(np.int64)
    ijk = np.floor(pts[:, :3] * inv).astype(np.int64) - mn.astype(np.int64)
    lin = ijk[:, 0] + ijk[:, 1] * div[0] + ijk[:, 2] * div[0] * div[1]
    order = np.argsort(lin, kind="stable")
    out = []
    i = 0
    while i < len(order):
        j = i
        acc = np.zeros(4)
        while j < len(order) and lin[order[j]] == lin[order[i]]:
            acc += pts[order[j]]
            j += 1
        out.append(acc / (j - i))
        i = j
    return np.array(out)


# ---------------------------------------------------------------------------
# LO association: kd-tree NN + directional ring-window index scans
# ---------------------------------------------------------------------------


def oracle_edge_association(
    query: np.ndarray,        # (Q, 4) sharp points (xyz + intensity)
    last_corner: np.ndarray,  # (N, 4) previous less-sharp cloud, ring-ordered
    pose_q: np.ndarray,       # (4,) xyzw — current q_last_curr estimate
    pose_t: np.ndarray,       # (3,)
    distance_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> list[tuple[int, int, int]]:
    """laser_odometry.cpp:282-383 exactly (s = 1): per sharp point, global NN
    (kd-tree == brute argmin) then the two directional scans for the nearest
    HIGHER-ring and LOWER-ring candidate within NEARBY_SCAN.  Returns
    (query_i, closest_ind, min_ind2) for every query with a full pair."""
    out = []
    n = len(last_corner)
    if n == 0:
        return out
    rings = last_corner[:, 3].astype(np.int64)  # int(intensity)
    R = _quat_mat(pose_q)
    for qi in range(len(query)):
        p_sel = R @ query[qi, :3] + pose_t
        d2 = np.sum((last_corner[:, :3] - p_sel) ** 2, axis=1)
        closest = int(np.argmin(d2))
        if d2[closest] >= distance_sq_threshold:
            continue
        closest_ring = rings[closest]
        min_d2_2, min_ind2 = distance_sq_threshold, -1
        # increasing scan line (:309-331)
        for j in range(closest + 1, n):
            if rings[j] <= closest_ring:
                continue
            if rings[j] > closest_ring + nearby_scan:
                break
            if d2[j] < min_d2_2:
                min_d2_2, min_ind2 = d2[j], j
        # decreasing scan line (:334-355)
        for j in range(closest - 1, -1, -1):
            if rings[j] >= closest_ring:
                continue
            if rings[j] < closest_ring - nearby_scan:
                break
            if d2[j] < min_d2_2:
                min_d2_2, min_ind2 = d2[j], j
        if min_ind2 >= 0:
            out.append((qi, closest, min_ind2))
    return out


def oracle_plane_association(
    query: np.ndarray,      # (Q, 4) flat points
    last_surf: np.ndarray,  # (N, 4) previous less-flat cloud, ring-ordered
    pose_q: np.ndarray,
    pose_t: np.ndarray,
    distance_sq_threshold: float = 25.0,
    nearby_scan: float = 2.5,
) -> list[tuple[int, int, int, int]]:
    """laser_odometry.cpp:387-484 exactly: NN j, nearest same-or-lower /
    same-or-higher split across the two scan directions.  Returns
    (query_i, j, l, m) for every query with a full triple."""
    out = []
    n = len(last_surf)
    if n == 0:
        return out
    rings = last_surf[:, 3].astype(np.int64)
    R = _quat_mat(pose_q)
    for qi in range(len(query)):
        p_sel = R @ query[qi, :3] + pose_t
        d2 = np.sum((last_surf[:, :3] - p_sel) ** 2, axis=1)
        closest = int(np.argmin(d2))
        if d2[closest] >= distance_sq_threshold:
            continue
        ring_j = rings[closest]
        min2, ind2 = distance_sq_threshold, -1
        min3, ind3 = distance_sq_threshold, -1
        # increasing direction (:407-430): same-or-lower ring -> slot 2,
        # higher ring -> slot 3
        for j in range(closest + 1, n):
            if rings[j] > ring_j + nearby_scan:
                break
            if rings[j] <= ring_j and d2[j] < min2:
                min2, ind2 = d2[j], j
            elif rings[j] > ring_j and d2[j] < min3:
                min3, ind3 = d2[j], j
        # decreasing direction (:433-456): same-or-higher -> slot 2,
        # lower -> slot 3
        for j in range(closest - 1, -1, -1):
            if rings[j] < ring_j - nearby_scan:
                break
            if rings[j] >= ring_j and d2[j] < min2:
                min2, ind2 = d2[j], j
            elif rings[j] < ring_j and d2[j] < min3:
                min3, ind3 = d2[j], j
        if ind2 >= 0 and ind3 >= 0:
            out.append((qi, closest, ind2, ind3))
    return out


def _quat_mat(q: np.ndarray) -> np.ndarray:
    x, y, z, w = np.asarray(q, np.float64)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
