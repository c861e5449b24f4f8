"""ctypes bindings for the native host runtime (native/libvloam_host.so).

Falls back to the pure-NumPy loaders in vloam_tpu.data.kitti when the shared
library hasn't been built (native/build.sh).  The prefetcher overlaps disk
IO + decode with device compute — the role rosbag replay + message_filters
played in the reference (vloam_main_node.cpp:226-232, :45-47).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libvloam_host.so")
_lib = None


def _try_build() -> bool:
    """Build libvloam_host.so in place on first use (g++ + libpng, ~5 s).

    Concurrency-safe: compiles to a per-PID temp name, then os.replace.
    Set VLOAM_NO_NATIVE_BUILD=1 to force the NumPy fallback loaders.
    """
    if os.environ.get("VLOAM_NO_NATIVE_BUILD"):
        return False
    import subprocess

    src_dir = os.path.dirname(os.path.abspath(_LIB_PATH))
    src = os.path.join(src_dir, "vloam_host.cpp")
    if not os.path.exists(src):
        return False
    tmp = os.path.join(src_dir, f".libvloam_host.{os.getpid()}.so")
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-o", tmp, src,
             "-lpng", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vh_load_bin.restype = ctypes.c_int
    lib.vh_load_bin.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.vh_load_png_gray.restype = ctypes.c_int
    lib.vh_load_png_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.vh_prefetcher_create.restype = ctypes.c_void_p
    lib.vh_prefetcher_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    lib.vh_prefetcher_next.restype = ctypes.c_int
    lib.vh_prefetcher_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.vh_prefetcher_next_grid.restype = ctypes.c_int
    lib.vh_prefetcher_next_grid.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
    ]
    lib.vh_grid_cloud.restype = ctypes.c_int
    lib.vh_grid_cloud.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vh_lf_voxel_table.restype = ctypes.c_int
    lib.vh_lf_voxel_table.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
    ]
    lib.vh_depth_buckets.restype = ctypes.c_int
    lib.vh_depth_buckets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.vh_prefetcher_len.restype = ctypes.c_int
    lib.vh_prefetcher_len.argtypes = [ctypes.c_void_p]
    lib.vh_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_bin(path: str, max_points: int) -> tuple[np.ndarray, int]:
    lib = _load()
    out = np.zeros((max_points, 3), np.float32)
    n = lib.vh_load_bin(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_points
    )
    if n < 0:
        raise IOError(f"vh_load_bin failed for {path}")
    return out, n


def grid_cloud_native(pts: np.ndarray, cfg) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """C++ twin of data/gridding.grid_cloud (same semantics, same outputs)."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    R, C = cfg.n_scans, cfg.ring_cap
    grid = np.zeros((R, C, 4), np.float32)
    mask = np.zeros((R, C), np.uint8)
    npr = np.zeros((R,), np.int32)
    rc = lib.vh_grid_cloud(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], pts.shape[1], R, C,
        cfg.minimum_range, cfg.scan_period,
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        npr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc < 0:
        raise ValueError(f"vh_grid_cloud failed rc={rc}")
    return grid, mask.astype(bool), npr


def depth_buckets_native(
    pts: np.ndarray, mask: np.ndarray | None, proj: np.ndarray, vc
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """C++ twin of data/gridding.depth_buckets (same outputs)."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    proj = np.ascontiguousarray(proj, np.float32)
    g = vc.downsample_grid
    bw = -(-vc.img_width // g)
    bh = -(-vc.img_height // g)
    u = np.zeros((bw, bh), np.float32)
    v = np.zeros((bw, bh), np.float32)
    z = np.zeros((bw, bh), np.float32)
    c = np.zeros((bw, bh), np.float32)
    m = None
    if mask is not None:
        mask8 = np.ascontiguousarray(mask, np.uint8)  # keep a ref past the call
        m = mask8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    rc = lib.vh_depth_buckets(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
        pts.shape[0], pts.shape[1],
        proj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g, bw, bh, vc.min_projection_depth,
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise ValueError(f"vh_depth_buckets failed rc={rc}")
    return u, v, z, c


def lf_voxel_table_native(
    grid: np.ndarray, gmask: np.ndarray, cfg, max_grid: int = 1024
) -> tuple[np.ndarray, np.ndarray, int]:
    """C++ twin of data/gridding.less_flat_voxel_table (same outputs)."""
    lib = _load()
    R, C = gmask.shape
    flat = np.ascontiguousarray(grid.reshape(-1, 4), np.float32)
    m8 = np.ascontiguousarray(gmask.reshape(-1), np.uint8)
    slot = np.zeros((R * C,), np.int32)
    base = np.zeros((cfg.less_flat_cap, 5), np.float32)
    n_runs = lib.vh_lf_voxel_table(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        R, C, cfg.less_flat_voxel, cfg.less_flat_cap, max_grid,
        slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n_runs < 0:
        raise ValueError(f"vh_lf_voxel_table failed rc={n_runs}")
    return slot.reshape(R, C), base, n_runs


def load_png_gray(path: str, height: int, width: int) -> np.ndarray:
    lib = _load()
    out = np.zeros((height, width), np.float32)
    rc = lib.vh_load_png_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), height, width
    )
    if rc != 0:
        raise IOError(f"vh_load_png_gray failed ({rc}) for {path}")
    return out


class NativePrefetcher:
    """Ordered async frame stream: yields (cloud (max_points,3), n_points, image|None)."""

    def __init__(
        self,
        bin_paths: list[str],
        img_paths: list[str] | None,
        max_points: int,
        height: int = 0,
        width: int = 0,
        depth: int = 3,
        n_threads: int = 2,
        scan_cfg=None,        # ScanConfig: enables worker-thread ring gridding
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (run native/build.sh)")
        self._lib = lib
        self.max_points = max_points
        self.height, self.width = height, width
        self.with_images = img_paths is not None
        self.scan_cfg = scan_cfg
        imgs = "\n".join(img_paths) if img_paths is not None else ""
        self._h = lib.vh_prefetcher_create(
            "\n".join(bin_paths).encode(), imgs.encode(),
            max_points, height, width, depth, n_threads,
            scan_cfg.n_scans if scan_cfg else 0,
            scan_cfg.ring_cap if scan_cfg else 0,
            scan_cfg.minimum_range if scan_cfg else 0.0,
            scan_cfg.scan_period if scan_cfg else 0.1,
        )
        self._len = lib.vh_prefetcher_len(self._h)

    def __len__(self):
        return self._len

    def __iter__(self):
        cloud = np.zeros((self.max_points, 3), np.float32)
        img = (
            np.zeros((self.height, self.width), np.float32) if self.with_images else None
        )
        for _ in range(self._len):
            rc = self._lib.vh_prefetcher_next(
                self._h,
                cloud.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if img is not None else None,
            )
            if rc < 0:
                raise IOError(f"prefetcher frame failed rc={rc}")
            yield cloud.copy(), rc, (img.copy() if img is not None else None)

    def iter_grids(self):
        """Grid-mode stream: yields (grid (R,C,4), gmask (R,C), n_per_ring, image|None).
        The ring gridding ran in the worker threads, overlapped with compute."""
        assert self.scan_cfg is not None, "create the prefetcher with scan_cfg"
        R, C = self.scan_cfg.n_scans, self.scan_cfg.ring_cap
        grid = np.zeros((R, C, 4), np.float32)
        mask = np.zeros((R, C), np.uint8)
        npr = np.zeros((R,), np.int32)
        img = (
            np.zeros((self.height, self.width), np.float32) if self.with_images else None
        )
        for _ in range(self._len):
            rc = self._lib.vh_prefetcher_next_grid(
                self._h,
                grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                npr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if img is not None else None,
            )
            if rc < 0:
                raise IOError(f"prefetcher frame failed rc={rc}")
            yield grid.copy(), mask.astype(bool), npr.copy(), (img.copy() if img is not None else None)

    def close(self):
        if self._h:
            self._lib.vh_prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
