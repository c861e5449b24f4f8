"""XLA brute knn vs fused pallas lane-min knn on the current accelerator."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from vloam_tpu.ops.knn import knn
from vloam_tpu.ops.pallas_knn import knn_lanemin

rng = np.random.default_rng(0)


def timeit(name, fn, n_=50):
    r = fn(); np.asarray(jax.tree.leaves(r)[0][:1])
    t0 = time.perf_counter()
    for _ in range(n_):
        r = fn()
    np.asarray(jax.tree.leaves(r)[0][:1])
    print(f"{name:34s} {(time.perf_counter()-t0)/n_*1000:8.3f} ms")


for m, n in [(4096, 16384), (8192, 49152), (4096, 32768), (8192, 65536)]:
    q = jnp.array(rng.uniform(-60, 60, (m, 3)).astype(np.float32))
    c = jnp.array(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    mask = jnp.array(rng.random(n) < 0.8)
    knn_j = jax.jit(lambda a, b, d: knn(a, b, d, 5))
    lane_j = jax.jit(lambda a, b, d: knn_lanemin(a, b, d, 5))
    timeit(f"xla knn    {m}x{n}", lambda: knn_j(q, c, mask))
    timeit(f"pallas knn {m}x{n}", lambda: lane_j(q, c, mask))

    # agreement spot-check (both approximate)
    d2a, ia = jax.jit(lambda a, b, d: knn(a, b, d, 5, exact=True))(q, c, mask)
    d2b, ib = lane_j(q, c, mask)
    rec = np.mean([len(set(np.asarray(ia)[i]) & set(np.asarray(ib)[i])) / 5
                   for i in range(0, m, 37)])
    print(f"   recall vs exact: {rec:.3f}   d2 max_abs_err "
          f"{np.max(np.abs(np.asarray(d2a)[:, 0] - np.asarray(d2b)[:, 0])):.2e}")
