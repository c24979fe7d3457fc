"""Gather cost vs table size: 2M taps x 32 B rows from tables of
8 MB .. 3.4 GB (is the material-pair fetch big-table-bound, and how
steep is the curve? Informs a split-by-mip texture fetch).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/gather_tablesize.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform(), flush=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    N = 1920 * 1080
    REPS = 5
    for mb in (8, 64, 256, 1024, 3400):
        rows = mb * 1024 * 1024 // 32
        tbl = jnp.ones((rows, 8), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, rows)

        def runner(kk):
            def f(i):
                acc = jnp.zeros((), jnp.float32)
                for r in range(kk):
                    ir = (i + r) % rows
                    acc = acc + tbl[ir].sum(-1).reshape(-1)[0]
                return acc

            g = jax.jit(f)
            _ = np.asarray(g(idx))
            t0 = time.time()
            for _ in range(REPS):
                _ = np.asarray(g(idx))
            return (time.time() - t0) / REPS

        t1, t4 = runner(1), runner(4)
        print(f"table {mb:5d} MB: {(t4-t1)/3*1e3:7.2f} ms/rep "
              f"(k1 {t1*1e3:.1f} k4 {t4*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
