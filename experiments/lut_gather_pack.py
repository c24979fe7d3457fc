"""Micro-benchmark: 2M-tap gather from a 1024^2 quad LUT —
32 B f32 rows vs 16 B f32 rows with two f16 halves bit-packed per word
(gather stays f32-typed; unpack is a few VPU ops).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/lut_gather_pack.py
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

    H, W = 1080, 1920
    S = 1024
    k = jax.random.PRNGKey(0)
    lut = jax.random.uniform(k, (S, S, 8), jnp.float32)  # quad rows 8 f32
    yi = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, S)
    xi = jax.random.randint(jax.random.PRNGKey(2), (H, W), 0, S)

    # packed: 8 f16 halves in 4 f32 words
    lut16 = lut.astype(jnp.float16)
    u16 = jax.lax.bitcast_convert_type(lut16, jnp.uint16).astype(
        jnp.uint32)
    packed_u32 = u16[..., 0::2] | (u16[..., 1::2] << 16)  # (S,S,4)
    packed = jax.lax.bitcast_convert_type(packed_u32, jnp.float32)

    REPS = 5

    def diff(name, fn):
        def runner(kk):
            def f(y):
                acc = jnp.zeros((), jnp.float32)
                for r in range(kk):
                    yr = jnp.clip(y + r, 0, S - 1)
                    acc = acc + fn(yr).reshape(-1)[0]
                return acc

            g = jax.jit(f)
            _ = np.asarray(g(yi))
            t0 = time.time()
            for _ in range(REPS):
                _ = np.asarray(g(yi))
            return (time.time() - t0) / REPS

        t1, t4 = runner(1), runner(4)
        print(f"{name:18s} {(t4-t1)/3*1e3:7.2f} ms/rep "
              f"(k1 {t1*1e3:.1f} k4 {t4*1e3:.1f})", flush=True)

    diff("f32 32B rows", lambda y: lut[y, xi].sum(-1))

    def packed_fetch(y):
        rows = packed[y, xi]  # (H, W, 4) f32 gather
        ru = jax.lax.bitcast_convert_type(rows, jnp.uint32)
        lo = jax.lax.bitcast_convert_type(
            (ru & 0xFFFF).astype(jnp.uint16), jnp.float16)
        hi = jax.lax.bitcast_convert_type(
            (ru >> 16).astype(jnp.uint16), jnp.float16)
        return (lo.astype(jnp.float32) + hi.astype(jnp.float32)).sum(-1)

    diff("packed 16B rows", packed_fetch)


if __name__ == "__main__":
    main()
