"""Minimal staged check of the phase-A lattice-replay kernel on CPU.

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python experiments/quick_a_check.py
"""
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    t0 = time.time()
    from tests.test_ssr_march import _scene, _rays
    from vkr_tpu.passes import ssr as S
    from vkr_tpu.passes.ssr_march import hierarchical_march_pallas

    hiz, params = _scene()
    pyr, o, d, cam, w0 = _rays(hiz, params)
    print(f"scene ready {time.time()-t0:.1f}s", flush=True)

    MAX_IT = 48
    t0 = time.time()
    pos_ref, hor_ref, it_ref = S._hierarchical_march(
        pyr, o, d, cam, w0, params, MAX_IT, compact_frac=0.0)
    pos_ref, it_ref, hor_ref = map(np.asarray, (pos_ref, it_ref, hor_ref))
    print(f"oracle {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    pos_k, hor_k, it_k = hierarchical_march_pallas(
        list(hiz.mips), o, d, cam, w0, params, MAX_IT,
        compact_frac=1.0, interpret=True)
    pos_k, it_k, hor_k = map(np.asarray, (pos_k, it_k, hor_k))
    print(f"pallas(interp) {time.time()-t0:.1f}s", flush=True)

    valid_ref = it_ref <= MAX_IT
    valid_k = it_k <= MAX_IT
    agree = (valid_ref == valid_k).mean()
    print(f"validity ref={valid_ref.mean():.4f} k={valid_k.mean():.4f} "
          f"agree={agree:.4f}", flush=True)
    both = valid_ref & valid_k
    if both.any():
        dp = np.abs(pos_k - pos_ref)[both]
        print("pos err p50/95/99:",
              np.percentile(dp[..., :2].max(-1), [50, 95, 99]))
    print("hor err p90/99:",
          np.percentile(np.abs(hor_k - hor_ref), [90, 99]))


if __name__ == "__main__":
    main()
