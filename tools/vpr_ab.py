"""Interleaved A/B: verify-slab size (verify_per_read) effect on the full
map program. vpr=2 provisions 2*B*2 verify lanes while true demand is
~1.6 candidates/read (~13k per 8192-read batch, sigma ~180) — vpr=1
halves the Pallas verify kernel's slab with ~18-sigma headroom.

Usage: python tools/vpr_ab.py [--iters 12] [--batch 8192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/fem_tpu_xla")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--e", type=int, default=5)
    args = ap.parse_args()

    from tools.profile_stages import build_workload

    from fem_tpu.config import FemArgs
    from fem_tpu.ops.types import FilterParams, device_index_from_host
    from fem_tpu.pipeline.engine import map_core, pack_outputs

    ref, index, codes_np, lengths_np = build_workload(args.batch, args.e)
    dindex = device_index_from_host(index, ref)
    fa = FemArgs(error_threshold=args.e, num_additional_qgrams=1)
    params = FilterParams.from_args(
        fa, codes_np.shape[1], cap_occ=80, cap_cand=16, cap_vote=32
    )
    B = codes_np.shape[0]
    use_pallas = jax.devices()[0].platform == "tpu"

    def full(vpr, apr):
        vc = int(2 * B * vpr)
        ac = max(int(2 * B * apr), 64)

        @jax.jit
        def body(di, c, l):
            out = map_core(di, c, l, params, vc, use_pallas, ac)
            return jnp.sum(pack_outputs(out).astype(jnp.uint32))

        return body

    variants = {
        "vpr2_apr.85": full(2, 0.85),
        "vpr1_apr.85": full(1, 0.85),
        "vpr1.5_apr.85": full(1.5, 0.85),
    }

    KBUF = args.iters * len(variants) + len(variants)
    codes_v = [jnp.asarray(np.roll(codes_np, k + 1, axis=0)) for k in range(KBUF)]
    lengths = jnp.asarray(lengths_np.astype(np.int32))

    bi = 0
    for name, fn in variants.items():
        t0 = time.time()
        np.asarray(fn(dindex, codes_v[bi], lengths)); bi += 1
        print(f"[ab] compiled {name} in {time.time()-t0:.1f}s", file=sys.stderr)

    times = {name: [] for name in variants}
    for it in range(args.iters):
        for name, fn in variants.items():
            t0 = time.time()
            np.asarray(fn(dindex, codes_v[bi], lengths)); bi += 1
            times[name].append((time.time() - t0) * 1e3)

    print(f"\nB={args.batch} e={args.e} iters={args.iters} (ms/call)")
    for name in variants:
        t = np.array(times[name])
        print(f"  {name:14s} mean={t.mean():7.2f}  med={np.median(t):7.2f}  "
              f"min={t.min():7.2f}")


if __name__ == "__main__":
    main()
