"""Measure the tunneled runtime's fetch cost vs payload size.

One process, one window: programs producing (rows, 128) u32 outputs of
several sizes are fetched round-robin with distinct input buffers per
call (value-cache discipline, docs/ROADMAP.md). The slope prices the
pack_outputs payload (bench single point: ~100k u32 words/batch at
B=16384, apr=1).

Usage: python tools/fetch_cost.py [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rows", type=str, default="8,96,192,384,768,1536")
    args = ap.parse_args()
    rows_list = [int(r) for r in args.rows.split(",")]

    def make(rows):
        @jax.jit
        def f(x):
            s = jnp.sum(x)  # forces the input to matter
            base = jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 0)
            return base + s
        return f

    fns = {r: make(r) for r in rows_list}
    KBUF = args.iters * len(rows_list) + len(rows_list)
    bufs = [
        jnp.asarray(np.full((64, 128), i + 1, np.uint32)) for i in range(KBUF)
    ]

    bi = 0
    for r, f in fns.items():
        t0 = time.time()
        np.asarray(f(bufs[bi])); bi += 1
        print(f"[fetch] compiled rows={r} in {time.time()-t0:.1f}s",
              file=sys.stderr)

    times = {r: [] for r in rows_list}
    for it in range(args.iters):
        for r, f in fns.items():
            t0 = time.time()
            np.asarray(f(bufs[bi])); bi += 1
            times[r].append((time.time() - t0) * 1e3)

    print(f"\niters={args.iters} (ms/fetch)")
    meds = {}
    for r in rows_list:
        t = np.array(times[r])
        meds[r] = np.median(t)
        kb = r * 128 * 4 / 1024
        print(f"  rows={r:5d} ({kb:7.0f} KB)  med={np.median(t):7.2f}  "
              f"min={t.min():7.2f}  max={t.max():7.2f}")
    r0, r1 = rows_list[0], rows_list[-1]
    dkb = (r1 - r0) * 128 * 4 / 1024
    print(f"  marginal: {(meds[r1]-meds[r0])/dkb*1e3:.1f} us/KB "
          f"({meds[r1]-meds[r0]:.1f} ms over {dkb:.0f} KB)")


if __name__ == "__main__":
    main()
