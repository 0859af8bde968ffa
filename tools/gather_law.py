"""What drives XLA gather cost on this chip: elements, rows, or padded
tiles?  Forced-fetch timing (distinct inputs per call, np.asarray on a
derived scalar) over the same physical tables the mapper uses.

r3 motivation: the chip profile showed a 1.47M-element freq gather at
~6 ms but a 344k-element selected-seed gather at ~12.5 ms and the 491k
aligned-row occ gather at ~20 ms — per-element cost varies 10x with
output shape, so the formulation (not the byte count) is the lever.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/fem_tpu_xla")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.profile_stages import build_workload  # noqa: E402
from fem_tpu.ops.types import device_index_from_host  # noqa: E402

NB, G, S, NG, NCH = 16384, 3, 7, 30, 10
ITERS = 8


def bench(label, fn, idx_list):
    f = jax.jit(fn)
    _ = np.asarray(f(idx_list[-1]))  # compile
    times = []
    for k in range(ITERS):
        t0 = time.time()
        _ = np.asarray(f(idx_list[k]))
        times.append(time.time() - t0)
    per = np.median(times) * 1e3
    print(f"{label:58s} {per:8.2f} ms")
    return per


def main():
    ref, index, codes, lengths = build_workload(8192, 5)
    d = device_index_from_host(index, ref)
    T = d.freq_table  # (16.7M,) u32
    # d.occ_rows is the (Rs, 128) super-row table (8 logical 16-word rows
    # per super-row) since r3; rebuild the legacy 16-word-row view for the
    # "(today)"-era benchmarks and use the table itself for the 128-wide
    # ones.
    OCC128 = d.occ_rows  # (Rs, 128) u32
    OCC = jnp.asarray(np.asarray(OCC128).reshape(-1, 16))  # (Rs*8, 16)
    R = OCC.shape[0]
    rng = np.random.default_rng(0)

    def mk(shape, hi):
        return [
            jnp.asarray(rng.integers(0, hi, shape).astype(np.int32))
            for _ in range(ITERS + 1)
        ]

    H = T.shape[0]
    i_sel = mk((NB, G, S), H)        # 344k, minor 7
    i_flat = mk((NB * G * S,), H)    # 344k, flat
    i_big = mk((NB, G, NG), H)       # 1.47M, minor 30
    i_wide = mk((NB * G * S // 128, 128), H)  # 344k, minor 128
    r_cur = mk((NB, G, NCH), R - 1)  # 491k row ids, minor 10
    r_flat = mk((NB * G * NCH,), R - 1)
    r_128 = mk((NB * G * NCH,), OCC128.shape[0] - 1)

    s = lambda x: jnp.sum(x.astype(jnp.uint32))
    bench("freq[ (NB,G,7) ]  (selgather today)", lambda i: s(jnp.take(T, i, mode="clip")), i_sel)
    bench("freq[ flat 344k ]", lambda i: s(jnp.take(T, i, mode="clip")), i_flat)
    bench("freq[ (NB,G,30) ] (freqs today)", lambda i: s(jnp.take(T, i, mode="clip")), i_big)
    bench("freq[ (2688,128) ]", lambda i: s(jnp.take(T, i, mode="clip")), i_wide)
    bench("occ rows (NB,G,10)->(...,16)  (today)", lambda r: s(jnp.take(OCC, r, axis=0)), r_cur)
    bench("occ rows flat 491k ->(W,16)", lambda r: s(jnp.take(OCC, r, axis=0)), r_flat)
    bench("occ super-rows flat 491k ->(W,128)", lambda r: s(jnp.take(OCC128, r, axis=0)), r_128)


if __name__ == "__main__":
    main()
