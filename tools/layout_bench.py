"""Vreg-utilization hypothesis test for the selattr/chunk-math stages.

The r3 profile attributes ~25 ms/batch to the selected-seed attribute
chain and ~14 ms to occ-gather+trunc at B=8192. Hypothesis: the cost is
LAYOUT, not work — every op on a (NB, G, S) or (NB, G, NCH) array tiles
its last two dims (3,7)/(3,10) into one (8,128) vreg at 2-4% lane
utilization, so each elementwise op costs ~16384 vreg-ops instead of
~340. A transposed (S, NL=G*NB) layout packs lanes fully.

This tool times the SAME logical computation (5-operand bitonic seed
sort + seed-attribute select chains + chunk-ownership math) in both
layouts with forced-fetch methodology (distinct inputs per call,
np.asarray of a scalar checksum).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/fem_tpu_xla")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fem_tpu.ops.sortnet import bitonic_sort_2key  # noqa: E402

NB, G, S, NG, NCH = 16384, 3, 7, 30, 10
NL = NB * G
ITERS = 8


def old_layout(sel_pc, gh, freqs, off):
    """(NB, G, S)/(NB, G, NG) formulation — mirrors candidates.py today."""
    def at_selected(arr):  # (NB,G,NG) -> (NB,G,S)
        out = jnp.broadcast_to(arr[..., 0, None], sel_pc.shape)
        for k in range(1, NG):
            out = jnp.where(sel_pc == k, arr[..., k, None], out)
        return out

    start = jnp.arange(G, dtype=jnp.int32)[None, :, None] + sel_pc * 3
    sel_hash = at_selected(gh)
    sfreq = at_selected(freqs)
    order = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (NB, G, S))
    sfreq_s, _, start_s, off_s, lfreq_s = bitonic_sort_2key(
        sfreq, order, start, off, sfreq
    )
    fc = jnp.minimum(lfreq_s, 81)
    srow = off_s & 7
    fc8 = jnp.where(fc > 0, ((srow + fc + 7) // 8) * 8, 0)
    pfx8 = jnp.cumsum(fc8, axis=2) - fc8
    c8 = jnp.arange(NCH, dtype=jnp.int32) * 8
    j_of_c = jnp.zeros((NB, G, NCH), jnp.int32)
    for j in range(1, S):
        j_of_c = j_of_c + (c8[None, None, :] >= pfx8[..., j, None]).astype(jnp.int32)

    def of_seed(arr):
        out = jnp.broadcast_to(arr[..., 0, None], j_of_c.shape)
        for j in range(1, S):
            out = jnp.where(j_of_c == j, arr[..., j, None], out)
        return out

    within_c = c8[None, None, :] - of_seed(pfx8)
    row = of_seed(off_s >> 3) + (within_c >> 3)
    return (
        jnp.sum(row.astype(jnp.uint32))
        + jnp.sum(sel_hash.astype(jnp.uint32))
        + jnp.sum(within_c.astype(jnp.uint32))
        + jnp.sum(start_s.astype(jnp.uint32))
    )


def _sort_rows(arrs):
    """Bitonic sort along axis 0 (rows padded to pow2), lexicographic by
    (arrs[0], arrs[1]); rows are full-width lanes."""
    n = arrs[0].shape[0]
    np2 = 1 << (n - 1).bit_length()
    if np2 != n:
        pad = np2 - n
        big = np.int32(2**31 - 1)
        arrs = [
            jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:],
                             big if i < 2 else 0, a.dtype)], axis=0
            )
            for i, a in enumerate(arrs)
        ]
    iota = jax.lax.broadcasted_iota(jnp.int32, arrs[0].shape, 0)

    def partner(x, j):
        shp = x.shape
        x = x.reshape((np2 // (2 * j), 2, j) + shp[1:])
        return x[:, ::-1].reshape(shp)

    k = 2
    while k <= np2:
        j = k // 2
        while j >= 1:
            ps = [partner(x, j) for x in arrs]
            up = (iota & j) == 0
            asc = (iota & k) == 0
            a1, a2, b1, b2 = arrs[0], arrs[1], ps[0], ps[1]
            gt = (a1 > b1) | ((a1 == b1) & (a2 > b2))
            lt = (a1 < b1) | ((a1 == b1) & (a2 < b2))
            keep = jnp.where(asc, jnp.where(up, ~gt, ~lt), jnp.where(up, ~lt, ~gt))
            arrs = [jnp.where(keep, x, px) for x, px in zip(arrs, ps)]
            j //= 2
        k *= 2
    return [a[:n] for a in arrs]


def new_layout(sel_pc, gh, freqs, off):
    """(S, NL)/(NCH, NL) transposed formulation."""
    g_l = jnp.arange(NL, dtype=jnp.int32) // NB  # l = g*NB + b

    def at_selected(arr):  # (NG, NL) -> (S, NL)
        out = jnp.broadcast_to(arr[0], sel_pc.shape)
        for k in range(1, NG):
            out = jnp.where(sel_pc == k, arr[k], out)
        return out

    start = g_l[None, :] + sel_pc * 3
    sel_hash = at_selected(gh)
    sfreq = at_selected(freqs)
    order = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[:, None], (S, NL)
    )
    sfreq_s, _, start_s, off_s, lfreq_s = _sort_rows(
        [sfreq, order, start, off, sfreq]
    )
    fc = jnp.minimum(lfreq_s, 81)
    srow = off_s & 7
    fc8 = jnp.where(fc > 0, ((srow + fc + 7) // 8) * 8, 0)
    pfx8 = jnp.cumsum(fc8, axis=0) - fc8
    c8 = jnp.arange(NCH, dtype=jnp.int32) * 8
    j_of_c = jnp.zeros((NCH, NL), jnp.int32)
    for j in range(1, S):
        j_of_c = j_of_c + (c8[:, None] >= pfx8[j][None, :]).astype(jnp.int32)

    def of_seed(arr):  # (S, NL) -> (NCH, NL)
        out = jnp.broadcast_to(arr[0], j_of_c.shape)
        for j in range(1, S):
            out = jnp.where(j_of_c == j, arr[j], out)
        return out

    within_c = c8[:, None] - of_seed(pfx8)
    row = of_seed(off_s >> 3) + (within_c >> 3)
    return (
        jnp.sum(row.astype(jnp.uint32))
        + jnp.sum(sel_hash.astype(jnp.uint32))
        + jnp.sum(within_c.astype(jnp.uint32))
        + jnp.sum(start_s.astype(jnp.uint32))
    )


def bench(label, fn, args_list):
    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(*args_list[-1]))
    compile_s = time.time() - t0
    times = []
    for k in range(ITERS):
        t0 = time.time()
        np.asarray(f(*args_list[k]))
        times.append(time.time() - t0)
    per = float(np.median(times)) * 1e3
    print(f"{label:44s} {per:8.2f} ms/call (compile {compile_s:.1f}s)")
    return per


def _synth(shape, mod, seed):
    """On-device pseudo-random int32 in [0, mod): keeps the H2D payload to
    one scalar so the timing is compute-only (the first run of this tool
    shipped ~14 MB of inputs per call and timed the tunnel, not the VPU)."""
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    for d in range(1, len(shape)):
        i = i * np.uint32(shape[d]) + jax.lax.broadcasted_iota(
            jnp.uint32, shape, d)
    h = (i * np.uint32(2654435761) + seed) >> np.uint32(8)
    return (h % np.uint32(mod)).astype(jnp.int32)


def main():
    def old_wrap(seed):
        return old_layout(
            _synth((NB, G, S), NG, seed),
            _synth((NB, G, NG), 1 << 24, seed + np.uint32(1)),
            _synth((NB, G, NG), 200, seed + np.uint32(2)),
            _synth((NB, G, S), 1 << 28, seed + np.uint32(3)),
        )

    def new_wrap(seed):
        return new_layout(
            _synth((S, NL), NG, seed),
            _synth((NG, NL), 1 << 24, seed + np.uint32(1)),
            _synth((NG, NL), 200, seed + np.uint32(2)),
            _synth((S, NL), 1 << 28, seed + np.uint32(3)),
        )

    seeds = [(jnp.uint32(1000 + k),) for k in range(ITERS + 1)]
    bench("selattr+chunkmath, (NB,G,S) layout (today)", old_wrap, seeds)
    bench("selattr+chunkmath, (S,NL) transposed", new_wrap, seeds)


if __name__ == "__main__":
    main()
