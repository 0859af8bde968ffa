"""Microbench: lax.sort variants vs a hand-rolled bitonic network on the
candidate-filter shapes ((NB*G, 64) two-key sort and (NB, 128) dedup sort).
"""
# =============================================================================
# WARNING (r2): this tool predates the corrected runtime model and its
# numbers are NOT trustworthy — the tunneled runtime lazily skips
# unconsumed dispatches and value-caches repeated inputs, so burst/block
# timing measures ~nothing. Use forced-fetch timing (np.asarray of a
# value derived from the output, distinct inputs per call) as in
# tools/profile_stages.py / tools/link_probe.py. See docs/ROADMAP.md.
# =============================================================================


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

SENT = np.int32(2**30)
BIG = np.int32(2**30)


def bitonic_2key(k1, k2, *payload, axis=-1):
    """Ascending bitonic sort by (k1, k2) lexicographic, carrying payloads.
    Width must be a power of two. All compare-exchange stages are dense
    vector ops (no gather/scatter)."""
    n = k1.shape[axis]
    assert n & (n - 1) == 0, "width must be a power of two"
    arrs = [k1, k2, *payload]

    def stage(arrs, j, direction_block):
        # Partner = lane ^ j, computed by reshape/slice swaps.
        def swap(x):
            shp = x.shape
            x = x.reshape(shp[:-1] + (n // (2 * j), 2, j))
            x = x[..., ::-1, :]
            return x.reshape(shp)

        partners = [swap(x) for x in arrs]
        lane = jax.lax.broadcasted_iota(jnp.int32, arrs[0].shape, arrs[0].ndim - 1)
        up = (lane & j) == 0
        if direction_block is not None:
            asc = (lane & direction_block) == 0
        else:
            asc = jnp.ones_like(up)
        a1, a2 = arrs[0], arrs[1]
        b1, b2 = partners[0], partners[1]
        # Strict comparisons keep exchanges tie-consistent across the two
        # lanes of a pair (ties never swap, preserving both payloads).
        gt = (a1 > b1) | ((a1 == b1) & (a2 > b2))
        lt = (a1 < b1) | ((a1 == b1) & (a2 < b2))
        keep = jnp.where(asc, jnp.where(up, ~gt, ~lt), jnp.where(up, ~lt, ~gt))
        return [jnp.where(keep, x, px) for x, px in zip(arrs, partners)]

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            arrs = stage(arrs, j, k if k < n else None)
            j //= 2
        k *= 2
    return arrs


def time_fn(fn, args, iters=50, label=""):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.tree.map(lambda x: x.block_until_ready(), outs[-1])
    per = (time.time() - t0) / iters * 1e3
    print(f"{label:34s} {per:8.3f} ms")
    return per


def main():
    rng = np.random.default_rng(0)
    NB, G, CAP = 4096, 3, 64
    sid = rng.integers(0, 2, (NB, G, CAP)).astype(np.int32)
    diag = rng.integers(0, 1 << 22, (NB, G, CAP)).astype(np.int32)
    valid = rng.random((NB, G, CAP)) < 0.1
    sid = np.where(valid, sid, SENT)
    diag = np.where(valid, diag, BIG)
    s, d, v = jnp.asarray(sid), jnp.asarray(diag), jnp.asarray(valid.astype(np.int32))

    f3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), dimension=2, num_keys=2))
    f2 = jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=2, num_keys=2))
    f1 = jax.jit(lambda a: jax.lax.sort(a, dimension=2))
    fb = jax.jit(lambda a, b: tuple(bitonic_2key(a, b)))
    fb3 = jax.jit(lambda a, b, c: tuple(bitonic_2key(a, b, c)))

    time_fn(f3, (s, d, v), label="(4096,3,64) lax.sort 3op 2key")
    time_fn(f2, (s, d), label="(4096,3,64) lax.sort 2op 2key")
    time_fn(f1, (d,), label="(4096,3,64) lax.sort 1op")
    time_fn(fb, (s, d), label="(4096,3,64) bitonic 2key")
    time_fn(fb3, (s, d, v), label="(4096,3,64) bitonic 2key+payload")

    # Correctness of bitonic vs lax.sort (2-operand).
    a, b = jax.lax.sort((s, d), dimension=2, num_keys=2)
    c, e = bitonic_2key(s, d)
    assert np.array_equal(np.asarray(a), np.asarray(c))
    assert np.array_equal(np.asarray(b), np.asarray(e))
    print("bitonic == lax.sort (keys)")

    M = 128
    sid2 = rng.integers(0, 2, (NB, M)).astype(np.int32)
    pos2 = rng.integers(0, 1 << 22, (NB, M)).astype(np.int32)
    s2, p2 = jnp.asarray(sid2), jnp.asarray(pos2)
    g3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), dimension=1, num_keys=2))
    g2 = jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=2))
    gb = jax.jit(lambda a, b: tuple(bitonic_2key(a, b)))
    time_fn(g3, (s2, p2, s2), label="(4096,128) lax.sort 3op 2key")
    time_fn(g2, (s2, p2), label="(4096,128) lax.sort 2op 2key")
    time_fn(gb, (s2, p2), label="(4096,128) bitonic 2key")
    a, b = jax.lax.sort((s2, p2), dimension=1, num_keys=2)
    c, e = bitonic_2key(s2, p2)
    assert np.array_equal(np.asarray(a), np.asarray(c))
    assert np.array_equal(np.asarray(b), np.asarray(e))
    print("bitonic == lax.sort (dedup shape)")


if __name__ == "__main__":
    main()
