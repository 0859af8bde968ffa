"""Microbench: the occurrence slab fetch (row gather + barrel shift) in
isolation, materialized vs reduced, on the real chr21-scale index."""
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

from tools.profile_stages import build_workload  # noqa: E402
from fem_tpu.ops.types import device_index_from_host  # noqa: E402


def time_fn(fn, args, iters=30, label=""):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.tree.map(lambda x: x.block_until_ready(), outs[-1])
    per = (time.time() - t0) / iters * 1e3
    print(f"{label:44s} {per:8.3f} ms")
    return per


def main():
    ref, index, codes, lengths = build_workload()
    dindex = device_index_from_host(index, ref)
    NB, G, NCH, CAP = 4096, 3, 8, 64
    rng = np.random.default_rng(0)
    # dindex.occ_rows is the (Rs, 128) super-row table since r3; these
    # benchmarks measure the legacy 16-word-row formulation, so rebuild
    # that view explicitly.
    occ16 = jnp.asarray(np.asarray(dindex.occ_rows).reshape(-1, 16))
    n_rows = occ16.shape[0]
    row0_np = rng.integers(0, n_rows - 2, (NB, G, NCH)).astype(np.int32)
    pair_np = (row0_np.astype(np.int64) * 8 + rng.integers(0, 8, row0_np.shape)).astype(
        np.int32
    )
    row0 = jnp.asarray(row0_np)
    pair_idx = jnp.asarray(pair_np)
    occ_rows = occ16

    def chain(occ_rows, pair_idx):
        row0 = jnp.clip(pair_idx >> 3, 0, occ_rows.shape[0] - 2)
        words = jnp.concatenate(
            [
                jnp.take(occ_rows, row0, axis=0),
                jnp.take(occ_rows, row0 + 1, axis=0),
            ],
            axis=-1,
        ).astype(jnp.uint32)
        w = pair_idx & 7
        for bit, sh in ((1, 2), (2, 4), (4, 8)):
            shifted = jnp.concatenate(
                [words[..., sh:], jnp.zeros(words.shape[:-1] + (sh,), jnp.uint32)],
                axis=-1,
            )
            words = jnp.where((w & bit)[..., None] != 0, shifted, words)
        sid = words[..., 0:16:2].astype(jnp.int32).reshape(NB, G, CAP)
        pos = words[..., 1:16:2].astype(jnp.int32).reshape(NB, G, CAP)
        return sid, pos

    f_mat = jax.jit(chain)
    f_red = jax.jit(lambda o, p: tuple(jnp.sum(x.astype(jnp.uint32)) for x in chain(o, p)))

    def gather_only(occ_rows, row0):
        return jnp.take(occ_rows, row0, axis=0).astype(jnp.uint32)

    f_g1 = jax.jit(gather_only)
    f_g1r = jax.jit(lambda o, r: jnp.sum(gather_only(o, r)))

    # Variant: single wider gather (2 rows as one 32-word row view).
    occ2 = jnp.concatenate(
        [occ16[:-1], occ16[1:]], axis=1
    )  # (n-1, 32) precomputed double-row

    def chain2(occ2, pair_idx):
        row0 = jnp.clip(pair_idx >> 3, 0, occ2.shape[0] - 1)
        words = jnp.take(occ2, row0, axis=0).astype(jnp.uint32)
        w = pair_idx & 7
        for bit, sh in ((1, 2), (2, 4), (4, 8)):
            shifted = jnp.concatenate(
                [words[..., sh:], jnp.zeros(words.shape[:-1] + (sh,), jnp.uint32)],
                axis=-1,
            )
            words = jnp.where((w & bit)[..., None] != 0, shifted, words)
        sid = words[..., 0:16:2].astype(jnp.int32).reshape(NB, G, CAP)
        pos = words[..., 1:16:2].astype(jnp.int32).reshape(NB, G, CAP)
        return sid, pos

    f2_mat = jax.jit(chain2)

    # Variant: flat element gather of the pairs (2 element-gathers per pair).
    occ_flat = jnp.asarray(
        np.ascontiguousarray(np.asarray(occ16).reshape(-1))
    )  # interleaved sid,pos words

    def elem(occ_flat, pair_idx):
        base = pair_idx.reshape(NB, G, NCH, 1) * 2 + jnp.arange(16, dtype=jnp.int32).reshape(1, 1, 1, 16)
        # 8 pairs per chunk: elements base..base+15
        vals = jnp.take(occ_flat, base, mode="clip").astype(jnp.uint32)
        sid = vals[..., 0:16:2].astype(jnp.int32).reshape(NB, G, CAP)
        pos = vals[..., 1:16:2].astype(jnp.int32).reshape(NB, G, CAP)
        return sid, pos

    f_elem = jax.jit(elem)

    time_fn(f_g1, (occ_rows, row0), label="row gather only, materialized")
    time_fn(f_g1r, (occ_rows, row0), label="row gather only, reduced")
    time_fn(f_mat, (occ_rows, pair_idx), label="2-row gather + barrel, materialized")
    time_fn(f_red, (occ_rows, pair_idx), label="2-row gather + barrel, reduced")
    time_fn(f2_mat, (occ2, pair_idx), label="1 wide gather + barrel, materialized")
    time_fn(f_elem, (occ_flat, pair_idx), label="element gather 16/chunk, materialized")

    s1, p1 = f_mat(occ_rows, pair_idx)
    s2, p2 = f2_mat(occ2, pair_idx)
    s3, p3 = f_elem(occ_flat, pair_idx)
    print("chain2 == chain:", bool(jnp.array_equal(s1, s2) & jnp.array_equal(p1, p2)))
    print("elem   == chain:", bool(jnp.array_equal(s1, s3) & jnp.array_equal(p1, p3)))


if __name__ == "__main__":
    main()
