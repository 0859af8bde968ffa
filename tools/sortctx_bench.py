"""Isolate why the slab sort region is slow in-context but fast standalone.

Builds the real pipeline inputs, materializes the exact sort operands
(sid_s, diag_s) as device arrays, then times:
  a) lax.sort / bitonic on those arrays in their own jit (isolated)
  b) the full prefix with an optimization_barrier before the sort
  c) the full prefix as-is (control)
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

from tools.profile_stages import build_workload  # noqa: E402
from fem_tpu.config import FemArgs  # noqa: E402
from fem_tpu.ops import candidates as C  # noqa: E402
from fem_tpu.ops.hashing import (  # noqa: E402
    ambiguous_base_counts,
    reverse_complement,
    seed_hashes,
)
from fem_tpu.ops.sortnet import bitonic_sort_2key  # noqa: E402
from fem_tpu.ops.types import FilterParams, device_index_from_host  # noqa: E402


def time_fn(fn, argsets, iters=32, label=""):
    out = fn(*argsets[0])
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(iters)]
    jax.tree.map(lambda x: x.block_until_ready(), outs[-1])
    per = (time.time() - t0) / iters * 1e3
    print(f"{label:52s} {per:8.3f} ms")
    return per


def main():
    ref, index, codes_np, lengths_np = build_workload()
    dindex = device_index_from_host(index, ref)
    params = FilterParams.from_args(
        FemArgs(error_threshold=5, num_additional_qgrams=1),
        codes_np.shape[1],
        cap_occ=64,
        cap_cand=64,
    )

    def upto_trunc(di, c, l):
        neg = reverse_complement(c, l)
        both = jnp.concatenate([c, neg], axis=0)
        lens2 = jnp.concatenate([l, l], axis=0)
        hashes = seed_hashes(both, params.kmer_size)
        amb = ambiguous_base_counts(both, lens2, params.kmer_size)
        return C.generate_candidates(
            both, lens2, hashes, amb, di, params, _stop_after="truncmat"
        )

    lengths = jnp.asarray(lengths_np.astype(np.int32))
    codes_v = [jnp.asarray(np.roll(codes_np, k, axis=0)) for k in range(4)]

    f_trunc = jax.jit(upto_trunc)
    # Materialize the true sort operands.
    from fem_tpu.ops.types import SENTINEL_SID

    time_fn(f_trunc, [(dindex, c, lengths) for c in codes_v], label="prefix->trunc materialized (control)")

    sv, dg = f_trunc(dindex, codes_v[0], lengths)
    sv, dg = jax.block_until_ready((sv, dg))
    # Fake sid consistent with validity (sid in {0}: single-chromosome
    # bench genome, so where(valid, 0, SENT) is the real sid_s).
    sid_s = jnp.where(sv, 0, SENTINEL_SID).astype(jnp.int32)
    diag_s = jnp.where(sv, dg, jnp.int32(2**30))

    f_lax = jax.jit(
        lambda a, b: jax.lax.sort((a, b), dimension=2, num_keys=2)
    )
    f_bit = jax.jit(lambda a, b: bitonic_sort_2key(a, b))
    time_fn(f_lax, [(sid_s, diag_s)], label="lax.sort on real operands, isolated jit")
    time_fn(f_bit, [(sid_s, diag_s)], label="bitonic on real operands, isolated jit")

    def full_sortvote(di, c, l, barrier):
        neg = reverse_complement(c, l)
        both = jnp.concatenate([c, neg], axis=0)
        lens2 = jnp.concatenate([l, l], axis=0)
        hashes = seed_hashes(both, params.kmer_size)
        amb = ambiguous_base_counts(both, lens2, params.kmer_size)
        return C.generate_candidates(
            both, lens2, hashes, amb, di, params,
            _stop_after="sortvote_b" if barrier else "sortvote",
        )

    f_ctx = jax.jit(lambda di, c, l: full_sortvote(di, c, l, False))
    time_fn(f_ctx, [(dindex, c, lengths) for c in codes_v], label="prefix->sortvote in-context (control)")
    f_bar = jax.jit(lambda di, c, l: full_sortvote(di, c, l, True))
    time_fn(f_bar, [(dindex, c, lengths) for c in codes_v], label="prefix->sortvote with opt barrier")


if __name__ == "__main__":
    main()
