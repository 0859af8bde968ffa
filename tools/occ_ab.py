"""Interleaved A/B probe for r5 gather-formulation candidates.

Round-1 results (2026-08-21, quiet window, B=8192 e=5, 12 iters — both
variants REJECTED and removed):
  * occ_dead0 (dead chunks gather a hot row 0): occB 60.8 vs occA 59.1 ms
    — gather cost is per issue, indifferent to locality.
  * csr_split (CSR bounds via one flat element gather over concat[h, h+1]):
    selB 64.0 vs selA 49.6 ms — 688k element issues lose to 344k 2-word
    rows; issue count beats output-tile utilization.

Round-2 variants (see fem_tpu/ops/candidates.py):
  * gather_pib — mode="promise_in_bounds" on the freq/csr/occ takes
    (indices provably in range), dropping the clamp on 2.3 M issues.
  * unsorted_slab — allocate occurrence chunks in traceback seed order;
    the frequency sort (only consumer: last-seed truncation, now an
    argmax) leaves the occ gather's critical path.

Measurement discipline (docs/ROADMAP.md r5): the RPC floor drifts between
service phases, so every comparison here interleaves its cases round-robin
inside ONE process, distinct input buffer per dispatch, forced scalar
fetch per call.

Usage: python tools/occ_ab.py [--iters 12] [--batch 8192]
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
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()

    from tools.profile_stages import build_workload

    from fem_tpu.config import FemArgs
    from fem_tpu.ops.candidates import generate_candidates
    from fem_tpu.ops.hashing import (
        ambiguous_base_counts,
        reverse_complement,
        seed_hashes,
    )
    from fem_tpu.ops.types import FilterParams, device_index_from_host

    ref, index, codes_np, lengths_np = build_workload(args.batch, args.e)
    dindex = device_index_from_host(index, ref)
    fa = FemArgs(error_threshold=args.e, num_additional_qgrams=1)
    params = FilterParams.from_args(
        fa, codes_np.shape[1], cap_occ=80, cap_cand=16, cap_vote=32
    )
    use_pallas = jax.devices()[0].platform == "tpu"

    def prefix(stop, pib, unsorted):
        def body(di, c, l):
            if stop == "nop":
                return jnp.sum(c.astype(jnp.uint32)) + jnp.sum(l.astype(jnp.uint32))
            neg = reverse_complement(c, l)
            both = jnp.concatenate([c, neg], axis=0)
            lens2 = jnp.concatenate([l, l], axis=0)
            hashes = seed_hashes(both, params.kmer_size)
            amb = ambiguous_base_counts(both, lens2, params.kmer_size)
            r = generate_candidates(
                both, lens2, hashes, amb, di, params,
                use_kernel=use_pallas, gather_pib=pib, unsorted_slab=unsorted,
                _stop_after=None if stop == "cand" else stop,
            )
            if stop == "cand":
                return (
                    jnp.sum(r.cand_pos.astype(jnp.uint32))
                    + jnp.sum(r.num_candidates.astype(jnp.uint32))
                    + jnp.sum(r.dp_total)
                )
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.uint32)), r, jnp.uint32(0)
            )

        return jax.jit(body)

    variants = {
        "nop": prefix("nop", False, False),
        "candA": prefix("cand", False, False),      # baseline
        "candP": prefix("cand", True, False),       # promise_in_bounds
        "candU": prefix("cand", False, True),       # unsorted slab
        "candPU": prefix("cand", True, True),       # both
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    KBUF = args.iters * len(variants) + len(variants)
    codes_v = [jnp.asarray(np.roll(codes_np, k + 1, axis=0)) for k in range(KBUF)]
    lengths = jnp.asarray(lengths_np.astype(np.int32))

    # Warm/compile every variant first (separate from timing).
    bi = 0
    sums = {}
    for name, fn in variants.items():
        t0 = time.time()
        sums[name] = int(np.asarray(fn(dindex, codes_v[bi], lengths)))
        bi += 1
        print(f"[ab] compiled {name} in {time.time()-t0:.1f}s", file=sys.stderr)

    times = {name: [] for name in variants}
    for it in range(args.iters):
        for name, fn in variants.items():
            t0 = time.time()
            np.asarray(fn(dindex, codes_v[bi], lengths))
            times[name].append((time.time() - t0) * 1e3)
            bi += 1

    print(f"\nB={args.batch} e={args.e} iters={args.iters} (ms/call)")
    for name in variants:
        t = np.array(times[name])
        print(
            f"  {name:6s} mean={t.mean():7.2f}  med={np.median(t):7.2f}  "
            f"min={t.min():7.2f}  max={t.max():7.2f}"
        )
    # All cand* variants compute the same final candidate sets, so their
    # warm checksums (each on its own buffer) are NOT comparable here;
    # bit-equality is asserted by
    # tests/test_device_ops.py::test_candidate_gather_variants_identical.
    print(f"  [warm checksums] {sums}")


if __name__ == "__main__":
    main()
