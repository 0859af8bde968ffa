"""Stage-level profiler for the device mapping pipeline.

Op-level device traces do not survive the remote TPU tunnel (xprof planes
come back empty), so the working method is prefix bisection: jit the
candidate pipeline truncated at successive stage boundaries (the
`_stop_after` probes in ops/candidates.py) and difference the per-call
times. Per-call link latency pipelines away by dispatching a burst of
async calls and blocking once at the end.

Usage:  python tools/profile_stages.py [--iters 30] [--stages a,b,c]
Workload mirrors bench.py's north-star config; the simulated genome,
index and packed batch are cached under /root/.cache/fem_profile/.
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

CACHE = "/root/.cache/fem_profile"

STAGES = [
    "nop",        # sum(codes) only: the RPC + H2D + dispatch floor
    "hash",       # RC + seed hashing + ambiguity counts
    "freqs",      # frequency-table gather over all (lane, group, seed)
    "dp",         # q-gram selection DP + traceback
    "selattr",    # selected-seed attribute select-chains + freq sort
    "occgather",  # occurrence row gather + barrel shift
    "trunc",      # slot validity + last-seed truncation
    "sortvote",   # per-group slab sort + pigeonhole vote
    "dedup",      # greedy dedup fold over groups
    "cand",       # full generate_candidates (+ range filter)
    "full",       # map_core (adds verify + compaction)
]


def build_workload(B=2048, max_errors=3):
    os.makedirs(CACHE, exist_ok=True)
    npz = os.path.join(CACHE, f"workload{B}_me{max_errors}.npz")
    ixp = os.path.join(CACHE, "ref.index")
    fap = os.path.join(CACHE, "ref.fa")
    from fem_tpu import sim
    from fem_tpu.index.build import build_index
    from fem_tpu.index.storage import load_index, save_index
    from fem_tpu.io import fastx

    if not (os.path.exists(npz) and os.path.exists(ixp) and os.path.exists(fap)):
        t0 = time.time()
        seqs = sim.random_genome(int(46e6), num_seqs=1, seed=7, repeat_fraction=0.3)
        if not os.path.exists(fap):
            sim.write_fasta(fap, seqs)
        ref = fastx.read_fasta(fap)
        if os.path.exists(ixp):
            index = load_index(ixp)
        else:
            index = build_index(ref, 12, 3)
            save_index(index, ixp)
        reads = sim.simulate_reads(
            seqs, B, read_length=100, max_errors=max_errors, seed=9
        )
        from tests.test_engine import _batch_from_reads

        batch = _batch_from_reads(reads)
        np.savez(npz, codes=batch.codes, lengths=batch.lengths)
        print(f"[prof] workload built in {time.time()-t0:.1f}s", file=sys.stderr)
    ref = fastx.read_fasta(fap)
    index = load_index(ixp)
    d = np.load(npz)
    return ref, index, d["codes"], d["lengths"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--e", type=int, default=5)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--cap-vote", type=int, default=None)
    ap.add_argument("--cap-cand", type=int, default=None)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--vpr", type=int, default=16)
    ap.add_argument("--apr", type=int, default=4)
    ap.add_argument("--max-errors", type=int, default=None,
                    help="read error budget (default: e, the honest point)")
    ap.add_argument("--stages", type=str, default=",".join(STAGES))
    args = ap.parse_args()
    stages = args.stages.split(",")
    max_errors = args.e if args.max_errors is None else args.max_errors

    from fem_tpu.config import FemArgs
    from fem_tpu.ops.candidates import generate_candidates
    from fem_tpu.ops.hashing import ambiguous_base_counts, reverse_complement, seed_hashes
    from fem_tpu.ops.types import FilterParams, device_index_from_host
    from fem_tpu.pipeline.engine import map_core, pack_outputs

    ref, index, codes_np, lengths_np = build_workload(args.batch, max_errors)
    dindex = device_index_from_host(index, ref)
    fa = FemArgs(error_threshold=args.e, num_additional_qgrams=1)
    params = FilterParams.from_args(
        fa, codes_np.shape[1], cap_occ=args.cap,
        cap_cand=args.cap_cand or args.cap,
        cap_vote=args.cap_vote or args.cap,
    )
    B = codes_np.shape[0]
    verify_cap = 2 * B * args.vpr
    accept_cap = max(2 * B * args.apr, 64)
    use_pallas = jax.devices()[0].platform == "tpu"

    # Distinct input buffers per dispatch: identical (program, args) pairs
    # can be served from an executor-side cache, reading as ~0 ms/call —
    # so EVERY timed dispatch gets its own buffer (r2 finding: 8 rotating
    # buffers still let 60% of calls hit the cache, corrupting the deltas).
    KBUF = args.iters + 1
    codes_v = [jnp.asarray(np.roll(codes_np, k, axis=0)) for k in range(KBUF)]
    lengths = jnp.asarray(lengths_np.astype(np.int32))

    def prefix(stop):
        def body(di, c, l):
            if stop == "nop":
                return jnp.sum(c.astype(jnp.uint32)) + jnp.sum(
                    l.astype(jnp.uint32)
                )
            neg = reverse_complement(c, l)
            both = jnp.concatenate([c, neg], axis=0)
            lens2 = jnp.concatenate([l, l], axis=0)
            hashes = seed_hashes(both, params.kmer_size)
            amb = ambiguous_base_counts(both, lens2, params.kmer_size)
            if stop == "hash":
                return jnp.sum(hashes.astype(jnp.uint32)) + jnp.sum(
                    amb.astype(jnp.uint32)
                )
            r = generate_candidates(
                both, lens2, hashes, amb, di, params, _stop_after=stop
            )
            if stop == "cand":
                return (
                    jnp.sum(r.cand_pos.astype(jnp.uint32))
                    + jnp.sum(r.num_candidates.astype(jnp.uint32))
                    + jnp.sum(r.dp_total)
                )
            if stop == "full":
                raise AssertionError
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.uint32)), r, jnp.uint32(0)
            )

        if stop == "full":
            def body(di, c, l):  # noqa: F811
                out = map_core(di, c, l, params, verify_cap, use_pallas,
                               accept_cap)
                return jnp.sum(pack_outputs(out).astype(jnp.uint32))

        return jax.jit(body)

    # Timing methodology (r2, 3rd revision — supersedes everything): the
    # runtime is LAZY: block_until_ready alone does not force execution
    # (dropped outputs never run), and repeated (program, input-value)
    # pairs are served from a value cache. The only trustworthy timing is
    # np.asarray(output) per call with a DISTINCT input buffer each call;
    # the scalar checksum output keeps the fetch itself ~free.
    results = {}
    for stop in stages:
        fn = prefix(stop)
        t0 = time.time()
        np.asarray(fn(dindex, codes_v[0], lengths))
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(1, args.iters + 1):  # buffer 0 was the warm call
            np.asarray(fn(dindex, codes_v[i], lengths))
        per = (time.time() - t0) / args.iters * 1e3
        results[stop] = per
        print(f"[prof] {stop:10s} {per:8.2f} ms/call  (compile+1st {compile_s:.1f}s)",
              file=sys.stderr)

    prev = 0.0
    print("\nstage deltas (ms):")
    for stop in stages:
        print(f"  {stop:10s} {results[stop]:8.2f}  (+{results[stop]-prev:6.2f})")
        prev = results[stop]


if __name__ == "__main__":
    main()
