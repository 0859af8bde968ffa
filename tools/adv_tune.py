"""Operating-point search for the adversarial satellite workload.

The satellite genome (bench.py adversarial phase / tools/soak.py) carries
~10 candidates AND ~10 mappings per read — 6-7x the benign workload — so
slab sizing that is right for chr21-like genomes flags most of each batch
for retry (the global verify/accept slabs are prefix-cut). This tool runs
one engine per config over a cached satellite fixture and reports steady
reads/s + retry/fallback tax, to pick the bench/soak operating point.

Usage: python tools/adv_tune.py "B=8192,cc=64,vpr=8,apr=8,ladder=1" ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/fem_tpu_xla")

import numpy as np

CACHE = "/root/.cache/fem_adv"


def build_fixture(num_reads=131072, genome_mb=46.0, e=5):
    os.makedirs(CACHE, exist_ok=True)
    fap = os.path.join(CACHE, "sat.fa")
    ixp = os.path.join(CACHE, "sat.index")
    npz = os.path.join(CACHE, f"reads{num_reads}_e{e}.npz")
    from fem_tpu import sim
    from fem_tpu.index.build import build_index
    from fem_tpu.index.storage import load_index, save_index
    from fem_tpu.io import fastx

    if not os.path.exists(fap):
        seqs = sim.satellite_genome(
            int(genome_mb * 1e6), num_seqs=2, seed=13, satellite_fraction=0.03,
            unit_range=(24, 160), copies_range=(48, 512),
        )
        sim.write_fasta(fap, seqs)
    ref = fastx.read_fasta(fap)
    if os.path.exists(ixp):
        index = load_index(ixp)
    else:
        index = build_index(ref, 12, 3)
        save_index(index, ixp)
    if not os.path.exists(npz):
        seqs = [(n, bytes(ref.seqs[i])) for i, n in enumerate(ref.names)]
        reads = sim.simulate_reads(seqs, num_reads, read_length=100,
                                   max_errors=e, seed=14)
        from tests.test_engine import _batch_from_reads

        b = _batch_from_reads(reads)
        np.savez(npz, codes=b.codes, lengths=b.lengths)
    d = np.load(npz)
    return ref, index, d["codes"], d["lengths"]


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fem_tpu.config import FemArgs
    from fem_tpu.golden.model import MappingStats
    from fem_tpu.io.fastx import ReadBatch
    from fem_tpu.pipeline.engine import EngineConfig, MappingEngine

    e = int(os.environ.get("FEM_ADV_E", "5"))
    ref, index, codes, lengths = build_fixture(e=e)
    N = codes.shape[0]
    args = FemArgs(error_threshold=e, num_additional_qgrams=1)

    for spec in sys.argv[1:]:
        kv = dict(p.split("=") for p in spec.split(","))
        B = int(kv.get("B", 8192))
        cfg = EngineConfig(
            batch_size=B,
            cap_occ=int(kv.get("occ", 80)),
            cap_cand=int(kv.get("cc", 64)),
            cap_vote=int(kv.get("cv", 0)),
            verify_per_read=int(kv.get("vpr", 8)),
            accept_per_read=int(kv.get("apr", 8)),
            tiers=None if int(kv.get("ladder", 1)) else (),
        )
        eng = MappingEngine(args, ref, index, cfg)
        # codes are 0-3 ints; ReadBatch seqs must be ASCII for fallbacks.
        conv = bytes.maketrans(bytes(range(5)), b"ACGTN")
        batches = []
        for lo in range(0, N, B):
            hi = min(lo + B, N)
            batches.append(ReadBatch(
                [b"r%d" % i for i in range(lo, hi)],
                [bytes(codes[i][: lengths[i]]).translate(conv)
                 for i in range(lo, hi)],
                [b"I" * int(lengths[i]) for i in range(lo, hi)],
                codes[lo:hi], lengths[lo:hi].astype(np.int32),
            ))
        t0 = time.time()
        for _ in eng.map_stream(batches[:2]):
            pass
        warm = time.time() - t0
        total = MappingStats()
        t0 = time.time()
        for recs, st in eng.map_stream(batches[2:]):
            total += st
        dt = time.time() - t0
        print(
            f"[adv] {spec}: {total.num_reads/dt:,.0f} reads/s "
            f"({total.num_reads} reads, {dt:.1f}s, warm {warm:.0f}s) "
            f"retried={eng.retried_reads} tier_disp={eng.tier_dispatches} "
            f"host={eng.fallback_reads} mappings={total.num_mappings}",
            flush=True,
        )


if __name__ == "__main__":
    main()
