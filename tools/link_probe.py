"""Decompose per-batch cost on the tunneled TPU: dispatch vs device vs
fetch vs emit. Uses the bench configuration (compile cache must be warm).

Run: python tools/link_probe.py [FEM_BENCH_* envs as bench.py]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/fem_tpu_xla")

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fem_tpu import sim
    from fem_tpu.config import FemArgs
    from fem_tpu.index.build import build_index
    from fem_tpu.io import fastx
    from fem_tpu.pipeline.engine import EngineConfig, MappingEngine
    from tests.test_engine import _batch_from_reads

    genome_mb = float(os.environ.get("FEM_BENCH_GENOME_MB", "46"))
    B = int(os.environ.get("FEM_BENCH_BATCH", "8192"))
    e = int(os.environ.get("FEM_BENCH_E", "5"))
    N = int(os.environ.get("FEM_PROBE_BATCHES", "8"))

    t0 = time.time()
    seqs = sim.random_genome(int(genome_mb * 1e6), num_seqs=1, seed=7,
                             repeat_fraction=0.3)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ref.fa")
        sim.write_fasta(p, seqs)
        ref = fastx.read_fasta(p)
    args = FemArgs(error_threshold=e, num_additional_qgrams=1)
    index = build_index(ref, 12, 3)
    reads = sim.simulate_reads(seqs, B * (N + 1), read_length=100,
                               max_errors=min(e, 3), seed=9)
    print(f"[probe] setup {time.time()-t0:.0f}s", file=sys.stderr)

    engine = MappingEngine(
        args, ref, index,
        EngineConfig(
            batch_size=B,
            cap_occ=int(os.environ.get("FEM_BENCH_CAP_OCC", "64")),
            cap_cand=int(os.environ.get("FEM_BENCH_CAP_CAND", "64")),
            verify_per_read=int(os.environ.get("FEM_BENCH_VPR", "4")),
            accept_per_read=int(os.environ.get("FEM_BENCH_APR", "1")),
        ),
    )
    batches = [_batch_from_reads(reads[i * B : (i + 1) * B])
               for i in range(N + 1)]
    # Warm: compile-cache load + first batch end-to-end.
    t0 = time.time()
    engine.map_batch(batches[0])
    print(f"[probe] warm {time.time()-t0:.1f}s", file=sys.stderr)

    # A) dispatch burst: submit N then block on all outputs.
    t0 = time.time()
    pend = [engine.submit_batch(b) for b in batches[1:]]
    t_submit = time.time() - t0
    jax.block_until_ready([p[1] for p in pend])
    t_burst = time.time() - t0
    print(f"[probe] A submit {t_submit*1e3/N:.1f} ms/batch; burst-complete "
          f"{t_burst*1e3/N:.1f} ms/batch", file=sys.stderr)

    # B) fetch each output (device->host).
    t0 = time.time()
    hosts = [np.asarray(p[1]) for p in pend]
    t_fetch = time.time() - t0
    kb = hosts[0].nbytes / 1024
    print(f"[probe] B fetch {t_fetch*1e3/N:.1f} ms/batch ({kb:.0f} KB -> "
          f"{kb/1024/(t_fetch/N):.1f} MB/s)", file=sys.stderr)

    # C) host emit only.
    t0 = time.time()
    for (b, _, tier, seq), h in zip(pend, hosts):
        engine._drain((b, h, tier, seq), per_read=False)
    t_emit = time.time() - t0
    print(f"[probe] C unpack+emit {t_emit*1e3/N:.1f} ms/batch", file=sys.stderr)

    # D) end-to-end steady state via map_stream.
    t0 = time.time()
    n = 0
    for recs, stats in engine.map_stream(batches[1:]):
        n += stats.num_reads
    t_e2e = time.time() - t0
    print(f"[probe] D map_stream {t_e2e*1e3/N:.1f} ms/batch -> "
          f"{n/t_e2e:,.0f} reads/s", file=sys.stderr)


if __name__ == "__main__":
    main()
