"""Bisect the per-process cold start (BENCH_r03: 212.9 s with a WARM
persistent XLA cache — 2.5x the mapping time of a 10M-read run).

Phases timed in a fresh process, one per line:
  import        jax + fem_tpu imports
  build         workload load (cached fixture)
  engine        MappingEngine init = device index placement (H2D)
  compile       tier-0 program compile (persistent-cache hit expected)
  dispatch      first tier-0 dispatch (execution)
  fetch         FIRST np.asarray of the output — the suspected
                per-process output-transfer refit through the remote
                service
  fetch2        second fetch on a distinct input (steady-state control)
  warm_t1/t2    tier program compile+exec+first-fetch (what warm_tiers
                pays before the stream starts)

Usage: python tools/coldstart_probe.py [--batch 8192] [--no-tiers]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/fem_tpu_xla")

T0 = time.time()
_last = T0


def mark(label: str) -> None:
    global _last
    now = time.time()
    print(f"[cold] {label:12s} +{now - _last:7.1f}s  (t={now - T0:7.1f}s)",
          file=sys.stderr, flush=True)
    _last = now


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--e", type=int, default=5)
    ap.add_argument("--no-tiers", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()
    mark("import")

    from tools.profile_stages import build_workload
    from fem_tpu.config import FemArgs
    from fem_tpu.pipeline.engine import EngineConfig, MappingEngine
    from fem_tpu.io.fastx import ReadBatch

    ref, index, codes_np, lengths_np = build_workload(args.batch, args.e)
    mark("build")

    fa = FemArgs(error_threshold=args.e, num_additional_qgrams=1)
    cfg = EngineConfig(batch_size=args.batch, cap_occ=80, cap_cand=16,
                       cap_vote=32, verify_per_read=2, accept_per_read=1)
    engine = MappingEngine(fa, ref, index, cfg)
    mark("engine")

    Lmax = codes_np.shape[1]
    fn, _ = engine._fn_for(args.batch, Lmax, 0)
    mark("compile")

    probes = engine._probe_args(args.batch, Lmax, iters=3)

    out = fn(*probes[0])
    jax.block_until_ready(out)
    mark("dispatch")

    np.asarray(out)
    mark("fetch")

    np.asarray(fn(*probes[1]))
    mark("fetch2")

    if not args.no_tiers:
        for t in range(1, len(engine.tiers) + 1):
            B_t = engine._tier(t).batch_size
            tfn, _ = engine._fn_for(B_t, Lmax, t)
            targs = engine._probe_args(B_t, Lmax, iters=1)[0]
            np.asarray(tfn(*targs))
            mark(f"warm_t{t}")

    print(f"[cold] TOTAL {time.time() - T0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
