"""Measure the sharded-index program's per-batch collective payloads.

The 1->N scaling model (docs/SCALE.md) bounded the index-axis traffic by
construction but never TIMED it. Real multi-chip hardware is unavailable
here, so this tool does the two things that ARE measurable today:

  1. enumerate the exact per-batch collective payloads of the
     coordinate-sharded mapping program (bytes, from the program's own
     shapes);
  2. time those collectives on the virtual CPU mesh (shard_map pmax /
     all_gather / psum at the exact payload shapes, forced-fetch timing)
     — an OVERHEAD floor (CPU mesh "links" are memcpy), reported next to
     bandwidth-model estimates at stated ICI/DCN rates.

Output: a markdown table for docs/SCALE.md.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/collective_cost.py [--batch 8192] [--n-index 8]
(under a TPU plugin the env var is ignored; the tool forces cpu itself).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

# Stated bandwidth assumptions (per direction, per device):
ICI_GBPS = 100.0  # TPU v5e: 4 ICI links x ~50 GB/s bidir -> ~100 GB/s usable
DCN_GBPS = 6.25   # 50 Gb/s NIC per host


def timed(fn, args_list, iters):
    jax.block_until_ready(fn(*args_list[-1]))
    times = []
    for k in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args_list[k]))[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--n-index", type=int, default=8)
    ap.add_argument("--apr", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    B, n_ip = args.batch, args.n_index
    NB, G = 2 * B, 3
    devices = jax.devices()[:n_ip]
    mesh = Mesh(np.array(devices).reshape(1, n_ip), ("data", "index"))

    from fem_tpu.pipeline.engine import packed_segment_size

    acc_cap = max(max(2 * B * args.apr, 64) // n_ip, 8)
    seg_words = packed_segment_size(acc_cap, NB)

    rows = []

    def add(name, payload_bytes, ms_cpu, note):
        ici_us = payload_bytes / (ICI_GBPS * 1e3)
        dcn_us = payload_bytes / (DCN_GBPS * 1e3)
        rows.append((name, payload_bytes, ms_cpu, ici_us, dcn_us, note))

    rng = np.random.default_rng(0)

    def mk(shape, dtype=np.int32):
        return [
            jax.device_put(
                rng.integers(0, 100, shape).astype(dtype),
                jax.sharding.NamedSharding(mesh, P(None, "index")),
            )
            for _ in range(args.iters + 1)
        ]

    # 1. last-seed truncation: two lexicographic pmaxes of (NB, G, 1) i32
    # (ops/candidates.py) — each shard contributes its (NB*G) maxima.
    x_tr = mk((NB * G, n_ip))

    def pmax2(x):
        def f(xs):
            a = jax.lax.pmax(xs, "index")
            b = jax.lax.pmax(xs + 1, "index")
            return a + b

        return jax.shard_map(
            f, mesh=mesh, in_specs=P(None, "index"), out_specs=P(None, "index")
        )(x)

    ms = timed(jax.jit(pmax2), [(v,) for v in x_tr], args.iters)
    add("last-seed trunc (2x pmax (NB,G) i32)", 2 * NB * G * 4, ms,
        "every batch, index axis")

    # 2. counter psums: num_candidates (NB,) + 3 bitmap pmaxes (NB,) +
    # total_candidates scalar (sharded program, parallel/sharded_index.py).
    x_ct = mk((NB, n_ip))

    def psums(x):
        def f(xs):
            return (
                jax.lax.psum(xs, "index")
                + jax.lax.pmax(xs, "index")
                + jax.lax.pmax(xs + 1, "index")
                + jax.lax.pmax(xs + 2, "index")
            )

        return jax.shard_map(
            f, mesh=mesh, in_specs=P(None, "index"), out_specs=P(None, "index")
        )(x)

    ms = timed(jax.jit(psums), [(v,) for v in x_ct], args.iters)
    add("counters (psum + 3 pmax (NB,) i32)", 4 * NB * 4, ms,
        "every batch, index axis")

    # 3. cross-host hit merge: all_gather of the packed segment over the
    # index axis (gather_rows mode only).
    seg = [
        jax.device_put(
            rng.integers(0, 1 << 20, (seg_words // 128 * n_ip, 128)).astype(
                np.uint32
            ),
            jax.sharding.NamedSharding(mesh, P("index", None)),
        )
        for _ in range(args.iters + 1)
    ]

    def gather(x):
        def f(xs):
            return jax.lax.all_gather(xs, "index", axis=0)

        return jax.shard_map(
            f, mesh=mesh, in_specs=P("index", None), out_specs=P("index", None)
        )(x)

    ms = timed(jax.jit(gather), [(v,) for v in seg], args.iters)
    add(f"hit merge (all_gather seg {seg_words*4//1024} KB x {n_ip})",
        seg_words * 4 * n_ip, ms, "cross-host rows only")

    # 4. per-batch bitmap allgather over the coordination service
    # (engine._allgather_row_bitmaps): (2, B) u8 per process.
    add("overflow bitmaps (host allgather (2,B) u8)", 2 * B, None,
        "cross-host rows only, via DCN coordination service")

    total_ici = sum(r[3] for r in rows if r[3])
    print(f"\nper-batch collective payloads (B={B}, {n_ip}-shard index axis, "
          f"acc_cap={acc_cap}):\n")
    print("| collective | payload | CPU-mesh ms | est ICI us | est DCN us | when |")
    print("|---|---|---|---|---|---|")
    for name, by, ms, ici, dcn, note in rows:
        mss = f"{ms:.2f}" if ms is not None else "-"
        print(f"| {name} | {by/1024:.0f} KB | {mss} | {ici:.0f} | {dcn:.0f} |"
              f" {note} |")
    print(f"\nTotal est. ICI time/batch: {total_ici:.0f} us vs ~63,000 us "
          f"execution (<{100*total_ici/63000:.2f}%)")
    print(f"(assumptions: ICI {ICI_GBPS} GB/s, DCN {DCN_GBPS} GB/s per "
          f"device, payloads one direction; CPU-mesh column is scheduling "
          f"overhead floor, its 'links' are memcpy)")


if __name__ == "__main__":
    main()
