"""Bisect which structural feature of the engine's device program triggers
the pathological compile (profiler-style scalar-output programs compile to
~0.2 ms; the engine's program compiles to ~40 ms for identical compute)."""
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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_progbench")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.profile_stages import build_workload  # noqa: E402
from fem_tpu.config import FemArgs  # noqa: E402
from fem_tpu.ops.types import FilterParams, device_index_from_host  # noqa: E402
from fem_tpu.pipeline.engine import map_core, pack_outputs  # noqa: E402


def main():
    ref, index, codes_np, lengths_np = build_workload()
    dindex = device_index_from_host(index, ref)
    params = FilterParams.from_args(
        FemArgs(error_threshold=5, num_additional_qgrams=1),
        codes_np.shape[1],
        cap_occ=64,
        cap_cand=64,
    )
    B, Lmax = codes_np.shape
    verify_cap = 2 * B * 16
    use_pallas = jax.devices()[0].platform == "tpu"

    packed_np = np.zeros((B, Lmax + 4), np.uint8)
    packed_np[:, :Lmax] = codes_np
    packed_np[:, Lmax:] = lengths_np.astype("<i4").view(np.uint8).reshape(B, 4)
    packed_v = [jnp.asarray(np.roll(packed_np, k, axis=0)) for k in range(8)]
    codes_v = [jnp.asarray(np.roll(codes_np, k, axis=0)) for k in range(8)]
    lengths = jnp.asarray(lengths_np.astype(np.int32))

    def core_from_packed(di, packed_in, accept_cap):
        codes = packed_in[:, :-4]
        lb = packed_in[:, -4:].astype(jnp.int32)
        ls = lb[:, 0] | (lb[:, 1] << 8) | (lb[:, 2] << 16) | (lb[:, 3] << 24)
        return map_core(di, codes, ls, params, verify_cap, use_pallas, accept_cap)

    variants = {}

    def v0(di, p, salt):  # engine-exact: packed in, packed vector out
        p = jnp.roll(p, (salt & jnp.uint32(1)).astype(jnp.int32), axis=0)
        return pack_outputs(core_from_packed(di, p, 16384))

    variants["v0 engine-exact (vector out)"] = (v0, "packed")

    def v1(di, p, salt):  # same but scalar output
        p = jnp.roll(p, (salt & jnp.uint32(1)).astype(jnp.int32), axis=0)
        out = pack_outputs(core_from_packed(di, p, 16384))
        return jnp.sum(jax.lax.bitcast_convert_type(out, jnp.uint32))

    variants["v1 scalar out"] = (v1, "packed")

    def v2(di, c, salt):  # separate codes/lengths inputs, vector out
        c = jnp.roll(c, (salt & jnp.uint32(1)).astype(jnp.int32), axis=0)
        out = map_core(di, c, lengths, params, verify_cap, use_pallas, 16384)
        return pack_outputs(out)

    variants["v2 no length-decode (vector out)"] = (v2, "codes")

    def v3(di, p, salt):  # accept_cap 8192, vector out
        p = jnp.roll(p, (salt & jnp.uint32(1)).astype(jnp.int32), axis=0)
        return pack_outputs(core_from_packed(di, p, 8192))

    variants["v3 accept_cap 8192 (vector out)"] = (v3, "packed")

    for label, (fn, kind) in variants.items():
        jfn = jax.jit(fn)
        ins = packed_v if kind == "packed" else codes_v
        t0 = time.time()
        out = jfn(dindex, ins[0], jnp.uint32(0))
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        salt = (out if out.ndim == 0 else out[0].astype(jnp.uint32)) & jnp.uint32(0)
        t0 = time.time()
        for i in range(24):
            out = jfn(dindex, ins[i % 8], salt)
            salt = (out if out.ndim == 0 else out[0].astype(jnp.uint32)) & jnp.uint32(0)
        salt.block_until_ready()
        per = (time.time() - t0) / 24 * 1e3
        print(f"{label:42s} {per:8.2f} ms/call (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
