"""The batched mapping engine: device pipeline + host emission.

Replaces the reference's pthread worker loop (src/map.c:3-71): reads are
padded into fixed-shape batches, both strands are mapped by one jitted
device program (hash -> q-gram DP -> candidate filter -> banded Myers),
and the small accepted-hit set comes back to the host for traceback and
SAM emission. Reads that exceed a static device capacity (occurrence slab,
candidate list, or verify slots) fall back to the golden scalar path, so
the ALL-mappings guarantee survives fixed shapes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.config import FemArgs
from fem_tpu.golden.model import GoldenMapper, GoldenMapping, MappingStats, read_strands
from fem_tpu.index.storage import FemIndex
from fem_tpu.io.fastx import ReadBatch, Reference
from fem_tpu.ops.candidates import generate_candidates
from fem_tpu.ops.hashing import ambiguous_base_counts, reverse_complement, seed_hashes
from fem_tpu.ops.types import DeviceIndex, FilterParams, device_index_from_host
from fem_tpu.ops.verify import verify_candidates_jnp


@dataclasses.dataclass
class EngineConfig:
    batch_size: int = 10000  # reads per device batch (src/FEM_map.c:151)
    cap_occ: int = 256
    cap_cand: int = 256
    verify_per_read: int = 16  # verify slots per read-strand lane (avg)
    accept_per_read: int = 4  # accepted-mapping slots per read (avg)
    pipeline_depth: int = 4  # batches in flight (device + drain threads)
    aggregate_fetch: int | None = None  # batches per D2H fetch (None = 1).
    # The tunneled link charges ~25-30 ms per *pending program* a fetch
    # depends on, so aggregation only pays off when host emission (not the
    # link) dominates; prefer a bigger batch_size, which amortizes the
    # same fixed costs inside one program.
    use_pallas: bool | None = None  # None = auto (TPU only)
    mesh: object | None = None  # jax.sharding.Mesh for multi-chip data parallelism
    index_mesh: object | None = None  # 2D ('data','index') Mesh: reads data-
    # parallel + coordinate-sharded index (GRCh38-scale genomes)


def map_core(
    index: DeviceIndex,
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    params: FilterParams,
    verify_cap: int,
    use_pallas: bool,
    accept_cap: int = 4096,
    index_axis: str | None = None,
):
    """The full per-batch mapping step, both strands, as one traceable
    function: hash -> DP seed selection -> candidate filter -> verify.
    Shard-mappable over the batch (read) axis; `verify_cap` is per shard."""
    e = params.error_threshold
    B, Lmax = codes.shape
    neg = reverse_complement(codes, lengths)
    both = jnp.concatenate([codes, neg], axis=0)  # (2B, Lmax)
    lens2 = jnp.concatenate([lengths, lengths], axis=0)
    hashes = seed_hashes(both, params.kmer_size)
    amb = ambiguous_base_counts(both, lens2, params.kmer_size)
    cand = generate_candidates(
        both, lens2, hashes, amb, index, params, index_axis=index_axis
    )

    # Compact valid candidates into the verify slab. Flat order is
    # (lane-major, ascending position) — candidate order per strand is
    # preserved, which the mapping sort's stability relies on.
    NB, CC = cand.cand_valid.shape
    flat_valid = cand.cand_valid.reshape(-1)
    order = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    total = flat_valid.sum().astype(jnp.int32)
    slot = jnp.where(flat_valid, order, verify_cap)  # OOB scatters drop
    lane_of = jnp.broadcast_to(
        jnp.arange(NB, dtype=jnp.int32)[:, None], (NB, CC)
    ).reshape(-1)
    v_lane = jnp.zeros((verify_cap,), jnp.int32).at[slot].set(lane_of)
    v_sid = jnp.zeros((verify_cap,), jnp.int32).at[slot].set(
        cand.cand_sid.reshape(-1)
    )
    v_pos = jnp.zeros((verify_cap,), jnp.int32).at[slot].set(
        cand.cand_pos.reshape(-1)
    )
    v_text = jnp.take(both, v_lane, axis=0)
    v_len = jnp.take(lens2, v_lane)
    if use_pallas:
        from fem_tpu.ops.verify_pallas import verify_candidates_pallas

        vres = verify_candidates_pallas(index, v_sid, v_pos, v_text, v_len, e)
    else:
        vres = verify_candidates_jnp(index, v_sid, v_pos, v_text, v_len, e)
    in_use = jnp.arange(verify_cap, dtype=jnp.int32) < jnp.minimum(total, verify_cap)
    accepted = vres.accepted & in_use

    # Compact accepted hits on-device: host round trips ride a remote
    # tunnel, so the result payload must stay tiny. Slab order (lane-major,
    # ascending) is preserved.
    acc_cap = max(accept_cap, 8)
    a_order = jnp.cumsum(accepted.astype(jnp.int32)) - 1
    n_accepted = accepted.sum().astype(jnp.int32)
    a_slot = jnp.where(accepted, a_order, acc_cap)  # OOB scatters drop

    def compact(x):
        return jnp.zeros((acc_cap,), x.dtype).at[a_slot].set(x)

    return {
        "slab_overflow": (
            (total > verify_cap) | (n_accepted > acc_cap)
        ).reshape(1),
        "a_lane": compact(v_lane),
        "a_sid": compact(v_sid),
        "a_pos": compact(v_pos),
        "a_ed": compact(vres.edit_distance),
        "a_end": compact(vres.end_offset),
        "n_accepted": n_accepted.reshape(1),
        "num_candidates": cand.num_candidates,
        "dp_total": cand.dp_total,
        "needs_fallback": cand.needs_fallback,
        "total_candidates": total,
    }


def _le_bytes(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Flatten an integer array to little-endian bytes of `dtype` width."""
    x = x.astype(dtype)
    if dtype == jnp.uint8:
        return x.reshape(-1)
    return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)


def pack_outputs(out: dict) -> jnp.ndarray:
    """Fuse all mapping outputs into one uint8 vector. The host<->device
    link is a tunneled ~12-25 MB/s channel with ~25 ms fixed cost per
    synchronous fetch, so the result payload is aggressively packed:
    per-hit fields travel at their natural widths (pos u32, lane/sid/end
    u16, ed u8 = 11 B/hit), per-lane counters collapse to on-device masked
    sums (lanes of fallback reads excluded — the host recomputes those
    reads exactly), and fallback flags travel as a per-read bitmap.

    Layout per shard segment:
      [0:24)  header: n_accepted, slab_overflow, total_candidates,
              sum_nc, dp_lo16, dp_hi16 (u32 LE each; dp sums split 16/16
              so 2^32 lane-sum overflow is impossible)
      [24:)   a_pos (4A) | a_lane (2A) | a_sid (2A) | a_end (2A) |
              a_ed (A) | fallback bitmap (ceil(B/8))
    """
    NB = out["num_candidates"].shape[0]
    B = NB // 2
    fb_read = out["needs_fallback"][:B] | out["needs_fallback"][B:]
    mask = jnp.concatenate([~fb_read, ~fb_read]).astype(jnp.uint32)
    nc = out["num_candidates"].astype(jnp.uint32) * mask
    dp = out["dp_total"] * mask
    sum_nc = jnp.sum(nc)
    dp_lo = jnp.sum(dp & jnp.uint32(0xFFFF))
    dp_hi = jnp.sum(dp >> 16)
    header = jnp.stack(
        [
            out["n_accepted"].reshape(()).astype(jnp.uint32),
            out["slab_overflow"].reshape(()).astype(jnp.uint32),
            out["total_candidates"].reshape(()).astype(jnp.uint32),
            sum_nc,
            dp_lo,
            dp_hi,
        ]
    )
    pad = (-B) % 8
    fb_bits = jnp.concatenate([fb_read, jnp.zeros((pad,), bool)]).reshape(-1, 8)
    fb_bytes = jnp.sum(
        fb_bits.astype(jnp.uint8) << jnp.arange(8, dtype=jnp.uint8), axis=1
    ).astype(jnp.uint8)
    return jnp.concatenate(
        [
            _le_bytes(header, jnp.uint32),
            _le_bytes(out["a_pos"], jnp.uint32),
            _le_bytes(out["a_lane"], jnp.uint16),
            _le_bytes(out["a_sid"], jnp.uint16),
            _le_bytes(out["a_end"], jnp.uint16),
            _le_bytes(out["a_ed"], jnp.uint8),
            fb_bytes,
        ]
    )


def packed_segment_size(acc_cap: int, NB: int) -> int:
    return 24 + 11 * acc_cap + (NB // 2 + 7) // 8


def unpack_outputs(flat: np.ndarray, acc_cap: int, NB: int, nshards: int) -> dict:
    """Invert pack_outputs; with nshards > 1 the flat buffer is a
    concatenation of per-shard packed segments. Arrays come back
    per-segment-concatenated; header sums come back per segment."""
    B = NB // 2
    fb_bytes = (B + 7) // 8
    seg = packed_segment_size(acc_cap, NB)
    assert flat.shape[0] == seg * nshards, (flat.shape, seg, nshards)
    parts = [flat[i * seg : (i + 1) * seg] for i in range(nshards)]

    def field(lo, nbytes, dtype):
        return [p[lo : lo + nbytes].view(dtype) for p in parts]

    headers = np.stack([p[:24].view("<u4") for p in parts])  # (nshards, 6)
    o = 24
    a_pos = np.concatenate(field(o, 4 * acc_cap, "<u4")).astype(np.int64)
    o += 4 * acc_cap
    a_lane = np.concatenate(field(o, 2 * acc_cap, "<u2")).astype(np.int64)
    o += 2 * acc_cap
    a_sid = np.concatenate(field(o, 2 * acc_cap, "<u2")).astype(np.int64)
    o += 2 * acc_cap
    a_end = np.concatenate(field(o, 2 * acc_cap, "<u2")).astype(np.int64)
    o += 2 * acc_cap
    a_ed = np.concatenate(field(o, acc_cap, np.uint8)).astype(np.int64)
    o += acc_cap
    fb = np.stack(
        [
            np.unpackbits(p[o : o + fb_bytes], bitorder="little")[:B]
            for p in parts
        ]
    ).astype(bool)  # (nshards, B)
    return {
        "n_accepted": headers[:, 0],
        "slab_overflow": headers[:, 1],
        "total_candidates": headers[:1, 2],
        "sum_nc": headers[:, 3].astype(np.int64),
        "sum_dp": headers[:, 4].astype(np.int64)
        + (headers[:, 5].astype(np.int64) << 16),
        "a_pos": a_pos,
        "a_lane": a_lane,
        "a_sid": a_sid,
        "a_end": a_end,
        "a_ed": a_ed,
        "fb": fb,
    }


def _make_device_fn(
    params: FilterParams, verify_cap: int, accept_cap: int, use_pallas: bool,
    nonce: int = 0,
):
    @jax.jit
    def run(index: DeviceIndex, packed_in: jnp.ndarray, salt: jnp.ndarray):
        # packed_in: (B, Lmax + 4) uint8 — codes row followed by the read
        # length as 4 little-endian bytes (single H2D transfer).
        #
        # `salt` is a runtime zero; the roll below is a no-op. Its real job
        # is the `nonce` constant: the remote TPU compiler's code quality
        # is nondeterministic per compilation (the same program compiles to
        # 0.2 ms or 40 ms per batch), so the engine probes each compile and
        # re-rolls bad ones by bumping `nonce`, which re-keys the
        # compilation cache (see _compile_with_reroll / docs/ROADMAP.md).
        packed_in = jnp.roll(
            packed_in, (salt & jnp.uint32(1 + nonce)).astype(jnp.int32), axis=0
        )
        codes = packed_in[:, :-4]
        lb = packed_in[:, -4:].astype(jnp.int32)
        lengths = lb[:, 0] | (lb[:, 1] << 8) | (lb[:, 2] << 16) | (lb[:, 3] << 24)
        out = map_core(
            index, codes, lengths, params, verify_cap, use_pallas, accept_cap
        )
        return pack_outputs(out)

    return run


class MappingEngine:
    def __init__(
        self,
        args: FemArgs,
        reference: Reference,
        index: FemIndex,
        config: EngineConfig | None = None,
        use_native: bool | None = None,
    ):
        self.args = args
        self.reference = reference
        self.config = config or EngineConfig()
        # Packed-result width limits (pack_outputs: lane u16, sid u16).
        if self.config.batch_size > 32767:
            raise ValueError("batch_size must be <= 32767")
        if reference.num_seqs > 65535:
            raise ValueError("references with > 65535 sequences unsupported")
        self.golden = GoldenMapper(args, reference, index)
        self.dindex = device_index_from_host(index, reference)
        if self.config.use_pallas is None:
            self.config.use_pallas = jax.devices()[0].platform == "tpu"
        self._fns: Dict[Tuple[int, int], callable] = {}
        self._agg_fns: Dict[int, callable] = {}
        self._on_tpu = jax.devices()[0].platform == "tpu"
        self._salt = None  # lazily-created runtime zero (see _make_device_fn)
        import threading

        self._fallback_lock = threading.Lock()
        self.fallback_reads = 0
        self._device_args = None  # set for the coordinate-sharded index mode
        if self.config.index_mesh is not None:
            self._init_sharded_index(index)
        self._native = None
        if use_native is None:
            use_native = os.environ.get("FEM_TPU_NO_NATIVE", "") != "1"
        self._cpu_mapper = None
        if use_native:
            try:
                from fem_tpu.native import NativeEmitter, native_available

                if native_available():
                    self._native = NativeEmitter(reference, args.error_threshold)
            except Exception:
                self._native = None
            try:
                from fem_tpu.native.mapper import NativeCpuMapper, mapper_available

                if mapper_available():
                    self._cpu_mapper = NativeCpuMapper(args, reference, index)
            except Exception:
                self._cpu_mapper = None

    def _init_sharded_index(self, index: FemIndex) -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fem_tpu.parallel.sharded_index import INDEX_AXIS, build_sharded_index

        mesh = self.config.index_mesh
        n_ip = mesh.shape[INDEX_AXIS]
        sh = build_sharded_index(index, self.reference, n_ip)
        shard = lambda x: jax.device_put(x, NamedSharding(mesh, P(INDEX_AXIS)))
        repl = lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
        self._device_args = (
            shard(sh.lookup),
            repl(sh.freq_table),
            shard(sh.occ_rows),
            shard(sh.ref_rows),
            shard(sh.ref_offsets),
            repl(sh.ref_lengths),
            repl(sh.num_occurrences),
        )

    def _mesh_shape(self) -> Tuple[int, int]:
        """(data shards, index shards)."""
        if self.config.index_mesh is not None:
            m = self.config.index_mesh
            return m.shape["data"], m.shape["index"]
        if self.config.mesh is not None:
            return self.config.mesh.devices.size, 1
        return 1, 1

    def _make_fn(self, batch_size: int, max_len: int, nonce: int):
        params = FilterParams.from_args(
            self.args,
            max_len,
            cap_occ=self.config.cap_occ,
            cap_cand=self.config.cap_cand,
        )
        verify_cap = 2 * batch_size * self.config.verify_per_read
        accept_cap = max(2 * batch_size * self.config.accept_per_read, 64)
        if self.config.index_mesh is not None:
            from fem_tpu.parallel.sharded_index import make_index_sharded_map_fn

            n_dp, n_ip = self._mesh_shape()
            if batch_size % n_dp:
                raise ValueError(
                    f"batch size {batch_size} not divisible by data mesh {n_dp}"
                )
            fn = make_index_sharded_map_fn(
                self.config.index_mesh,
                params,
                verify_cap // (n_dp * n_ip),
                max(accept_cap // (n_dp * n_ip), 8),
                self.config.use_pallas,
                nonce=nonce,
            )
        elif self.config.mesh is not None:
            from fem_tpu.parallel.mesh import make_sharded_map_fn

            n = self.config.mesh.devices.size
            if batch_size % n:
                raise ValueError(f"batch size {batch_size} not divisible by mesh size {n}")
            fn = make_sharded_map_fn(
                self.config.mesh, params, verify_cap // n,
                self.config.use_pallas, accept_cap=accept_cap // n,
                nonce=nonce,
            )
        else:
            fn = _make_device_fn(
                params, verify_cap, accept_cap, self.config.use_pallas,
                nonce=nonce,
            )
        return fn, verify_cap

    def _probe_args(self, batch_size: int, max_len: int):
        """A synthetic batch for compile-quality probing: the program is
        shape-specialized and its cost is data-independent (fixed-capacity
        slabs, sorts, scans), so all-N reads time it faithfully."""
        packed = np.full((batch_size, max_len + 4), 4, np.uint8)
        packed[:, max_len:] = (
            np.full((batch_size,), max_len, "<i4").view(np.uint8).reshape(-1, 4)
        )
        if self._device_args is not None:
            return (*self._device_args, jnp.asarray(packed))
        return (self.dindex, jnp.asarray(packed))

    @staticmethod
    def _probe_ms(fn, args, iters: int = 6) -> float:
        """Per-dispatch time of a compiled program, measured with CHAINED
        dispatches: each call's salt consumes the previous output, so the
        runtime cannot elide or overlap executions and blocking on the last
        forces the whole chain (async dispatch otherwise hides them)."""
        import time

        def chain(out):
            flat = out if isinstance(out, jnp.ndarray) else out[0]
            return flat.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(0)

        out = fn(*args, jnp.uint32(0))
        jax.block_until_ready(out)
        salt = chain(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, salt)
            salt = chain(out)
        jax.block_until_ready(salt)
        return (time.perf_counter() - t0) / iters * 1e3

    def _compile_with_reroll(self, batch_size: int, max_len: int):
        """Compile the device program, probe it, and re-roll bad compiles.

        The remote TPU compile service produces nondeterministic code
        quality: the identical mapping program compiles to ~0.2-0.7 ms or
        ~40 ms per 2048-read batch run-to-run. Each `nonce` folds a
        different constant into the program, re-keying the persistent
        compilation cache for an independent roll. The winning nonce is
        remembered in a sidecar file so later processes load the good
        artifact directly."""
        rolls = int(os.environ.get("FEM_TPU_COMPILE_ROLLS", "4"))
        on_tpu = jax.devices()[0].platform == "tpu"
        mesh = self.config.index_mesh or self.config.mesh
        crosses_hosts = mesh is not None and any(
            d.process_index != jax.process_index() for d in mesh.devices.flat
        )
        if not on_tpu or rolls <= 1 or crosses_hosts:
            # Off-TPU compiles are deterministic; cross-host meshes cannot
            # probe independently (every process must join each dispatch).
            return self._make_fn(batch_size, max_len, 0)
        # The probe time includes the per-dispatch result shipping over the
        # tunneled link (~25 ms fixed + output bytes at ~10 MB/s), which no
        # compile can remove — the threshold only needs to catch
        # pathological code above that floor.
        n_dp, n_ip = self._mesh_shape()
        acc_cap = max(
            max(2 * batch_size * self.config.accept_per_read, 64)
            // (n_dp * n_ip),
            8,
        )
        seg_kb = packed_segment_size(acc_cap, 2 * batch_size // n_dp) / 1024
        default_ms = 28.0 + 3.0 * batch_size / 2048 + seg_kb / 10.0
        threshold = float(
            os.environ.get("FEM_TPU_COMPILE_THRESHOLD_MS", default_ms)
        )
        cache_dir = jax.config.jax_compilation_cache_dir
        sidecar = os.path.join(cache_dir, "fem_tpu_nonces.json") if cache_dir else None
        key = (
            f"v{getattr(__import__('fem_tpu'), '__version__', '0')}|"
            f"B{batch_size}|L{max_len}|e{self.args.error_threshold}|"
            f"a{self.args.num_additional_qgrams}|k{self.args.kmer_size}|"
            f"s{self.args.step_size}|occ{self.config.cap_occ}|"
            f"cc{self.config.cap_cand}|v{self.config.verify_per_read}|"
            f"ac{self.config.accept_per_read}|p{int(self.config.use_pallas)}|"
            f"m{self._mesh_shape()}"
        )
        known = {}
        if sidecar and os.path.exists(sidecar):
            try:
                import json

                with open(sidecar) as f:
                    known = json.load(f)
            except Exception:
                known = {}
        order = list(range(rolls))
        if key in known:
            n0 = int(known[key])
            order = [n0] + [n for n in order if n != n0]
        probe_args = self._probe_args(batch_size, max_len)
        best = None
        import sys as _sys

        for nonce in order:
            fn, verify_cap = self._make_fn(batch_size, max_len, nonce)
            ms = self._probe_ms(fn, probe_args)
            print(
                f"[fem_tpu] device program roll {nonce}: {ms:.2f} ms/batch",
                file=_sys.stderr,
            )
            if best is None or ms < best[2]:
                best = (fn, verify_cap, ms, nonce)
            if ms <= threshold:
                break
        if sidecar:
            try:
                import json

                known[key] = best[3]
                tmp = sidecar + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(known, f, indent=1)
                os.replace(tmp, sidecar)
            except Exception:
                pass
        return best[0], best[1]

    def _fn_for(self, batch_size: int, max_len: int):
        key = (batch_size, max_len)
        if key not in self._fns:
            self._fns[key] = self._compile_with_reroll(batch_size, max_len)
        return self._fns[key]

    def submit_batch(self, batch: ReadBatch):
        """Dispatch one batch to the device without blocking; pair with
        `drain_batch`. Keeping a batch in flight while the host emits the
        previous one is the TPU equivalent of the reference's reader/
        mapper/writer thread overlap (src/FEM_map.c:174-198)."""
        B = self.config.batch_size
        n = batch.num_reads
        Lmax = batch.codes.shape[1]
        if batch.packed is not None and batch.packed.shape[0] == B:
            packed = batch.packed  # native reader already built the upload
        else:
            # Single fused H2D buffer: codes + 4 little-endian length bytes.
            packed = np.full((B, Lmax + 4), 4, np.uint8)
            packed[:n, :Lmax] = batch.codes
            packed[n:, Lmax:] = 0
            packed[:n, Lmax:] = (
                batch.lengths.astype("<i4").view(np.uint8).reshape(n, 4)
            )
        fn, verify_cap = self._fn_for(B, Lmax)
        if self._salt is None:
            self._salt = jnp.uint32(0)
        if self._device_args is not None:
            out = fn(*self._device_args, jnp.asarray(packed), self._salt)
        else:
            out = fn(self.dindex, jnp.asarray(packed), self._salt)
        # Start the D2H transfer as soon as the program finishes: the
        # host<->device link pays a fixed ~8 ms per synchronous fetch, and
        # with pipeline depth >= 2 the async copy fully overlaps the
        # previous batch's host emission.
        if os.environ.get("FEM_TPU_NO_ASYNC_COPY", "") != "1":
            try:
                out.copy_to_host_async()
            except AttributeError:
                pass
        return batch, out

    def _map_read_fallback(self, name, seq, qual) -> Tuple[List[bytes], MappingStats]:
        """Exact host mapping of one read: in-process C++ mapper when
        available, golden scalar oracle otherwise."""
        with self._fallback_lock:
            self.fallback_reads += 1
        if self._cpu_mapper is not None:
            blob, st = self._cpu_mapper.map_reads([name], [seq], [qual])
            stats = MappingStats(
                num_reads=int(st[0]),
                num_mapped_reads=int(st[1]),
                num_candidates_without_additional_qgram_filter=int(st[2]),
                num_candidates=int(st[3]),
                num_mappings=int(st[4]),
            )
            return ([blob] if blob else []), stats
        return self.golden.map_read(name, seq, qual)

    def drain_batch(self, pending) -> Tuple[List[bytes], MappingStats]:
        batch, flat = pending
        B = self.config.batch_size
        n_dp, n_ip = self._mesh_shape()
        nseg = n_dp * n_ip
        acc_cap = max(max(2 * B * self.config.accept_per_read, 64) // nseg, 8)
        out = unpack_outputs(np.asarray(flat), acc_cap, 2 * B // n_dp, nseg)

        if out["slab_overflow"].any():
            if batch.num_reads == 1:
                # One read exceeding the whole slab: host path handles it.
                return self._map_read_fallback(
                    batch.names[0], batch.seqs[0], batch.quals[0]
                )
            # Verify slab overflow: split and recurse (exact, just slower).
            return self._map_batch_split(batch)

        # Header sums / fallback bitmap: segments are data-shard-major;
        # index shards carry identical copies (nc psum'd, dp identical,
        # fallback pmax'd over the index axis) — keep index shard 0's.
        sum_nc = int(out["sum_nc"].reshape(n_dp, n_ip)[:, 0].sum())
        sum_dp = int(out["sum_dp"].reshape(n_dp, n_ip)[:, 0].sum())
        fb = out["fb"].reshape(n_dp, n_ip, -1)[:, 0].reshape(-1)  # (B,) reads
        return self._emit(batch, out, sum_nc, sum_dp, fb)

    def map_batch(self, batch: ReadBatch) -> Tuple[List[bytes], MappingStats]:
        """Map one read batch synchronously; SAM chunks in read order + stats."""
        return self.drain_batch(self.submit_batch(batch))

    def map_stream(self, batches, depth: int | None = None):
        """Map a stream of batches keeping `depth` batch groups in flight.

        The tunneled host<->device link charges a fixed ~25 ms per
        synchronous fetch and concurrent fetches serialize, so results of
        `aggregate_fetch` batches concatenate on device and come back as a
        single transfer; fetch+emit of one group overlaps the next group's
        device compute on a small thread pool (the reference's
        reader/mapper/writer thread overlap, src/FEM_map.c:174-198).
        Results yield in submission order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        depth = depth or self.config.pipeline_depth
        agg = self.config.aggregate_fetch or 1
        if self._mesh_shape() != (1, 1):
            agg = 1  # sharded outputs: concat would reshuffle shard layout

        def drain_group(group, flat):
            host = np.asarray(flat)
            seg = host.shape[0] // len(group)
            return [
                self.drain_batch((b, host[i * seg : (i + 1) * seg]))
                for i, (b, _) in enumerate(group)
            ]

        q: deque = deque()
        group: list = []
        with ThreadPoolExecutor(max_workers=max(2, depth)) as ex:

            def flush():
                nonlocal group
                if len(group) == 1:
                    q.append(ex.submit(lambda g: [self.drain_batch(g)], group[0]))
                else:
                    flat = self._agg_fn(len(group))(*[o for _, o in group])
                    try:
                        flat.copy_to_host_async()
                    except AttributeError:
                        pass
                    q.append(ex.submit(drain_group, group, flat))
                group = []

            for batch in batches:
                group.append(self.submit_batch(batch))
                if len(group) >= agg:
                    flush()
                while len(q) > depth:
                    yield from q.popleft().result()
            if group:
                flush()
            while q:
                yield from q.popleft().result()

    def _agg_fn(self, n: int):
        key = n
        if key not in self._agg_fns:
            self._agg_fns[key] = jax.jit(lambda *xs: jnp.concatenate(xs))
        return self._agg_fns[key]

    def _map_batch_split(self, batch: ReadBatch) -> Tuple[List[bytes], MappingStats]:
        mid = max(batch.num_reads // 2, 1)
        recs: List[bytes] = []
        stats = MappingStats()
        for lo, hi in ((0, mid), (mid, batch.num_reads)):
            if lo >= hi:
                continue
            sub = ReadBatch(
                batch.names[lo:hi],
                batch.seqs[lo:hi],
                batch.quals[lo:hi],
                batch.codes[lo:hi],
                batch.lengths[lo:hi],
            )
            r, s = self.map_batch(sub)
            recs.extend(r)
            stats += s
        return recs, stats

    def _emit(
        self, batch: ReadBatch, out: dict, sum_nc: int, sum_dp: int,
        fb: np.ndarray,
    ) -> Tuple[List[bytes], MappingStats]:
        if self._native is not None and not fb[: batch.num_reads].any():
            return self._emit_native(batch, out, sum_nc, sum_dp)
        return self._emit_python(batch, out, sum_nc, sum_dp, fb)

    def _emit_native(
        self, batch: ReadBatch, out: dict, sum_nc: int, sum_dp: int
    ) -> Tuple[List[bytes], MappingStats]:
        """Vectorized stats + one native call for mapping sort, traceback
        and SAM formatting (no per-read Python)."""
        n = batch.num_reads
        B = self.config.batch_size
        stats = MappingStats(
            num_reads=n,
            num_candidates=sum_nc,
            num_candidates_without_additional_qgram_filter=sum_dp,
        )
        a_lane, a_sid, a_pos, a_ed, a_end = self._accepted_arrays(out)
        read_id = a_lane % B
        # Generation order per read: + strand then - strand, each ascending
        # (src/map.c:29-49); stable sort by read id preserves exactly that.
        order = np.argsort(read_id, kind="stable")
        read_id = read_id[order]
        map_counts = np.bincount(read_id, minlength=B)[:n].astype(np.int32)
        stats.num_mappings = int(map_counts.sum())
        stats.num_mapped_reads = int((map_counts > 0).sum())
        blob = self._native.emit(
            batch,
            map_counts,
            (a_lane[order] >= B).astype(np.uint8),
            a_ed[order].astype(np.uint8),
            a_sid[order].astype(np.int32),
            a_pos[order].astype(np.int64),
            a_end[order].astype(np.int32),
        )
        return ([blob] if blob else []), stats

    def _accepted_arrays(self, out: dict):
        """Accepted-hit arrays trimmed to true counts and stable-sorted by
        lane (on a mesh the shards concatenate shard-major; stability keeps
        each lane's candidates in ascending band-position order)."""
        n_acc = out["n_accepted"]
        if n_acc.shape[0] > 1:  # per-shard compacted segments
            cap = out["a_lane"].shape[0] // n_acc.shape[0]
            keep = np.concatenate(
                [
                    np.arange(int(c)) + i * cap
                    for i, c in enumerate(n_acc)
                ]
            ).astype(np.int64)
        else:
            keep = np.arange(int(n_acc[0]))
        a_lane = out["a_lane"][keep]
        a_sid = out["a_sid"][keep]
        a_pos = out["a_pos"][keep]
        a_ed = out["a_ed"][keep]
        a_end = out["a_end"][keep]
        sort = np.argsort(a_lane, kind="stable")
        return a_lane[sort], a_sid[sort], a_pos[sort], a_ed[sort], a_end[sort]

    def _emit_python(
        self, batch: ReadBatch, out: dict, sum_nc: int, sum_dp: int,
        fb: np.ndarray,
    ) -> Tuple[List[bytes], MappingStats]:
        n = batch.num_reads
        B = self.config.batch_size
        # Device sums already cover every non-fallback read (lanes of
        # fallback reads were masked out on device); fallback reads add
        # their exactly-recomputed counters below.
        stats = MappingStats(
            num_reads=n,
            num_candidates=sum_nc,
            num_candidates_without_additional_qgram_filter=sum_dp,
        )
        a_lane, a_sid, a_pos, a_ed, a_end = self._accepted_arrays(out)
        bounds = np.searchsorted(a_lane, np.arange(2 * B + 1))
        records: List[bytes] = []
        for r in range(n):
            if fb[r]:
                recs, rstats = self._map_read_fallback(
                    batch.names[r], batch.seqs[r], batch.quals[r]
                )
                rstats.num_reads = 0  # already counted
                stats += rstats
                records.extend(recs)
                continue
            mappings: List[GoldenMapping] = []
            for lane in (r, r + B):  # + strand then - strand (src/map.c:29-49)
                direction = 0 if lane < B else 1
                for i in range(bounds[lane], bounds[lane + 1]):
                    mappings.append(
                        GoldenMapping(
                            direction=direction,
                            edit_distance=int(a_ed[i]),
                            candidate_position=(int(a_sid[i]) << 32)
                            | int(a_pos[i]),
                            end_position_offset=int(a_end[i]),
                        )
                    )
            stats.num_mappings += len(mappings)
            if not mappings:
                continue
            stats.num_mapped_reads += 1
            rc, rcod, nc, ncod = read_strands(batch.seqs[r])
            records.extend(
                self.golden.emit_records(
                    batch.names[r], batch.seqs[r], batch.quals[r],
                    rc, rcod, nc, ncod, mappings,
                )
            )
        return records, stats
