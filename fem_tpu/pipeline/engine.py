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
    pipeline_depth: int = 3  # batches kept in flight on the device
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


def pack_outputs(out: dict) -> jnp.ndarray:
    """Fuse all mapping outputs into one int32 vector: the host<->device
    link is a high-latency tunnel, so results travel as a single transfer.
    Layout: [n_accepted, slab_overflow, total_candidates,
             a_lane|a_sid|a_pos|a_ed|a_end (acc_cap each),
             num_candidates|dp_total|needs_fallback (NB each)]."""
    return jnp.concatenate(
        [
            out["n_accepted"].astype(jnp.int32),
            out["slab_overflow"].astype(jnp.int32),
            out["total_candidates"].reshape(1).astype(jnp.int32),
            out["a_lane"],
            out["a_sid"],
            out["a_pos"],
            out["a_ed"],
            out["a_end"],
            out["num_candidates"].astype(jnp.int32),
            jax.lax.bitcast_convert_type(out["dp_total"], jnp.int32),
            out["needs_fallback"].astype(jnp.int32),
        ]
    )


def unpack_outputs(flat: np.ndarray, acc_cap: int, NB: int, nshards: int) -> dict:
    """Invert pack_outputs; with nshards > 1 the flat buffer is a
    concatenation of per-shard packed segments."""
    seg = 3 + 5 * acc_cap + 3 * NB
    assert flat.shape[0] == seg * nshards, (flat.shape, seg, nshards)
    parts = [flat[i * seg : (i + 1) * seg] for i in range(nshards)]

    def field(lo, n):
        return [p[lo : lo + n] for p in parts]

    out = {
        "n_accepted": np.concatenate(field(0, 1)),
        "slab_overflow": np.concatenate(field(1, 1)),
        "total_candidates": parts[0][2:3],
        "a_lane": np.concatenate(field(3, acc_cap)),
        "a_sid": np.concatenate(field(3 + acc_cap, acc_cap)),
        "a_pos": np.concatenate(field(3 + 2 * acc_cap, acc_cap)),
        "a_ed": np.concatenate(field(3 + 3 * acc_cap, acc_cap)),
        "a_end": np.concatenate(field(3 + 4 * acc_cap, acc_cap)),
        "num_candidates": np.concatenate(field(3 + 5 * acc_cap, NB)),
        "dp_total": np.concatenate(field(3 + 5 * acc_cap + NB, NB)).view(np.uint32),
        "needs_fallback": np.concatenate(
            field(3 + 5 * acc_cap + 2 * NB, NB)
        ).astype(bool),
    }
    return out


def _make_device_fn(
    params: FilterParams, verify_cap: int, accept_cap: int, use_pallas: bool
):
    @jax.jit
    def run(index: DeviceIndex, packed_in: jnp.ndarray):
        # packed_in: (B, Lmax + 4) uint8 — codes row followed by the read
        # length as 4 little-endian bytes (single H2D transfer).
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
        self.golden = GoldenMapper(args, reference, index)
        self.dindex = device_index_from_host(index, reference)
        if self.config.use_pallas is None:
            self.config.use_pallas = jax.devices()[0].platform == "tpu"
        self._fns: Dict[Tuple[int, int], callable] = {}
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
            shard(sh.ref_flat),
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

    def _fn_for(self, batch_size: int, max_len: int):
        key = (batch_size, max_len)
        if key not in self._fns:
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
                )
            elif self.config.mesh is not None:
                from fem_tpu.parallel.mesh import make_sharded_map_fn

                n = self.config.mesh.devices.size
                if batch_size % n:
                    raise ValueError(f"batch size {batch_size} not divisible by mesh size {n}")
                fn = make_sharded_map_fn(
                    self.config.mesh, params, verify_cap // n,
                    self.config.use_pallas, accept_cap=accept_cap // n,
                )
            else:
                fn = _make_device_fn(
                    params, verify_cap, accept_cap, self.config.use_pallas
                )
            self._fns[key] = (fn, verify_cap)
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
        if self._device_args is not None:
            out = fn(*self._device_args, jnp.asarray(packed))
        else:
            out = fn(self.dindex, jnp.asarray(packed))
        return batch, out

    def _map_read_fallback(self, name, seq, qual) -> Tuple[List[bytes], MappingStats]:
        """Exact host mapping of one read: in-process C++ mapper when
        available, golden scalar oracle otherwise."""
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
        if n_ip > 1:
            # Per-read counters were psum'd over the index axis; every
            # index shard carries the same copy — keep shard 0's.
            for k in ("num_candidates", "dp_total", "needs_fallback"):
                out[k] = out[k].reshape(n_dp, n_ip, -1)[:, 0].reshape(-1)

        if out["slab_overflow"].any():
            if batch.num_reads == 1:
                # One read exceeding the whole slab: host path handles it.
                return self._map_read_fallback(
                    batch.names[0], batch.seqs[0], batch.quals[0]
                )
            # Verify slab overflow: split and recurse (exact, just slower).
            return self._map_batch_split(batch)

        n_dp, _ = self._mesh_shape()
        if n_dp > 1:
            # Sharded outputs concatenate shard-major; per-read arrays are
            # strand-major *within* each shard — restore global strand-major.
            for k in ("num_candidates", "dp_total", "needs_fallback"):
                out[k] = out[k].reshape(n_dp, 2, -1).transpose(1, 0, 2).reshape(-1)

        return self._emit(batch, out)

    def map_batch(self, batch: ReadBatch) -> Tuple[List[bytes], MappingStats]:
        """Map one read batch synchronously; SAM chunks in read order + stats."""
        return self.drain_batch(self.submit_batch(batch))

    def map_stream(self, batches, depth: int | None = None):
        """Map a stream of batches keeping `depth` batches in flight: hides
        both host emission time and the host<->device round-trip latency
        behind device compute (the reference's 3-stage thread overlap,
        src/FEM_map.c:174-198, plus transfer latency hiding)."""
        from collections import deque

        depth = depth or self.config.pipeline_depth
        q: deque = deque()
        for batch in batches:
            q.append(self.submit_batch(batch))
            if len(q) >= depth:
                yield self.drain_batch(q.popleft())
        while q:
            yield self.drain_batch(q.popleft())

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

    def _emit(self, batch: ReadBatch, out: dict) -> Tuple[List[bytes], MappingStats]:
        n = batch.num_reads
        B = self.config.batch_size
        fallback = out["needs_fallback"]
        if self._native is not None and not (
            fallback[:n].any() or fallback[B : B + n].any()
        ):
            return self._emit_native(batch, out)
        return self._emit_python(batch, out)

    def _emit_native(self, batch: ReadBatch, out: dict) -> Tuple[List[bytes], MappingStats]:
        """Vectorized stats + one native call for mapping sort, traceback
        and SAM formatting (no per-read Python)."""
        n = batch.num_reads
        B = self.config.batch_size
        stats = MappingStats(num_reads=n)
        a_lane, a_sid, a_pos, a_ed, a_end = self._accepted_arrays(out)
        read_id = a_lane % B
        # Generation order per read: + strand then - strand, each ascending
        # (src/map.c:29-49); stable sort by read id preserves exactly that.
        order = np.argsort(read_id, kind="stable")
        read_id = read_id[order]
        map_counts = np.bincount(read_id, minlength=B)[:n].astype(np.int32)
        stats.num_mappings = int(map_counts.sum())
        stats.num_mapped_reads = int((map_counts > 0).sum())
        nc = out["num_candidates"]
        stats.num_candidates = int(nc[:n].sum() + nc[B : B + n].sum())
        dp = out["dp_total"].astype(np.uint64)
        stats.num_candidates_without_additional_qgram_filter = int(
            dp[:n].sum() + dp[B : B + n].sum()
        )
        blob = self._native.emit(
            batch,
            map_counts,
            (a_lane[order] >= B).astype(np.uint8),
            a_ed[order].astype(np.uint8),
            a_sid[order],
            a_pos[order].astype(np.int64),
            a_end[order],
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

    def _emit_python(self, batch: ReadBatch, out: dict) -> Tuple[List[bytes], MappingStats]:
        n = batch.num_reads
        B = self.config.batch_size
        stats = MappingStats(num_reads=n)
        a_lane, a_sid, a_pos, a_ed, a_end = self._accepted_arrays(out)
        bounds = np.searchsorted(a_lane, np.arange(2 * B + 1))
        records: List[bytes] = []
        fallback = out["needs_fallback"]
        for r in range(n):
            if fallback[r] or fallback[r + B]:
                recs, rstats = self._map_read_fallback(
                    batch.names[r], batch.seqs[r], batch.quals[r]
                )
                rstats.num_reads = 0  # already counted
                stats += rstats
                records.extend(recs)
                continue
            stats.num_candidates += int(
                out["num_candidates"][r] + out["num_candidates"][r + B]
            )
            stats.num_candidates_without_additional_qgram_filter += int(
                out["dp_total"][r]
            ) + int(out["dp_total"][r + B])
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
