"""Coordinate-sharded index: whole-genome scale-out across devices.

For GRCh38-scale genomes the occurrence table (~8 GB at step 3) and the
reference itself outgrow one chip's HBM. The index therefore shards by
reference coordinate — whole chromosomes per shard, contiguous and in
order — across an `index` mesh axis, while reads stay data-parallel over a
`data` axis (SURVEY.md §5.7; the reference's analogous axis is its
step-size/memory trade-off, README.md:32).

Per-shard state: local CSR (lookup + occ rows of the shard's chromosomes)
and the shard's reference slice. Replicated state: the 4^k global
frequency table (the optimal-prefix-q-gram DP and the frequency sort are
*global* decisions) and chromosome lengths. The only cross-shard
communication in the whole filter/verify path is one lexicographic pmax
(last-seed truncation) plus psums for counters — everything else is local
because the pigeonhole vote and greedy dedup never cross chromosome
boundaries (inter-chromosome gaps exceed the error threshold by
construction).

Mapping results concatenate per (data, index) shard; the host's stable
sort by lane restores the reference's per-read candidate order because
shards hold ascending chromosome ranges.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fem_tpu.index.storage import FemIndex
from fem_tpu.io.fastx import Reference
from fem_tpu.ops.types import DeviceIndex, FilterParams

DATA_AXIS = "data"
INDEX_AXIS = "index"

_ROW_BYTES = 64


@dataclasses.dataclass
class ShardedIndex:
    """Host-side stacked per-shard arrays (leading dim = shard)."""

    num_shards: int
    shard_of_sid: np.ndarray  # (num_seqs,) int32
    lookup: np.ndarray  # (n, 4^k+1) int32 local CSR
    freq_table: np.ndarray  # (4^k,) int32 global frequencies
    occ_rows: np.ndarray  # (n, max_occ_rows, 16) uint32
    ref_flat: np.ndarray  # (n, max_ref) uint8
    ref_rows: np.ndarray  # (n, max_ref/64, 16) uint32
    ref_offsets: np.ndarray  # (n, num_seqs) int32 — offsets into shard ref_flat
    ref_lengths: np.ndarray  # (num_seqs,) int32
    num_occurrences: np.ndarray  # () int32 global


def partition_chromosomes(lengths: np.ndarray, num_shards: int) -> List[List[int]]:
    """Contiguous, in-order partition of chromosomes balanced by length."""
    total = int(lengths.sum())
    target = total / num_shards
    groups: List[List[int]] = []
    cur: List[int] = []
    acc = 0
    remaining = len(lengths)
    for sid, ln in enumerate(lengths):
        cur.append(sid)
        acc += int(ln)
        remaining -= 1
        # Close the group when at target, keeping enough chromosomes for
        # the remaining shards.
        if (
            len(groups) < num_shards - 1
            and acc >= target * (len(groups) + 1) - total / (2 * num_shards)
            and remaining >= (num_shards - 1 - len(groups))
        ):
            groups.append(cur)
            cur = []
    groups.append(cur)
    while len(groups) < num_shards:
        groups.append([])  # tolerate more shards than chromosomes
    return groups


def build_sharded_index(
    index: FemIndex, reference: Reference, num_shards: int, gap: int = 256
) -> ShardedIndex:
    lengths = reference.lengths.astype(np.int64)
    groups = partition_chromosomes(lengths, num_shards)
    shard_of_sid = np.zeros(reference.num_seqs, np.int32)
    for s, g in enumerate(groups):
        for sid in g:
            shard_of_sid[sid] = s

    sid_all = (index.occurrences >> np.uint64(32)).astype(np.int64)
    pos_all = (index.occurrences & np.uint64(0xFFFFFFFF)).astype(np.int64)
    hash_of = np.repeat(
        np.arange(index.lookup.shape[0] - 1, dtype=np.int64),
        np.diff(index.lookup.astype(np.int64)),
    )

    nbuckets = index.lookup.shape[0] - 1
    lookups = []
    occ_pair_lists = []
    for s, g in enumerate(groups):
        in_shard = np.isin(sid_all, np.array(g, dtype=np.int64))
        counts = np.bincount(hash_of[in_shard], minlength=nbuckets)
        lk = np.zeros(nbuckets + 1, np.int64)
        np.cumsum(counts, out=lk[1:])
        lookups.append(lk.astype(np.int32))
        pairs = np.stack(
            [sid_all[in_shard].astype(np.uint32), pos_all[in_shard].astype(np.uint32)],
            axis=1,
        )  # occurrence order preserved -> bucket-sorted like the global CSR
        occ_pair_lists.append(pairs)

    max_pairs = max((p.shape[0] for p in occ_pair_lists), default=0)
    max_rows = -(-max_pairs // 8) + 1
    occ_rows = np.zeros((num_shards, max_rows, 16), np.uint32)
    for s, pairs in enumerate(occ_pair_lists):
        buf = np.zeros((max_rows * 8, 2), np.uint32)
        buf[: pairs.shape[0]] = pairs
        occ_rows[s] = buf.reshape(max_rows, 16)

    # Per-shard reference slices (leading + trailing sentinel gaps).
    flats = []
    offsets = np.zeros((num_shards, reference.num_seqs), np.int32)
    for s, g in enumerate(groups):
        size = gap + sum(int(lengths[sid]) + gap for sid in g)
        size += (-size) % _ROW_BYTES + _ROW_BYTES
        flat = np.full(size, 4, np.uint8)
        pos = gap
        for sid in g:
            offsets[s, sid] = pos
            flat[pos : pos + int(lengths[sid])] = reference.codes_of(sid)
            pos += int(lengths[sid]) + gap
        flats.append(flat)
    max_ref = max(f.shape[0] for f in flats)
    max_ref += (-max_ref) % _ROW_BYTES
    ref_flat = np.full((num_shards, max_ref), 4, np.uint8)
    for s, f in enumerate(flats):
        ref_flat[s, : f.shape[0]] = f
    ref_rows = ref_flat.reshape(num_shards, -1).view(np.uint32).reshape(
        num_shards, max_ref // _ROW_BYTES, 16
    )

    lookup_i32 = index.lookup.astype(np.int32)
    return ShardedIndex(
        num_shards=num_shards,
        shard_of_sid=shard_of_sid,
        lookup=np.stack(lookups),
        freq_table=np.diff(lookup_i32),
        occ_rows=occ_rows,
        ref_flat=ref_flat,
        ref_rows=ref_rows,
        ref_offsets=offsets,
        ref_lengths=reference.lengths.astype(np.int32),
        num_occurrences=np.int32(index.num_occurrences),
    )


def make_index_sharded_map_fn(
    mesh: Mesh,
    params: FilterParams,
    verify_cap_per_shard: int,
    accept_cap_per_shard: int,
    use_pallas: bool,
    nonce: int = 0,
):
    """shard_map over a ('data', 'index') mesh: reads sharded on `data`,
    index pieces sharded on `index`, full mapping step per device.
    `salt`/`nonce` re-key the compile cache (MappingEngine._compile_with_reroll)."""
    from fem_tpu.pipeline.engine import map_core, pack_outputs

    n_dp = mesh.shape[DATA_AXIS]
    n_ip = mesh.shape[INDEX_AXIS]

    def shard_fn(
        lookup, freq_table, occ_rows, ref_rows, ref_offsets,
        ref_lengths, num_occurrences, packed_in, salt,
    ):
        packed_in = jnp.roll(
            packed_in,
            (salt & jnp.uint32(1 + nonce)).astype(jnp.int32),
            axis=0,
        )
        codes = packed_in[:, :-4]
        lb = packed_in[:, -4:].astype(jnp.int32)
        lengths = lb[:, 0] | (lb[:, 1] << 8) | (lb[:, 2] << 16) | (lb[:, 3] << 24)
        index = DeviceIndex(
            lookup=lookup[0],
            freq_table=freq_table,
            occ_rows=occ_rows[0],
            ref_rows=ref_rows[0],
            ref_offsets=ref_offsets[0],
            ref_lengths=ref_lengths,
            num_occurrences=num_occurrences,
        )
        out = map_core(
            index, codes, lengths, params, verify_cap_per_shard, use_pallas,
            accept_cap_per_shard, index_axis=INDEX_AXIS,
        )
        Bloc = codes.shape[0]
        shard = jax.lax.axis_index(DATA_AXIS)
        l = out["a_lane"]
        strand = (l >= Bloc).astype(jnp.int32)
        out["a_lane"] = strand * (n_dp * Bloc) + shard * Bloc + (l - strand * Bloc)
        # Global per-read counters: candidate counts sum over index shards;
        # fallback is any-shard; DP totals are identical on every shard.
        out["num_candidates"] = jax.lax.psum(out["num_candidates"], INDEX_AXIS)
        out["needs_fallback"] = (
            jax.lax.pmax(out["needs_fallback"].astype(jnp.int32), INDEX_AXIS) > 0
        )
        out["total_candidates"] = jax.lax.psum(
            out["total_candidates"], (DATA_AXIS, INDEX_AXIS)
        )
        return pack_outputs(out)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(INDEX_AXIS),  # lookup
            P(),  # freq_table
            P(INDEX_AXIS),  # occ_rows
            P(INDEX_AXIS),  # ref_rows
            P(INDEX_AXIS),  # ref_offsets
            P(),  # ref_lengths
            P(),  # num_occurrences
            P(DATA_AXIS),  # packed reads
            P(),  # salt
        ),
        out_specs=P((DATA_AXIS, INDEX_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)
