"""Coordinate-sharded index over a 2D (data, index) virtual mesh: byte
equality with the golden oracle regardless of mesh shape (SURVEY.md §5.7 /
BASELINE config 4)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from fem_tpu import sim
from fem_tpu.golden.model import GoldenMapper
from fem_tpu.parallel.sharded_index import build_sharded_index, partition_chromosomes
from fem_tpu.pipeline.engine import EngineConfig, MappingEngine

from tests.test_engine import _batch_from_reads


def _mesh2d(n_dp, n_ip):
    devs = np.array(jax.devices()[: n_dp * n_ip]).reshape(n_dp, n_ip)
    return Mesh(devs, ("data", "index"))


def test_partition_chromosomes_contiguous():
    lengths = np.array([50, 10, 40, 30, 70])
    groups = partition_chromosomes(lengths, 2)
    assert sum(groups, []) == [0, 1, 2, 3, 4]
    assert len(groups) == 2
    groups4 = partition_chromosomes(lengths, 4)
    assert sum(groups4, []) == [0, 1, 2, 3, 4]


def test_partition_ranges_splits_inside_chromosomes():
    from fem_tpu.parallel.sharded_index import partition_ranges

    # One huge chromosome + small ones: ranges must split the big one.
    lengths = np.array([1000, 50, 50])
    shards = partition_ranges(lengths, 4)
    assert len(shards) == 4
    # Disjoint, in-order, covering.
    flat = [(sid, s, e) for pieces in shards for sid, s, e in pieces]
    covered = {sid: 0 for sid in range(3)}
    for sid, s, e in flat:
        assert s == covered[sid], "ranges must be contiguous per chromosome"
        covered[sid] = e
    assert covered == {0: 1000, 1: 50, 2: 50}
    assert len(shards[0]) == 1 and shards[0][0][0] == 0  # big chrom splits
    sizes = [sum(e - s for _, s, e in p) for p in shards]
    assert max(sizes) - min(sizes) <= 2  # balanced by bases, not chromosomes


def test_sharded_index_construction(small_reference, small_index):
    _, ref = small_reference
    halo = 4096
    sh = build_sharded_index(small_index, ref, 2, halo=halo)
    assert sh.lookup.shape[0] == 2
    # Local CSRs cover the global one; boundary halos duplicate a few
    # occurrences (<= 2*halo worth per cut), never lose any.
    total = sh.lookup[:, -1].astype(np.int64).sum()
    assert small_index.num_occurrences <= total
    assert total <= small_index.num_occurrences + 3 * 2 * halo
    # Every stored occurrence lies inside the shard's global-coordinate
    # window [cut_lo - halo, cut_hi + halo); every owned-range occurrence
    # is present.
    bounds = np.concatenate([[0], np.cumsum(ref.lengths)])
    genome = int(ref.lengths.sum())
    for s in range(2):
        pairs = sh.occ_rows[s].reshape(-1, 2)
        n = int(sh.lookup[s, -1])
        g = bounds[pairs[:n, 0].astype(np.int64)] + pairs[:n, 1].astype(np.int64)
        cut_lo = genome * s // 2 - halo
        cut_hi = genome * (s + 1) // 2 + halo
        assert ((g >= cut_lo) & (g < cut_hi)).all()
        # All occurrences of the owned window are present (count match).
        gall = (
            bounds[(small_index.occurrences >> np.uint64(32)).astype(np.int64)]
            + (small_index.occurrences & np.uint64(0xFFFFFFFF)).astype(np.int64)
        )
        expect = int(((gall >= cut_lo) & (gall < cut_hi)).sum())
        assert n == expect


@pytest.mark.parametrize("n_dp,n_ip", [(1, 2), (2, 2), (1, 4), (4, 2)])
def test_sharded_index_engine_matches_golden(
    small_reference, small_index, default_args, n_dp, n_ip
):
    if len(jax.devices()) < n_dp * n_ip:
        pytest.skip("not enough devices")
    seqs, ref = small_reference
    engine = MappingEngine(
        default_args,
        ref,
        small_index,
        EngineConfig(
            batch_size=32,
            cap_occ=256,
            cap_cand=128,
            verify_per_read=32,
            accept_per_read=16,
            index_mesh=_mesh2d(n_dp, n_ip),
        ),
    )
    golden = GoldenMapper(default_args, ref, small_index)
    reads = sim.simulate_reads(seqs, 32, read_length=100, max_errors=2, seed=51)
    # Include the planted cross-chromosome repeat (hits in BOTH shards).
    reads[0] = sim.SimulatedRead(
        b"rep", seqs[0][1][10_060:10_160], b"I" * 100, 0, 10_060, 0, 0
    )
    batch = _batch_from_reads(reads)
    recs, stats = engine.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert b"".join(recs) == b"".join(grecs)
    assert stats.num_reads == gstats.num_reads
    assert stats.num_mapped_reads == gstats.num_mapped_reads
    assert stats.num_candidates == gstats.num_candidates
    assert (
        stats.num_candidates_without_additional_qgram_filter
        == gstats.num_candidates_without_additional_qgram_filter
    )
    assert stats.num_mappings == gstats.num_mappings
    # The repeat read's records span chromosomes held by different shards.
    rep_lines = [r for r in b"".join(grecs).splitlines() if r.startswith(b"rep\t")]
    assert len({l.split(b"\t")[2] for l in rep_lines}) == 2


def test_split_boundary_reads_match_golden(small_reference, small_index, default_args):
    """Reads straddling a mid-chromosome shard cut: ownership must assign
    each candidate to exactly one shard and the halo must cover band
    verification across the cut (4 index shards over 2 chromosomes cut
    chr0 at 50k and chr1 at 50k)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    seqs, ref = small_reference
    engine = MappingEngine(
        default_args,
        ref,
        small_index,
        EngineConfig(
            batch_size=16, cap_occ=256, cap_cand=128,
            verify_per_read=32, accept_per_read=16,
            index_mesh=_mesh2d(1, 4),
        ),
    )
    golden = GoldenMapper(default_args, ref, small_index)
    reads = []
    for i, off in enumerate(range(-120, 120, 15)):
        pos = 50_000 + off
        reads.append(sim.SimulatedRead(
            b"cut%d" % i, seqs[i % 2][1][pos : pos + 100], b"I" * 100,
            i % 2, pos, 0, 0,
        ))
    batch = _batch_from_reads(reads)
    recs, stats = engine.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert b"".join(recs) == b"".join(grecs)
    assert stats.num_candidates == gstats.num_candidates
    assert stats.num_mappings == gstats.num_mappings
