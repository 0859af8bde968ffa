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


def test_sharded_index_construction(small_reference, small_index):
    _, ref = small_reference
    sh = build_sharded_index(small_index, ref, 2)
    assert sh.lookup.shape[0] == 2
    # Local CSRs partition the global one.
    total = sh.lookup[:, -1].astype(np.int64).sum()
    assert total == small_index.num_occurrences
    # Every occurrence lands in the shard owning its chromosome.
    for s in range(2):
        pairs = sh.occ_rows[s].reshape(-1, 2)
        n = int(sh.lookup[s, -1])
        sids = pairs[: n // 1][:, 0]  # first n pairs are real (pad zeros after)
        sids = pairs[:n, 0]
        assert (sh.shard_of_sid[sids.astype(np.int64)] == s).all()


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
