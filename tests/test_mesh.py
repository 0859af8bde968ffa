"""Multi-chip (virtual 8-device CPU mesh) data parallelism: the sharded
engine must produce byte-identical records to golden regardless of mesh
shape (SURVEY.md §4: 1 chip == N chips record-set equality)."""

import jax
import numpy as np
import pytest

from fem_tpu import sim
from fem_tpu.golden.model import GoldenMapper
from fem_tpu.parallel.mesh import make_mesh
from fem_tpu.pipeline.engine import EngineConfig, MappingEngine

from tests.test_engine import _batch_from_reads


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_engine_matches_golden(
    small_reference, small_index, default_args, n_devices
):
    if len(jax.devices()) < n_devices:
        pytest.skip(f"needs {n_devices} devices")
    seqs, ref = small_reference
    mesh = make_mesh(jax.devices()[:n_devices])
    engine = MappingEngine(
        default_args,
        ref,
        small_index,
        EngineConfig(
            batch_size=64, cap_occ=256, cap_cand=128, verify_per_read=32, mesh=mesh
        ),
    )
    golden = GoldenMapper(default_args, ref, small_index)
    reads = sim.simulate_reads(seqs, 64, read_length=100, max_errors=2, seed=41)
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
