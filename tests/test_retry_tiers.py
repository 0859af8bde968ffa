"""Capacity-retry ladder: heavy-tail occurrence handling on device.

The reference's filter merges occurrence lists of any length
(src/filter.c:80-131); the device pipeline uses fixed-capacity slabs, so
reads whose selected seeds are satellite-frequency (10^2-10^5 occurrences)
must escalate through bigger-capacity tier programs — host fallback only
past the last tier — while staying byte/record-identical to the golden
oracle and keeping exact counters.
"""

import numpy as np
import pytest

from fem_tpu import sim
from fem_tpu.config import FemArgs
from fem_tpu.golden.model import GoldenMapper, MappingStats
from fem_tpu.index.build import build_index
from fem_tpu.io import fastx
from fem_tpu.pipeline.engine import EngineConfig, MappingEngine, TierConfig
from tests.test_engine import _batch_from_reads

# Small tiers keep CPU-test compiles fast while still exercising two
# escalation rungs before the host fallback.
TEST_TIERS = (
    TierConfig(batch_size=16, cap_occ=256, cap_cand=256,
               verify_per_read=64, accept_per_read=32),
    TierConfig(batch_size=8, cap_occ=2048, cap_cand=1024,
               verify_per_read=512, accept_per_read=128),
)


@pytest.fixture(scope="module")
def satellite_world(tmp_path_factory):
    seqs = sim.satellite_genome(
        300_000, num_seqs=1, seed=5, satellite_fraction=0.15,
        unit_range=(24, 120), copies_range=(48, 400),
    )
    path = tmp_path_factory.mktemp("sat") / "ref.fa"
    sim.write_fasta(str(path), seqs)
    ref = fastx.read_fasta(str(path))
    index = build_index(ref, kmer_size=12, step_size=3)
    args = FemArgs(error_threshold=3, num_additional_qgrams=1)
    return seqs, ref, index, args


def _mixed_reads(seqs, n, seed):
    """Reads drawn uniformly — ~satellite_fraction land inside arrays and
    overflow small tier-0 caps."""
    return sim.simulate_reads(seqs, n, read_length=100, max_errors=2, seed=seed)


def test_satellite_seed_frequencies_are_heavy_tailed(satellite_world):
    _, _, index, _ = satellite_world
    freq = np.diff(index.lookup.astype(np.int64))
    assert freq.max() >= 100, "generator must create satellite-frequency seeds"


def test_tier_escalation_byte_identical_sync(satellite_world):
    seqs, ref, index, args = satellite_world
    golden = GoldenMapper(args, ref, index)
    eng = MappingEngine(
        args, ref, index,
        EngineConfig(batch_size=32, cap_occ=32, cap_cand=32,
                     verify_per_read=4, accept_per_read=2, tiers=TEST_TIERS),
    )
    reads = _mixed_reads(seqs, 32, seed=91)
    batch = _batch_from_reads(reads)
    recs, stats = eng.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    # Sync path splices retried reads' records back in read order.
    assert b"".join(recs) == b"".join(grecs)
    assert stats.__dict__ == gstats.__dict__
    assert eng.retried_reads > 0, "workload must exercise the retry ladder"


def test_tier_escalation_stream_record_set(satellite_world):
    seqs, ref, index, args = satellite_world
    golden = GoldenMapper(args, ref, index)
    eng = MappingEngine(
        args, ref, index,
        EngineConfig(batch_size=16, cap_occ=32, cap_cand=32,
                     verify_per_read=4, accept_per_read=2, tiers=TEST_TIERS),
    )
    reads = _mixed_reads(seqs, 64, seed=92)
    batches = [_batch_from_reads(reads[i : i + 16]) for i in range(0, 64, 16)]
    total = MappingStats()
    lines = []
    for recs, stats in eng.map_stream(batches):
        total += stats
        for r in recs:
            lines.extend(r.splitlines())
    grecs, gstats = golden.map_reads(
        [r.name for r in reads], [r.seq for r in reads], [r.qual for r in reads]
    )
    glines = []
    for r in grecs:
        glines.extend(r.splitlines())
    assert sorted(lines) == sorted(glines)  # record-set equality (t>1 contract)
    assert total.__dict__ == gstats.__dict__
    assert eng.retried_reads > 0
    # Watermark: every batch fully emitted -> safe resume offset == total.
    assert eng.watermark_reads == 64


def test_no_tiers_routes_overflow_to_host(satellite_world):
    seqs, ref, index, args = satellite_world
    golden = GoldenMapper(args, ref, index)
    eng = MappingEngine(
        args, ref, index,
        EngineConfig(batch_size=16, cap_occ=32, cap_cand=32,
                     verify_per_read=4, accept_per_read=2, tiers=()),
    )
    reads = _mixed_reads(seqs, 16, seed=93)
    batch = _batch_from_reads(reads)
    recs, stats = eng.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert b"".join(recs) == b"".join(grecs)
    assert stats.__dict__ == gstats.__dict__
    assert eng.fallback_reads > 0


def test_last_tier_overflow_reaches_host(satellite_world):
    """A tier ladder whose top rung is still too small: the host mapper
    must finish the heaviest reads exactly."""
    seqs, ref, index, args = satellite_world
    golden = GoldenMapper(args, ref, index)
    tiers = (TierConfig(batch_size=8, cap_occ=64, cap_cand=64,
                        verify_per_read=16, accept_per_read=8),)
    eng = MappingEngine(
        args, ref, index,
        EngineConfig(batch_size=16, cap_occ=32, cap_cand=32,
                     verify_per_read=4, accept_per_read=2, tiers=tiers),
    )
    reads = _mixed_reads(seqs, 32, seed=94)
    batches = [_batch_from_reads(reads[i : i + 16]) for i in range(0, 32, 16)]
    total = MappingStats()
    lines = []
    for recs, stats in eng.map_stream(batches):
        total += stats
        for r in recs:
            lines.extend(r.splitlines())
    grecs, gstats = golden.map_reads(
        [r.name for r in reads], [r.seq for r in reads], [r.qual for r in reads]
    )
    glines = []
    for r in grecs:
        glines.extend(r.splitlines())
    assert sorted(lines) == sorted(glines)
    assert total.__dict__ == gstats.__dict__
    assert eng.fallback_reads > 0  # top tier overflowed into the host path
    assert eng.watermark_reads == 32
