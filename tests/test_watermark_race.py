"""Stress the stream drain / retry-pool / watermark concurrency.

The mapping stream runs drains on executor threads up to pipeline_depth
batches ahead of the consumer, defers completion marks into ack closures
that only run after the consumer pulls the NEXT item, and resolves
capacity retries through a shared pool (engine.map_stream /
_drain_stream). The checkpoint contract (SURVEY.md §5.2/§5.4 aux) is:

    watermark_reads  <=  reads whose records the consumer has received

at EVERY yield point — a watermark that runs ahead of the consumer would
let a checkpoint taken right after a crash skip unwritten reads on
resume. These tests inject randomized delays into the drain path (so
executor threads race ahead and interleave adversarially with retries)
and assert the invariant at every step, plus record-set and counter
equality at the end. A regression in the deferred-ack protocol (e.g.
marking a batch drained at drain time instead of post-consume) makes the
invariant fail.
"""

import random
import time

import pytest

from fem_tpu import sim
from fem_tpu.config import FemArgs
from fem_tpu.golden.model import GoldenMapper, MappingStats
from fem_tpu.index.build import build_index
from fem_tpu.io import fastx
from fem_tpu.pipeline.engine import EngineConfig, MappingEngine, TierConfig
from tests.test_engine import _batch_from_reads

TIERS = (
    TierConfig(batch_size=16, cap_occ=256, cap_cand=256,
               verify_per_read=64, accept_per_read=32),
    TierConfig(batch_size=8, cap_occ=2048, cap_cand=1024,
               verify_per_read=512, accept_per_read=128),
)


@pytest.fixture(scope="module")
def race_world(tmp_path_factory):
    seqs = sim.satellite_genome(
        250_000, num_seqs=1, seed=17, satellite_fraction=0.15,
        unit_range=(24, 120), copies_range=(48, 400),
    )
    path = tmp_path_factory.mktemp("race") / "ref.fa"
    sim.write_fasta(str(path), seqs)
    ref = fastx.read_fasta(str(path))
    index = build_index(ref, kmer_size=12, step_size=3)
    args = FemArgs(error_threshold=3, num_additional_qgrams=1)
    reads = sim.simulate_reads(seqs, 96, read_length=100, max_errors=2, seed=18)
    golden = GoldenMapper(args, ref, index)
    glines = []
    for r in golden.map_reads(
        [r.name for r in reads], [r.seq for r in reads],
        [r.qual for r in reads],
    )[0]:
        glines.extend(r.splitlines())
    gstats = golden.map_reads(
        [r.name for r in reads], [r.seq for r in reads],
        [r.qual for r in reads],
    )[1]
    return ref, index, args, reads, sorted(glines), gstats


def _delayed_drains(engine, seed, max_delay_s=0.03):
    """Wrap the engine's stream drain with a randomized pre-delay so
    executor threads complete out of submission order."""
    rng = random.Random(seed)
    orig = engine._drain_stream

    def slow(pending):
        time.sleep(rng.random() * max_delay_s)
        return orig(pending)

    engine._drain_stream = slow


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_watermark_never_passes_consumer_under_racing_drains(race_world, seed):
    ref, index, args, reads, glines, gstats = race_world
    eng = MappingEngine(
        args, ref, index,
        EngineConfig(batch_size=16, cap_occ=32, cap_cand=32,
                     verify_per_read=4, accept_per_read=2, tiers=TIERS,
                     pipeline_depth=4),
    )
    _delayed_drains(eng, seed)
    batches = [_batch_from_reads(reads[i: i + 16]) for i in range(0, 96, 16)]
    rng = random.Random(1000 + seed)
    total = MappingStats()
    lines = []
    consumed_reads = 0
    for recs, stats in eng.map_stream(batches):
        consumed_reads += stats.num_reads
        # THE invariant: the safe-resume offset never counts reads whose
        # records the consumer has not yet received.
        assert eng.watermark_reads <= consumed_reads, (
            eng.watermark_reads, consumed_reads)
        for r in recs:
            lines.extend(r.splitlines())
        total += stats
        if rng.random() < 0.3:  # racy consumer: sometimes slow to pull
            time.sleep(rng.random() * 0.02)
    assert eng.retried_reads > 0, "workload must exercise the retry pool"
    assert sorted(lines) == glines
    assert total.__dict__ == gstats.__dict__
    # Drained + all retries resolved -> the full stream is checkpointable.
    assert eng.watermark_reads == 96


def test_native_mapper_concurrent_calls_are_exact(race_world):
    """The in-process C++ mapper keeps per-call scratch in its handle;
    concurrent calls must serialize (mapper.py lock) or they corrupt
    records AND counters — observed live as a 2-worker bench equality
    failure (one extra record, -3 mappings) before the lock existed.
    This hammer makes the corruption reproducible without the lock."""
    from concurrent.futures import ThreadPoolExecutor

    from fem_tpu.native.mapper import NativeCpuMapper, mapper_available

    if not mapper_available():
        pytest.skip("native mapper unavailable")
    ref, index, args, reads, glines, gstats = race_world
    m = NativeCpuMapper(args, ref, index)
    singles = [
        m.map_reads([r.name], [r.seq], [r.qual]) for r in reads
    ]
    with ThreadPoolExecutor(max_workers=8) as ex:
        for _ in range(3):  # repeated rounds raise collision probability
            results = list(
                ex.map(
                    lambda r: m.map_reads([r.name], [r.seq], [r.qual]), reads
                )
            )
            for (blob_s, st_s), (blob_c, st_c) in zip(singles, results):
                assert blob_s == blob_c
                assert (st_s == st_c).all()


def test_watermark_monotone_under_many_interleavings(race_world):
    """Tighter loop over more seeds with per-yield monotonicity: watermark
    must never decrease and never exceed the consumed-read count."""
    ref, index, args, reads, glines, gstats = race_world
    for seed in range(3, 8):
        eng = MappingEngine(
            args, ref, index,
            EngineConfig(batch_size=16, cap_occ=32, cap_cand=32,
                         verify_per_read=4, accept_per_read=2, tiers=TIERS,
                         pipeline_depth=3),
        )
        _delayed_drains(eng, seed, max_delay_s=0.01)
        batches = [
            _batch_from_reads(reads[i: i + 16]) for i in range(0, 96, 16)
        ]
        consumed = 0
        last_wm = 0
        for recs, stats in eng.map_stream(batches):
            consumed += stats.num_reads
            wm = eng.watermark_reads
            assert last_wm <= wm <= consumed, (last_wm, wm, consumed)
            last_wm = wm
        assert eng.watermark_reads == 96
