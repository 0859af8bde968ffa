"""Engine end-to-end: device pipeline output must be record-identical to
the golden oracle (the SURVEY.md §4 differential contract)."""

import numpy as np
import pytest

from fem_tpu import sim
from fem_tpu.golden.model import GoldenMapper, MappingStats
from fem_tpu.io.fastx import ReadBatch
from fem_tpu.pipeline.engine import EngineConfig, MappingEngine


def _batch_from_reads(reads):
    from fem_tpu.core.encoding import encode

    lengths = np.array([len(r.seq) for r in reads], np.int32)
    Lmax = max(128, -(-int(lengths.max()) // 32) * 32)
    codes = np.full((len(reads), Lmax), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = encode(r.seq)
    return ReadBatch(
        [r.name for r in reads],
        [r.seq for r in reads],
        [r.qual for r in reads],
        codes,
        lengths,
    )


@pytest.fixture(scope="module")
def engine_world(small_reference, small_index, default_args):
    seqs, ref = small_reference
    engine = MappingEngine(
        default_args,
        ref,
        small_index,
        EngineConfig(batch_size=64, cap_occ=256, cap_cand=128, verify_per_read=32),
    )
    golden = GoldenMapper(default_args, ref, small_index)
    return seqs, engine, golden


def test_engine_matches_golden_records_and_stats(engine_world):
    seqs, engine, golden = engine_world
    reads = sim.simulate_reads(seqs, 64, read_length=100, max_errors=2, seed=31)
    batch = _batch_from_reads(reads)
    recs, stats = engine.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert stats.num_reads == gstats.num_reads
    assert stats.num_mapped_reads == gstats.num_mapped_reads
    assert (
        stats.num_candidates_without_additional_qgram_filter
        == gstats.num_candidates_without_additional_qgram_filter
    )
    assert stats.num_candidates == gstats.num_candidates
    assert stats.num_mappings == gstats.num_mappings
    assert b"".join(recs) == b"".join(grecs)  # byte-identical SAM output


def test_engine_partial_batch_padding(engine_world):
    seqs, engine, golden = engine_world
    reads = sim.simulate_reads(seqs, 10, read_length=100, max_errors=1, seed=32)
    batch = _batch_from_reads(reads)
    recs, stats = engine.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert stats.num_reads == 10
    assert b"".join(recs) == b"".join(grecs)
    assert stats.num_mappings == gstats.num_mappings


def test_engine_mixed_lengths_and_ns(engine_world):
    seqs, engine, golden = engine_world
    base = sim.simulate_reads(seqs, 12, read_length=100, max_errors=2, seed=33)
    # Perturb: truncate some reads, inject Ns into others.
    muts = []
    for i, r in enumerate(base):
        s = r.seq
        if i % 4 == 0:
            s = s[:57]
        elif i % 4 == 1:
            s = s[:20] + b"N" + s[21:]
        elif i % 4 == 2:
            s = s[:20] + b"NNNN" + s[24:]  # > e ambiguous -> unmapped
        muts.append(
            sim.SimulatedRead(r.name, s, b"I" * len(s), r.sid, r.pos, r.strand, 0)
        )
    batch = _batch_from_reads(muts)
    recs, stats = engine.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert b"".join(recs) == b"".join(grecs)
    assert stats.num_candidates == gstats.num_candidates
    assert stats.num_mappings == gstats.num_mappings


def test_engine_repeat_read_all_mappings(engine_world):
    seqs, engine, golden = engine_world
    read = seqs[0][1][10_050:10_150]  # inside the planted repeat
    batch = _batch_from_reads(
        [sim.SimulatedRead(b"rep", read, b"I" * 100, 0, 10_050, 0, 0)]
    )
    recs, stats = engine.map_batch(batch)
    grecs, _ = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert b"".join(recs) == b"".join(grecs)
    assert b"".join(recs).count(b"\n") >= 2  # both repeat copies reported


def test_shadow_warm_stream_matches_golden(engine_world):
    """shadow_warm: the stream head is CPU-mapped while the device warms;
    records and counters stay exact and the switch-over loses nothing."""
    import time

    seqs, engine, golden = engine_world
    if engine._cpu_mapper is None:
        import pytest

        pytest.skip("native CPU mapper unavailable")
    reads = sim.simulate_reads(seqs, 256, read_length=100, max_errors=2,
                               seed=77)
    batches = [_batch_from_reads(reads[i : i + 64]) for i in range(0, 256, 64)]
    grecs, gstats = golden.map_reads(
        [r.name for r in reads], [r.seq for r in reads],
        [r.qual for r in reads],
    )

    # Force a slow warm so at least one batch takes the CPU path even on
    # fast CPU compiles (the warm thread gates on _fn_for).
    engine.shadow_reads = 0
    real_fn_for = engine._fn_for

    def slow_fn_for(*a, **k):
        time.sleep(1.0)
        return real_fn_for(*a, **k)

    engine._fn_for = slow_fn_for
    engine._on_tpu = True  # take the threaded warm path on the CPU backend
    try:
        recs = []
        total = MappingStats()
        for r, st in engine.map_stream(iter(batches), shadow_warm=True):
            recs.extend(r)
            total += st
    finally:
        engine._fn_for = real_fn_for
        engine._on_tpu = False
    assert engine.shadow_reads > 0, "no batch took the CPU shadow path"
    assert sorted(b"".join(recs).split(b"\n")) == sorted(
        b"".join(grecs).split(b"\n")
    )
    assert total.num_reads == gstats.num_reads
    assert total.num_mappings == gstats.num_mappings
    assert total.num_candidates == gstats.num_candidates
    assert engine.consumed_reads == 256
    assert engine.watermark_reads >= engine.shadow_reads
