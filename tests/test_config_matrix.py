"""Parameter-space sweep: engine == golden across e/a/k/step/read-length
configs (BASELINE.json configs 1-2 surface: e=7 with additional q-grams
stresses filter selectivity and the widest DP band)."""

import numpy as np
import pytest

from fem_tpu import sim
from fem_tpu.config import FemArgs
from fem_tpu.golden.model import GoldenMapper
from fem_tpu.index.build import build_index
from fem_tpu.io import fastx
from fem_tpu.pipeline.engine import EngineConfig, MappingEngine

from tests.test_engine import _batch_from_reads


def _world(tmp_path_factory, k, step, read_len, e):
    d = tmp_path_factory.mktemp("cfg")
    seqs = sim.random_genome(150_000, num_seqs=2, seed=23, repeat_fraction=0.2)
    p = d / "ref.fa"
    sim.write_fasta(str(p), seqs)
    ref = fastx.read_fasta(str(p))
    index = build_index(ref, k, step)
    reads = sim.simulate_reads(
        seqs, 48, read_length=read_len, max_errors=min(e, 3), seed=24
    )
    return seqs, ref, index, reads


@pytest.mark.parametrize(
    "k,step,e,a,read_len",
    [
        (12, 3, 7, 2, 100),  # max error threshold + max additional q-grams
        (12, 3, 0, 1, 100),  # zero errors
        (12, 3, 5, 0, 100),  # no additional q-grams
        (10, 5, 3, 1, 100),  # non-default k/step
        (12, 3, 2, 1, 148),  # longer reads (Lmax bucket 160)
        (12, 2, 4, 1, 76),  # short reads, step 2
    ],
)
def test_engine_matches_golden_config(tmp_path_factory, k, step, e, a, read_len):
    seqs, ref, index, reads = _world(tmp_path_factory, k, step, read_len, e)
    args = FemArgs(kmer_size=k, step_size=step, error_threshold=e,
                   num_additional_qgrams=a)
    golden = GoldenMapper(args, ref, index)
    engine = MappingEngine(
        args, ref, index,
        EngineConfig(batch_size=48, cap_occ=256, cap_cand=128,
                     verify_per_read=32, accept_per_read=16),
    )
    batch = _batch_from_reads(reads)
    recs, stats = engine.map_batch(batch)
    grecs, gstats = golden.map_reads(batch.names, batch.seqs, batch.quals)
    assert b"".join(recs) == b"".join(grecs)
    for f in ("num_reads", "num_mapped_reads", "num_candidates",
              "num_candidates_without_additional_qgram_filter", "num_mappings"):
        assert getattr(stats, f) == getattr(gstats, f), f
