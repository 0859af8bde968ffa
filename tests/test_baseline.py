"""Standalone C++ baseline mapper: byte-identical index + SAM + counters
vs the golden oracle (this binary is both the measured CPU baseline and a
fast large-scale differential oracle)."""

import os
import subprocess

import pytest

from fem_tpu import sim
from fem_tpu.config import FemArgs
from fem_tpu.golden.model import GoldenMapper, MappingStats
from fem_tpu.index.build import build_index
from fem_tpu.index.storage import save_index
from fem_tpu.io.fastx import read_fasta, stream_fastq_batches
from fem_tpu.io.sam import sam_header_text

try:
    from fem_tpu.native.build import build_baseline

    BIN = build_baseline()
except Exception:  # pragma: no cover
    BIN = None

pytestmark = pytest.mark.skipif(BIN is None, reason="baseline build failed")


@pytest.mark.parametrize("e,a", [(2, 1), (5, 0), (7, 2), (1, 0)])
def test_baseline_matches_golden(tmp_path, e, a):
    seqs = sim.random_genome(120_000, num_seqs=2, seed=13, n_fraction=0.0003)
    fa = tmp_path / "ref.fa"
    fq = tmp_path / "reads.fq"
    sim.write_fasta(str(fa), seqs)
    reads = sim.simulate_reads(seqs, 150, read_length=100, max_errors=min(e, 3), seed=14)
    sim.write_fastq(str(fq), reads)
    ref = read_fasta(str(fa))
    index = build_index(ref, 12, 3)
    ix = tmp_path / "py.index"
    save_index(index, str(ix))

    # Index built by the binary must be byte-identical.
    cx = tmp_path / "cpp.index"
    subprocess.run([BIN, "index", "12", "3", str(fa), str(cx)], check=True,
                   capture_output=True)
    assert ix.read_bytes() == cx.read_bytes()

    sam = tmp_path / "cpp.sam"
    r = subprocess.run(
        [BIN, "map", "-e", str(e), "-a", str(a), "--ref", str(fa),
         "--index", str(cx), "--read1", str(fq), "-o", str(sam)],
        check=True, capture_output=True, text=True)

    args = FemArgs(error_threshold=e, num_additional_qgrams=a)
    golden = GoldenMapper(args, ref, index)
    chunks = [sam_header_text(ref.names, ref.lengths.tolist())]
    total = MappingStats()
    for b in stream_fastq_batches(str(fq), batch_size=64):
        rr, st = golden.map_reads(b.names, b.seqs, b.quals)
        chunks.extend(rr)
        total += st
    assert sam.read_bytes() == b"".join(chunks)
    # Counter equality from the binary's stderr (src/FEM_map.c:214-218).
    lines = {
        l.split(": ")[0]: int(l.split(": ")[1])
        for l in r.stderr.strip().splitlines()
        if ": " in l
    }
    assert lines["The number of read"] == total.num_reads
    assert lines["The number of mapped read"] == total.num_mapped_reads
    assert (
        lines["The number of candidate before additional q-gram filter"]
        == total.num_candidates_without_additional_qgram_filter
    )
    assert lines["The number of candidate"] == total.num_candidates
    assert lines["The number of mapping"] == total.num_mappings
