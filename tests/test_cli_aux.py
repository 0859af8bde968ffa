"""Aux subsystems via the CLI: stats JSON, checkpoint/resume."""

import json

from fem_tpu import sim
from fem_tpu.pipeline import cli


def test_stats_json_and_checkpoint_resume(tmp_path):
    seqs = sim.random_genome(120_000, num_seqs=1, seed=15)
    sim.write_fasta(str(tmp_path / "ref.fa"), seqs)
    reads = sim.simulate_reads(seqs, 90, read_length=100, max_errors=1, seed=16)
    sim.write_fastq(str(tmp_path / "reads.fq"), reads)
    assert cli.main(["index", "12", "3", str(tmp_path / "ref.fa"),
                     str(tmp_path / "ref.index")]) == 0
    base = ["map", "-e", "1", "-a", "1",
            "--ref", str(tmp_path / "ref.fa"),
            "--index", str(tmp_path / "ref.index"),
            "--read1", str(tmp_path / "reads.fq"),
            "--batch-size", "30"]

    # Full run with stats JSON.
    assert cli.main(base + ["-o", str(tmp_path / "full.sam"),
                            "--stats-json", str(tmp_path / "stats.json")]) == 0
    stats = json.loads((tmp_path / "stats.json").read_text())
    assert stats["mapping_stats"]["num_reads"] == 90
    assert stats["reads"] == 90
    assert stats["reads_per_s"] > 0

    # Simulate an interrupted run: checkpoint after 60 reads, then resume.
    ckpt = tmp_path / "progress"
    ckpt.write_text("60")
    # Pre-populate the partial SAM with the first 60 reads' output.
    full = (tmp_path / "full.sam").read_bytes()
    # run reads 0..59 only, with its own output
    import fem_tpu.io.fastx as fastx

    sim.write_fastq(str(tmp_path / "first60.fq"), reads[:60])
    assert cli.main(base[:-2] + ["--batch-size", "30",
                                 "--read1", str(tmp_path / "first60.fq"),
                                 "-o", str(tmp_path / "resume.sam")]) == 0
    assert cli.main(base + ["-o", str(tmp_path / "resume.sam"),
                            "--checkpoint", str(ckpt)]) == 0
    assert (tmp_path / "resume.sam").read_bytes() == full
    hist = [line.split() for line in ckpt.read_text().splitlines()]
    assert hist[-1][0] == "90"
    # New format pairs each read offset with the flushed output byte
    # offset (transactional resume: truncate + skip).
    assert int(hist[-1][1]) == len(full)


def test_checkpoint_truncates_crash_tail(tmp_path):
    """Records written after the last checkpoint (the crash window) must
    not duplicate on resume: resume truncates to the checkpointed byte
    offset before re-mapping."""
    seqs = sim.random_genome(120_000, num_seqs=1, seed=15)
    sim.write_fasta(str(tmp_path / "ref.fa"), seqs)
    reads = sim.simulate_reads(seqs, 90, read_length=100, max_errors=1, seed=16)
    sim.write_fastq(str(tmp_path / "reads.fq"), reads)
    assert cli.main(["index", "12", "3", str(tmp_path / "ref.fa"),
                     str(tmp_path / "ref.index")]) == 0
    base = ["map", "-e", "1", "-a", "1",
            "--ref", str(tmp_path / "ref.fa"),
            "--index", str(tmp_path / "ref.index"),
            "--read1", str(tmp_path / "reads.fq"),
            "--batch-size", "30"]
    ckpt = tmp_path / "progress"
    assert cli.main(base + ["-o", str(tmp_path / "full.sam"),
                            "--checkpoint", str(ckpt)]) == 0
    full = (tmp_path / "full.sam").read_bytes()

    # Simulate a crash after the 30-read checkpoint with a partial batch
    # flushed beyond it: keep the checkpoint history at 30 reads, write
    # garbage after its byte offset.
    hist = [line.split() for line in ckpt.read_text().splitlines()]
    reads30, bytes30 = int(hist[0][0]), int(hist[0][1])
    assert reads30 == 30
    ckpt.write_text(f"{reads30} {bytes30}\n")
    with open(tmp_path / "crash.sam", "wb") as f:
        f.write(full[:bytes30])
        f.write(b"read999\tGARBAGE-PARTIAL-RECORD")
    assert cli.main(base + ["-o", str(tmp_path / "crash.sam"),
                            "--checkpoint", str(ckpt)]) == 0
    assert (tmp_path / "crash.sam").read_bytes() == full
