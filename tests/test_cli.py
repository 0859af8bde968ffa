"""CLI surface: fem index / fem map end-to-end (reference src/FEM.c flags)."""

import numpy as np
import pytest

from fem_tpu import sim
from fem_tpu.pipeline import cli


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    seqs = sim.random_genome(120_000, num_seqs=2, seed=5)
    sim.write_fasta(str(d / "ref.fa"), seqs)
    reads = sim.simulate_reads(seqs, 120, read_length=100, max_errors=2, seed=6)
    sim.write_fastq(str(d / "reads.fq"), reads)
    return d


def test_cli_index_and_map_device_vs_golden(workdir, capsys):
    d = workdir
    assert cli.main(["index", "12", "3", str(d / "ref.fa"), str(d / "ref.index")]) == 0
    base = ["map", "-e", "2", "-a", "1",
            "--ref", str(d / "ref.fa"), "--index", str(d / "ref.index"),
            "--read1", str(d / "reads.fq")]
    assert cli.main(base + ["-o", str(d / "dev.sam"), "--batch-size", "64"]) == 0
    assert cli.main(base + ["-o", str(d / "gold.sam"), "--engine", "golden"]) == 0
    dev = (d / "dev.sam").read_bytes()
    gold = (d / "gold.sam").read_bytes()
    assert dev == gold
    assert dev.startswith(b"@SQ\t")
    err = capsys.readouterr().err
    assert "The number of read: 120" in err
    assert "The number of mapping:" in err


def test_cli_rejects_bad_args(workdir):
    d = workdir
    assert cli.main(["map", "-e", "9", "--ref", "x", "--index", "y",
                     "--read1", "z", "-o", "w"]) == 1
    assert cli.main(["map", "-e", "2", "-a", "5", "--ref", "x", "--index", "y",
                     "--read1", "z", "-o", "w"]) == 1
    assert cli.main(["map", "-e", "2", "-f", "x", "--ref", "x", "--index", "y",
                     "--read1", "z", "-o", "w"]) == 1
    assert cli.main(["bogus"]) == 1


def test_cli_accepts_v_seeding_flag(workdir):
    # The reference accepts -f v but still runs group seeding (its 'v'
    # branch is empty); output must equal the -f g run.
    d = workdir
    base = ["map", "-e", "1", "--ref", str(d / "ref.fa"),
            "--index", str(d / "ref.index"), "--read1", str(d / "reads.fq"),
            "--engine", "golden", "--batch-size", "60"]
    assert cli.main(base + ["-f", "v", "-o", str(d / "v.sam")]) == 0
    assert cli.main(base + ["-f", "g", "-o", str(d / "g.sam")]) == 0
    assert (d / "v.sam").read_bytes() == (d / "g.sam").read_bytes()
