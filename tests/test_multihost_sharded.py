"""Cross-host coordinate-sharded index execution (SURVEY.md §5.7-5.8).

Two jax.distributed processes, 4 virtual CPU devices each, mapping over a
global ('data', 'index') mesh whose INDEX axis crosses the host boundary
(fem_tpu/parallel/multihost.global_index_mesh interleaves processes along
each data row), so the filter's lexicographic pmax and the row-result
all_gather ride the inter-host link. The merged SAM record set and the
allreduced counters must equal a plain single-host run — the t>1
record-set contract (SURVEY.md §2.4).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from fem_tpu import sim
from fem_tpu.pipeline import cli
from tests.test_multihost import _counters, _records

_DRIVER = """\
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from fem_tpu.pipeline.cli import main
sys.exit(main(sys.argv[1:]))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mhs")
    # 4 chromosomes so the coordinate partition has shards to balance.
    seqs = sim.random_genome(240_000, num_seqs=4, seed=21, repeat_fraction=0.1)
    sim.write_fasta(str(d / "ref.fa"), seqs)
    reads = sim.simulate_reads(seqs, 256, read_length=100, max_errors=2, seed=22)
    sim.write_fastq(str(d / "reads.fq"), reads)
    assert cli.main(["index", "12", "3", str(d / "ref.fa"), str(d / "ref.index")]) == 0
    (d / "driver.py").write_text(_DRIVER)
    return d


def test_single_host_cli_index_shards(workdir, capsys):
    """CLI launches a host-local (data x index) sharded-index mesh."""
    d = workdir
    base = [
        "map", "-e", "2", "-a", "1",
        "--ref", str(d / "ref.fa"), "--index", str(d / "ref.index"),
        "--read1", str(d / "reads.fq"), "--batch-size", "64",
    ]
    assert cli.main(base + ["-o", str(d / "plain.sam")]) == 0
    plain_counters = _counters(capsys.readouterr().err)
    assert cli.main(base + ["-o", str(d / "shards2.sam"), "--index-shards", "2"]) == 0
    sharded_counters = _counters(capsys.readouterr().err)
    assert _records(str(d / "shards2.sam")) == _records(str(d / "plain.sam"))
    assert sharded_counters == plain_counters


def test_cross_host_index_shards(workdir, capsys):
    d = workdir
    base = [
        "map", "-e", "2", "-a", "1",
        "--ref", str(d / "ref.fa"), "--index", str(d / "ref.index"),
        "--read1", str(d / "reads.fq"), "--batch-size", "64",
    ]
    assert cli.main(base + ["-o", str(d / "single.sam")]) == 0
    single_counters = _counters(capsys.readouterr().err)

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(d / "driver.py"), *base,
                "-o", str(d / "xhost.sam"),
                "--num-hosts", "2", "--host-id", str(i),
                "--coordinator", f"localhost:{port}",
                "--index-shards", "2",
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (_, err) in zip(procs, outs):
        assert p.returncode == 0, err

    shard0 = str(d / "xhost.sam.host0000")
    shard1 = str(d / "xhost.sam.host0001")
    r0, r1 = _records(shard0), _records(shard1)
    assert r0 and r1, "both hosts must own data rows"
    assert r0 | r1 == _records(str(d / "single.sam"))
    assert not (r0 & r1), "row ownership must not duplicate records"
    assert _counters(outs[0][1]) == single_counters


def test_cross_host_retry_ladder(tmp_path):
    """Capacity-overflow reads on a cross-host (data x index) mesh ride
    the device retry-tier ladder (collective tier dispatches derived from
    the allgathered overflow bitmap), not the one-read host mapper: a
    satellite-repeat genome under deliberately tight tier-0 caps must show
    retried > 0 with record-set + counter parity against a single-host
    run. Match: the reference filter has no caps at any -t
    (src/filter.c:80-131)."""
    d = tmp_path
    seqs = sim.satellite_genome(
        120_000, num_seqs=2, seed=31, satellite_fraction=0.05
    )
    sim.write_fasta(str(d / "ref.fa"), seqs)
    reads = sim.simulate_reads(seqs, 192, read_length=100, max_errors=2, seed=32)
    sim.write_fastq(str(d / "reads.fq"), reads)
    assert cli.main(["index", "12", "3", str(d / "ref.fa"), str(d / "ref.index")]) == 0
    (d / "driver.py").write_text(_DRIVER)

    tight = [
        "--cap-occ", "16", "--cap-vote", "16", "--cap-cand", "8",
        "--verify-per-read", "2", "--accept-per-read", "2",
    ]
    base = [
        "map", "-e", "2", "-a", "1",
        "--ref", str(d / "ref.fa"), "--index", str(d / "ref.index"),
        "--read1", str(d / "reads.fq"), "--batch-size", "64",
    ]
    # Single-host reference output (default caps, no mesh).
    assert cli.main(base + ["-o", str(d / "single.sam")]) == 0

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(d / "driver.py"), *base, *tight,
                "-o", str(d / "xhost.sam"),
                "--stats-json", str(d / "stats.json"),
                "--num-hosts", "2", "--host-id", str(i),
                "--coordinator", f"localhost:{port}",
                "--index-shards", "2",
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (_, err) in zip(procs, outs):
        assert p.returncode == 0, err

    r0 = _records(str(d / "xhost.sam.host0000"))
    r1 = _records(str(d / "xhost.sam.host0001"))
    assert r0 | r1 == _records(str(d / "single.sam"))
    assert not (r0 & r1)
    retried = fallbacks = 0
    for i in range(2):
        with open(str(d / f"stats.json.host{i:04d}")) as f:
            st = json.load(f)
        retried += st["retried_reads"]
        fallbacks += st["fallback_reads"]
    assert retried > 0, "tight caps must exercise the device retry ladder"
    # The ladder, not the host mapper, must absorb capacity overflow.
    assert fallbacks <= len(reads) // 20
