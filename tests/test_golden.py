"""Validate the golden oracle itself against brute-force DP and simulated
reads with known ground truth (SURVEY.md §4 unit-level oracles)."""

import numpy as np
import pytest

from fem_tpu import sim
from fem_tpu.config import FemArgs
from fem_tpu.core.encoding import encode
from fem_tpu.golden.model import GoldenMapper, hash_all_seeds
from fem_tpu.index.build import build_index
from fem_tpu.io import fastx

INF = 10**9


def banded_brute_force(pattern, text, e):
    """O(L * (2e+1)) banded semi-global DP: pattern prefix free within the
    first band, answer = min cost over pattern prefixes [L, L+2e]."""
    L = len(text)
    W = 2 * e
    C = np.full((L + 1, L + W + 1), INF, dtype=np.int64)
    C[0, 0 : W + 1] = 0
    for i in range(1, L + 1):
        for j in range(i, min(i + W, L + W) + 1):
            best = C[i - 1, j - 1] + (1 if text[i - 1] != pattern[j - 1] else 0)
            if j - (i - 1) <= W:
                best = min(best, C[i - 1, j] + 1)
            if j - 1 >= i:
                best = min(best, C[i, j - 1] + 1)
            C[i, j] = best
    ends = C[L, L : L + W + 1]
    ed = int(ends.min())
    end_pos = L - 1 + int(ends.argmin())  # first attainment = smallest prefix
    return ed, end_pos


def make_mapper(ref_seq: bytes, args: FemArgs) -> GoldenMapper:
    ref = fastx.Reference(
        names=[b"c0"],
        seqs=[ref_seq],
        lengths=np.array([len(ref_seq)], dtype=np.int64),
        offsets=np.array([0], dtype=np.int64),
        flat_codes=encode(ref_seq),
    )
    idx = build_index(ref, args.kmer_size, args.step_size)
    return GoldenMapper(args, ref, idx)


@pytest.mark.parametrize("e", [0, 1, 2, 3, 5, 7])
def test_banded_myers_vs_bruteforce(e, rng):
    args = FemArgs(error_threshold=e, num_additional_qgrams=0)
    mapper = make_mapper(b"A" * 600, args)  # mapper only used for its method
    for trial in range(60):
        L = int(rng.integers(20, 64))
        pattern = rng.integers(0, 4, size=L + 2 * e).astype(np.uint8)
        # Make text a mutated copy of the central diagonal half the time.
        if trial % 2 == 0:
            text = pattern[e : e + L].copy()
            for _ in range(int(rng.integers(0, e + 2))):
                text[int(rng.integers(0, L))] = rng.integers(0, 4)
        else:
            text = rng.integers(0, 4, size=L).astype(np.uint8)
        ed, end = mapper.banded_edit_distance(pattern, text)
        bed, bend = banded_brute_force(pattern, text, e)
        if ed <= e:
            assert (ed, end) == (bed, bend)
        else:
            assert bed > e, f"golden rejected but brute ED={bed} <= e={e}"


def test_hash_all_seeds_ambiguity_counting():
    # Ambiguous bases count only at positions >= k (src/utils.h:101-117).
    k = 12
    codes = encode(b"N" * 5 + b"ACGT" * 10)
    _, amb = hash_all_seeds(codes, k)
    assert amb == 0  # all Ns inside the first window
    codes2 = encode(b"ACGT" * 10 + b"NN" + b"ACGT" * 2)
    _, amb2 = hash_all_seeds(codes2, k)
    assert amb2 == 2


class TestGoldenEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        seqs = sim.random_genome(150_000, num_seqs=2, seed=3)
        # Plant a repeat across chromosomes for all-mapping checks.
        n0, s0 = seqs[0]
        n1, s1 = seqs[1]
        s1 = s1[:30_000] + s0[5_000:5_400] + s1[30_400:]
        seqs = [(n0, s0), (n1, s1)]
        ref = fastx.Reference(
            names=[n0, n1],
            seqs=[s0, s1],
            lengths=np.array([len(s0), len(s1)], dtype=np.int64),
            offsets=np.array([0, 0], dtype=np.int64),
            flat_codes=np.zeros(0, dtype=np.uint8),
        )
        # Rebuild flat layout properly via read_fasta-equivalent path.
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "r.fa")
            sim.write_fasta(p, seqs)
            ref = fastx.read_fasta(p)
        args = FemArgs(error_threshold=2, num_additional_qgrams=1)
        idx = build_index(ref, args.kmer_size, args.step_size)
        return seqs, ref, GoldenMapper(args, ref, idx)

    def test_simulated_reads_recovered(self, setup):
        seqs, ref, mapper = setup
        reads = sim.simulate_reads(seqs, 60, read_length=100, max_errors=2, seed=11)
        n_checked = 0
        for r in reads:
            records, stats = mapper.map_read(r.name, r.seq, r.qual)
            assert stats.num_reads == 1
            if r.num_errors == 0:
                assert records, f"exact read {r.name} unmapped"
            if not records:
                continue
            n_checked += 1
            found = False
            for rec in records:
                f = rec.split(b"\t")
                rname, pos, flag = f[2], int(f[3]) - 1, int(f[1])
                nm = int(f[11].split(b":")[-1])
                assert nm <= 2
                if (
                    rname == seqs[r.sid][0]
                    and abs(pos - r.pos) <= 2
                    and (flag & 16 == (16 if r.strand else 0))
                ):
                    found = True
            assert found, f"{r.name}: true locus not among {len(records)} records"
        assert n_checked >= 50

    def test_all_mapping_reports_repeat_copies(self, setup):
        seqs, ref, mapper = setup
        # Read drawn from inside the planted repeat (chr0:5050..5150).
        read = seqs[0][1][5_050:5_150]
        records, stats = mapper.map_read(b"rep", read, b"I" * 100)
        positions = {(r.split(b"\t")[2], int(r.split(b"\t")[3]) - 1) for r in records}
        assert (seqs[0][0], 5_050) in positions
        assert (seqs[1][0], 30_050) in positions
        # Primary record carries SEQ; the rest are secondary with '*'.
        assert records[0].split(b"\t")[9] != b"*"
        for rec in records[1:]:
            f = rec.split(b"\t")
            assert int(f[1]) & 256 and f[9] == b"*"

    def test_sam_record_consistency(self, setup):
        """Realign each record: CIGAR spans must match, NM consistent with
        a char-level recount via MD."""
        seqs, ref, mapper = setup
        reads = sim.simulate_reads(seqs, 40, read_length=100, max_errors=2, seed=12)
        by_name = {(b"chr" in n and n) or n: s for n, s in seqs}
        for r in reads:
            records, _ = mapper.map_read(r.name, r.seq, r.qual)
            for rec in records:
                f = rec.split(b"\t")
                cigar = f[5]
                # Parse cigar
                ops = []
                num = 0
                for ch in cigar:
                    if 48 <= ch <= 57:
                        num = num * 10 + ch - 48
                    else:
                        ops.append((chr(ch), num))
                        num = 0
                read_span = sum(n for op, n in ops if op in "MI")
                ref_span = sum(n for op, n in ops if op in "MD")
                assert read_span == 100
                nm = int(f[11].split(b":")[-1])
                md = f[12].split(b"MD:Z:")[-1].strip()
                # MD ref-consumed length == ref_span
                md_len = 0
                i = 0
                while i < len(md):
                    if 48 <= md[i] <= 57:
                        j = i
                        while j < len(md) and 48 <= md[j] <= 57:
                            j += 1
                        md_len += int(md[i:j])
                        i = j
                    elif md[i : i + 1] == b"^":
                        i += 1
                        while i < len(md) and not (48 <= md[i] <= 57):
                            md_len += 1
                            i += 1
                    else:
                        md_len += 1
                        i += 1
                assert md_len == ref_span, (md, cigar)
                assert nm <= 2
