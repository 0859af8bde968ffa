import gzip

import numpy as np

from fem_tpu.core import encoding
from fem_tpu.io import fastx, sam


def test_encode_table_matches_reference_semantics():
    assert encoding.encode("ACGT").tolist() == [0, 1, 2, 3]
    assert encoding.encode("acgt").tolist() == [0, 1, 2, 3]
    assert encoding.encode("NnXZ-").tolist() == [4, 4, 4, 4, 4]
    assert encoding.decode(np.array([0, 1, 2, 3, 4], dtype=np.uint8)) == "ACGTN"


def test_reverse_complement():
    codes = encoding.encode("AACGTN")
    rc = encoding.reverse_complement_codes(codes)
    assert encoding.decode(rc) == "NACGTT"


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    p.write_bytes(b">chr1 some comment\nACGT\nACGT\n>chr2\nGGGG\n")
    ref = fastx.read_fasta(str(p))
    assert ref.names == [b"chr1", b"chr2"]
    assert ref.seqs == [b"ACGTACGT", b"GGGG"]
    assert ref.lengths.tolist() == [8, 4]
    np.testing.assert_array_equal(ref.codes_of(0), encoding.encode("ACGTACGT"))
    np.testing.assert_array_equal(ref.codes_of(1), encoding.encode("GGGG"))
    # Gap sentinel bases separate chromosomes in the flat layout.
    assert (ref.flat_codes[: int(ref.offsets[0])] == 4).all()


def test_fastq_stream_and_gzip(tmp_path):
    raw = b"@r1 c1\nACGT\n+\nIIII\n@r2\nGGTT\n+anything\nFFFF\n"
    p = tmp_path / "x.fastq.gz"
    p.write_bytes(gzip.compress(raw))
    batches = list(fastx.stream_fastq_batches(str(p), batch_size=10))
    assert len(batches) == 1
    b = batches[0]
    assert b.names == [b"r1", b"r2"]
    assert b.seqs == [b"ACGT", b"GGTT"]
    assert b.quals == [b"IIII", b"FFFF"]
    assert b.lengths.tolist() == [4, 4]
    assert b.codes.shape[1] % 32 == 0


def test_fastq_batching(tmp_path):
    p = tmp_path / "many.fq"
    with open(p, "wb") as f:
        for i in range(25):
            f.write(b"@r%d\nACGTACGT\n+\nIIIIIIII\n" % i)
    sizes = [b.num_reads for b in fastx.stream_fastq_batches(str(p), batch_size=10)]
    assert sizes == [10, 10, 5]


def test_sam_header_and_record():
    hdr = sam.sam_header_text([b"chr1", b"chr2"], [100, 200])
    assert hdr == b"@SQ\tSN:chr1\tLN:100\n@SQ\tSN:chr2\tLN:200\n"
    rec = sam.format_record(
        qname=b"r1",
        flag=16,
        rname=b"chr1",
        pos0=9,
        cigar=b"4M",
        seq=b"acgt",
        qual=b"IIII",
        edit_distance=1,
        md=b"2A1",
        secondary=False,
    )
    assert rec == b"r1\t16\tchr1\t10\t255\t4M\t*\t0\t0\tACGT\tIIII\tNM:i:1\tMD:Z:2A1\n"
    sec = sam.format_record(
        qname=b"r1", flag=0, rname=b"chr1", pos0=0, cigar=b"4M",
        seq=b"ACGT", qual=b"IIII", edit_distance=0, md=b"4", secondary=True,
    )
    fields = sec.split(b"\t")
    assert fields[1] == b"256" and fields[9] == b"*" and fields[10] == b"*"


def test_seq_canonicalization_matches_nt16_roundtrip():
    # htslib nibble round trip: lowercase uppercased, odd chars -> N.
    assert sam.canonicalize_seq(b"acgtN") == b"ACGTN"
    assert sam.canonicalize_seq(b"ACGTRYKM") == b"ACGTRYKM"
    assert sam.canonicalize_seq(b"Q*!") == b"NNN"
