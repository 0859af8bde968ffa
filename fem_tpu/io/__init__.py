from fem_tpu.io.fastx import FastxRecord, read_fasta, stream_fastq_batches
from fem_tpu.io.sam import SamWriter, sam_header_text

__all__ = [
    "FastxRecord",
    "read_fasta",
    "stream_fastq_batches",
    "SamWriter",
    "sam_header_text",
]
