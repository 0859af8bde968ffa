"""Device-side data structures.

TPU-first layout decisions:
  * 64-bit occurrence values (seqid << 32 | position, src/index.h) are split
    into two int32 planes — TPUs emulate int64, and two-key lexicographic
    `lax.sort` gives identical ordering to u64 comparison because in-chrom
    positions never approach 2^31.
  * The CSR lookup table stays a flat int32 HBM array; a frequency query is
    two gathers (src/index.h:22-28 semantics).
  * The reference genome is a single flat uint8 code array with >=
    (max read + 2*7) sentinel bases between chromosomes, so banded windows
    gathered near boundaries never alias a neighbor.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from fem_tpu.config import FemArgs
from fem_tpu.index.storage import FemIndex
from fem_tpu.io.fastx import Reference


class DeviceIndex(NamedTuple):
    lookup: jnp.ndarray  # (4^k + 1,) int32 CSR offsets
    occ_sid: jnp.ndarray  # (n,) int32 chromosome ids
    occ_pos: jnp.ndarray  # (n,) int32 in-chromosome positions
    ref_flat: jnp.ndarray  # (total,) uint8 flat genome codes with gaps
    ref_offsets: jnp.ndarray  # (num_seqs,) int32 offsets into ref_flat
    ref_lengths: jnp.ndarray  # (num_seqs,) int32 chromosome lengths
    num_occurrences: jnp.ndarray  # () int32


def device_index_from_host(index: FemIndex, reference: Reference) -> DeviceIndex:
    sid, pos = index.split_sid_pos()
    return DeviceIndex(
        lookup=jnp.asarray(index.lookup.astype(np.int32)),
        occ_sid=jnp.asarray(sid),
        occ_pos=jnp.asarray(pos),
        ref_flat=jnp.asarray(reference.flat_codes),
        ref_offsets=jnp.asarray(reference.offsets.astype(np.int32)),
        ref_lengths=jnp.asarray(reference.lengths.astype(np.int32)),
        num_occurrences=jnp.asarray(np.int32(index.num_occurrences)),
    )


@dataclasses.dataclass(frozen=True)
class FilterParams:
    """Static (trace-time) parameters of the jitted mapping program."""

    kmer_size: int
    step_size: int
    error_threshold: int
    num_additional_qgrams: int
    max_read_length: int  # Lmax: padded read length
    cap_occ: int = 512  # max gathered occurrences per (read, strand, group)
    cap_cand: int = 512  # max candidates carried per (read, strand)

    @classmethod
    def from_args(cls, args: FemArgs, max_read_length: int, **caps) -> "FilterParams":
        return cls(
            kmer_size=args.kmer_size,
            step_size=args.step_size,
            error_threshold=args.error_threshold,
            num_additional_qgrams=args.num_additional_qgrams,
            max_read_length=max_read_length,
            **caps,
        )

    @property
    def num_qgrams(self) -> int:
        return self.error_threshold + 1 + self.num_additional_qgrams

    @property
    def seed_span(self) -> int:
        return -(-self.kmer_size // self.step_size)

    @property
    def max_num_seeds(self) -> int:
        return self.max_read_length - self.kmer_size + 1

    @property
    def max_group_size(self) -> int:
        return -(-self.max_num_seeds // self.step_size)

    @property
    def max_dp_cols(self) -> int:
        """Upper bound on the q-gram DP column count over all lanes."""
        return max(self.max_group_size - self.num_qgrams * self.seed_span + 2, 2)


# Sentinel chromosome id marking invalid (sid, pos) slots; sorts after any
# real chromosome and never equals one, so windowed comparisons are inert.
SENTINEL_SID = np.int32(2**30)
