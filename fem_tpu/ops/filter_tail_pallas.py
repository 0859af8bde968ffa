"""Pallas TPU kernel for the candidate filter's tail: sort + pigeonhole
vote + greedy dedup fold, entirely in VMEM.

Reference semantics (src/filter.c:80-144): per (read, strand) and seed
group, the merged diagonal positions are scanned in (sid, pos) order, the
additional-q-gram vote keeps a position only when the a-th successor lies
within `e` (src/filter.c:118-131), and groups fold left-to-right through
the greedy +-e dedup that can evict earlier winners
(src/filter.c:45-78,210-212).

The XLA formulation of this chain (ops/candidates.py) materializes every
intermediate slab in HBM: an r3 stage bisection at the bench shape
(B=8192, e=5) measured the compaction scatter at ~43 ms, the vote-slab
sort at ~11 ms and the dedup fold at ~5 ms per batch — ~35% of the whole
program, all of it HBM-bandwidth on slabs whose live fraction is ~17%.
Here the whole chain runs on-chip: one grid step holds 128 read-strand
lanes on the vector lane axis and the occurrence slots on the sublane
axis, sorts with a bitonic network whose exchanges are static
slice+concat rotations (pure vreg shuffles), votes with a sublane shift,
and walks the greedy dedup as an unrolled row scan. HBM traffic is one
read of the (G, CAP, NB) slabs and one write of the (CC, NB) candidate
lists — no intermediates.

A second win: the un-compacted slab (width cap_occ) fits the kernel
whole, so the separate compacted vote slab (cap_vote) and its overflow
retries disappear on this path — only cap_occ and cap_cand bound tier 0.

Parity with the XLA path is exact for every non-overflowing read: the
sorted (sid, diag) sequence, the vote, the fold order and the kept set
are identical (tests/test_filter_kernel.py checks both paths element-wise
on adversarial inputs in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_tpu.ops.types import SENTINEL_SID

_LANES = 128
_BIG = np.int32(2**30)


def _sort2(s: jnp.ndarray, d: jnp.ndarray):
    """Bitonic sort of (N, 128) arrays along axis 0 by (s, d) ascending.
    N must be a power of two. Exchanges use static slice+concat rotations
    (lane i's partner i^j sits at roll(+-j)), so Mosaic lowers them to
    register shuffles; equal keys never swap (payload-free use only)."""
    n = s.shape[0]
    assert n & (n - 1) == 0, n
    iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)

    def rot(x, j):  # roll(x, -j, axis=0) via static slices
        return jnp.concatenate([x[j:], x[:j]], axis=0)

    def rot_up(x, j):
        return jnp.concatenate([x[n - j :], x[: n - j]], axis=0)

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            up = (iota & j) == 0
            ps = jnp.where(up, rot(s, j), rot_up(s, j))
            pd = jnp.where(up, rot(d, j), rot_up(d, j))
            asc = (iota & k) == 0
            gt = (s > ps) | ((s == ps) & (d > pd))
            lt = (s < ps) | ((s == ps) & (d < pd))
            # keep own unless the directed comparison orders partner first;
            # pure i1 logic (Mosaic rejects vector select on i1 operands).
            same = asc == up
            keep = ~((same & gt) | (~same & lt))
            s = jnp.where(keep, s, ps)
            d = jnp.where(keep, d, pd)
            j //= 2
        k *= 2
    return s, d


def _filter_tail_kernel(
    sid_ref,  # (CAP, 128) int32 block of (G, CAP, NB); invalid = SENTINEL
    diag_ref,  # (CAP, 128) int32; invalid = _BIG
    cand_sid_ref,  # (CC, 128) int32 out (per-lane candidate list, ascending)
    cand_pos_ref,  # (CC, 128) int32 out
    flags_ref,  # (8, 128) int32 out; row 0 = overflow_cand
    ksid_ref,  # (SLAB, 128) int32 VMEM scratch (dedup keep buffer)
    kpos_ref,  # (SLAB, 128) int32 VMEM scratch
    *,
    cap: int,
    cc: int,
    e: int,
    a: int,
    slab: int,
):
    g = pl.program_id(1)
    n_groups = pl.num_programs(1)

    @pl.when(g == 0)
    def _init():
        cand_sid_ref[:] = jnp.full((cc, _LANES), SENTINEL_SID, jnp.int32)
        cand_pos_ref[:] = jnp.full((cc, _LANES), _BIG, jnp.int32)
        flags_ref[:] = jnp.zeros((8, _LANES), jnp.int32)

    pad = slab - cap
    s = jnp.concatenate(
        [sid_ref[:], jnp.full((pad, _LANES), SENTINEL_SID, jnp.int32)], axis=0
    )
    d = jnp.concatenate(
        [diag_ref[:], jnp.full((pad, _LANES), _BIG, jnp.int32)], axis=0
    )
    s, d = _sort2(s, d)  # compaction + order in one pass

    if a > 0:
        # Pigeonhole vote (src/filter.c:118-131): keep position i only if
        # the a-th successor in the same chromosome lies within e.
        vs = jnp.concatenate(
            [s[a:], jnp.full((a, _LANES), SENTINEL_SID, jnp.int32)], axis=0
        )
        vd = jnp.concatenate([d[a:], jnp.full((a, _LANES), _BIG, jnp.int32)], axis=0)
        voted = (s != SENTINEL_SID) & (vs == s) & (vd <= d + e)
        s = jnp.where(voted, s, SENTINEL_SID)
        d = jnp.where(voted, d, _BIG)

    # Merge the carried candidate list with this group's survivors
    # (src/filter.c:45-78): sort, then the greedy +-e scan in merged order
    # — an eviction-capable re-scan of earlier winners, exactly the
    # reference's fold.
    fill = slab - cc - cap  # 0 when cc+cap is already a power of two
    m_s_parts = [cand_sid_ref[:], s[:cap]]
    m_d_parts = [cand_pos_ref[:], d[:cap]]
    if fill:  # Mosaic rejects zero-size concat operands
        m_s_parts.append(jnp.full((fill, _LANES), SENTINEL_SID, jnp.int32))
        m_d_parts.append(jnp.full((fill, _LANES), _BIG, jnp.int32))
    m_s = jnp.concatenate(m_s_parts, axis=0)
    m_d = jnp.concatenate(m_d_parts, axis=0)
    m_s, m_d = _sort2(m_s, m_d)

    last_s = jnp.full((_LANES,), -1, jnp.int32)
    last_d = jnp.zeros((_LANES,), jnp.int32)
    n_keep = jnp.zeros((_LANES,), jnp.int32)
    for i in range(cc + cap):  # rows beyond cc+cap are pad, always invalid
        si = m_s[i]
        di = m_d[i]
        keep = (si != SENTINEL_SID) & (
            (si > last_s) | ((si == last_s) & (di > last_d + e))
        )
        last_s = jnp.where(keep, si, last_s)
        last_d = jnp.where(keep, di, last_d)
        n_keep = n_keep + keep.astype(jnp.int32)
        ksid_ref[i, :] = jnp.where(keep, si, SENTINEL_SID)
        kpos_ref[i, :] = jnp.where(keep, di, _BIG)

    if slab > cc + cap:

        @pl.when(g == 0)
        def _pad_scratch():  # rows past cc+cap never written by the scan
            ksid_ref[cc + cap :, :] = jnp.full(
                (slab - cc - cap, _LANES), SENTINEL_SID, jnp.int32
            )
            kpos_ref[cc + cap :, :] = jnp.full(
                (slab - cc - cap, _LANES), _BIG, jnp.int32
            )

    k_s, k_d = _sort2(ksid_ref[:], kpos_ref[:])  # compact keeps to the top
    cand_sid_ref[:] = k_s[:cc]
    cand_pos_ref[:] = k_d[:cc]
    flags_ref[0, :] = flags_ref[0, :] | (n_keep > cc).astype(jnp.int32)
    del n_groups


def filter_tail_pallas(
    sid: jnp.ndarray,  # (NB, G, CAP) int32, invalid slots = SENTINEL_SID
    diag: jnp.ndarray,  # (NB, G, CAP) int32, invalid slots = _BIG
    cap_cand: int,
    error_threshold: int,
    num_additional_qgrams: int,
    interpret: bool | None = None,
):
    """Returns (cand_sid (NB, CC), cand_pos (NB, CC), overflow_cand (NB,))
    — the candidate lists after vote + greedy dedup fold, ascending, with
    invalid slots at SENTINEL_SID/_BIG (identical to the XLA path)."""
    if interpret is None:  # run interpreted off-TPU (unit tests)
        interpret = jax.devices()[0].platform != "tpu"
    NB, G, CAP = sid.shape
    CC = cap_cand
    slab = 1 << (CC + CAP - 1).bit_length()  # pow2 >= CC + CAP
    nbp = -(-NB // _LANES) * _LANES
    # (NB, G, CAP) -> (G, CAP, NBp): lanes on the vector axis, slots on
    # sublanes. Pad lanes with sentinel-only columns.
    sid_t = jnp.transpose(sid, (1, 2, 0))
    diag_t = jnp.transpose(diag, (1, 2, 0))
    if nbp != NB:
        sid_t = jnp.pad(sid_t, ((0, 0), (0, 0), (0, nbp - NB)),
                        constant_values=SENTINEL_SID)
        diag_t = jnp.pad(diag_t, ((0, 0), (0, 0), (0, nbp - NB)),
                         constant_values=_BIG)

    kernel = functools.partial(
        _filter_tail_kernel,
        cap=CAP,
        cc=CC,
        e=error_threshold,
        a=num_additional_qgrams,
        slab=slab,
    )
    grid = (nbp // _LANES, G)
    cand_sid, cand_pos, flags = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, CAP, _LANES), lambda t, g: (g, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, CAP, _LANES), lambda t, g: (g, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CC, _LANES), lambda t, g: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CC, _LANES), lambda t, g: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda t, g: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((CC, nbp), jnp.int32),
            jax.ShapeDtypeStruct((CC, nbp), jnp.int32),
            jax.ShapeDtypeStruct((8, nbp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab, _LANES), jnp.int32),
            pltpu.VMEM((slab, _LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sid_t, diag_t)
    return (
        cand_sid[:, :NB].T,
        cand_pos[:, :NB].T,
        flags[0, :NB] > 0,
    )
