"""Pallas TPU kernel for batched banded Myers verification.

The flagship compute kernel (SURVEY.md §7 step 5): the reference verifies 8
candidates per SSE vector with 16-bit lanes (src/align.c:149-277,
NUM_VPU_LANES=8 at src/align.h:11). Here every VPU lane of a (8, 128) vreg
tile carries one (read, candidate) band DP — 1024 concurrent alignments per
grid step, uint32 bitvector band (2e+1 <= 15 bits).

Layout: candidate-major arrays are reshaped to (rows, 128) and the
sequence dimension is moved leading, so each fori_loop step reads one
(8, 128) slab of reference window / text codes from VMEM. The per-step
match bitvector Eq is built with 2e+1 shifted compares (replacing the
reference's incrementally-shifted Peq register file, src/align.c:176-229),
then the 12-op Myers recurrence runs entirely in registers. No HBM traffic
inside the loop: one kernel invocation streams window+text blocks in via
the grid pipeline and writes two (8, 128) int32 results.

The 3e early-exit (src/align.c:247-252) is intentionally dropped — it can
only reject candidates the full run also rejects, and lane-divergent exits
buy nothing on a vector unit this wide unless the entire tile is dead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_tpu.ops.types import DeviceIndex
from fem_tpu.ops.verify import VerifyResult, gather_windows

_TILE_ROWS = 8
_LANES = 128


def _myers_kernel(
    win_ref,  # (L + 2e, 8, 128) uint8
    text_ref,  # (L, 8, 128) uint8
    len_ref,  # (8, 128) int32
    ed_ref,  # (8, 128) int32 out
    end_ref,  # (8, 128) int32 out
    *,
    read_length: int,
    error_threshold: int,
):
    e = error_threshold
    lengths = len_ref[:]

    def step(i, carry):
        VP, VN, nerr = carry
        t = text_ref[i]
        eq = jnp.zeros_like(VP)
        for j in range(2 * e + 1):
            eq = eq | ((win_ref[i + j] == t).astype(jnp.uint32) << j)
        X = eq | VN
        D0 = (((VP + (X & VP)) ^ VP) | X).astype(jnp.uint32)
        HN = VP & D0
        HP = VN | ~(VP | D0)
        X2 = D0 >> 1
        VN_n = X2 & HP
        VP_n = HN | ~(X2 | HP)
        nerr_n = nerr + (1 - (D0 & 1)).astype(jnp.int32)
        active = i < lengths
        return (
            jnp.where(active, VP_n, VP),
            jnp.where(active, VN_n, VN),
            jnp.where(active, nerr_n, nerr),
        )

    zero = jnp.zeros((_TILE_ROWS, _LANES), jnp.uint32)
    VP, VN, nerr = jax.lax.fori_loop(
        0, read_length, step, (zero, zero, jnp.zeros((_TILE_ROWS, _LANES), jnp.int32))
    )

    # Final band scan (src/align.c:135-146,257-275): first strict
    # improvement of the running minimum fixes the end position.
    end = lengths - 1
    min_err = nerr
    for i in range(2 * e):
        nerr = nerr + ((VP >> i) & 1).astype(jnp.int32)
        nerr = nerr - ((VN >> i) & 1).astype(jnp.int32)
        improve = nerr < min_err
        end = jnp.where(improve, lengths - 1 + 1 + i, end)
        min_err = jnp.minimum(min_err, nerr)
    ed_ref[:] = min_err
    end_ref[:] = end


def banded_myers_pallas(
    window: jnp.ndarray,  # (V, L + 2e) uint8
    text: jnp.ndarray,  # (V, L) uint8
    lengths: jnp.ndarray,  # (V,) int32
    error_threshold: int,
    interpret: bool = False,
) -> VerifyResult:
    V, L = text.shape
    e = error_threshold
    tile = _TILE_ROWS * _LANES
    rows = -(-V // tile) * _TILE_ROWS
    pad = rows * _LANES - V

    def to_tiles(x, fill):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)
        # (Vp, ...) -> (..., rows, 128) with sequence dim leading.
        if x.ndim == 2:
            return x.T.reshape(x.shape[1], rows, _LANES)
        return x.reshape(rows, _LANES)

    # Codes widen to int32: Mosaic lacks sub-word vector compares, and i32
    # slabs keep every kernel op on natively supported lanes.
    win_t = to_tiles(window.astype(jnp.int32), 4)
    text_t = to_tiles(text.astype(jnp.int32), 4)
    len_t = to_tiles(lengths.astype(jnp.int32), 0)

    grid = (rows // _TILE_ROWS,)
    kernel = functools.partial(
        _myers_kernel, read_length=L, error_threshold=e
    )
    ed, end = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (L + 2 * e, _TILE_ROWS, _LANES),
                lambda r: (0, r, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (L, _TILE_ROWS, _LANES), lambda r: (0, r, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_TILE_ROWS, _LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (_TILE_ROWS, _LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_TILE_ROWS, _LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=V * L * (14 + 2 * e),
            bytes_accessed=window.size + text.size + 8 * V,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win_t, text_t, len_t)
    ed = ed.reshape(-1)[:V]
    end = end.reshape(-1)[:V]
    return VerifyResult(ed, end, ed <= e)


def verify_candidates_pallas(
    index: DeviceIndex,
    sid: jnp.ndarray,
    pos: jnp.ndarray,
    text: jnp.ndarray,
    lengths: jnp.ndarray,
    error_threshold: int,
    interpret: bool = False,
) -> VerifyResult:
    Lmax = text.shape[1]
    window = gather_windows(index, sid, pos, Lmax + 2 * error_threshold)
    return banded_myers_pallas(window, text, lengths, error_threshold, interpret)
