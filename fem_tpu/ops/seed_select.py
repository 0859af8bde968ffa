"""Optimal prefix q-gram selection — the batched on-device DP.

Reference semantics (generate_optimal_prefix_qgram_for_group_seeding,
src/filter.c:3-43): for one seed group, pick e+1+a non-overlapping seeds
(span ceil(k/step) in group coordinates) minimizing total occurrence count,
via a (e+a+2) x (Ng - (e+1+a)*span + 2) DP with uint32-wrapping sums and a
decision-matrix traceback. Ties prefer the horizontal move (skip the seed).

TPU design: one DP *lane* per (read, strand, group); a single `lax.scan`
sweeps columns for every lane at once, with the tiny row recurrence
unrolled inside the scan body. Lanes have different true column counts;
all lanes sweep to the static maximum and each reads its own result column
(left-to-right recurrences make trailing columns inert). The traceback is
a second fixed-length scan over the stored decision matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fem_tpu.ops.types import FilterParams


class SeedSelection(NamedTuple):
    positions: jnp.ndarray  # (NL, S) int32 group-coord positions, -1 = unfilled
    min_total: jnp.ndarray  # (NL,) uint32 minimum total frequency
    complete: jnp.ndarray  # (NL,) bool — all S seeds selected (non-degenerate)
    degenerate: jnp.ndarray  # (NL,) bool — DP had < 2 columns (reference UB region)


def select_qgrams(
    freqs: jnp.ndarray,  # (NL, NGmax) uint32 per-group seed frequencies
    group_sizes: jnp.ndarray,  # (NL,) int32 true seeds per group (ng)
    occurrence_table_size: jnp.ndarray,  # () int32
    params: FilterParams,
) -> SeedSelection:
    NL, NGmax = freqs.shape
    S = params.num_qgrams  # seeds to select = R - 1
    R = S + 1
    sl = params.seed_span
    NC = params.max_dp_cols
    sentinel = occurrence_table_size.astype(jnp.uint32)

    freqs = freqs.astype(jnp.uint32)

    def column_step(m_prev, col):
        # m_prev: (NL, R) = DP column col-1. Row 0 is always 0 for col >= 1.
        rows = [jnp.zeros((NL,), jnp.uint32)]
        decisions = [jnp.full((NL,), 3, jnp.uint8)]
        for row in range(1, R):
            pos = col + (row - 1) * sl - 1
            f = jax.lax.dynamic_index_in_dim(
                freqs, jnp.clip(pos, 0, NGmax - 1), axis=1, keepdims=False
            )
            with_new = rows[row - 1] + f  # uint32 wrap, as the reference
            horiz = m_prev[:, row]
            take_vertical = with_new < horiz
            rows.append(jnp.where(take_vertical, with_new, horiz))
            decisions.append(
                jnp.where(take_vertical, jnp.uint8(2), jnp.uint8(1))
            )
        m_new = jnp.stack(rows, axis=1)
        return m_new, (jnp.stack(decisions, axis=1), m_new[:, R - 1])

    m0 = jnp.concatenate(
        [
            jnp.zeros((NL, 1), jnp.uint32),
            jnp.broadcast_to(sentinel, (NL, R - 1)),
        ],
        axis=1,
    )
    cols = jnp.arange(1, NC, dtype=jnp.int32)
    _, (d_cols, m_last) = jax.lax.scan(column_step, m0, cols)
    # d_cols: (NC-1, NL, R); m_last: (NC-1, NL)

    # Column 0 decisions are all 3 (src/filter.c:10); assemble (NL, R, NC).
    D = jnp.concatenate(
        [
            jnp.full((NL, R, 1), 3, jnp.uint8),
            jnp.transpose(d_cols, (1, 2, 0)),
        ],
        axis=2,
    )

    # Per-lane true column count and result column.
    nc_lane = group_sizes - S * sl + 2  # (NL,)
    degenerate = nc_lane < 2
    final_col = jnp.clip(nc_lane - 1, 1, NC - 1)
    min_total = jnp.take_along_axis(
        jnp.transpose(m_last, (1, 0)), (final_col - 1)[:, None], axis=1
    )[:, 0]
    # Degenerate groups (NC < 2): the reference's DP never runs and its
    # result cell M[R-1][0] is the occurrence_table_size sentinel, which it
    # still adds to the pre-filter counter (src/filter.c:9,202).
    min_total = jnp.where(degenerate, sentinel, min_total)

    # Traceback (src/filter.c:29-41): walk D from (R-1, final_col); a
    # vertical move at row r selects the seed at col + (r-1)*sl - 1 into
    # output slot R-1-r (selection order is decreasing position).
    D_flat = D.reshape(NL, R * NC)
    lane_base = jnp.arange(NL, dtype=jnp.int32)

    def tb_step(carry, _):
        row, col, done, selected = carry
        d = jnp.take_along_axis(D_flat, (row * NC + col)[:, None], axis=1)[:, 0]
        take_v = (d == 2) & ~done
        take_h = (d == 1) & ~done
        pos = col + (row - 1) * sl - 1
        slot = (R - 1) - row  # 0-based selection index
        onehot = (
            jnp.arange(S, dtype=jnp.int32)[None, :] == slot[:, None]
        ) & take_v[:, None]
        selected = jnp.where(onehot, pos[:, None], selected)
        row = row - take_v.astype(jnp.int32)
        col = col - take_h.astype(jnp.int32)
        done = done | (d == 3)
        return (row, col, done, selected), None

    init = (
        jnp.full((NL,), R - 1, jnp.int32),
        final_col,
        degenerate,
        jnp.full((NL, S), -1, jnp.int32),
    )
    num_steps = (R - 1) + (NC - 1) + 1
    (row, col, done, selected), _ = jax.lax.scan(
        tb_step, init, None, length=num_steps
    )
    complete = jnp.all(selected >= 0, axis=1) & ~degenerate
    del lane_base
    return SeedSelection(selected, min_total, complete, degenerate)
