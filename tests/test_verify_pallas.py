"""Pallas Myers kernel vs the jnp reference implementation (interpret mode
on CPU; run with FEM_TPU_TEST_TPU=1 for compiled-on-TPU coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.ops.verify import banded_myers, compute_eq
from fem_tpu.ops.verify_pallas import banded_myers_pallas

ON_TPU = jax.devices()[0].platform == "tpu"


@pytest.mark.parametrize("e", [0, 2, 5, 7])
def test_pallas_matches_jnp(e, rng):
    V, L = 300, 100  # deliberately not a multiple of the 1024-lane tile
    window = rng.integers(0, 5, size=(V, L + 2 * e)).astype(np.uint8)
    text = rng.integers(0, 5, size=(V, L)).astype(np.uint8)
    # Half the lanes: mutated diagonal copies so some accept.
    for i in range(0, V, 2):
        text[i] = window[i, e : e + L]
        for _ in range(rng.integers(0, e + 2)):
            text[i, rng.integers(0, L)] = rng.integers(0, 4)
    lengths = rng.integers(40, L + 1, size=V).astype(np.int32)

    ref = banded_myers(compute_eq(jnp.asarray(window), jnp.asarray(text), e),
                       jnp.asarray(lengths), e)
    out = banded_myers_pallas(
        jnp.asarray(window), jnp.asarray(text), jnp.asarray(lengths), e,
        interpret=not ON_TPU,
    )
    np.testing.assert_array_equal(np.asarray(out.accepted), np.asarray(ref.accepted))
    acc = np.asarray(ref.accepted)
    np.testing.assert_array_equal(
        np.asarray(out.edit_distance)[acc], np.asarray(ref.edit_distance)[acc]
    )
    np.testing.assert_array_equal(
        np.asarray(out.end_offset)[acc], np.asarray(ref.end_offset)[acc]
    )
    assert acc.sum() > 0
