"""Pallas kernel tests (interpret mode on the CPU mesh; the same kernels
are verified compiled on real TPU hardware — see PERF_NOTES.md: vertical
5/3 lifting measured at ~2 GP/s on-device)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from grok_tpu.ops.dwt import fwd_53_axis  # noqa: E402
from grok_tpu.ops.pallas_dwt import fwd_53_vertical, inv_53_vertical  # noqa: E402


@pytest.mark.parametrize("h,w", [(64, 256), (128, 128), (2, 128), (256, 384)])
def test_pallas_v53_matches_xla(h, w, rng):
    x = jnp.asarray(rng.integers(-5000, 5000, (h, w)).astype(np.int32))
    lo, hi = fwd_53_vertical(x, interpret=True)
    rlo, rhi = fwd_53_axis(jnp.swapaxes(x, 0, 1))
    assert np.array_equal(np.asarray(lo), np.asarray(rlo).T)
    assert np.array_equal(np.asarray(hi), np.asarray(rhi).T)
    back = inv_53_vertical(lo, hi, h, interpret=True)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_pallas_v53_odd_height_fallback(rng):
    x = jnp.asarray(rng.integers(-500, 500, (37, 128)).astype(np.int32))
    lo, hi = fwd_53_vertical(x, interpret=True)
    back = inv_53_vertical(lo, hi, 37, interpret=True)
    assert np.array_equal(np.asarray(back), np.asarray(x))
