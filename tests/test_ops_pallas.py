"""Pallas kernel unit tests (interpret mode on CPU, compiled on TPU).

Kernel-vs-oracle pattern from SURVEY.md §4: every TPU kernel is checked
against its XLA reference semantics on the exact shapes the engine uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sustaingym_tpu.ops.pallas.exog_gather import (
    _pallas_hbm_slice_gather, _pallas_slice_gather, _xla_slice_gather,
    episode_slice_gather)


@pytest.mark.parametrize("rows,cols,batch,length", [
    (105408, 4, 64, 288),    # BuildingEnv exog shape
    (105408, 4, 64, 7),      # partial segment
    (1000, 7, 33, 96),       # cogen-like (odd cols -> padded to 8)
    (513, 1, 5, 17),         # degenerate small
    (4096, 4, 768, 32),      # batch between chunk (512) and smem block:
    (4096, 4, 1025, 32),     # the subchunk count must round UP (regression
                             # for a floored-subs bug that left the output
                             # tail unwritten)
])
def test_slice_gather_matches_xla(rows, cols, batch, length):
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (rows, cols), jnp.float32)
    starts = jax.random.randint(
        jax.random.PRNGKey(1), (batch,), 0, rows - length)
    ref = _xla_slice_gather(table, starts, length)
    on_tpu = jax.devices()[0].platform == "tpu"
    out = _pallas_slice_gather(table, starts, length, interpret=not on_tpu)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("rows,cols,batch,length", [
    (2890, 201, 33, 96),     # EV step-table-like (2 lane-rows per epoch)
    (500, 128, 7, 12),       # exactly one lane-row per epoch
    (2890, 201, 100, 96),    # batch not a multiple of the DMA chunk (64)
])
def test_hbm_slice_gather_matches_xla(rows, cols, batch, length):
    key = jax.random.PRNGKey(4)
    table = jax.random.uniform(key, (rows, cols), jnp.float32)
    starts = jax.random.randint(
        jax.random.PRNGKey(5), (batch,), 0, rows - length)
    ref = _xla_slice_gather(table, starts, length)
    on_tpu = jax.devices()[0].platform == "tpu"
    out = _pallas_hbm_slice_gather(table, starts, length,
                                   interpret=not on_tpu)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_episode_slice_gather_dispatch():
    """Public wrapper returns XLA-identical values on any backend."""
    table = jax.random.uniform(jax.random.PRNGKey(2), (4096, 4), jnp.float32)
    starts = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4096 - 288)
    out = episode_slice_gather(table, starts, 288)
    ref = _xla_slice_gather(table, starts, 288)
    assert out.shape == (16, 288, 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
