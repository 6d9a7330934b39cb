"""Pallas TPU kernels for the engine's hot memory-bound ops.

XLA owns the compute-bound path (matmuls fuse fine); these kernels cover the
patterns XLA lowers poorly on TPU — above all per-index gathers with narrow
minor dimensions, which XLA pads to the 128-lane tile (32x read
amplification for 4-wide exogenous tables). Every kernel ships with an XLA
fallback so CPU tests and non-TPU backends keep working.
"""
from .exog_gather import episode_slice_gather

__all__ = ["episode_slice_gather"]
