"""On-chip hyper-parameter tuning (L6)."""
from sde4mbrl_px4_tpu.tuning.tuner import TuneResult, make_mppi_grid, tune_mppi

__all__ = ["TuneResult", "make_mppi_grid", "tune_mppi"]
