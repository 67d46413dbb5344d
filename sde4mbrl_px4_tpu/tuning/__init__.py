"""On-chip hyper-parameter tuning (L6)."""
from sde4mbrl_px4_tpu.tuning.tuner import (
    TuneResult,
    WeightTuneResult,
    make_mppi_grid,
    make_weight_grid,
    tune_cost_weights,
    tune_mppi,
)

__all__ = ["TuneResult", "WeightTuneResult", "make_mppi_grid",
           "make_weight_grid", "tune_cost_weights", "tune_mppi"]
