from sde4mbrl_px4_tpu.cost.cost import CostParams, make_cost_fn  # noqa: F401
