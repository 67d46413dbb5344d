from sde4mbrl_px4_tpu.ops.pallas.solve_kernels import pallas_cost_oracle  # noqa: F401
