from sde4mbrl_px4_tpu.solver.apg import APGConfig, APGState, apg_solve, box_project  # noqa: F401
from sde4mbrl_px4_tpu.solver.mppi import MPPIConfig, mppi_solve  # noqa: F401
