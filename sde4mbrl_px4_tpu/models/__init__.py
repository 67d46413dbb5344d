from sde4mbrl_px4_tpu.models.vehicles import VehicleConfig, iris_config, hexa_config, vehicle_from_name  # noqa: F401
from sde4mbrl_px4_tpu.models.sde_model import (  # noqa: F401
    NeuralSDE,
    init_params,
    drift_fn,
    diffusion_fn,
)
from sde4mbrl_px4_tpu.models.params_io import save_params, load_params  # noqa: F401
from sde4mbrl_px4_tpu.models.trajectory import TrajectoryTable, load_trajectory_csv, make_state_from_traj  # noqa: F401
