from sde4mbrl_px4_tpu.sim.plant import SDEPlant, FCUSim  # noqa: F401
from sde4mbrl_px4_tpu.sim.rigid_body import RigidBodyParams, RigidBodyPlant  # noqa: F401
from sde4mbrl_px4_tpu.sim.sitl import FCUSimNode, fcu_sim_from_config  # noqa: F401
