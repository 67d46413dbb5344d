from sde4mbrl_px4_tpu.parallel.mesh import make_mesh, scenario_sharding, replicated  # noqa: F401
from sde4mbrl_px4_tpu.parallel.batched import make_batched_mpc, make_batch_inputs  # noqa: F401
