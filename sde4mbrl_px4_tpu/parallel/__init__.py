from sde4mbrl_px4_tpu.parallel.mesh import make_mesh, scenario_sharding, replicated  # noqa: F401
from sde4mbrl_px4_tpu.parallel.batched import make_batched_mpc, make_batch_inputs  # noqa: F401
from sde4mbrl_px4_tpu.parallel.fleet import FleetEngine  # noqa: F401

# parallel.distributed is imported lazily by callers: jax.distributed
# bring-up must precede backend initialization, so it must not be pulled in
# as an __init__ side effect.
