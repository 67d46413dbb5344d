from sde4mbrl_px4_tpu.ops.rollout import (  # noqa: F401
    make_time_steps,
    em_step,
    rollout_mean,
    rollout_sde,
)
