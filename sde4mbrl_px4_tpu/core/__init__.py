from sde4mbrl_px4_tpu.core import quaternion, frames, types  # noqa: F401
