from sde4mbrl_px4_tpu.io.config import load_yaml_config  # noqa: F401
