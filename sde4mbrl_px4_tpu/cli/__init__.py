from sde4mbrl_px4_tpu.cli.mission import MissionControl, SimVehicle, repl  # noqa: F401
