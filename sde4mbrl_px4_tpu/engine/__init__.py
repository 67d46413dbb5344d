from sde4mbrl_px4_tpu.engine.mpc_loader import load_mpc_from_cfgfile, MPCBundle  # noqa: F401
from sde4mbrl_px4_tpu.engine.controller import RecedingHorizonController, ControlAutomata  # noqa: F401
from sde4mbrl_px4_tpu.engine.telemetry import OptMPCStateRecord  # noqa: F401
