from sde4mbrl_px4_tpu.baselines.geometric import (  # noqa: F401
    GeoParams,
    geometric_control,
    NativeGeometricController,
)
