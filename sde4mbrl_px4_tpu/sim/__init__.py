from sde4mbrl_px4_tpu.sim.plant import SDEPlant, FCUSim  # noqa: F401
