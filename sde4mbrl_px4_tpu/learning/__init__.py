from sde4mbrl_px4_tpu.learning.trainer import (  # noqa: F401
    TrainConfig,
    TrajectoryDataset,
    make_loss_fn,
    train_sde,
)
