from cosmology_gnn_simulation_tpu.training.losses import (
    combined_loss,
    momentum_conservation_loss,
)
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    Trainer,
    make_train_step,
)

__all__ = [
    "combined_loss",
    "momentum_conservation_loss",
    "TrainConfig",
    "Trainer",
    "make_train_step",
]
