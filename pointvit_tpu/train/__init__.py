"""Training engine and config-compatible family trainers."""

from pointvit_tpu.train.trainer import (
    TrainState,
    Trainer,
    TrainingDivergedError,
    build_optimizer,
    cross_entropy_loss,
)
from pointvit_tpu.train.schedules import (
    constant_schedule,
    cosine_annealing_schedule,
    timm_cosine_schedule,
    warmup_then_cosine_schedule,
)
from pointvit_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    wait_for_pending_writes,
)
from pointvit_tpu.train.train_utils import save_configs
from pointvit_tpu.train.apf_trainer import APFTrainer
from pointvit_tpu.train.pix4point_trainer import Pix4PointTrainer
from pointvit_tpu.train.renderer_trainer import RendererTrainer

__all__ = [
    "Trainer",
    "TrainingDivergedError",
    "TrainState",
    "build_optimizer",
    "cross_entropy_loss",
    "timm_cosine_schedule",
    "warmup_then_cosine_schedule",
    "cosine_annealing_schedule",
    "constant_schedule",
    "save_checkpoint",
    "wait_for_pending_writes",
    "load_checkpoint",
    "save_configs",
    "APFTrainer",
    "Pix4PointTrainer",
    "RendererTrainer",
]
