from .checkpoint import (
    save_pytree,
    load_flat,
    restore_into,
    save_train_state,
    load_train_state,
    load_generator_params,
    save_generator_params,
    generator_ckpt_path,
    discriminator_ckpt_path,
)
from .summaries import SummaryWriter, format_metrics, save_epoch_artifacts

__all__ = [
    "save_pytree", "load_flat", "restore_into",
    "save_train_state", "load_train_state", "load_generator_params",
    "save_generator_params",
    "generator_ckpt_path", "discriminator_ckpt_path",
    "SummaryWriter", "format_metrics", "save_epoch_artifacts",
]
