"""Training harness (SURVEY.md §2.1 L5): CLI, train loop, eval,
checkpointing, metrics."""
from .train import (apply_model_type_presets, build_argparser, build_policy,
                    load_checkpoint, main, save_checkpoint)

__all__ = [
    "apply_model_type_presets",
    "build_argparser",
    "build_policy",
    "load_checkpoint",
    "main",
    "save_checkpoint",
]
