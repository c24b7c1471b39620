from .checkpoint import (save_checkpoint, restore_checkpoint,
                         load_partial, load_pretrained, load_for_eval,
                         torch_to_jax_array)
from .logging import MetricLogger

__all__ = ["save_checkpoint", "restore_checkpoint", "load_partial",
           "load_pretrained", "load_for_eval", "torch_to_jax_array",
           "MetricLogger"]
