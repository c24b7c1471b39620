from .trainer import (TrainState, create_train_state, make_train_step,
                      make_eval_step, make_lr_schedule, freeze_mask)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "make_lr_schedule", "freeze_mask"]
