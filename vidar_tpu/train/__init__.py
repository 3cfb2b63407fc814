from .optim import make_optimizer, cosine_annealing_schedule
from .step import (TrainState, create_train_state, make_train_step,
                   make_det_train_step, make_uniad_train_step,
                   make_eval_step)
