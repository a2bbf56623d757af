"""Training: state, optimizer, jitted semi-supervised step, epoch loop."""

from picad_tpu.train.state import TrainState, create_train_state
from picad_tpu.train.optimizer import ReduceLROnPlateau, make_optimizer
from picad_tpu.train.step import make_train_step, make_val_step
from picad_tpu.train.loop import Trainer
