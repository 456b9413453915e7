"""Training loop, LR scheduling, train state (reference L6)."""

from sqtpu.training.state import SQTrainState, create_train_state  # noqa: F401
from sqtpu.training.lr import ReduceLROnPlateau, step_schedule_2019  # noqa: F401
from sqtpu.training.loop import make_train_step, make_eval_step, train  # noqa: F401
