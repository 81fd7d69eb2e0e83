from .schedule import warmup_cosine_schedule
from .train_state import TrainState, create_train_state
from .step import (
    diffusion_train_step,
    make_train_step,
    normalize_uint8,
)
