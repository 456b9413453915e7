"""Config, checkpointing, logging, profiling, NaN guards."""

from sqtpu.utils.config import TrainConfig, parse_cli  # noqa: F401
from sqtpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
