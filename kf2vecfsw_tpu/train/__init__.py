from .schedule import step_lr
from .checkpoint import save_checkpoint, load_checkpoint
