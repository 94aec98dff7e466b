from .checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
