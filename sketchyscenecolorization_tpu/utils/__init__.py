from .checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
from .logging import (
    count_params, LossEMA, ThroughputMeter, JsonlMetricWriter, profile_trace,
)
