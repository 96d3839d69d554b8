from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .meters import AverageMeter, FileLogger, Throughput, topk_accuracy
from .profiling import annotate, trace_steps

__all__ = [
    "latest_step", "restore_checkpoint", "save_checkpoint",
    "AverageMeter", "FileLogger", "Throughput", "topk_accuracy",
]
