from chitu_tpu.utils.logging import init_logger, get_logger
from chitu_tpu.utils.timers import ProfilerSession, Timers, get_timers
