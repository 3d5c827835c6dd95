"""chitu-tpu: TPU-native LLM inference & serving engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
thu-pacman/chitu (see SURVEY.md for the structural map of the reference).
"""

__version__ = "0.1.0"

from chitu_tpu.config import EngineConfig, ModelArgs, load_config
from chitu_tpu.task import SampleParams, Task, TaskPool, UserRequest
