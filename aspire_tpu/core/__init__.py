from .types import MultiVec, PAD_NEG
from .config import ModelHParams, TrainHParams, RunConfig
