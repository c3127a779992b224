from .profiling import trace, PhaseTimer
