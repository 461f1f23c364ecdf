"""Cross-cutting utilities: profiling, timing."""

from pointvit_tpu.utils.profiling import StepTimer, profile_trace

__all__ = ["StepTimer", "profile_trace"]
