from .metrics import MetricsLogger, StageTimer, profile_trace  # noqa: F401
