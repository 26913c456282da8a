from mmtraj.utils.logging import MetricsLogger  # noqa: F401
