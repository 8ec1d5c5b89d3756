from . import anomaly, pipeline  # noqa: F401
