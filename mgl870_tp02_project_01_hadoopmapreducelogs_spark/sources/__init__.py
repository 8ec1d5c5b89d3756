from . import logs, sinks  # noqa: F401
