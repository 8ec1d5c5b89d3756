from . import mining_stream  # noqa: F401
