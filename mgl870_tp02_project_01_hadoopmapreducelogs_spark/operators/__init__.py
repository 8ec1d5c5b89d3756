from . import matrix, mining, stats, topk, windows  # noqa: F401
