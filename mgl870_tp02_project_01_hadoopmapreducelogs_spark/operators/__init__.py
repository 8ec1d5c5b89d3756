from . import matrix, mining, multimodal, stats, topk, windows  # noqa: F401
