from . import drain, matrix, mining, multimodal, skew, stats, topk, windows  # noqa: F401
