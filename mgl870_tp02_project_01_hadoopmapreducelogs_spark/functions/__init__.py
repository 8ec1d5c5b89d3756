from . import preprocess, text, vectors  # noqa: F401
