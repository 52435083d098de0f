from .exact import dsum, davg, count_if  # noqa: F401
