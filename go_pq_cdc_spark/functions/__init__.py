from . import portable  # noqa: F401
