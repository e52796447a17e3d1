from .logging import get_logger, set_loglevel  # noqa: F401
