from . import lake, merge  # noqa: F401
