from . import amounts, scalars  # noqa: F401
