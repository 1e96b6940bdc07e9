from . import joins, pipeline, sessions, windows  # noqa: F401
