from . import (  # noqa: F401
    aggregates,
    dedup,
    filters,
    joins,
    multimodal,
    similarity,
    sorts,
    text,
    windows,
)
