from . import domain, fixture_queries, oracles  # noqa: F401
