from .queries import QUERIES, ORACLES  # noqa: F401
