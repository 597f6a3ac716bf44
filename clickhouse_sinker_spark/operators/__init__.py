from . import project, sharding, dedup, similarity, evolve, series  # noqa: F401
