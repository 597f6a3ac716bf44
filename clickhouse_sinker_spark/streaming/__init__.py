from . import pipeline, sink, state  # noqa: F401
