from . import aggregate, dedup, politeness, similarity, validate  # noqa: F401
