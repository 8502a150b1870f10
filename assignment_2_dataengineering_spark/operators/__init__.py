from . import dedup, relational, reshape, similarity  # noqa: F401
