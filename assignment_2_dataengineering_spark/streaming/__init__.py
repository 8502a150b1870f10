from . import ingest, replay, snapshot, windows  # noqa: F401
