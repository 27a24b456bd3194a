from . import ingest, rollup  # noqa: F401
