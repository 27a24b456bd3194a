from . import rest_api, sinks  # noqa: F401
