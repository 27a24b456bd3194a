from . import marts, relational, staging  # noqa: F401
