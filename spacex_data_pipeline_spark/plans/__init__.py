from . import materialize  # noqa: F401
