from . import nsnet2  # noqa: F401
