from .distribute import sharded_realize_rows  # noqa: F401
