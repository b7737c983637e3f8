from . import mysql  # noqa: F401
