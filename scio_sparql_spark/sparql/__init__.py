from .parser import parse_query  # noqa: F401
