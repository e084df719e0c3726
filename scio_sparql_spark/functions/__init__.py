from .builtins import BUILTINS, compile_cast  # noqa: F401
