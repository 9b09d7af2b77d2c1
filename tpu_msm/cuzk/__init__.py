from . import decompose, sort, smvp, pbpr, pipeline  # noqa: F401
