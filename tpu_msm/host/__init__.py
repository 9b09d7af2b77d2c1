from . import cpu_msm  # noqa: F401
