from . import limbs_conversion  # noqa: F401
