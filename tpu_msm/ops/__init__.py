from . import limbs, field, mont, barrett  # noqa: F401
