from . import limbs, field, mont, barrett, curve  # noqa: F401
