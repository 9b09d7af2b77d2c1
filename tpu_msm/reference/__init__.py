from . import curve  # noqa: F401
