"""Query modules — importing them registers entries in ``registry``."""

from . import reference_ops  # noqa: F401
