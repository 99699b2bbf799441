from .hashing import record_hash, text_fingerprint  # noqa: F401
from .numparse import parse_locale_number  # noqa: F401
from .calendar import calendar_columns  # noqa: F401
