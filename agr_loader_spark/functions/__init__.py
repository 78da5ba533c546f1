from .keys import composite_key  # noqa: F401
from .dates import normalize_date  # noqa: F401
from .text import strip_html, split_curie, normalize_prefix  # noqa: F401
