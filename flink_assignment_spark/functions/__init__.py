from .scalar import (
    file_extension,
    repo_from_url,
    strip_query_string,
    day_str,
)
from .url import canonical_url, url_host

__all__ = [
    "file_extension",
    "repo_from_url",
    "strip_query_string",
    "day_str",
    "canonical_url",
    "url_host",
]
