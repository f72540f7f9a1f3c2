from .scalar import (
    file_extension,
    repo_from_url,
    strip_query_string,
    day_str,
)

__all__ = ["file_extension", "repo_from_url", "strip_query_string", "day_str"]
