from .base import FetchError, RetryPolicy, fetch_map  # noqa: F401
