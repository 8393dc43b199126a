from .base import FetchError, RetryPolicy, fetch_map  # noqa: F401
from .cdf_stream import TableChangesDataSource, read_changes_stream  # noqa: F401
