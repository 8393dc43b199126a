from .ingest import (  # noqa: F401
    dedup_stream,
    enrich_stream,
    funnel_stage_stream,
    interval_join_streams,
    maintained_join_view_stream,
    maintained_rollup_stream,
    maintained_stack_stream,
    near_dup_ingest_stream,
    read_base64_event_stream,
    sessionized_counts_stream,
    stream_to_table,
    windowed_counts_stream,
)
from .stateful import running_counts_stateful  # noqa: F401
