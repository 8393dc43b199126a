from .pipeline import (  # noqa: F401
    Clock,
    DataSource,
    FixedClock,
    Pipeline,
    PipelineReport,
    SourceContext,
    SystemClock,
    annual_refresh_gate,
    calendar_gate,
    existence_gate,
    monthly_quota_gate,
    watermark_gate,
)
