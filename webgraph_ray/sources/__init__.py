from webgraph_ray.sources.transcripts import (  # noqa: F401
    transcripts_from_events,
    generate_transcripts,
    TRANSCRIPTS_FROM_EVENTS_SQL,
)
