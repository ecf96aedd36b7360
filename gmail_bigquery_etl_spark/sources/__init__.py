from .paginated import PaginatedApiDataSource, parse_label_query
from .synthetic import existing_sink_ids, gmail_messages_from_events

__all__ = [
    "PaginatedApiDataSource",
    "existing_sink_ids",
    "gmail_messages_from_events",
    "parse_label_query",
]
