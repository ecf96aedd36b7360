from .synthetic import existing_sink_ids, gmail_messages_from_events

__all__ = ["existing_sink_ids", "gmail_messages_from_events"]
