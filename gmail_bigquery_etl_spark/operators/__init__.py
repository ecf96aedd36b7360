from .incremental import extract_email_records, incremental_anti_join

__all__ = ["extract_email_records", "incremental_anti_join"]
