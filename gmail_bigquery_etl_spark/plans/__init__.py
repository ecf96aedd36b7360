"""Plan-shape utilities: bucketing for co-located joins, plan inspection."""

from .bucketing import bucketed_table, write_bucketed
from .inspect import plan_string, scan_read_schema

__all__ = ["bucketed_table", "write_bucketed", "plan_string", "scan_read_schema"]
