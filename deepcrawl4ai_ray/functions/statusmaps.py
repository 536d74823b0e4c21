"""Status mapping tables (M19; reference utils.py:225-235 and 183-204).

The reference maps Celery task states to domain statuses and statuses to
display colors with plain dict lookups.  Same shape here over the
engine's own states (round/task lifecycle).
"""

from __future__ import annotations

# engine execution state → user-facing status (convert_celery_status analog)
ENGINE_TO_DOMAIN = {
    "PENDING": "In Progress",
    "STARTED": "In Progress",
    "RUNNING": "In Progress",
    "RETRY": "In Progress",
    "SUCCESS": "Completed",
    "FAILURE": "Failed",
    "REVOKED": "Cancelled",
}

# status → display color (task_status_color analog)
STATUS_COLOR = {
    "In Progress": "#f59e0b",
    "Completed": "#22c55e",
    "Failed": "#ef4444",
    "Cancelled": "#6b7280",
    "Scheduled": "#3b82f6",
}


def convert_engine_status(state: str) -> str:
    return ENGINE_TO_DOMAIN.get(state.upper(), "Unknown")


def task_status_color(status: str) -> str:
    return STATUS_COLOR.get(status, "#9ca3af")
