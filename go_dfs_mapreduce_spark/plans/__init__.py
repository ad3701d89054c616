"""Plan-inspection helpers (explain audits)."""

from .audit import audit_plan, formatted_plan

__all__ = ["audit_plan", "formatted_plan"]
