"""Plan-level utilities (caching scope, plan inspection helpers)."""
