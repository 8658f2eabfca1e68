"""Operator modules; each registers declared queries via plans.registry."""
