"""Offline tools (body-model fitting, conversions)."""
