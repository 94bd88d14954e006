"""Fitted-state objects, broadcast helpers, checkpoint/lineage."""
