"""Composed end-to-end pipelines (the reference's composite ops + flagship)."""
