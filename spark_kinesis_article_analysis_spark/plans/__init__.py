"""Physical-plan inspection helpers (explain capture, shuffle/pushdown assertions)."""
