"""Physical-plan helpers (salting, co-location) — see skew.py."""
