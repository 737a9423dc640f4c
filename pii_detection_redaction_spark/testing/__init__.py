"""Deterministic synthetic data generators (seeded; no wall-clock, no I/O
except explicit parquet caching under the repo's ``_data/`` directory)."""
