"""Data layer (L0/L1): annotation builders, clip datasets, host pipeline."""
