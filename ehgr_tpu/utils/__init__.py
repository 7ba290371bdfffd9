"""Cross-cutting utilities: meters, logging, run-dir management."""
