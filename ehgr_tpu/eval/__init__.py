"""Evaluation: multi-clip inference protocol, metrics, confusion matrices."""
