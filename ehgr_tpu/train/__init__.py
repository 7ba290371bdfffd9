"""Trainers (L5): losses, optimizer policies, EMA, checkpoints, train steps."""
