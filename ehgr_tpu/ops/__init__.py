"""Temporal/spatial ops: samplers, group transforms, temporal shift, ACTION."""
