"""Compatibility shims for running third-party torch code (the reference
implementation under test) in this torchvision-less environment."""
