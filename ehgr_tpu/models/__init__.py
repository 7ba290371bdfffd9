"""Model zoo: backbones (L2), temporal-augmented TSN task models (L4)."""
