"""Bit-exact Python oracle of libMems reference semantics (test-only)."""
