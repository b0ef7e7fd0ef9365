"""Utilities: synthetic corpus generation, timing."""
