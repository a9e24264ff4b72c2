"""Test fixtures: the slow trusted oracle assembler and helpers."""
