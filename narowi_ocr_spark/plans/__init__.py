"""Logical plan compositions: the end-to-end extraction pipeline."""
