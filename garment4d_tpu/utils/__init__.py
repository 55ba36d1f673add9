"""Garment4D-TPU utils subpackage."""
