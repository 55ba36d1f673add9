"""Garment4D-TPU data subpackage."""
