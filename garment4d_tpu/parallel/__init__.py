"""Garment4D-TPU parallel subpackage."""
