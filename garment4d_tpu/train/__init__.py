"""Garment4D-TPU train subpackage."""
