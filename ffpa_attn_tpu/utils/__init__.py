"""Utility layer: native (C++) runtime bindings + misc helpers."""
