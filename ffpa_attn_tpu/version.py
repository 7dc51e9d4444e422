"""Package version (analog of reference src/ffpa_attn/version.py)."""

__version__ = "0.1.0"
