"""CLI tools: benchmark + autotune (python -m ffpa_attn_tpu.bench / .autotune)."""
