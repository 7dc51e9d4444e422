"""``python -m ffpa_attn_tpu.bench`` entry (reference: src/ffpa_attn/bench.py)."""

from .cli._bench import main

if __name__ == "__main__":
    raise SystemExit(main())
