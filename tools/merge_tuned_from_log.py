"""Recover autotune winners from campaign step logs into the tuned store.

Round-4 incident: the campaign invoked the tuner without --overwrite while
write_config_file's key-collision merge let EXISTING entries win, so two
max-mode sweeps (~80 min of chip time; tools/r4_logs/02.tune_multiD.log,
035.tune-nonpow2.log) measured winners that never landed in
TPU_v5_lite.json. The engine logs every winner as

  [AUTOTUNED][i/N] {dir} d={d} n={n} causal={bool} -> {config dict} t=..s

which, for plain (non --full-tasks) sweeps, pins the full ConfigKey:
nq == nkv == n, dtype bfloat16, MHA, no bias/dropout. This tool re-parses
those lines and merge-writes the entries with the fresh-wins semantics the
engine now uses. Winner ms is recovered from the search DEBUG lines when
the log carries them (ms=None otherwise — the store treats it as
informational only).

Usage: python tools/merge_tuned_from_log.py LOG [LOG...] [--dtype bfloat16]
       [--device-kind "TPU v5 lite"] [--dry-run]
"""
import argparse
import ast
import re
import sys

AUTOTUNED = re.compile(
    r"\[AUTOTUNED\]\[\d+/\d+\] (?P<dir>\w+) d=(?P<d>\d+) n=(?P<n>\d+) "
    r"causal=(?P<causal>True|False) -> (?P<cfg>\{[^}]*\})"
)
CANDIDATE = re.compile(
    r"autotune\[(?P<dir>\w+) d=(?P<d>\d+) n=\((?P<nq>\d+), ?(?P<nkv>\d+)\)"
    r"(?: [^\]]*)?\]"
    r": BlockConfig\((?P<cfg>[^)]*)\) -> (?P<ms>[\d.]+) ms"
)


def parse_log(path: str):
    """Yield (direction, d, n, causal, config_dict, ms_or_None).

    Tasks run SEQUENTIALLY, so a task's candidate DEBUG lines all precede
    its [AUTOTUNED] line (the DEBUG line carries no ``causal`` field —
    position, not key, scopes it to the right task)."""
    events = []  # (pos, kind, payload)
    text = open(path).read()
    for m in CANDIDATE.finditer(text):
        cfg = dict(
            kv.split("=") for kv in m.group("cfg").replace(" ", "").split(",")
        )
        cfg = {k: ast.literal_eval(v) for k, v in cfg.items()}
        events.append((m.start(), "cand", (cfg, float(m.group("ms")))))
    for m in AUTOTUNED.finditer(text):
        events.append((
            m.start(), "won",
            (m.group("dir"), int(m.group("d")), int(m.group("n")),
             m.group("causal") == "True", ast.literal_eval(m.group("cfg"))),
        ))
    events.sort(key=lambda e: e[0])
    pending = {}  # config-tuple -> best ms among THIS task's candidates
    for _, kind, payload in events:
        if kind == "cand":
            cfg, ms = payload
            key = tuple(sorted(cfg.items()))
            pending[key] = min(pending.get(key, ms), ms)
        else:
            direction, d, n, causal, cfg = payload
            ms = pending.get(tuple(sorted(cfg.items())))
            pending = {}
            yield direction, d, n, causal, cfg, ms


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--device-kind", default=None)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    from ffpa_attn_tpu.autotune.store import (
        ConfigKey, make_entry, write_config_file,
    )
    from ffpa_attn_tpu.ops.config import BlockConfig

    entries = []
    for path in args.logs:
        for direction, d, n, causal, cfg, ms in parse_log(path):
            key = ConfigKey(
                direction=direction, dtype=args.dtype, headdim=d,
                headdim_v=d, seqlen_q=n, seqlen_k=n, causal=causal,
                has_bias=False, dropout=False, gqa=False, group=0,
            )
            entries.append(make_entry(key, BlockConfig(**cfg), ms=ms))
            print(f"{path}: {direction} d={d} n={n} causal={causal} "
                  f"ms={ms} {cfg}")
    if not entries:
        print("no AUTOTUNED lines found", file=sys.stderr)
        return 1
    if args.dry_run:
        print(f"dry run: {len(entries)} entries NOT written")
        return 0
    path = write_config_file(
        entries, device_kind=args.device_kind, overwrite=True
    )
    print(f"merged {len(entries)} entries into {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
