"""Diff harness: run a blastp config and compare against a reference golden.

Usage: python tools/try_golden.py GOLDEN_NAME [--sens S] [--query Q] [--db D] [kw=val ...]
Prints per-query missing/extra subject lines.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from test_golden_e2e import run_blastp, golden, TD


def main():
    name = sys.argv[1]
    kw = {}
    args = sys.argv[2:]
    query = f"{TD}/data.faa"
    db = f"{TD}/data.faa"
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sens":
            kw["sensitivity"] = args[i + 1]; i += 2
        elif a == "--query":
            query = args[i + 1]; i += 2
        elif a == "--db":
            db = args[i + 1]; i += 2
        elif "=" in a:
            k, v = a.split("=", 1)
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
            kw[k] = v
            i += 1
        else:
            raise SystemExit(f"bad arg {a}")
    lines = run_blastp(query, db, **kw)
    g = golden(name)
    ours, gold = set(lines), set(g)
    print(f"ours {len(lines)} lines, golden {len(g)}; "
          f"missing {len(gold - ours)}, extra {len(ours - gold)}")
    if lines == g:
        print("EXACT MATCH")
        return
    from collections import defaultdict
    miss = defaultdict(list)
    extra = defaultdict(list)
    for ln in sorted(gold - ours):
        miss[ln.split("\t")[0]].append(ln)
    for ln in sorted(ours - gold):
        extra[ln.split("\t")[0]].append(ln)
    for q in sorted(set(miss) | set(extra)):
        print(f"== query {q}: {len(miss[q])} missing, {len(extra[q])} extra")
        for ln in miss[q][:4]:
            print("  MISS ", ln)
        for ln in extra[q][:4]:
            print("  EXTRA", ln)
    # order check
    if not (gold - ours) and not (ours - gold):
        for k, (a, b) in enumerate(zip(lines, g)):
            if a != b:
                print(f"order diff at {k}:\n  OURS {a}\n  GOLD {b}")
                break


if __name__ == "__main__":
    main()
