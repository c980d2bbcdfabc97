"""Dump the optimized HLO of the bench train step and summarize named
fusions — pairs with scripts/profile_step.py to map hot trace entries
(fusion.N, while.N) back to source ops.

Usage: python scripts/dump_hlo.py [out.txt] [name ...]
With names, prints those computations' bodies (grep-style); otherwise
writes the full optimized HLO to out.txt (default /tmp/step_hlo.txt).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import build_step  # noqa: E402


def main():
    step, params, opt_state, batch, s_val, lrs, tv_on = build_step()
    lowered = step.lower(params, opt_state, {}, *batch, s_val, lrs, tv_on)
    txt = lowered.compile().as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
