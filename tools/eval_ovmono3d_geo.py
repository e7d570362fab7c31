#!/usr/bin/env python
"""Standalone GEO evaluation entry point (reference tools/eval_ovmono3d_geo.py).

The reference splits the GEO pipeline across two CLIs: ovmono3d_geo.py
writes per-dataset predictions, eval_ovmono3d_geo.py evaluates them
(eval_ovmono3d_geo.py:98-134). Here the evaluation lives in
tools/ovmono3d_geo.py (`--eval` / `evaluate_geo_predictions`); this entry
point preserves the reference's two-command workflow by running only the
evaluation phase on previously written predictions.

  python tools/eval_ovmono3d_geo.py [same args as ovmono3d_geo.py]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from tools import ovmono3d_geo

    if "--eval" not in sys.argv:
        sys.argv.append("--eval")
    if "--eval-only" not in sys.argv:
        sys.argv.append("--eval-only")
    return ovmono3d_geo.main()


if __name__ == "__main__":
    main()
