#!/usr/bin/env python
"""One-shot curated-campaign runner: ABBA scaling via bench.run_scaling,
raw JSON to stdout + a file, so a campaign can run detached from the
editing session and be appended to BENCH/campaigns.json afterwards.

Usage: python BENCH/run_campaign.py OUT.json [pages] [mult] [ents] [trials] [levels]
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 480000
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ents = int(sys.argv[4]) if len(sys.argv) > 4 else 5000
    trials = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    levels = [int(x) for x in (sys.argv[6].split(",") if len(sys.argv) > 6 else [2, 8])]
    res = bench.run_scaling(levels, pages, mult, ents, trials)
    blob = {"pages": pages, "mult": mult, "ents": ents, "trials": trials,
            "levels": levels, "scaling": res}
    with open(out_path, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
