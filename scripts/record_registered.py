"""Record first-registration epochs for the verification rotation.

Run after registering new queries: any name in the live registry missing
from REGISTERED.json is pinned at the CURRENT round (latest CORRECTNESS
round + 1). ``__spark_entry__.queries()`` ranks never-verified queries by
this epoch, so a round's new additions queue BEHIND the existing
never-verified backlog in the driver's bounded window (round-5 verdict #1:
"new names alphabetize into the window and displace backlog").
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(BASE, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    current = (max(rounds) if rounds else 0) + 1
    path = os.path.join(BASE, "REGISTERED.json")
    try:
        with open(path, encoding="utf-8") as fh:
            epochs = json.load(fh)
    except (OSError, ValueError):
        epochs = {}
    added = 0
    for name in entry.registry.QUERIES:
        if name not in epochs:
            epochs[name] = current
            added += 1
    # Drop names no longer registered (renamed/removed queries).
    dropped = [n for n in epochs if n not in entry.registry.QUERIES]
    for n in dropped:
        del epochs[n]
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(epochs, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"REGISTERED.json: round {current}, +{added} new, "
        f"-{len(dropped)} dropped, {len(epochs)} total"
    )


if __name__ == "__main__":
    main()
