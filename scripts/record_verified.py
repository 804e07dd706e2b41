"""Record the verified-source manifest used by the dirty-aware rotation.

Run at ROUND START, before touching code: for every query present in the
latest CORRECTNESS_r{N}.json, pin {round: N, digest} where the digest is
computed from ``git show HEAD:<file>`` — the committed snapshot the driver
actually verified — so uncommitted work-in-progress never masquerades as
verified. ``__spark_entry__.queries()`` then floats any query whose current
working-tree digest drifts from its manifest digest to the front of the
driver's bounded verification window.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

import __spark_entry__ as entry  # noqa: E402


def git_read(rel: str) -> bytes:
    return subprocess.run(
        ["git", "-C", BASE, "show", f"HEAD:{rel}"],
        check=True,
        capture_output=True,
    ).stdout


def repin() -> None:
    """Recompute every existing manifest entry's digests at HEAD under the
    CURRENT closure scheme (``--repin``). Only valid when the working tree
    is clean at a commit where every manifest entry is known green (e.g.
    round 6's HEAD: driver + judge had verified all registered queries) —
    it does NOT add names, so a never-driver-verified backlog stays dirty.
    Use after a digest/closure scheme change, which would otherwise mark
    every pinned query dirty at once and flood the bounded window."""
    manifest_path = os.path.join(BASE, "VERIFIED.json")
    with open(manifest_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    core = entry.core_digest(read=git_read)
    for name, rec in manifest.items():
        if name not in entry.registry.QUERIES:
            continue
        rec["digest"] = entry.query_digest(name, read=git_read)
        rec["core"] = core
    with open(manifest_path, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"VERIFIED.json: re-pinned {len(manifest)} entries at HEAD")


def main() -> None:
    rounds = sorted(
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(BASE, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    )
    if not rounds:
        print("no CORRECTNESS files; nothing to record")
        return
    manifest_path = os.path.join(BASE, "VERIFIED.json")
    try:
        with open(manifest_path, encoding="utf-8") as fh:
            manifest = json.load(fh)
    except (OSError, ValueError):
        manifest = {}
    rnd, path = rounds[-1]
    with open(path, encoding="utf-8") as fh:
        rows = json.load(fh)
    core = entry.core_digest(read=git_read)
    updated = 0
    for name in rows:
        if name not in entry.registry.QUERIES:
            continue
        rec = manifest.get(name, {})
        # Re-pin the latest round's entries even if already recorded: the
        # digest *scheme* may have changed (e.g. r5's core/query split) and
        # HEAD is the snapshot the driver verified.
        if rec.get("round", -1) > rnd or (
            rec.get("round") == rnd and "core" in rec
        ):
            continue
        manifest[name] = {
            "round": rnd,
            "digest": entry.query_digest(name, read=git_read),
            "core": core,
        }
        updated += 1
    with open(manifest_path, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"VERIFIED.json: round {rnd}, {updated} entries updated, {len(manifest)} total")


if __name__ == "__main__":
    # Unknown flags must NOT silently fall through to main(): main()
    # re-pins the latest CORRECTNESS round's digests at HEAD, which is
    # only correct at ROUND START before code edits — an accidental
    # mid-round invocation (e.g. a guessed `--status`) would stamp
    # verified-at digests onto sources the driver never checked.
    unknown = [a for a in sys.argv[1:] if a != "--repin"]
    if unknown:
        sys.exit(f"record_verified.py: unknown argument(s) {unknown}; "
                 "usage: record_verified.py [--repin]")
    repin() if "--repin" in sys.argv[1:] else main()
