"""Reset-durable artifact store on an orphan git branch (`durable`).

The VM can reset mid-round, wiping gitignored paths (checkpoints*/,
logs/, data/corpus*) — see CLAUDE.md.  Round ≤4 queues made segment
checkpoints reset-durable by committing them to main's results/, which
ballooned `.git` past 500 MB (round-4 verdict item 4).  This store keeps
durable copies OUT of main's history: each `put` writes the file (and
its `.json` sidecar) as a blob into a parentless commit on
`refs/heads/durable`, optionally pruning older entries for the same run
tag from the tree.  Because every commit is parentless and replaces the
ref, superseded blobs become unreachable and a normal
`git reflog expire --expire=now refs/heads/durable && git gc --prune=now`
reclaims them — main's history never sees any of it.

Used by cloud/round5_*.sh seg(): after each training segment, the thin
(bf16 params-only, train/thin_ckpt.py) checkpoint goes here; after a
reset, seg() rehydrates the newest one below its stop epoch.

CLI:
  python tools/durable_store.py put FILE [--name NAME] [--prune-prefix P]
  python tools/durable_store.py get NAME DST        # + NAME.json sidecar
  python tools/durable_store.py list [PREFIX]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REF = "refs/heads/durable"

# commit-tree needs an ident; this is a machine artifact store, so a
# fixed one beats failing in checkouts with no git user configured.
_ENV = {**os.environ,
        "GIT_AUTHOR_NAME": "durable-store",
        "GIT_AUTHOR_EMAIL": "durable@localhost",
        "GIT_COMMITTER_NAME": "durable-store",
        "GIT_COMMITTER_EMAIL": "durable@localhost"}


def _git(*args: str, input: bytes | None = None,
         quiet: bool = False) -> bytes:
    return subprocess.run(
        ["git", *args], input=input, check=True, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL if quiet else None, env=_ENV).stdout


def _ls_tree() -> dict:
    """name -> blob hash of the current durable tree ({} if no branch)."""
    try:
        out = _git("ls-tree", REF, quiet=True)
    except subprocess.CalledProcessError:
        return {}
    entries = {}
    for line in out.decode().splitlines():
        meta, name = line.split("\t", 1)
        entries[name] = meta.split()[2]
    return entries


def put(path: str, name: str | None = None,
        prune_prefix: str | None = None) -> None:
    src = Path(path)
    name = name or src.name
    entries = _ls_tree()
    if prune_prefix:
        entries = {k: v for k, v in entries.items()
                   if not k.startswith(prune_prefix)}
    entries[name] = _git("hash-object", "-w", str(src)).decode().strip()
    sidecar = Path(str(src) + ".json")
    if sidecar.exists():
        entries[name + ".json"] = _git(
            "hash-object", "-w", str(sidecar)).decode().strip()
    tree_desc = "".join(f"100644 blob {h}\t{n}\n"
                        for n, h in sorted(entries.items()))
    tree = _git("mktree", input=tree_desc.encode()).decode().strip()
    commit = _git("commit-tree", tree, "-m",
                  f"durable: {name}").decode().strip()
    _git("update-ref", REF, commit)
    print(f"durable: {name} ({src.stat().st_size / 1e6:.1f} MB)")


def get(name: str, dst: str) -> int:
    entries = _ls_tree()
    if name not in entries:
        print(f"durable: no entry {name}", file=sys.stderr)
        return 1
    Path(dst).parent.mkdir(parents=True, exist_ok=True)
    Path(dst).write_bytes(_git("cat-file", "blob", entries[name]))
    if name + ".json" in entries:
        Path(dst + ".json").write_bytes(
            _git("cat-file", "blob", entries[name + ".json"]))
    print(f"durable: restored {name} -> {dst}")
    return 0


def list_(prefix: str = "") -> None:
    for n in sorted(_ls_tree()):
        if n.startswith(prefix):
            print(n)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("put")
    p.add_argument("file")
    p.add_argument("--name", default=None)
    p.add_argument("--prune-prefix", default=None)
    g = sub.add_parser("get")
    g.add_argument("name")
    g.add_argument("dst")
    l = sub.add_parser("list")
    l.add_argument("prefix", nargs="?", default="")
    a = ap.parse_args(argv)
    if a.cmd == "put":
        put(a.file, a.name, a.prune_prefix)
    elif a.cmd == "get":
        return get(a.name, a.dst)
    else:
        list_(a.prefix)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
