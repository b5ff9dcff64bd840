"""CLI: rewrite paths embedded in checkpoints after relocating a results tree.

Counterpart of ``nnunet_ext/scripts/update_checkpoints.py:212-254`` (recursive
string replacement inside pickled checkpoints).  Our checkpoint manifests use
relative paths by construction, so usually nothing needs rewriting — but any
absolute-path strings found in manifest JSONs (e.g. recorded stage dirs) are
rewritten the same way.
"""

from __future__ import annotations

import argparse
import json
import os


def _replace(obj, old: str, new: str):
    if isinstance(obj, str):
        return obj.replace(old, new)
    if isinstance(obj, list):
        return [_replace(v, old, new) for v in obj]
    if isinstance(obj, dict):
        return {k: _replace(v, old, new) for k, v in obj.items()}
    return obj


def update_tree(root: str, old: str, new: str, verbose: bool = True) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".json"):
                continue
            p = os.path.join(dirpath, f)
            with open(p) as fh:
                try:
                    data = json.load(fh)
                except json.JSONDecodeError:
                    continue
            new_data = _replace(data, old, new)
            if new_data != data:
                with open(p, "w") as fh:
                    json.dump(new_data, fh, indent=2)
                n += 1
                if verbose:
                    print(f"updated {p}")
    return n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-path", required=True, help="folder of one model tree")
    p.add_argument("-old", required=True, help="old path prefix")
    p.add_argument("-new", required=True, help="new path prefix")
    args = p.parse_args()
    n = update_tree(args.path, args.old, args.new)
    print(f"{n} manifest(s) updated")


def main_all():
    from .. import paths
    p = argparse.ArgumentParser(description="update every model under RESULTS_FOLDER")
    p.add_argument("-old", required=True)
    p.add_argument("-new", required=True)
    args = p.parse_args()
    root = paths.require(paths.results_dir(create=False), "results")
    n = update_tree(root, args.old, args.new)
    print(f"{n} manifest(s) updated")


if __name__ == "__main__":
    main()
