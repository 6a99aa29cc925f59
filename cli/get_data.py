#!/usr/bin/env python
"""Dataset fetcher + layout validator (the `get_data.sh` analog).

The reference ships a wget+unzip script pulling six archives from Dropbox
(``/root/reference/get_data.sh:3-32``). This container has zero network
egress, so downloading cannot be exercised here — but the moment the
archives (or already-extracted files) appear under the data root, this
script validates the exact file layout the loaders (and `make parity`)
expect, so a user can tell *which* file is missing or misnamed rather
than debugging a loader traceback.

    python cli/get_data.py --check            # validate layout only
    python cli/get_data.py --download         # fetch + extract + validate
    python cli/get_data.py --download aifb wn18

The data root defaults to ``<repo>/data``; override with --root or the
``RGCN_TPU_DATA`` env var (the same one the loaders honor).
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgcn_tpu.data.loaders import (  # noqa: E402
    DATA_ROOT,
    _LP_REGISTRY,
    _NC_REGISTRY,
)

# Archive sources, mirroring the reference's downloader
# (/root/reference/get_data.sh). Each extracts into data/<name>/.
ARCHIVES = {
    "aifb": "https://www.dropbox.com/sh/ldjd70yvnu9akxi/AAAam7SBr5KXLfjk-NVGQNWRa?dl=1",
    "am": "https://www.dropbox.com/sh/5ys1lfw9c8padz0/AABEJChkUHkxrWfvXrgehOX5a?dl=1",
    "bgs": "https://www.dropbox.com/sh/so1n0zc4zkel2mf/AACq3llckg1AAMfi2umI3MbGa?dl=1",
    "mutag": "https://www.dropbox.com/sh/tburaaxij0a1vmy/AAAlD5ORzcMbF3YpoynOLGqwa?dl=1",
    "fb-toy": "https://www.dropbox.com/sh/5kv7xk4cj1md9zw/AADpaREEK9K5NX_Vb5eRcXuRa?dl=1",
    "wn18": "https://www.dropbox.com/sh/egwgth011epusq7/AABWx1YWuEaMoumHDOknbCA9a?dl=1",
}


def expected_files(name: str):
    """Relative paths (under the data root) a dataset must provide."""
    if name in _NC_REGISTRY:
        graph_rel, train_rel, test_rel, _, _ = _NC_REGISTRY[name]
        return [graph_rel, train_rel, test_rel]
    if name in _LP_REGISTRY:
        d = _LP_REGISTRY[name]  # includes the reference's `fB15k-237` casing
        return [os.path.join(d, f) for f in ("train.txt", "valid.txt",
                                             "test.txt")]
    raise KeyError(name)


def check(root: str, names) -> bool:
    ok_all = True
    for name in names:
        missing = [
            rel for rel in expected_files(name)
            if not os.path.isfile(os.path.join(root, rel))
        ]
        if missing:
            ok_all = False
            print(f"  {name}: MISSING " + ", ".join(missing))
        else:
            sizes = sum(
                os.path.getsize(os.path.join(root, rel))
                for rel in expected_files(name)
            )
            print(f"  {name}: ok ({sizes / 1e6:.1f} MB)")
    return ok_all


def download(root: str, names) -> None:
    import urllib.request

    os.makedirs(root, exist_ok=True)
    for name in names:
        if name not in ARCHIVES:
            print(f"  {name}: no archive source known; place files manually")
            continue
        if not [
            rel for rel in expected_files(name)
            if not os.path.isfile(os.path.join(root, rel))
        ]:
            print(f"  {name}: already present, skipping download")
            continue
        archive = os.path.join(root, f"{name}.zip")
        print(f"  {name}: downloading…", flush=True)
        urllib.request.urlretrieve(ARCHIVES[name], archive)
        dest = os.path.join(root, name)
        print(f"  {name}: extracting → {dest}")
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(dest)
        os.unlink(archive)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("datasets", nargs="*",
                    help="subset to handle (default: all)")
    ap.add_argument("--root", default=DATA_ROOT)
    ap.add_argument("--check", action="store_true",
                    help="validate layout only (no network)")
    ap.add_argument("--download", action="store_true")
    args = ap.parse_args(argv)

    all_names = sorted(set(_NC_REGISTRY) | set(_LP_REGISTRY))
    names = args.datasets or all_names
    unknown = [n for n in names if n not in all_names]
    if unknown:
        ap.error(f"unknown datasets {unknown}; known: {all_names}")

    if args.download:
        download(args.root, names)
    print(f"validating layout under {args.root}:")
    ok = check(args.root, names)
    if ok:
        print("all requested datasets present — `make parity` will run "
              "against them")
    else:
        print("some datasets missing — loaders (and `make parity`) will "
              "SKIP those configs; run with --download where egress exists")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
