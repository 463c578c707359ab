#!/usr/bin/env python
"""Fetch and vendor rank files into the repo's vocab/ directory.

The reference vendors `model/gpt2.tiktoken` in-repo and fetches the rest
at runtime (`tokenizer_ts/src/tokenizerBuilder.ts:106-121,269-285`).
This repo vendors gpt2 (gzipped) and derives p50k_base/p50k_edit from it
(see tokenizer_tpu/vocab.py `_materialize_derived`); cl100k_base and
o200k_base carry genuinely new rank data and must be fetched once from a
network-connected machine:

    python tools/vendor_vocabs.py            # fetch cl100k + o200k
    python tools/vendor_vocabs.py --all      # also re-fetch gpt2

Files land as vocab/<encoding>.tiktoken.gz and are picked up by
`resolve_vocab_file` ahead of any network access.  CI runs this
best-effort and commits nothing; a maintainer with egress runs it once
and commits the result to unlock the cl100k/o200k conformance suites
offline (tests/test_conformance.py).
"""

from __future__ import annotations

import argparse
import gzip
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tokenizer_tpu.models.registry import ENCODINGS  # noqa: E402

DEFAULT = ("cl100k_base", "o200k_base")


def vendor(name: str, dest_dir: Path) -> bool:
    spec = ENCODINGS[name]
    dest = dest_dir / f"{name}.tiktoken.gz"
    if dest.is_file():
        print(f"{dest} already vendored")
        return True
    try:
        with urllib.request.urlopen(spec.vocab_url, timeout=120) as resp:
            data = resp.read()
    except Exception as ex:  # best-effort in CI
        print(f"FETCH FAILED {name}: {ex}", file=sys.stderr)
        return False
    dest_dir.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(".tmp")
    tmp.write_bytes(gzip.compress(data, 9))
    tmp.replace(dest)
    print(f"vendored {dest} ({dest.stat().st_size} bytes compressed)")
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="also fetch gpt2")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or list(DEFAULT) + (["gpt2"] if args.all else [])
    ok = all([vendor(n, REPO / "vocab") for n in names])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
