"""Regenerate tools/source_manifest.json — per-key source+oracle hashes.

The manifest backs the green-set staleness guard
(tests/test_entry.py::test_green_keys_source_unchanged): a key with an
official green CORRECTNESS row must not have its registered source (or
oracle SQL) silently rewritten — the old green verdict would then describe
code that no longer exists while the capped sweep skips the key as
"verified" (the failure mode `sample_hash` hit in round 4 and had to be
hand-patched via _CHANGED_IN_ROUND).

Run this after ANY edit to a registered function, once local oracle parity
is green; for output-CHANGING rewrites ALSO add the key to
__spark_entry__._CHANGED_IN_ROUND so the driver re-verifies it.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

MANIFEST = os.path.join(_REPO, "tools", "source_manifest.json")


def key_hash(fn, oracle: str | None) -> str:
    src = inspect.getsource(fn)  # includes the @register(...) decorator +
    # oracle literal for same-module oracles; hash the registered oracle
    # string explicitly too so externally-built SQL is covered as well.
    h = hashlib.sha256(src.encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    return h.hexdigest()[:16]


def build() -> dict[str, str]:
    import __spark_entry__  # noqa: F401 — populates registry

    from data_transform_spark.registry import ORACLES, QUERIES

    return {k: key_hash(QUERIES[k], ORACLES.get(k)) for k in sorted(QUERIES)}


if __name__ == "__main__":
    manifest = build()
    with open(MANIFEST, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {MANIFEST}: {len(manifest)} keys")
