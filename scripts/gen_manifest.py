#!/usr/bin/env python
"""Regenerate chatterbox_tpu/data/checkpoint_manifest.json.

The manifest freezes the FULL-SIZE key→shape schema of the three reference
safetensors artifacts (see chatterbox_tpu/runtime/manifest.py).
tests/test_manifest.py asserts the checked-in file matches the code, so any
schema change must re-run this script.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_tpu.runtime.manifest import MANIFEST_PATH, build_full_manifest


def main() -> None:
    manifest = build_full_manifest()
    MANIFEST_PATH.parent.mkdir(parents=True, exist_ok=True)
    with open(MANIFEST_PATH, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    for name, keys in manifest.items():
        print(f"{name}: {len(keys)} keys")
    print(f"wrote {MANIFEST_PATH}")


if __name__ == "__main__":
    main()
