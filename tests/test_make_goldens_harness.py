"""Plumbing test for the reference golden harness (tools/make_goldens.py).

The harness has never been able to run for real -- /root/reference has been
empty in every round (SURVEY section 0).  This test proves the pipeline
itself (dual -O2/-O0 build, recitation + usage probe, PVRG-triple input
generation, encode/decode invocation, O0-vs-O2 cross-check, manifest
writing) works end-to-end against a tiny FAKE reference C codec, so the
only unknown when the mount appears is the real binary's flag set.

The fake codec is NOT an H.261 implementation -- it deterministically
packs its input bytes so the harness has a real binary to build and run.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAKE_C = r"""
/* fake-p64: minimal stand-in for the reference binary so the golden
   harness plumbing can be exercised.  Supports:
     no args         -> prints usage to stderr, exit 0
     -a N -b M -q Q [-i S] [-r R] -s OUT PREFIX   -> "encode": checksums
        PREFIX<n>.Y/.U/.V for n in [N, M] into OUT (deterministic)
     -d -s IN OUTPREFIX  -> "decode": writes OUTPREFIX<n>.Y files
*/
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned long h = 1469598103934665603UL;
static void feed(FILE *f) {
  int c;
  while ((c = fgetc(f)) != EOF) { h ^= (unsigned)c; h *= 1099511628211UL; }
}

int main(int argc, char **argv) {
  int a = 0, b = 0, decode = 0, i;
  const char *stream = 0, *prefix = 0;
  if (argc == 1) { fprintf(stderr, "usage: p64 [-d] -a -b -q -i -r -s\n"); return 0; }
  for (i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "-a")) a = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-b")) b = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-d")) decode = 1;
    else if (!strcmp(argv[i], "-s")) stream = argv[++i];
    else if (argv[i][0] == '-') { ++i; }
    else prefix = argv[i];
  }
  if (!stream || !prefix) { fprintf(stderr, "missing -s/prefix\n"); return 1; }
  if (decode) {
    char name[4096];
    FILE *out;
    snprintf(name, sizeof name, "%s0.Y", prefix);
    out = fopen(name, "wb");
    if (!out) return 1;
    fputs("decoded", out);
    fclose(out);
    return 0;
  }
  for (i = a; i <= b; i++) {
    const char *sfx[3] = {"Y", "U", "V"};
    int k;
    for (k = 0; k < 3; k++) {
      char name[4096];
      FILE *f;
      snprintf(name, sizeof name, "%s%d.%s", prefix, i, sfx[k]);
      f = fopen(name, "rb");
      if (!f) { fprintf(stderr, "missing %s\n", name); return 1; }
      feed(f);
      fclose(f);
    }
  }
  {
    FILE *out = fopen(stream, "wb");
    if (!out) return 1;
    fwrite(&h, sizeof h, 1, out);
    fclose(out);
  }
  return 0;
}
"""

# CFLAGS set INSIDE the Makefile, like real PVRG makefiles: the harness
# must override it on the make command line (env CFLAGS would silently
# lose, making the -O0 cross-check vacuous -- round-3 review finding).
MAKEFILE = "CFLAGS = -O2\nall: p64\np64: p64.c\n\tcc $(CFLAGS) -o p64 p64.c\n"


@pytest.mark.slow
def test_harness_end_to_end_with_fake_reference(tmp_path):
    ref = tmp_path / "fakeref"
    ref.mkdir()
    (ref / "p64.c").write_text(FAKE_C)
    (ref / "Makefile").write_text(MAKEFILE)
    out = tmp_path / "goldens"

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_goldens.py"),
         "--reference", str(ref), "--out", str(out)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-3000:]

    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["binary_o0"], "O0 build missing"
    assert (out / "usage.txt").read_text().startswith("usage:")
    assert (out / "recitation.txt").exists()
    configs = {c["name"]: c for c in manifest["configs"]}
    # all three BASELINE configs encoded + decoded + O0 cross-checked
    for name in ("config1_qcif_intra", "config2_qcif_inter",
                 "config3_cif_rc"):
        c = configs[name]
        assert c["enc_rc"] == 0 and "stream_sha256" in c, c
        assert c["o0_matches"] is True, c
        assert c["dec_rc"] == 0
    # kernel probes encoded at 4 quantizers
    probes = [n for n in configs if n.startswith("probe_blocks_q")]
    assert len(probes) == 4
    assert all("stream_sha256" in configs[p] for p in probes)
