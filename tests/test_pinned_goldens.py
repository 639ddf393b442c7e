"""Pinned own-output bitstream regression (VERDICT round-2 item 3).

Asserts the encoder's byte-exact output on fixed content + fixed settings
matches the committed sha256 pins.  Roundtrip tests cannot catch decision
drift (encoder and decoder move together); this test makes it loud.

On an intentional behavior change, regenerate with
``python -m p64tpu.tools.pinned --write`` in the same commit.
"""

import json

import pytest

from p64tpu.tools import pinned


@pytest.fixture(scope="module")
def pins():
    with open(pinned.PIN_FILE) as f:
        return json.load(f)


def test_every_stream_matches_pin(pins):
    got = pinned.current_hashes()
    drift = {k: (pins.get(k), got[k]) for k in got if pins.get(k) != got[k]}
    stale = [k for k in pins if k not in got]
    assert not drift and not stale, (
        f"pinned-golden drift (regenerate deliberately with "
        f"`python -m p64tpu.tools.pinned --write`): drift={drift} "
        f"stale_pins={stale}")
