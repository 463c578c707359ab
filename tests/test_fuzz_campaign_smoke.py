"""Keep tools/fuzz_campaign.py importable and its iteration bodies
healthy — the long-horizon campaign harness found both round-4 state
bugs, so CI insurance against harness rot is cheap and worth it."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

from conftest import require_vocab

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.parametrize("mode", ["encode", "trim"])
def test_campaign_iterations_smoke(mode):
    require_vocab("gpt2")
    import fuzz_campaign

    rng = random.Random(1234)
    step = {
        "encode": fuzz_campaign.iter_encode,
        "trim": fuzz_campaign.iter_trim,
    }[mode]
    for _ in range(3):
        step(rng)


def test_campaign_mesh_iteration_smoke():
    """Mesh-mode iteration body on however many devices the test env
    exposes (conftest forces the 8-device virtual CPU mesh)."""
    require_vocab("gpt2")
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import fuzz_campaign

    rng = random.Random(4321)
    for _ in range(3):
        fuzz_campaign.iter_mesh(rng)
