"""Driver-contract tests for __graft_entry__: the multi-chip dry run must
self-host a virtual CPU mesh when the calling process lacks devices
(round 1's driver artifact failed exactly here)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_reexecs_when_devices_insufficient(capfd):
    """The test process has 8 virtual CPU devices; asking for 16 forces the
    subprocess re-exec path (fresh env with a 16-device CPU platform)."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(16)
    out = capfd.readouterr().out
    assert "dryrun_multichip ok: 16 devices" in out


def test_dryrun_multichip_runs_inline_with_enough_devices(capsys):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok: 8 devices" in out
