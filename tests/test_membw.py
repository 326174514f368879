"""Memory-bandwidth probe sanity (spatialgraft/membw.py).

No absolute-throughput assertions — the number depends on the box and
on co-tenant load; the tests pin the contract the gate records rely
on: positive finite GB/s, and a CLI line that is valid JSON with the
membw_p{N}_gbs keys the bench scripts parse.
"""

import json
import subprocess
import sys

from spatialgraft.membw import probe


def test_probe_returns_positive_bandwidth():
    gbs = probe(1)
    assert 0.1 < gbs < 10_000


def test_cli_emits_json_keys():
    out = subprocess.run(
        [sys.executable, "-m", "spatialgraft.membw", "1"],
        capture_output=True, text=True, check=True, timeout=120)
    rec = json.loads(out.stdout.strip())
    assert set(rec) == {"membw_p1_gbs"}
    assert rec["membw_p1_gbs"] > 0
