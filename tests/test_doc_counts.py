"""Doc-count drift guard (the twice-learned lesson: COVERAGE's stale
300 in r9, BASELINE's stale queue count in r10). Every numeric claim
the docs make about registry shape is asserted against the registry
itself, so a round can't close with a stale count."""

from __future__ import annotations

import os
import re

from hops_spark.registry import NEXT_WINDOW_QUEUE, load_all

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(_REPO, name)) as f:
        return f.read()


def test_registered_query_count_claims():
    n = len(load_all())
    m = re.search(r"inventory: (\d+) registered queries", _read("README.md"))
    assert m and int(m.group(1)) == n, f"README says {m and m.group(1)}, registry has {n}"
    m = re.search(r"^(\d+) registered queries", _read("COVERAGE.md"), re.M)
    assert m and int(m.group(1)) == n, f"COVERAGE says {m and m.group(1)}, registry has {n}"


def test_latest_queue_count_claim_matches():
    """The MOST RECENT 'NEXT_WINDOW_QUEUE holds N rows' sentence in
    BASELINE.md (the current round's close note) must match the live
    queue. Earlier mentions are historical prose about past rounds
    and are not re-checked."""
    claims = re.findall(r"NEXT_WINDOW_QUEUE\s+holds\s+(\d+)\s+rows?",
                        _read("BASELINE.md"))
    if not claims:   # no claim yet this round — nothing to drift
        return
    assert int(claims[-1]) == len(NEXT_WINDOW_QUEUE), (
        f"BASELINE.md's latest queue-count claim ({claims[-1]}) != "
        f"len(NEXT_WINDOW_QUEUE) ({len(NEXT_WINDOW_QUEUE)}) — update "
        "the close note or the queue")
