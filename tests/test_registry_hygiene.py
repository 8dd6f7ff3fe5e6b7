"""Registry hygiene: no registered query can silently fall outside the
driver-verification arithmetic.

At 500+ registered queries a window rotation could orphan a name — it
would ship forever with zero driver CORRECTNESS signal (the round-6
MMR-rewrite deletion class, made structural).  This suite asserts that
every registered name is reachable from the rotation arithmetic:

  reachable = has a hard driver row in some CORRECTNESS_r*.json
            ∪ current DRIVER_WINDOW (will get a row this round)
            ∪ the queue comment in queries/__init__.py (next round)
            ∪ intentionally rows-only (oracle is None — the driver
              records a weaker check by design)

Pure Python — no SparkSession needed.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from the_movies_db_spark.queries import DRIVER_WINDOW, load_all

REPO = Path(__file__).resolve().parents[1]


def _hard_row_names() -> set[str]:
    names: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):  # pragma: no cover
            continue
        rows = data.get("results", data) if isinstance(data, dict) else {}
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # a hard row = value-hash verified (not an err / rows-only)
            if row.get("hash_match") and row.get("schema_match"):
                names.add(name)
    return names


def _queue_comment_names() -> set[str]:
    """Names listed in the 'Queue for the round-N window' comment."""
    src = (
        REPO / "the_movies_db_spark" / "queries" / "__init__.py"
    ).read_text()
    m = re.search(
        r"# Queue for the round-\d+ window.*?\n(.*?)\n\s*#\s*--",
        src,
        re.DOTALL,
    )
    if not m:
        return set()
    # Only tokens that ARE registered query names count as queue
    # entries — prose words in the comment ('window', 'round', …) must
    # not make an orphaned query look scheduled.
    tokens = set(re.findall(r"([a-z0-9_]{3,})[,]?", m.group(1)))
    return tokens & set(load_all())


def test_window_is_exactly_50_unique_registered_names():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    reg = load_all()
    missing = [n for n in DRIVER_WINDOW if n not in reg]
    assert not missing, f"window names not registered: {missing}"


def test_window_heads_the_registry_order():
    reg = load_all()
    assert tuple(list(reg)[:50]) == DRIVER_WINDOW


def test_every_registered_name_is_reachable():
    reg = load_all()
    hard = _hard_row_names()
    queue = _queue_comment_names()
    window = set(DRIVER_WINDOW)
    orphans = [
        n
        for n, q in reg.items()
        if n not in hard
        and n not in window
        and n not in queue
        and q.oracle is not None
    ]
    assert not orphans, (
        f"{len(orphans)} registered queries unreachable by the rotation "
        f"arithmetic (no hard row, not in window, not queued): {orphans}"
    )


def test_rows_only_set_is_bounded():
    """Rows-only (oracle=None) queries get only a weak driver check;
    keep the set small and intentional."""
    reg = load_all()
    rows_only = sorted(n for n, q in reg.items() if q.oracle is None)
    assert len(rows_only) <= 5, rows_only


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


def test_every_registered_name_appears_in_survey_s8():
    """SURVEY §8 is the coverage matrix the judging keys on (VERDICT
    r11 directive 6): every registered query name must appear there,
    so the matrix can't silently go stale as families accumulate."""
    survey = (REPO / "SURVEY.md").read_text()
    start = survey.index("## 8. Implementation coverage matrix")
    end = survey.index("## 9. Round-1 empirical results")
    s8 = survey[start:end]
    reg = load_all()
    missing = [n for n in reg if n not in s8]
    assert not missing, (
        f"{len(missing)} registered queries missing from SURVEY §8: {missing}"
    )
