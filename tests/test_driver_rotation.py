"""Driver-sampling rotation invariants (VERDICT r3 item 1).

The correctness driver samples a ~50-name PREFIX of ``queries()`` each
round. ``__spark_entry__.queries()`` therefore orders entries
never-driver-checked-first so every query earns a green CORRECTNESS row
at least once across rounds. These tests pin that contract as plain
dict arithmetic — no SparkSession — so an accidental reorder or a
rotation-breaking query addition fails fast in CI, not in the verdict.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402

# Every name with a driver CORRECTNESS row in any past round.
_CHECKED = set()
for _n in (1, 2, 3):
    with open(os.path.join(REPO, f"CORRECTNESS_r{_n:02d}.json")) as fh:
        _CHECKED |= set(json.load(fh))

# Sampled in r03 but recorded `no_oracle` there; regated in r4 with a
# bounded-error oracle, so it must be re-sampled (front of the prefix).
_REGATE = {"events_quantiles_approx"}

# Documented rows-only queries (sketch/merge-order semantics DuckDB
# cannot replay value-exactly; the driver records a rows-only check).
_ROWS_ONLY = {"bpe_merges", "compression_ratio"}


def test_every_query_has_an_oracle_or_is_documented_rows_only():
    q, o = entry.queries(), entry.oracle_sql()
    missing = set(q) - set(o) - _ROWS_ONLY
    assert not missing, f"queries without oracle_sql: {sorted(missing)}"
    stale = set(o) - set(q)
    assert not stale, f"oracle_sql without a query: {sorted(stale)}"


def test_not_yet_green_set_fits_the_remaining_driver_budget():
    """r4 + r5 sample ~50 names each; the set still needing a first
    green row (never-checked + regated) must fit in 100 slots, or some
    operator ends the build without a driver CORRECTNESS row."""
    q = entry.queries()
    pending = (set(q) - _CHECKED) | _REGATE
    assert len(pending) <= 100, (
        f"{len(pending)} queries still need a driver row but only "
        f"~100 sampling slots remain: {sorted(pending)[:10]}..."
    )


def test_prefix_is_exactly_the_not_yet_green_set():
    """No already-green name may occupy a prefix slot ahead of a
    pending one — that is how rotation debt accrues."""
    names = list(entry.queries())
    pending = (set(names) - _CHECKED) | _REGATE
    prefix, rest = names[: len(pending)], names[len(pending):]
    assert set(prefix) == pending, (
        "sampling prefix is not the pending set; first misplaced: "
        f"{sorted(pending - set(prefix))[:5]}"
    )
    assert not [n for n in rest if n in pending]


def test_regated_queries_lead_the_prefix():
    names = list(entry.queries())
    assert set(names[: len(_REGATE)]) == _REGATE
