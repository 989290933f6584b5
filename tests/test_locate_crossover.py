"""Bitrot guard for scripts/locate_index_crossover.py: the evidence
script must stay importable against the current bench.py/package
surface (it borrows `_one_index_contract` and `build_stress_tables`
from bench), and its corpus-proportional bucket sizing must keep
reproducing the SEALED points' sizes — if the formula drifted, a
future localization reading would silently use a different protocol
than the committed sf/10x/20x curve it claims to interpolate.

No Spark session — import + pure-function checks only."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "locate_index_crossover",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "locate_index_crossover.py"))
lc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(lc)


def test_bucket_count_reproduces_sealed_sizing():
    # the sealed curve's stress points: 16 buckets @ 10x, 24 @ 20x
    assert lc.bucket_count(10) == 16
    assert lc.bucket_count(20) == 24
    # the recorded localization points (PLANS.md crossover table)
    assert lc.bucket_count(2) == 8
    assert lc.bucket_count(3) == 12
    assert lc.bucket_count(5) == 12


def test_parse_factors_accepts_both_flag_forms():
    """ADVICE r13: the docstring's space-separated usage form crashed
    the old hand-rolled parser (IndexError on the missing '='); both
    argparse forms must now work, and the default must stay 2,3,5 (the
    committed localization points)."""
    assert lc.parse_factors([]) == [2, 3, 5]
    assert lc.parse_factors(["--factors=2,3,5"]) == [2, 3, 5]
    assert lc.parse_factors(["--factors", "2,3,5"]) == [2, 3, 5]
    assert lc.parse_factors(["--factors", "4"]) == [4]
    assert lc.parse_factors(["--factors=7,9"]) == [7, 9]


def test_bucket_count_floor_and_monotone():
    # floor of 8 (sf-scale sizing) and multiples of 4, monotone
    # non-decreasing in factor — near-empty bucket files would measure
    # task-scheduling floor, not the index
    sizes = [lc.bucket_count(f) for f in range(1, 41)]
    assert min(sizes) == 8
    assert all(s % 4 == 0 for s in sizes)
    assert all(a <= b for a, b in zip(sizes, sizes[1:]))
