"""The committed evidence ledgers must describe the CURRENT catalog
(r12 verdict ask #1 — the ledger-discipline slip class, ended: a
catalog change without a regenerated sweep/lint now fails the tree).
Pure file+catalog check, no Spark session."""

from tools.check_ledgers import check


def test_ledgers_match_catalog():
    problems = check()
    assert problems == [], "\n".join(problems)
