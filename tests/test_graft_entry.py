"""The driver entry points must stay importable and correct: entry()'s
jittable forward compiles and returns [k] outputs with the self-query
winning (the dryrun path is exercised by the distributed suites)."""

import pathlib
import sys

import numpy as np


def test_entry_compiles_and_self_query_wins():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    scores, idx = fn(*args)                # lax.top_k → (values, indices)
    assert idx.shape == (10,) and scores.shape == (10,)
    # args[4] is X[7]; the exact duplicate must rank first.
    assert int(np.asarray(idx)[0]) == 7
    s = np.asarray(scores)
    assert (np.diff(s) <= 1e-6).all()      # descending
