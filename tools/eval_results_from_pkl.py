#!/usr/bin/env python
"""Re-run evaluation from a dumped results pickle — 1:1 CLI surface with
the reference's tools/eval_results_from_pkl.py (:19-55).

    python tools/eval_results_from_pkl.py CONFIG RESULTS.pkl [test.py args]

Thin alias over `tools/test.py CONFIG --eval-from-pkl RESULTS.pkl` (the
dump side is `tools/test.py ... --out RESULTS.pkl`).
"""

import sys


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    import importlib.util
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    spec = importlib.util.spec_from_file_location(
        "srfdet_tools_test", os.path.join(here, "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    config, pkl, rest = sys.argv[1], sys.argv[2], sys.argv[3:]
    sys.argv = [sys.argv[0], config, "--eval-from-pkl", pkl] + rest
    return mod.main()


if __name__ == "__main__":
    raise SystemExit(main())
