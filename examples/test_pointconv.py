#!/usr/bin/env python
"""Drop-in counterpart of the reference's examples/test_pointconv.py — thin wrapper over the
unified eval CLI (evaluate.py) with the right model/task defaults."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from evaluate import main

if __name__ == "__main__":
    defaults = {'--model': 'pointconv', '--task': 'classification'}
    for flag, value in defaults.items():
        if flag not in " ".join(sys.argv[1:]):
            sys.argv.extend([flag, value])
    main()
