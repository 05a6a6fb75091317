#!/usr/bin/env python
"""Drop-in counterpart of the reference's examples/train_deepgmr.py — thin wrapper over the
unified trainer CLI (train.py) with the right model/task defaults."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from train import main

if __name__ == "__main__":
    defaults = {'--model': 'deepgmr', '--task': 'deepgmr'}
    for flag, value in defaults.items():
        if flag not in " ".join(sys.argv[1:]):
            sys.argv.extend([flag, value])
    main()
