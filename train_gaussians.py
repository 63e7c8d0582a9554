#!/usr/bin/env python
"""Drop-in counterpart of the reference's top-level train_gaussians.py
(reference: train_gaussians.py:225-346) — thin alias for
``python -m edgegaussians_tpu.cli.train``."""
from edgegaussians_tpu.cli.train import main

if __name__ == "__main__":
    main()
