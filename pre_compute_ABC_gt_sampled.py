#!/usr/bin/env python
"""Drop-in counterpart of the reference's pre_compute_ABC_gt_sampled.py
(reference: pre_compute_ABC_gt_sampled.py:21-34) — thin alias for
``python -m edgegaussians_tpu.cli.precompute_gt``."""
from edgegaussians_tpu.cli.precompute_gt import main

if __name__ == "__main__":
    main()
