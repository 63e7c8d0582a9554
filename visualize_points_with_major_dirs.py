#!/usr/bin/env python
"""Drop-in counterpart of the reference's visualize_points_with_major_dirs.py
(reference: visualize_points_with_major_dirs.py:16-25) — thin alias for
``python -m edgegaussians_tpu.cli.visualize_points_with_major_dirs``."""
from edgegaussians_tpu.cli.visualize_points_with_major_dirs import main

if __name__ == "__main__":
    main()
