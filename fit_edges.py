#!/usr/bin/env python
"""Drop-in counterpart of the reference's top-level fit_edges.py
(reference: fit_edges.py:47-141) — thin alias for
``python -m edgegaussians_tpu.cli.fit_edges``."""
from edgegaussians_tpu.cli.fit_edges import main

if __name__ == "__main__":
    main()
