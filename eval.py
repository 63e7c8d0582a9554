#!/usr/bin/env python
"""Drop-in counterpart of the reference's top-level eval.py
(reference: eval.py:12-201) — thin alias for
``python -m edgegaussians_tpu.cli.evaluate``."""
from edgegaussians_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
