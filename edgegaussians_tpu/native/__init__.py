"""Native (C++) components of the framework.

``kdtree`` is a compiled extension (see kdtree.cpp, built via the repo-root
setup.py); importing this package does not require it — consumers fall back
to scipy when the build is absent (edgegaussians_tpu/eval/neighbors.py).
"""
