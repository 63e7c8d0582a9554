"""Build script for the native components (C++ KD-tree extension).

    python setup.py build_ext --inplace
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="edgegaussians_tpu",
    version="0.1.0",
    packages=["edgegaussians_tpu"],
    ext_modules=[
        Extension(
            "edgegaussians_tpu.native.kdtree",
            sources=["edgegaussians_tpu/native/kdtree.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ],
)
