"""Build the native host-side data kernels:

    cd native && python setup.py build_ext --inplace
"""
import numpy as np
from setuptools import Extension, setup

setup(
    name="srfdet3d_native",
    ext_modules=[
        Extension(
            "srfdet3d_native",
            sources=["pointio.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
        )
    ],
)
